package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Loop kernels for the DSIR hashed n-gram family (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling",
  * arXiv:2302.03169). The feature space is the paper's hashed bag of
  * unigrams + bigrams; the bucket function is the one the classifier
  * family already oracle-pins ([[graft.operators.TextAnalysis.linearScore]]):
  * the first 16 bits of md5 over the gram's UTF-8 bytes, mod `dim` —
  * DuckDB twin `(hex(md5)[1..4] as int) % dim`. */
object DsirKernels {

  private val Space = UTF8String.fromString(" ")

  private val Md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def bucket(g: UTF8String, dim: Int): Int = {
    val h = Md5.get().digest(g.getBytes)
    (((h(0) & 0xff) << 8) | (h(1) & 0xff)) % dim
  }

  /** One bucket id per gram OCCURRENCE: the n unigrams in token order,
    * then the n-1 stride-1 bigrams (`concat_ws(" ", t_i, t_{i+1})`).
    * Null token slots are skipped for unigrams and null-skipped inside
    * the bigram concat (concat_ws semantics) — callers feed
    * [[graft.operators.TextOps.tokens]] output (containsNull = false),
    * so the guards are latent-input hardening, not a live code path. */
  def gramBuckets(toks: ArrayData, dim: Int): ArrayData = {
    val n = toks.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](if (n == 1) 1 else 2 * n - 1)
    var m = 0
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        out(m) = bucket(toks.getUTF8String(i), dim)
        m += 1
      }
      i += 1
    }
    i = 0
    while (i < n - 1) {
      val a = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      val b = if (toks.isNullAt(i + 1)) null else toks.getUTF8String(i + 1)
      out(m) = bucket(UTF8String.concatWs(Space, a, b), dim)
      m += 1
      i += 1
    }
    new GenericArrayData(
      if (m == out.length) out
      else java.util.Arrays.copyOf(
        out.asInstanceOf[Array[AnyRef]], m).asInstanceOf[Array[Any]])
  }

  /** Σ weights(b) over the bucket array — exact long arithmetic; the
    * per-bucket weights are the only place doubles ever appeared
    * (fit-time log-ratios, already e6-rounded). */
  def sumAt(buckets: ArrayData, weights: Array[Long]): Long = {
    val n = buckets.numElements()
    var s = 0L
    var i = 0
    while (i < n) { s += weights(buckets.getInt(i)); i += 1 }
    s
  }
}

/** Hashed unigram+bigram bucket ids of a token array, one per occurrence
  * — the DSIR feature extractor as a native codegen expression. The HOF
  * spelling (`transform(concat(toks, bigrams), t -> conv(substring(
  * md5(t), 1, 4), 16, 10) % dim)`) would evaluate its lambda interpreted
  * per gram and build the bigram array twice. */
case class HashedGramBuckets(child: Expression, dim: Int)
    extends UnaryExpression {
  require(dim > 0, s"hashed_gram_buckets needs dim > 0, got $dim")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hashed_gram_buckets expects array<string>, got $other")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hashed_gram_buckets"

  override protected def nullSafeEval(input: Any): Any =
    DsirKernels.gramBuckets(input.asInstanceOf[ArrayData], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.DsirKernels.gramBuckets($c, $dim)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Row-local Σ of broadcast per-bucket weights at the row's bucket ids —
  * the DSIR scoring pass. The weight table is dim-sized (fit-time
  * driver collect, same size class as the centroid/codebook broadcasts),
  * so scoring is ZERO-exchange: one narrow codegen'd map over the corpus,
  * exact long arithmetic. */
case class DsirBucketSum(child: Expression, weights: Broadcast[Array[Long]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dsir_bucket_sum expects array<int>, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "dsir_bucket_sum"

  override protected def nullSafeEval(input: Any): Any =
    DsirKernels.sumAt(input.asInstanceOf[ArrayData], weights.value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("dsirWeightsBc", weights,
      classOf[Broadcast[Array[Long]]].getName)
    // .value() resolved once per task init, not per row
    val w = ctx.addMutableState("long[]", "dsirWeights",
      v => s"$v = (long[]) $bcRef.value();")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.DsirKernels.sumAt($c, $w)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DsirExpressions {
  /** Column wrapper: `array<int>` hashed unigram+bigram bucket ids. */
  def gramBuckets(toks: Column, dim: Int): Column =
    GraftSqlBridge.column(HashedGramBuckets(
      GraftSqlBridge.expression(toks), dim))

  /** Column wrapper: exact long Σ weights(bucket) over a bucket array. */
  def bucketSum(buckets: Column, weights: Broadcast[Array[Long]]): Column =
    GraftSqlBridge.column(DsirBucketSum(
      GraftSqlBridge.expression(buckets), weights))
}
