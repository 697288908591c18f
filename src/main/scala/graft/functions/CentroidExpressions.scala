package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.types._

/** Driver-collected centroid table for row-local nearest-centroid
  * assignment: cids ascending (the tie-break order), per-centroid vectors
  * and precomputed norms. Shipped to executors as ONE torrent broadcast —
  * at 10⁹ vectors / √n ≈ 31k centroids / 768 dims this is ~190 MB once
  * per executor, vs the n·√n·dim row expansion the broadcast-NLJ +
  * window formulation it replaces paid through a hash exchange.
  *
  * Float parity contract (oracle-checked end to end by every `ann_*` /
  * `emb_*` battery row): [[assign]] runs the SAME IEEE operations in the
  * SAME order as the Catalyst column form it replaced —
  * `safeCosE6(graft_dot(v, cv), sqrt(graft_dot(v, v)), cn)`:
  * left-to-right double dots over min(length), `sqrt`, and the e6
  * rounding exactly as Spark's `round(x, 0).cast("long")` computes it
  * (`java.math.BigDecimal.valueOf(x).setScale(0, HALF_UP)`, NaN/Inf
  * passed through to the ANSI cast, which throws). Zero/NaN norms take
  * the total `otherwise(0L)` branch, bit-identical to `safeCosE6`.
  */
final class CentroidMatrix(
    val cids: Array[Long],
    val vecs: Array[Array[Double]],
    val norms: Array[Double]) extends Serializable {
  require(cids.length == vecs.length && cids.length == norms.length,
    s"CentroidMatrix arity mismatch: ${cids.length}/${vecs.length}/${norms.length}")

  /** e6-rounded cosine from a precomputed dot and norms — the JVM twin of
    * `Similarity.safeCosE6` (when(na*nb > 0, round(d/(na*nb)*1e6, 0)
    * .cast("long")).otherwise(0L)). */
  private def csE6(d: Double, na: Double, nb: Double): Long = {
    val den = na * nb
    if (den > 0) {
      val x = d / den * 1e6
      if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x))
        // same terminal outcome as the column form: Spark's round() passes
        // NaN/Inf through unrounded and the ANSI cast to long throws
        throw new ArithmeticException(
          s"nearest_centroids: cosine*1e6 is $x — cannot cast to long (ANSI)")
      else
        java.math.BigDecimal.valueOf(x)
          .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
    } else 0L
  }

  /** Top `nOut` centroids for one row vector by (cs_e6 desc, cid asc) —
    * the exact ordering the `row_number()` window this replaces used.
    * `v == null` behaves like the column form did under the NLJ (null
    * norms fail the `> 0` guard → every cosine 0 → the nOut smallest
    * cids). Returns min(nOut, k) `(cid, cs_e6)` structs in rank order. */
  def assign(v: ArrayData, nOut: Int): GenericArrayData = {
    val k = cids.length
    val m = math.min(nOut, k)
    val vlen = if (v == null) 0 else v.numElements()
    var s = 0.0
    var i = 0
    while (i < vlen) { val x = v.getDouble(i); s += x * x; i += 1 }
    val na = math.sqrt(s)
    val bestCs = new Array[Long](m)
    val bestCid = new Array[Long](m)
    var count = 0
    var c = 0
    while (c < k) {
      val cv = vecs(c)
      var d = 0.0
      val lim = math.min(vlen, cv.length)
      var j = 0
      while (j < lim) { d += v.getDouble(j) * cv(j); j += 1 }
      val cs = csE6(d, na, norms(c))
      // insertion keeps (cs desc, cid asc): cids iterate ascending, so on
      // equal cs the earlier (lower) cid stays ahead — strict > only
      if (count < m || cs > bestCs(m - 1)) {
        var pos = if (count < m) count else m - 1
        while (pos > 0 && cs > bestCs(pos - 1)) {
          bestCs(pos) = bestCs(pos - 1); bestCid(pos) = bestCid(pos - 1)
          pos -= 1
        }
        bestCs(pos) = cs; bestCid(pos) = cids(c)
        if (count < m) count += 1
      }
      c += 1
    }
    val out = new Array[Any](count)
    var r = 0
    while (r < count) {
      out(r) = new GenericInternalRow(Array[Any](bestCid(r), bestCs(r)))
      r += 1
    }
    new GenericArrayData(out)
  }
}

/** Row-local nearest-centroid assignment over a broadcast centroid matrix.
  *
  * Replaces the `join(broadcast(cent), lit(true))` +
  * `row_number().over(Window.partitionBy(id))` formulation, whose window
  * hash-exchanged n·√n expanded rows each still carrying the full vector
  * (the 100 TB scale-killer for IVF build / SemDeDup / cluster balance).
  * This emits `array<struct<cid, cs_e6>>` per row with ZERO row expansion
  * and ZERO exchange — the argmax loops the broadcast matrix inside
  * whole-stage codegen, the [[DotProduct]] rung of the extension ladder.
  */
case class NearestCentroids(
    child: Expression,
    matrix: Broadcast[CentroidMatrix],
    n: Int) extends UnaryExpression {
  require(n >= 1, s"nearest_centroids needs n >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroids expects array<double>, got $other")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("cid", LongType, nullable = false),
      StructField("cs_e6", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "nearest_centroids"

  // null-HANDLING, not null-intercepting: a null vector assigns like a
  // zero-norm one (cosine 0 to everything, lowest cids win), matching the
  // column form this replaced, where null norms fell to otherwise(0L)
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    matrix.value.assign(
      if (v == null) null else v.asInstanceOf[ArrayData], n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val matCls = classOf[CentroidMatrix].getName
    val bcRef = ctx.addReferenceObj("nearestCentBc", matrix,
      classOf[Broadcast[CentroidMatrix]].getName)
    // .value() resolved once per task init, not per row
    val mat = ctx.addMutableState(matCls, "nearestCentMat",
      v => s"$v = ($matCls) $bcRef.value();")
    ev.copy(
      code = code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          $mat.assign(${childGen.isNull} ? null : ${childGen.value}, $n);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CentroidExpressions {
  /** Column wrapper: `array<struct<cid, cs_e6>>` of the n nearest
    * centroids by (cosine desc, cid asc). */
  def nearestCentroids(v: Column, bc: Broadcast[CentroidMatrix], n: Int): Column =
    GraftSqlBridge.column(NearestCentroids(
      GraftSqlBridge.expression(v.cast("array<double>")), bc, n))
}
