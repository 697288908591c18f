package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count-only kernel for the column formulation
  * `round(size(array_intersect(a, b)) * 10000.0 /
  *  (size(a) + size(b) - size(array_intersect(a, b))), 0)` —
  * [[graft.operators.TextOps.jaccardE4]], the exact-verify stage of the
  * minhash/ngram dedup family. `array_intersect` materializes the
  * intersection ARRAY (hash set + output copy per row) only for `size`
  * to count it, and the surrounding arithmetic re-evaluates it; this
  * expression counts in one pass with no output array.
  *
  * Replicated semantics, bit-exact:
  *  - intersection counts DISTINCT elements of `a` present in `b`
  *    (first-occurrence dedup of `a`, like array_intersect), null
  *    counted once iff null appears in BOTH;
  *  - union = numElements(a) + numElements(b) − inter (sizes count
  *    duplicates, exactly as `size()` does);
  *  - `inter * 10000.0 / union` in doubles, rounded via
  *    `BigDecimal.valueOf(x).setScale(0, HALF_UP)` — Spark's `round(x, 0)`
  *    (and DuckDB's `round(x)` for the non-negative values here);
  *  - union = 0 (two empty arrays) throws, matching the ANSI
  *    divide-by-zero the column form raises; no battery caller can reach
  *    it (empty docs band to null keys and never become candidates). */
case class JaccardE4(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaccard_e4 expects two array<string> args, got ${left.dataType} / ${right.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "jaccard_e4"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardE4.kernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.JaccardE4.kernel($x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaccardE4 {

  def kernel(a: ArrayData, b: ArrayData): Long = {
    val nb = b.numElements()
    val bSet = new java.util.HashSet[UTF8String](Math.max(4, nb * 2))
    var bHasNull = false
    var i = 0
    while (i < nb) {
      if (b.isNullAt(i)) bHasNull = true else bSet.add(b.getUTF8String(i))
      i += 1
    }
    val na = a.numElements()
    val seen = new java.util.HashSet[UTF8String](Math.max(4, na * 2))
    var seenNull = false
    var inter = 0L
    var j = 0
    while (j < na) {
      if (a.isNullAt(j)) {
        if (!seenNull && bHasNull) inter += 1
        seenNull = true
      } else {
        val s = a.getUTF8String(j)
        if (seen.add(s) && bSet.contains(s)) inter += 1
      }
      j += 1
    }
    val union = na.toLong + nb.toLong - inter
    if (union == 0L)
      throw new ArithmeticException(
        "jaccard_e4: division by zero (two empty arrays) — the column " +
          "formulation raises ANSI DIVIDE_BY_ZERO here too")
    java.math.BigDecimal.valueOf(inter * 10000.0 / union)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
  }

  def apply(a: Column, b: Column): Column =
    GraftSqlBridge.column(JaccardE4(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
