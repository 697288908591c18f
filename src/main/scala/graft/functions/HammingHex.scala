package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helper shared by interpreted eval and generated code. */
object HammingHexUtil {
  /** Bit-level Hamming distance between two equal-length lowercase-hex
    * strings (ASCII); compares min length if they differ. */
  def hamming(a: UTF8String, b: UTF8String): Long = {
    val sa = a.toString; val sb = b.toString
    val n = math.min(sa.length, sb.length)
    var d = 0L
    var i = 0
    while (i < n) {
      val x = hexVal(sa.charAt(i)) ^ hexVal(sb.charAt(i))
      d += java.lang.Integer.bitCount(x)
      i += 1
    }
    d
  }
  private def hexVal(c: Char): Int =
    if (c <= '9') c - '0' else c - 'a' + 10
}

/** Native Hamming distance over hex fingerprints — the verify step of
  * SimHash dedup runs per candidate PAIR; the Column-expression formulation
  * allocates dozens of substrings per pair, this is one tight loop. */
case class HammingHex(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hamming_hex expects (string, string), got ${left.dataType} / ${right.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "hamming_hex"

  override def nullSafeEval(a: Any, b: Any): Any =
    HammingHexUtil.hamming(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.HammingHexUtil.hamming($x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HammingHexCol {
  def apply(a: Column, b: Column): Column =
    GraftSqlBridge.column(HammingHex(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
