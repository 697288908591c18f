package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.types.{BinaryType, DataType, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.engine.{Codec, FossilSchema}
import graft.engine.FossilSchema.{SComposite, SType}

/** Encode a typed Spark value into its fossil wire-format bytes — the
  * inverse of [[FossilDecode]], and the egress-boundary operator for
  * wire-compatible output (the fossil EXPORT path re-encodes every stored
  * value back into the reference's `EncodeType` layout,
  * `pkg/schema/encoding.go:224-259`). Same tier rationale as the decoder:
  * one interpreted call per exported datum at the edge of the plan, never
  * in an analytic hot path — CodegenFallback. */
case class FossilEncode(ddl: String, child: Expression)
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val schema: SType = FossilSchema.parse(ddl)

  override def dataType: DataType = BinaryType
  override def prettyName: String = "fossil_encode"

  override protected def nullSafeEval(input: Any): Any =
    Codec.encode(schema, fromCatalyst(schema, input))

  /** Catalyst internal values → the Scala shapes Codec.encode expects
    * (String, numbers, Seq, Map for composites). */
  private def fromCatalyst(s: SType, v: Any): Any = (s, v) match {
    case (_, u: UTF8String) => u.toString
    case (c: SComposite, row: org.apache.spark.sql.catalyst.InternalRow) =>
      val fields = c.sorted.fields
      val st = c.sparkType.asInstanceOf[StructType]
      fields.zipWithIndex.map { case ((k, ft), i) =>
        k -> fromCatalyst(ft, row.get(i, st(i).dataType))
      }.toMap
    case (FossilSchema.SArray(_, elem), a: ArrayData) =>
      a.toObjectArray(elem.sparkType).toSeq.map(x => fromCatalyst(elem, x))
    case (_, m: MapData) =>
      throw new IllegalArgumentException("map values are not a fossil type")
    case (_, other) => other
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FossilEncode {
  /** `fossil_encode('<ddl>', valueCol)` as a Column. */
  def apply(ddl: String, value: Column): Column =
    GraftSqlBridge.column(FossilEncode(ddl, GraftSqlBridge.expression(value)))
}
