package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType}

/** Aggregation buffer of [[CollectSortedCapped]]: the collected values plus
  * an overflow latch. INVARIANT — the one this aggregate exists for —
  * `items.length <= cap + 1` at every point in the aggregate's lifecycle
  * (update, merge, exchange): the moment a group exceeds the cap the latch
  * sets and the items FREE. `sort_array(collect_list(...))` + a post-agg
  * size filter computes the same surviving groups but buffers every value
  * of every group first — a corpus-wide key (universal boilerplate: one
  * ≥k-token cookie-banner sentence shared by 10⁸ docs) is then a multi-GB
  * single aggregation buffer before the filter ever sees it. */
final class CappedCollectBuffer(
    var overflowed: Boolean,
    val items: mutable.ArrayBuffer[Any])

/** `sort_array(collect_list(child))` with a HARD per-group memory bound:
  * groups that collect more than `cap` values evaluate to NULL (callers
  * drop them with `isNotNull` — the hot-window guard), and their buffers
  * stop accumulating at cap+1 values on BOTH the partial (map) and final
  * (reduce) side, so the bound holds for the agg hash map AND the
  * exchange (each map task ships at most cap+1 values per group).
  *
  * For every surviving group the output is bit-identical to
  * `sort_array(collect_list(...), asc)`: ascending interpreted ordering
  * (struct fields left-to-right), nulls skipped by collection like
  * `collect_list` skips them. The sort happens once per surviving group
  * at eval, so consumers also save the separate sort_array projection. */
case class CollectSortedCapped(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CappedCollectBuffer] with UnaryLike[Expression] {

  require(cap >= 1, s"collect_sorted_capped needs cap >= 1, got $cap " +
    "(cap 0 = exact/unbounded semantics belongs to sort_array(collect_list))")

  override def prettyName: String = "collect_sorted_capped"
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)

  override def createAggregationBuffer(): CappedCollectBuffer =
    new CappedCollectBuffer(false, mutable.ArrayBuffer.empty)

  private def latch(b: CappedCollectBuffer): Unit =
    if (b.items.length > cap) {
      b.overflowed = true
      b.items.clear() // free the memory NOW, not at eval
    }

  override def update(b: CappedCollectBuffer, input: InternalRow): CappedCollectBuffer = {
    if (!b.overflowed) {
      val v = child.eval(input)
      if (v != null) {
        // defensive copy: unsafe-backed values are reused across rows
        b.items += InternalRow.copyValue(v)
        latch(b)
      }
    }
    b
  }

  override def merge(b: CappedCollectBuffer, o: CappedCollectBuffer): CappedCollectBuffer = {
    if (b.overflowed || o.overflowed) {
      b.overflowed = true
      b.items.clear()
    } else {
      b.items ++= o.items
      latch(b)
    }
    b
  }

  @transient private lazy val ordering = TypeUtils.getInterpretedOrdering(child.dataType)

  override def eval(b: CappedCollectBuffer): Any =
    if (b.overflowed) null
    else {
      val a = b.items.toArray
      // groups are overwhelmingly singletons (organic window df ≈ 1):
      // skip the sort's comparator/alloc machinery for them
      if (a.length > 1)
        java.util.Arrays.sort(a.asInstanceOf[Array[AnyRef]],
          ordering.asInstanceOf[java.util.Comparator[AnyRef]])
      new GenericArrayData(a)
    }

  // (overflowed, items) as one UnsafeRow — the Collect serialization shape
  @transient private lazy val projection =
    UnsafeProjection.create(Array[DataType](BooleanType, dataType))

  override def serialize(b: CappedCollectBuffer): Array[Byte] =
    projection.apply(InternalRow.apply(
      b.overflowed,
      if (b.overflowed) null else new GenericArrayData(b.items.toArray))).getBytes()

  override def deserialize(bytes: Array[Byte]): CappedCollectBuffer = {
    val row = new UnsafeRow(2)
    row.pointTo(bytes, bytes.length)
    val overflowed = row.getBoolean(0)
    val items = mutable.ArrayBuffer.empty[Any]
    if (!overflowed)
      row.getArray(1).foreach(child.dataType, (_, x: Any) => items += x)
    new CappedCollectBuffer(overflowed, items)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CappedCollect {
  /** Column form: ascending-sorted value list per group, NULL (not a
    * truncated list) for groups wider than `cap` — pair it with
    * `.filter(col(...).isNotNull)` at the call site. */
  def collectSortedCapped(c: Column, cap: Int): Column =
    GraftSqlBridge.column(CollectSortedCapped(GraftSqlBridge.expression(c), cap)
      .toAggregateExpression())
}
