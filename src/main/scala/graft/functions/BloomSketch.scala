package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.types.BinaryType

/** Column wrappers over Catalyst's Bloom-filter machinery — the SAME
  * codegen'd expressions Spark's own injected runtime filters use
  * (`InjectRuntimeFilter`), surfaced for explicit membership pre-filters:
  * build a compact sketch over one frame's keys, broadcast it as a
  * literal, and cut another frame's volume BEFORE any shuffle. Items are
  * keyed by `xxhash64(col)` on both sides (the aggregate stores longs),
  * exactly as the optimizer rule wires it.
  *
  * A Bloom positive is probabilistic (`fpp` false-positive rate at the
  * sized item count; never false-negative), so callers needing exact
  * semantics MUST verify survivors with an equi-join — the sketch's only
  * job is making that join's input small.
  */
object BloomSketch {

  /** Aggregate a column into one serialized Bloom filter (binary).
    * Distributed build: per-partition sketches OR-merge inside the
    * aggregate; only the single merged sketch (size fixed by
    * `(expectedItems, numBits)`, independent of row count) reaches the
    * driver. `numBits` per the standard optimal-bits formula via
    * [[optimalNumBits]]. */
  def bloomAgg(c: Column, expectedItems: Long, numBits: Long): Column =
    GraftSqlBridge.column(
      new BloomFilterAggregate(
        new XxHash64(Seq(GraftSqlBridge.expression(c))),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe against a driver-held serialized sketch, embedded
    * as a binary literal (compact — ships with the task binary once, not
    * per row). Codegen'd; false positives at the built fpp, no false
    * negatives. */
  def mightContain(sketch: Array[Byte], c: Column): Column =
    GraftSqlBridge.column(
      BloomFilterMightContain(
        Literal(sketch, BinaryType),
        new XxHash64(Seq(GraftSqlBridge.expression(c)))))

  /** Standard optimal Bloom size: `-n·ln(p) / ln(2)²` bits, floored to
    * the sketch library's caps (at least 64 bits so a degenerate empty /
    * tiny build still constructs). */
  def optimalNumBits(expectedItems: Long, fpp: Double): Long = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0, 1), got $fpp")
    val n = math.max(expectedItems, 1L)
    math.max(64L,
      math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
  }
}
