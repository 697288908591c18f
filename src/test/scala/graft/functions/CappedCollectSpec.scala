package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** The capped grouped collect behind the substring family's hot-window
  * guard: output parity with `sort_array(collect_list)` for surviving
  * groups, null for over-cap groups, and — the property the aggregate
  * exists for — a buffer that NEVER holds more than cap+1 values, on the
  * update path, the merge path, and through serialization. */
class CappedCollectSpec extends SparkSpec {

  test("parity with sort_array(collect_list) for under-cap groups: strings") {
    import spark.implicits._
    val df = Seq((1, "b"), (1, "a"), (2, "z"), (2, "z"), (2, "y"), (3, "q"))
      .toDF("g", "v")
    val got = df.groupBy("g")
      .agg(CappedCollect.collectSortedCapped(col("v"), 10).as("l"))
      .orderBy("g").collect().toSeq
    val want = df.groupBy("g")
      .agg(sort_array(collect_list(col("v"))).as("l"))
      .orderBy("g").collect().toSeq
    assert(got == want)
  }

  test("parity with sort_array(collect_list) for under-cap groups: structs " +
      "(the positioned-window occurrence shape, struct ordering included)") {
    import spark.implicits._
    val df = Seq((1, "d2", 5), (1, "d1", 9), (1, "d1", 3), (2, "x", 1))
      .toDF("g", "id", "pos")
    val s = struct(col("id"), col("pos"))
    val got = df.groupBy("g")
      .agg(CappedCollect.collectSortedCapped(s, 10).as("l"))
      .orderBy("g").collect().toSeq
    val want = df.groupBy("g")
      .agg(sort_array(collect_list(s)).as("l"))
      .orderBy("g").collect().toSeq
    assert(got == want)
  }

  test("groups wider than the cap evaluate to null; nulls are skipped " +
      "like collect_list") {
    import spark.implicits._
    val rows = (1 to 100).map(i => ("hot", s"v$i")) ++
      Seq(("cold", "a"), ("cold", null), ("cold", "b"))
    val df = rows.toDF("g", "v")
    val out = df.groupBy("g")
      .agg(CappedCollect.collectSortedCapped(col("v"), 10).as("l"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("hot").isEmpty) // over-cap → null
    assert(out("cold").get.asInstanceOf[scala.collection.Seq[_]].toSeq == Seq("a", "b"))
  }

  test("the buffer never exceeds cap+1 values and frees on overflow " +
      "(the 100 TB property: a corpus-wide window cannot OOM an executor)") {
    val expr = CollectSortedCapped(BoundReference(0, StringType, nullable = true), 4)
    val buf = expr.createAggregationBuffer()
    var maxHeld = 0
    (1 to 1000).foreach { i =>
      expr.update(buf, InternalRow(UTF8String.fromString(f"v$i%04d")))
      maxHeld = math.max(maxHeld, buf.items.length)
    }
    assert(maxHeld <= 5) // cap+1, the latch point
    assert(buf.overflowed && buf.items.isEmpty) // memory freed, not kept
    assert(expr.eval(buf) == null)
  }

  test("merge latches overflow and keeps the bound; serialization " +
      "round-trips both states") {
    val expr = CollectSortedCapped(BoundReference(0, StringType, nullable = true), 4)
    def bufWith(vals: String*) = {
      val b = expr.createAggregationBuffer()
      vals.foreach(v => expr.update(b, InternalRow(UTF8String.fromString(v))))
      b
    }
    // clean + clean over the cap → latched, freed
    val m = expr.merge(bufWith("a", "b", "c"), bufWith("d", "e", "f"))
    assert(m.overflowed && m.items.isEmpty)
    // clean + overflowed → latched
    val o = bufWith((1 to 10).map(i => s"x$i"): _*)
    assert(o.overflowed)
    val m2 = expr.merge(bufWith("a"), o)
    assert(m2.overflowed)
    // serialize/deserialize: clean keeps items, overflowed keeps the latch
    val clean = expr.deserialize(expr.serialize(bufWith("b", "a")))
    assert(!clean.overflowed)
    assert(expr.eval(clean).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toArray[UTF8String](StringType).map(_.toString).toSeq == Seq("a", "b"))
    val over = expr.deserialize(expr.serialize(o))
    assert(over.overflowed && over.items.isEmpty)
    assert(expr.eval(over) == null)
  }
}
