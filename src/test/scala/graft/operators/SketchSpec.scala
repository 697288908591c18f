package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Sketch aggregates: error-bounded against exact answers on sf0.001
  * (sketches aren't cross-engine comparable, so the oracle can't check
  * them — this spec is their correctness gate). */
class SketchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("approx_count_distinct within rsd of exact") {
    val li = Tables.lineitem(spark, dir)
    val exact = li.agg(countDistinct(col("l_partkey"))).head().getLong(0)
    val approx = li.agg(approx_count_distinct(col("l_partkey"), 0.02)).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.1)
  }

  test("freqItems returns every item above the support threshold") {
    import spark.implicits._
    // skewed corpus: 'a' at 40%, 'b' at 15%, 60 rare singletons — at
    // support 10% the guarantee says {a, b} ⊆ sketch, regardless of the
    // sub-threshold extras it may also return
    val rows = Seq.fill(80)("a") ++ Seq.fill(30)("b") ++
      (0 until 60).map(i => s"r$i") ++ Seq.fill(30)("c")
    val df = rows.toDF("t").repartition(8) // merge across partial sketches
    val sketch = df.stat.freqItems(Seq("t"), 0.1).head().getSeq[String](0).toSet
    assert(Set("a", "b", "c").subsetOf(sketch), s"sketch=$sketch")
  }

  test("percentile_approx brackets the exact median") {
    val li = Tables.lineitem(spark, dir)
    val approx = li.agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)))
      .head().getDouble(0)
    val exact = li.stat.approxQuantile("l_extendedprice", Array(0.5), 0.0)(0)
    assert(math.abs(approx - exact) / exact < 0.05)
  }
}
