package graft.plans

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The optimizer rule mirrors time predicates onto the raw nanos column so
  * plain DataFrame filters prune Parquet row groups like the FQL path. */
class RawTimePushdownSpec extends SparkSpec {

  private def withRule[A](f: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RawTimePushdown
    try f
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == RawTimePushdown)
  }

  test("plain DataFrame time filter reaches the parquet scan") {
    val entries = Tables.eventEntries(spark, "/root/testdata/sf0.001")
    // micros-era fixtures: `time` IS the source column, so the filter pushes
    // down natively and the rule has nothing to add; nanos-era fixtures:
    // `time` is derived, so only the rule's mirrored raw-ns bound reaches
    // the scan. Either way, WITH the rule the scan must be pruned.
    val derivedTime = entries.schema("__t_ns").dataType ==
      org.apache.spark.sql.types.LongType &&
      Tables.read(spark, "/root/testdata/sf0.001", "events")
        .schema("ts").dataType == org.apache.spark.sql.types.LongType
    val q = entries.filter(col("time") >= lit(java.sql.Timestamp.valueOf("2024-01-15 00:00:00")))
    if (derivedTime) {
      val before = q.queryExecution.executedPlan.toString
      assert(!before.contains("GreaterThanOrEqual(ts,"))
    }
    withRule {
      val q2 = entries.filter(col("time") >= lit(java.sql.Timestamp.valueOf("2024-01-15 00:00:00")))
      val plan = q2.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters") && plan.contains("GreaterThanOrEqual(ts,"))
      // identical results with and without the rule
      assert(q2.count() == q.count())
    }
  }

  test("pre-1970 raw values survive (div truncates toward zero, not floor)") {
    import spark.implicits._
    // -500ns truncates to 0µs: time >= epoch must keep it
    val df = Seq(-1500L, -500L, 0L, 500L).toDF("__t_ns")
      .withColumn("time", timestamp_micros(expr("__t_ns div 1000")))
    withRule {
      val zero = timestamp_micros(lit(0L))
      assert(df.filter(col("time") >= zero).count() == 3) // -500, 0, 500
      assert(df.filter(col("time") <= zero).count() == 4) // all truncate to <= 0
      assert(df.filter(col("time") < zero).count() == 1)  // only -1500 (-1µs)
    }
  }

  test("equality predicates converge and mirror as two separate bounds") {
    import spark.implicits._
    val df = Seq(999L, 1000L, 1999L, 2000L).toDF("__t_ns")
      .withColumn("time", timestamp_micros(expr("__t_ns div 1000")))
    withRule {
      // a fused And mirror would be split and re-added forever by the
      // fixed-point batch (hard failure under spark.testing); two bare
      // conjuncts dedup cleanly — this merely has to not explode and match
      val q = df.filter(col("time") === timestamp_micros(lit(1L)))
      assert(q.count() == 2) // 1000, 1999 truncate to 1µs
      val optimized = q.queryExecution.optimizedPlan.toString
      // exactly one mirrored bound of each direction survives
      assert("GreaterThanOrEqual\\(__t_ns".r.findAllIn(optimized).size <= 1)
      assert("LessThanOrEqual\\(__t_ns".r.findAllIn(optimized).size <= 1)
    }
  }

  test("out-of-range timestamp literals saturate instead of wrapping") {
    import spark.implicits._
    val df = Seq(-1500L, 0L, 1500L).toDF("__t_ns")
      .withColumn("time", timestamp_micros(expr("__t_ns div 1000")))
    withRule {
      // year 1000 / year 9999: micros × 1000 overflows Long — a wrapped
      // bound silently excluded every row; saturated bounds keep them all
      val ancient = java.sql.Timestamp.valueOf("1000-01-01 00:00:00")
      val distant = java.sql.Timestamp.valueOf("9999-01-01 00:00:00")
      assert(df.filter(col("time") >= lit(ancient)).count() == 3)
      assert(df.filter(col("time") <= lit(distant)).count() == 3)
      assert(df.filter(col("time") >= lit(distant)).count() == 0)
      assert(df.filter(col("time") <= lit(ancient)).count() == 0)
    }
  }

  test("strict bounds translate exactly at the micros boundary") {
    import spark.implicits._
    // raw nanos 1000..1999 all truncate to time = 1µs
    val df = Seq(999L, 1000L, 1999L, 2000L).toDF("__t_ns")
      .withColumn("time", timestamp_micros(expr("__t_ns div 1000")))
    withRule {
      def cnt(c: org.apache.spark.sql.Column): Long = df.filter(c).count()
      val oneUs = timestamp_micros(lit(1L))
      assert(cnt(col("time") >= oneUs) == 3)
      assert(cnt(col("time") > oneUs) == 1)  // only 2000 (2µs)
      assert(cnt(col("time") <= oneUs) == 3) // 999 (0µs) + 1000 + 1999
      assert(cnt(col("time") < oneUs) == 1)  // only 999
    }
  }
}
