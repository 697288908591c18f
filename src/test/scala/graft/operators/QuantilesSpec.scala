package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[Quantiles]] — distributed exact quantiles / equal-frequency
  * bucketing. Correctness is pinned against Spark's own exact built-ins
  * (`percentile`, window `ntile`) on adversarial fixtures; the scale
  * contracts are pinned as plan assertions (no full-value `Percentile`
  * aggregate, no group-partitioned window sort). */
class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic multi-group fixture: heavy ties (v mod 17), one giant
    * group, one group smaller than the grid, one singleton. */
  private def fixture(): DataFrame = {
    val rows =
      (0 until 5000).map(i => ("big", ((i * 2654435761L) % 977 % 17 * 10).toInt)) ++
      (0 until 60).map(i => ("small", (i * 37 % 23))) ++
      Seq(("one", 42))
    rows.toDF("g", "v")
  }

  test("quantileCont matches the exact percentile aggregate bit-for-bit") {
    val df = fixture()
    val ps = Seq(0.0, 0.25, 0.5, 0.75, 0.9, 1.0)
    val got = Quantiles.quantileCont(df, "g", "v", ps)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val pLit = ps.mkString("array(", ",", ")")
    val want = df.groupBy("g")
      .agg(expr(s"percentile(v, $pLit)").as("qs"))
      .collect().flatMap { r =>
        val qs = r.getSeq[Double](1)
        ps.zip(qs).map { case (p, q) => (r.getString(0), p) -> q }
      }.toMap
    assert(got.keySet == want.keySet)
    for ((k, w) <- want) assert(got(k) == w, s"at $k: got ${got(k)}, want $w")
  }

  test("quantileCont survives a tight refine budget (grid smaller than groups)") {
    val df = fixture()
    val got = Quantiles.quantileCont(df, "g", "v", Seq(0.5), gridCells = 4, accuracy = 8)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val want = df.groupBy("g").agg(expr("percentile(v, 0.5)"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == want)
  }

  test("ntileRange matches window ntile on a unique key, incl. n < k groups") {
    val rows = (0 until 2000).map(i => ("a", (i * 48271L) % 99991)) ++
      (0 until 7).map(i => ("tiny", i * 100L)) ++
      Seq(("one", 5L), ("two", 9L), ("two", 3L))
    val df = rows.toDF("g", "key")
    for (k <- Seq(2, 4, 7)) {
      val got = Quantiles.ntileRange(df, "g", "key", k)
        .select("g", "key", "tile").as[(String, Long, Int)].collect().toSet
      val w = Window.partitionBy("g").orderBy("key")
      val want = df.withColumn("tile", ntile(k).over(w))
        .as[(String, Long, Int)].collect().toSet
      assert(got == want, s"k=$k")
    }
  }

  test("quantileCont property sweep: random corpora, skewed groups, heavy ties") {
    // deterministic pseudo-random corpora across several shapes: group
    // cardinality 1..5, tie density from none to near-total, sizes that
    // straddle the grid boundary — every (group, p) must equal the
    // built-in exact aggregate bit-for-bit
    val ps = Seq(0.1, 0.25, 0.5, 0.9)
    val pLit = ps.mkString("array(", ",", ")")
    for (seed <- Seq(1, 2, 3); (nRows, mod) <- Seq((37, 5), (450, 7), (3000, 997))) {
      val rows = (0 until nRows).map { i =>
        val x = (i * 6364136223846793005L + seed * 1442695040888963407L)
        (s"g${math.floorMod(x, 5)}", math.floorMod(x >> 8, mod).toInt)
      }
      val df = rows.toDF("g", "v")
      val got = Quantiles.quantileCont(df, "g", "v", ps)
        .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
      val want = df.groupBy("g")
        .agg(expr(s"percentile(v, $pLit)").as("qs"))
        .collect().flatMap { r =>
          ps.zip(r.getSeq[Double](1)).map { case (p, q) => (r.getString(0), p) -> q }
        }.toMap
      assert(got == want, s"seed=$seed nRows=$nRows mod=$mod")
    }
  }

  test("quantileCont adversarial distributions: all-equal, two-point masses, " +
      "ties at bracket edges, extreme ps") {
    // the approx-bracket + refine plan's hard cases: degenerate sketches
    // (every bracket endpoint identical), point masses that put the whole
    // refine slice on one value, and boundary ps where n·p lands exactly
    // on a tie run's edge — each must still match the buffering built-in
    // bit-for-bit
    val ps = Seq(0.0, 0.25, 0.4, 0.5, 0.6, 1.0)
    val pLit = ps.mkString("array(", ",", ")")
    val shapes: Seq[(String, Seq[Int])] = Seq(
      // all values equal, group bigger than the default 200-cell grid
      ("all-equal", Seq.fill(5000)(42)),
      // two-point masses at 1%/99% and 50%/50%
      ("two-point-skewed", Seq.fill(50)(0) ++ Seq.fill(4950)(1000000)),
      ("two-point-even", Seq.fill(2500)(-7) ++ Seq.fill(2500)(7)),
      // tie runs sized so n·p for p=0.4/0.6 lands exactly on run edges
      ("bracket-edge-ties",
        Seq.fill(2000)(1) ++ Seq.fill(1000)(2) ++ Seq.fill(2000)(3)),
      // single row and two rows: interpolation endpoints degenerate
      ("single", Seq(13)),
      ("pair", Seq(10, 20)))
    shapes.foreach { case (label, values) =>
      val df = values.zipWithIndex.map { case (v, i) => (s"g${i % 2}", v) }
        .toDF("g", "v")
      val got = Quantiles.quantileCont(df, "g", "v", ps)
        .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
      val want = df.groupBy("g")
        .agg(expr(s"percentile(v, $pLit)").as("qs"))
        .collect().flatMap { r =>
          ps.zip(r.getSeq[Double](1)).map { case (p, q) => (r.getString(0), p) -> q }
        }.toMap
      assert(got == want, s"shape=$label")
    }
  }

  test("scale contracts: no Percentile buffering, no group-partitioned window") {
    val df = fixture()
    // exact-quantile plan must contain NO Percentile aggregate (the
    // buffer-every-value built-in) — only ApproximatePercentile sketches
    val qc = Quantiles.quantileCont(df, "g", "v", Seq(0.25, 0.5))
    val aggExprs = qc.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate =>
        a.aggregateExpressions.flatMap(_.collect {
          case e: org.apache.spark.sql.catalyst.expressions.aggregate.Percentile => e
        })
    }.flatten
    assert(aggExprs.isEmpty, "found a full-value Percentile aggregate in the plan")
    assert(qc.queryExecution.optimizedPlan.toString.contains("percentile_approx"),
      "expected the approx sketch pass")

    // every window in BOTH plans must partition by more than the bare
    // group (the refine windows key on (group, rank-id): bounded slices,
    // never one task per group value), and no NTile expression anywhere
    val nt = Quantiles.ntileRange(
      df.withColumn("key", col("v") * 10000 + monotonically_increasing_id() % 10000),
      "g", "key", 4)
    for ((name, frame) <- Seq("quantileCont" -> qc, "ntileRange" -> nt)) {
      val windows = frame.queryExecution.sparkPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      windows.foreach { w =>
        assert(w.partitionSpec.length >= 2,
          s"$name: window partitioned by ${w.partitionSpec} — one task per group value")
        val hasNtile = w.windowExpression.exists(_.collectFirst {
          case n: org.apache.spark.sql.catalyst.expressions.NTile => n
        }.nonEmpty)
        assert(!hasNtile, s"$name: NTile window function in the plan")
      }
    }
  }
}
