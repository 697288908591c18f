package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXACT quantiles and equal-frequency bucketing.
  *
  * Spark's built-in exact paths for these shapes do not survive scale:
  *  - `percentile(...)` buffers EVERY value of a group in executor memory
  *    (an aggregation-buffer OOM when groups are O(corpus) — the round-6
  *    verdict's `q_percentile_exact` cliff);
  *  - `ntile(k) OVER (PARTITION BY g ORDER BY v)` sorts each group in ONE
  *    task (3 distinct group values = 3 tasks regardless of cluster size —
  *    the round-6 `q_ntile` serialization).
  *
  * Both reduce to the same primitive: the exact VALUE AT A RANK inside a
  * group, which distributes as approx-bracket + narrow refine:
  *
  *  1. one pass computes per-group counts and a fixed grid of approximate
  *     quantiles (`percentile_approx`, a bounded GK-style sketch with a
  *     deterministic rank-error guarantee of n/accuracy — partial+final
  *     aggregation, no value buffering);
  *  2. each wanted rank k maps to a bracketing value window [lo, hi] from
  *     the grid — by the sketch's error bound the rank-k value provably
  *     lies inside it;
  *  3. one pass counts values below lo and aggregates the DISTINCT values
  *     (with multiplicities) inside the window — per wanted rank that is
  *     ~n·(2/gridCells + 2/accuracy) rows, the tunable refine budget, NOT
  *     the group — and a cumulative count over that small set reads the
  *     exact order statistic off.
  *
  * Every stage is a shuffle-partitioned aggregate or a bounded-partition
  * window (partitioned by (group, rank-id), never by group alone), so the
  * plan holds at any group size: 100× data grows the refine windows 100×
  * but they stay a ~1-2% slice spread across the cluster, and the knobs
  * (`gridCells`, `accuracy`) tighten the slice at will. Results are
  * EXACT — the sketch only narrows where to look.
  *
  * Reference context: fossil has no quantile surface at all (`reduce` folds
  * scalars only, `pkg/query/plan/pipeline.go:65-94`); these are scale
  * extensions in SURVEY.md §2.5.
  */
object Quantiles {

  /** Exact per-group order statistics, fully distributed.
    *
    * @param data  input frame
    * @param g     group column name
    * @param v     value column (orderable; exactness is bit-exact for
    *              integral types — brackets and refine compare raw values)
    * @param ranks wanted ranks: (rid, n => k) — `rid` labels the request,
    *              the function builds the 0-based rank from the group count
    *              column (so callers can ask for floor(p·(n-1)), bucket
    *              boundaries, medians … without knowing counts up front)
    * @return one row per (group, rid): (g, rid, n, k, value)
    */
  def valueAtRanks(
      data: DataFrame, g: String, v: String,
      ranks: Seq[(String, Column => Column)],
      gridCells: Int = 200, accuracy: Int = 10000): DataFrame = {
    require(ranks.nonEmpty, "need at least one wanted rank")
    require(gridCells >= 4 && accuracy >= 2 * gridCells,
      s"need gridCells >= 4 and accuracy >= 2*gridCells, got $gridCells/$accuracy")
    val m = gridCells
    val grid = array((0 to m).map(i => lit(i.toDouble / m)): _*)

    // pass 1: per-group count + approximate quantile grid (partial+final
    // agg; sketch size is O(accuracy), independent of the group)
    val stats = data.groupBy(col(g))
      .agg(count(col(v)).as("__n"),
        percentile_approx(col(v), grid, lit(accuracy)).as("__qs"))

    // wanted ranks with bracketing grid windows. Index math (0-based grid
    // cell i approximates rank i·n/m with error ≤ n/accuracy + 1): a ±2
    // cell margin dominates the sketch error for n ≥ m·... any n ≥ m;
    // groups smaller than the grid just take the whole-range bracket —
    // their refine window is the (tiny) group itself.
    val wanted = stats
      .select(col(g), col("__n"), col("__qs"),
        explode(array(ranks.map { case (rid, f) =>
          struct(lit(rid).as("rid"), f(col("__n")).cast("long").as("k"))
        }: _*)).as("__w"))
      .select(col(g), col("__n"), col("__qs"),
        col("__w.rid").as("__rid"), col("__w.k").as("__k"))
      .filter(col("__n") > 0)
      .withColumn("__cell", floor(col("__k") * m / col("__n")))
      .withColumn("__ilo",
        when(col("__n") < m, lit(0L))
          .otherwise(greatest(col("__cell") - 2, lit(0L))))
      .withColumn("__ihi",
        when(col("__n") < m, lit(m.toLong))
          .otherwise(least(col("__cell") + 2, lit(m.toLong))))
      .select(col(g).as("__g"), col("__rid"), col("__n"), col("__k"),
        element_at(col("__qs"), (col("__ilo") + 1).cast("int")).as("__lo"),
        element_at(col("__qs"), (col("__ihi") + 1).cast("int")).as("__hi"))

    // pass 2, ONE aggregation for both refine inputs: rows inside the
    // bracket keep their value as the group key (distinct values with
    // multiplicities); rows outside collapse into one null-keyed group
    // per (g, rid) whose conditional sum counts exactly the values
    // strictly below the bracket. `wanted` is groups × ranks rows — no
    // broadcast HINT: in the target regime (few huge groups) AQE
    // broadcasts it from runtime stats anyway, while a high-cardinality
    // group column (where a forced broadcast could OOM the driver)
    // degrades to a shuffle join that is still correct.
    val joined = data.join(wanted, col(g) === col("__g"))
    val refine = joined
      .withColumn("__v",
        when(col(v) >= col("__lo") && col(v) <= col("__hi"), col(v)))
      .groupBy("__g", "__rid", "__n", "__k", "__v")
      .agg(count(lit(1)).as("__c"),
        sum(when(col(v) < col("__lo"), 1L).otherwise(0L)).as("__bl"))

    // pass 3: the below-count surfaces from the null-keyed row via an
    // unordered window over the SAME (group, rank) partition the ordered
    // cumulative count uses — one downstream consumer, no second scan,
    // no cache, one shuffle. Both window partitions are the REFINE SLICE
    // (bounded by the knobs), so the per-task sort stays small no matter
    // how large the group is. The rank-k value is the row whose
    // [start, end) count range covers k.
    val part = Window.partitionBy("__g", "__rid")
    refine
      .withColumn("__below",
        coalesce(max(when(col("__v").isNull, col("__bl"))).over(part), lit(0L)))
      .filter(col("__v").isNotNull)
      .withColumn("__cum", sum(col("__c")).over(part.orderBy("__v")))
      .withColumn("__start", col("__below") + col("__cum") - col("__c"))
      .filter(col("__k") >= col("__start") && col("__k") < col("__start") + col("__c"))
      .select(col("__g").as(g), col("__rid").as("rid"), col("__n").as("n"),
        col("__k").as("k"), col("__v").as("value"))
  }

  /** Exact interpolated quantiles (SQL `percentile` / DuckDB
    * `quantile_cont` semantics: h = p·(n−1), linear interpolation between
    * the values at ranks ⌊h⌋ and ⌊h⌋+1) — distributed, no per-group value
    * buffering. Output: one row per (group, p): (g, p, q: double).
    *
    * The interpolation arithmetic mirrors Spark's `Percentile.getPercentile`
    * (lower + (higher − lower)·frac, all in doubles), so results are
    * bit-identical to the built-in exact aggregate. */
  def quantileCont(
      data: DataFrame, g: String, v: String, ps: Seq[Double],
      gridCells: Int = 200, accuracy: Int = 10000): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1), s"bad fractions $ps")
    val ranks = ps.flatMap { p =>
      Seq(
        s"$p:lo" -> ((n: Column) => floor(lit(p) * (n - 1))),
        s"$p:hi" -> ((n: Column) => least(floor(lit(p) * (n - 1)) + 1, n - 1)))
    }
    val at = valueAtRanks(data, g, v, ranks, gridCells, accuracy)
      .withColumn("p", split(col("rid"), ":").getItem(0).cast("double"))
      .withColumn("__side", split(col("rid"), ":").getItem(1))
    at.groupBy(col(g), col("p"))
      .agg(
        max(col("n")).as("__n"),
        max(when(col("__side") === "lo", col("value"))).as("__vlo"),
        max(when(col("__side") === "lo", col("k"))).as("__klo"),
        max(when(col("__side") === "hi", col("value"))).as("__vhi"))
      .select(col(g), col("p"),
        (col("__vlo").cast("double") +
          (col("p") * (col("__n") - 1) - col("__klo")) *
            (col("__vhi").cast("double") - col("__vlo").cast("double"))).as("q"))
  }

  /** Equal-frequency bucketing with window-`ntile` semantics (first n mod k
    * buckets take the extra row), by RANGE ASSIGNMENT against exact bucket
    * boundary keys — parallel in corpus size, not group cardinality.
    *
    * `key` must TOTALLY order rows within each group (no ties) — compose a
    * unique key (e.g. value ⊕ row id) exactly as you would disambiguate the
    * window version's ORDER BY. The boundary for bucket b is the key at
    * 0-based rank end_b − 1 (end_b = b·⌊n/k⌋ + min(b, n mod k)); a row's
    * tile is 1 + #{boundaries < key}, evaluated against the ≤ k−1 boundary
    * keys carried per group — one broadcastable side-frame, no per-group
    * sort anywhere.
    *
    * The window `ntile` stays the right call when groups are KNOWN small
    * (bounded per-task sort); this is the path that holds when a group is
    * O(corpus). Output: input columns + `tile`. */
  def ntileRange(
      data: DataFrame, g: String, key: String, numTiles: Int,
      gridCells: Int = 200, accuracy: Int = 10000): DataFrame = {
    require(numTiles >= 1, s"numTiles must be >= 1, got $numTiles")
    if (numTiles == 1) return data.withColumn("tile", lit(1))
    val ranks = (1 until numTiles).map { b =>
      s"b$b" -> ((n: Column) =>
        lit(b.toLong) * floor(n / numTiles) + least(lit(b.toLong), n % numTiles) - 1)
    }
    // ≤ numTiles−1 boundary keys per group; AQE broadcasts when groups
    // are few (the target regime) without risking a forced broadcast of
    // a high-cardinality bounds side
    val bounds = valueAtRanks(data, g, key, ranks, gridCells, accuracy)
      .groupBy(col(g).as("__bg"))
      .agg(sort_array(collect_list(col("value"))).as("__bnds"))
    data.join(bounds, col(g) === col("__bg"), "left")
      .withColumn("tile",
        (lit(1) + coalesce(
          size(filter(col("__bnds"), b => b < col(key))), lit(0))).cast("int"))
      .drop("__bg", "__bnds")
  }
}
