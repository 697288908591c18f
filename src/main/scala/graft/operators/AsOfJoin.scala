package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, attach the payload of the right
  * row with the greatest `rightTime <= leftTime` within the same key group
  * (the classic time-series "most recent observation" join — a capability
  * extension; the reference has no joins at all, SURVEY §2.5).
  *
  * Scale design: implemented as union + single window pass — ONE shuffle on
  * the key (both sides co-partitioned), sequential scan per key group, no
  * O(n·m) pairing and no broadcast requirement. At 100 TB this is the
  * sort-merge-shaped plan you want; for skewed keys use
  * [[lastOnOrBeforeSalted]] (built-in deterministic salting).
  */
object AsOfJoin {


  /** Shared union scaffolding for every direction: left rows tagged 1 and
    * right rows 0, payload structs carried whole, the right timestamp
    * duplicated as `__rt` — ONE definition so the three directions (and
    * the salted variant built on them) cannot drift. */
  private case class Tagged(
      unioned: DataFrame, keyCols: Seq[Column],
      leftPayloadCols: Seq[String], rightPayloadCols: Seq[String]) {
    /** Final projection: keys + left payload + matched right payload. */
    def project(df: DataFrame): DataFrame = {
      val out = keyCols ++
        leftPayloadCols.map(c => col("__l").getField(c).as(c)) ++
        rightPayloadCols.map(c => col("__match").getField(c).as(c))
      df.select(out: _*)
    }
  }

  private def tagUnion(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String): Tagged = {
    val leftPayloadCols = left.columns.filterNot(keys.contains)
    // rightTime rides along in the payload struct so callers get the
    // matched observation's own timestamp back (e.g. click_ts).
    val rightPayloadCols = right.columns.filterNot(keys.contains)
    val keyCols = keys.map(col)
    val lTagged = left.select(
      keyCols :+
        unix_micros(col(leftTime).cast("timestamp")).as("__t") :+
        lit(1).as("__tag") :+
        struct(leftPayloadCols.map(col): _*).as("__l") :+
        lit(null).cast(
          // derive ONLY the payload struct type (a projection of rightTime
          // here would need the same .cast("timestamp") as rTagged — and
          // its result was never read)
          right.select(struct(rightPayloadCols.map(col): _*).as("__rp"))
            .schema("__rp").dataType
        ).as("__r") :+
        lit(null).cast("long").as("__rt"): _*)
    val rTagged = right.select(
      keyCols :+
        unix_micros(col(rightTime).cast("timestamp")).as("__t") :+
        lit(0).as("__tag") :+
        lit(null).cast(lTagged.schema("__l").dataType).as("__l") :+
        struct(rightPayloadCols.map(col): _*).as("__r") :+
        unix_micros(col(rightTime).cast("timestamp")).as("__rt"): _*)
    Tagged(lTagged.unionByName(rTagged), keyCols, leftPayloadCols, rightPayloadCols)
  }

  /** @param right must contain `keys`, `rightTime`, and payload columns whose
    *              names don't collide with `left`'s (alias them beforehand).
    *              `rightTime` itself is part of the right payload — it comes
    *              back in the output (the matched observation's timestamp),
    *              so its NAME must also not collide with any left column;
    *              alias it (e.g. `click_ts`) if both sides call it `ts`.
    * @param toleranceUs if set, matches older than `leftTime - tolerance` are
    *                    nulled out. */
  def lastOnOrBefore(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      toleranceUs: Option[Long] = None): DataFrame = {
    val t = tagUnion(left, right, keys, leftTime, rightTime)
    // right rows sort before left rows at equal time (tag 0 < 1) → inclusive ≤
    val w = Window.partitionBy(t.keyCols: _*)
      .orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val joined = t.unioned
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .withColumn("__match_t", last(col("__rt"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)

    val withTol = toleranceUs match {
      case Some(tol) =>
        joined
          .withColumn("__ok", col("__match_t").isNotNull && col("__match_t") >= col("__t") - lit(tol))
          .withColumn("__match", when(col("__ok"), col("__match")))
      case None => joined
    }
    t.project(withTol)
  }

  /** Forward as-of join (pandas `merge_asof(direction='forward')`): for
    * each left row, the right row with the SMALLEST `rightTime >=
    * leftTime` in the key group — the "next observation" complement of
    * [[lastOnOrBefore]], same union + single-shuffle window design. The
    * union orders left rows BEFORE right rows at equal time (tag desc),
    * so the forward frame is inclusive ≥. `toleranceUs` nulls matches
    * farther than `leftTime + tolerance`. */
  def firstOnOrAfter(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      toleranceUs: Option[Long] = None): DataFrame = {
    val t = tagUnion(left, right, keys, leftTime, rightTime)
    // left rows sort before right rows at equal time (tag 1 desc-first) →
    // the forward frame includes equal-time observations (inclusive >=)
    val w = Window.partitionBy(t.keyCols: _*)
      .orderBy(col("__t"), col("__tag").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val joined = t.unioned
      .withColumn("__match", first(col("__r"), ignoreNulls = true).over(w))
      .withColumn("__match_t", first(col("__rt"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)

    val withTol = toleranceUs match {
      case Some(tol) =>
        joined.withColumn("__match",
          when(col("__match_t").isNotNull &&
            col("__match_t") <= col("__t") + lit(tol), col("__match")))
      case None => joined
    }
    t.project(withTol)
  }

  /** Nearest as-of join (pandas `merge_asof(direction='nearest')`): for
    * each left row, the right row minimizing `|rightTime − leftTime|`
    * within the key group; equidistant ties take the EARLIER right row
    * (deterministic, engine-replayable). Same union + ONE-shuffle design
    * as [[lastOnOrBefore]]: a single key-partitioned time sort serves both
    * the backward `last()` frame and the forward `first()` frame (Spark
    * reuses the exchange and sort across the two Window nodes), so the
    * cost is identical to the backward join plus one windowed projection.
    * `toleranceUs` bounds |Δ| when set (unmatched → right payload nulls). */
  def nearest(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      toleranceUs: Option[Long] = None): DataFrame = {
    val t = tagUnion(left, right, keys, leftTime, rightTime)
    // right rows sort before left rows at equal time (tag 0 < 1):
    // backward frame is inclusive ≤; the forward frame therefore excludes
    // equal-time rights, which is safe — Δ = 0 already wins backward
    val ord = Seq(col("__t"), col("__tag"))
    val wb = Window.partitionBy(t.keyCols: _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(t.keyCols: _*).orderBy(ord: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val joined = t.unioned
      .withColumn("__b", last(col("__r"), ignoreNulls = true).over(wb))
      .withColumn("__bt", last(col("__rt"), ignoreNulls = true).over(wb))
      .withColumn("__f", first(col("__r"), ignoreNulls = true).over(wf))
      .withColumn("__ft", first(col("__rt"), ignoreNulls = true).over(wf))
      .filter(col("__tag") === 1)

    val db = col("__t") - col("__bt")
    val df = col("__ft") - col("__t")
    val takeBackward = col("__bt").isNotNull &&
      (col("__ft").isNull || db <= df)
    val chosen = joined
      .withColumn("__match", when(takeBackward, col("__b")).otherwise(col("__f")))
      .withColumn("__match_t", when(takeBackward, col("__bt")).otherwise(col("__ft")))
    val withTol = toleranceUs match {
      case Some(tol) =>
        chosen.withColumn("__match",
          when(col("__match_t").isNotNull &&
            abs(col("__match_t") - col("__t")) <= lit(tol), col("__match")))
      case None => chosen
    }
    t.project(withTol)
  }

  /** Skew-hardened [[lastOnOrBefore]]: hot keys are split across `buckets`
    * salt slices so no single key serializes into one straggler task.
    *
    * Left rows are spread by `leftSalt % buckets` (pass a DETERMINISTIC
    * expression of a left column — e.g. `Sampling.bucketE4(col("id"))` —
    * so results are reproducible across runs/engines; the same salt trick
    * as [[SkewJoin.saltedInner]]); right rows are replicated to every
    * slice, so each (key, salt) window still sees the full right history
    * and per-left-row results are IDENTICAL to the unsalted join.
    *
    * Cost model: right side is duplicated ×`buckets` — the intended regime
    * is the classic skew shape (huge left event stream, bounded right
    * observation stream per key), where cutting the largest partition by
    * `buckets`× dominates the replicated-right shuffle volume. */
  def lastOnOrBeforeSalted(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      leftSalt: Column,
      buckets: Int,
      toleranceUs: Option[Long] = None): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val l = left.withColumn("__salt", pmod(leftSalt, lit(buckets)).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1)).cast("array<int>")))
    lastOnOrBefore(l, r, keys :+ "__salt", leftTime, rightTime, toleranceUs)
      .drop("__salt")
  }
}
