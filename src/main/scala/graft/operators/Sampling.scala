package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus subsampling for training-data pipelines.
  *
  * Training mixes are specified as per-stratum rates ("keep 25% of en,
  * 50% of everything else") and must be REPRODUCIBLE: the same corpus and
  * rates must select the same documents on any engine, any partitioning,
  * any day — which rules out `rand()`/`sampleBy` seeds (engine-specific
  * RNG streams) and ordering-dependent reservoir schemes. The selector
  * here is a pure function of the row id: md5's first 4 hex digits →
  * an integer bucket in [0, 10000) → keep iff bucket < rateE4(stratum).
  *
  * Scale: one narrow projection + filter, no shuffle, no state — the plan
  * is a scan with a codegen'd predicate, embarrassingly parallel at any
  * corpus size. Rates are exact to ~1e-4 with a small deterministic bias
  * from 65536 % 10000 ≠ 0 (buckets 0–5535 are hit 7/65536, the rest
  * 6/65536) — irrelevant for sampling semantics and identical in every
  * engine, which is the property that matters.
  *
  * The reference has no sampling surface beyond time-based `sample(q)`
  * (`docs/grammar.md`); this is a SURVEY §2.5 pipeline extension.
  */
object Sampling {

  /** Bucket in [0, 10000): first 4 hex digits of md5(id as string). */
  def bucketE4(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 4), 16, 10).cast("long") % 10000

  /** Weighted sampling WITHOUT replacement (Efraimidis & Spirakis 2006,
    * algorithm A-ES): each row draws `u ~ U(0,1]` and the k rows with the
    * largest `u^(1/w)` — equivalently the SMALLEST `-ln(u)/w` — form an
    * exact weighted sample. The training-data use is quality-weighted
    * selection: w = a quality/length score, and the sample leans toward
    * high-weight docs while every doc keeps a nonzero chance.
    *
    * Reproducibility contract (same as [[stratified]]): `u` is not an
    * engine RNG but a pure function of the row id — the 32-bit md5 prefix
    * of `salt|id`, mapped to (0, 1] by `(h+1)/(2³²+1)` so `ln` never sees
    * zero. The surfaced key is e12-rounded to a LONG and ties break by
    * id, so the top-k cut is engine-exact (ln on the shared libm is the
    * same parity story as the NLL rows).
    *
    * Scale: one narrow codegen'd projection, then `orderBy(key).limit(k)`
    * — Spark plans that as TakeOrderedAndProject (per-partition top-k,
    * merge on the driver: k-bounded, never a full sort shuffle).
    * Non-positive weights are dropped up front (a zero weight would make
    * the key division ANSI-throw; semantically w ≤ 0 means "never
    * sample"). Weights are expected at count/score magnitude (≥ ~1e-6);
    * a pathological weight below ~1e-9 pushes the e12 key past Long
    * range, which fails LOUDLY under ANSI's overflow-checked cast rather
    * than silently wrapping. Returns `(id, weight, key_e12)`, ascending
    * key order. */
  def weightedTopK(
      df: DataFrame, idCol: String, weightCol: String, k: Int,
      salt: String = "ws"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val h = conv(substring(
      md5(concat_ws("|", lit(salt), col(idCol).cast("string"))), 1, 8),
      16, 10).cast("long")
    val u = (h.cast("double") + lit(1.0)) / lit(4294967297.0) // (0, 1]
    df.filter(col(weightCol).cast("double") > 0)
      .select(col(idCol), col(weightCol),
        round(-log(u) / col(weightCol).cast("double") * lit(1e12), 0)
          .cast("long").as("key_e12"))
      .orderBy(col("key_e12"), col(idCol))
      .limit(k)
  }

  /** Keep each row iff its id-bucket < the stratum's rate (parts per
    * 10,000). Unlisted strata use `defaultE4`. Appends nothing: the
    * result is the input rows that survived, unchanged. */
  def stratified(
      df: DataFrame, idCol: String, stratumCol: String,
      ratesE4: Map[String, Int], defaultE4: Int): DataFrame = {
    require((ratesE4.values ++ Seq(defaultE4)).forall(r => r >= 0 && r <= 10000),
      s"rates are parts-per-10000, got ${ratesE4.values.toSeq :+ defaultE4}")
    val rate = ratesE4.foldLeft(lit(defaultE4)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(bucketE4(col(idCol)) < rate)
  }
}
