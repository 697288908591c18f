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
