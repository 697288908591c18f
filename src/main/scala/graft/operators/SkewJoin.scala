package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * At 100 TB a handful of hot keys (the "null user", the one viral item)
  * concentrate a shuffle partition onto one task. AQE's skew-join split
  * (`spark.sql.adaptive.skewJoin.*`) handles sort-merge cases at runtime;
  * this operator is the explicit formulation for when you know the build
  * side is small enough to replicate: the probe side gets a random salt in
  * `[0, buckets)`, the build side is replicated across every salt value, and
  * the join key becomes `(key, salt)` — hot keys fan out over `buckets`
  * tasks instead of one.
  *
  * The salt spreads rows by their position in the partition
  * (`monotonically_increasing_id`), not by row content — a hot key whose
  * rows are IDENTICAL (the common skew case) would otherwise hash to one
  * salt and not fan out at all. The salt value only affects placement; the
  * join RESULT is identical for any salt assignment, so output stays
  * deterministic.
  */
object SkewJoin {

  /** Inner equi-join `probe.key == build.key` with the probe side salted and
    * the (small) build side replicated `buckets` times. */
  def saltedInner(
      probe: DataFrame, build: DataFrame, key: String, buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val salted = probe.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(buckets.toLong)).cast("int"))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
