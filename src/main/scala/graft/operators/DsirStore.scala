package graft.operators

import java.nio.charset.StandardCharsets

import graft.engine.StoreFs


import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted DSIR weight table for incremental importance scoring.
  *
  * [[Curation.dsirResample]] fits its log-ratio table inline — right for
  * one-shot selection, wrong for the published deployment, where the
  * hashed-n-gram importance model is fit ONCE against a frozen
  * target/raw pair and every new crawl batch is scored under it (DSIR's
  * own pipeline: fit on Wikipedia-vs-Pile, then stream the raw corpus
  * through the frozen weights). This is the [[LmStore]] pattern applied
  * to the dim-sized table: build persists `(j, lr_e6)` + a params
  * marker; score reads it back and runs [[Curation.dsirScore]] — shared
  * code, so stored and inline semantics cannot drift.
  *
  * Layout under `root/corpusId/`:
  *   - `weights.parquet`  (j, lr_e6) — exactly dim rows
  *   - `_params`          `Tag dim=N`, written LAST as the commit marker
  *                        (a crashed build leaves no marker and rebuilds;
  *                        a tag bump invalidates old stores instead of
  *                        silently mixing bucket schemes)
  *
  * 100 TB story: build = the inline fit's one dim-keyed aggregate,
  * written once; score reads only the dim-row artifact (one driver
  * collect, centroid/codebook size class) and is a ZERO-exchange
  * codegen map over the batch — per-batch cost ∝ batch, never ∝ the
  * fit corpora. */
object DsirStore {

  /** Bumped when the bucket scheme (unigram+bigram, md5 16-bit) or the
    * smoothing changes. */
  val Tag = "dsir-uni+bi-md5x16.v1"

  private def dir(root: String, corpusId: String): String = s"$root/$corpusId"
  private def marker(root: String, corpusId: String): String =
    s"${dir(root, corpusId)}/_params"

  private def markerText(root: String, corpusId: String): Option[String] = {
    val m = marker(root, corpusId)
    if (StoreFs.exists(m))
      Some(new String(StoreFs.readBytes(m), StandardCharsets.UTF_8))
    else None
  }

  /** Parse a commit marker into its declared dim. Accepts both the
    * nonce-stamped form `Tag dim=N nonce=X` and the pre-nonce `Tag dim=N`
    * (stores built by earlier library versions stay readable). */
  private def markerDim(m: String): Option[Int] = {
    val parts = m.split(" ")
    if (parts.length >= 2 && parts(0) == Tag && parts(1).startsWith("dim="))
      parts(1).stripPrefix("dim=").toIntOption
    else None
  }

  /** True iff a complete store exists under the current [[Tag]] and dim. */
  def isBuilt(root: String, corpusId: String, dim: Int): Boolean =
    markerText(root, corpusId).exists(m => markerDim(m).contains(dim))

  /** Fit and persist the weight table; idempotent per
    * (corpusId, [[Tag]], dim) — a matching store is left untouched,
    * anything else wiped and rebuilt. */
  def build(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, dim: Int, root: String, corpusId: String): Unit = {
    if (isBuilt(root, corpusId, dim)) return
    val d = dir(root, corpusId)
    StoreFs.deleteRecursive(d)
    StoreFs.mkdirs(d)
    Curation.dsirLogRatios(docs, idCol, textCol, isTarget, dim)
      .write.mode("overwrite").parquet(s"$d/weights.parquet")
    // the nonce makes every build's marker TEXT unique, so the broadcast
    // cache below can never serve a previous build's weights — mtime alone
    // is not a freshness signal (same-millisecond rebuilds, coarse-mtime
    // filesystems; r16 ADVICE)
    StoreFs.writeAtomic(marker(root, corpusId),
      s"$Tag dim=$dim nonce=${java.util.UUID.randomUUID()}"
        .getBytes(StandardCharsets.UTF_8))
    ()
  }

  /** Per-JVM broadcast cache: re-reading + re-broadcasting the weight
    * table on EVERY score call leaked one (small, dim-sized) broadcast
    * per invocation — unbounded over a long scoring session. Keyed by
    * (root, corpusId, marker text, marker mtime): the marker is written
    * LAST by [[build]] and carries a per-build nonce, so a rebuild under
    * the same root always changes the marker TEXT and can never serve
    * stale weights from here (mtime stays in the key only for pre-nonce
    * stores, where it is the best-effort freshness signal). */
  private val bcCache = new java.util.concurrent.ConcurrentHashMap[
    (String, String, String, Long),
    org.apache.spark.broadcast.Broadcast[Array[Long]]]

  /** Score `docs` under the stored weights — [[Curation.dsirScore]]'s
    * output shape `(id, n_grams, score_e6)`. The dim comes from the
    * commit marker; a weights file whose row count disagrees with it
    * fails loudly (a silently short table would zero-score the missing
    * buckets and masquerade as a verdict). */
  def score(spark: SparkSession, root: String, corpusId: String,
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val m = markerText(root, corpusId).getOrElse(
      throw new IllegalStateException(
        s"no committed DSIR store under $root/$corpusId"))
    val dim = markerDim(m).getOrElse(throw new IllegalStateException(
      s"DSIR store $root/$corpusId was built under '$m', need '$Tag' — rebuild"))
    val mtime = StoreFs.stamp(marker(root, corpusId)).map(_._1).getOrElse(0L)
    val bc = bcCache.computeIfAbsent((root, corpusId, m, mtime), _ => {
      val rows = spark.read
        .parquet(s"${dir(root, corpusId)}/weights.parquet")
        .select(col("j").cast("int"), col("lr_e6").cast("long"))
        .collect()
      require(rows.length == dim,
        s"DSIR store $root/$corpusId holds ${rows.length} buckets, marker says $dim")
      val lrArr = new Array[Long](dim)
      rows.foreach(r => lrArr(r.getInt(0)) = r.getLong(1))
      spark.sparkContext.broadcast(lrArr)
    })
    Curation.dsirScore(docs, idCol, textCol, bc, dim)
  }

}
