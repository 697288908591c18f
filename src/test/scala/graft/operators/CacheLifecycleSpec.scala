package graft.operators

import graft.SparkSpec

/** The storage-lifecycle contract for every battery operator: after an
  * operator's action completes, the session's cache manager must be EMPTY
  * without anyone calling `clearCache()`. Long-lived server sessions
  * (WireServer) run these operators for arbitrary lifetimes — a Dataset
  * cache that nothing unpersists is an unbounded storage-memory leak there.
  *
  * Two mechanisms satisfy the contract:
  *  - self-join/join-back inputs are NOT cached at all; their compute-once
  *    behavior comes from AQE exchange reuse (both consumers shuffle the
  *    same canonical subtree, the second side becomes a ReusedExchange over
  *    the first's disk-backed shuffle output) — asserted here on the
  *    executed adaptive plan;
  *  - genuinely eager operators (connected components, k-means, store
  *    append) cache inside a try/finally-unpersist scope.
  */
class CacheLifecycleSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {

  /** Other suites share this session and some cache deliberately; one
    * clean-slate clear BEFORE any operator runs isolates the assertion —
    * the contract under test is that no clear is needed AFTER them. */
  override def beforeAll(): Unit = spark.catalog.clearCache()

  private val sf = "/root/testdata/sf0.001"

  // every operator whose implementation historically cached, plus the
  // composite pipeline; each runs a real action and must leave nothing
  // behind in the cache manager
  private val ops = Seq(
    "dedup_minhash", "dedup_ngram", "dedup_simhash",
    "dedup_clusters", "dedup_clusters_dist",
    "emb_neardup_lsh", "ann_ivf_int8",
    "pipeline_curate", "store_roundtrip")

  for (name <- ops)
    test(s"$name leaves the cache manager empty after its action") {
      val df = graft.SparkEntry.queries(name)(spark, sf)
      df.count()
      assert(spark.sharedState.cacheManager.isEmpty,
        s"$name left cached plans registered in the cache manager")
    }

  // compute-once evidence: the band self-join really is planned as one
  // shuffle + ReusedExchange, so dropping the cache did not buy the empty
  // cache manager by paying the signature computation twice
  for (name <- Seq("dedup_minhash", "dedup_ngram", "emb_neardup_lsh"))
    test(s"$name executes its self-join via ReusedExchange, not recompute") {
      val df = graft.SparkEntry.queries(name)(spark, sf)
      df.collect() // executes THIS queryExecution, so the adaptive plan finalizes
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("ReusedExchange"),
        s"$name adaptive plan has no ReusedExchange:\n" +
          plan.linesIterator.take(60).mkString("\n"))
    }
}
