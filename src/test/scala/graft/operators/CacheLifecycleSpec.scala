package graft.operators

import graft.SparkSpec

/** The storage-lifecycle contract for every battery operator: after an
  * operator's action completes, the session's cache manager must drain to
  * EMPTY without anyone calling `clearCache()`. Long-lived server sessions
  * (WireServer) run these operators for arbitrary lifetimes — a Dataset
  * cache that nothing unpersists is an unbounded storage-memory leak there
  * (the round-5 footgun).
  *
  * Mechanisms under test:
  *  - self-join/join-back inputs use [[OperatorCache.scoped]]: cached for
  *    the materializing action (compute-once, in-memory columnar — the
  *    fast shape; asserted via InMemoryTableScan in the executed plan),
  *    then released by the session's QueryExecutionListener as soon as the
  *    action completes (asserted by polling the cache manager, since
  *    listener delivery is asynchronous);
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

  private def cacheManagerEmpty: Boolean =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager.isEmpty

  /** Listener callbacks ride the async listener bus; give them a bounded
    * moment rather than asserting instantly. */
  private def eventuallyEmpty(label: String): Unit = {
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while (!cacheManagerEmpty && System.nanoTime() < deadline) Thread.sleep(50)
    assert(cacheManagerEmpty, s"$label left cached plans registered in the cache manager")
  }

  // every operator whose implementation caches (directly or via
  // composition), plus the store path; each runs a real action and must
  // leave nothing behind
  private val ops = Seq(
    "dedup_minhash", "dedup_ngram", "dedup_simhash",
    "dedup_clusters", "dedup_clusters_dist", "dedup_against_ref",
    "emb_neardup_lsh", "emb_neardup_srp", "ann_ivf_int8",
    "pipeline_curate", "store_roundtrip",
    "q_percentile_exact", "q_ntile")

  for (name <- ops)
    test(s"$name leaves the cache manager empty after its action") {
      val df = graft.SparkEntry.queries(name)(spark, sf)
      df.count()
      eventuallyEmpty(name)
    }

  // compute-once evidence: during the action the expensive shared frames
  // really were served from the scoped cache (InMemoryTableScan in the
  // executed plan), so the empty cache manager was not bought by paying
  // the signature/banding computation once per consumer
  for (name <- Seq("dedup_minhash", "dedup_ngram", "dedup_simhash", "emb_neardup_lsh",
      "ann_ivf_int8"))
    test(s"$name serves its shared frames from the scoped cache during the action") {
      val df = graft.SparkEntry.queries(name)(spark, sf)
      df.collect() // executes THIS queryExecution so the adaptive plan finalizes
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("InMemoryTableScan") || plan.contains("TableCacheQueryStage"),
        s"$name executed plan shows no in-memory scan of the scoped cache:\n" +
          plan.linesIterator.take(40).mkString("\n"))
      eventuallyEmpty(name)
    }

  test("scoped caches release even when the action FAILS") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sf)
      // a udf that throws at execution time, after the scoped cache is set up
      .withColumn("doc_id", udf((id: Long) =>
        if (id >= 0) throw new RuntimeException("boom") else id).apply(col("doc_id")))
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text")
    intercept[Exception] { pairs.count() }
    eventuallyEmpty("failed action")
  }
}
