package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Tables

/** Operator-level timings for the dedup/similarity hot paths. */
object Perf {
  def time[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    import graft.operators.{Dedup, Similarity}
    import org.apache.spark.sql.functions.col

    // JIT warm-up pass at the smallest SF so the numbers isolate the operator
    val warm = Tables.documents(spark, "/root/testdata/sf0.001")
    Seq(Dedup.minhashPairs(warm, "doc_id", "text").count(),
      Dedup.ngramJaccardPairs(warm, "doc_id", "text").count(),
      Dedup.simhashPairs(warm, "doc_id", "text").count())
    spark.catalog.clearCache()
    time("minhashPairs")(Dedup.minhashPairs(docs, "doc_id", "text").count())
    spark.catalog.clearCache()
    time("ngramJaccardPairs")(Dedup.ngramJaccardPairs(docs, "doc_id", "text").count())
    spark.catalog.clearCache()
    time("simhashPairs")(Dedup.simhashPairs(docs, "doc_id", "text").count())
    spark.catalog.clearCache()
    time("emb_neardup")(Similarity.nearDupPairs(emb, "vec_id", "embedding", 450000).count())
    spark.catalog.clearCache()
    // same doubled corpus as the emb_neardup_lsh driver query
    time("emb_neardup_lsh") {
      val e = emb.select(col("vec_id"), col("embedding"))
      val off = e.agg(org.apache.spark.sql.functions.max("vec_id")).first().getLong(0) + 1
      val masked = e.select((col("vec_id") + off).as("vec_id"),
        org.apache.spark.sql.functions
          .expr("transform(embedding, (x, i) -> IF(i < 32, x, CAST(0.0 AS FLOAT)))")
          .as("embedding"))
      Similarity.nearDupPairsLsh(e.unionByName(masked), "vec_id", "embedding",
        600000, 8, 8).count()
    }
    spark.catalog.clearCache()
    time("ann_topk")(Similarity.bruteForceTopK(emb,
      emb.filter(col("vec_id") % 50 === 0), "vec_id", "embedding", 5).count())
    spark.stop()
  }
}
