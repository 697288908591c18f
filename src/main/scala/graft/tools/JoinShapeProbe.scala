package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** What join strategy do the stored-reference substring paths actually get
  * per micro-batch, and how big is each side? Builds the same window store
  * the battery rows use and explains/times one batch-sized probe. */
object JoinShapeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Dedup, SubstringWindowStore}

    val docs = graft.Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val root = java.nio.file.Files.createTempDirectory("graft_jsp").toString
    val params = SubstringWindowStore.Params(k = 10)
    SubstringWindowStore.build(docs, "doc_id", "text", root, "base", params)
    val ref = SubstringWindowStore.windows(spark, root, "base", params)
    println(s"ref windows rows = ${ref.count()}")
    val refBytes = ref.queryExecution.optimizedPlan.stats.sizeInBytes
    println(s"ref estimated bytes = $refBytes")

    // one micro-batch: ~1/40 of docs (the stream fixtures replay ~10% of
    // docs over 4 files)
    val batch = docs.filter(col("doc_id") % 40 === 0)
    println(s"batch rows = ${batch.count()}")

    val spans = Dedup.dropSharedSpansAgainstRef(batch, "doc_id", "text", ref, params)
    println("---- dropSharedSpansAgainstRef plan (joins only):")
    spans.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange"))
      .foreach(l => println("  " + l.trim.take(150)))
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    time("spans warm1") { spans.write.format("noop").mode("overwrite").save() }
    time("spans warm2") { spans.write.format("noop").mode("overwrite").save() }

    // prototype: flipped spans join — broadcast the BATCH's distinct keys
    // into a semi probe over the (persisted) ref scan, then broadcast the
    // small shared-key set back over the batch windows; the ref is never
    // hashed into a broadcast relation and never shuffled
    {
      val refP = ref.persist()
      refP.count()
      val spansP = Dedup.dropSharedSpansAgainstRef(batch, "doc_id", "text", refP, params)
      time("spans refPersist w1") { spansP.write.format("noop").mode("overwrite").save() }
      time("spans refPersist w2") { spansP.write.format("noop").mode("overwrite").save() }
      time("spans refPersist w3") { spansP.write.format("noop").mode("overwrite").save() }
      refP.unpersist()
    }
    val pairs = Dedup.substringPairsAgainstRef(batch, "doc_id", "text", ref, params)
    println("---- substringPairsAgainstRef plan (joins only):")
    pairs.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange"))
      .foreach(l => println("  " + l.trim.take(150)))
    time("pairs warm1") { pairs.write.format("noop").mode("overwrite").save() }
    time("pairs warm2") { pairs.write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
