package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-cost probe for [[graft.operators.Dedup.ngramJaccardPairs]] at
  * sf0.1: separates shingle+hash cost, signature aggregation, band-join
  * candidate generation, and the exact-Jaccard verify, so the "slowest
  * genuine operator" work targets the real bottleneck instead of the
  * plausible one (r15 task — the r14 closing bench put dedup_ngram at
  * 2.27 s while a same-session A/B had claimed 0.99 s). The stages below
  * inline the operator's private helpers 1:1 (same pattern as
  * [[SubstrProbe]] inlining windowFrame). */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def time(label: String)(f: => Long): Unit = {
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, n)
      }.sortBy(_._1).apply(1) match {
        case (dt, n) => println(f"$label%-30s median=$dt%.3f rows=$n")
      }
    }

    import graft.operators.{Dedup, TextOps}
    val n = 5; val numHashes = 12; val numBands = 3; val rowsPerBand = 4
    val maxLenDiff = 16

    // stage 1: normalized text + char shingles + len (the scope-cached base)
    val base = docs.select(col("doc_id").as("id"), col("text").as("__text"))
      .select(col("id"), TextOps.normText(col("__text")).as("__lt"))
      .select(col("id"), TextOps.charShingles(col("__lt"), n).as("sh"),
        length(col("__lt")).cast("long").as("len"))
    time("base shingles")(base.count())
    time("base shingle volume")(
      base.select(explode(col("sh"))).count())

    // stage 2: + base hash (the md5-per-occurrence)
    val ex = base.select(col("id"), col("len"), explode_outer(col("sh")).as("s"))
    time("explode+md5 basehash")(
      ex.select(TextOps.baseHash(col("s")).as("__hv")).filter(col("__hv") >= 0).count())

    // stage 3: full signature agg (12 linear-map mins grouped by id)
    val withH = ex.withColumn("__hv", TextOps.baseHash(col("s")))
    val minCols = TextOps.hashConstants(numHashes).zipWithIndex.map {
      case ((a, b), h) => min((col("__hv") * a + b) % TextOps.HashPrime).as(s"__m$h")
    }
    val sig = withH.groupBy("id")
      .agg(minCols.head, (minCols.tail :+ min(col("len")).as("len")): _*)
      .select(col("id"), col("len"),
        array((0 until numHashes).map(h => col(s"__m$h")): _*).as("sig"))
    time("signature agg")(sig.count())

    // stage 4: band join candidates (pre-verify volume)
    val b = sig.select(col("id"), col("len"),
        posexplode(TextOps.lshBands(col("sig"), numBands, rowsPerBand))
          .as(Seq("band_ix", "band_h")))
    val cand = b.select(col("id").as("a"), col("len").as("len_a"),
        col("band_ix"), col("band_h"))
      .join(b.select(col("id").as("b"), col("len").as("len_b"),
        col("band_ix"), col("band_h")), Seq("band_ix", "band_h"))
      .filter(col("a") < col("b") && abs(col("len_a") - col("len_b")) < maxLenDiff)
      .select("a", "b")
      .dropDuplicates("a", "b")
    time("band-join candidates")(cand.count())

    // stage 3b: row-local kernel signature (the r15 rewrite)
    val ksig = base.select(col("id"), col("len"),
      graft.functions.MinhashSigArray(col("sh"),
        TextOps.hashConstants(numHashes)).as("sig"))
    time("kernel signature")(ksig.count())

    // stage 4b: band join candidates off the kernel signature (cached like
    // the operator's `banded`)
    val kb = ksig.select(col("id"), col("len"),
        posexplode(TextOps.lshBands(col("sig"), numBands, rowsPerBand))
          .as(Seq("band_ix", "band_h"))).cache()
    kb.count()
    val kcand = kb.select(col("id").as("a"), col("len").as("len_a"),
        col("band_ix"), col("band_h"))
      .join(kb.select(col("id").as("b"), col("len").as("len_b"),
        col("band_ix"), col("band_h")), Seq("band_ix", "band_h"))
      .filter(col("a") < col("b") && abs(col("len_a") - col("len_b")) < maxLenDiff)
      .select("a", "b")
      .dropDuplicates("a", "b")
    time("kernel candidates (hot)")(kcand.count())
    val candM = kcand.cache(); candM.count()
    val baseM = base.cache(); baseM.count()

    // stage 5b: verify alone on cached candidates + cached base
    val ver = candM
      .join(baseM.select(col("id").as("a"), col("sh").as("sh_a")), Seq("a"))
      .join(baseM.select(col("id").as("b"), col("sh").as("sh_b")), Seq("b"))
      .select(col("a"), col("b"), TextOps.jaccardE4(col("sh_a"), col("sh_b")).as("j_e4"))
      .filter(col("j_e4") >= 5000)
      .distinct()
    time("verify alone (hot inputs)")(ver.count())
    kb.unpersist(); candM.unpersist(); baseM.unpersist()

    // stage 5: the full operator (verify included)
    time("full dedup_ngram")(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text").count())

    spark.stop()
  }
}
