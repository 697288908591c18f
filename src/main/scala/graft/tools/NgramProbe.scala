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

    // stage 3b: row-local kernel signature (the r15 rewrite), carrying the
    // distinct-shingle count the r16 size-bound gate rides on
    val ksig = base.withColumn("cnt", size(col("sh")).cast("long"))
      .select(col("id"), col("len"), col("cnt"),
        graft.functions.MinhashSigArray(col("sh"),
          TextOps.hashConstants(numHashes)).as("sig"))
    time("kernel signature")(ksig.count())

    // stage 4b: band join candidates off the kernel signature (cached like
    // the operator's `banded`) — length gate only (the pre-r16 candidate set)
    val kb = ksig.select(col("id"), col("len"), col("cnt"),
        posexplode(TextOps.lshBands(col("sig"), numBands, rowsPerBand))
          .as(Seq("band_ix", "band_h"))).cache()
    kb.count()
    def candJoin(extraKeep: org.apache.spark.sql.Column) =
      kb.select(col("id").as("a"), col("len").as("len_a"),
          col("cnt").as("cnt_a"), col("band_ix"), col("band_h"))
        .join(kb.select(col("id").as("b"), col("len").as("len_b"),
          col("cnt").as("cnt_b"), col("band_ix"), col("band_h")),
          Seq("band_ix", "band_h"))
        .filter(col("a") < col("b")
          && abs(col("len_a") - col("len_b")) < maxLenDiff && extraKeep)
        .select("a", "b")
        .dropDuplicates("a", "b")
    val kcand = candJoin(lit(true))
    time("kernel candidates (hot)")(kcand.count())
    // stage 4c: + the exact-safe Jaccard size bound (r16):
    // min/max·10⁴ ≥ τ−0.5 over the carried counts — only these pairs
    // reach the array join-back in the shipping operator
    val kcandB = candJoin(
      least(col("cnt_a"), col("cnt_b")) * lit(20000L)
        >= greatest(col("cnt_a"), col("cnt_b")) * lit(2L * 5000L - 1L))
    time("bounded candidates (hot)")(kcandB.count())
    val candM = kcand.cache(); candM.count()
    val candBM = kcandB.cache(); candBM.count()
    val baseM = base.cache(); baseM.count()

    def verify(cand: org.apache.spark.sql.DataFrame) = cand
      .join(baseM.select(col("id").as("a"), col("sh").as("sh_a")), Seq("a"))
      .join(baseM.select(col("id").as("b"), col("sh").as("sh_b")), Seq("b"))
      .select(col("a"), col("b"), TextOps.jaccardE4(col("sh_a"), col("sh_b")).as("j_e4"))
      .filter(col("j_e4") >= 5000)
      .distinct()
    // stage 5a': the join-back SHUTTLE alone (arrays cross the two joins,
    // no jaccard kernel) — separates exchange volume from kernel CPU
    time("join-back shuttle alone")(candM
      .join(baseM.select(col("id").as("a"), col("sh").as("sh_a")), Seq("a"))
      .join(baseM.select(col("id").as("b"), col("sh").as("sh_b")), Seq("b"))
      .select((size(col("sh_a")) + size(col("sh_b"))).as("z"))
      .filter(col("z") >= 0).count())
    // stage 5b: verify alone on cached candidates + cached base — the
    // pre-r16 verify cost (arrays join back for EVERY band candidate)
    time("verify alone (hot inputs)")(verify(candM).count())
    // stage 5c: verify on the size-bounded candidates — the shipping cost
    time("verify alone (bounded, hot)")(verify(candBM).count())
    // stage 5d: the r16 HASHED verify — sorted xxhash64 arrays join back
    // (8 B/element primitive) and an allocation-free merge counts the
    // intersection; this is the shipping operator's verify stage
    val hvM = baseM.select(col("id"),
      graft.functions.HashedSortedShingles(col("sh")).as("shh")).cache()
    hvM.count()
    val verH = candBM
      .join(hvM.select(col("id").as("a"), col("shh").as("sh_a")), Seq("a"))
      .join(hvM.select(col("id").as("b"), col("shh").as("sh_b")), Seq("b"))
      .select(col("a"), col("b"),
        graft.functions.JaccardE4Sorted(col("sh_a"), col("sh_b")).as("j_e4"))
      .filter(col("j_e4") >= 5000)
      .distinct()
    time("verify alone (hashed, hot)")(verH.count())
    kb.unpersist(); candM.unpersist(); candBM.unpersist(); baseM.unpersist()
    hvM.unpersist()

    // stage 5: the full operator (verify included)
    time("full dedup_ngram")(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text").count())

    spark.stop()
  }
}
