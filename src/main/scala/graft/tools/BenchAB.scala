package graft.tools

import org.apache.spark.sql.SparkSession

/** Controlled bench protocol A/B — one session, one commit, both sampling
  * protocols, so the r4→r5 drift question ("protocol change or code
  * regression?") gets a measurement instead of an argument:
  *
  *  - protocol A = r4's BACK-TO-BACK: each query timed 3× consecutively
  *    (samples share any transient contention AND consecutive-run cache
  *    warmth: page cache, JIT-hot paths, shuffle-file reuse within AQE).
  *  - protocol B = r5's PASS-MAJOR: the battery runs end-to-end 3 times,
  *    a query's samples come from different passes (decorrelated, colder).
  *
  * Output: target/bench_ab.json with per-query medians under both
  * protocols + per-run arrays. Drive with:
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.BenchAB /root/testdata/sf0.1"
  */
object BenchAB {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // match Bench: checkpoint CRC sidecars off (see Bench.scala)
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled",
        sys.env.getOrElse("GRAFT_CKPT_CHECKSUM", "false"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val queries = graft.SparkEntry.queries.toSeq.sortBy(_._1)

    // identical warm-up to Bench: JIT, codegen caches, parquet footers
    queries.foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001").count() catch { case _: Throwable => () }
    }

    def time(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      // a failed query records -1 (like Bench), never its time-to-failure —
      // a broken query must be unmistakable in bench_ab.json, not a
      // plausible-looking fast sample
      val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // outside the timed window, as in Bench
      if (ok) dt else -1.0
    }

    // protocol A first, then B, so B cannot ride A's same-query warmth
    // beyond what a fresh pass-major run would see anyway
    val backToBack = queries.map { case (name, fn) =>
      name -> (0 until 3).map(_ => time(fn))
    }
    val passes = (0 until 3).map { _ => queries.map { case (name, fn) => name -> time(fn) }.toMap }
    val passMajor = queries.map { case (name, _) => name -> passes.map(_(name)) }

    def f(d: Double): String = String.format(java.util.Locale.ROOT, "%.4f", d)
    def table(rows: Seq[(String, Seq[Double])]): String =
      rows.map { case (n, rs) =>
        "\"" + n + "\":{\"median\":" + f(rs.sorted.apply(rs.size / 2)) +
          ",\"runs\":[" + rs.map(f).mkString(",") + "]}"
      }.mkString("{", ",", "}")

    val out =
      s"""{"sf":"$sfDir","cpus":$cpus,
         |"back_to_back":${table(backToBack)},
         |"pass_major":${table(passMajor)}}""".stripMargin
    val p = java.nio.file.Paths.get("target", "bench_ab.json")
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, out.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val totA = backToBack.map(_._2.sorted.apply(1)).sum
    val totB = passMajor.map(_._2.sorted.apply(1)).sum
    spark.stop()
    println(f"totals: back-to-back median sum $totA%.2f s, pass-major median sum $totB%.2f s")
  }
}
