package graft.tools

import org.apache.spark.sql.SparkSession

/** How much driver time does each `spark.read.parquet` relation build cost
  * (listing + footer schema inference + analysis), and does a memoized
  * plan help? Times 30 repeated `Tables.events(...)` / `Tables.documents`
  * constructions (no action) after a warm-up. */
object ReadProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String, n: Int)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime()
      (0 until n).foreach(_ => f)
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e6 / n}%8.2f ms/call")
    }
    time("events build", 30) { graft.Tables.events(spark, sfDir); () }
    time("documents build", 30) { graft.Tables.read(spark, sfDir, "documents"); () }
    time("lineitem build", 30) { graft.Tables.read(spark, sfDir, "lineitem"); () }
    time("events build+count", 10) {
      graft.Tables.events(spark, sfDir).count(); ()
    }
    spark.stop()
  }
}
