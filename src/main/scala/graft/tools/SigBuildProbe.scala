package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object SigBuildProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    (1 to 3).foreach { i =>
      val root = java.nio.file.Files.createTempDirectory("graft_sigprobe").toString
      val t0 = System.nanoTime()
      graft.operators.SignatureStore.build(
        graft.Tables.documents(spark, d).filter(col("doc_id") % 10 =!= 0),
        "doc_id", "text", root, "ref90")
      println(f"build $i: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
