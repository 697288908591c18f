package graft.tools

import org.apache.spark.sql.SparkSession

import graft.engine.ParquetStore
import graft.sources.FossilExport

/** Offline export CLI — the inverse of [[FossilImportTool]]: write a
  * ParquetStore root back out as a fossil v2 database directory readable
  * by the native reference (and by [[graft.sources.FossilDatabase]]).
  *
  *   sbt "runMain graft.tools.FossilExportTool <storeRoot> <fossilDir>"
  */
object FossilExportTool {
  def main(args: Array[String]): Unit = {
    require(args.length == 2,
      "usage: FossilExportTool <storeRoot> <fossilDir>")
    val Array(storeRoot, fossilDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val (topics, entries) =
        FossilExport.export(spark, new ParquetStore(spark, storeRoot), fossilDir)
      println(s"exported $entries entries across $topics topics to $fossilDir")
    } finally spark.stop()
  }
}
