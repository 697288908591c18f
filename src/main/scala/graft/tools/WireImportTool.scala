package graft.tools

import org.apache.spark.sql.SparkSession

import graft.api.{ConnectionString, RemoteClient}
import graft.sources.WireImport

/** Live-server import CLI: page a running fossil server's database into a
  * ParquetStore root over the wire (the migration path for users with
  * only wire access — the filesystem twin is [[FossilImportTool]]).
  *
  *   sbt "runMain graft.tools.WireImportTool fossil://host[:port]/db <storeRoot> [pageSize]"
  *
  * Prints a one-line summary (topics, entries, QUERY pages) and exits
  * nonzero on failure. */
object WireImportTool {
  def main(args: Array[String]): Unit = {
    require(args.length == 2 || args.length == 3,
      "usage: WireImportTool fossil://host[:port]/db <storeRoot> [pageSize]")
    val target = ConnectionString.parse(args(0)) match {
      case r: ConnectionString.Remote => r
      case other => throw new IllegalArgumentException(
        s"WireImportTool needs a fossil:// connection string, got $other " +
          "(for a local fossil directory use FossilImportTool)")
    }
    val storeRoot = args(1)
    val pageSize = if (args.length == 3) args(2).toInt else 50000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val client = new RemoteClient(target.host, target.port, db = target.db)
    try {
      val r = WireImport.importInto(spark, client, storeRoot, pageSize)
      println(s"imported ${r.entries} entries across ${r.topics} topics " +
        s"in ${r.pages} QUERY pages")
    } finally {
      client.close()
      spark.stop()
    }
  }
}
