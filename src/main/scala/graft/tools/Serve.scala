package graft.tools

import org.apache.spark.sql.SparkSession

import graft.api.WireServer

/** Standalone wire-server entrypoint — the CLI analog of the reference's
  * `fossil server` command (`cmd/fossil/server/server.go`). Serves one or
  * more named stores over the fossil wire protocol until killed.
  *
  * Usage: sbt "runMain graft.tools.Serve [port=N] name=/path/to/store [name2=/path2 ...]"
  *        (defaults to `default=/tmp/graft_serve_store` on an ephemeral
  *        port — `port=8001` pins the reference default; the first name is
  *        the connection default; prints `listening on <port>`)
  */
object Serve {
  def main(args: Array[String]): Unit = {
    val (portArgs, rootArgs) = args.toSeq.partition(_.startsWith("port="))
    val port = portArgs.lastOption.map(_.stripPrefix("port=").toInt).getOrElse(0)
    val roots: Seq[(String, String)] =
      if (rootArgs.isEmpty) Seq("default" -> "/tmp/graft_serve_store")
      else rootArgs.map { a =>
        a.split("=", 2) match {
          case Array(n, p) => (n, p)
          case _ => throw new IllegalArgumentException(s"expected name=/path, got '$a'")
        }
      }
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val server = new WireServer(spark, roots.toMap, roots.head._1, bindPort = port)
    println(s"listening on ${server.port}")
    // serve until the process is killed (acceptor runs on a daemon thread)
    Thread.currentThread.join()
  }
}
