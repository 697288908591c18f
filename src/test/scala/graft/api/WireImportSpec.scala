package graft.api

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import graft.fql.Compiler
import graft.sources.WireImport
import org.apache.spark.sql.functions.col

/** Round-trip of the live-server import path: serve a populated store
  * over the wire, [[WireImport]] it into a second store through paged
  * QUERY windows, and compare every entry — topics, schemas, times,
  * typed values — between source and target engines. */
class WireImportSpec extends SparkSpec {

  private val fixedClock: Compiler.Clock = () => 1735689600L * 1000000000L

  private def entriesOf(root: String): Seq[(Timestamp, String, String)] = {
    val lc = new LocalClient(spark, root, fixedClock)
    lc.query("all").orderBy("time", "topic")
      .select(col("time"), col("topic"), col("value").cast("string"))
      .collect().toSeq
      .map(r => (r.getTimestamp(0), r.getString(1), r.getString(2)))
  }

  test("wire import round-trip: paged QUERY windows land every entry, " +
      "typed, across mixed schemas; empty topics keep their schema") {
    val srcRoot = Files.createTempDirectory("graft_wi_src").toString
    val dstRoot = Files.createTempDirectory("graft_wi_dst").toString
    val src = new LocalClient(spark, srcRoot, fixedClock)
    // two schemas + a composite + an empty topic; 23 entries so a
    // pageSize of 5 forces multi-window paging with uneven remainders
    src.createTopic("/m/f", "float64")
    src.createTopic("/m/s", "string")
    src.createTopic("/m/c", """{"x": int32, "y": string}""")
    src.createTopic("/m/empty", "boolean")
    val t0 = 1735600000L * 1000L // ms
    (0 until 10).foreach(i =>
      src.append("/m/f", 1.5 * i, new Timestamp(t0 + i * 1000L)))
    (0 until 10).foreach(i =>
      src.append("/m/s", s"msg$i", new Timestamp(t0 + i * 1500L)))
    (0 until 3).foreach(i =>
      src.append("/m/c", org.apache.spark.sql.Row(i, s"p$i"),
        new Timestamp(t0 + i * 700L)))

    val server = new WireServer(spark, Map("live" -> srcRoot), "live", fixedClock)
    try {
      val client = new RemoteClient("127.0.0.1", server.port, db = "live")
      try {
        val r = WireImport.importInto(spark, client, dstRoot, pageSize = 5)
        assert(r.topics == 4)
        assert(r.entries == 23L)
        assert(r.pages >= 5) // 10/5 + 10/5 + 3/5 windows at minimum
      } finally client.close()
    } finally server.close()

    assert(entriesOf(dstRoot) == entriesOf(srcRoot))
    // catalog parity including the topic with no data
    val dst = new LocalClient(spark, dstRoot, fixedClock)
    val srcTopics = src.listTopics.toMap
    assert(dst.listTopics.toMap == srcTopics)
    assert(srcTopics("/m/empty") == "boolean")
  }

  test("decade-spanning topics page without Long overflow in the bounds") {
    // span ~54 years of ns (~1.7e18); with 8 pages the naive span*i
    // bound arithmetic exceeds 2^63 and silently corrupts the windows —
    // every entry must still land exactly once
    val srcRoot = Files.createTempDirectory("graft_wi_wide").toString
    val dstRoot = Files.createTempDirectory("graft_wi_wide_dst").toString
    val src = new LocalClient(spark, srcRoot, fixedClock)
    src.createTopic("/wide", "int64")
    val years = Seq(1970, 1980, 1990, 2000, 2005, 2010, 2015, 2024)
    years.zipWithIndex.foreach { case (y, i) =>
      val ts = new Timestamp(java.time.Instant.parse(f"$y%04d-06-01T00:00:00Z").toEpochMilli)
      src.append("/wide", i.toLong, ts)
    }
    val server = new WireServer(spark, Map("w" -> srcRoot), "w", fixedClock)
    try {
      val client = new RemoteClient("127.0.0.1", server.port, db = "w")
      try {
        val r = WireImport.importInto(spark, client, dstRoot, pageSize = 1)
        assert(r.entries == years.length.toLong)
      } finally client.close()
    } finally server.close()
    assert(entriesOf(dstRoot) == entriesOf(srcRoot))
  }

  test("single-entry topics and identical timestamps page safely") {
    val srcRoot = Files.createTempDirectory("graft_wi_one").toString
    val dstRoot = Files.createTempDirectory("graft_wi_one_dst").toString
    val src = new LocalClient(spark, srcRoot, fixedClock)
    val at = new Timestamp(1735600000L * 1000L)
    src.createTopic("/one", "int64")
    src.createTopic("/same", "int64")
    src.append("/one", 7L, at) // span = 0: one window [t, t]
    src.append("/same", 1L, at) // two entries at the SAME instant
    src.append("/same", 2L, at)
    val server = new WireServer(spark, Map("d" -> srcRoot), "d", fixedClock)
    try {
      val client = new RemoteClient("127.0.0.1", server.port, db = "d")
      try {
        val r = WireImport.importInto(spark, client, dstRoot, pageSize = 1)
        assert(r.entries == 3L)
      } finally client.close()
    } finally server.close()
    assert(entriesOf(dstRoot) == entriesOf(srcRoot))
  }
}
