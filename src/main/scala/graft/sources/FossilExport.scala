package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.ParquetStore
import graft.functions.FossilEncode

/** Export a ParquetStore into fossil's on-disk v2 layout — the inverse of
  * [[FossilDatabase.importInto]], completing the bidirectional migration
  * story (move data OFF fossil, work in the engine, hand a directory BACK
  * to a native fossil deployment if one still needs it).
  *
  * Layout written: metadata + `segments/<i>` (gob, ≤10k datums each,
  * entry time = HeadTime + Delta) + zlib/JSON topic and schema tables —
  * exactly what [[FossilDatabase]] (and the reference's
  * `deserializeInternal`) reads back.
  *
  * Execution shape: per-topic typed scans re-encode values to wire bytes
  * DISTRIBUTED (FossilEncode at the scan edge), then one global
  * (time, topic) range sort; the segment files themselves are written by
  * STREAMING the sorted frame through `toLocalIterator` — one segment
  * (≤10k datums) in memory at a time, never the corpus. The sequential
  * tail is inherent to the TARGET FORMAT (fossil's segment chain is a
  * single-node, globally time-ordered file sequence), not to the plan:
  * everything before the writer is distributed, and the writer is
  * O(one segment) in memory. */
object FossilExport {

  def export(spark: SparkSession, store: ParquetStore, outDir: String,
      segmentSize: Int = 10000): (Int, Long) = {
    val topics = store.catalog.topicsUnder("/").sorted
    val ddls = topics.map(t => store.catalog.schemaOf(t).get.ddl)
    val topicId = topics.zipWithIndex.toMap

    // per-topic typed scan → (t_ns, tid, bytes); encode rides the scan
    val encoded = topics.zip(ddls).map { case (t, ddl) =>
      store.topicEntries(t).select(
        (unix_micros(col("time")) * 1000L).as("t_ns"),
        lit(topicId(t)).as("tid"),
        FossilEncode(ddl, col("value")).as("bytes"))
    }.reduceOption(_ unionByName _)

    import java.nio.file.{Files, Paths}
    Files.createDirectories(Paths.get(outDir))
    var segments = Vector.empty[FossilDatabase.Segment]
    var total = 0L
    encoded.foreach { df =>
      val sorted = df.orderBy("t_ns", "tid")
      val it = sorted.toLocalIterator()
      val buf = Vector.newBuilder[FossilDatabase.Datum]
      var head = 0L
      var inSeg = 0
      var segIx = 0
      def flush(): Unit = if (inSeg > 0) {
        Files.write(
          Paths.get(outDir, "segments", segIx.toString),
          FossilWriter.segmentBytes(
            FossilDatabase.Segment(head, buf.result()), segmentSize))
        segments = segments :+ FossilDatabase.Segment(head, Vector.empty)
        segIx += 1; inSeg = 0; buf.clear()
      }
      Files.createDirectories(Paths.get(outDir, "segments"))
      while (it.hasNext) {
        val r = it.next()
        val t = r.getLong(0)
        if (inSeg == 0) head = t
        buf += FossilDatabase.Datum(t - head, r.getInt(1),
          r.getAs[Array[Byte]]("bytes"))
        inSeg += 1; total += 1
        if (inSeg == segmentSize) flush()
      }
      flush()
    }
    // metadata/topics/schemas via the same writer the fixtures use — but
    // the segment FILES are already on disk, so only the catalog tables
    // and metadata header are (re)written here
    val sTime = segments.lastOption.map(_.headTimeNs).getOrElse(0L)
    FossilWriter.writeV2Catalog(outDir, topics, ddls, segments.length, sTime)
    (topics.length, total)
  }
}
