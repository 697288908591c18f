package graft.sources

import java.sql.Timestamp
import java.time.Instant
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{Row, SparkSession}

import graft.api.{LocalClient, RemoteClient}

/** Bulk import from a LIVE fossil server into a [[graft.engine.ParquetStore]]
  * — the wire-access migration path (the offline twin is
  * [[FossilDatabase.importInto]] for users who can reach the files; this
  * one needs only a running server, whose single read path is QUERY —
  * `pkg/server/server.go:152-168`).
  *
  * Shape: LIST gives the topic catalog (re-created first so schemas
  * survive even for empty topics), STATS gives per-topic entry counts and
  * time bounds, and each topic's data pages through QUERY in DISJOINT
  * time windows (`between ~(lo), ~(hi)` — bounds are ns-inclusive on both
  * ends, so consecutive windows step by one nanosecond) sized off the
  * topic's entry count, landing each page through the engine's
  * exactly-once DataFrame ingest. Paging bounds every response frame (the
  * wire protocol buffers a QUERY response fully — a one-shot `all in t`
  * of a big topic would hit the frame cap) and bounds driver memory to
  * one page of entries.
  *
  * Fidelity: the wire QUERY exposes entry times at the engine's µs
  * timestamp precision, so the import is lossless with respect to what
  * any wire client can observe. Values round-trip through the schema
  * codec ([[graft.api.WireEntry.decoded]]) and land typed. Entries are
  * grouped per schema DDL within a page (hierarchy inheritance can mix
  * schemas in one topic's lineage).
  *
  * Consistency: a server ingesting concurrently is drained best-effort —
  * counts are read once from STATS; entries appended after that snapshot
  * may or may not be seen by later pages (the same read-skew any paged
  * wire export has). Import quiesced servers for exact snapshots. */
object WireImport {

  final case class Result(topics: Int, entries: Long, pages: Int)

  private val StatsLine = """^(\S+) n=(\d+) first=(\S+) last=(\S+)$""".r

  private def toNs(s: String): Long = {
    val i = Instant.from(DateTimeFormatter.ISO_OFFSET_DATE_TIME.parse(s))
    Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000000L), i.getNano.toLong)
  }

  private def fmtNs(ns: Long): String =
    DateTimeFormatter.ISO_INSTANT.format(Instant.ofEpochSecond(
      Math.floorDiv(ns, 1000000000L), Math.floorMod(ns, 1000000000L)))

  /** Wire-decoded value → Spark external type: the schema codec yields
    * composites as Maps, but a StructType row expects a [[Row]] with the
    * composite's canonical (key-sorted) field order. Scalars and arrays
    * pass through. */
  private def external(schema: graft.engine.FossilSchema.SType, v: Any): Any =
    (schema, v) match {
      case (c: graft.engine.FossilSchema.SComposite, m: Map[_, _]) =>
        val mm = m.asInstanceOf[Map[String, Any]]
        Row(c.sorted.fields.map { case (k, _) => mm(k) }: _*)
      case _ => v
    }

  /** Import every topic of the client's bound database into a fresh or
    * existing store at `targetRoot`; ~`pageSize` entries per QUERY. */
  def importInto(spark: SparkSession, client: RemoteClient,
      targetRoot: String, pageSize: Int = 50000): Result = {
    require(pageSize >= 1, s"pageSize must be >= 1, got $pageSize")
    val target = new LocalClient(spark, targetRoot)
    val topics = client.listTopics
    topics.foreach { case (t, ddl) => target.createTopic(t, ddl) }
    val stats = client.stats().map {
      case StatsLine(t, n, first, last) => (t, (n.toLong, toNs(first), toNs(last)))
      case line => throw new IllegalArgumentException(
        s"unparseable STATS line from server: '$line'")
    }.toMap
    var entries = 0L
    var pages = 0
    stats.toSeq.sortBy(_._1).foreach { case (topic, (n, firstNs, lastNs)) =>
      val nPages = math.max(1L, (n + pageSize - 1) / pageSize)
      // evenly spaced ns bounds over [first, last]; between is inclusive
      // on both ends, so window i is [b_i, b_{i+1} − 1ns] and the final
      // window closes exactly at last — disjoint and covering. Bounds go
      // through BigInt: span is epoch-ns-scale (~1e17 per decade), so
      // `span * i` overflows Long past a handful of pages — the exact
      // wide-history many-page case the paging exists for.
      val span = lastNs - firstNs
      def bound(i: Long): Long = firstNs + (BigInt(span) * i / nPages).toLong
      (0L until nPages).foreach { i =>
        val lo = bound(i)
        val hi = if (i == nPages - 1) lastNs else bound(i + 1) - 1
        if (hi >= lo) {
          val got = client.query(
            s"all in $topic between ~(${fmtNs(lo)}), ~(${fmtNs(hi)})")
          pages += 1
          entries += got.size
          got.groupBy(_.schema).foreach { case (ddl, es) =>
            val st = graft.engine.FossilSchema.parse(ddl)
            target.appendBatch(
              es.map(e => Row(Timestamp.from(e.time), e.topic,
                external(st, e.decoded))), ddl)
          }
        }
      }
    }
    Result(topics.size, entries, pages)
  }
}
