package graft.api

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder

/** Server-side operational metrics — reference parity with the fossil
  * metrics store (`pkg/server/metrics.go:19-28`):
  *
  *  - `fossil_client_connections` counter (`mux.go:91` increments on every
  *    accepted connection);
  *  - `fossil_requests{database,cmd}` counter vector (`server.go:76`);
  *  - `fossil_response_ns{database,cmd}` histogram with the reference's
  *    2 ms .. 38 ms bucket ladder (`metrics.go:50-53`: 2·i ms for
  *    i ∈ [1, 19], observed in nanoseconds; `server.go:77`).
  *
  * The reference registers these in a Prometheus registry and serves them
  * over promhttp; this store keeps the same names/labels/semantics and
  * [[render]]s the standard Prometheus text exposition format (v0.0.4, the
  * same bytes a promhttp endpoint emits), served both as the `METRICS`
  * wire command and an optional plain-HTTP `/metrics` endpoint on
  * [[WireServer]]. Counters are `LongAdder`s — the store sits on every
  * request of a thread-per-connection server, so contended atomics matter
  * more than read cost (reads only happen when scraped). */
final class ServerMetrics {
  import ServerMetrics.BucketsNs

  private val connections = new LongAdder

  private final class Histo {
    val buckets: Array[LongAdder] = Array.fill(BucketsNs.length)(new LongAdder)
    val sum = new LongAdder
    val count = new LongAdder
  }
  private val requests = new ConcurrentHashMap[(String, String), LongAdder]
  private val responses = new ConcurrentHashMap[(String, String), Histo]

  def incClientConnection(): Unit = connections.increment()

  def incRequests(db: String, cmd: String): Unit =
    requests.computeIfAbsent((db, cmd), _ => new LongAdder).increment()

  def observeResponseNs(db: String, cmd: String, ns: Long): Unit = {
    val h = responses.computeIfAbsent((db, cmd), _ => new Histo)
    var i = 0
    // cumulative histogram: every bucket with le >= ns increments
    while (i < BucketsNs.length) {
      if (ns <= BucketsNs(i)) h.buckets(i).increment()
      i += 1
    }
    h.sum.add(ns)
    h.count.increment()
  }

  // -- scrape/test accessors --
  def connectionCount: Long = connections.sum()
  def requestCount(db: String, cmd: String): Long =
    Option(requests.get((db, cmd))).map(_.sum()).getOrElse(0L)
  def responseCount(db: String, cmd: String): Long =
    Option(responses.get((db, cmd))).map(_.count.sum()).getOrElse(0L)
  def responseSumNs(db: String, cmd: String): Long =
    Option(responses.get((db, cmd))).map(_.sum.sum()).getOrElse(0L)

  /** Prometheus text exposition (format v0.0.4) of the full registry.
    * Label order and metric names mirror the reference definitions; keys
    * render sorted so scrapes are deterministic. */
  def render: String = {
    val sb = new StringBuilder
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")
    def labels(db: String, cmd: String) =
      s"""{database="${esc(db)}",cmd="${esc(cmd)}"}"""
    sb ++= "# HELP fossil_client_connections The total number of client connections\n"
    sb ++= "# TYPE fossil_client_connections counter\n"
    sb ++= s"fossil_client_connections ${connections.sum()}\n"
    sb ++= "# HELP fossil_requests Request counts for the fossil commands\n"
    sb ++= "# TYPE fossil_requests counter\n"
    import scala.jdk.CollectionConverters._
    requests.asScala.toSeq.sortBy(_._1).foreach { case ((db, cmd), n) =>
      sb ++= s"fossil_requests${labels(db, cmd)} ${n.sum()}\n"
    }
    sb ++= "# HELP fossil_response_ns Response times on commands made against a database\n"
    sb ++= "# TYPE fossil_response_ns histogram\n"
    responses.asScala.toSeq.sortBy(_._1).foreach { case ((db, cmd), h) =>
      val base = s"""database="${esc(db)}",cmd="${esc(cmd)}""""
      BucketsNs.zipWithIndex.foreach { case (le, i) =>
        sb ++= s"""fossil_response_ns_bucket{$base,le="$le"} ${h.buckets(i).sum()}\n"""
      }
      sb ++= s"""fossil_response_ns_bucket{$base,le="+Inf"} ${h.count.sum()}\n"""
      sb ++= s"fossil_response_ns_sum{$base} ${h.sum.sum()}\n"
      sb ++= s"fossil_response_ns_count{$base} ${h.count.sum()}\n"
    }
    sb.result()
  }
}

object ServerMetrics {
  /** 2 ms .. 38 ms in 2 ms steps, in nanoseconds — the reference ladder
    * (`pkg/server/metrics.go:50-53`). */
  val BucketsNs: Array[Long] = (1 until 20).map(i => 2L * i * 1000000L).toArray
}
