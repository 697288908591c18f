package graft.sources

import java.io.{ByteArrayInputStream, EOFException}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** WARC (Web ARChive) reader — the raw-crawl ingestion format of every
  * large-scale training-data pipeline (Common Crawl publishes WARC; the
  * ISO 28500 record layout is public and simple):
  *
  *   WARC/1.0\r\n
  *   <Header-Name>: <value>\r\n ...        (Content-Length is mandatory)
  *   \r\n
  *   <Content-Length payload bytes>\r\n\r\n
  *
  * Crawl WARCs ship as per-record-gzipped members concatenated into one
  * `.warc.gz` (the standard layout, so a range request can decompress a
  * single record); `java.util.zip.GZIPInputStream` walks concatenated
  * members natively, and plain `.warc` bytes pass through untouched
  * (magic-sniffed, not extension-trusted).
  *
  * For `response` records the payload is an HTTP message;
  * [[Warc.httpBody]] splits the status/header block from the body at the
  * first blank line.
  *
  * Scale: WARC files are the natural parallel unit (Common Crawl segments
  * are ~1 GB files, thousands per crawl) — [[Warc.read]] parallelizes the
  * FILE list and each executor task parses its own files sequentially
  * (the format is length-delimited, inherently sequential within a file);
  * the driver never touches record bytes. Malformed tails are truncated
  * with a per-file salvage count rather than failing the file. */
object Warc {

  final case class Record(headers: Map[String, String], payload: Array[Byte]) {
    private def h(name: String): Option[String] =
      headers.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }
    def warcType: String = h("WARC-Type").getOrElse("")
    def targetUri: String = h("WARC-Target-URI").getOrElse("")
    /** WARC-Date (RFC 3339) as epoch micros; 0 when absent/bad. */
    def dateUs: Long =
      h("WARC-Date").flatMap { s =>
        scala.util.Try(java.time.Instant.parse(s)).toOption
      }.map(i => i.getEpochSecond * 1000000L + i.getNano / 1000L).getOrElse(0L)
  }

  private val GzipMagic = Array[Byte](0x1f.toByte, 0x8b.toByte)

  /** Parse every record in one WARC file's bytes (gzip-sniffed). Returns
    * (records, salvaged) where `salvaged` counts bytes-truncated tails
    * skipped at the end of the stream — mirrors the WAL philosophy:
    * salvage the good prefix, surface the damage. */
  def parseFile(bytes: Array[Byte]): (Vector[Record], Int) = {
    val data =
      if (bytes.length >= 2 && bytes(0) == GzipMagic(0) && bytes(1) == GzipMagic(1)) {
        val in = new java.util.zip.GZIPInputStream(new ByteArrayInputStream(bytes))
        try in.readAllBytes() finally in.close()
      } else bytes
    parseRecords(data)
  }

  private[sources] def parseRecords(data: Array[Byte]): (Vector[Record], Int) = {
    val out = Vector.newBuilder[Record]
    var pos = 0
    var salvaged = 0

    def lineEnd(from: Int): Int = {
      var i = from
      while (i < data.length && data(i) != '\n') i += 1
      i
    }
    def lineAt(from: Int): (String, Int) = {
      val e = lineEnd(from)
      val raw = new String(data, from, e - from, StandardCharsets.UTF_8)
      (raw.stripSuffix("\r"), math.min(e + 1, data.length))
    }

    while (pos < data.length) {
      // skip inter-record blank lines
      while (pos < data.length && (data(pos) == '\r' || data(pos) == '\n')) pos += 1
      if (pos >= data.length) return (out.result(), salvaged)
      val recStart = pos
      try {
        val (version, p1) = lineAt(pos)
        if (!version.startsWith("WARC/"))
          throw new EOFException(s"expected WARC version line, got '$version'")
        var p = p1
        val headers = Map.newBuilder[String, String]
        var line = ""
        var done = false
        while (!done) {
          val (l, np) = lineAt(p)
          p = np
          if (l.isEmpty) done = true
          else {
            line = l
            val c = l.indexOf(':')
            if (c < 0) throw new EOFException(s"malformed WARC header '$l'")
            headers += l.substring(0, c).trim -> l.substring(c + 1).trim
          }
          if (p >= data.length && !done) throw new EOFException("truncated headers")
        }
        val hm = headers.result()
        val len = hm.collectFirst {
          case (k, v) if k.equalsIgnoreCase("Content-Length") => v.toInt
        }.getOrElse(throw new EOFException("missing Content-Length"))
        if (p + len > data.length) throw new EOFException("truncated payload")
        val payload = java.util.Arrays.copyOfRange(data, p, p + len)
        out += Record(hm, payload)
        pos = p + len
      } catch {
        case _: EOFException | _: NumberFormatException =>
          // truncated / malformed tail: keep everything before it
          salvaged += data.length - recStart
          return (out.result(), salvaged)
      }
    }
    (out.result(), salvaged)
  }

  /** Split an HTTP message payload into (status+headers text, body bytes)
    * at the first CRLFCRLF (or LFLF) boundary; a payload with no boundary
    * is all body. */
  def httpBody(payload: Array[Byte]): (String, Array[Byte]) = {
    var i = 0
    while (i + 1 < payload.length) {
      if (payload(i) == '\n' &&
          (i + 1 < payload.length && payload(i + 1) == '\n'))
        return (new String(payload, 0, i + 1, StandardCharsets.UTF_8).trim,
          java.util.Arrays.copyOfRange(payload, i + 2, payload.length))
      if (payload(i) == '\n' && i + 2 < payload.length &&
          payload(i + 1) == '\r' && payload(i + 2) == '\n')
        return (new String(payload, 0, i + 1, StandardCharsets.UTF_8).trim,
          java.util.Arrays.copyOfRange(payload, i + 3, payload.length))
      i += 1
    }
    ("", payload)
  }

  /** Distributed read of a directory of `.warc` / `.warc.gz` files:
    * `(file, rec_ix, warc_type, url, date_us, payload)` — one task per
    * slice of the file list, executors parse their own files. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val files = scala.util.Using.resource(Files.list(Paths.get(dir))) { s =>
      s.iterator().asScala.map(_.toString)
        .filter(f => f.endsWith(".warc") || f.endsWith(".warc.gz"))
        .toVector.sorted
    }
    spark.sparkContext
      .parallelize(files, math.max(1, math.min(files.size, 32)))
      .flatMap { f =>
        val (recs, _) = parseFile(Files.readAllBytes(Paths.get(f)))
        recs.iterator.zipWithIndex.map { case (r, i) =>
          (f.substring(f.lastIndexOf('/') + 1), i, r.warcType, r.targetUri,
            r.dateUs, r.payload)
        }
      }
      .toDF("file", "rec_ix", "warc_type", "url", "date_us", "payload")
  }

  // ------------------------------------------------------------- writer

  /** Serialize records into WARC bytes (one gzip member per record when
    * `gzip` — the standard `.warc.gz` layout). Test vehicle for the
    * reader, same role as [[FossilWriter]]. */
  def writeRecords(records: Seq[Record], gzip: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { r =>
      val one = new java.io.ByteArrayOutputStream()
      val head = new StringBuilder("WARC/1.0\r\n")
      // drop any caller-provided content-length in ANY casing first — two
      // conflicting Content-Length lines would make the record unreadable
      val withLen = r.headers.filterNot(_._1.equalsIgnoreCase("Content-Length")) +
        ("Content-Length" -> r.payload.length.toString)
      withLen.foreach { case (k, v) => head.append(s"$k: $v\r\n") }
      head.append("\r\n")
      one.write(head.toString.getBytes(StandardCharsets.UTF_8))
      one.write(r.payload)
      one.write("\r\n\r\n".getBytes(StandardCharsets.UTF_8))
      if (gzip) {
        val gz = new java.util.zip.GZIPOutputStream(out)
        gz.write(one.toByteArray)
        gz.close() // ends the member; BAOS close is a no-op
      } else out.write(one.toByteArray)
    }
    out.toByteArray
  }
}
