package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import FossilDatabase.{Datum, Segment}

/** Writer for fossil's on-disk layout — the TEST VEHICLE for
  * [[FossilDatabase]]: round-trip specs and the oracle-paired battery row
  * need real fossil directories, and the container has no Go toolchain to
  * produce them with the reference binary. `scripts/gen_fossil_fixture.py`
  * is the independent second implementation of the same bytes (committed
  * fixture under `src/test/resources/fossil/`), so the format is pinned
  * from two sides plus the gob documentation example in GobSpec.
  *
  * Byte layout per `pkg/database/db.go:243-410` (`serializeInternal`) and
  * `pkg/database/log.go:99-170` (WAL writers). */
object FossilWriter {

  /** Gob stream for one segment file: `Segment{HeadTime, Series, Size}`
    * with the Series array zero-padded to the fixed 10000 slots
    * (`pkg/database/segment.go:15,24-28`). */
  def segmentBytes(seg: Segment, segmentSize: Int = 10000): Array[Byte] = {
    require(seg.data.length <= segmentSize,
      s"segment holds ${seg.data.length} > $segmentSize datums")
    val w = new Gob.Writer
    val tTime = w.defineOpaque("Time")
    val tDatum = w.defineStruct("Datum", Seq(
      "Delta" -> Gob.IdInt, "TopicID" -> Gob.IdInt, "Data" -> Gob.IdBytes))
    val tArr = w.defineArray("", tDatum, segmentSize)
    val tSeg = w.defineStruct("Segment", Seq(
      "HeadTime" -> tTime, "Series" -> tArr, "Size" -> Gob.IdInt))
    w.writeValue(tSeg, segmentValue(seg, segmentSize))
    w.bytes
  }

  private def datumValue(d: Datum): Map[String, Any] = Map(
    "Delta" -> d.deltaNs, "TopicID" -> d.topicId.toLong, "Data" -> d.data)

  private def segmentValue(seg: Segment, segmentSize: Int): Map[String, Any] = {
    val zero: Map[String, Any] = Map("Delta" -> 0L, "TopicID" -> 0L,
      "Data" -> Array.emptyByteArray)
    Map(
      "HeadTime" -> Gob.GoTime.encodeUtc(seg.headTimeNs),
      "Series" -> (seg.data.map(datumValue) ++
        Vector.fill(segmentSize - seg.data.length)(zero)),
      "Size" -> seg.data.length.toLong)
  }

  /** Write a complete v2 database directory: metadata + segments/<i> +
    * zlib/JSON topics + schemas. `sTimeNs` lands as the RFC3339 tail of
    * the metadata file. */
  def writeV2(dir: String, topics: Seq[String], schemas: Seq[String],
      segments: Seq[Segment], sTimeNs: Long, segmentSize: Int = 10000): Unit = {
    val root = Paths.get(dir)
    Files.createDirectories(root.resolve("segments"))
    segments.zipWithIndex.foreach { case (seg, i) =>
      Files.write(root.resolve("segments").resolve(i.toString),
        segmentBytes(seg, segmentSize))
    }
    writeV2Catalog(dir, topics, schemas, segments.length, sTimeNs)
  }

  /** The v2 catalog half alone — metadata header + zlib/JSON topic and
    * schema tables — for writers ([[FossilExport]]) that stream the
    * segment files themselves. */
  def writeV2Catalog(dir: String, topics: Seq[String], schemas: Seq[String],
      segmentCount: Int, sTimeNs: Long): Unit = {
    require(topics.length == schemas.length, "topics/schemas must align")
    val root = Paths.get(dir)
    Files.createDirectories(root)
    val meta = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
    meta.putInt(2).putInt(segmentCount).putInt(math.max(0, segmentCount - 1))
    val rfc3339 = java.time.format.DateTimeFormatter.ISO_INSTANT
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochSecond(
        Math.floorDiv(sTimeNs, 1000000000L)))
    Files.write(root.resolve("metadata"),
      meta.array() ++ rfc3339.getBytes(StandardCharsets.UTF_8))
    Files.write(root.resolve("topics"), deflate(jsonStringArray(topics)))
    Files.write(root.resolve("schemas"), deflate(jsonStringArray(schemas)))
    ()
  }

  /** Write a v1 database file (`pkg/database/migration.go:47-60`):
    * one gob stream holding the whole `databaseV1` struct. */
  def writeV1(dir: String, name: String, topics: Seq[String],
      segments: Seq[Segment], segmentSize: Int = 10000): Unit = {
    val w = new Gob.Writer
    val tTime = w.defineOpaque("Time")
    val tDatum = w.defineStruct("Datum", Seq(
      "Delta" -> Gob.IdInt, "TopicID" -> Gob.IdInt, "Data" -> Gob.IdBytes))
    val tArr = w.defineArray("", tDatum, segmentSize)
    val tSeg = w.defineStruct("Segment", Seq(
      "HeadTime" -> tTime, "Series" -> tArr, "Size" -> Gob.IdInt))
    val tSegs = w.defineSlice("", tSeg)
    val tStrs = w.defineSlice("", Gob.IdString)
    val tDb = w.defineStruct("databaseV1", Seq(
      "Version" -> Gob.IdInt, "Name" -> Gob.IdString, "Path" -> Gob.IdString,
      "Segments" -> tSegs, "Current" -> Gob.IdInt,
      "TopicLookup" -> tStrs, "TopicCount" -> Gob.IdInt))
    w.writeValue(tDb, Map(
      "Version" -> 1L,
      "Name" -> name,
      "Path" -> dir,
      "Segments" -> segments.map(s => segmentValue(s, segmentSize)).toVector,
      "Current" -> math.max(0, segments.length - 1).toLong,
      "TopicLookup" -> topics.toVector,
      "TopicCount" -> topics.length.toLong))
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, "database"), w.bytes)
    ()
  }

  // -------------------------------------------------------------- WAL lines

  /** `<action>;<base64(gob)>` per `pkg/database/log.go:99-170`. */
  def walAddEvent(d: Datum): String = {
    val w = new Gob.Writer
    val tDatum = w.defineStruct("Datum", Seq(
      "Delta" -> Gob.IdInt, "TopicID" -> Gob.IdInt, "Data" -> Gob.IdBytes))
    w.writeValue(tDatum, datumValue(d))
    s"1;${java.util.Base64.getEncoder.encodeToString(w.bytes)}"
  }

  def walAddSegment(headTimeNs: Long): String = {
    val w = new Gob.Writer
    val tTime = w.defineOpaque("Time")
    w.writeValue(tTime, Gob.GoTime.encodeUtc(headTimeNs))
    s"2;${java.util.Base64.getEncoder.encodeToString(w.bytes)}"
  }

  def walAddTopic(topic: String, ddl: String): String = {
    val w = new Gob.Writer
    w.writeValue(Gob.IdString, s"$topic:$ddl")
    s"4;${java.util.Base64.getEncoder.encodeToString(w.bytes)}"
  }

  def appendWal(dir: String, lines: Seq[String]): Unit = {
    val p = Paths.get(dir, "wal.log")
    val text = lines.mkString("", "\n", "\n")
    if (Files.exists(p))
      Files.write(p, text.getBytes(StandardCharsets.UTF_8),
        java.nio.file.StandardOpenOption.APPEND)
    else Files.write(p, text.getBytes(StandardCharsets.UTF_8))
    ()
  }

  // -------------------------------------------------------------- encoding

  private def deflate(s: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.util.zip.DeflaterOutputStream(bos)
    out.write(s.getBytes(StandardCharsets.UTF_8))
    out.close()
    bos.toByteArray
  }

  /** JSON string array with Go `json.Marshal` escaping (incl. the HTML-safe
    * `<`/`>`/`&` substitutions). */
  private[sources] def jsonStringArray(xs: Seq[String]): String =
    xs.map { s =>
      val sb = new StringBuilder("\"")
      s.foreach {
        case '"' => sb ++= "\\\""
        case '\\' => sb ++= "\\\\"
        case '\n' => sb ++= "\\n"
        case '\r' => sb ++= "\\r"
        case '\t' => sb ++= "\\t"
        case '<' => sb ++= "\\u003c"
        case '>' => sb ++= "\\u003e"
        case '&' => sb ++= "\\u0026"
        case c if c < 0x20 => sb ++= f"\\u${c.toInt}%04x"
        case c => sb += c
      }
      sb += '"'
      sb.result()
    }.mkString("[", ",", "]")
}
