package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Pins the gob subset against Go's PUBLIC documentation:
  * encoding/gob/doc.go's primitive examples and its fully worked
  * `Point{X: 22, Y: 33}` transmission, byte-for-byte in both directions. */
class GobSpec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def toHex(b: Array[Byte]): String =
    b.map(x => f"${x & 0xff}%02x").mkString

  // --- primitives (doc.go: "17.0 is encoded with only three bytes: FE 31 40")

  test("uint encoding: inline below 128, negated byte count above") {
    val w = new Gob.Writer
    // drive through a bytes singleton to reuse the message plumbing is
    // overkill — test the varints through known full messages instead:
    // Encode(42): msg len 3, typeid int(2)→04, delta 00, 42→54
    w.writeValue(Gob.IdInt, 42L)
    assert(toHex(w.bytes) == "03040054")
  }

  test("float encoding: 17.0 → fe 31 40 (byte-reversed bits as uint)") {
    val w = new Gob.Writer
    w.writeValue(Gob.IdFloat, 17.0)
    assert(toHex(w.bytes) == "050800fe3140")
    val r = new Gob.Reader(w.bytes)
    assert(r.next().contains(17.0))
  }

  test("signed ints round-trip across the complement-shift boundary") {
    for (v <- Seq(0L, 1L, -1L, 63L, 64L, -64L, -65L, 255L, 256L, -256L,
        Int.MaxValue.toLong, Long.MaxValue, Long.MinValue)) {
      val w = new Gob.Writer
      w.writeValue(Gob.IdInt, v)
      val r = new Gob.Reader(w.bytes)
      assert(r.next().contains(v), s"for $v")
    }
  }

  test("interface wire id fails with the named id, not a desync") {
    // a value message claiming builtin type 8 (interface): the documented
    // hard boundary (no Go-produced fixture exists to pin a decoder
    // against; fossil's on-disk structs never use it) — the reader must
    // refuse BY NAME instead of mis-walking the cursor into garbage
    val r = new Gob.Reader(hex("03 10 00 00"))
    val e = intercept[Gob.GobException](r.next())
    assert(e.getMessage.contains("unsupported builtin type 8"), e.getMessage)
  }

  test("complex decodes as (real, imaginary) float pairs — composed from " +
      "the doc.go-pinned float encoding") {
    // complex(17.0, 0.0): typeid 7 → 0e, delta 00, re = the doc.go float
    // example fe 31 40, im = 0.0 → 00
    val r = new Gob.Reader(hex("06 0e 00 fe 31 40 00"))
    assert(r.next().contains(Gob.GobComplex(17.0, 0.0)))
  }

  test("complex round-trips through the writer") {
    for (c <- Seq(Gob.GobComplex(17.0, -3.25), Gob.GobComplex(0.0, 0.0),
        Gob.GobComplex(Double.MinPositiveValue, 1e300))) {
      val w = new Gob.Writer
      w.writeValue(Gob.IdComplex, c)
      val r = new Gob.Reader(w.bytes)
      assert(r.next().contains(c), s"for $c")
    }
  }

  test("strings and byte slices round-trip") {
    val w = new Gob.Writer
    w.writeValue(Gob.IdString, "hello")
    // msg len 8, typeid string(6)→0c, delta 00, len 5, bytes
    assert(toHex(w.bytes) == "080c000568656c6c6f")
    val r = new Gob.Reader(w.bytes)
    assert(r.next().contains("hello"))
  }

  // --- the doc.go worked example

  /** doc.go transmits `type Point struct { X, Y int }` value
    * Point{22, 33}: a 31-byte type definition (id 65) followed by a 7-byte
    * value message. */
  private val pointBytes =
    "1f ff 81 03 01 01 05 50 6f 69 6e 74 01 ff 82 00 01 02 01 01 58 01 04 00" +
      " 01 01 59 01 04 00 00 00" +
      " 07 ff 82 01 2c 01 42 00"

  test("doc.go Point example decodes") {
    val r = new Gob.Reader(hex(pointBytes))
    assert(r.next().contains(Map("X" -> 22L, "Y" -> 33L)))
    assert(r.next().isEmpty)
  }

  test("doc.go Point example re-encodes byte-identically") {
    val w = new Gob.Writer
    val tPoint = w.defineStruct("Point", Seq("X" -> Gob.IdInt, "Y" -> Gob.IdInt))
    w.writeValue(tPoint, Map("X" -> 22L, "Y" -> 33L))
    assert(toHex(w.bytes) == toHex(hex(pointBytes)))
  }

  test("zero-valued struct fields are omitted and decode as absent") {
    val w = new Gob.Writer
    val t = w.defineStruct("P", Seq("A" -> Gob.IdInt, "B" -> Gob.IdInt))
    w.writeValue(t, Map("A" -> 0L, "B" -> 7L))
    val r = new Gob.Reader(w.bytes)
    assert(r.next().contains(Map("B" -> 7L))) // A omitted on the wire
  }

  // --- compound round-trips used by the fossil layout

  test("struct with array / slice / opaque fields round-trips") {
    val w = new Gob.Writer
    val tTime = w.defineOpaque("Time")
    val tInner = w.defineStruct("Inner", Seq("N" -> Gob.IdInt, "D" -> Gob.IdBytes))
    val tArr = w.defineArray("", tInner, 3)
    val tStrs = w.defineSlice("", Gob.IdString)
    val tOuter = w.defineStruct("Outer", Seq(
      "T" -> tTime, "Xs" -> tArr, "Names" -> tStrs))
    val payload = Array[Byte](9, 8, 7)
    w.writeValue(tOuter, Map(
      "T" -> Array[Byte](1, 2, 3),
      "Xs" -> Vector(
        Map("N" -> 5L, "D" -> payload),
        Map[String, Any](),
        Map("N" -> -2L)),
      "Names" -> Vector("a", "bc")))
    val r = new Gob.Reader(w.bytes)
    val m = r.next().get.asInstanceOf[Map[String, Any]]
    assert(m("T").asInstanceOf[Array[Byte]].toSeq == Seq[Byte](1, 2, 3))
    val xs = m("Xs").asInstanceOf[Vector[Map[String, Any]]]
    assert(xs(0)("N") == 5L)
    assert(xs(0)("D").asInstanceOf[Array[Byte]].toSeq == payload.toSeq)
    assert(xs(1).isEmpty)
    assert(xs(2) == Map("N" -> -2L))
    assert(m("Names") == Vector("a", "bc"))
  }

  // --- time.Time payload

  test("GoTime encodes/decodes UTC instants incl. pre-epoch") {
    for (ns <- Seq(0L, 1709251200000000000L, -86400000000000L, 123456789L)) {
      assert(Gob.GoTime.decodeToEpochNanos(Gob.GoTime.encodeUtc(ns)) == ns)
    }
    // version byte 1, seconds since year 1 big-endian, nanos, -1 zone
    val epoch = Gob.GoTime.encodeUtc(0L)
    assert(epoch.length == 15)
    assert(epoch(0) == 1.toByte)
    assert(java.nio.ByteBuffer.wrap(epoch, 1, 8).getLong == 62135596800L)
    assert(epoch(13) == -1.toByte && epoch(14) == -1.toByte)
  }

  test("segment stream: writer and reader round-trip through FossilDatabase") {
    import FossilDatabase.{Datum, Segment}
    val seg = Segment(1709251200000000000L, Vector(
      Datum(60000000000L, 1, Array[Byte](1, 2)),
      Datum(120000000000L, 0, "hi".getBytes),
      Datum(0L, 2, Array.emptyByteArray)))
    val back = FossilDatabase.decodeSegment(FossilWriter.segmentBytes(seg, segmentSize = 16))
    assert(back.headTimeNs == seg.headTimeNs)
    assert(back.data.length == 3)
    assert(back.data(0).deltaNs == 60000000000L && back.data(0).topicId == 1)
    assert(back.data(0).data.toSeq == Seq[Byte](1, 2))
    assert(back.data(1).topicId == 0)
    assert(new String(back.data(1).data) == "hi")
    assert(back.data(2).deltaNs == 0L && back.data(2).data.isEmpty)
  }
}
