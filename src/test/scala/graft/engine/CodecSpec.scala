package graft.engine

import org.scalatest.funsuite.AnyFunSuite

import FossilSchema._

/** Wire-codec round-trip properties (format per
  * `pkg/schema/encoding.go:224-259`, LE prefixes `pkg/query/types/value.go:126-142`).
  * Seeded random sampling in place of scalacheck-plus (not in the offline cache). */
class CodecSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)

  test("int64/float64/bool round-trip") {
    (Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue) ++ Seq.fill(50)(rnd.nextLong()))
      .foreach(v => assert(Codec.decode(SInt64, Codec.encode(SInt64, v)) == v))
    (Seq(0.0, -0.0, 1.5, Double.MaxValue, Double.MinPositiveValue) ++
      Seq.fill(50)(rnd.nextDouble() * 1e12))
      .foreach(v => assert(Codec.decode(SFloat64, Codec.encode(SFloat64, v)) == v))
    Seq(true, false).foreach(v => assert(Codec.decode(SBool, Codec.encode(SBool, v)) == v))
  }

  test("string round-trips utf8") {
    (Seq("", "a", "héllo ☃", "line\nbreak\ttab") ++
      Seq.fill(25)(rnd.alphanumeric.take(rnd.nextInt(40)).mkString))
      .foreach(s => assert(Codec.decode(SString, Codec.encode(SString, s)) == s))
  }

  test("fixed array round-trips and enforces length") {
    val sch = SArray(3, SInt32)
    assert(Codec.decode(sch, Codec.encode(sch, Seq(1, 2, 3))) == Seq(1, 2, 3))
    assertThrows[IllegalArgumentException](Codec.encode(sch, Seq(1, 2)))
  }

  test("composite encodes members in sorted key order with LE length prefixes") {
    val sch = SComposite(List("b" -> SString, "a" -> SInt32))
    val bytes = Codec.encode(sch, Map("a" -> 7, "b" -> "xy"))
    // sorted order: a (int32 LE), then b (u32 len prefix + utf8)
    assert(bytes.toSeq == Seq[Byte](7, 0, 0, 0, 2, 0, 0, 0, 'x'.toByte, 'y'.toByte))
    val back = Codec.decode(sch, bytes).asInstanceOf[Map[String, Any]]
    assert(back("a") == 7 && back("b") == "xy")
  }

  test("little-endian layout for int32") {
    assert(Codec.encode(SInt32, 0x01020304).toSeq == Seq[Byte](4, 3, 2, 1))
  }

  test("validates walks composite structure without decoding member bytes") {
    val sch = SComposite(List("s" -> SString, "n" -> SInt16))
    // member bytes are NOT valid UTF-8 (0xFF): a decode/re-encode check
    // would see a replacement char change the length and false-reject;
    // the reference validates structure (widths + prefixes) only
    val nonUtf8 = Array[Byte](5, 0, /* n: int16 LE */
      1, 0, 0, 0, /* len(s) = 1 */ 0xFF.toByte)
    assert(Codec.validates(sch, nonUtf8))
    // truncated member and trailing garbage still fail
    assert(!Codec.validates(sch, nonUtf8.dropRight(1)))
    assert(!Codec.validates(sch, nonUtf8 :+ 0.toByte))
  }
}
