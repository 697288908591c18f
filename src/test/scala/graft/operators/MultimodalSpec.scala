package graft.operators

import graft.SparkSpec
import Multimodal._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Seq(
    MediaFile(1L, "image", Array.tabulate(300)(i => (i % 251).toByte)),
    MediaFile(2L, "audio", Array.tabulate(1000)(i => (i % 13).toByte)),
    MediaFile(3L, "video", Array.emptyByteArray)
  ).toDS()

  test("HeaderDecoder parses real PNG/GIF/JPEG headers (offsets + endianness)") {
    import Multimodal.HeaderDecoder.dims
    // round-trip through the spec-correct header builders
    assert(dims(Multimodal.pngHeader(640, 480)) == Some(("png", 640, 480)))
    assert(dims(Multimodal.gifHeader(320, 200)) == Some(("gif", 320, 200)))
    assert(dims(Multimodal.jpegHeader(1920, 1080)) == Some(("jpeg", 1920, 1080)))
    // asymmetric dims catch transposed width/height (JPEG SOF is [h][w])
    assert(dims(Multimodal.jpegHeader(2, 6000)) == Some(("jpeg", 2, 6000)))
    // GIF is little-endian u16: 0x0102 must read 258, not 513
    assert(dims(Multimodal.gifHeader(258, 1)) == Some(("gif", 258, 1)))
    // GIF87a variant also parses
    val gif87 = Multimodal.gifHeader(5, 7)
    gif87(4) = '7'.toByte
    assert(dims(gif87) == Some(("gif", 5, 7)))
    // payload after the header does not confuse any parser
    assert(dims(Multimodal.pngHeader(9, 8) ++ "trailing payload".getBytes)
      == Some(("png", 9, 8)))
    // truncated / junk input parses to None, never throws
    assert(dims(Multimodal.pngHeader(640, 480).take(20)).isEmpty)
    assert(dims(Multimodal.jpegHeader(10, 10).take(21)).isEmpty) // cut inside APP0
    assert(dims(Array[Byte](1, 2, 3)).isEmpty)
    assert(dims(Array.emptyByteArray).isEmpty)
    // JPEG with scan data before any SOF (malformed for our purposes) → None
    val noSof = Array(0xff, 0xd8, 0xff, 0xda, 0x00, 0x04, 0, 0).map(_.toByte)
    assert(dims(noSof).isEmpty)
  }

  test("decodeMeta parses genuine dimensions/durations from header-wrapped payloads") {
    val files = Seq(
      MediaFile(10L, "raw", Multimodal.pngHeader(101, 77) ++ Array.fill(50)(9.toByte)),
      MediaFile(11L, "raw", Multimodal.gifHeader(3, 4) ++ Array.fill(10)(1.toByte)),
      MediaFile(12L, "raw", Multimodal.jpegHeader(800, 600)),
      MediaFile(13L, "raw", Array.fill(30)(5.toByte)),
      // 64000 data bytes at 32000 B/s → exactly 2000 ms
      MediaFile(14L, "raw", Multimodal.wavHeader(64000) ++ Array.fill(64000)(7.toByte)))
      .toDS()
    val out = decodeMeta(files).collect().sortBy(_.media_id)
    assert(out(0).kind == "png" && out(0).width == 101 && out(0).height == 77)
    assert(out(0).n_bytes == 33L + 50L)
    assert(out(1).kind == "gif" && out(1).width == 3 && out(1).height == 4)
    assert(out(2).kind == "jpeg" && out(2).width == 800 && out(2).height == 600)
    // unrecognized payload: kind falls back to the carried kind, dims 0
    assert(out(3).kind == "raw" && out(3).width == 0 && out(3).height == 0)
    assert(out(4).kind == "wav" && out(4).duration_ms == 2000L && out(4).width == 0)
  }

  test("wavDurationMs walks RIFF chunks and survives truncation/junk") {
    import Multimodal.HeaderDecoder.wavDurationMs
    // duration floors: 48000 bytes at 32000 B/s → 1500 ms; 1000 → 31 ms
    assert(wavDurationMs(Multimodal.wavHeader(48000)) == Some(1500L))
    assert(wavDurationMs(Multimodal.wavHeader(1000)) == Some(31L))
    // data size field alone suffices — payload beyond the buffer is fine
    assert(wavDurationMs(Multimodal.wavHeader(1 << 20)) == Some(32768L))
    assert(wavDurationMs(Multimodal.wavHeader(100).take(20)).isEmpty) // truncated
    assert(wavDurationMs("RIFFxxxxWAVE".getBytes).isEmpty) // no chunks
    assert(wavDurationMs(Array[Byte](1, 2, 3)).isEmpty)
    // hostile size fields must not loop forever or index negatively:
    // 0xFFFFFFF8 once truncated to Int would advance the walk by zero
    val hostile = Multimodal.wavHeader(100)
    hostile(16) = 0xf8.toByte; hostile(17) = 0xff.toByte
    hostile(18) = 0xff.toByte; hostile(19) = 0xff.toByte // fmt size = 0xFFFFFFF8
    assert(wavDurationMs(hostile).isEmpty) // walks past the buffer and stops
    val zeroChunk = Multimodal.wavHeader(100)
    zeroChunk(12) = 'j' // unknown zero-advance-prone chunk: must still terminate
    wavDurationMs(zeroChunk) // terminates without throwing (advance ≥ 8 always)
  }

  test("decodeMeta: one row per input, deterministic stub metadata") {
    val out = decodeMeta(media).collect().sortBy(_.media_id)
    assert(out.length == 3)
    assert(out.map(_.media_id).toSeq == Seq(1L, 2L, 3L))
    assert(out(0).n_bytes == 300L && out(2).n_bytes == 0L)
    assert(out(0).content_md5.matches("[0-9a-f]{32}"))
    // deterministic: re-running yields identical rows
    assert(decodeMeta(media).collect().sortBy(_.media_id).toSeq == out.toSeq)
  }

  test("decodeMeta batches inside partitions (shape check via partition count)") {
    val parts = media.repartition(2)
    assert(decodeMeta(parts).rdd.getNumPartitions == 2)
    assert(decodeMeta(parts).count() == 3)
  }

  test("sampleFrames: bounded fan-out, slice boundaries respected") {
    val frames = sampleFrames(media, strideBytes = 100, frameBytes = 40)
      .collect().groupBy(_.media_id)
    assert(frames(1L).length == 3)  // 300/100
    assert(frames(2L).length == 10) // 1000/100
    assert(!frames.contains(3L))    // empty blob → no frames
    assert(frames(1L).forall(_.frame_bytes.length == 40))
    val f0 = frames(1L).minBy(_.frame_ix)
    assert(f0.frame_bytes.toSeq == Array.tabulate(40)(i => (i % 251).toByte).toSeq)
  }

  test("metaColumns matches the columnar contract") {
    val df = media.toDF().select($"media_id".as("doc_id"), $"bytes")
    val out = metaColumns(df, "doc_id", "bytes").collect().sortBy(_.getAs[Long]("media_id"))
    assert(out(0).getAs[Long]("n_bytes") == 300L)
  }
}
