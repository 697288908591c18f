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

  test("headerSpan / wavPayloadSpan / payloadSpan isolate the payload per format") {
    import Multimodal.HeaderDecoder._
    assert(headerSpan(Multimodal.pngHeader(9, 8) ++ Array.fill(5)(1.toByte))
      == Some(("png", 9, 8, 33)))
    assert(headerSpan(Multimodal.gifHeader(3, 4)) == Some(("gif", 3, 4, 13)))
    assert(headerSpan(Multimodal.jpegHeader(10, 10)) == Some(("jpeg", 10, 10, 39)))
    // GIF with a global color table: flags depth bits 2 → 3·2^3 = 24 bytes
    val gct = Multimodal.gifHeader(8, 8) ++ Array.fill(24)(0x55.toByte) ++
      Array.fill(40)(9.toByte)
    gct(10) = (0x80 | 2).toByte
    assert(headerSpan(gct) == Some(("gif", 8, 8, 37)))
    assert(wavPayloadSpan(Multimodal.wavHeader(100)) == Some(44))
    assert(wavPayloadSpan(Array[Byte](1, 2, 3)).isEmpty)
    assert(payloadSpan("no header at all".getBytes) == 0)
    // span clamps to the buffer on truncated files — never out of range
    assert(headerSpan(Multimodal.pngHeader(9, 8).take(30)).map(_._4) == Some(30))
  }

  test("resize: exact contain-fit dims, spec-correct re-emitted header, area-ratio byte budget") {
    // 100×50 into 64×64: width binds → 64×32; 200-byte payload scales by
    // 2048/5000 → floor 81
    val in = MediaFile(1L, "m", Multimodal.pngHeader(100, 50) ++
      Array.tabulate(200)(i => (i % 251).toByte))
    val out = resizeOne(in, 64, 64)
    assert(HeaderDecoder.dims(out.bytes) == Some(("png", 64, 32)))
    assert(out.bytes.length == 33 + 81)
    // payload is the deterministic prefix slice of the original payload
    assert(out.bytes.drop(33).toSeq == in.bytes.slice(33, 33 + 81).toSeq)
    // 10×500 into 64×64: height binds → floor(10·64/500) = 1 (min-1 floor)
    val tall = MediaFile(2L, "m", Multimodal.gifHeader(10, 500) ++
      Array.fill(100)(7.toByte))
    val t = resizeOne(tall, 64, 64)
    assert(HeaderDecoder.dims(t.bytes) == Some(("gif", 1, 64)))
    assert(t.bytes.length == 13 + 100 * (1 * 64) / (10 * 500))
    // inside the box / non-image: IDENTICAL pass-through, no rewrite
    val small = MediaFile(3L, "m", Multimodal.pngHeader(10, 10) ++ Array.fill(9)(1.toByte))
    assert(resizeOne(small, 64, 64) eq small)
    val wav = MediaFile(4L, "m", Multimodal.wavHeader(100) ++ Array.fill(100)(2.toByte))
    assert(resizeOne(wav, 64, 64) eq wav)
    // distributed round trip through the real parser
    val ds = Seq(in, tall, small, wav).toDS()
    val metas = decodeMeta(resize(ds, 64, 64)).collect().sortBy(_.media_id)
    assert(metas.map(m => (m.width, m.height)).toSeq ==
      Seq((64, 32), (1, 64), (10, 10), (0, 0)))
  }

  test("imageFeatures: pinned md5 stand-in, format-independent payload strip") {
    // two-stage stand-in: md5("abc") = 900150983cd24fb0d6963f7d28e17f72,
    // md5("900150…7f72:0") = a1056721… → 0xa1056721 % 2001 - 1000 = 790
    // md5("900150…7f72:1") = a3f1732e… → 0xa3f1732e % 2001 - 1000 = 303
    val abc = "abc".getBytes
    val wrapped = Seq(
      MediaFile(1L, "m", Multimodal.pngHeader(4, 4) ++ abc),
      MediaFile(2L, "m", Multimodal.wavHeader(3) ++ abc),
      MediaFile(3L, "m", abc)) // unrecognized: all payload
    val out = imageFeatures(wrapped.toDS(), dim = 2).collect()
      .groupBy(_.media_id).view.mapValues(_.sortBy(_.feat_ix).map(_.feat).toSeq).toMap
    // identical features from every wrapping — the span isolation works
    assert(out == Map(1L -> Seq(790L, 303L), 2L -> Seq(790L, 303L),
      3L -> Seq(790L, 303L)))
  }

  test("mediaFeatures: pluggable vectorizer seam — custom embedder runs " +
      "the same plumbing; imageFeatures == the md5 stub instance") {
    val abc = "abc".getBytes
    val wrapped = Seq(
      MediaFile(1L, "m", Multimodal.pngHeader(4, 4) ++ abc),
      MediaFile(2L, "m", "xyz".getBytes)).toDS()
    // a drop-in "model": per-partition open() counts as the load slot,
    // features are payload byte-sums offset by the dim index (exact longs)
    val custom = new Multimodal.Vectorizer {
      val dim = 2
      def open(): (Array[Byte], Int, Int) => Array[Long] = { (b, off, len) =>
        var s = 0L
        var i = off
        while (i < off + len) { s += (b(i) & 0xff); i += 1 }
        Array(s, s + 1)
      }
    }
    val out = mediaFeatures(wrapped, custom).collect()
      .groupBy(_.media_id).view.mapValues(_.sortBy(_.feat_ix).map(_.feat).toSeq).toMap
    // payload isolation applies to the custom embedder too: id 1's PNG
    // header is stripped, so both rows sum their 3 ASCII payload bytes
    val abcSum = "abc".getBytes.map(_.toLong).sum
    val xyzSum = "xyz".getBytes.map(_.toLong).sum
    assert(out == Map(1L -> Seq(abcSum, abcSum + 1), 2L -> Seq(xyzSum, xyzSum + 1)))
    // the shipped stub rides the same seam: imageFeatures IS
    // mediaFeatures(Md5StubVectorizer) — outputs identical by construction
    val viaSeam = mediaFeatures(wrapped, new Multimodal.Md5StubVectorizer(2))
      .collect().sortBy(f => (f.media_id, f.feat_ix)).toSeq
    val direct = imageFeatures(wrapped, dim = 2)
      .collect().sortBy(f => (f.media_id, f.feat_ix)).toSeq
    assert(viaSeam == direct)
    // a lying vectorizer (declared dim != returned length) fails loudly
    val liar = new Multimodal.Vectorizer {
      val dim = 3
      def open(): (Array[Byte], Int, Int) => Array[Long] = (_, _, _) => Array(1L)
    }
    val boom = intercept[Exception] { mediaFeatures(wrapped, liar).collect() }
    assert(boom.toString.contains("declared dim") ||
      Option(boom.getCause).exists(_.toString.contains("declared dim")))
  }

  test("featureVectors assembles exploded features into feat_ix-ordered " +
      "vectors, ANN-composable") {
    val wrapped = Seq(
      MediaFile(1L, "m", Multimodal.pngHeader(4, 4) ++ "abc".getBytes),
      MediaFile(2L, "m", "xyz".getBytes)).toDS()
    val feats = imageFeatures(wrapped, dim = 3)
    val vecs = featureVectors(feats).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // same values as the exploded form, in feat_ix order
    val expect = feats.collect().groupBy(_.media_id)
      .view.mapValues(_.sortBy(_.feat_ix).map(_.feat).toSeq).toMap
    assert(vecs == expect)
    assert(vecs.values.forall(_.length == 3))
    // the assembled column feeds the similarity kernels directly: the
    // composition seam the mm_ann battery row exercises end-to-end
    val df = featureVectors(feats)
    val sim = df.as("a").join(df.as("b"),
        org.apache.spark.sql.functions.col("a.media_id") <
          org.apache.spark.sql.functions.col("b.media_id"))
      .select(Similarity.cosineE6(
        org.apache.spark.sql.functions.col("a.embedding").cast("array<double>"),
        org.apache.spark.sql.functions.col("b.embedding").cast("array<double>"))
        .as("c"))
      .collect()
    assert(sim.length == 1 && math.abs(sim.head.getLong(0)) <= 1000000L)
  }
}
