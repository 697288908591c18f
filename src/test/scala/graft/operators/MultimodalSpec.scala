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
