package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media rides through the engine as an opaque `binary` column plus typed
  * metadata — the pattern that scales to 100 TB: bytes stay columnar in
  * Parquet, metadata prunes/partitions, and decode runs batched inside
  * executors, never on the driver.
  *
  * The actual codec step is STUBBED (no image/audio libraries in this
  * environment): `FakeDecoder` derives deterministic pseudo-metadata and
  * pseudo-frames from the bytes. Everything around it — the schema, the
  * typed Dataset API, the batched mapPartitions execution shape (the Scala
  * analog of `mapInPandas` batches), the frame-sample explode — is real.
  */
object Multimodal {

  /** Typed media row: the schema a media lake table carries. */
  case class MediaFile(media_id: Long, kind: String, bytes: Array[Byte])

  /** Decoded (stub) metadata: what a real decoder would emit. */
  case class MediaMeta(
      media_id: Long, kind: String, n_bytes: Long, content_md5: String,
      width: Int, height: Int, duration_ms: Long)

  case class Frame(media_id: Long, frame_ix: Int, frame_bytes: Array[Byte])

  /** STUB decoder — deterministic fake in place of a real codec.
    * A production build swaps `decodeOne` for an actual library call; the
    * surrounding batching/planning machinery is unchanged. */
  object FakeDecoder {
    val BatchSize = 64 // batch shape a vectorized decoder would want

    def decodeOne(m: MediaFile): MediaMeta = {
      val n = m.bytes.length.toLong
      // ??? real codec goes here; deterministic fake below
      val b0 = if (n > 0) m.bytes(0) & 0xff else 0
      val b1 = if (n > 1) m.bytes(1) & 0xff else 0
      MediaMeta(m.media_id, m.kind, n,
        md5Hex(m.bytes),
        width = 16 * (1 + b0 % 40), height = 16 * (1 + b1 % 30),
        duration_ms = n * 125 / 3)
    }

    private def md5Hex(b: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5").digest(b)
        .map("%02x".format(_)).mkString
  }

  /** Batched executor-side decode: the mapPartitions shape a vectorized /
    * native decoder needs (amortized init, fixed-size batches), one output
    * row per input row, order-preserving. */
  def decodeMeta(media: Dataset[MediaFile]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init of the (stub) codec happens here, once
      it.grouped(FakeDecoder.BatchSize).flatMap(_.map(FakeDecoder.decodeOne))
    }
  }

  /** Columnar metadata extraction — the cheap subset of decodeMeta that
    * needs no codec, as pure Catalyst expressions (oracle-checkable). */
  def metaColumns(df: DataFrame, idCol: String, bytesCol: String): DataFrame =
    df.select(
      col(idCol).as("media_id"),
      length(col(bytesCol)).cast("long").as("n_bytes"),
      md5(col(bytesCol)).as("content_md5"),
      (lit(16) * (lit(1) + pmod(ascii(substring(col(bytesCol).cast("string"), 1, 1)), lit(40))))
        .as("width_stub"))

  /** Frame sampling: every `strideBytes`-th slice of `frameBytes` bytes
    * becomes a "frame" row — the explode shape of real video frame
    * extraction (bounded fan-out, no shuffle). */
  def sampleFrames(
      media: Dataset[MediaFile], strideBytes: Int, frameBytes: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      (0 until math.max(m.bytes.length / strideBytes, 0)).iterator.map { i =>
        Frame(m.media_id, i, m.bytes.slice(i * strideBytes,
          math.min(i * strideBytes + frameBytes, m.bytes.length)))
      }
    }
  }

  /** Adapter: treat the `documents` table as a media lake (text bytes play
    * the blob) — used by tests and the oracle-checked metadata query. */
  def documentsAsMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaFile] = {
    import spark.implicits._
    docs.select(col("doc_id").as("media_id"), lit("text").as("kind"),
      col("text").cast("binary").as("bytes")).as[MediaFile]
  }
}
