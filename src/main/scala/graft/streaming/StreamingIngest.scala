package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming ingest + continuous analytics for the fossil data
  * model (`docs/overview.md:45-53` — the reference's ingest is a
  * continuously-appending server; queries are one-shot over current state;
  * there is no streaming query engine, so everything here is the natural
  * Spark-first extension, SURVEY §2.5 "Streaming" row).
  *
  * Design: entries stream in with the canonical `(time, topic, value)`
  * shape, land in topic-root-partitioned Parquet via an append sink with
  * checkpointed exactly-once file commits (replacing fossil's WAL+gob spill,
  * `pkg/database/db.go:486-535`), and continuous queries run as watermarked
  * windowed aggregations or stateful per-topic operators.
  */
object StreamingIngest {

  /** Canonical streaming entry row: micros epoch time keeps arithmetic
    * exact and encoder-friendly. */
  case class Entry(t_us: Long, topic: String, value: Double)

  val entrySchema: StructType = StructType(Seq(
    StructField("t_us", LongType, nullable = false),
    StructField("topic", StringType, nullable = false),
    StructField("value", DoubleType, nullable = true)))

  /** File-drop ingest source: JSON-lines files appearing under `inPath`.
    * (The wire-protocol analog of fossil's APPEND firehose; socket sources
    * plug in identically.) */
  def fileSource(spark: SparkSession, inPath: String): DataFrame =
    spark.readStream
      .schema(entrySchema)
      .option("maxFilesPerTrigger", 64) // bounded micro-batches under burst
      .json(inPath)

  /** Append sink: topic-root-partitioned Parquet with checkpointed
    * exactly-once semantics. Partitioning by the topic *root* (first path
    * segment) keeps partition counts bounded while preserving prefix-query
    * pruning (`topic` itself can be high-cardinality). */
  def writeEntries(entries: DataFrame, outPath: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    entries
      .withColumn("topic_root", split(regexp_replace(col("topic"), "^/", ""), "/").getItem(0))
      .writeStream
      .partitionBy("topic_root")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .format("parquet")
      .option("path", outPath)
      .outputMode(OutputMode.Append())
      .start()

  /** Continuous per-topic tumbling-window stats with late-data handling:
    * the streaming twin of a `groupBy(window(...))` batch aggregation.
    * Watermark bounds state; late rows beyond it are dropped (the reference
    * has no late-data story at all — server-assigned timestamps). */
  def windowedStats(entries: DataFrame, windowDur: String, watermarkDelay: String): DataFrame =
    entries
      .withColumn("time", timestamp_micros(col("t_us")))
      .withWatermark("time", watermarkDelay)
      .groupBy(window(col("time"), windowDur), col("topic"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"),
        min("t_us").as("first_us"), max("t_us").as("last_us"))
      .select(col("window.start").as("w_start"), col("topic"),
        col("n"), col("sum_value"), col("first_us"), col("last_us"))

  /** Append sink into a [[graft.engine.ParquetStore]] layout: streamed
    * entries land under the store's schema-group/topic partitioning and are
    * immediately visible to `LocalClient.query` / FQL — the full
    * ingest-to-query path. Topics must be pre-created (or inherit) the
    * declared schema; the stream's value column is cast to it. */
  def writeToStore(entries: DataFrame, storeRoot: String, schemaDdl: String,
      checkpoint: String, trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val st = graft.engine.FossilSchema.parse(schemaDdl)
    val dir = s"$storeRoot/data/sgroup=${graft.engine.ParquetStore.schemaKey(st)}"
    entries
      .select(timestamp_micros(col("t_us")).as("time"), col("topic"),
        col("value").cast(st.sparkType).as("value"))
      .writeStream
      .partitionBy("topic")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .format("parquet")
      .option("path", dir)
      .outputMode(OutputMode.Append())
      .start()
  }

  /** Sliding-window stats: overlapping windows of `windowDur` advancing by
    * `slideDur` — each row lands in windowDur/slideDur windows. */
  def slidingStats(entries: DataFrame, windowDur: String, slideDur: String,
      watermarkDelay: String): DataFrame =
    entries
      .withColumn("time", timestamp_micros(col("t_us")))
      .withWatermark("time", watermarkDelay)
      .groupBy(window(col("time"), windowDur, slideDur), col("topic"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("w_start"), col("topic"), col("n"), col("sum_value"))

  /** Session-window stats: windows close after `gapDur` of per-topic
    * inactivity — the variable-length session shape. */
  def sessionStats(entries: DataFrame, gapDur: String, watermarkDelay: String): DataFrame =
    entries
      .withColumn("time", timestamp_micros(col("t_us")))
      .withWatermark("time", watermarkDelay)
      .groupBy(session_window(col("time"), gapDur), col("topic"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("topic"), col("n"))

  /** Streaming exact dedup: drop rows whose `keyCols` were already seen
    * within the watermark horizon — the streaming twin of
    * `Dedup.exactGroups` (state is bounded by the watermark, the way a
    * 100 TB/day ingest pipeline has to bound it; content hash as the key
    * makes it content-dedup). */
  def dedupWithinWatermark(
      entries: DataFrame, timeCol: String, watermarkDelay: String,
      keyCols: Seq[String]): DataFrame =
    entries
      .withWatermark(timeCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Streaming greedy downsample — the stateful twin of the batch
    * `Sample.greedy` operator (fossil F2, `pkg/query/plan/metadata.go:46-64`):
    * per topic, keep an entry iff it is at least `intervalUs` after the last
    * kept one. State is one Long per topic (last kept time); within each
    * micro-batch rows are processed in time order. Exact greedy semantics
    * hold when event time is non-decreasing across batches (fossil's
    * append-order guarantee); out-of-order arrivals within a batch are
    * sorted, across batches they are best-effort — documented deviation. */
  def greedySample(entries: Dataset[Entry], intervalUs: Long): Dataset[Entry] = {
    import entries.sparkSession.implicits._
    entries
      .groupByKey(_.topic)
      .flatMapGroupsWithState[Long, Entry](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, batch: Iterator[Entry], state: GroupState[Long]) =>
          var lastKept = state.getOption.getOrElse(Long.MinValue)
          val kept = batch.toSeq.sortBy(e => (e.t_us, e.value)).filter { e =>
            val keep = lastKept == Long.MinValue || e.t_us >= lastKept + intervalUs
            if (keep) lastKept = e.t_us
            keep
          }
          if (kept.nonEmpty) state.update(lastKept)
          kept.iterator
      }
  }
}
