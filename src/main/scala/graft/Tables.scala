package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{Catalog, FossilSchema}

/** Readers for the driver-provided test tables (`TESTDATA.md`), plus the
  * entry-view adapters that expose the `events` table through the fossil
  * data model (`topic = /events/<event_type>`, `value = value`).
  */
object Tables {

  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is Parquet TIMESTAMP(NANOS) which Spark 4 refuses
    * ([PARQUET_TYPE_ILLEGAL]); read it as raw nanos and convert to a µs
    * timestamp — identical to DuckDB's ns→µs truncation, so oracle
    * comparisons line up exactly. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    read(spark, dir, "events")
      // keep the raw nanos column: predicates on it push down to Parquet
      // row-group stats, predicates on the converted timestamp cannot
      .withColumn("__t_ns", col("ts"))
      // integer div — long/long through `/` would round-trip a 1.7e18 ns
      // value through double (53-bit mantissa) and corrupt low digits
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Events as fossil entries: `(time, topic, value:double)` + pushdown
    * column `__t_ns` (dropped by the compiler after filtering). */
  def eventEntries(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).select(
      col("ts").as("time"),
      concat(lit("/events/"), col("event_type")).as("topic"),
      col("value").as("value"),
      col("__t_ns"))

  /** Events as int64-valued entries (`value = user_id`) — exact-integer
    * arithmetic for deterministic reduce/avg oracle checks. */
  def eventEntriesLong(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).select(
      col("ts").as("time"),
      concat(lit("/events/"), col("event_type")).as("topic"),
      col("user_id").as("value"),
      col("__t_ns"))

  def eventsCatalog: Catalog = {
    val c = new Catalog
    c.createDdl("/events", "float64")
    Seq("click", "view", "purchase", "signup", "error")
      .foreach(t => c.ensure(s"/events/$t"))
    c
  }

  def eventsCatalogLong: Catalog = {
    val c = new Catalog
    c.createDdl("/events", "int64")
    Seq("click", "view", "purchase", "signup", "error")
      .foreach(t => c.ensure(s"/events/$t"))
    c
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")
}
