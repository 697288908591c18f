package graft.api

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.engine.{FossilEngine, FossilSchema, ParquetStore}
import graft.fql.Compiler

/** Embedded local client — the analog of the reference's server-less mode
  * (`api/local.go:17-91`, connection string `file://path`), exposing the
  * command surface of SURVEY §2.6 over a [[ParquetStore]]:
  *
  *   QUERY  → [[query]]      APPEND → [[append]]/[[appendBatch]]
  *   CREATE → [[createTopic]] LIST  → [[listTopics]]/[[listSchemas]]
  *   STATS  → [[stats]]
  *
  * (VERSION/USE are wire-protocol session concerns — out of engine scope.)
  */
final class LocalClient(
    val spark: SparkSession, root: String,
    clock: Compiler.Clock = Compiler.systemClock) {

  private val store = new ParquetStore(spark, root)
  val engine = new FossilEngine(spark, store, clock)

  /** QUERY: FQL in, entries DataFrame out. */
  def query(fql: String): DataFrame = engine.query(fql)

  /** APPEND one datum (reference `db.Append`, `pkg/database/db.go:486-535`);
    * topic auto-creates with schema inheritance. Timestamp defaults to the
    * client clock like the reference's server-assigned time. */
  def append(topic: String, value: Any, time: Timestamp = null): Unit = {
    val at = if (time != null) time
      else new Timestamp(Math.floorDiv(clock(), 1000000L))
    val schema = store.catalog.ensure(topic)
    appendBatch(Seq(Row(at, topic, value)), schema.ddl)
  }

  /** Bulk APPEND of `(time, topic, value)` rows sharing one schema DDL. */
  def appendBatch(rows: Seq[Row], ddl: String): Unit = {
    val st = FossilSchema.parse(ddl)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, rows.size / 10000)),
      StructType(Seq(
        StructField("time", TimestampType), StructField("topic", StringType),
        StructField("value", st.sparkType))))
    store.append(df, st)
  }

  def createTopic(path: String, ddl: String = "string"): Unit =
    store.createTopic(path, ddl)

  /** LIST topics (with schema DDL). */
  def listTopics: Seq[(String, String)] = store.catalog.list.map { case (t, s) => (t, s.ddl) }

  /** LIST schemas in use. */
  def listSchemas: Seq[String] = store.catalog.list.map(_._2.ddl).distinct.sorted

  /** STATS: per-topic entry counts + time bounds (reference
    * `pkg/database/stats.go` analog, computed from data not heap). */
  def stats: DataFrame = {
    import org.apache.spark.sql.functions._
    query("all").groupBy("topic")
      .agg(count(lit(1)).as("n"), min("time").as("first"), max("time").as("last"))
      .orderBy("topic")
  }
}
