package graft.engine

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import graft.api.LocalClient
import graft.fql.Compiler

/** Persistent store + embedded client: append → reopen → FQL query. */
class StoreSpec extends SparkSpec {

  private val fixedClock: Compiler.Clock = () => 1735689600L * 1000000000L // 2025-01-01

  test("create, append, query, reopen round-trip") {
    val root = Files.createTempDirectory("graft_store").toString
    val c = new LocalClient(spark, root, fixedClock)

    c.createTopic("/sensors/temp", "float64")
    c.append("/sensors/temp/garage", 21.5, Timestamp.valueOf("2024-06-01 10:00:00"))
    c.append("/sensors/temp/garage", 23.0, Timestamp.valueOf("2024-06-01 11:00:00"))
    c.append("/sensors/temp/attic", 30.25, Timestamp.valueOf("2024-06-01 10:30:00"))
    c.append("/logs", "started", Timestamp.valueOf("2024-06-01 09:00:00"))

    // prefix query over the typed float topics
    val temps = c.query("all in /sensors/temp")
    assert(temps.count() == 3)
    assert(temps.schema("value").dataType == org.apache.spark.sql.types.DoubleType)

    // time predicate + pipeline through the store
    val recent = c.query("all in /sensors/temp since ~(2024/06/01) + @hour * 10 | filter v -> v > 22")
    assert(recent.count() == 2) // 23.0@11:00 and 30.25@10:30

    // catalog persisted: a fresh client sees schemas and data
    val c2 = new LocalClient(spark, root, fixedClock)
    assert(c2.listTopics.toMap.apply("/sensors/temp") == "float64")
    assert(c2.listTopics.toMap.apply("/sensors/temp/garage") == "float64") // inherited
    assert(c2.query("all in /sensors/temp/garage").count() == 2)

    // stats surface
    val st = c2.stats.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(st("/sensors/temp/garage") == 2L && st("/logs") == 1L)
  }

  test("prefix scan prunes topic partitions at the file index") {
    val root = Files.createTempDirectory("graft_store_pp").toString
    val c = new LocalClient(spark, root, fixedClock)
    c.createTopic("/a", "int64")
    c.createTopic("/b", "int64")
    Seq("/a/x", "/a/y", "/b").foreach { t =>
      c.appendBatch(Seq(org.apache.spark.sql.Row(
        Timestamp.valueOf("2024-01-01 00:00:00"), t, 1L)), "int64")
    }
    val plan = c.query("all in /a/x").queryExecution.executedPlan.toString
    // topic is the physical partition column → prefix predicate becomes a
    // PartitionFilter (no data files of other topics are read)
    assert(plan.contains("PartitionFilters: ["), plan)
    assert(plan.contains("startsWith") || plan.contains("topic"), plan)
    assert(c.query("all in /a/x").count() == 1)
  }

  test("conflicting append schema is rejected") {
    val root = Files.createTempDirectory("graft_store2").toString
    val c = new LocalClient(spark, root, fixedClock)
    c.createTopic("/typed", "int64")
    assertThrows[IllegalArgumentException] {
      c.appendBatch(Seq(org.apache.spark.sql.Row(
        Timestamp.valueOf("2024-01-01 00:00:00"), "/typed", "not a long")), "string")
    }
  }

  test("mixed-schema prefix scan widens numerics like schema.Combine") {
    val root = Files.createTempDirectory("graft_store3").toString
    val c = new LocalClient(spark, root, fixedClock)
    c.createTopic("/m/a", "int32")
    c.createTopic("/m/b", "int64")
    c.appendBatch(Seq(org.apache.spark.sql.Row(
      Timestamp.valueOf("2024-01-01 00:00:00"), "/m/a", 7)), "int32")
    c.appendBatch(Seq(org.apache.spark.sql.Row(
      Timestamp.valueOf("2024-01-01 00:00:00"), "/m/b", 9L)), "int64")
    val df = c.query("all in /m")
    assert(df.schema("value").dataType == org.apache.spark.sql.types.LongType)
    assert(df.count() == 2)
  }
}
