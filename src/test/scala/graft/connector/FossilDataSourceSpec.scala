package graft.connector

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit

import graft.SparkSpec
import graft.api.LocalClient

/** The DSv2 front door: `spark.read.format("fossil")` over ParquetStore
  * roots — schema exposure, result identity with the library path, topic
  * directory pruning, time/topic/column pushdown, mixed-schema widening,
  * array and composite values, the ambiguous (opaque) view, and the
  * read-only version gate. */
class FossilDataSourceSpec extends SparkSpec {

  private val fixedClock: () => Long =
    () => java.time.Instant.parse("2025-01-01T00:00:00Z").toEpochMilli * 1000L

  private def newRoot(tag: String): String =
    Files.createTempDirectory(s"graft_dsv2_$tag").toString

  private def ts(s: String): Timestamp = Timestamp.from(java.time.Instant.parse(s))

  /** Small two-topic float64 store with a known time spread. */
  private def floatStore(): String = {
    val root = newRoot("f64")
    val c = new LocalClient(spark, root, fixedClock)
    c.createTopic("/m", "float64")
    (0 until 20).foreach { i =>
      c.append(s"/m/${if (i % 2 == 0) "a" else "b"}", i.toDouble,
        ts(f"2024-01-${i + 1}%02dT00:00:00Z"))
    }
    root
  }

  private def readFossil(root: String, prefix: String = "/"): DataFrame = {
    val r = spark.read.format("fossil")
    (if (prefix == "/") r else r.option("prefix", prefix)).load(root)
  }

  private def scanOf(df: DataFrame): FossilScan = {
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan
    }
    assert(scans.nonEmpty, "no BatchScanExec in plan:\n" +
      df.queryExecution.executedPlan.toString)
    scans.head.asInstanceOf[FossilScan]
  }

  test("schema exposure + scan_all identical to the library entries path") {
    val root = floatStore()
    val df = readFossil(root)
    assert(df.schema == StructType(Seq(
      StructField("time", TimestampType, nullable = false),
      StructField("topic", StringType, nullable = false),
      StructField("value", DoubleType, nullable = true))))
    val lib = new graft.engine.ParquetStore(spark, root).entries("/")
      .orderBy("time", "topic").collect().toSeq
    val dsv2 = df.orderBy("time", "topic").collect().toSeq
    assert(dsv2 == lib)
    assert(dsv2.size == 20)
  }

  test("prefix option + topic equality filter prune partition directories") {
    val root = floatStore()
    val one = readFossil(root).filter(col("topic") === "/m/a")
    val scan = scanOf(one)
    // only /m/a's directory was listed: every planned partition is /m/a
    val parts = scan.planInputPartitions().map(_.asInstanceOf[FossilInputPartition])
    assert(parts.nonEmpty && parts.forall(_.topic == "/m/a"))
    assert(one.count() == 10)
    assert(scan.description().contains("PushedFilters: ["))
    assert(scan.description().contains("topic"))
    // prefix narrows the same way before filters even apply
    val pref = readFossil(root, prefix = "/m/b")
    assert(pref.select("topic").distinct().collect().map(_.getString(0)).toSeq
      == Seq("/m/b"))
  }

  test("time range pushdown: bounds land in the scan; results exact") {
    val root = floatStore()
    val df = readFossil(root).filter(
      col("time") >= lit(ts("2024-01-05T00:00:00Z")) &&
        col("time") < lit(ts("2024-01-11T00:00:00Z")))
    val scan = scanOf(df)
    assert(scan.description().contains("GreaterThanOrEqual(time"))
    assert(scan.description().contains("LessThan(time"))
    // days 5..10 inclusive-exclusive → i = 4..9
    val got = df.select("value").collect().map(_.getDouble(0)).sorted.toSeq
    assert(got == Seq(4.0, 5.0, 6.0, 7.0, 8.0, 9.0))
  }

  test("column pruning: value-only projection reads without time/topic") {
    val root = floatStore()
    val df = readFossil(root).select("value")
    assert(scanOf(df).readSchema().fieldNames.toSeq == Seq("value"))
    assert(df.collect().map(_.getDouble(0)).sorted.toSeq == (0 until 20).map(_.toDouble))
    // count-only path: no file columns at all
    assert(readFossil(root).count() == 20)
    val topicsOnly = readFossil(root).select("topic")
    assert(scanOf(topicsOnly).readSchema().fieldNames.toSeq == Seq("topic"))
    assert(topicsOnly.collect().map(_.getString(0)).count(_ == "/m/a") == 10)
  }

  test("mixed int widths widen to the combined type, like the library path") {
    val root = newRoot("widen")
    val c = new LocalClient(spark, root, fixedClock)
    c.createTopic("/w/i32", "int32")
    c.createTopic("/w/i64", "int64")
    c.append("/w/i32", 7, ts("2024-01-01T00:00:00Z"))
    c.append("/w/i64", 9L, ts("2024-01-02T00:00:00Z"))
    val df = readFossil(root)
    assert(df.schema("value").dataType == LongType)
    assert(df.orderBy("time").collect().map(_.getLong(2)).toSeq == Seq(7L, 9L))
  }

  test("array and composite values round-trip through the connector") {
    val root = newRoot("nest")
    val c = new LocalClient(spark, root, fixedClock)
    c.createTopic("/vec", "[3]float64")
    c.createTopic("/pt", "{x: int64, y: float64}")
    c.append("/vec", Seq(1.0, 2.0, 3.0), ts("2024-01-01T00:00:00Z"))
    c.append("/pt", Row(4L, 2.5), ts("2024-01-01T00:00:00Z")) // fields sorted: x, y
    val vec = readFossil(root, prefix = "/vec").collect()
    assert(vec.length == 1 && vec(0).getSeq[Double](2) == Seq(1.0, 2.0, 3.0))
    val pt = readFossil(root, prefix = "/pt").collect()
    val struct = pt(0).getStruct(2)
    assert(struct.getLong(struct.fieldIndex("x")) == 4L)
    assert(struct.getDouble(struct.fieldIndex("y")) == 2.5)
  }

  test("two topics sharing one composite schema read back TYPED (r17 advice)") {
    // combine(c, c) is ambiguous for composites by the reference's pairwise
    // rule — the combined view must dedupe schemas first, like the library
    // path, or identical-composite siblings silently null out
    val root = newRoot("twincomp")
    val c = new LocalClient(spark, root, fixedClock)
    c.createTopic("/pts/a", "{x: int64, y: float64}")
    c.createTopic("/pts/b", "{x: int64, y: float64}")
    c.append("/pts/a", Row(1L, 1.5), ts("2024-01-01T00:00:00Z"))
    c.append("/pts/b", Row(2L, 2.5), ts("2024-01-02T00:00:00Z"))
    val df = readFossil(root, prefix = "/pts")
    assert(df.schema("value").dataType.isInstanceOf[StructType],
      s"expected typed struct, got ${df.schema("value").dataType}")
    val rows = df.orderBy("time").collect()
    assert(rows.length == 2 && rows.forall(!_.isNullAt(2)))
    assert(rows.map(_.getStruct(2).getLong(0)).toSeq == Seq(1L, 2L))
    // identity with the library path holds for the twin-composite case
    val lib = new graft.engine.ParquetStore(spark, root).entries("/pts")
      .orderBy("time", "topic").collect().toSeq
    assert(df.orderBy("time", "topic").collect().toSeq == lib)
  }

  test("ambiguous mixed-schema prefix reads as null binary, like entries()") {
    val root = newRoot("ambig")
    val c = new LocalClient(spark, root, fixedClock)
    c.createTopic("/x/num", "float64")
    c.createTopic("/x/flag", "boolean")
    c.append("/x/num", 1.5, ts("2024-01-01T00:00:00Z"))
    c.append("/x/flag", true, ts("2024-01-02T00:00:00Z"))
    val df = readFossil(root)
    assert(df.schema("value").dataType == BinaryType)
    val rows = df.orderBy("time").collect()
    assert(rows.length == 2 && rows.forall(_.isNullAt(2)))
    // narrowing the prefix to a uniform schema restores the typed view
    assert(readFossil(root, prefix = "/x/num").schema("value").dataType == DoubleType)
  }

  test("newer on-disk format refuses by name; no migration stamp written") {
    val root = newRoot("ver")
    val c = new LocalClient(spark, root, fixedClock)
    c.createTopic("/t", "int64")
    val sidecar = java.nio.file.Paths.get(root, "catalog.json")
    val bumped = new String(Files.readAllBytes(sidecar), "UTF-8")
      .replace("\"__format_version\": \"2\"", "\"__format_version\": \"99\"")
    Files.write(sidecar, bumped.getBytes("UTF-8"))
    val e = intercept[IllegalStateException] { readFossil(root).schema }
    assert(e.getMessage.contains("99"))
    // the read attempt must not have rewritten the sidecar
    assert(new String(Files.readAllBytes(sidecar), "UTF-8").contains("\"99\""))
  }

  test("time-bound unit conversion is exact for millis, widened-safe for nanos") {
    import FossilTimeBounds._
    // lo: ms*1000 >= loUs  ⟺  ms >= ceil(lo/1000)
    assert(loInUnit(1000L, TimeUnit.MILLIS) == 1L)
    assert(loInUnit(1001L, TimeUnit.MILLIS) == 2L)
    assert(loInUnit(-1001L, TimeUnit.MILLIS) == -1L)
    // hi: ms*1000 <= hiUs  ⟺  ms <= floor(hi/1000)
    assert(hiInUnit(1999L, TimeUnit.MILLIS) == 1L)
    assert(hiInUnit(-1L, TimeUnit.MILLIS) == -1L)
    assert(loInUnit(5L, TimeUnit.NANOS) == 5000L)
    assert(hiInUnit(5L, TimeUnit.NANOS) == 5999L)
    assert(hiInUnit(Long.MaxValue / 1000L, TimeUnit.NANOS) == Long.MaxValue)
    // INT96: epoch day 0 = julian 2440588
    val buf = java.nio.ByteBuffer.allocate(12).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putLong(1500L) // 1500 ns of day
    buf.putInt(2440589) // one day after epoch
    assert(int96ToMicros(buf.array()) == 86400000000L + 1L)
  }

  test("byte-range splits cover a multi-row-group file exactly once") {
    // tiny parquet row groups + a tiny split size force ONE store file to
    // span many ranges — row groups resolve to the range holding their
    // midpoint, so the union must cover every row exactly once (the
    // 100 TB shape: a compacted hot-topic file far bigger than
    // maxPartitionBytes parallelizing across executors)
    val hadoop = spark.sparkContext.hadoopConfiguration
    val oldBlock = hadoop.get("parquet.block.size")
    val oldMax = spark.conf.get("spark.sql.files.maxPartitionBytes")
    hadoop.setInt("parquet.block.size", 1024)
    try {
      val root = newRoot("split")
      val c = new LocalClient(spark, root, fixedClock)
      c.createTopic("/big", "int64")
      import spark.implicits._
      val n = 5000
      c.appendFrame(
        spark.range(n).select(
          org.apache.spark.sql.functions.timestamp_micros(
            col("id") * 1000000L + 1700000000000000L).as("time"),
          org.apache.spark.sql.functions.lit("/big").as("topic"),
          col("id").as("value")),
        "int64")
      spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
      val df = readFossil(root)
      val parts = scanOf(df).planInputPartitions()
      assert(parts.length > 4, s"expected many byte-range splits, got ${parts.length}")
      assert(df.count() == n)
      assert(df.agg(org.apache.spark.sql.functions.sum("value")).first().getLong(0)
        == n.toLong * (n - 1) / 2) // exactly-once: any dup/drop breaks the sum
    } finally {
      if (oldBlock == null) hadoop.unset("parquet.block.size")
      else hadoop.set("parquet.block.size", oldBlock)
      spark.conf.set("spark.sql.files.maxPartitionBytes", oldMax)
    }
  }

  test("SQL view over the connector composes with plain Spark SQL") {
    val root = floatStore()
    readFossil(root).createOrReplaceTempView("fossil_entries")
    val out = spark.sql(
      "SELECT topic, count(*) AS n, sum(value) AS s FROM fossil_entries " +
        "GROUP BY topic ORDER BY topic").collect()
    assert(out.toSeq == Seq(Row("/m/a", 10L, 90.0), Row("/m/b", 10L, 100.0)))
  }
}
