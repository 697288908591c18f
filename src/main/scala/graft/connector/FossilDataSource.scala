package graft.connector

import java.util.OptionalLong

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.engine.{Catalog, FossilSchema, ParquetStore, StoreFs, StoreMigration}
import graft.engine.FossilSchema.{SAmbiguous, SType, SUnknown}

/** `spark.read.format("fossil")` — the engine's front door for plain Spark
  * users: a DataSource V2 READ connector over a ParquetStore root, so every
  * external Spark tool (SQL catalogs, other pipelines, notebooks) composes
  * with a fossil store through the idiomatic surface instead of the
  * library API ([[graft.api.LocalClient]] / [[graft.engine.ParquetStore]]).
  *
  *   spark.read.format("fossil").load(root)                  // whole store
  *   spark.read.format("fossil").option("prefix", "/events") // topic prefix
  *
  * Returns the canonical entry frame `(time TIMESTAMP, topic STRING,
  * value T)` — the same shape and COMBINED value typing as
  * `ParquetStore.entries` (schema groups are widened to the catalog's
  * combined type; a mixed-scalar store reads as null binary, exactly like
  * the library path).
  *
  * Pushdown, mirroring what the engine's own query path gets from
  * [[graft.plans.RawTimePushdown]] + partition pruning:
  *   - topic equality / IN / prefix filters prune PARTITION DIRECTORIES at
  *     planning time (no file of a filtered-out topic is even listed);
  *   - time range bounds become parquet row-group predicates evaluated
  *     against min/max stats (the store writes time-sorted files so the
  *     stats partition the time axis);
  *   - column pruning reaches the parquet pages (a `select(value)` never
  *     decodes time).
  * Every pushed filter is ALSO returned as a residual — Spark re-evaluates
  * the exact predicate, so pruning is never a correctness input.
  *
  * Reads are DSv2-only by design: writes go through the library/client
  * (`LocalClient.append`, streaming ingest) because the store has a
  * single-writer contract per root (catalog sidecar persistence) that a
  * distributed DSv2 writer would violate. The connector likewise opens the
  * catalog READ-ONLY: a newer on-disk format version refuses by name, an
  * older one is readable in place (no migration stamp is written — opening
  * a store for reading must not mutate it).
  *
  * Scale: planning lists only the partition directories of surviving
  * topics; files bigger than `spark.sql.files.maxPartitionBytes` split
  * into byte-range row-group partitions exactly like Spark's native file
  * splits, so a single hot topic parallelizes across a cluster. */
final class FossilDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "fossil"

  override def supportsExternalMetadata(): Boolean = false

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FossilDataSource.resolve(options.asCaseSensitiveMap().asScala.toMap).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    FossilDataSource.resolve(properties.asScala.toMap)
}

private[connector] object FossilDataSource {

  /** Options → opened (read-only) table. Layout is AUTO-DETECTED: a
    * ParquetStore root (catalog.json) or a NATIVE fossil v2/v1 database
    * directory (metadata / single-file `database`) — one front door for
    * both the engine's own storage and the migration-source deployments
    * [[graft.sources.FossilDatabase]] decodes. */
  def resolve(options: Map[String, String]): FossilTableBase = {
    val ci = options.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }
    val root = ci.get("path").orElse(singlePathOf(ci.get("paths"))).getOrElse(
      throw new IllegalArgumentException(
        "fossil source needs a store root: spark.read.format(\"fossil\").load(root)"))
    val prefix = ci.getOrElse("prefix", "/")
    if (StoreFs.exists(s"$root/metadata") || StoreFs.exists(s"$root/database"))
      new FossilNativeTable(root, prefix)
    else if (StoreFs.exists(s"$root/catalog.json")) {
      val (catalog, version) = ParquetStore.loadCatalog(root)
      if (version > StoreMigration.CurrentVersion)
        throw new IllegalStateException(
          s"store at $root has format version $version, newer than the " +
            s"supported version ${StoreMigration.CurrentVersion} — upgrade the library")
      new FossilTable(root, prefix, catalog)
    } else throw new IllegalArgumentException(
      s"$root is neither a fossil store root (no catalog.json) nor a " +
        "native fossil database (no metadata / database file)")
  }

  /** `load(a, b)` arrives as a JSON array under "paths" — one root only
    * (a fossil table IS one store; union two stores in the query). */
  private def singlePathOf(pathsJson: Option[String]): Option[String] =
    pathsJson.map { js =>
      val items = """"((?:[^"\\]|\\.)*)"""".r
        .findAllMatchIn(js).map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))
        .toList
      items match {
        case one :: Nil => one
        case _ => throw new IllegalArgumentException(
          s"fossil source reads exactly one store root, got ${items.length} paths")
      }
    }

  /** Inverse of Spark's partition-path escaping (`%XX` hex sequences —
    * topic values contain `/`, stored as `%2F`). */
  def unescapePathName(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        val hex = s.substring(i + 1, i + 3)
        try { sb.append(Integer.parseInt(hex, 16).toChar); i += 3 }
        catch { case _: NumberFormatException => sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}

/** What the shared [[FossilScanBuilder]] needs from either layout's table:
  * the combined value typing, the prefix's topic list for directory/datum
  * pruning, and a layout-specific scan factory. */
trait FossilTableBase extends Table with SupportsRead {
  def root: String
  def prefix: String
  def combined: SType
  def opaqueValue: Boolean
  /** Topics under the prefix (candidate set the pushed topic filters cut). */
  def prefixTopics: Seq[String]
  /** Layout-specific scan over the surviving topics. */
  def makeScan(wanted: Seq[String], pruned: StructType,
      loUs: Option[Long], hiUs: Option[Long], pushed: Array[Filter]): Scan

  override def schema(): StructType = StructType(Seq(
    StructField("time", TimestampType, nullable = false),
    StructField("topic", StringType, nullable = false),
    StructField("value", combined.sparkType, nullable = true)))

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FossilScanBuilder(this)
}

final class FossilTable(
    val root: String, val prefix: String, val catalog: Catalog)
  extends FossilTableBase {

  /** The store layout also streams (`spark.readStream.format("fossil")`):
    * an append-only file tree IS a replayable log — see
    * [[FossilMicroBatchStream]]. The native layout stays batch-only (a
    * frozen migration-source snapshot has no append stream to tail). */
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)

  /** Combined fossil schema over every catalog topic under the prefix —
    * CATALOG-derived (deterministic from the sidecar alone, independent of
    * which topics hold data yet), where the library's `entries` combines
    * the on-disk groups; identical whenever every topic has landed data. */
  val combined: SType = catalog.combinedSchema(prefix) match {
    case SUnknown => FossilSchema.default
    case s => s
  }
  val opaqueValue: Boolean = combined == SAmbiguous

  override def name(): String = s"fossil:$root[$prefix]"

  override def prefixTopics: Seq[String] = catalog.topicsUnder(prefix)

  /** STATS-class metadata for SQL users (`DESCRIBE EXTENDED`, `SHOW
    * TBLPROPERTIES`) — the visibility wire clients get from the STATS
    * command. Lazy: computed on the FIRST properties call (a plain
    * SELECT's planning never lists files through here), then fixed for
    * this table handle. Row counts come from the same cached footer
    * reads the scan statistics use, capped identically. */
  override def properties(): java.util.Map[String, String] = tableProps

  private lazy val tableProps: java.util.Map[String, String] = {
    val m = new java.util.HashMap[String, String]()
    m.put("topics", prefixTopics.size.toString)
    m.put("combined_schema", combined.ddl)
    val files = FossilScan.listDataFiles(this, prefixTopics)
    m.put("num_files", files.size.toString)
    m.put("size_bytes", files.map(_.length).sum.toString)
    if (files.size <= FossilScan.statsFooterCap)
      m.put("num_rows",
        files.map(f => FossilScan.footerRowCount(f.path, f.length)).sum.toString)
    m
  }

  override def makeScan(wanted: Seq[String], pruned: StructType,
      loUs: Option[Long], hiUs: Option[Long], pushed: Array[Filter]): Scan =
    new FossilScan(this, wanted, pruned, loUs, hiUs, pushed)
}

final class FossilScanBuilder(table: FossilTableBase)
  extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pruned: StructType = table.schema()
  private var accepted: Array[Filter] = Array.empty

  // conjunct state (all pushed filters AND together)
  private var loUs: Option[Long] = None
  private var hiUs: Option[Long] = None
  private var topicAllow: Option[Set[String]] = None
  private var topicPrefixes: List[String] = Nil

  override def pruneColumns(requiredSchema: StructType): Unit =
    pruned = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val acc = List.newBuilder[Filter]
    filters.foreach {
      case f @ GreaterThanOrEqual("time", v) => tsUs(v).foreach { us =>
        loUs = Some(loUs.fold(us)(math.max(_, us))); acc += f }
      case f @ GreaterThan("time", v) => tsUs(v).foreach { us =>
        val lo = if (us == Long.MaxValue) us else us + 1
        loUs = Some(loUs.fold(lo)(math.max(_, lo))); acc += f }
      case f @ LessThanOrEqual("time", v) => tsUs(v).foreach { us =>
        hiUs = Some(hiUs.fold(us)(math.min(_, us))); acc += f }
      case f @ LessThan("time", v) => tsUs(v).foreach { us =>
        val hi = if (us == Long.MinValue) us else us - 1
        hiUs = Some(hiUs.fold(hi)(math.min(_, hi))); acc += f }
      case f @ EqualTo("time", v) => tsUs(v).foreach { us =>
        loUs = Some(loUs.fold(us)(math.max(_, us)))
        hiUs = Some(hiUs.fold(us)(math.min(_, us))); acc += f }
      case f @ EqualTo("topic", s: String) =>
        topicAllow = Some(topicAllow.fold(Set(s))(_.intersect(Set(s)))); acc += f
      case f @ In("topic", vs) if vs.forall(_.isInstanceOf[String]) =>
        val set = vs.map(_.asInstanceOf[String]).toSet
        topicAllow = Some(topicAllow.fold(set)(_.intersect(set))); acc += f
      case f @ StringStartsWith("topic", p) =>
        topicPrefixes ::= p; acc += f
      case f @ IsNotNull("time" | "topic") => acc += f // store never writes nulls
      case _ => () // residual-only
    }
    accepted = acc.result().toArray
    // EVERYTHING stays residual: pruning here is conservative (row-group
    // stats, directory listing); Spark re-evaluates the exact predicates
    filters
  }

  override def pushedFilters(): Array[Filter] = accepted

  /** v1 Filter timestamp literal → µs (both java.time and java.sql forms
    * appear, depending on spark.sql.datetime.java8API.enabled). */
  private def tsUs(v: Any): Option[Long] = v match {
    case t: java.sql.Timestamp =>
      Some(Math.addExact(Math.multiplyExact(t.getTime, 1000L),
        (t.getNanos / 1000L) % 1000L))
    case i: java.time.Instant =>
      Some(Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L),
        (i.getNano / 1000).toLong))
    case _ => None
  }

  override def build(): Scan = {
    val wanted = table.prefixTopics.filter { t =>
      topicAllow.forall(_.contains(t)) && topicPrefixes.forall(t.startsWith)
    }
    table.makeScan(wanted, pruned, loUs, hiUs, accepted)
  }
}

final class FossilScan(
    table: FossilTable,
    wantedTopics: Seq[String],
    pruned: StructType,
    loUs: Option[Long],
    hiUs: Option[Long],
    pushed: Array[Filter])
  extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = pruned

  override def toBatch: Batch = this

  override def toMicroBatchStream(
      checkpointLocation: String): org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new FossilMicroBatchStream(table, wantedTopics, pruned, loUs, hiUs)

  override def description(): String =
    s"FossilScan root=${table.root}, prefix=${table.prefix}, " +
      s"topics=${wantedTopics.size}, " +
      s"PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${pruned.simpleString}"

  /** Planning-time listing: only surviving topics' partition directories
    * are walked (driver-side, same class of work as Spark's own file
    * index; a petabyte deployment would swap a manifest in here). Files
    * split by `spark.sql.files.maxPartitionBytes` byte ranges — row
    * groups resolve to the range holding their midpoint, so no footer is
    * read at planning time. */
  private lazy val partitions: Array[FossilInputPartition] =
    FossilScan.split(FossilScan.listDataFiles(table, wantedTopics),
      FossilScan.maxPartitionBytes())

  override def planInputPartitions(): Array[InputPartition] =
    partitions.toArray[InputPartition]

  override def createReaderFactory(): PartitionReaderFactory =
    new FossilReaderFactory(pruned.fieldNames, table.combined.sparkType,
      table.opaqueValue, loUs, hiUs,
      new org.apache.spark.util.SerializableConfiguration(StoreFs.conf()))

  /** Distinct planned files (a file splits into several byte-range
    * partitions; stats must count it once). */
  private lazy val plannedFiles: Seq[(String, Long)] =
    partitions.map(p => (p.path, p.length)).groupBy(_._1)
      .map { case (path, chunks) => (path, chunks.map(_._2).sum) }.toSeq

  /** Exact row counts from parquet footers (r17 verdict item 5 — SQL
    * users get the row visibility wire STATS clients have). Footer reads
    * are driver-side O(planned files) on FIRST touch only: files are
    * immutable, so counts cache JVM-wide by (path, length); above
    * [[FossilScan.statsFooterCap]] files the scan skips numRows (keeps
    * sizeInBytes) rather than stall planning on a petabyte listing. */
  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): OptionalLong =
      OptionalLong.of(partitions.map(_.length).sum)
    override def numRows(): OptionalLong =
      if (plannedFiles.size > FossilScan.statsFooterCap) OptionalLong.empty()
      else OptionalLong.of(plannedFiles.map { case (p, l) =>
        FossilScan.footerRowCount(p, l)
      }.sum)
  }
}

private[connector] object FossilScan {

  /** One discovered data file: absolute path, final length (parquet files
    * are immutable once landed), owning topic (from the partition dir). */
  final case class DataFile(path: String, length: Long, topic: String)

  /** The scan's file discovery, shared by the batch listing and the
    * micro-batch offset log: only surviving topics' partition directories
    * are listed, through the Hadoop control plane. Deterministic order
    * (schema group, then sorted dir/file names). */
  def listDataFiles(table: FossilTable, wantedTopics: Seq[String]): Seq[DataFile] = {
    val out = Seq.newBuilder[DataFile]
    val wantedSet = wantedTopics.toSet
    val schemas = wantedTopics.flatMap(table.catalog.schemaOf).distinct
    schemas.foreach { s =>
      val gdir = s"${table.root}/data/sgroup=${ParquetStore.schemaKey(s)}"
      if (StoreFs.isDirectory(gdir)) {
        StoreFs.listStatus(gdir).filter(_.isDirectory).foreach { td =>
          val name = td.getPath.getName
          if (name.startsWith("topic=")) {
            val topic = FossilDataSource.unescapePathName(name.stripPrefix("topic="))
            if (wantedSet.contains(topic)) {
              StoreFs.listStatus(td.getPath.toString).filter { st =>
                val n = st.getPath.getName
                st.isFile && n.endsWith(".parquet") &&
                  !n.startsWith(".") && !n.startsWith("_")
              }.foreach { st =>
                out += DataFile(st.getPath.toString, st.getLen, topic)
              }
            }
          }
        }
      }
    }
    out.result()
  }

  /** Byte-range splitting, the same convention as the batch scan. */
  def split(files: Seq[DataFile], maxBytes: Long): Array[FossilInputPartition] = {
    val out = Array.newBuilder[FossilInputPartition]
    files.foreach { f =>
      var off = 0L
      while (off < f.length) {
        val chunk = math.min(maxBytes, f.length - off)
        out += FossilInputPartition(f.path, off, chunk, f.topic)
        off += chunk
      }
    }
    out.result()
  }

  /** Above this many planned files, [[FossilScan.estimateStatistics]]
    * skips exact numRows — footer reads are cheap and cached, but a
    * first-touch scan over millions of files must not stall planning. */
  val statsFooterCap: Int = 10000

  /** JVM-wide footer row-count cache keyed by (path, length) — parquet
    * files in the store are immutable (landed by rename), so a count
    * never goes stale; compaction REPLACES paths, which miss and re-read. */
  private val footerRows =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), java.lang.Long]

  def footerRowCount(path: String, length: Long): Long =
    footerRows.computeIfAbsent((path, length), { _ =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(path), StoreFs.conf())
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try java.lang.Long.valueOf(r.getRecordCount) finally r.close()
    }).longValue()

  /** Split size from the active session (planning runs on the driver);
    * falls back to Spark's 128 MB default ONLY when no session is active —
    * a malformed conf value must fail by name, not silently default. */
  def maxPartitionBytes(): Long = {
    val session =
      try Some(SparkSession.active)
      catch { case _: IllegalStateException => None } // no active session
    session.fold(128L * 1024 * 1024) { s =>
      val v = s.conf.get("spark.sql.files.maxPartitionBytes")
      org.apache.spark.network.util.JavaUtils.byteStringAsBytes(v)
    }
  }
}
