package graft.connector

import java.nio.ByteOrder

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.HadoopReadOptions
import org.apache.parquet.example.data.Group
import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.filter2.predicate.{FilterApi, FilterPredicate}
import org.apache.parquet.hadoop.api.ReadSupport
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetReader}
import org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.parquet.schema.{GroupType, LogicalTypeAnnotation, MessageType, PrimitiveType, Type}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One split of one data file of a [[FossilDataSource]] scan: a byte range
  * of a Parquet file under `root/data/sgroup=…/topic=…/`. Row groups whose
  * midpoint falls inside [start, start+length) belong to this split — the
  * same range convention Spark's own file splits use, so a store file
  * bigger than `spark.sql.files.maxPartitionBytes` parallelizes across
  * executors without the planner reading any footer. The topic is the
  * PARTITION DIRECTORY's value (not stored in the file), carried here and
  * emitted as a constant column. */
final case class FossilInputPartition(
    path: String, start: Long, length: Long, topic: String)
  extends InputPartition

/** Executor-side reader for [[FossilInputPartition]]s.
  *
  * Deliberately built on parquet-hadoop's PUBLIC reader stack
  * (ParquetReader + GroupReadSupport) rather than Spark's internal
  * vectorized parquet classes: the connector stays on supported API, and
  * the scan still gets the three pruning levers that matter at 100 TB —
  * file pruning by topic (driver, partition dirs), row-group pruning by
  * time (the pushed bounds become a parquet FilterPredicate evaluated
  * against row-group min/max stats — the store writes time-sorted files
  * precisely so these stats partition the time axis), and column
  * projection (the requested-schema subset; a `select(value)` never
  * decodes the time pages). Exactness never depends on any of it: every
  * pushed filter is also returned as a residual, so Spark re-evaluates
  * the exact predicate above the scan (pruning here is allowed to be
  * conservative, never wrong).
  *
  * @param prunedFields output columns in order (subset of time/topic/value)
  * @param valueTarget  the store's COMBINED value type — file values are
  *                     coerced to it, mirroring `ParquetStore.entries`'s
  *                     cast (a store can hold one topic at int32 and a
  *                     sibling at int64; both read back as the combined
  *                     int64)
  * @param opaqueValue  combined schema was Ambiguous — value reads as
  *                     null binary, exactly like the library path
  * @param timeLoUs     pushed lower time bound (µs, inclusive)
  * @param timeHiUs     pushed upper time bound (µs, inclusive)
  */
final class FossilReaderFactory(
    prunedFields: Array[String],
    valueTarget: DataType,
    opaqueValue: Boolean,
    timeLoUs: Option[Long],
    timeHiUs: Option[Long],
    // driver's Hadoop conf, shipped to executors so spark.hadoop.* settings
    // (object-store credentials, endpoints) reach the file opens — a bare
    // executor-side `new Configuration()` would read file:///HDFS fine but
    // silently drop s3a/gs/abfs auth
    hadoopConf: org.apache.spark.util.SerializableConfiguration)
  extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new FossilPartitionReader(p.asInstanceOf[FossilInputPartition],
      prunedFields, valueTarget, opaqueValue, timeLoUs, timeHiUs,
      hadoopConf.value)
}

final class FossilPartitionReader(
    part: FossilInputPartition,
    prunedFields: Array[String],
    valueTarget: DataType,
    opaqueValue: Boolean,
    timeLoUs: Option[Long],
    timeHiUs: Option[Long],
    conf: Configuration)
  extends PartitionReader[InternalRow] {
  private val hPath = new Path(part.path)
  private val topicU = UTF8String.fromString(part.topic)

  // columns that must come from the FILE (topic is dir-derived; an opaque
  // value is constant null). If a time bound was pushed, time must be read
  // for the row-group filter to bind — the planner only pushes time bounds
  // when Spark also needs the column (residual re-evaluation), so this is
  // belt-and-braces, not a widening in practice.
  private val fileFields: Array[String] = {
    val base = prunedFields.filter(f =>
      f == "time" || (f == "value" && !opaqueValue))
    if ((timeLoUs.nonEmpty || timeHiUs.nonEmpty) && !base.contains("time"))
      base :+ "time"
    else base
  }

  // ---- open: footer peek, then either row reader or count-only ----------

  private var rowReader: ParquetReader[Group] = null
  private var countOnlyRemaining: Long = -1L
  private var fieldConverters: Array[Group => Any] = null
  private var current: Group = null

  locally {
    if (fileFields.isEmpty) {
      // count-only scan (e.g. SELECT topic / COUNT(*)): row counts come
      // from the footer's block metadata — zero data pages read
      val opts = HadoopReadOptions.builder(conf, hPath)
        .withRange(part.start, part.start + part.length).build()
      val r = new ParquetFileReader(HadoopInputFile.fromPath(hPath, conf), opts)
      try {
        var n = 0L
        val it = r.getRowGroups.iterator()
        while (it.hasNext) n += it.next().getRowCount
        countOnlyRemaining = n
      } finally r.close()
    } else {
      // footer peek: the projection and the time filter both need the
      // file schema (a filter bound against an INT96 time column would
      // fail parquet's schema validation, so it is built type-aware)
      val fileSchema: MessageType = {
        val fr = ParquetFileReader.open(HadoopInputFile.fromPath(hPath, conf))
        try fr.getFooter.getFileMetaData.getSchema finally fr.close()
      }
      val requested = new MessageType(fileSchema.getName,
        fileFields.map(f =>
          fileSchema.getType(fileSchema.getFieldIndex(f)): Type): _*)
      conf.set(ReadSupport.PARQUET_READ_SCHEMA, requested.toString)
      var b = ParquetReader.builder(new GroupReadSupport(), hPath)
        .withConf(conf)
        .withFileRange(part.start, part.start + part.length)
      timeFilter(fileSchema).foreach(f => b = b.withFilter(FilterCompat.get(f)))
      rowReader = b.build()
      fieldConverters = prunedFields.map {
        case "topic" => (_: Group) => topicU
        case "value" if opaqueValue => (_: Group) => null
        case name =>
          val idx = requested.getFieldIndex(name)
          val ext = if (name == "time")
            timeExtractor(requested.getType(idx).asPrimitiveType())
          else anyExtractor(requested.getType(idx), valueTarget)
          (g: Group) =>
            if (g.getFieldRepetitionCount(idx) == 0) null else ext(g, idx)
      }
    }
  }

  override def next(): Boolean = {
    if (countOnlyRemaining >= 0L) {
      if (countOnlyRemaining == 0L) false
      else { countOnlyRemaining -= 1L; true }
    } else {
      current = rowReader.read()
      current != null
    }
  }

  override def get(): InternalRow = {
    if (countOnlyRemaining >= 0L) {
      val out = new Array[Any](prunedFields.length)
      var i = 0
      while (i < prunedFields.length) {
        out(i) = prunedFields(i) match {
          case "topic" => topicU
          case _ => null // opaque value is the only other count-free field
        }
        i += 1
      }
      new GenericInternalRow(out)
    } else {
      val out = new Array[Any](fieldConverters.length)
      var i = 0
      while (i < fieldConverters.length) {
        out(i) = fieldConverters(i)(current)
        i += 1
      }
      new GenericInternalRow(out)
    }
  }

  override def close(): Unit = if (rowReader != null) rowReader.close()

  // ---- row-group / record filter ----------------------------------------

  /** Pushed time bounds as a parquet FilterPredicate in the FILE's time
    * unit — only for INT64 timestamp columns (INT96 carries no usable
    * stats ordering; skipping the filter there prunes nothing and stays
    * correct). Bounds are converted exactly for MILLIS (integer floor
    * division is exact for ≤/≥ over whole units) and widened-safe for
    * NANOS. See [[FossilTimeBounds]] for the unit math, which is also
    * spec-tested directly. */
  private def timeFilter(fileSchema: MessageType): Option[FilterPredicate] = {
    if (timeLoUs.isEmpty && timeHiUs.isEmpty) return None
    if (!fileSchema.containsField("time")) return None
    val t = fileSchema.getType(fileSchema.getFieldIndex("time"))
    if (!t.isPrimitive) return None
    val pt = t.asPrimitiveType()
    if (pt.getPrimitiveTypeName != PrimitiveTypeName.INT64) return None
    pt.getLogicalTypeAnnotation match {
      case ts: TimestampLogicalTypeAnnotation =>
        val c = FilterApi.longColumn("time")
        val preds =
          timeLoUs.map(lo => FilterApi.gtEq(c,
            java.lang.Long.valueOf(FossilTimeBounds.loInUnit(lo, ts.getUnit)))) ++
          timeHiUs.map(hi => FilterApi.ltEq(c,
            java.lang.Long.valueOf(FossilTimeBounds.hiInUnit(hi, ts.getUnit))))
        preds.reduceOption(FilterApi.and)
      case _ => None
    }
  }

  // ---- converters ---------------------------------------------------------

  /** time → µs Long, from any physical form Spark (or another writer) may
    * have used: INT64 TIMESTAMP(MICROS|MILLIS) and INT96. */
  private def timeExtractor(pt: PrimitiveType): (Group, Int) => Any =
    pt.getPrimitiveTypeName match {
      case PrimitiveTypeName.INT96 =>
        (g, f) => FossilTimeBounds.int96ToMicros(g.getInt96(f, 0).getBytes)
      case PrimitiveTypeName.INT64 => pt.getLogicalTypeAnnotation match {
        case ts: TimestampLogicalTypeAnnotation =>
          ts.getUnit match {
            case LogicalTypeAnnotation.TimeUnit.MICROS => (g, f) => g.getLong(f, 0)
            case LogicalTypeAnnotation.TimeUnit.MILLIS =>
              (g, f) => Math.multiplyExact(g.getLong(f, 0), 1000L)
            case other => throw new IllegalStateException(
              s"${part.path}: unsupported time unit $other (store files are " +
                "written at micro- or millisecond precision)")
          }
        case other => throw new IllegalStateException(
          s"${part.path}: time column is INT64 but not a timestamp ($other)")
      }
      case other => throw new IllegalStateException(
        s"${part.path}: unsupported time physical type $other")
    }

  /** Generic file-type → target-Spark-type extractor for the value column
    * (scalars, LIST arrays — 3-level standard and 2-level legacy — and
    * one-level composite structs, matching the fossil schema ADT). */
  private def anyExtractor(t: Type, target: DataType): (Group, Int) => Any =
    if (t.isPrimitive) {
      val pv = primValue(t.asPrimitiveType(), target)
      (g, f) => pv(g, f, 0)
    } else {
      val gt = t.asGroupType()
      target match {
        case at: ArrayType =>
          val le = listExtractor(gt, at)
          (g, f) => le(g.getGroup(f, 0))
        case st: StructType =>
          val se = structExtractor(gt, st)
          (g, f) => se(g.getGroup(f, 0))
        case other => throw new IllegalStateException(
          s"${part.path}: file has nested value but target type is $other")
      }
    }

  private def listExtractor(listType: GroupType, target: ArrayType): Group => AnyRef = {
    val repeated = listType.getType(0)
    if (repeated.isPrimitive) {
      // legacy 2-level list: repeated primitive directly under the group
      val pv = primValue(repeated.asPrimitiveType(), target.elementType)
      lg => {
        val n = lg.getFieldRepetitionCount(0)
        val arr = new Array[Any](n)
        var i = 0
        while (i < n) { arr(i) = pv(lg, 0, i); i += 1 }
        new GenericArrayData(arr)
      }
    } else {
      // standard 3-level: repeated group { optional/required element }
      val elemType = repeated.asGroupType().getType(0)
      if (!elemType.isPrimitive) throw new IllegalStateException(
        s"${part.path}: nested-array values are outside the fossil schema ADT")
      val pv = primValue(elemType.asPrimitiveType(), target.elementType)
      lg => {
        val n = lg.getFieldRepetitionCount(0)
        val arr = new Array[Any](n)
        var i = 0
        while (i < n) {
          val eg = lg.getGroup(0, i)
          arr(i) = if (eg.getFieldRepetitionCount(0) == 0) null else pv(eg, 0, 0)
          i += 1
        }
        new GenericArrayData(arr)
      }
    }
  }

  private def structExtractor(gt: GroupType, target: StructType): Group => InternalRow = {
    val fieldExs: Array[(Int, Group => Any)] = target.fields.map { sf =>
      val idx = gt.getFieldIndex(sf.name)
      val ex = anyExtractor(gt.getType(idx), sf.dataType)
      (idx, (g: Group) =>
        if (g.getFieldRepetitionCount(idx) == 0) null else ex(g, idx))
    }
    g => {
      val out = new Array[Any](fieldExs.length)
      var i = 0
      while (i < fieldExs.length) { out(i) = fieldExs(i)._2(g); i += 1 }
      new GenericInternalRow(out)
    }
  }

  /** Scalar cell → target Spark value, widening numerics to the combined
    * type exactly like `ParquetStore.entries`'s cast (int widths up-rank,
    * int→double, float→double, string↔binary to binary). Narrowing can't
    * occur by construction — the combined type is the max rank. */
  private def primValue(pt: PrimitiveType, target: DataType): (Group, Int, Int) => Any = {
    def unsupported(): Nothing = throw new IllegalStateException(
      s"${part.path}: cannot read ${pt.getPrimitiveTypeName} as $target")
    pt.getPrimitiveTypeName match {
      case PrimitiveTypeName.BOOLEAN => target match {
        case BooleanType => (g, f, i) => g.getBoolean(f, i)
        case _ => unsupported()
      }
      case PrimitiveTypeName.INT32 =>
        val coerce = coerceLong(target).getOrElse(unsupported())
        (g, f, i) => coerce(g.getInteger(f, i).toLong)
      case PrimitiveTypeName.INT64 =>
        val coerce = coerceLong(target).getOrElse(unsupported())
        (g, f, i) => coerce(g.getLong(f, i))
      case PrimitiveTypeName.FLOAT => target match {
        case FloatType => (g, f, i) => g.getFloat(f, i)
        case DoubleType => (g, f, i) => g.getFloat(f, i).toDouble
        case _ => unsupported()
      }
      case PrimitiveTypeName.DOUBLE => target match {
        case DoubleType => (g, f, i) => g.getDouble(f, i)
        case _ => unsupported()
      }
      case PrimitiveTypeName.BINARY => target match {
        case StringType => (g, f, i) =>
          UTF8String.fromBytes(g.getBinary(f, i).getBytes)
        case BinaryType => (g, f, i) => g.getBinary(f, i).getBytes
        case _ => unsupported()
      }
      case _ => unsupported()
    }
  }

  private def coerceLong(target: DataType): Option[Long => Any] = target match {
    case LongType => Some(v => v)
    case IntegerType => Some(v => v.toInt)
    case ShortType => Some(v => v.toShort)
    case ByteType => Some(v => v.toByte)
    case DoubleType => Some(v => v.toDouble)
    case FloatType => Some(v => v.toFloat)
    case _ => None
  }
}

/** Time-unit math shared by the reader and its spec: pushed µs bounds →
  * the file column's unit, conservative-or-exact in the pruning direction
  * (a converted bound may only KEEP extra rows, never drop one the exact
  * predicate keeps — Spark re-evaluates the exact filter above the scan). */
private[connector] object FossilTimeBounds {

  /** Inclusive µs lower bound → file unit. MILLIS: `ms·1000 ≥ lo ⟺
    * ms ≥ ceil(lo/1000)` — exact for integer ms. NANOS: widened 1µs-safe. */
  def loInUnit(loUs: Long, unit: LogicalTypeAnnotation.TimeUnit): Long = unit match {
    case LogicalTypeAnnotation.TimeUnit.MICROS => loUs
    case LogicalTypeAnnotation.TimeUnit.MILLIS => -Math.floorDiv(-loUs, 1000L)
    case LogicalTypeAnnotation.TimeUnit.NANOS =>
      if (loUs <= Long.MinValue / 1000L) Long.MinValue else loUs * 1000L
  }

  /** Inclusive µs upper bound → file unit. MILLIS: `ms·1000 ≤ hi ⟺
    * ms ≤ floor(hi/1000)` — exact. NANOS: +999 ns widening keeps every
    * nanosecond that truncates into `hi`. */
  def hiInUnit(hiUs: Long, unit: LogicalTypeAnnotation.TimeUnit): Long = unit match {
    case LogicalTypeAnnotation.TimeUnit.MICROS => hiUs
    case LogicalTypeAnnotation.TimeUnit.MILLIS => Math.floorDiv(hiUs, 1000L)
    case LogicalTypeAnnotation.TimeUnit.NANOS =>
      if (hiUs >= (Long.MaxValue - 999L) / 1000L) Long.MaxValue
      else hiUs * 1000L + 999L
  }

  /** INT96 (12 bytes LE: nanos-of-day int64, julian day int32) → µs. */
  def int96ToMicros(bytes: Array[Byte]): Long = {
    val buf = java.nio.ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val nanosOfDay = buf.getLong
    val julianDay = buf.getInt
    (julianDay - 2440588).toLong * 86400000000L + nanosOfDay / 1000L
  }
}
