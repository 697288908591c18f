package graft.engine

import org.apache.spark.sql.types._

/** Fossil schema objects re-expressed as a Scala ADT with a mapping onto
  * Spark SQL types.
  *
  * Reference: `pkg/schema/objects.go:20-38` (Type/Array/Composite/Unknown/
  * Ambiguous), DDL grammar `docs/schema.md:89-103`, widening `Combine`
  * (`pkg/schema/objects.go:40-71`).
  *
  * Unsigned types map to the next wider signed Spark type — the reference
  * itself reads uint* into int64 at pipeline runtime
  * (`pkg/query/types/value.go:69-75`).
  */
object FossilSchema {

  sealed trait SType {
    /** DDL string, e.g. `float64`, `[4]int32`, `{"a": string}`. */
    def ddl: String
    def sparkType: DataType
  }

  // NOTE: wire widths live in ONE place — Codec.scalarWidth. A width field
  // here held the WIDENED Spark-side size for unsigned types and was never
  // read; it was removed rather than left looking like the wire width.
  sealed abstract class Scalar(val name: String, val spark: DataType)
      extends SType {
    def ddl: String = name
    def sparkType: DataType = spark
    def isNumeric: Boolean = this != SString && this != SBinary && this != SBool
    def isFloat: Boolean = this == SFloat32 || this == SFloat64
  }
  case object SString extends Scalar("string", StringType)
  case object SBinary extends Scalar("binary", BinaryType)
  case object SBool extends Scalar("boolean", BooleanType)
  case object SInt8 extends Scalar("int8", ByteType)
  case object SInt16 extends Scalar("int16", ShortType)
  case object SInt32 extends Scalar("int32", IntegerType)
  case object SInt64 extends Scalar("int64", LongType)
  case object SUInt8 extends Scalar("uint8", ShortType)
  case object SUInt16 extends Scalar("uint16", IntegerType)
  case object SUInt32 extends Scalar("uint32", LongType)
  case object SUInt64 extends Scalar("uint64", LongType)
  case object SFloat32 extends Scalar("float32", FloatType)
  case object SFloat64 extends Scalar("float64", DoubleType)

  /** `[N]T`, fixed length, element must be a fixed-width scalar
    * (`docs/schema.md:32-34`). */
  final case class SArray(length: Int, elem: Scalar) extends SType {
    def ddl: String = s"[$length]${elem.name}"
    def sparkType: DataType = ArrayType(elem.sparkType, containsNull = false)
  }

  /** `{"k": type, ...}`; values must not be composites. Keys kept sorted for
    * a canonical layout (the reference sorts keys when materializing,
    * `pkg/query/types/value.go:230-240`). */
  final case class SComposite(fields: List[(String, SType)]) extends SType {
    def ddl: String =
      fields.map { case (k, v) => s""""$k": ${v.ddl}""" }.mkString("{", ", ", "}")
    def sparkType: DataType =
      StructType(fields.sortBy(_._1).map { case (k, v) => StructField(k, v.sparkType) })
    def sorted: SComposite = SComposite(fields.sortBy(_._1))
  }

  case object SUnknown extends SType {
    def ddl = "unknown"; def sparkType: DataType = BinaryType
  }
  /** Result of combining incompatible schemas over a topic-prefix scan. */
  case object SAmbiguous extends SType {
    def ddl = "ambiguous"; def sparkType: DataType = BinaryType
  }

  val scalars: Map[String, Scalar] = List(
    SString, SBinary, SBool, SInt8, SInt16, SInt32, SInt64,
    SUInt8, SUInt16, SUInt32, SUInt64, SFloat32, SFloat64,
  ).map(s => s.name -> s).toMap ++ Map("float" -> SFloat64)

  /** Default per-topic schema is `string` (`docs/schema.md:37-39`). */
  val default: SType = SString

  // --- DDL parser --------------------------------------------------------

  /** Parse a fossil schema DDL string (grammar `docs/schema.md:89-103`).
    * Accepts trailing commas in composites like the reference
    * (`pkg/schema/encoding_test.go`). Errors throw [[SchemaParseException]]
    * (an `IllegalArgumentException`) whose message carries the
    * reference-style caret rendering over the offending DDL region. */
  def parse(ddl: String): SType = parseRegion(ddl, 0, ddl.length)

  /** Parse the [from0, to0) region of `ddl`, tracking absolute offsets so
    * errors can point a caret at the offending characters of the ORIGINAL
    * string (nested composite values recurse with their own region). */
  private def parseRegion(ddl: String, from0: Int, to0: Int): SType = {
    def err(msg: String, p: Int, e: Int): Nothing =
      throw new SchemaParseException(msg, p, math.max(e, p + 1), ddl)
    var from = from0
    var to = to0
    while (from < to && ddl.charAt(from).isWhitespace) from += 1
    while (to > from && ddl.charAt(to - 1).isWhitespace) to -= 1
    if (from >= to) err("empty schema", from0, to0)
    val s = ddl.substring(from, to)
    if (s.startsWith("[")) {
      val close = s.indexOf(']')
      if (close < 0) err(s"bad array schema '$s'", from, to)
      val lenStr = s.substring(1, close).trim
      val len = try lenStr.toInt catch {
        case _: NumberFormatException =>
          err(s"bad array length '$lenStr'", from + 1, from + close)
      }
      var ef = from + close + 1
      while (ef < to && ddl.charAt(ef).isWhitespace) ef += 1
      val elem = s.substring(close + 1).trim
      scalars.get(elem) match {
        case Some(sc) if sc != SString && sc != SBinary => SArray(len, sc)
        case Some(_) => err(
          s"array element must be fixed-width, got '$elem'", ef, ef + elem.length)
        case None => err(s"unknown type '$elem'", ef, ef + elem.length)
      }
    } else if (s.startsWith("{")) {
      if (!s.endsWith("}")) err(s"bad composite '$s'", to - 1, to)
      // split the body region on top-level commas (no nested composites
      // allowed, so every comma inside the braces is a field separator)
      val bodyFrom = from + 1
      val bodyTo = to - 1
      val segments = {
        val cuts = (bodyFrom until bodyTo).filter(ddl.charAt(_) == ',')
        val bounds = (bodyFrom +: cuts.map(_ + 1)) :+ (bodyTo + 1)
        bounds.sliding(2).map { case Seq(a, b) => (a, math.min(b - 1, bodyTo)) }.toList
      }
      val fields = segments.flatMap { case (pf0, pt0) =>
        var pf = pf0
        var pt = pt0
        while (pf < pt && ddl.charAt(pf).isWhitespace) pf += 1
        while (pt > pf && ddl.charAt(pt - 1).isWhitespace) pt -= 1
        if (pf >= pt) None // trailing comma / empty segment
        else {
          val p = ddl.substring(pf, pt)
          val colon = p.indexOf(':')
          if (colon < 0) err(s"bad composite entry '$p'", pf, pt)
          val rawKey = p.substring(0, colon).trim
          val key =
            if (rawKey.length >= 2 && rawKey.startsWith("\"") && rawKey.endsWith("\""))
              rawKey.substring(1, rawKey.length - 1)
            else rawKey
          val v = parseRegion(ddl, pf + colon + 1, pt)
          v match {
            case _: SComposite =>
              err("composite values may not be composites", pf + colon + 1, pt)
            case _ => Some((key, v))
          }
        }
      }
      SComposite(fields).sorted
    } else scalars.getOrElse(s, err(s"unknown type '$s'", from, to))
  }

  /** Inverse of [[SType.sparkType]]: the fossil schema a Spark value type
    * maps back to. Spark carries no fixed array length, so arrays come
    * back as `SArray(0, elem)` — a placeholder consumers must resolve
    * against an actual value (the wire writer does this per row).
    * Unsigned fossil types are unrecoverable (they widen into signed
    * Spark types by design), so the signed reading is returned. */
  def fromSpark(dt: DataType): SType = dt match {
    case StringType => SString
    case BinaryType => SBinary
    case BooleanType => SBool
    case ByteType => SInt8
    case ShortType => SInt16
    case IntegerType => SInt32
    case LongType => SInt64
    case FloatType => SFloat32
    case DoubleType => SFloat64
    case ArrayType(e, _) => fromSpark(e) match {
      case sc: Scalar if sc != SString && sc != SBinary => SArray(0, sc)
      case other => throw new IllegalArgumentException(
        s"array element ${other.ddl} has no fossil array form")
    }
    case StructType(fs) =>
      SComposite(fs.toList.map(f => f.name -> fromSpark(f.dataType))).sorted
    case other => throw new IllegalArgumentException(s"unsupported value type $other")
  }

  // --- Combine (prefix-scan schema merging) ------------------------------

  private def numericRank(s: Scalar): Int = s match {
    case SBool => 0
    case SInt8 | SUInt8 => 1
    case SInt16 | SUInt16 => 2
    case SInt32 | SUInt32 => 3
    case SInt64 | SUInt64 => 4
    case SFloat32 => 5
    case SFloat64 => 6
    case _ => -1
  }

  /** Widest-numeric merge of two schemas; incompatible → [[SAmbiguous]]
    * (mirrors `pkg/schema/objects.go:40-71`: numerics widen by size,
    * same-kind scalars keep, arrays must match elem-compat + length,
    * composites are always ambiguous). */
  def combine(a: SType, b: SType): SType = (a, b) match {
    case (SAmbiguous, _) | (_, SAmbiguous) => SAmbiguous
    case (SUnknown, _) | (_, SUnknown) => SUnknown
    case (x: Scalar, y: Scalar) =>
      if (x == y) x
      else if (x.isNumeric && y.isNumeric)
        if (numericRank(x) >= numericRank(y)) x else y
      else if ((x == SString && y == SBinary) || (x == SBinary && y == SString)) SBinary
      else SAmbiguous
    case (SArray(l1, e1), SArray(l2, e2)) if l1 == l2 =>
      combine(e1, e2) match {
        case s: Scalar => SArray(l1, s)
        case _ => SAmbiguous
      }
    case _ => SAmbiguous
  }

  def combineAll(ss: Seq[SType]): SType =
    if (ss.isEmpty) SUnknown else ss.reduce(combine)

  /** Lossless append-fit: every value of `from` is representable in `to`
    * without changing value or sign. [[combine]] is the wrong relation for
    * the append gate — it ranks same-width signed/unsigned pairs equal, so
    * uint8→int8 would pass and then throw (ANSI) or wrap (non-ANSI) on the
    * cast, and it would admit int64→float64, which is lossy above 2^53.
    *
    * Rules: exact match always fits; signed ints widen within the signed
    * chain; unsigned within the unsigned chain; uintN fits any STRICTLY
    * wider signed int; float32 ⊂ float64; ints fit a float only when the
    * mantissa holds every value (≤16-bit ints in float32, ≤32-bit in
    * float64). Arrays fit element-wise at equal length; composites and
    * string/binary/boolean only fit themselves. */
  def fits(from: SType, to: SType): Boolean = (from, to) match {
    case (a, b) if a == b => true
    case (a: Scalar, b: Scalar) => scalarFits(a, b)
    case (SArray(n1, e1), SArray(n2, e2)) => n1 == n2 && scalarFits(e1, e2)
    case _ => false
  }

  private def intBytes(s: Scalar): Option[(Int, Boolean)] = s match { // (bytes, signed)
    case SInt8 => Some((1, true)); case SInt16 => Some((2, true))
    case SInt32 => Some((4, true)); case SInt64 => Some((8, true))
    case SUInt8 => Some((1, false)); case SUInt16 => Some((2, false))
    case SUInt32 => Some((4, false)); case SUInt64 => Some((8, false))
    case _ => None
  }

  private def scalarFits(a: Scalar, b: Scalar): Boolean =
    a == b || ((intBytes(a), intBytes(b)) match {
      case (Some((wa, sa)), Some((wb, sb))) =>
        if (sa == sb) wa <= wb           // same-sign widening
        else if (!sa && sb) wa < wb      // unsigned into STRICTLY wider signed
        else false                       // signed never fits unsigned
      case (Some((wa, _)), None) if b == SFloat32 => wa <= 2 // 24-bit mantissa
      case (Some((wa, _)), None) if b == SFloat64 => wa <= 4 // 53-bit mantissa
      case (None, None) => a == SFloat32 && b == SFloat64
      case _ => false
    })
}

/** Schema-DDL parse failure with a reference-style caret rendering over
  * the offending region of the DDL string (the schema-surface twin of
  * [[graft.fql.FqlException]] — `pkg/common/parse/error.go:24-40` format,
  * applied to the CREATE/schema path). Extends IllegalArgumentException so
  * every existing caller and test that treats a bad DDL as an illegal
  * argument keeps working. */
final class SchemaParseException(
    val rawMessage: String, val pos: Int, val endPos: Int, val input: String)
    extends IllegalArgumentException(
      graft.fql.FqlException.caret(rawMessage, pos, endPos, input,
        "Syntax error found in schema:"))
