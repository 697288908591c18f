package graft.sources

import scala.collection.mutable

/** Minimal reader/writer for Go's `encoding/gob` wire format, covering the
  * subset the fossil on-disk layout uses: struct / slice / fixed array /
  * byte-slice / string / signed int / GobEncoder types (`time.Time`).
  *
  * The format is implemented from Go's PUBLIC specification
  * (`encoding/gob/doc.go`): varint-style unsigned ints (< 128 inline, else
  * a negated byte-count prefix + big-endian bytes), complement-shifted
  * signed ints, byte-reversed float64 bits, length-delimited messages,
  * negated type ids for definitions, delta-encoded struct fields with
  * zero-value omission, and a zero "delta" prefix for non-struct top-level
  * values. `GobSpec` pins the worked `Point{22, 33}` example from that
  * documentation byte-for-byte in both directions.
  *
  * Fossil uses gob for segment files and WAL records
  * (`pkg/database/db.go:186-192`, `pkg/database/log.go:49-97`); the v1
  * format gob-encodes the whole database struct
  * (`pkg/database/migration.go:57-72`).
  *
  * Values decode to: Long (int/uint), Boolean, Double (float),
  * [[Gob.GobComplex]] (complex), Array[Byte] (bytes and GobEncoder
  * payloads), String, Vector[Any] (slice/array), Map[String, Any] (struct).
  * Interface values (builtin id 8) are a documented hard boundary: they
  * fail by name rather than decode (no Go-produced fixture exists to pin
  * a decoder against, and fossil's on-disk structs never use them).
  */
object Gob {

  // ---------------------------------------------------------------- wire ids
  val IdBool = 1L
  val IdInt = 2L
  val IdUint = 3L
  val IdFloat = 4L
  val IdBytes = 5L
  val IdString = 6L
  val IdComplex = 7L
  val IdInterface = 8L
  val FirstUserId = 65L

  /** A transmitted type definition (the `wireType` union, one arm set). */
  sealed trait Wire { def name: String }
  final case class WStruct(name: String, fields: Vector[(String, Long)]) extends Wire
  final case class WSlice(name: String, elem: Long) extends Wire
  final case class WArray(name: String, elem: Long, len: Int) extends Wire
  final case class WMap(name: String, key: Long, elem: Long) extends Wire
  /** GobEncoder / BinaryMarshaler / TextMarshaler — opaque byte payload. */
  final case class WOpaque(name: String) extends Wire

  final class GobException(msg: String) extends RuntimeException(msg)

  /** A decoded gob complex value (builtin id 7): the wire format is the
    * real part then the imaginary part, each in the standard byte-reversed
    * float64 encoding (Go `encoding/gob/encode.go`, `encComplex128`). A
    * distinct type, not a 2-vector — a decoder must not confuse it with a
    * float slice. Fossil's on-disk structs never use complex; supported
    * for gob completeness. */
  final case class GobComplex(re: Double, im: Double)

  // =================================================================== reader

  /** Cursor over one gob STREAM (a fresh encoder's output: type defs are
    * scoped to the stream — fossil writes one stream per segment file and
    * one per WAL line). */
  final class Reader(bytes: Array[Byte]) {
    private var pos = 0
    private val types = mutable.Map.empty[Long, Wire]

    private def fail(msg: String): Nothing =
      throw new GobException(s"$msg at byte $pos/${bytes.length}")

    private def u8(): Int = {
      if (pos >= bytes.length) fail("unexpected EOF")
      val b = bytes(pos) & 0xff; pos += 1; b
    }

    def readUint(): Long = {
      val b = u8()
      if (b < 128) b.toLong
      else {
        val n = 256 - b
        if (n < 1 || n > 8) fail(s"bad uint byte-count $n")
        var v = 0L
        var i = 0
        while (i < n) { v = (v << 8) | u8(); i += 1 }
        v
      }
    }

    def readInt(): Long = {
      val u = readUint()
      if ((u & 1) == 0) u >>> 1 else ~(u >>> 1)
    }

    def readFloat(): Double = {
      val u = readUint()
      java.lang.Double.longBitsToDouble(java.lang.Long.reverseBytes(u))
    }

    def readByteArray(): Array[Byte] = {
      val n = readUint()
      if (n < 0 || n > (bytes.length - pos)) fail(s"bad byte length $n")
      val out = java.util.Arrays.copyOfRange(bytes, pos, pos + n.toInt)
      pos += n.toInt
      out
    }

    def readString(): String =
      new String(readByteArray(), java.nio.charset.StandardCharsets.UTF_8)

    private def atEnd: Boolean = pos >= bytes.length

    /** Decode the next top-level VALUE (absorbing any type-definition
      * messages that precede it). None at clean end of stream. */
    def next(): Option[Any] = {
      while (!atEnd) {
        val msgLen = readUint()
        val msgEnd = pos + msgLen.toInt
        if (msgLen <= 0 || msgEnd > bytes.length) fail(s"bad message length $msgLen")
        val typeId = readInt()
        if (typeId < 0) {
          // type definition: body is a wireType value
          types(-typeId) = readWireType()
          if (pos != msgEnd) fail("trailing bytes in type definition")
        } else {
          val v = types.get(typeId) match {
            case Some(_: WStruct) => readValue(typeId)
            case _ =>
              // non-struct top-level values carry an unused zero delta
              val delta = readUint()
              if (delta != 0) fail(s"expected singleton delta 0, got $delta")
              readValue(typeId)
          }
          if (pos != msgEnd) fail("trailing bytes in value message")
          return Some(v)
        }
      }
      None
    }

    /** All remaining top-level values. */
    def all(): Vector[Any] = {
      val out = Vector.newBuilder[Any]
      var v = next()
      while (v.isDefined) { out += v.get; v = next() }
      out.result()
    }

    private def readValue(typeId: Long): Any = typeId match {
      case IdBool => readUint() != 0
      case IdInt => readInt()
      case IdUint => readUint()
      case IdFloat => readFloat()
      case IdBytes => readByteArray()
      case IdString => readString()
      case IdComplex => GobComplex(readFloat(), readFloat())
      // interface values carry a registered type NAME plus a nested
      // type-def/value sequence (doc.go "Interface types are not checked
      // for compatibility" section) — a format arm with no Go-produced
      // fixture available to pin it against, and one fossil's on-disk
      // structs never use. A named hard boundary (see README, Importing
      // from fossil) beats an unverifiable decoder.
      case IdInterface => fail(s"unsupported builtin type $typeId (interface " +
        "values are a documented gob boundary — see README)")
      case _ => types.get(typeId) match {
        case Some(w: WStruct) => readStruct(w)
        case Some(w: WSlice) =>
          val n = readUint()
          Vector.fill(n.toInt)(readValue(w.elem))
        case Some(w: WArray) =>
          val n = readUint()
          if (n != w.len) fail(s"array length $n != declared ${w.len}")
          Vector.fill(w.len)(readValue(w.elem))
        case Some(_: WOpaque) => readByteArray()
        case Some(w: WMap) =>
          val n = readUint()
          (0 until n.toInt).map(_ => readValue(w.key) -> readValue(w.elem)).toMap
        case None => fail(s"value of undefined type $typeId")
      }
    }

    private def readStruct(w: WStruct): Map[String, Any] = {
      val out = Map.newBuilder[String, Any]
      var field = -1L
      var delta = readUint()
      while (delta != 0) {
        field += delta
        if (field < 0 || field >= w.fields.length)
          fail(s"field $field out of range for struct ${w.name}")
        val (fname, ftype) = w.fields(field.toInt)
        out += fname -> readValue(ftype)
        delta = readUint()
      }
      out.result()
    }

    /** The `wireType` union: a struct whose field index selects the arm.
      * Field order per Go's type.go: ArrayT, SliceT, StructT, MapT,
      * GobEncoderT, BinaryMarshalerT, TextMarshalerT. */
    private def readWireType(): Wire = {
      var arm: Wire = null
      var field = -1L
      var delta = readUint()
      while (delta != 0) {
        field += delta
        // arrayType {CommonType, Elem, Len}; sliceType {CommonType, Elem};
        // mapType {CommonType, Key, Elem}; gobEncoderType {CommonType} —
        // readMeta returns (name, field-index -> int value)
        arm = field match {
          case 0 => val (n, m) = readMeta(); WArray(n, m(1L), m(2L).toInt)
          case 1 => val (n, m) = readMeta(); WSlice(n, m(1L))
          case 2 => readStructType()
          case 3 => val (n, m) = readMeta(); WMap(n, m(1L), m(2L))
          case 4 | 5 | 6 => val (n, _) = readMeta(); WOpaque(n)
          case other => fail(s"unknown wireType arm $other")
        }
        delta = readUint()
      }
      if (arm == null) fail("empty wireType")
      arm
    }

    /** Reads a meta-struct of shape {CommonType{Name, Id}, <int fields>…}:
      * field 0 is the embedded CommonType; every later field is a signed
      * int returned positionally. Covers arrayType / sliceType / mapType /
      * gobEncoderType. */
    private def readMeta(): (String, Map[Long, Long]) = {
      var name = ""
      val ints = Map.newBuilder[Long, Long]
      var field = -1L
      var delta = readUint()
      while (delta != 0) {
        field += delta
        if (field == 0) {
          // embedded CommonType {Name string, Id typeId}
          var f2 = -1L
          var d2 = readUint()
          while (d2 != 0) {
            f2 += d2
            if (f2 == 0) name = readString()
            else if (f2 == 1) readInt() // Id — informational
            else fail("bad CommonType field")
            d2 = readUint()
          }
        } else ints += field -> readInt()
        delta = readUint()
      }
      (name, ints.result().withDefault(f => fail(s"missing meta field $f")))
    }

    private def readStructType(): WStruct = {
      var name = ""
      val fields = Vector.newBuilder[(String, Long)]
      var field = -1L
      var delta = readUint()
      while (delta != 0) {
        field += delta
        if (field == 0) {
          var f2 = -1L
          var d2 = readUint()
          while (d2 != 0) {
            f2 += d2
            if (f2 == 0) name = readString()
            else if (f2 == 1) readInt() // Id — informational
            else fail("bad CommonType field")
            d2 = readUint()
          }
        } else if (field == 1) {
          // Field []fieldType; fieldType {Name string, Id typeId}
          val n = readUint()
          var i = 0
          while (i < n) {
            var fname = ""
            var fid = 0L
            var f2 = -1L
            var d2 = readUint()
            while (d2 != 0) {
              f2 += d2
              if (f2 == 0) fname = readString()
              else if (f2 == 1) fid = readInt()
              else fail("bad fieldType field")
              d2 = readUint()
            }
            fields += fname -> fid
            i += 1
          }
        } else fail(s"unknown structType field $field")
        delta = readUint()
      }
      WStruct(name, fields.result())
    }
  }

  // =================================================================== writer

  /** Emits one gob stream (fresh type-id space, like a fresh
    * `gob.NewEncoder`). Type definitions must be registered before the
    * values that use them; ids are assigned sequentially from 65 in
    * registration order (matching Go's depth-first, field-order walk). */
  final class Writer {
    private val out = new java.io.ByteArrayOutputStream()
    private val defined = mutable.Map.empty[String, Long] // structural key -> id
    private val structReg = mutable.Map.empty[Long, Vector[(String, Long)]]
    private val arrayReg = mutable.Map.empty[Long, (Long, Int)]
    private val sliceReg = mutable.Map.empty[Long, Long]
    private val opaqueReg = mutable.Set.empty[Long]
    private var nextId = FirstUserId

    def bytes: Array[Byte] = out.toByteArray

    // ---- primitive encoders into a scratch buffer
    private def putUint(b: java.io.ByteArrayOutputStream, v: Long): Unit = {
      if (v >= 0 && v < 128) b.write(v.toInt)
      else {
        var n = 8
        while (n > 1 && (v >>> ((n - 1) * 8)) == 0) n -= 1
        b.write(256 - n)
        var i = n - 1
        while (i >= 0) { b.write(((v >>> (i * 8)) & 0xff).toInt); i -= 1 }
      }
    }
    private def putInt(b: java.io.ByteArrayOutputStream, v: Long): Unit =
      putUint(b, if (v >= 0) v << 1 else ~(v << 1) | 1)
    private def putBytes(b: java.io.ByteArrayOutputStream, v: Array[Byte]): Unit = {
      putUint(b, v.length.toLong); b.write(v, 0, v.length)
    }
    private def putString(b: java.io.ByteArrayOutputStream, v: String): Unit =
      putBytes(b, v.getBytes(java.nio.charset.StandardCharsets.UTF_8))

    private def message(body: Array[Byte]): Unit = {
      val head = new java.io.ByteArrayOutputStream()
      putUint(head, body.length.toLong)
      out.write(head.toByteArray, 0, head.size())
      out.write(body, 0, body.length)
    }

    /** Register + emit a struct type definition.
      * @param fields (name, typeId) — use ids from prior define* calls or
      *               the builtin constants. */
    def defineStruct(name: String, fields: Seq[(String, Long)]): Long = {
      val id = define(s"struct:$name:${fields.mkString(",")}") { (b, id) =>
        putUint(b, 3) // wireType field 2: StructT
        putCommon(b, name, id)
        putUint(b, 1) // structType field 1: Field
        putUint(b, fields.length.toLong)
        fields.foreach { case (fname, fid) =>
          putUint(b, 1); putString(b, fname) // fieldType.Name
          putUint(b, 1); putInt(b, fid)      // fieldType.Id
          putUint(b, 0)
        }
        putUint(b, 0) // end structType
        putUint(b, 0) // end wireType
      }
      structReg(id) = fields.toVector
      id
    }

    def defineArray(name: String, elem: Long, len: Int): Long = {
      val id = define(s"array:$name:$elem:$len") { (b, id) =>
        putUint(b, 1) // wireType field 0: ArrayT
        putCommon(b, name, id)
        putUint(b, 1); putInt(b, elem) // arrayType.Elem
        putUint(b, 1); putInt(b, len.toLong) // arrayType.Len
        putUint(b, 0)
        putUint(b, 0)
      }
      arrayReg(id) = (elem, len)
      id
    }

    def defineSlice(name: String, elem: Long): Long = {
      val id = define(s"slice:$name:$elem") { (b, id) =>
        putUint(b, 2) // wireType field 1: SliceT
        putCommon(b, name, id)
        putUint(b, 1); putInt(b, elem)
        putUint(b, 0)
        putUint(b, 0)
      }
      sliceReg(id) = elem
      id
    }

    /** GobEncoder-style opaque type (e.g. time.Time). */
    def defineOpaque(name: String): Long = {
      val id = define(s"opaque:$name") { (b, id) =>
        putUint(b, 5) // wireType field 4: GobEncoderT
        putCommon(b, name, id)
        putUint(b, 0) // end gobEncoderType (just the CommonType)
        putUint(b, 0)
      }
      opaqueReg += id
      id
    }

    private def putCommon(b: java.io.ByteArrayOutputStream, name: String, id: Long): Unit = {
      putUint(b, 1) // meta-struct field 0: CommonType
      if (name.nonEmpty) { putUint(b, 1); putString(b, name); putUint(b, 1) }
      else putUint(b, 2) // skip zero-valued Name: delta 2 straight to Id
      putInt(b, id)
      putUint(b, 0) // end CommonType
    }

    private def define(key: String)(body: (java.io.ByteArrayOutputStream, Long) => Unit): Long =
      defined.getOrElseUpdate(key, {
        val id = nextId
        nextId += 1
        val b = new java.io.ByteArrayOutputStream()
        putInt(b, -id)
        body(b, id)
        message(b.toByteArray)
        id
      })

    /** Emit one top-level value message. `value` follows the reader's
      * model (Map for structs keyed by field name, Vector for slices /
      * arrays, Array[Byte] for bytes/opaque, Long/Boolean/Double/String
      * scalars). Struct fields at Go zero values are omitted, mirroring
      * the encoder's contract. */
    def writeValue(typeId: Long, value: Any): Unit = {
      val b = new java.io.ByteArrayOutputStream()
      putInt(b, typeId)
      if (structReg.contains(typeId))
        putStructBody(b, structReg(typeId), value)
      else {
        putUint(b, 0) // singleton delta
        putBody(b, typeId, value)
      }
      message(b.toByteArray)
    }

    private def isZero(v: Any): Boolean = v match {
      case l: Long => l == 0L
      case i: Int => i == 0
      case d: Double => d == 0.0
      case c: GobComplex => c.re == 0.0 && c.im == 0.0
      case s: String => s.isEmpty
      case b: Boolean => !b
      case a: Array[Byte] => a.isEmpty
      case v: Vector[_] => v.isEmpty // slices; arrays are never omitted here
      case m: Map[_, _] => m.isEmpty
      case _ => false
    }

    private def putStructBody(b: java.io.ByteArrayOutputStream,
        fields: Vector[(String, Long)], value: Any): Unit = {
      val m = value.asInstanceOf[Map[String, Any]]
      var last = -1L
      fields.zipWithIndex.foreach { case ((fname, fid), idx) =>
        m.get(fname) match {
          // fixed-size arrays are sent even when all-zero (the encoder's
          // isZero walk is what a DECODER never relies on; sending is
          // always compatible and matches a part-filled Segment.Series)
          case Some(v) if !isZero(v) || arrayReg.contains(fid) =>
            putUint(b, idx - last); last = idx.toLong
            putBody(b, fid, v)
          case _ => ()
        }
      }
      putUint(b, 0)
    }

    private def putBody(b: java.io.ByteArrayOutputStream, typeId: Long, value: Any): Unit =
      typeId match {
        case IdBool => putUint(b, if (value.asInstanceOf[Boolean]) 1 else 0)
        case IdInt => putInt(b, value.asInstanceOf[Number].longValue())
        case IdUint => putUint(b, value.asInstanceOf[Number].longValue())
        case IdFloat =>
          val bits = java.lang.Double.doubleToLongBits(value.asInstanceOf[Number].doubleValue())
          putUint(b, java.lang.Long.reverseBytes(bits))
        case IdBytes => putBytes(b, value.asInstanceOf[Array[Byte]])
        case IdString => putString(b, value.asInstanceOf[String])
        case IdComplex =>
          val c = value.asInstanceOf[GobComplex]
          putUint(b, java.lang.Long.reverseBytes(
            java.lang.Double.doubleToLongBits(c.re)))
          putUint(b, java.lang.Long.reverseBytes(
            java.lang.Double.doubleToLongBits(c.im)))
        case _ if structReg.contains(typeId) =>
          putStructBody(b, structReg(typeId), value)
        case _ if arrayReg.contains(typeId) =>
          val (elem, len) = arrayReg(typeId)
          val xs = value.asInstanceOf[Vector[Any]]
          require(xs.length == len, s"array needs $len elements, got ${xs.length}")
          putUint(b, len.toLong)
          xs.foreach(x => putBody(b, elem, x))
        case _ if sliceReg.contains(typeId) =>
          val xs = value.asInstanceOf[Vector[Any]]
          putUint(b, xs.length.toLong)
          xs.foreach(x => putBody(b, sliceReg(typeId), x))
        case _ if opaqueReg.contains(typeId) =>
          putBytes(b, value.asInstanceOf[Array[Byte]])
        case other => throw new GobException(s"writer: unknown type id $other")
      }
  }

  // ================================================== time.Time GobEncoder

  /** Go `time.Time` GobEncode payload (UTC, version 1): version byte,
    * 8-byte big-endian seconds since Jan 1 year 1, 4-byte nanos,
    * 2-byte zone offset minutes (-1 = UTC). Public format per
    * `time.Time.MarshalBinary`. */
  object GoTime {
    /** Seconds between year 1 and the Unix epoch. */
    val UnixToAbsolute = 62135596800L

    def encodeUtc(epochNanos: Long): Array[Byte] = {
      val sec = Math.floorDiv(epochNanos, 1000000000L) + UnixToAbsolute
      val nsec = Math.floorMod(epochNanos, 1000000000L).toInt
      val b = java.nio.ByteBuffer.allocate(15)
      b.put(1.toByte)
      b.putLong(sec)
      b.putInt(nsec)
      b.putShort(-1: Short) // UTC marker
      b.array()
    }

    /** Epoch nanos from a GobEncode payload (version 1 or 2; the zone
      * offset only affects rendering, not the instant). */
    def decodeToEpochNanos(payload: Array[Byte]): Long = {
      if (payload.length < 15)
        throw new GobException(s"short time.Time payload (${payload.length} bytes)")
      val version = payload(0)
      if (version != 1 && version != 2)
        throw new GobException(s"unknown time.Time binary version $version")
      val b = java.nio.ByteBuffer.wrap(payload, 1, 12)
      val sec = b.getLong
      val nsec = b.getInt
      (sec - UnixToAbsolute) * 1000000000L + nsec
    }
  }
}
