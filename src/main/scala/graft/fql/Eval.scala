package graft.fql

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import graft.fql.Ast._

/** Row-at-a-time FQL expression interpreter.
  *
  * Used for (a) the general `reduce` fallback (distributed `treeReduce` over
  * runtime values) and (b) unit-testing expression semantics independently of
  * Spark. Mirrors the reference VM's coercions (`pkg/query/types/value.go`):
  * int⊕float upcasts to float, `/` always yields float, numeric truthiness.
  *
  * Runtime values: Long, Double, Boolean, String, Seq[Any] (tuple/array),
  * Map[String,Any] (composite).
  */
object Eval {

  def eval(e: Expr, env: Map[String, Any]): Any = e match {
    case IntLit(v) => v
    case FloatLit(v) => v
    case StringLit(v) => v
    case Ident(n) => env.getOrElse(n, throw new FqlException(s"unresolved identifier '$n'"))
    case Unary("-", x) => eval(x, env) match {
      case l: Long => Math.negateExact(l) // Long.MinValue: fail like ANSI, not wrap
      case d: Double => -d
      case other => throw new FqlException(s"cannot negate $other")
    }
    case Unary(_, x) => eval(x, env)
    case Binary(op, l, r) => binop(op, eval(l, env), eval(r, env))
    case IndexSub(x, i) => eval(x, env) match {
      case s: Seq[_] =>
        if (i < 0 || i >= s.length) throw new FqlException(s"index $i out of bounds")
        s(i)
      case other => throw new FqlException(s"cannot subscript $other")
    }
    case KeySub(x, k) => eval(x, env) match {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]].getOrElse(k,
        throw new FqlException(s"no composite member '$k'"))
      case r: Row => r.getAs[Any](k)
      case other => throw new FqlException(s"cannot key-subscript $other")
    }
    case Call(name, args) => builtin(name, args.map(a => eval(a, env)))
  }

  def evalOut(out: StageOut, env: Map[String, Any]): Any = out match {
    case OutExpr(e) => eval(e, env)
    case OutTuple(es) =>
      val vs = es.map(e => eval(e, env))
      if (vs.exists(_.isInstanceOf[Double])) vs.map(toD) else vs
    case OutComposite(fields) =>
      fields.sortBy(_._1).map { case (k, e) => k -> eval(e, env) }.toMap
  }

  private def toD(v: Any): Double = v match {
    case l: Long => l.toDouble
    case d: Double => d
    case b: Boolean => if (b) 1.0 else 0.0
    case other => throw new FqlException(s"not numeric: $other")
  }

  private def bothLong(l: Any, r: Any): Boolean =
    l.isInstanceOf[Long] && r.isInstanceOf[Long]

  // Long arithmetic is EXACT (Math.*Exact): overflow raises instead of
  // wrapping, matching the compiled path under Spark's default ANSI mode.
  // Deviation from Go's silent int64 wraparound, fixed deliberately (like
  // E7/E15): both execution paths fail loudly on the same inputs rather
  // than one wrapping while the other throws.
  private def binop(op: String, l: Any, r: Any): Any = op match {
    case "+" => if (bothLong(l, r)) Math.addExact(l.asInstanceOf[Long], r.asInstanceOf[Long]) else toD(l) + toD(r)
    case "-" => if (bothLong(l, r)) Math.subtractExact(l.asInstanceOf[Long], r.asInstanceOf[Long]) else toD(l) - toD(r)
    case "*" => if (bothLong(l, r)) Math.multiplyExact(l.asInstanceOf[Long], r.asInstanceOf[Long]) else toD(l) * toD(r)
    case "/" =>
      // always float (`value.go:436`); -0.0 divisor normalizes to +0.0 like
      // the compiled path (SQL treats them equal), so -x/0 = -Inf either way
      val rd = toD(r)
      toD(l) / (if (rd == 0.0) 0.0 else rd)
    case "<" => cmp(l, r) < 0
    case "<=" => cmp(l, r) <= 0
    case ">" => cmp(l, r) > 0
    case ">=" => cmp(l, r) >= 0
    case "==" => eq(l, r)
    case "!=" => !eq(l, r) // works here, unlike the reference (bug E7)
    case other => throw new FqlException(s"unknown operator '$other'")
  }

  /** Comparison semantics match the Spark-compiled path: long/long stays
    * exact (no double round-trip above 2^53); doubles use SQL total order
    * (NaN greater than everything, NaN == NaN, -0.0 == 0.0) — a documented
    * deviation from Go's IEEE comparisons, chosen so both execution paths
    * and Spark's own sort/join semantics agree. */
  private def cmp(l: Any, r: Any): Int = (l, r) match {
    case (a: Long, b: Long) => java.lang.Long.compare(a, b)
    case _ =>
      def norm(d: Double): Double = if (d == 0.0) 0.0 else d
      java.lang.Double.compare(norm(toD(l)), norm(toD(r)))
  }

  private def eq(l: Any, r: Any): Boolean = (l, r) match {
    case (a: String, b: String) => a == b
    case (a: Boolean, b: Boolean) => a == b
    case _ => cmp(l, r) == 0
  }

  def truthy(v: Any): Boolean = v match {
    case b: Boolean => b
    case l: Long => l != 0
    case d: Double => d != 0.0
    case s: String => s.nonEmpty
    case null => false
    case _ => true
  }

  private def builtin(name: String, args: List[Any]): Any = name match {
    case "max" => args match {
      case List(s: Seq[_]) if s.isEmpty => throw new FqlException("max of empty tuple")
      case List(s: Seq[_]) => s.map(toD).max match { case d => numOut(s, d) }
      case xs => if (xs.exists(_.isInstanceOf[Double])) xs.map(toD).max
        else xs.map(_.asInstanceOf[Long]).max
    }
    case "min" => args match {
      case List(s: Seq[_]) if s.isEmpty => throw new FqlException("min of empty tuple")
      case List(s: Seq[_]) => numOut(s, s.map(toD).min)
      case xs => if (xs.exists(_.isInstanceOf[Double])) xs.map(toD).min
        else xs.map(_.asInstanceOf[Long]).min
    }
    case "len" => args.head match {
      case s: String => s.length.toLong
      case s: Seq[_] => s.length.toLong
      case b: Array[Byte] => b.length.toLong
      case other => throw new FqlException(s"len: unsupported $other")
    }
    // StrictMath, not Math: Spark's Pow/Exp/Log expressions evaluate via
    // StrictMath, and the intrinsic Math variants differ in the last ULP on
    // some inputs — the differential fuzzer caught the divergence on
    // ln(ln(3.0)). sqrt is exactly rounded by IEEE, either class works.
    case "pow" => StrictMath.pow(toD(args(0)), toD(args(1)))
    case "abs" => args.head match {
      case l: Long => Math.absExact(l) // Long.MinValue: fail like ANSI, not wrap
      case d: Double => math.abs(d)
      case o => throw new FqlException(s"abs: not numeric $o")
    }
    case "sqrt" => math.sqrt(toD(args.head))
    case "exp" => StrictMath.exp(toD(args.head))
    case "ln" => StrictMath.log(toD(args.head))
    case "floor" => args.head match { case l: Long => l; case d: Double => math.floor(d) }
    case "ceil" => args.head match { case l: Long => l; case d: Double => math.ceil(d) }
    case "round" => args match {
      case List(l: Long) => l
      // HALF_UP on the shortest decimal representation, NaN/±Inf passed
      // through — exactly Spark's Round. (Math.round is floor(x+0.5):
      // wrong sign on negative halves, and it maps NaN to 0.)
      case List(d: Double) =>
        if (d.isNaN || d.isInfinite) d
        else BigDecimal(d).setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble
      case List(d: Double, s: Long) =>
        if (d.isNaN || d.isInfinite) d
        else BigDecimal(d).setScale(s.toInt, BigDecimal.RoundingMode.HALF_UP).toDouble
      case _ => throw new FqlException("round: bad args")
    }
    case other => throw new FqlException(s"Unknown builtin function '$other'")
  }

  private def numOut(src: Seq[_], d: Double): Any =
    if (src.exists(_.isInstanceOf[Double])) d else d.toLong

  // === Spark bridge for the general reduce fallback ========================

  /** Row cell → runtime value. */
  def fromRowValue(v: Any): Any = v match {
    case null => null
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
    case f: Float => f.toDouble
    case s: scala.collection.Seq[_] => s.toList.map(fromRowValue)
    case r: Row => r.schema.fieldNames.zip(r.toSeq.map(fromRowValue)).toMap
    case other => other
  }

  /** Runtime value → Row cell of the given Spark type. */
  def toRowValue(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (l: Long, IntegerType) => l.toInt
    case (l: Long, DoubleType) => l.toDouble
    case (d: Double, LongType) => d.toLong
    case (s: Seq[_], ArrayType(et, _)) => s.map(x => toRowValue(x, et))
    case (m: Map[_, _], st: StructType) =>
      Row.fromSeq(st.fields.map(f =>
        toRowValue(m.asInstanceOf[Map[String, Any]].getOrElse(f.name, null), f.dataType)).toSeq)
    case (other, _) => other
  }

}
