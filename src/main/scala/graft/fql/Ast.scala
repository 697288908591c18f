package graft.fql

/** FQL abstract syntax tree.
  *
  * Grammar per reference `docs/grammar.md:3-48` (dburkart/fossil):
  * {{{
  * query      = quantifier [ "in" topic ] [ time-predicate ] [ data-pipeline ]
  * quantifier = "all" / "sample(" time-quantity ")"
  * }}}
  *
  * Unlike the reference (`pkg/query/ast/ast.go`), nodes carry no token
  * bookkeeping — position info lives in [[FqlException]] only. Time
  * expressions fold to concrete instants at parse time, matching the
  * reference's plan-time folding (`pkg/query/plan/metadata.go:101-127`).
  */
object Ast {

  /** Duration quantities are nanoseconds, like Go's `time.Duration`
    * (`pkg/query/ast/ast.go:213-231`). */
  final val NanosPerSecond = 1000000000L

  sealed trait Quantifier
  case object All extends Quantifier
  /** `sample(q)` — greedy downsample, interval in nanoseconds. */
  final case class Sample(intervalNs: Long) extends Quantifier

  /** A time-whence: `~now` or `~(<vague datetime>)`. `Now` is resolved
    * against the query-evaluation clock (injectable for determinism). */
  sealed trait Whence
  case object WhenceNow extends Whence
  final case class WhenceAt(epochNanos: Long) extends Whence

  /** `whence [±quantity]`, quantity already folded to nanos. */
  final case class TimeExpr(whence: Whence, offsetNs: Long) {
    def resolve(nowNs: Long): Long = (whence match {
      case WhenceNow => nowNs
      case WhenceAt(ns) => ns
    }) + offsetNs
  }

  sealed trait TimePredicate
  final case class Since(t: TimeExpr) extends TimePredicate
  final case class Before(t: TimeExpr) extends TimePredicate
  final case class Between(begin: TimeExpr, end: TimeExpr) extends TimePredicate

  // --- expressions -------------------------------------------------------

  sealed trait Expr
  final case class IntLit(v: Long) extends Expr
  final case class FloatLit(v: Double) extends Expr
  final case class StringLit(v: String) extends Expr
  final case class Ident(name: String) extends Expr
  /** Unary `-`/`+` (numeric). */
  final case class Unary(op: String, e: Expr) extends Expr
  /** `+ - * / < <= > >= == !=`. `/` always yields float
    * (`pkg/query/types/value.go:436`). */
  final case class Binary(op: String, l: Expr, r: Expr) extends Expr
  /** `x[0]` array/tuple element (0-based). */
  final case class IndexSub(e: Expr, idx: Int) extends Expr
  /** `x["key"]` / `x[key]` composite member. */
  final case class KeySub(e: Expr, key: String) extends Expr
  /** Builtin call `name(args...)`. Reference ships max/min
    * (`pkg/query/types/builtin.go:14-21`); we also implement the
    * documented-but-missing len/pow (`docs/pipelines.md:67`, ref bug E15). */
  final case class Call(name: String, args: List[Expr]) extends Expr

  /** RHS of a stage: single expression, tuple, or composite. */
  sealed trait StageOut
  final case class OutExpr(e: Expr) extends StageOut
  final case class OutTuple(es: List[Expr]) extends StageOut
  final case class OutComposite(fields: List[(String, Expr)]) extends StageOut

  sealed trait Stage { def args: List[String] }
  final case class FilterStage(args: List[String], pred: Expr) extends Stage
  final case class MapStage(args: List[String], out: StageOut) extends Stage
  final case class ReduceStage(args: List[String], out: StageOut) extends Stage

  final case class Query(
      quantifier: Quantifier,
      topic: Option[String],
      timePred: Option[TimePredicate],
      pipeline: List[Stage])
}

final class FqlException(
    val rawMessage: String, val pos: Int = -1, val endPos: Int = -1,
    val input: String = null)
    extends RuntimeException(FqlException.render(rawMessage, pos, endPos, input))

object FqlException {
  /** Caret-formatted syntax error, reference `FormatError` parity
    * (`pkg/common/parse/error.go:24-40`): the offending input, then an
    * underline `^~~~` spanning [pos, endPos) followed by the message.
    * Shared by FQL queries, schema DDL ([[graft.engine.FossilSchema]])
    * and REPL command errors — one renderer, one reference format; the
    * header names which surface the input came from. */
  private[graft] def caret(msg: String, pos: Int, endPos: Int, input: String,
      header: String): String = {
    val repeat = math.max(endPos - pos - 1, 0)
    val p = math.min(pos, input.length)
    // the caret line goes directly under the LINE containing pos, and
    // its column counts from that line's start — a raw-offset pad would
    // misalign on any query with embedded newlines (the scanner skips
    // them as whitespace, so multi-line queries are legal)
    val lineStart = input.lastIndexOf('\n', math.max(p - 1, 0)) + 1
    val lineEnd = input.indexOf('\n', p) match { case -1 => input.length; case e => e }
    val underline = (" " * (p - lineStart)) + "^" + ("~" * repeat) + " " + msg
    header + "\n" +
      input.substring(0, lineEnd) + "\n" + underline +
      (if (lineEnd < input.length) input.substring(lineEnd) else "") + "\n"
  }

  /** Errors carrying no input (compiler/runtime stages) keep the plain
    * `msg (at offset pos)` shape. */
  private def render(msg: String, pos: Int, endPos: Int, input: String): String =
    if (input == null || pos < 0) {
      if (pos >= 0) s"$msg (at offset $pos)" else msg
    } else caret(msg, pos, endPos, input, "Syntax error found in query:")
}
