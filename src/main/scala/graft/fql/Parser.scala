package graft.fql

import java.time.format.DateTimeFormatter
import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset, ZonedDateTime}
import java.util.Locale

import Ast._

/** Recursive-descent FQL parser (mirrors grammar of
  * `pkg/query/parser/parser.go:23-81`, precedence per `docs/grammar.md`:
  * `==`/`!=` < `< <= > >=` < `+ -` < `* /` < unary).
  *
  * Time quantities fold to nanoseconds at parse time like the reference's
  * `DerivedValue()` walk (`pkg/query/ast/ast.go:196-231`); `~now` stays
  * symbolic until the engine resolves it against an injectable clock.
  */
object Parser {

  def parse(input: String): Query = new Parser(new Scanner(input)).parseQuery()

  /** Accepts the reference's "vague datetime" formats
    * (`pkg/query/parser/times.go:17-34`): RFC3339(+nano), RFC822(Z),
    * RFC1123(Z), UnixDate, `2006/01/02`, `02/01/2006`, `Jan 02, 2006`,
    * `Jan _2 15:04:05` (Stamp). Date-only formats resolve to UTC midnight. */
  def parseVagueDateTime(s: String): Long = {
    def ok(f: => Long): Option[Long] = try Some(f) catch { case _: Exception => None }
    val zoned: List[DateTimeFormatter] = List(
      DateTimeFormatter.ISO_OFFSET_DATE_TIME,
      DateTimeFormatter.RFC_1123_DATE_TIME,
      DateTimeFormatter.ofPattern("dd MMM yy HH:mm zzz", Locale.US),
      DateTimeFormatter.ofPattern("dd MMM yy HH:mm Z", Locale.US),
      DateTimeFormatter.ofPattern("EEE MMM ppd HH:mm:ss zzz yyyy", Locale.US))
    val dates: List[DateTimeFormatter] = List(
      DateTimeFormatter.ofPattern("yyyy/MM/dd"),
      DateTimeFormatter.ofPattern("dd/MM/yyyy"),
      DateTimeFormatter.ofPattern("MMM dd, yyyy", Locale.US))
    // Go time.Stamp ("Jan _2 15:04:05") has no year. Go defaults it to
    // year 0, which is outside the ±292-year range of 64-bit epoch nanos —
    // with that default the format could never parse here (toNanos throws
    // on every candidate). Deviation: default to 1970 so Stamp inputs
    // resolve deterministically near the epoch instead of always erroring.
    val stamp = new java.time.format.DateTimeFormatterBuilder()
      .appendPattern("MMM ppd HH:mm:ss")
      .parseDefaulting(java.time.temporal.ChronoField.YEAR, 1970)
      .toFormatter(Locale.US)
    val locals: List[DateTimeFormatter] = List(
      DateTimeFormatter.ISO_LOCAL_DATE_TIME, stamp)
    val candidates =
      zoned.view.flatMap(f => ok(toNanos(ZonedDateTime.parse(s, f).toInstant))) ++
        dates.view.flatMap(f => ok(toNanos(LocalDate.parse(s, f).atStartOfDay(ZoneOffset.UTC).toInstant))) ++
        locals.view.flatMap(f => ok(toNanos(LocalDateTime.parse(s, f).atZone(ZoneOffset.UTC).toInstant)))
    candidates.headOption.getOrElse(
      throw new FqlException(s"Specified time '$s' did not match a known timestamp"))
  }

  /** Exact epoch-nanos: instants outside Long-nanos range (±292 years of
    * 1970, e.g. Go Stamp's year-0 default) throw, so ok() rejects the
    * candidate instead of returning a silently-wrapped garbage value. */
  private def toNanos(i: Instant): Long =
    Math.addExact(Math.multiplyExact(i.getEpochSecond, NanosPerSecond), i.getNano.toLong)

  private val spanNs: Map[String, Long] = Map(
    "@second" -> NanosPerSecond,
    "@minute" -> 60L * NanosPerSecond,
    "@hour" -> 3600L * NanosPerSecond,
    "@day" -> 86400L * NanosPerSecond,
    "@week" -> 7L * 86400L * NanosPerSecond,
    // month = 30 days, year = 365 days, per pkg/query/ast/ast.go:215-218
    "@month" -> 30L * 86400L * NanosPerSecond,
    "@year" -> 365L * 86400L * NanosPerSecond)

  private[fql] def spanNanos(name: String): Long = spanNs(name)
}

final class Parser(s: Scanner) {
  import Parser._

  /** Syntax errors underline the offending token in the query — reference
    * `FormatError` parity (`pkg/common/parse/error.go:24-40`; the parser
    * wraps every syntax panic that way, `pkg/query/parser/parser.go:30`). */
  private def err(t: Tok, msg: String) =
    throw new FqlException(msg, t.pos,
      t.pos + math.max(t.lexeme.length, 1), s.rawInput)

  private def expectOp(op: String): Unit = {
    val t = s.next()
    if (t.kind != Token.Op || t.lexeme != op) err(t, s"unexpected token '${t.lexeme}', expected '$op'")
  }

  def parseQuery(): Query = {
    val q = quantifier()
    val topic = topicSelector()
    val tp = timePredicate()
    val pipe = dataPipeline()
    val t = s.next()
    if (t.kind != Token.Eof) err(t, s"unexpected trailing token '${t.lexeme}'")
    Query(q, topic, tp, pipe)
  }

  private def quantifier(): Quantifier = {
    val t = s.next()
    if (t.kind != Token.Keyword) err(t, s"expected quantifier ('all' or 'sample'), got '${t.lexeme}'")
    t.lexeme match {
      case "all" => All
      case "sample" =>
        expectOp("(")
        val q = timeQuantity()
        expectOp(")")
        Sample(q)
      case other => err(t, s"expected quantifier ('all' or 'sample'), got '$other'")
    }
  }

  private def topicSelector(): Option[String] = {
    val t = s.next()
    if (t.kind == Token.Keyword && t.lexeme == "in") {
      val topic = s.next()
      if (topic.kind != Token.Topic) err(topic, s"expected a topic path, got '${topic.lexeme}'")
      Some(topic.lexeme)
    } else { s.rewind(); None }
  }

  private def timePredicate(): Option[TimePredicate] = {
    val t = s.next()
    if (t.kind != Token.Keyword || !Set("since", "before", "between")(t.lexeme)) {
      s.rewind(); return None
    }
    val begin = timeExpression()
    t.lexeme match {
      case "since" => Some(Since(begin))
      case "before" => Some(Before(begin))
      case "between" =>
        expectOp(",")
        Some(Between(begin, timeExpression()))
    }
  }

  private def timeExpression(): TimeExpr = {
    val whence = timeWhence()
    val t = s.next()
    if (t.kind == Token.Op && (t.lexeme == "-" || t.lexeme == "+")) {
      val q = timeQuantity()
      TimeExpr(whence, if (t.lexeme == "-") -q else q)
    } else { s.rewind(); TimeExpr(whence, 0L) }
  }

  private def timeWhence(): Whence = {
    val t = s.next()
    if (t.kind != Token.Whence) err(t, s"unexpected token '${t.lexeme}', expected a time-whence (~now, etc.)")
    if (t.lexeme == "~now") WhenceNow
    else {
      // re-home the datetime-format error onto the whence token so the
      // caret rendering can underline it in the query
      val ns =
        try parseVagueDateTime(t.lexeme.substring(2, t.lexeme.length - 1))
        catch { case e: FqlException => err(t, e.rawMessage) }
      WhenceAt(ns)
    }
  }

  // time-quantity = time-term *( ( "-" / "+" ) time-term ), folded to ns
  private def timeQuantity(): Long = {
    var v = timeTerm()
    var t = s.next()
    while (t.kind == Token.Op && (t.lexeme == "-" || t.lexeme == "+")) {
      val rh = timeTerm()
      v = if (t.lexeme == "-") v - rh else v + rh
      t = s.next()
    }
    s.rewind()
    v
  }

  private def timeTerm(): Long = {
    var v = timeAtom()
    var t = s.next()
    while (t.kind == Token.Op && t.lexeme == "*") {
      v = v * timeAtom()
      t = s.next()
    }
    s.rewind()
    v
  }

  private def timeAtom(): Long = {
    val t = s.next()
    t.kind match {
      case Token.IntTok => t.lexeme.toLong
      case Token.Timespan => spanNanos(t.lexeme)
      case _ => err(t, s"expected number or timespan, got '${t.lexeme}'")
    }
  }

  // --- data pipeline ------------------------------------------------------

  private def dataPipeline(): List[Stage] = {
    val stages = List.newBuilder[Stage]
    var t = s.next()
    while (t.kind == Token.Op && t.lexeme == "|") {
      stages += dataFunction()
      t = s.next()
    }
    s.rewind()
    stages.result()
  }

  private def dataFunction(): Stage = {
    val t = s.next()
    if (t.kind != Token.Keyword || !Set("filter", "map", "reduce")(t.lexeme))
      err(t, s"expected 'filter', 'map' or 'reduce', got '${t.lexeme}'")
    val args = dataArgs()
    expectOp("->")
    val out = stageOut()
    t.lexeme match {
      case "filter" =>
        out match {
          case OutExpr(e) => FilterStage(args, e)
          case _ => err(t, "filter body must be a single expression")
        }
      case "map" => MapStage(args, out)
      case "reduce" =>
        if (args.length != 2) err(t, s"reduce requires exactly 2 arguments, got ${args.length}")
        ReduceStage(args, out)
    }
  }

  private def dataArgs(): List[String] = {
    val args = List.newBuilder[String]
    var t = s.next()
    if (t.kind != Token.Identifier) err(t, s"expected argument name, got '${t.lexeme}'")
    args += t.lexeme
    t = s.next()
    while (t.kind == Token.Op && t.lexeme == ",") {
      val a = s.next()
      if (a.kind != Token.Identifier) err(a, s"expected argument name, got '${a.lexeme}'")
      args += a.lexeme
      t = s.next()
    }
    s.rewind()
    args.result()
  }

  /** expression / tuple / composite (composite keys may be quoted strings or
    * bare identifiers, `pkg/query/parser/parser.go:675-722`). */
  private def stageOut(): StageOut = {
    // composite detection: (string | identifier) ":"
    val first = s.peek
    if (first.kind == Token.StringTok || first.kind == Token.Identifier) {
      s.next()
      val colonMaybe = s.peek
      s.rewind()
      if (colonMaybe.kind == Token.Op && colonMaybe.lexeme == ":") return composite()
    }
    val e1 = expression()
    val t = s.next()
    if (t.kind == Token.Op && t.lexeme == ",") {
      val es = List.newBuilder[Expr]
      es += e1
      es += expression()
      var t2 = s.next()
      while (t2.kind == Token.Op && t2.lexeme == ",") {
        es += expression()
        t2 = s.next()
      }
      s.rewind()
      OutTuple(es.result())
    } else { s.rewind(); OutExpr(e1) }
  }

  private def composite(): StageOut = {
    val fields = List.newBuilder[(String, Expr)]
    var continue = true
    while (continue) {
      val k = s.next()
      if (k.kind != Token.StringTok && k.kind != Token.Identifier)
        err(k, s"expected composite key, got '${k.lexeme}'")
      expectOp(":")
      fields += ((k.lexeme, expression()))
      val t = s.next()
      if (t.kind == Token.Op && t.lexeme == ",") () else { s.rewind(); continue = false }
    }
    OutComposite(fields.result())
  }

  // --- expressions (precedence climbing) ---------------------------------

  private def expression(): Expr = {
    var lh = comparison()
    var t = s.next()
    while (t.kind == Token.Op && (t.lexeme == "==" || t.lexeme == "!=")) {
      lh = Binary(t.lexeme, lh, comparison())
      t = s.next()
    }
    s.rewind()
    lh
  }

  private def comparison(): Expr = {
    var lh = term()
    var t = s.next()
    while (t.kind == Token.Op && Set("<", "<=", ">", ">=")(t.lexeme)) {
      lh = Binary(t.lexeme, lh, term())
      t = s.next()
    }
    s.rewind()
    lh
  }

  private def term(): Expr = {
    var lh = termMd()
    var t = s.next()
    while (t.kind == Token.Op && (t.lexeme == "-" || t.lexeme == "+")) {
      lh = Binary(t.lexeme, lh, termMd())
      t = s.next()
    }
    s.rewind()
    lh
  }

  private def termMd(): Expr = {
    var lh = unary()
    var t = s.next()
    while (t.kind == Token.Op && (t.lexeme == "*" || t.lexeme == "/")) {
      lh = Binary(t.lexeme, lh, unary())
      t = s.next()
    }
    s.rewind()
    lh
  }

  private def unary(): Expr = {
    val t = s.next()
    if (t.kind == Token.Op && (t.lexeme == "-" || t.lexeme == "+")) Unary(t.lexeme, unary())
    else { s.rewind(); primary() }
  }

  private def primary(): Expr = {
    val t = s.next()
    t.kind match {
      case Token.IntTok => IntLit(t.lexeme.toLong)
      case Token.FloatTok => FloatLit(t.lexeme.toDouble)
      case Token.StringTok => StringLit(t.lexeme)
      case Token.Identifier =>
        val nt = s.peek
        if (nt.kind == Token.Op && nt.lexeme == "(") { s.next(); call(t.lexeme) }
        else if (nt.kind == Token.Op && nt.lexeme == "[") { s.next(); subscript(Ident(t.lexeme)) }
        else Ident(t.lexeme)
      case Token.Op if t.lexeme == "(" =>
        val e = expression()
        expectOp(")")
        e
      case _ => err(t, s"unexpected token '${t.lexeme}' in expression")
    }
  }

  private def call(name: String): Expr = {
    val args = List.newBuilder[Expr]
    args += expression()
    var t = s.next()
    while (t.kind == Token.Op && t.lexeme == ",") {
      args += expression()
      t = s.next()
    }
    if (t.kind != Token.Op || t.lexeme != ")") err(t, s"expected ')', got '${t.lexeme}'")
    Call(name, args.result())
  }

  private def subscript(base: Expr): Expr = {
    val t = s.next()
    val sub = t.kind match {
      case Token.IntTok => IndexSub(base, t.lexeme.toInt)
      case Token.StringTok => KeySub(base, t.lexeme)
      case Token.Identifier => KeySub(base, t.lexeme) // bare-identifier sugar
      case _ => err(t, s"expected subscript index or key, got '${t.lexeme}'")
    }
    expectOp("]")
    sub
  }
}
