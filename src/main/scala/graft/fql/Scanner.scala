package graft.fql

/** FQL tokenizer.
  *
  * Token surface mirrors the reference scanner
  * (`pkg/query/scanner/scanner.go`): keywords, hierarchical topics
  * (`/a/b-c/2`), whences (`~now`, `~(Jan 02, 2006)`), timespans
  * (`@second`..`@year`), int/float/string literals, identifiers, and the
  * operator set `| -> ( ) [ ] , : + - * / < <= > >= == !=`.
  */
object Token {
  sealed trait Kind
  case object Keyword extends Kind
  case object Identifier extends Kind
  case object Topic extends Kind
  case object Whence extends Kind
  case object Timespan extends Kind
  case object IntTok extends Kind
  case object FloatTok extends Kind
  case object StringTok extends Kind
  case object Op extends Kind
  case object Eof extends Kind

  val keywords: Set[String] =
    Set("all", "sample", "in", "since", "before", "between", "filter", "map", "reduce")
  val timespans: Set[String] =
    Set("@second", "@minute", "@hour", "@day", "@week", "@month", "@year")
}

final case class Tok(kind: Token.Kind, lexeme: String, pos: Int)

final class Scanner(input: String) {
  private var i = 0
  private var toks = Vector.empty[Tok]
  private var cursor = 0

  private[fql] def rawInput: String = input

  private def err(msg: String) = throw new FqlException(msg, i, i + 1, input)

  private def scanAll(): Unit = {
    while (i < input.length) {
      val c = input(i)
      if (c.isWhitespace) { i += 1 }
      else if (c == '/' && prevIsValue) {
        // division operator — a topic path can never follow a value
        push(Token.Op, "/"); i += 1
      } else if (c == '/') {
        // reference parity (`scanner.go:326-334`): '/' starts a TOPIC only
        // when followed by a LETTER. After `in`, a bare '/' is the root
        // topic (`all in /` is a PASS corpus line) while `/12` leaves a
        // trailing integer → parse error (pinned FAIL in invalid.txt).
        val nextIsLetter = i + 1 < input.length && input(i + 1).isLetter
        if (nextIsLetter) scanTopic()
        else if (toks.lastOption.exists(t => t.kind == Token.Keyword && t.lexeme == "in")) {
          push(Token.Topic, "/"); i += 1
        } else { push(Token.Op, "/"); i += 1 }
      }
      else if (c == '~') scanWhence()
      else if (c == '@') scanTimespan()
      else if (c.isDigit || (c == '.' && i + 1 < input.length && input(i + 1).isDigit)) scanNumber()
      else if (c == '"' || c == '\'') scanString(c)
      else if (c.isLetter || c == '_') scanWord()
      else scanOp()
    }
    toks :+= Tok(Token.Eof, "<eof>", input.length)
  }

  /** True when the previous token could end a value expression — used to
    * disambiguate `/` as division vs topic start (`x / 32` vs `in /foo`). */
  private def prevIsValue: Boolean = toks.lastOption.exists { t =>
    t.kind == Token.Identifier || t.kind == Token.IntTok || t.kind == Token.FloatTok ||
    (t.kind == Token.Op && (t.lexeme == ")" || t.lexeme == "]"))
  }

  private def isTopicStart(c: Char): Boolean = c.isLetterOrDigit || c == '_' || c == '-'

  private def push(k: Token.Kind, s: String): Unit = toks :+= Tok(k, s, i)

  private def scanTopic(): Unit = {
    val start = i
    i += 1
    // continuation set per the reference MatchTopic (`scanner.go:50-63`):
    // letters, digits, and / - _ # . @
    while (i < input.length && (input(i).isLetterOrDigit || "/_-.#@".contains(input(i)))) i += 1
    toks :+= Tok(Token.Topic, input.substring(start, i), start)
  }

  private def scanWhence(): Unit = {
    val start = i
    i += 1
    if (input.startsWith("now", i)) { i += 3; toks :+= Tok(Token.Whence, "~now", start) }
    else if (i < input.length && input(i) == '(') {
      val close = input.indexOf(')', i)
      if (close < 0) err("unterminated time-whence '~('")
      i = close + 1
      toks :+= Tok(Token.Whence, input.substring(start, i), start)
    } else err("expected '~now' or '~(<datetime>)'")
  }

  private def scanTimespan(): Unit = {
    val start = i
    i += 1
    while (i < input.length && input(i).isLetter) i += 1
    val s = input.substring(start, i)
    if (!Token.timespans(s)) err(s"unknown timespan '$s'")
    toks :+= Tok(Token.Timespan, s, start)
  }

  private def scanNumber(): Unit = {
    val start = i
    while (i < input.length && input(i).isDigit) i += 1
    if (i < input.length && input(i) == '.' && i + 1 < input.length && input(i + 1).isDigit) {
      i += 1
      while (i < input.length && input(i).isDigit) i += 1
      toks :+= Tok(Token.FloatTok, input.substring(start, i), start)
    } else toks :+= Tok(Token.IntTok, input.substring(start, i), start)
  }

  private def scanString(quote: Char): Unit = {
    val start = i
    i += 1
    val sb = new StringBuilder
    while (i < input.length && input(i) != quote) { sb += input(i); i += 1 }
    if (i >= input.length) err("unterminated string literal")
    i += 1
    toks :+= Tok(Token.StringTok, sb.toString, start)
  }

  private def scanWord(): Unit = {
    val start = i
    while (i < input.length && (input(i).isLetterOrDigit || input(i) == '_')) i += 1
    val s = input.substring(start, i)
    toks :+= Tok(if (Token.keywords(s)) Token.Keyword else Token.Identifier, s, start)
  }

  private def scanOp(): Unit = {
    val start = i
    val two = if (i + 1 < input.length) input.substring(i, i + 2) else ""
    val op = two match {
      case "->" | "==" | "!=" | "<=" | ">=" => i += 2; two
      case _ =>
        val c = input(i)
        if ("|(),:[]+-*/<>".indexOf(c) < 0) err(s"unexpected character '$c'")
        i += 1; c.toString
    }
    toks :+= Tok(Token.Op, op, start)
  }

  scanAll()

  // next() advances unconditionally (clamped on read) so that
  // next()/rewind() pairs stay symmetric even when reading past EOF.
  def peek: Tok = toks(math.min(cursor, toks.length - 1))
  def next(): Tok = { val t = peek; cursor += 1; t }
  def rewind(): Unit = if (cursor > 0) cursor -= 1
  def all: Vector[Tok] = toks
}
