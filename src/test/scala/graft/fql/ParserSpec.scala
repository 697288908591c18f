package graft.fql

import org.scalatest.funsuite.AnyFunSuite

/** Golden parser corpus, ported 1:1 from the reference's
  * `test/parsing/query/input/` txt files (PASS/FAIL header convention,
  * harness `pkg/query/parser/parser_test.go:44-117`) via FIXTURES.md §1. */
class ParserSpec extends AnyFunSuite {

  val pass: Seq[String] = Seq(
    // all.txt
    "all",
    "all in /foo since ~now - 1 * @year",
    // sample.txt / between-predicate.txt / before/since-predicate.txt
    "sample(@minute)",
    "sample(@hour) between ~now - @month * 6, ~now - @month * 2",
    "all before ~(01/01/2023)",
    "all since ~now",
    "all since ~now - @minute * 10",
    "all since ~(02/01/2023)",
    // in-topic.txt
    "all in /",
    "all in /foo/bar/baz",
    "all in /c02f3a2a-2791-443b-a2e9-c5e29740b803/",
    "all in /numbers/12",
    // data-filter.txt
    "all | filter x -> x > 100",
    "all | filter y -> y == \"foo\"",
    "all | filter cool_var -> cool_var == 'bar'",
    "all | filter x -> x < 2 < 5",
    "all | filter z -> z < 100 + 12",
    // data-map.txt
    "all | map x -> x / 32 * 24",
    "all | map x -> 3 * x + 4",
    "all | map x -> -x",
    "all | map x -> x * -1",
    "all | map x -> 1, x",
    "all | map x -> 1, x * 2",
    "all in /logs | map l -> len(l)",
    "all | map x -> pow(x, 2)",
    "all | map x -> x + 40 * 10",
    "all | map x -> (x + 40) * 10",
    "all | map x -> x * 3.4",
    // data-reduce.txt
    "all | reduce a, b -> a + b",
    "all | reduce a, b -> a[0] + b[0], a[0] + b[0]",
    "all | reduce a, b -> a[\"key\"], b[\"key\"]",
    "all | reduce a, b -> a[key], b[key]",
    // dictionary.txt
    "all | map x -> \"a\" : x / 2, \"b\" : x",
    "all | map x -> \"key\" : \"foo\", \"value\" : x",
    "all | map x -> key : \"foo\", value : x",
    // data.txt
    "all in /sensors/temp | map C -> C * 9 / 5 + 32",
    "all in /sensors/temp since ~now - @day * 7 | map t -> 1, t")

  val fail: Seq[String] = Seq(
    // invalid.txt
    "foo",
    "all and then some garbage",
    "",
    "all in /12", // '/' + digit is a slash token, not a topic (scanner.go:326-334)
    "all : map x -> (x * 3 + 4 : reduce a, b -> a + b",
    // extra rejections beyond the corpus
    "all in",
    "all since",
    "all between ~now",
    "all | filter x ->",
    "all | banana x -> x",
    "sample()",
    "all | map -> 1")

  pass.foreach { q =>
    test(s"parses: $q") {
      val ast = Parser.parse(q)
      assert(ast != null)
    }
  }

  fail.foreach { q =>
    test(s"rejects: $q") {
      assertThrows[Exception](Parser.parse(q))
    }
  }

  // Caret-formatted syntax errors — reference FormatError parity
  // (pkg/common/parse/error.go:24-40) over the invalid.txt corpus
  // (test/parsing/query/input/invalid.txt): the message must carry the
  // query and an underline whose caret column is the offending token.
  private def caretCol(msg: String, query: String): Int = {
    val lines = msg.linesIterator.toVector
    assert(lines.head == "Syntax error found in query:", msg)
    assert(lines(1) == query, msg)
    lines(2).indexOf('^')
  }

  test("located errors: caret underlines the offending token (invalid.txt corpus)") {
    def locate(q: String): Int = {
      val e = intercept[FqlException](Parser.parse(q))
      assert(e.input == q, s"error for '$q' lost its input")
      caretCol(e.getMessage, q)
    }
    assert(locate("foo") == 0) // not a quantifier
    assert(locate("all and then some garbage") == 4) // 'and' is trailing
    // '/12' scans as op-slash + int → the trailing tokens start at '/'
    assert(locate("all in /12") >= 7)
    assert(locate("all : map x -> (x * 3 + 4 : reduce a, b -> a + b") == 4)
    assert(locate("all | map -> 1") == 10) // missing argument name
    assert(locate("all | banana x -> x") == 6)
    assert(locate("all since ~(blorp)") == 10) // bad datetime, on the whence
  }

  test("located errors: underline spans the token like the reference (^~~~)") {
    val q = "all and then some garbage"
    val e = intercept[FqlException](Parser.parse(q))
    val underline = e.getMessage.linesIterator.toVector(2)
    // 'and' is 3 chars → ^ plus 2 tildes, then the message
    assert(underline.startsWith("    ^~~ "), s"got '$underline'")
  }

  test("located errors: caret aligns to the LINE containing the error in multi-line queries") {
    // the scanner treats newlines as whitespace, so multi-line queries are
    // legal; the caret must pad from the error line's start, not the raw
    // offset into the whole input
    val q = "all\n| banana x -> x"
    val e = intercept[FqlException](Parser.parse(q))
    val lines = e.getMessage.linesIterator.toVector
    assert(lines(1) == "all" && lines(2) == "| banana x -> x", lines)
    assert(lines(3).startsWith("  ^"), s"caret line misaligned: '${lines(3)}'")
  }

  test("errors with no position keep the plain message shape") {
    val e = new FqlException("plain")
    assert(e.getMessage == "plain")
    val at = new FqlException("msg", 7)
    assert(at.getMessage == "msg (at offset 7)")
  }

  test("AST golden shapes (reference expectation-dump analog)") {
    import Ast._
    assert(Parser.parse("all") == Query(All, None, None, Nil))
    assert(Parser.parse("sample(@minute)") ==
      Query(Sample(60L * NanosPerSecond), None, None, Nil))
    assert(Parser.parse("all in /foo/bar") ==
      Query(All, Some("/foo/bar"), None, Nil))

    val sinceWeek = Parser.parse("all since ~now - @day * 7")
    assert(sinceWeek.timePred ==
      Some(Since(TimeExpr(WhenceNow, -7L * 86400L * NanosPerSecond))))

    val filt = Parser.parse("all | filter x -> x > 100")
    assert(filt.pipeline ==
      List(FilterStage(List("x"), Binary(">", Ident("x"), IntLit(100)))))

    val mapTuple = Parser.parse("all | map x -> 1, x * 2")
    assert(mapTuple.pipeline ==
      List(MapStage(List("x"),
        OutTuple(List(IntLit(1), Binary("*", Ident("x"), IntLit(2)))))))

    val comp = Parser.parse("all | map x -> \"a\" : x / 2, \"b\" : x")
    assert(comp.pipeline ==
      List(MapStage(List("x"), OutComposite(List(
        "a" -> Binary("/", Ident("x"), IntLit(2)), "b" -> Ident("x"))))))

    val red = Parser.parse("all | reduce a, b -> a[0] + b[0], a[0] + b[0]")
    assert(red.pipeline == List(ReduceStage(List("a", "b"), OutTuple(List(
      Binary("+", IndexSub(Ident("a"), 0), IndexSub(Ident("b"), 0)),
      Binary("+", IndexSub(Ident("a"), 0), IndexSub(Ident("b"), 0)))))))

    // precedence: x + 2 * 3 > 7 parses as ((x + (2*3)) > 7)
    val prec = Parser.parse("all | filter x -> x + 2 * 3 > 7")
    assert(prec.pipeline == List(FilterStage(List("x"),
      Binary(">", Binary("+", Ident("x"), Binary("*", IntLit(2), IntLit(3))),
        IntLit(7)))))
  }

  test("time folding: quantities fold to exact nanoseconds") {
    val q = Parser.parse("all since ~(2024/01/10) + @day * 2")
    assert(q.timePred.isDefined)
  }

  test("precedence: * binds tighter than +, comparisons loosest") {
    // shape-level check: parses without error and is a filter stage
    val q = Parser.parse("all | filter x -> x + 2 * 3 > 7")
    assert(q.pipeline.nonEmpty)
  }
}
