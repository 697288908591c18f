package graft.fql

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.engine.{Catalog, FossilEngine}
import Ast._

/** Differential fuzzing: seeded random FQL map expressions evaluated through
  * BOTH execution paths — the Catalyst Column compiler and the row-at-a-time
  * fold interpreter — must agree exactly. This is precisely the divergence
  * class a reviewer caught by hand (tuple string-cast); the fuzzer guards
  * the dual-path contract permanently. */
class DifferentialSpec extends SparkSpec {
  import spark.implicits._

  // Deep-fuzz knobs: GRAFT_FUZZ_SEED re-seeds the generator and
  // GRAFT_FUZZ_MULT multiplies every test's iteration count, so a one-off
  // session can sweep far past the suite's default budget without touching
  // the pinned default seed CI runs on (r15 deep sweep: 12 seeds × 10×
  // iterations, zero divergences — recorded in BASELINE.md).
  private val fuzzMult = sys.env.getOrElse("GRAFT_FUZZ_MULT", "1").toInt
  private val rnd = new scala.util.Random(
    sys.env.getOrElse("GRAFT_FUZZ_SEED", "20260812").toLong)

  /** Random numeric expression over variable `x`, bounded depth. */
  private def genExpr(depth: Int): Expr = {
    val leafChoices = Seq(
      () => Ident("x"),
      () => IntLit(rnd.between(-20L, 20L)),
      () => FloatLit(math.rint(rnd.between(-20.0, 20.0) * 4) / 4))
    if (depth == 0) leafChoices(rnd.nextInt(leafChoices.size))()
    else rnd.nextInt(15) match {
      case 0 | 1 | 2 | 3 =>
        val op = Seq("+", "-", "*", "/")(rnd.nextInt(4))
        Binary(op, genExpr(depth - 1), genExpr(depth - 1))
      case 4 => Unary("-", genExpr(depth - 1))
      case 5 => Call("abs", List(genExpr(depth - 1)))
      case 6 => Call("max", List(genExpr(depth - 1), genExpr(depth - 1)))
      case 7 => Call("min", List(genExpr(depth - 1), genExpr(depth - 1)))
      case 8 => Call("floor", List(genExpr(depth - 1)))
      case 9 => Call("ceil", List(genExpr(depth - 1)))
      case 10 => Call("round", List(genExpr(depth - 1)))
      // sqrt/ln of negatives and exp overflow exercise the NaN/±Inf paths
      // where ANSI-mode divergences between the two engines would hide
      case 11 => Call("sqrt", List(genExpr(depth - 1)))
      case 12 => Call("ln", List(genExpr(depth - 1)))
      case 13 => Call("exp", List(genExpr(depth - 1)))
      case 14 => Call("pow", List(genExpr(depth - 1), IntLit(rnd.between(0L, 4L))))
    }
  }

  private def renderExpr(e: Expr): String = e match {
    case IntLit(v) => if (v < 0) s"(0 - ${-v})" else v.toString
    case FloatLit(v) => if (v < 0) s"(0.0 - ${-v})" else v.toString
    case Ident(n) => n
    case Unary(op, x) => s"$op(${renderExpr(x)})"
    case Binary(op, l, r) => s"(${renderExpr(l)} $op ${renderExpr(r)})"
    case Call(n, args) => s"$n(${args.map(renderExpr).mkString(", ")})"
    case KeySub(x, k) => s"""${renderExpr(x)}["$k"]"""
    case other => throw new IllegalArgumentException(other.toString)
  }

  private val inputs = Seq(-7.5, -1.0, 0.0, 0.25, 3.0, 42.0)

  private lazy val engine: FossilEngine = {
    val df = inputs.zipWithIndex.map { case (v, i) =>
      (Timestamp.valueOf(f"2024-01-01 00:00:${i}%02d"), "/x", v)
    }.toDF("time", "topic", "value")
    val c = new Catalog; c.createDdl("/x", "float64")
    FossilEngine.over(df, c, () => 1735689600L * 1000000000L)
  }

  test("compiled and interpreted expression results agree on 150 random exprs") {
    var checked = 0
    (1 to 150 * fuzzMult).foreach { i =>
      val ast = genExpr(depth = 3)
      val fql = s"all in /x | map x -> ${renderExpr(ast)}"
      // interpreter results per input (skip exprs whose interpretation
      // errors, e.g. division is fine — doubles — but keep guard anyway)
      val expected =
        try Some(inputs.map(v => Eval.eval(ast, Map("x" -> v))))
        catch { case _: Exception => None }
      expected.foreach { exp =>
        val got = engine.query(fql).orderBy("time")
          .select(col("value")).collect().map(_.get(0)).toSeq
        val expNorm = exp.map {
          case l: Long => l.toDouble
          case d: Double => d
          case other => other
        }
        val gotNorm = got.map {
          case l: Long => l.toDouble
          case d: Double => d
          case other => other
        }
        assert(gotNorm.size == expNorm.size, s"row count for: $fql")
        gotNorm.zip(expNorm).foreach { case (g, e) =>
          (g, e) match {
            case (gd: Double, ed: Double) =>
              val same = (gd.isNaN && ed.isNaN) || gd == ed
              assert(same, s"mismatch for: $fql  got=$gd expected=$ed")
            case _ => assert(g == e, s"mismatch for: $fql  got=$g expected=$e")
          }
        }
        checked += 1
      }
    }
    assert(checked >= 140 * fuzzMult) // nearly all generated exprs must be evaluable
  }

  test("compiled and interpreted filter predicates agree on 60 random comparisons") {
    var checked = 0
    (1 to 60 * fuzzMult).foreach { _ =>
      val cmp = Seq("<", "<=", ">", ">=", "==", "!=")(rnd.nextInt(6))
      val pred = Binary(cmp, genExpr(2), genExpr(2))
      val fql = s"all in /x | filter x -> ${renderExpr(pred)}"
      val expected =
        try Some(inputs.filter(v => Eval.eval(pred, Map("x" -> v)) == true))
        catch { case _: Exception => None }
      expected.foreach { exp =>
        val got = engine.query(fql).orderBy("time")
          .select(col("value")).as[Double].collect().toSeq
        assert(got == exp, s"filter mismatch for: $fql  got=$got expected=$exp")
        checked += 1
      }
    }
    assert(checked >= 55 * fuzzMult)
  }

  test("compiled and interpreted two-stage tuple pipelines agree on 40 random cases") {
    var checked = 0
    (1 to 40 * fuzzMult).foreach { _ =>
      val e1 = genExpr(2)
      val e2 = genExpr(2)
      // second stage over bound tuple elements a, b
      def genStage2(depth: Int): Expr =
        if (depth == 0) Seq(Ident("a"), Ident("b"))(rnd.nextInt(2))
        else rnd.nextInt(4) match {
          case 0 | 1 => Binary(Seq("+", "-", "*", "/")(rnd.nextInt(4)),
            genStage2(depth - 1), genStage2(depth - 1))
          case 2 => Call("abs", List(genStage2(depth - 1)))
          case 3 => IntLit(rnd.between(1L, 9L))
        }
      val e3 = genStage2(2)
      val fql = s"all in /x | map x -> ${renderExpr(e1)}, ${renderExpr(e2)}" +
        s" | map a, b -> ${renderExpr(e3)}"
      val expected = try Some(inputs.map { v =>
        val t = Eval.evalOut(OutTuple(List(e1, e2)), Map("x" -> v)).asInstanceOf[Seq[Any]]
        Eval.eval(e3, Map("a" -> t(0), "b" -> t(1)))
      }) catch { case _: Exception => None }
      expected.foreach { exp =>
        val got = engine.query(fql).orderBy("time")
          .select(col("value")).collect().map(_.get(0)).toSeq
        def norm(x: Any): Any = x match { case l: Long => l.toDouble; case o => o }
        got.map(norm).zip(exp.map(norm)).foreach { case (g, e) =>
          (g, e) match {
            case (gd: Double, ed: Double) =>
              assert((gd.isNaN && ed.isNaN) || gd == ed,
                s"pipeline mismatch for: $fql  got=$gd expected=$ed")
            case _ => assert(g == e, s"pipeline mismatch for: $fql  got=$g expected=$e")
          }
        }
        checked += 1
      }
    }
    assert(checked >= 35 * fuzzMult)
  }

  test("compiled and interpreted composite pipelines agree on 30 random cases") {
    var checked = 0
    (1 to 30 * fuzzMult).foreach { _ =>
      val e1 = genExpr(2)
      val e2 = genExpr(2)
      // second stage: arithmetic over the composite's members by key
      def genStage2(depth: Int): Expr =
        if (depth == 0) Seq(KeySub(Ident("m"), "p"), KeySub(Ident("m"), "q"))(rnd.nextInt(2))
        else rnd.nextInt(4) match {
          case 0 | 1 => Binary(Seq("+", "-", "*", "/")(rnd.nextInt(4)),
            genStage2(depth - 1), genStage2(depth - 1))
          case 2 => Call("abs", List(genStage2(depth - 1)))
          case 3 => FloatLit(rnd.between(1L, 9L).toDouble)
        }
      val e3 = genStage2(2)
      val fql = s"""all in /x | map x -> "p": ${renderExpr(e1)}, "q": ${renderExpr(e2)}""" +
        s" | map m -> ${renderExpr(e3)}"
      val expected = try Some(inputs.map { v =>
        val m = Eval.evalOut(OutComposite(List("p" -> e1, "q" -> e2)), Map("x" -> v))
          .asInstanceOf[Map[String, Any]]
        Eval.eval(e3, Map("m" -> m))
      }) catch { case _: Exception => None }
      expected.foreach { exp =>
        val got = engine.query(fql).orderBy("time")
          .select(col("value")).collect().map(_.get(0)).toSeq
        def norm(x: Any): Any = x match { case l: Long => l.toDouble; case o => o }
        got.map(norm).zip(exp.map(norm)).foreach { case (g, e) =>
          (g, e) match {
            case (gd: Double, ed: Double) =>
              assert((gd.isNaN && ed.isNaN) || gd == ed,
                s"composite mismatch for: $fql  got=$gd expected=$ed")
            case _ => assert(g == e, s"composite mismatch for: $fql  got=$g expected=$e")
          }
        }
        checked += 1
      }
    }
    assert(checked >= 25 * fuzzMult)
  }

  test("compiled and interpreted reduce folds agree") {
    (1 to 20 * fuzzMult).foreach { _ =>
      val body = Binary(Seq("+", "*")(rnd.nextInt(2)),
        Ident("a"), Ident("b"))
      val fql = s"all in /x | map x -> x - 1 | reduce a, b -> ${renderExpr(body)}"
      val mapped = inputs.map(_ - 1.0)
      // inputs are dyadic rationals in a tight range, so + and * are exact
      // and order-independent — comparable against Spark's agg ordering
      val expected = mapped.reduce((x, y) =>
        Eval.evalOut(OutExpr(body), Map("a" -> x, "b" -> y)).asInstanceOf[Double])
      val got = engine.query(fql).select("value").as[Double].head()
      assert(got == expected, s"reduce mismatch for: $fql")
    }
  }

  test("compiled and interpreted string ==/!= filters agree across both paths") {
    // the reference's one tested type-checker regression is string equality
    // (pkg/query/analysis/types_test.go:12-34); this pins the dual-path
    // contract on strings: empty strings, case sensitivity, absent values,
    // and both orientations (ident-literal and literal-ident)
    val vals = Seq("en", "de", "fr", "", "EN", "zh", "en")
    val df = vals.zipWithIndex.map { case (v, i) =>
      (Timestamp.valueOf(f"2024-01-01 00:00:${i}%02d"), "/s", v)
    }.toDF("time", "topic", "value")
    val c = new Catalog; c.createDdl("/s", "string")
    val strEngine = FossilEngine.over(df, c, () => 1735689600L * 1000000000L)
    for {
      lit <- Seq("en", "de", "", "nope", "EN")
      op <- Seq("==", "!=")
      flipped <- Seq(false, true)
    } {
      val pred =
        if (flipped) Binary(op, StringLit(lit), Ident("t"))
        else Binary(op, Ident("t"), StringLit(lit))
      val fql = s"""all in /s | filter t -> ${
        if (flipped) s""""$lit" $op t""" else s"""t $op "$lit""""}"""
      val expected = vals.filter(v => Eval.eval(pred, Map("t" -> v)) == true)
      val got = strEngine.query(fql).orderBy("time")
        .select(col("value")).as[String].collect().toSeq
      assert(got.sorted == expected.sorted, s"string filter mismatch for: $fql")
    }
  }
}
