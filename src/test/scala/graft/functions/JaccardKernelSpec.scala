package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Differential fuzz of the count-only [[JaccardE4]] kernel against the
  * Catalyst column formulation it replaced — the repo's convention for
  * any native twin of a column expression (see DifferentialSpec,
  * NearestCentroidsSpec): seeded random inputs, bit-equality demanded. */
class JaccardKernelSpec extends SparkSpec {
  import spark.implicits._

  private def columnForm(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val inter = size(array_intersect(a, b)).cast("long")
    val union = size(a).cast("long") + size(b).cast("long") - inter
    round(inter * lit(10000.0) / union, 0).cast("long")
  }

  test("kernel == column form on seeded random shingle-ish arrays, " +
      "including duplicates, null elements, and one-sided empties") {
    val rnd = new scala.util.Random(421501L)
    val vocab = (0 until 40).map(i => s"w$i")
    def arr(): Seq[String] = {
      val n = rnd.nextInt(30) + 1 // ≥ 1: two empties is the ANSI-throw case
      Seq.fill(n)(
        if (rnd.nextInt(20) == 0) null else vocab(rnd.nextInt(vocab.size)))
    }
    val rows = (0 until 400).map(_ => (arr(), arr())) :+
      ((Seq.empty[String], Seq("w1", "w2"))) :+ // one-sided empty: j = 0
      ((Seq("w1", null), Seq(null, "w3"))) // null in both: intersects once
    val df = rows.toDF("a", "b")
    val out = df.select(
      JaccardE4(col("a"), col("b")).as("k"),
      columnForm(col("a"), col("b")).as("c"))
    assert(out.filter(col("k") =!= col("c")).count() == 0)
    assert(out.filter(col("k").isNull =!= col("c").isNull).count() == 0)
  }

  test("hashed sorted-merge twin == string kernel on seeded random arrays") {
    // the r16 verify path: row-local sorted xxhash64 arrays + merge count.
    // Identical to the string kernel absent 64-bit collisions — none occur
    // at fuzz scale, so bit-equality is demanded (duplicates included:
    // numElements parity keeps the union arithmetic aligned with size())
    val rnd = new scala.util.Random(421601L)
    val vocab = (0 until 40).map(i => s"w$i")
    def arr(): Seq[String] = Seq.fill(rnd.nextInt(30) + 1)(vocab(rnd.nextInt(vocab.size)))
    val rows = (0 until 400).map(_ => (arr(), arr())) :+
      ((Seq.empty[String], Seq("w1", "w2"))) // one-sided empty: j = 0
    val df = rows.toDF("a", "b")
    val out = df.select(
      JaccardE4Sorted(HashedSortedShingles(col("a")),
        HashedSortedShingles(col("b"))).as("h"),
      JaccardE4(col("a"), col("b")).as("k"))
    assert(out.filter(col("h") =!= col("k")).count() == 0)
  }

  test("hashed twin: null element rejected; two empties throw like ANSI") {
    val boomNull = intercept[Exception] {
      Seq((Seq("x", null), Seq("x"))).toDF("a", "b")
        .select(JaccardE4Sorted(HashedSortedShingles(col("a")),
          HashedSortedShingles(col("b")))).collect()
    }
    assert(boomNull.toString.contains("null element") ||
      Option(boomNull.getCause).exists(_.toString.contains("null element")))
    val boomEmpty = intercept[Exception] {
      Seq((Seq.empty[String], Seq.empty[String])).toDF("a", "b")
        .select(JaccardE4Sorted(HashedSortedShingles(col("a")),
          HashedSortedShingles(col("b")))).collect()
    }
    assert(boomEmpty.toString.contains("ArithmeticException") ||
      boomEmpty.getCause != null)
  }

  test("null inputs null out; two empty arrays throw like ANSI division") {
    val df = Seq((Some(Seq("x")), Option.empty[Seq[String]])).toDF("a", "b")
    assert(df.select(JaccardE4(col("a"), col("b"))).head().isNullAt(0))
    val boom = intercept[Exception] {
      Seq((Seq.empty[String], Seq.empty[String])).toDF("a", "b")
        .select(JaccardE4(col("a"), col("b"))).collect()
    }
    assert(boom.toString.contains("ArithmeticException") ||
      boom.getCause != null)
  }
}
