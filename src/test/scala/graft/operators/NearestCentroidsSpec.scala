package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Differential fuzz of the row-local [[graft.functions.NearestCentroids]] kernel against
  * the Catalyst column formulation it replaced (broadcast-NLJ expand +
  * `row_number` window over `safeCosE6(graft_dot(...), ...)`): same
  * assignments, same e6 cosines, BIT-exact — including zero vectors,
  * empty arrays, nulls, length mismatches, and rounding-boundary ties.
  * The oracle rows (`ann_*`, `emb_*`) re-prove this end to end vs DuckDB;
  * this spec localises any drift to the kernel. */
class NearestCentroidsSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-r13 formulation, verbatim: the parity reference. */
  private def referenceAssign(
      df: DataFrame, cent: DataFrame, n: Int): DataFrame = {
    val scored = df
      .select(col("id"), col("vec").cast("array<double>").as("__v"))
      .withColumn("__n", Similarity.norm(col("__v")))
      .join(broadcast(cent), lit(true))
      .select(col("id"), col("cid"),
        Similarity.safeCosE6(Similarity.dot(col("__v"), col("cv")),
          col("__n"), col("cn")).as("cs_e6"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("cs_e6").desc, col("cid").asc)
    scored.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= n)
      .select(col("id"), col("cid"), col("cs_e6"))
  }

  private def kernelAssign(df: DataFrame, cent: DataFrame, n: Int): DataFrame =
    Similarity.assignBuckets(df, cent, "vec", "id", "cid", n)
      .select(col("id"), col("cid"), col("__cs").as("cs_e6"))

  private def centFrom(rows: Seq[(Long, Seq[Double])]): DataFrame =
    Similarity.centFrame(rows.toDF("cid", "cv"), "cid", "cv")

  private def assertSame(df: DataFrame, cent: DataFrame, n: Int): Unit = {
    val ref = referenceAssign(df, cent, n)
      .orderBy("id", "cs_e6", "cid").collect().toSeq
    val got = kernelAssign(df, cent, n)
      .orderBy("id", "cs_e6", "cid").collect().toSeq
    assert(got == ref)
  }

  test("fuzz: random vectors match the Catalyst reference bit-for-bit") {
    val rnd = new scala.util.Random(421301L)
    val dim = 7
    // adversarial value pool: exact halves and e6-boundary magnitudes to
    // exercise HALF_UP at the rounding cut, plus ordinary noise
    def v(): Seq[Double] = Seq.fill(dim)(rnd.nextInt(5) match {
      case 0 => 0.0
      case 1 => (rnd.nextInt(2000) - 1000) / 2000.0 // exact binary halves
      case 2 => rnd.nextGaussian()
      case 3 => rnd.nextInt(1000) * 1e-6
      case _ => rnd.nextDouble() * 2 - 1
    })
    val docs = (0L until 60L).map(i => (i, v())).toDF("id", "vec")
    val cents = centFrom((0L until 9L).map(i => (i * 11, v())))
    for (n <- Seq(1, 3, 20)) assertSame(docs, cents, n)
  }

  test("degenerate rows: zero vectors, empty arrays, nulls, length mismatch") {
    val docs = Seq[(Long, Seq[Double])](
      (1L, Seq(0.0, 0.0, 0.0)),        // zero norm -> cs 0, lowest cids
      (2L, Seq.empty[Double]),         // empty -> same
      (3L, Seq(1.0)),                  // shorter than centroids
      (4L, Seq(1.0, 2.0, 3.0, 4.0, 5.0)), // longer than centroids
      (5L, Seq(0.5, -0.5, 0.25))
    ).toDF("id", "vec")
      .union(Seq((6L, null.asInstanceOf[Seq[Double]])).toDF("id", "vec"))
    val cents = centFrom(Seq(
      (3L, Seq(1.0, 0.0, 0.0)), (1L, Seq(0.5, 0.5, 0.0)),
      (2L, Seq(0.0, 0.0, 0.0)) // zero-norm CENTROID: cs 0 to everything
    ))
    for (n <- Seq(1, 2, 5)) assertSame(docs, cents, n)
  }

  test("ties on equal cosine break by cid ascending") {
    // identical centroids under different cids: every cosine ties exactly
    val docs = Seq((1L, Seq(1.0, 2.0)), (2L, Seq(-1.0, 0.5))).toDF("id", "vec")
    val cents = centFrom(Seq((9L, Seq(1.0, 2.0)), (4L, Seq(1.0, 2.0)),
      (7L, Seq(1.0, 2.0))))
    assertSame(docs, cents, 2)
    val got = kernelAssign(docs, cents, 2).orderBy("id", "cid").collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 4L), (1L, 7L), (2L, 4L), (2L, 7L)))
  }

  test("n past the centroid count emits exactly k assignments per row") {
    val docs = Seq((1L, Seq(1.0, 0.0))).toDF("id", "vec")
    val cents = centFrom(Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0))))
    assert(kernelAssign(docs, cents, 10).count() == 2L)
    assertSame(docs, cents, 10)
  }

  test("a null centroid vector / cn / vector element fails NAMED at " +
      "plan-build, not with an unboxing NPE") {
    // engine-built centroid tables never carry nulls — a hand-rolled or
    // corrupt one must be rejected with a message, and the message must
    // name the offending cid when it is readable
    val docs = Seq((1L, Seq(1.0, 0.0))).toDF("id", "vec")
    val nullVec = Seq((1L, Seq(1.0, 0.0)), (2L, null.asInstanceOf[Seq[Double]]))
      .toDF("cid", "cv").withColumn("cn", lit(1.0))
    val e1 = intercept[IllegalArgumentException](
      Similarity.assignBuckets(docs, nullVec, "vec", "id", "cid", 1))
    assert(e1.getMessage.contains("null") && e1.getMessage.contains("cid=2"))
    val nullElem = Seq((1L, Seq[java.lang.Double](1.0, null)))
      .toDF("cid", "cv").withColumn("cn", lit(1.0))
    val e2 = intercept[IllegalArgumentException](
      Similarity.assignBuckets(docs, nullElem, "vec", "id", "cid", 1))
    assert(e2.getMessage.contains("vector element"))
    val nullCn = Seq((1L, Seq(1.0, 0.0))).toDF("cid", "cv")
      .withColumn("cn", lit(null).cast("double"))
    val e3 = intercept[IllegalArgumentException](
      Similarity.assignBuckets(docs, nullCn, "vec", "id", "cid", 1))
    assert(e3.getMessage.contains("null"))
  }

  test("the assignment plan has no join, no window, no exchange") {
    val docs = (0L until 20L).map(i => (i, Seq(i.toDouble, 1.0))).toDF("id", "vec")
    val cents = centFrom(Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0))))
    val plan = kernelAssign(docs, cents, 1).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("nearest_centroids"), plan)
  }
}
