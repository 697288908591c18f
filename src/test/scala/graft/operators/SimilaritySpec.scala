package graft.operators

import graft.SparkSpec

/** Embedding similarity on hand-checkable vectors. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // unit-ish vectors: 1≈2 (near dup), 3 orthogonal-ish, 4 = -1
  private val vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f)),
    (2L, Array(0.99f, 0.1f, 0.0f)),
    (3L, Array(0.0f, 1.0f, 0.0f)),
    (4L, Array(-1.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("nearDupPairs finds only the high-cosine pair") {
    val pairs = Similarity.nearDupPairs(vecs, "vec_id", "embedding", minCosineE6 = 900000)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("bruteForceTopK ranks by cosine desc with id tie-break, excludes self") {
    val out = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 1L),
      "vec_id", "embedding", k = 3)
      .select("rank", "id").as[(Int, Long)].collect().toSeq
    assert(out.sortBy(_._1).map(_._2) == Seq(2L, 3L, 4L))
  }

  test("ivfTopK probes the query's bucket") {
    // centroids = vectors 1 and 3 → bucket{1}: {1,2,4?}; 4 is closer to 3? no: cos(4,1)=-1, cos(4,3)=0 → bucket 3
    val out = Similarity.ivfTopK(vecs, vecs.filter($"vec_id" === 2L),
      vecs.filter($"vec_id" === 1L || $"vec_id" === 3L),
      "vec_id", "embedding", "vec_id", k = 2)
      .select("rank", "id").as[(Int, Long)].collect().toSeq.sortBy(_._1)
    assert(out.map(_._2).head == 1L) // nearest in own bucket
  }

  test("quantizeInt8: range bounded, dequantization error within half a step") {
    val out = Similarity.quantizeInt8(vecs, "vec_id", "embedding")
      .as[(Long, Long, Int, Int)].collect()
    assert(out.forall { case (_, _, _, q) => q >= -127 && q <= 127 })
    val orig = vecs.as[(Long, Array[Float])].collect().toMap
    out.foreach { case (id, scaleE6, i, q) =>
      val x = orig(id)(i).toDouble
      val dequant = q * 1e6 / scaleE6
      assert(math.abs(dequant - x) <= 0.5 * 1e6 / scaleE6 + 1e-9)
    }
  }

  test("cosineE6 is exact integer micro-units") {
    val df = Seq((Array(1.0f, 0.0f), Array(1.0f, 0.0f))).toDF("a", "b")
    val v = df.select(Similarity.cosineE6($"a", $"b")).as[Long].head()
    assert(v == 1000000L)
  }
}
