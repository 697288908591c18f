package graft.operators

import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join, spreads hot key over buckets") {
    val probe = (Seq.fill(500)(("hot", 1)) ++ Seq(("a", 2), ("b", 3)))
      .toDF("k", "v")
    val build = Seq(("hot", 10), ("a", 20), ("c", 30)).toDF("k", "w")

    val salted = SkewJoin.saltedInner(probe, build, "k", buckets = 8)
    val plain = probe.join(build, Seq("k"))
    assert(salted.count() == plain.count())
    assert(salted.select("k", "v", "w").as[(String, Int, Int)].collect().sorted.toSeq ==
      plain.select("k", "v", "w").as[(String, Int, Int)].collect().sorted.toSeq)
    // determinism: same result on re-run (salt is content-derived, not rand())
    assert(SkewJoin.saltedInner(probe, build, "k", buckets = 8).count() == plain.count())
  }
}
