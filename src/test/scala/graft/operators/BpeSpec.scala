package graft.operators

import scala.collection.mutable

import graft.SparkSpec

/** Pins the merge-table BPE semantics the text_tokens_bpe / pack_bpe
  * oracles depend on: pre-tokenizer alternation order, the left-to-right
  * skip-after-merge loop, lossless round-trips, and fixture invariants.
  * The cross-engine check (Scala vs the Python replica in
  * scripts/gen_bpe_fixture.py) happens at the driver gate on real data;
  * here we pin the in-JVM behavior on adversarial strings.
  */
class BpeSpec extends SparkSpec {

  test("pre-tokenizer matches GPT-2 alternation semantics") {
    // contraction beats symbol-run; leading space owned by the word run
    assert(Bpe.pretokenize("it's fine") == Vector("it", "'s", " fine"))
    assert(Bpe.pretokenize("we'll we've I'd") ==
      Vector("we", "'ll", " we", "'ve", " I", "'d"))
    // non-contraction apostrophe falls through to the symbol class
    assert(Bpe.pretokenize("rock'n") == Vector("rock", "'", "n"))
    // digits and symbols get their own optionally-space-prefixed runs
    assert(Bpe.pretokenize("a 42 +!") == Vector("a", " 42", " +!"))
    // interior multi-space: the whole run is one ws token (the real GPT-2
    // `\s+(?!\S)` lookahead is deliberately dropped — documented on BpeRe)
    assert(Bpe.pretokenize("a   b") == Vector("a", "   ", "b"))
    // tabs/newlines are ws runs; empty text yields nothing
    assert(Bpe.pretokenize("x\t\ny") == Vector("x", "\t\n", "y"))
    assert(Bpe.pretokenize("") == Vector())
  }

  test("pre-tokenization is lossless (concat == input)") {
    for (t <- Seq("it's  a test 123, ok?", " lead", "trail ", "a b",
        "mixed 'll'x +1-2", "\t \n")) {
      assert(Bpe.pretokenize(t).mkString == t, s"lossy on ${t.replace("\n", "\\n")}")
    }
  }

  test("merge loop: lowest rank first, left-to-right, skip-after-merge") {
    val ranks = Map(("a", "a") -> 0, ("b", "c") -> 1, ("aa", "b") -> 2)
    // overlapping self-pair merges greedily left-to-right: aaa -> [aa, a]
    assert(Bpe.encode("aaa", ranks) == Vector("aa", "a"))
    // rank order decides: (a,a) fires first, then (b,c)=1 beats (aa,b)=2
    assert(Bpe.encode("aabc", ranks) == Vector("aa", "bc"))
    // no applicable merges: stays chars
    assert(Bpe.encode("xyz", ranks) == Vector("x", "y", "z"))
    assert(Bpe.encode("", ranks) == Vector())
    assert(Bpe.encode("q", ranks) == Vector("q"))
  }

  test("encoding is lossless under the fixture table") {
    val ranks = Bpe.mergeRanks
    assert(ranks.nonEmpty && ranks.values.toSeq.distinct.size == ranks.size)
    for (pre <- Seq(" the", " scan", " batch", "'s", " 123", "window")) {
      assert(Bpe.encode(pre, ranks).mkString == pre)
    }
  }

  test("countTokens: bpe count never exceeds chars, never below pre-tokens") {
    val memo = mutable.HashMap.empty[String, Int]
    for (t <- Seq("the fast key order sort table scan", "a b c", "", "it's")) {
      val (nPre, nBpe) = Bpe.countTokens(t, Bpe.mergeRanks, memo)
      assert(nPre == Bpe.pretokenize(t).length)
      assert(nBpe >= nPre)
      assert(nBpe <= t.length.max(1) || t.isEmpty)
    }
  }

  test("tokenCounts DataFrame matches the scalar path") {
    import spark.implicits._
    val docs = Seq((1L, "the fast key order"), (2L, "it's  a test"), (3L, ""))
      .toDF("doc_id", "text")
    val got = Bpe.tokenCounts(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val memo = mutable.HashMap.empty[String, Int]
    val want = Seq((1L, "the fast key order"), (2L, "it's  a test"), (3L, ""))
      .map { case (id, t) =>
        val (p, b) = Bpe.countTokens(t, Bpe.mergeRanks, memo); (id, p, b)
      }
    assert(got.toSeq == want)
  }

  test("trainMerges reproduces the independent Python replica's fixture bit-for-bit") {
    // the strongest cross-implementation check available: the committed
    // merge table was trained by scripts/gen_bpe_fixture.py (a from-scratch
    // Python replica) over the sf0.001 corpus; the in-engine trainer must
    // derive the IDENTICAL 384 merges in the identical order
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val trained = Bpe.trainMerges(docs, "text", numMerges = 384)
    val fixture = Bpe.mergeRanks.toSeq.sortBy(_._2).map(_._1)
    assert(trained.size == fixture.size)
    assert(trained == fixture)
  }

  test("trainMergesLocal: frequency weighting, lexicographic ties, stop below 2") {
    // "ab" ×3 vs "cd" ×3: tie on count → ('a','b') < ('c','d') merges first
    val m1 = Bpe.trainMergesLocal(Seq(("ab", 3L), ("cd", 3L)), numMerges = 10)
    assert(m1 == Seq(("a", "b"), ("c", "d")))
    // a pair seen only once never merges (the replica's < 2 stop)
    assert(Bpe.trainMergesLocal(Seq(("xy", 1L)), numMerges = 10).isEmpty)
    // weighting: "zz" ×5 beats "ab" ×2 despite lexicographic order
    val m2 = Bpe.trainMergesLocal(Seq(("zz", 5L), ("ab", 2L)), numMerges = 1)
    assert(m2 == Seq(("z", "z")))
  }

  test("tokenCountsWith on a trained table equals the fixture path when tables agree") {
    import spark.implicits._
    val docs = Seq((1L, "the fast key order the fast"), (2L, "a key a key"))
      .toDF("doc_id", "text")
    val viaFixture = Bpe.tokenCounts(docs, "doc_id", "text").collect().toSeq
    val viaWith = Bpe.tokenCountsWith(docs, "doc_id", "text", Bpe.mergeRanks)
      .collect().toSeq
    assert(viaFixture == viaWith)
  }
}
