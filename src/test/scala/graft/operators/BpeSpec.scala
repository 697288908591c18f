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
}
