package graft.operators

import java.net.URLDecoder
import java.util.regex.Pattern

import scala.collection.mutable
import scala.io.Source

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Merge-table BPE tokenization — the real merge loop on top of the GPT-2
  * pre-tokenizer pattern [[TextAnalysis.BpeRe]], so token budgets (and
  * [[Curation.packSequences]] packing) can run on TRUE token counts rather
  * than the pre-tokenizer approximation.
  *
  * The merge table is a committed fixture (`graft/bpe_merges.txt`, trained
  * by `scripts/gen_bpe_fixture.py` over the sf0.001 corpus — GPT-2-style
  * character-level merges that never cross pre-token boundaries, leading
  * space owned by the token). In production the same loader would read the
  * published merges of whatever tokenizer the model trains with; the
  * algorithm and the Spark plumbing are tokenizer-agnostic.
  *
  * Scale: tokenization is a per-row narrow `mapPartitions` — no shuffle —
  * with the merge-rank table shipped once per executor as a broadcast
  * (bounded: vocab-sized, not corpus-sized) and a per-partition memo of
  * pre-token → token count (natural-language pre-token vocab follows a
  * Zipf law, so the memo hit rate climbs with partition size). This is the
  * documented exception to the no-mapPartitions rule: an iterative
  * data-dependent merge loop has no Catalyst-expression form.
  *
  * Oracle story: cross-engine BPE in SQL is impractical, so the driver's
  * oracle joins documents to `graft/bpe_counts.parquet` — counts computed
  * by the INDEPENDENT Python replica in `scripts/gen_bpe_fixture.py` —
  * keyed by md5(text). Any Scala/Python divergence on real data fails the
  * hash compare; BpeSpec additionally pins the merge-loop semantics
  * in-JVM on adversarial strings.
  */
object Bpe {

  private val Pre = Pattern.compile(TextAnalysis.BpeRe)

  /** (left, right) → rank; lower rank merges first. */
  lazy val mergeRanks: Map[(String, String), Int] = loadMerges()

  private def loadMerges(): Map[(String, String), Int] = {
    val in = getClass.getResourceAsStream("/graft/bpe_merges.txt")
    require(in != null, "bpe_merges.txt fixture missing from resources")
    try Source.fromInputStream(in, "UTF-8").getLines().zipWithIndex.map {
      case (line, rank) =>
        val Array(a, b) = line.split(" ", 2)
        (URLDecoder.decode(a, "UTF-8"), URLDecoder.decode(b, "UTF-8")) -> rank
    }.toMap
    finally in.close()
  }

  /** GPT-2-style pre-tokens of `text` (leftmost-first alternation). */
  def pretokenize(text: String): Vector[String] = {
    val m = Pre.matcher(text)
    val out = Vector.newBuilder[String]
    while (m.find()) out += m.group()
    out.result()
  }

  /** One pre-token → its BPE pieces: repeatedly merge the lowest-rank
    * adjacent pair (left-to-right, skip-after-merge) until none remains. */
  def encode(pre: String, ranks: Map[(String, String), Int]): Vector[String] = {
    var parts = pre.map(_.toString).toVector
    var done = parts.length < 2
    while (!done) {
      val cand = parts.indices.dropRight(1).flatMap { i =>
        val p = (parts(i), parts(i + 1)); ranks.get(p).map(r => (r, p))
      }
      if (cand.isEmpty) done = true
      else {
        parts = mergeOnce(parts, cand.minBy(_._1)._2)
        done = parts.length < 2
      }
    }
    parts
  }

  /** Full-document token count under the merge table. */
  def countTokens(text: String, ranks: Map[(String, String), Int],
      memo: mutable.HashMap[String, Int]): (Long, Long) = {
    val pres = pretokenize(text)
    var n = 0L
    pres.foreach { p =>
      n += memo.getOrElseUpdate(p, encode(p, ranks).length)
    }
    (pres.length.toLong, n)
  }

  /** One left-to-right pass merging every occurrence of `pair`
    * (skip-after-merge, GPT-2 semantics — shared by [[encode]]'s inner
    * loop and the trainer). */
  private def mergeOnce(parts: Vector[String], pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < parts.length) {
      if (i + 1 < parts.length && (parts(i), parts(i + 1)) == pair) {
        out += parts(i) + parts(i + 1); i += 2
      } else { out += parts(i); i += 1 }
    }
    out.result()
  }

  /** Train a GPT-2-style merge table IN-ENGINE — the tokenizer-training
    * story at corpus scale. The only stage that grows with the data is the
    * pre-token frequency histogram: a narrow per-partition pretokenize
    * flatMap plus ONE partial-aggregated hash count on the pre-token (the
    * classic BPE-trainer design: all merge decisions are functions of the
    * word-frequency table, never the raw corpus). The merge loop itself
    * runs on that vocab-bounded table on the driver — Zipf-bounded by
    * nature, hard-capped by `maxDistinctPretokens` with deterministic
    * (count desc, token asc) truncation that keeps the frequency mass.
    *
    * Exactness: the loop is the same algorithm as the INDEPENDENT Python
    * replica in `scripts/gen_bpe_fixture.py` (pair counts weighted by word
    * frequency; best = max count with ties to the lexicographically
    * smallest pair; stop when the best pair occurs < 2 times) — BpeSpec
    * asserts the trained table reproduces the committed fixture merges
    * bit-for-bit on the same corpus. (Tie comparison is UTF-16 code-unit
    * order; it coincides with the replica's code-point order for all BMP
    * text.) Feed the result to [[tokenCountsWith]] and the oracle-paired
    * counting path is unchanged. */
  def trainMerges(docs: DataFrame, textCol: String, numMerges: Int,
      maxDistinctPretokens: Int = 2000000): Seq[(String, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val freq = docs.select(col(textCol).cast("string").as("t")).as[String]
      .mapPartitions(it => it.flatMap(t => pretokenize(if (t == null) "" else t)))
      .groupBy("value").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("value").asc)
      .limit(maxDistinctPretokens)
      .as[(String, Long)].collect()
    trainMergesLocal(freq.toSeq, numMerges)
  }

  /** The bounded merge loop (see [[trainMerges]]); exposed for spec-level
    * pinning on hand-built frequency tables. */
  def trainMergesLocal(freq: Seq[(String, Long)],
      numMerges: Int): Seq[(String, String)] = {
    var words: Vector[(Vector[String], Long)] =
      freq.iterator.map { case (w, f) => (w.map(_.toString).toVector, f) }.toVector
    val merges = Vector.newBuilder[(String, String)]
    var round = 0
    var done = false
    val pairOrd = Ordering.Tuple2(Ordering.String, Ordering.String)
    while (round < numMerges && !done) {
      val pairs = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (parts, f) =>
        var i = 0
        while (i + 1 < parts.length) {
          val p = (parts(i), parts(i + 1))
          pairs.update(p, pairs.getOrElse(p, 0L) + f)
          i += 1
        }
      }
      if (pairs.isEmpty) done = true
      else {
        // max count, ties to the lexicographically smallest pair — the
        // replica's min over (-count, pair)
        val best = pairs.iterator.reduce { (x, y) =>
          if (y._2 > x._2 || (y._2 == x._2 && pairOrd.lt(y._1, x._1))) y else x
        }
        if (best._2 < 2) done = true
        else {
          merges += best._1
          words = words.map { case (parts, f) => (mergeOnce(parts, best._1), f) }
          round += 1
        }
      }
    }
    merges.result()
  }

  /** [[tokenCounts]] against an ARBITRARY merge table — trained via
    * [[trainMerges]] or loaded from a published tokenizer — so training
    * composes into the same oracle-paired counting plan unchanged. */
  def tokenCountsWith(docs: DataFrame, idCol: String, textCol: String,
      ranks: Map[(String, String), Int]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(ranks)
    docs
      .select(col(idCol).cast("long").as("id"), col(textCol).cast("string").as("t"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val ranks = bc.value
        val memo = mutable.HashMap.empty[String, Int]
        it.map { case (id, t) =>
          val (nPre, nBpe) = countTokens(if (t == null) "" else t, ranks, memo)
          (id, nPre, nBpe)
        }
      }
      .toDF("id", "n_pre_tokens", "n_bpe_tokens")
  }

  /** Per-document true token counts under the fixture merge table:
    * `(id, n_pre_tokens, n_bpe_tokens)`. Narrow mapPartitions, merge
    * table broadcast once per executor. */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    tokenCountsWith(docs, idCol, textCol, mergeRanks)
}
