package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a production training-data pipeline runs
  * between "raw crawl" and "training shards": eval-set decontamination,
  * repetition-based quality rules (Gopher-style), mixture resampling with
  * upsampling, fixed-token-budget sequence packing, and the deterministic
  * global shuffle that writes the final shards.
  *
  * The reference engine has no document-curation surface (its pipeline
  * operators are `filter|map|reduce|sample`, `docs/grammar.md`); this file
  * is a SURVEY §2.5 training-pipeline extension, same contract as
  * [[Sampling]] / [[Dedup]]: pure codegen'd expressions (no UDFs), every
  * hash rooted in md5 (directly, or through the [[TextOps.hashConstants]]
  * universal family over an md5 prefix) so every operator has an exact
  * DuckDB oracle twin, ratios surfaced as `*_e4` integers, deterministic
  * output orders.
  */
object Curation {

  /** Train-side docs sharing at least one k-word shingle with the eval
    * corpus: `(id, hits)` where hits = number of DISTINCT contaminated
    * shingles in the doc. The membership test an LLM pipeline runs before
    * training to keep benchmark text out of the train set.
    *
    * Scale: eval is benchmark data — thousands of docs against a ~100 TB
    * train corpus — so its distinct-shingle set is tiny and the join is a
    * classic broadcast: AQE sizes it (no forced hint — an adversarially
    * large eval set degrades to a shuffled equi-join instead of an OOM).
    * The train side explodes to (id, shingle-md5) pairs — fixed-width
    * 32-char keys, no text through the shuffle — and aggregates hits by
    * id. No self-join anywhere; cost is linear in train shingle count.
    */
  def contaminationHits(
      train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, shingleWords: Int): DataFrame = {
    val evalSh = shingleHashes(eval, idCol, textCol, shingleWords)
      .select("sh_h").distinct()
    shingleHashes(train, idCol, textCol, shingleWords)
      .join(evalSh, "sh_h")
      .groupBy(idCol).agg(count(lit(1)).as("hits"))
  }

  /** (id, md5(shingle)) pairs — fixed-width 32-char keys so no document
    * text ever enters a shuffle. */
  private def shingleHashes(df: DataFrame, idCol: String, textCol: String,
      shingleWords: Int): DataFrame =
    df.select(col(idCol), TextOps.tokens(col(textCol)).as("toks"))
      .select(col(idCol),
        explode(TextOps.wordShingles(col("toks"), shingleWords)).as("sh"))
      .select(col(idCol), md5(col("sh")).as("sh_h"))

  /** [[contaminationHits]] with a Bloom-filter pre-filter on the train
    * side — the GPT-3/Pile-scale decontamination shape. Results are
    * IDENTICAL to [[contaminationHits]] (the sketch only pre-filters;
    * survivors are exact-verified by the same equi-join), but the plan
    * changes where it matters at 100 TB: the broadcast artifact is a
    * fixed-size bit array (`-n·ln(fpp)/ln2²` bits — ~1.2 MB at a million
    * eval shingles, fpp 1e-3) instead of the eval shingle set itself, and
    * the train→join shuffle carries only bloom-positive shingles
    * (true hits + fpp·volume) instead of EVERY train shingle. At crawl
    * scale where hit rates are ~1e-4, that is a ~1000× shuffle-volume
    * cut; the eval side never needs to fit in a driver Set (contrast
    * [[evalShingles]], which is bounded-by-construction broadcast).
    *
    * Build is distributed (partial sketches OR-merge in the aggregate);
    * the one driver-side object is the merged sketch, whose size is fixed
    * by `(n, fpp)` and independent of corpus size. Probe is Catalyst's
    * codegen'd `BloomFilterMightContain` — the same expression Spark's
    * injected runtime filters use — embedded as a binary literal. */
  def contaminationHitsBloom(
      train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, shingleWords: Int,
      fpp: Double = 0.001): DataFrame = {
    import graft.functions.BloomSketch
    val evalSh = shingleHashes(eval, idCol, textCol, shingleWords)
      .select("sh_h").distinct()
    // two eval-side actions (count, sketch build) — eval is the small
    // side by construction; both are full-parallel aggregates
    val n = math.max(evalSh.count(), 1L)
    val sketch = evalSh
      .agg(BloomSketch.bloomAgg(col("sh_h"), n, BloomSketch.optimalNumBits(n, fpp)))
      .head().getAs[Array[Byte]](0)
    shingleHashes(train, idCol, textCol, shingleWords)
      .filter(BloomSketch.mightContain(sketch, col("sh_h")))
      .join(evalSh, "sh_h") // exact verify: false positives die here
      .groupBy(idCol).agg(count(lit(1)).as("hits"))
  }

  /** Eval-side distinct raw shingles, driver-collected — the seam that
    * makes decontamination STREAM-composable. Safe by the same argument
    * that makes the batch join broadcast-shaped: the eval set is a
    * benchmark corpus, bounded by construction (never crawl-sized), so
    * its distinct-shingle set ships to every executor as one broadcast. */
  def evalShingles(
      eval: DataFrame, idCol: String, textCol: String,
      shingleWords: Int): Seq[String] =
    eval.select(col(idCol), TextOps.tokens(col(textCol)).as("toks"))
      .select(explode(TextOps.wordShingles(col("toks"), shingleWords)).as("sh"))
      .distinct()
      .collect().map(_.getString(0)).toSeq

  /** [[contaminationHits]] against a PRE-COLLECTED eval shingle set: a
    * per-row narrow mapPartitions (distinct shingles → O(1) lookups in
    * the broadcast set, built once per executor — NOT a literal-array
    * intersect, which re-hashes the eval set per row and turns linear
    * into n·|eval|), no join, no aggregation, no state — exactly the
    * shape Structured Streaming runs in append mode on a live crawl.
    * Counts are identical to the batch operator (both count DISTINCT
    * matching shingles per doc; raw-string equality ≡ the batch join's
    * md5 equality — the hash there exists only to keep shuffle keys
    * fixed-width, and this path never shuffles). */
  def contaminationHitsAgainst(
      train: DataFrame, idCol: String, textCol: String, shingleWords: Int,
      evalSet: Seq[String]): DataFrame = {
    val spark = train.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(evalSet.toSet)
    train
      .select(col(idCol).cast("long").as("id"), col(textCol).cast("string").as("t"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val set = bc.value
        it.flatMap { case (id, t) =>
          // mirrors TextOps.tokens/wordShingles: lowercase whitespace
          // tokens (trim is subsumed — empty tokens are dropped), distinct
          // k-word shingles joined by a single space
          val toks = (if (t == null) "" else t)
            .toLowerCase(java.util.Locale.ROOT)
            .split("\\s+").filter(_.nonEmpty)
          val n =
            if (toks.length < shingleWords) 0L
            else toks.sliding(shingleWords).map(_.mkString(" "))
              .toSet.count(set.contains).toLong
          if (n > 0) Some((id, n)) else None
        }
      }
      .toDF(idCol, "hits")
  }

  /** The decontaminated train corpus: input rows minus every doc flagged
    * by [[contaminationHits]]. Left-anti join on the id — the flagged set
    * is ≤ train row count and usually tiny, so AQE broadcasts it. */
  def decontaminate(
      train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, shingleWords: Int): DataFrame =
    train.join(
      contaminationHits(train, eval, idCol, textCol, shingleWords)
        .select(idCol),
      Seq(idCol), "left_anti")

  /** Gopher-style repetition/quality signals per doc (Rae et al. 2021,
    * "Scaling Language Models" §A1.1 — public paper, re-derived here):
    *   - `n_tokens`
    *   - `dup_word_e4`: 1 − distinct/total tokens (×10⁴) — word-level
    *     repetitiveness
    *   - `top_bigram_e4`: share of all bigram occurrences taken by the
    *     single most frequent bigram (×10⁴) — loop/boilerplate detector
    *   - `mean_word_len_e2`: mean token length (×10²)
    *   - `keep`: the composite rule (thresholds are the caller's contract,
    *     defaults mirror Gopher's 0.2 / 0.18 bands)
    *
    * Scale: per-row narrow map — the bigram histogram is built inside a
    * single higher-order-function chain over the row's own token array
    * (aggregate over a sorted bigram list), no explode, no shuffle.
    */
  def repetitionStats(
      docs: DataFrame, idCol: String, textCol: String,
      maxDupWordE4: Int = 2000, maxTopBigramE4: Int = 1800): DataFrame = {
    val toksDf = docs.select(col(idCol), TextOps.tokens(col(textCol)).as("toks"))
    // bigrams, sorted: equal bigrams become adjacent, so the longest run
    // length in the sorted list IS the max bigram frequency. aggregate()
    // carries (prev, run, best) through one pass — no map state needed.
    val bigrams = array_sort(
      when(size(col("toks")) < 2, array().cast("array<string>"))
        .otherwise(transform(
          sequence(lit(1), size(col("toks")) - lit(1)),
          i => concat_ws(" ", slice(col("toks"), i, lit(2))))))
    val maxRun = aggregate(
      col("bgs"),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, b) => {
        val run = when(b === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(b.as("prev"), run.as("run"),
          greatest(run, acc.getField("best")).as("best"))
      },
      acc => acc.getField("best"))
    def e4(num: Column, den: Column): Column =
      when(den === 0, lit(0L))
        .otherwise(round(num * 10000.0 / den)).cast("long")
    toksDf
      .withColumn("bgs", bigrams)
      .select(
        col(idCol),
        size(col("toks")).cast("long").as("n_tokens"),
        e4(size(col("toks")) - size(array_distinct(col("toks"))),
          size(col("toks"))).as("dup_word_e4"),
        e4(maxRun, size(col("bgs"))).as("top_bigram_e4"),
        when(size(col("toks")) === 0, lit(0L))
          .otherwise(round(
            aggregate(col("toks"), lit(0L), (a, t) => a + length(t)) * 100.0
              / size(col("toks")))).cast("long").as("mean_word_len_e2"))
      .withColumn("keep",
        (col("dup_word_e4") <= maxDupWordE4) &&
          (col("top_bigram_e4") <= maxTopBigramE4))
  }

  /** Mixture resampling: per-domain weights in parts-per-10⁴ that may
    * EXCEED 10⁴ — `weight 25000` = every doc appears twice plus a 50%
    * deterministic chance of a third copy (epochs 0,1[,2]). The op behind
    * "2 epochs of wiki, 0.3 of crawl" training mixes; downsampling is the
    * [[Sampling.stratified]] predicate, upsampling replicates rows with an
    * `epoch` index so downstream packing/shuffling treats copies as
    * distinct rows.
    *
    * Determinism: the fractional copy keeps iff the row's md5 bucket
    * < frac — same [[Sampling.bucketE4]] primitive, so engine-independent.
    * Scale: copies = explode of a row-local sequence — no shuffle, and the
    * blow-up factor is the mixture weight itself (what the user asked for).
    */
  def mixture(
      docs: DataFrame, idCol: String, domainCol: String,
      weightsE4: Map[String, Int], defaultE4: Int): DataFrame = {
    require((weightsE4.values ++ Seq(defaultE4)).forall(_ >= 0),
      s"weights are parts-per-10000, got ${weightsE4.values.toSeq :+ defaultE4}")
    val w = weightsE4.foldLeft(lit(defaultE4)) { case (acc, (k, v)) =>
      when(col(domainCol) === k, lit(v)).otherwise(acc)
    }
    val copies = (w / 10000).cast("long") +
      when(Sampling.bucketE4(col(idCol)) < w % 10000, 1L).otherwise(0L)
    docs
      .withColumn("__copies", copies)
      .filter(col("__copies") > 0)
      .withColumn("epoch",
        explode(sequence(lit(0L), col("__copies") - 1)))
      .drop("__copies")
  }

  /** Per-stratum TOKEN-budget selection — training mixes are specified in
    * tokens, not documents ("1M tokens of de, 250k of zh"): within each
    * stratum, docs are ranked by a deterministic md5 priority (pure
    * function of `salt|id` — reproducible on any engine / partitioning,
    * like [[Sampling.stratified]]) and kept while the running token total
    * stays AT OR UNDER the stratum's budget; the first doc that would
    * overflow is dropped, as is everything after it in priority order
    * (docs later in the order can be smaller, but a greedy prefix — not
    * best-fit packing — is the published mixture contract: the kept set
    * is a pure function of (corpus, budgets, salt), not of a packing
    * heuristic). Unlisted strata use `defaultBudget`; zero budgets a
    * stratum out entirely. Output: `(id, stratum, n_tokens, cum_tokens)`.
    *
    * Scale: one narrow token-count scan, then ONE window cumsum
    * hash-partitioned on the stratum — the same plan family as
    * [[packSequences]]; cost is a per-stratum sequential pass (inherent:
    * a prefix cut is sequential by definition) and strata counts are
    * bounded (languages / domains), so the job parallelizes across
    * strata. At extreme single-stratum skew, pre-filtering with an
    * approximate priority threshold (budget/mean-doc-tokens quantile)
    * bounds the window's input; not done here — the exact cut is the
    * contract. */
  def tokenBudget(
      docs: DataFrame, idCol: String, textCol: String, stratumCol: String,
      budgets: Map[String, Long], defaultBudget: Long,
      salt: String = "tb"): DataFrame = {
    require((budgets.values ++ Seq(defaultBudget)).forall(_ >= 0),
      s"budgets are token counts, got ${budgets.values.toSeq :+ defaultBudget}")
    val budget = budgets.foldLeft(lit(defaultBudget)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    val pri = md5(concat_ws("|", lit(salt), col(idCol).cast("string")))
    docs
      .select(col(idCol), col(stratumCol).as("stratum"),
        size(TextOps.tokens(col(textCol))).cast("long").as("n_tokens"),
        pri.as("__pri"))
      .withColumn("cum_tokens",
        sum(col("n_tokens")).over(
          Window.partitionBy("stratum").orderBy(col("__pri"), col(idCol))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      // n_tokens >= 0 makes the cumsum monotone, so `cum <= budget` is
      // prefix-closed on its own: the overflow doc and everything after
      // it (including zero-token docs, whose cum is unchanged) is cut
      .filter(col("cum_tokens") <= budget)
      .select(col(idCol), col("stratum"), col("n_tokens"), col("cum_tokens"))
  }

  /** Cluster-balanced mixture resampling — the embedding-space cousin of
    * [[mixture]] (the DoReMi / cluster-balancing shape): documents are
    * assigned to their nearest embedding centroid, each cluster gets a
    * resampling weight that moves the cluster-share distribution toward
    * UNIFORM (an n/k-doc target per cluster), and every doc replays the
    * deterministic per-copy predicate. Over-represented clusters
    * downsample (w < 1), tail clusters upsample (w > 1, capped at
    * `maxCopiesE4`/10⁴ copies so a tiny cluster cannot explode the
    * corpus).
    *
    * Exact-integer contract: w_e4 = (n·10⁴) div (k·n_c) — pure integer
    * arithmetic, so both engines agree bit-for-bit — and the copy
    * predicate is [[mixture]]'s: `w div 10⁴` whole copies plus one more
    * iff md5-bucket(id) < w mod 10⁴.
    *
    * Scale: one broadcast-centroid assignment scan (no corpus shuffle),
    * one k-row cluster-size agg, one AQE-broadcast join back, a row-local
    * copy explode. Centroids come from the caller — [[Similarity.kmeansCentroids]]
    * for trained buckets or any deterministic selection — so the
    * assignment geometry is shared with the IVF/SemDeDup index family.
    * Output: `(id, cid, w_e4, epoch)`. */
  def clusterBalance(
      vecs: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, centroidIdCol: String,
      maxCopiesE4: Long = 80000L): DataFrame = {
    require(maxCopiesE4 >= 10000L,
      s"maxCopiesE4 below 10000 would cap every cluster under one copy: $maxCopiesE4")
    val cent = Similarity.centFrame(centroids, centroidIdCol, vecCol)
    val assigned = OperatorCache.scoped(
      Similarity.assignBuckets(vecs, cent, vecCol, idCol, "cid", n = 1)
        .select(col(idCol).as("id"), col("cid")))
    val sizes = assigned.groupBy("cid").agg(count(lit(1)).as("n_c"))
    val totals = sizes.agg(sum(col("n_c")).as("n"), count(lit(1)).as("k"))
    assigned
      .join(sizes, Seq("cid")) // k rows — AQE broadcasts
      .crossJoin(broadcast(totals)) // 1 row
      .withColumn("w_e4",
        least(expr("(n * 10000) div (k * n_c)"), lit(maxCopiesE4)))
      .withColumn("__copies",
        expr("w_e4 div 10000") +
          when(Sampling.bucketE4(col("id")) < col("w_e4") % 10000, 1L)
            .otherwise(0L))
      .filter(col("__copies") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("__copies") - 1)))
      .select("id", "cid", "w_e4", "epoch")
  }

  /** Fixed-token-budget sequence packing at document granularity: docs are
    * concatenated in deterministic order and cut into training sequences
    * of ~`budgetTokens`, a doc starting a new sequence when the budget is
    * exceeded. Output: `(id, shard, seq_ix, tok_offset, n_tokens)` — the
    * exact (sequence, offset) every doc lands at, which is what a
    * tokenize-and-pack job materializes.
    *
    * Scale: ONE shuffle — hash-partition by shard, sort by id within. The
    * running token count is a window cumsum per shard; `numShards` bounds
    * each sort (pick shards ≫ executors so a shard's docs fit memory —
    * the same knob a shard-writing job already has). seq_ix is
    * `floor(preceding_tokens / budget)`: a pure function of the cumsum,
    * so packing never needs a second pass or driver state.
    */
  def packSequences(
      docs: DataFrame, idCol: String, textCol: String,
      budgetTokens: Int, numShards: Int): DataFrame =
    packSequencesCounted(
      docs.select(col(idCol),
        size(TextOps.tokens(col(textCol))).cast("long").as("n_tokens")),
      idCol, "n_tokens", budgetTokens, numShards)

  /** [[packSequences]] over PRECOMPUTED per-doc token counts — the packing
    * a real tokenize-and-pack job runs, where `nTokCol` comes from the
    * actual tokenizer (e.g. [[Bpe.tokenCounts]]) rather than a whitespace
    * approximation. Same single-shuffle window-cumsum plan. */
  def packSequencesCounted(
      counts: DataFrame, idCol: String, nTokCol: String,
      budgetTokens: Int, numShards: Int): DataFrame = {
    require(budgetTokens > 0 && numShards > 0)
    val shard = Sampling.bucketE4(col(idCol)) % numShards
    val win = Window.partitionBy("shard").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    counts
      .select(col(idCol),
        shard.as("shard"),
        col(nTokCol).cast("long").as("n_tokens"))
      .withColumn("tok_before",
        coalesce(sum("n_tokens").over(win), lit(0L)))
      .select(
        col(idCol), col("shard"),
        (col("tok_before") / budgetTokens).cast("long").as("seq_ix"),
        (col("tok_before") % budgetTokens).as("tok_offset"),
        col("n_tokens"))
  }

  /** PII redaction: emails → `<EMAIL>`, IPv4 → `<IP>`, phone numbers →
    * `<PHONE>`, with per-category match counts — the scrub a crawl corpus
    * gets before training. Categories are applied in a FIXED order (email,
    * ip, phone), each regex running over the previous stage's output, so
    * an email's host can never double-count as an IP.
    *
    * Regexes are written in the Java∩RE2 common subset so the Spark plan
    * and the DuckDB oracle compile the same automaton. Scale: per-row
    * narrow map, codegen'd `regexp_replace`/`regexp_extract_all` — no
    * shuffle, no UDF.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  // digits joined by AT MOST ONE space/hyphen each (7–16 digits total) —
  // the earlier greedy [0-9 -]{6,} run swallowed space-separated numbers
  // AFTER the phone ("+1 555 0100 42 items" redacted the 42 too)
  val PhoneRe = "\\+\\d(?:[ -]?\\d){6,14}"

  def piiScrub(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    def n(c: Column, re: String): Column =
      size(regexp_extract_all(c, lit(re), lit(0))).cast("long")
    docs
      .select(col(idCol), col(textCol).as("__t0"))
      .withColumn("n_email", n(col("__t0"), EmailRe))
      .withColumn("__t1", regexp_replace(col("__t0"), EmailRe, "<EMAIL>"))
      .withColumn("n_ip", n(col("__t1"), Ipv4Re))
      .withColumn("__t2", regexp_replace(col("__t1"), Ipv4Re, "<IP>"))
      .withColumn("n_phone", n(col("__t2"), PhoneRe))
      .select(col(idCol), col("n_email"), col("n_ip"), col("n_phone"),
        regexp_replace(col("__t2"), PhoneRe, "<PHONE>").as("clean_text"))
  }

  /** Per-host page cap: keep at most `cap` docs per URL host, chosen by a
    * salted deterministic rank (md5 of salt‖id) — the crawl-curation rule
    * that stops a single domain from dominating the corpus. Output keeps
    * `(id, domain, rank)` for every survivor.
    *
    * Scale: ONE shuffle — hash-partition by domain for the rank window.
    * Domains are naturally skewed (a 100 TB crawl has megadomains);
    * row_number still needs each domain's rows co-located, but only
    * `(id, domain, key)` flows through the shuffle, never the document
    * body — join survivors back to the corpus by id when the text is
    * needed (AQE handles the skewed partitions).
    */
  def capPerDomain(
      docs: DataFrame, idCol: String, urlCol: String,
      cap: Int, salt: String = "cap"): DataFrame = {
    require(cap > 0)
    // scheme-case-insensitive + lowered host, matching canonicalUrl — an
    // uppercase-scheme URL must not lump into a phantom '' domain
    val domain = lower(regexp_extract(col(urlCol), "^[A-Za-z]+://([^/]+)", 1))
    val key = md5(concat_ws("|", lit(salt), col(idCol).cast("string")))
    docs
      .select(col(idCol), domain.as("domain"), key.as("__k"))
      .withColumn("rank",
        row_number().over(
          Window.partitionBy("domain").orderBy(col("__k"), col(idCol)))
          .cast("long"))
      .filter(col("rank") <= cap)
      .drop("__k")
  }

  /** Collapse runs of adjacent repeated tokens ("batch batch batch" →
    * "batch") — the in-document repetition cleanup (crawl boilerplate,
    * decoder loops). Returns `(id, n_tokens, n_kept, clean_text)`.
    *
    * Scale: per-row narrow map — a single indexed `filter` pass over the
    * row's own token array; no shuffle, no UDF. The index lambda keeps
    * token i iff i is first or differs from token i-1 (`element_at` is
    * 1-based, the lambda index 0-based, so `element_at(toks, i)` IS the
    * previous token; the `greatest` guard keeps index 0 in-bounds on both
    * engines' eager evaluation).
    */
  def collapseRuns(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), TextOps.tokens(col(textCol)).as("toks"))
      .withColumn("kept",
        filter(col("toks"), (t, i) =>
          i === 0 || t =!= element_at(col("toks"), greatest(i, lit(1)))))
      .select(
        col(idCol),
        size(col("toks")).cast("long").as("n_tokens"),
        size(col("kept")).cast("long").as("n_kept"),
        concat_ws(" ", col("kept")).as("clean_text"))

  /** Corpus-wide exact paragraph dedup (CCNet / RefinedWeb style): docs
    * are cut into non-overlapping `chunkTokens`-token chunks, each chunk
    * keeps only its FIRST occurrence corpus-wide (ordered by doc id then
    * chunk position), and every doc is reconstructed from its surviving
    * chunks. Returns `(id, n_chunks, n_kept, clean_text)` — docs reduced
    * to "" lost every paragraph to earlier docs.
    *
    * Scale: explode to `(id, chunk_ix, md5, chunk)` — chunk text is
    * bounded at `chunkTokens` words, so the exploded relation is linear
    * in corpus token count, the same size class as a reshard. Two
    * shuffles, both keyed: first-occurrence selection is a min-rank
    * window hash-partitioned on the chunk md5; reconstruction re-groups
    * by doc id with an order-preserving sorted collect. No self-join, no
    * cartesian, no driver state.
    */
  def dedupParagraphs(
      docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int): DataFrame = {
    require(chunkTokens > 0)
    val nChunks = ceil(size(col("toks")) / lit(chunkTokens.toDouble)).cast("int")
    val tokenized = docs.select(col(idCol), TextOps.tokens(col(textCol)).as("toks"))
    // zero-token docs have no chunks to explode — retain them explicitly
    // (n_chunks=0, n_kept=0, clean_text='') so downstream reconstruction
    // keeps the doc set intact, like the sibling piiScrub/collapseRuns
    val empties = tokenized.filter(size(col("toks")) === 0)
      .select(col(idCol), lit(0L).as("n_chunks"), lit(0L).as("n_kept"),
        lit("").as("clean_text"))
    val chunks = tokenized.filter(size(col("toks")) > 0)
      .select(col(idCol), size(col("toks")).as("__nt"),
        posexplode(
          when(size(col("toks")) === 0, array().cast("array<string>"))
            .otherwise(transform(
              sequence(lit(0), nChunks - 1),
              i => concat_ws(" ",
                slice(col("toks"), i * chunkTokens + 1, lit(chunkTokens))))))
          .as(Seq("chunk_ix", "chunk")))
    val firsts = chunks
      .withColumn("__r",
        row_number().over(
          Window.partitionBy(md5(col("chunk")))
            .orderBy(col(idCol), col("chunk_ix"))))
    firsts
      .groupBy(idCol)
      .agg(
        floor((max(col("__nt")) + (chunkTokens - 1)) / chunkTokens)
          .cast("long").as("n_chunks"),
        count(when(col("__r") === 1, 1)).as("n_kept"),
        concat_ws(" ",
          transform(
            // collect_list drops the nulls `when` leaves for non-first
            // occurrences; struct sort = (chunk_ix, chunk) order
            array_sort(collect_list(
              when(col("__r") === 1, struct(col("chunk_ix"), col("chunk"))))),
            s => s.getField("chunk"))).as("clean_text"))
      .unionByName(empties)
  }

  /** Per-source boilerplate removal (RefinedWeb / CCNet line-dedup shape):
    * a chunk appearing in MORE than `maxDfE4`/10⁴ of one source's docs is
    * boilerplate (site header / footer / nav) and is dropped from EVERY
    * doc of that source — unlike [[dedupParagraphs]], which keeps a
    * chunk's first occurrence corpus-wide; boilerplate has no first
    * occurrence worth keeping. The frequency cut is exact integer
    * arithmetic (`df · 10⁴ > maxDfE4 · n_docs`), so both engines agree at
    * the boundary. Docs are assumed id-unique (as everywhere in this
    * file). Returns `(id, n_chunks, n_kept, clean_text)`.
    *
    * Scale: the chunk explode is linear in corpus token count; the
    * per-(source, chunk) document-frequency table is a hash agg bounded
    * by the per-source chunk vocabulary (Zipf-bounded); the boilerplate
    * set is a tiny high-frequency slice of that (AQE broadcasts it — at
    * any threshold worth running, few chunks clear it); reconstruction
    * is the same doc-keyed ordered collect as [[dedupParagraphs]]. No
    * self-join, no cartesian, no driver state.
    *
    * Sources with fewer than `minDocs` docs are exempt from the cut —
    * in a 1-doc source EVERY chunk has df 100%, so an ungated ratio
    * would empty the doc; frequency means nothing without a denominator.
    */
  def dropBoilerplate(
      docs: DataFrame, idCol: String, textCol: String, sourceCol: String,
      chunkTokens: Int, maxDfE4: Long, minDocs: Int = 2): DataFrame = {
    require(chunkTokens > 0)
    require(maxDfE4 >= 0 && maxDfE4 <= 10000, s"maxDfE4 in [0, 10000], got $maxDfE4")
    require(minDocs >= 1, s"minDocs must be >= 1, got $minDocs")
    val nChunks = ceil(size(col("toks")) / lit(chunkTokens.toDouble)).cast("int")
    val tokenized = docs.select(col(idCol), col(sourceCol).as("__src"),
      TextOps.tokens(col(textCol)).as("toks"))
    val empties = tokenized.filter(size(col("toks")) === 0)
      .select(col(idCol), lit(0L).as("n_chunks"), lit(0L).as("n_kept"),
        lit("").as("clean_text"))
    val chunks = tokenized.filter(size(col("toks")) > 0)
      .select(col(idCol), col("__src"), size(col("toks")).as("__nt"),
        posexplode(transform(
          sequence(lit(0), nChunks - 1),
          i => concat_ws(" ",
            slice(col("toks"), i * chunkTokens + 1, lit(chunkTokens)))))
          .as(Seq("chunk_ix", "chunk")))
      .withColumn("__h", md5(col("chunk")))
    // per-source doc totals straight off the input (one narrow agg; the
    // ratio denominator counts every doc of the source, empty ones too)
    val totals = docs.groupBy(col(sourceCol).as("__src"))
      .agg(count(lit(1)).as("__n"))
    val bp = chunks
      .groupBy("__src", "__h")
      .agg(countDistinct(col(idCol)).as("__df"))
      .join(totals, "__src")
      .filter(col("__df") * lit(10000L) > lit(maxDfE4) * col("__n") &&
        col("__n") >= minDocs)
      .select(col("__src"), col("__h"), lit(true).as("__bp"))
    chunks
      .join(bp, Seq("__src", "__h"), "left")
      .groupBy(idCol)
      .agg(
        floor((max(col("__nt")) + (chunkTokens - 1)) / chunkTokens)
          .cast("long").as("n_chunks"),
        count(when(col("__bp").isNull, 1)).as("n_kept"),
        concat_ws(" ",
          transform(
            array_sort(collect_list(
              when(col("__bp").isNull, struct(col("chunk_ix"), col("chunk"))))),
            s => s.getField("chunk"))).as("clean_text"))
      .unionByName(empties)
  }

  /** HTML → text extraction: strip tags, decode the common entities, and
    * squeeze the whitespace the removal leaves behind — the first step a
    * crawl pipeline runs on raw page bodies. Returns
    * `(id, n_tags, clean_text)`.
    *
    * Tag stripping is regex-based (`<[^>]*>`), the right tool for the
    * post-parser cleanup this op models (a malformed-markup-tolerant DOM
    * parse is a library concern, out of scope like the media codecs —
    * the Spark-side shape is what this operator pins). Entities cover the
    * five predefined XML entities plus `&nbsp;`; `&amp;` is decoded LAST
    * so `&amp;lt;` yields the literal `&lt;` rather than double-decoding.
    * Scale: per-row narrow map, codegen'd regex/replace chain, no UDF.
    */
  val TagRe = "<[^>]*>"

  def htmlStrip(docs: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val untagged = regexp_replace(col(htmlCol), TagRe, " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
      "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(untagged) { case (c, (e, r)) => regexp_replace(c, e, r) }
    docs.select(
      col(idCol),
      size(regexp_extract_all(col(htmlCol), lit(TagRe), lit(0)))
        .cast("long").as("n_tags"),
      trim(regexp_replace(decoded, "\\s+", " ")).as("clean_text"))
  }

  /** Overlapping token-window CHUNKING — the embedding/retrieval prep
    * step (a RAG or embedding pipeline embeds fixed-size chunks, not
    * whole documents): each doc splits into windows of `chunkTokens`
    * starting every `chunkTokens − overlapTokens` tokens, the final
    * window keeping the tail (possibly short). Output
    * `(id, chunk_ix, n_tokens, chunk)`; docs with no tokens emit
    * nothing. Integer-exact chunk count — `1 + max(0, (n − chunk +
    * stride − 1) div stride)` — truncating division wrapped in the
    * max(0, ·) so Spark's toward-zero `div` and DuckDB's floor `//`
    * cannot diverge on short docs.
    *
    * Scale: a per-row narrow map (tokenize + one row-local transform +
    * posexplode) — no shuffle, no join; output volume ≈ corpus tokens ×
    * chunk/(chunk − overlap). */
  def chunkDocuments(
      docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlapTokens: Int): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1, got $chunkTokens")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"overlap must be in [0, chunkTokens), got $overlapTokens/$chunkTokens")
    val stride = chunkTokens - overlapTokens
    docs
      .select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("__toks"))
      .select(col("id"), col("__toks"),
        (lit(1) + greatest(lit(0), expr(
          s"(size(__toks) - $chunkTokens + $stride - 1) div $stride")))
          .as("__nc"))
      .select(col("id"),
        posexplode(when(size(col("__toks")) === 0,
            array().cast("array<string>"))
          .otherwise(transform(
            sequence(lit(0), col("__nc") - 1),
            i => concat_ws(" ", slice(col("__toks"), i * stride + 1,
              lit(chunkTokens))))))
          .as(Seq("chunk_ix", "chunk")),
        col("__toks"))
      .select(col("id"), col("chunk_ix"),
        least(lit(chunkTokens),
          size(col("__toks")) - col("chunk_ix") * stride)
          .cast("long").as("n_tokens"),
        col("chunk"))
  }

  /** URL canonicalization — the normalization a crawl dedup runs before
    * grouping by URL: drop the fragment, lowercase scheme+host, strip a
    * leading `www.`, strip default ports (:80 http / :443 https), remove
    * tracking query parameters (`utm_*`, `gclid`, `fbclid`) with
    * separator repair, and trim trailing slashes. Pure per-row regex
    * chain (codegen'd, no UDF); the oracle mirrors each step with RE2's
    * `\1` replacement syntax where Spark's Java regex uses `$1`.
    */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val host = regexp_replace(
      regexp_replace(
        regexp_replace(
          lower(regexp_extract(noFrag, "^([A-Za-z]+://[^/]*)", 1)),
          "^([a-z]+://)www\\.", "$1"),
        "^(http://[^/:]+):80$", "$1"),
      "^(https://[^/:]+):443$", "$1")
    val path = regexp_replace(noFrag, "^[A-Za-z]+://[^/]*", "")
    val cleaned = regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(path, "([?&])(utm_[a-z]+|gclid|fbclid)=[^&#]*", "$1"),
          "\\?&+", "?"),
        "&&+", "&"),
      "[?&]+$", "")
    concat(host, regexp_replace(cleaned, "/+$", ""))
  }

  /** Exact URL dedup over canonical forms: `(url_c, n, keep_id)` — one
    * row per canonical URL, keeping the smallest id. Scale: a per-row
    * canonicalization map into one partial-aggregated hash groupBy, the
    * same embarrassingly-parallel shape as exact text dedup. */
  def urlDedup(docs: DataFrame, idCol: String, urlCol: String): DataFrame =
    docs
      .select(col(idCol), canonicalUrl(col(urlCol)).as("url_c"))
      .groupBy("url_c")
      .agg(count(lit(1)).as("n"), min(col(idCol)).as("keep_id"))

  /** Per-source MinHash signatures → pairwise Jaccard estimates between
    * every pair of sources: the overlap matrix a mixture designer reads
    * before weighting domains (two crawls of the same site should not
    * both get full weight). Returns `(src_a, src_b, sim_e4)` for
    * src_a < src_b, sim = fraction of the `numHashes` per-source min
    * hashes that agree (the standard MinHash estimator of Jaccard over
    * each source's distinct-shingle set).
    *
    * Scale: the ONLY corpus-sized stage is the distinct (source,
    * shingle-md5) projection; the K min-hash aggregation is algebraic, so
    * partial aggregation reduces each partition to |sources|·K values
    * before the shuffle — no skew cliff from giant sources. The pairwise
    * stage runs on |sources|² signature rows (a dashboard-sized
    * relation; sources are domains/datasets, thousands at most, and AQE
    * broadcasts the self-join's build side).
    */
  def sourceOverlap(
      docs: DataFrame, sourceCol: String, textCol: String,
      shingleWords: Int, numHashes: Int): DataFrame = {
    require(numHashes > 0)
    val sh = docs
      .select(col(sourceCol).as("src"), TextOps.tokens(col(textCol)).as("toks"))
      .select(col("src"),
        explode(TextOps.wordShingles(col("toks"), shingleWords)).as("sh"))
      .select(col("src"), TextOps.baseHash(col("sh")).as("h"))
    val hashAggs = TextOps.hashConstants(numHashes).zipWithIndex.map {
      case ((a, b), k) =>
        min((col("h") * a + b) % TextOps.HashPrime).as(s"h$k")
    }
    // scoped cache: BOTH self-join sides read the signature relation, and
    // without the cache each side re-runs the corpus-sized shingle
    // explode + aggregation — the one stage here that scales with data.
    // min over LONG keeps the whole reduction in HashAggregate with
    // map-side partials and 8-byte shuffle rows.
    val sigs = OperatorCache.scoped(
      sh.groupBy("src").agg(hashAggs.head, hashAggs.tail: _*))
    val a = sigs.select(col("src").as("src_a") +:
      (0 until numHashes).map(k => col(s"h$k").as(s"a$k")): _*)
    val b = sigs.select(col("src").as("src_b") +:
      (0 until numHashes).map(k => col(s"h$k").as(s"b$k")): _*)
    val matches = (0 until numHashes)
      .map(k => when(col(s"a$k") === col(s"b$k"), 1).otherwise(0))
      .reduce(_ + _)
    // the pairwise condition is non-equi, so this is nested-loop by
    // nature — force the broadcast (|sources| rows ≤ a few thousand;
    // a CartesianProduct fallback on unknown agg stats would shuffle
    // both sides for nothing)
    a.crossJoin(broadcast(b))
      .filter(col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"),
        round(matches * 10000.0 / numHashes).cast("long").as("sim_e4"))
  }

  /** The sequences view of [[packSequences]]: one row per training
    * sequence — `(shard, seq_ix, n_docs, first_id, last_id, seq_tokens)`
    * — what the shard writer materializes as its manifest. Pure regroup
    * of the packing assignment; co-partitioned with it (same shard
    * hash), so the aggregation reuses the packing shuffle's layout.
    */
  def assembleSequences(
      docs: DataFrame, idCol: String, textCol: String,
      budgetTokens: Int, numShards: Int): DataFrame =
    packSequences(docs, idCol, textCol, budgetTokens, numShards)
      .groupBy("shard", "seq_ix")
      .agg(
        count(lit(1)).as("n_docs"),
        min(idCol).as("first_id"),
        max(idCol).as("last_id"),
        sum("n_tokens").as("seq_tokens"))

  /** Deterministic global shuffle for shard writing: every doc gets a
    * `(shard, pos)` — shard by md5 bucket, position by md5(salt‖id) rank
    * within the shard. Reproducible on any engine/partitioning (same
    * argument as [[Sampling]]: no RNG), and changing `salt` is a fresh
    * full reshuffle — the "shuffle per epoch" training loops need.
    *
    * Scale: the physical shape IS the work — one hash partition by shard
    * + per-shard sort, i.e. exactly `repartition(shard).sortWithin
    * Partitions(key)` that the final shard write performs anyway; the
    * window adds rank bookkeeping to a sort the job already pays for.
    */
  def shardShuffle(
      docs: DataFrame, idCol: String, numShards: Int, salt: String): DataFrame = {
    require(numShards > 0)
    val key = md5(concat_ws("|", lit(salt), col(idCol).cast("string")))
    docs.select(
      col(idCol),
      (Sampling.bucketE4(col(idCol)) % numShards).as("shard"),
      key.as("__k"))
      .withColumn("pos",
        (row_number().over(
          Window.partitionBy("shard").orderBy(col("__k"), col(idCol))) - 1)
          .cast("long"))
      .drop("__k")
  }

  /** Leakage-safe train/val/test split — the split pass a training
    * pipeline runs AFTER dedup clustering: near-duplicate documents must
    * never straddle a split boundary (a held-out doc whose near-dup sits
    * in train leaks the eval), so the assignment unit is the duplicate
    * CLUSTER, not the document. `memberships` is
    * [[Dedup.connectedComponents]] output `(id, survivor)`; docs absent
    * from it are singleton clusters keyed by their own id.
    *
    * Assignment follows the [[Sampling.stratified]] reproducibility
    * contract — the deterministic md5 bucket of the GROUP key, a pure
    * function of the key, identical across engines and partitionings:
    * bucket < trainE4 → train, < trainE4 + valE4 → val, else test. Every
    * member of a cluster shares the group key, hence the split, by
    * construction.
    *
    * Scale: one equi-join of the corpus against the membership table
    * (bounded by the docs that appear in verified near-dup pairs — AQE
    * broadcasts it while it fits, degrading to a shuffled join, never a
    * BNLJ) plus a per-row narrow map. No window, no corpus-wide agg. */
  def leakageSafeSplit(
      docs: DataFrame, idCol: String, memberships: DataFrame,
      trainE4: Int, valE4: Int): DataFrame = {
    require(trainE4 >= 0 && valE4 >= 0 && trainE4 + valE4 <= 10000,
      s"split fractions are parts-per-10000, got train=$trainE4 val=$valE4")
    val m = memberships.select(col("id").as(idCol), col("survivor"))
    val b = Sampling.bucketE4(col("group_key"))
    docs.join(m, Seq(idCol), "left")
      .withColumn("group_key", coalesce(col("survivor"), col(idCol).cast("long")))
      .select(col(idCol), col("group_key"),
        when(b < trainE4, lit("train"))
          .when(b < trainE4 + valE4, lit("val"))
          .otherwise(lit("test")).as("split"))
  }

  // ----------------- DSIR importance resampling -----------------

  /** Per-bucket smoothed log importance ratios for DSIR (Xie et al. 2023,
    * arXiv:2302.03169): fit hashed unigram+bigram bag-of-words
    * distributions over the TARGET slice (`isTarget`) and the full raw
    * corpus, Laplace-smoothed, and emit
    * `lr_e6(j) = round(1e6·(ln(ct+1) − ln(Nt+dim) − ln(cr+1) + ln(Nr+dim)))`
    * for every bucket j ∈ [0, dim). The doubles in the whole DSIR family
    * live HERE — 4·dim `ln` calls over exact integer counts (the NLL
    * rows' libm-parity story); everything downstream is exact long
    * arithmetic.
    *
    * Scale: gram extraction is the row-local [[graft.functions.HashedGramBuckets]]
    * kernel (one narrow codegen'd map — no per-gram HOF lambda, no second
    * pass for bigrams); the only exchange is the dim-keyed count
    * aggregate, whose partial side is bounded by dim·partitions rows.
    * `dim` rows out — driver-collectable, the centroid/codebook size
    * class. */
  def dsirLogRatios(
      docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, dim: Int): DataFrame = {
    require(dim > 0, s"dsir feature dim must be positive, got $dim")
    val spark = docs.sparkSession
    val grams = docs.select(
        isTarget.cast("boolean").as("tgt"),
        explode(graft.functions.DsirExpressions.gramBuckets(
          TextOps.tokens(col(textCol)), dim)).as("j"))
    val counts = grams.groupBy("j").agg(
      sum(when(col("tgt"), 1L).otherwise(0L)).as("ct"),
      count(lit(1)).as("cr"))
    // full bucket domain: zero-count buckets still carry the smoothing
    // mass on both sides (the oracle's range(0, dim) LEFT JOIN)
    val full = spark.range(dim).select(col("id").cast("int").as("j"))
      .join(counts, Seq("j"), "left")
      .select(col("j"),
        coalesce(col("ct"), lit(0L)).as("ct"),
        coalesce(col("cr"), lit(0L)).as("cr"))
    val totals = full.agg(sum(col("ct")).as("nt"), sum(col("cr")).as("nr"))
    full.crossJoin(broadcast(totals)) // 1 row: the two corpus totals
      .select(col("j"),
        round((log(col("ct") + lit(1.0)) - log(col("nt") + lit(dim.toDouble))
          - log(col("cr") + lit(1.0)) + log(col("nr") + lit(dim.toDouble)))
          * lit(1e6), 0).cast("long").as("lr_e6"))
  }

  /** Run the [[dsirLogRatios]] fit and ship the dim-sized weight table to
    * executors as ONE broadcast — the frozen scoring model a streaming
    * scorer (or a second corpus) reuses without refitting. */
  def dsirFitWeights(
      docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, dim: Int): org.apache.spark.broadcast.Broadcast[Array[Long]] = {
    val lrArr = new Array[Long](dim)
    dsirLogRatios(docs, idCol, textCol, isTarget, dim)
      .select(col("j").cast("int"), col("lr_e6").cast("long"))
      .collect().foreach(r => lrArr(r.getInt(0)) = r.getLong(1))
    docs.sparkSession.sparkContext.broadcast(lrArr)
  }

  /** Score docs against a frozen DSIR weight table: `(id, n_grams,
    * score_e6)`, exact long arithmetic, ONE stateless zero-exchange
    * codegen'd map — streaming-safe (no join/agg/state), the same plan
    * shape batch and under a micro-batch trigger. */
  def dsirScore(
      docs: DataFrame, idCol: String, textCol: String,
      weights: org.apache.spark.broadcast.Broadcast[Array[Long]],
      dim: Int): DataFrame = {
    // a dim that disagrees with the fitted table would either index out
    // of bounds inside the codegen kernel (dim > table) or silently score
    // under a bucket scheme inconsistent with the fit (dim < table) —
    // fail at plan time instead ([[DsirStore.score]] guards its own path
    // the same way via the commit marker)
    require(weights.value.length == dim,
      s"DSIR weight table holds ${weights.value.length} buckets, caller says dim=$dim")
    // null text scores like empty text (0 grams, score 0) — without the
    // coalesce a null row would carry a NULL score into the Gumbel key
    // and sort apart from the oracle's absent→0 convention (latent: the
    // battery corpora carry no null texts)
    val buckets = graft.functions.DsirExpressions.gramBuckets(
      TextOps.tokens(coalesce(col(textCol).cast("string"), lit(""))), dim)
    docs.select(col(idCol).cast("long").as("id"), buckets.as("__b"))
      .select(col("id"),
        size(col("__b")).cast("long").as("n_grams"),
        graft.functions.DsirExpressions.bucketSum(col("__b"), weights)
          .as("score_e6"))
  }

  /** DSIR importance resampling: score every doc
    * `score_e6 = Σ_j c_j · lr_e6(j)` (exact long — the per-doc log
    * importance weight of the hashed generative model) and draw k docs
    * WITHOUT replacement via Gumbel top-k —
    * `key_e6 = score_e6 + round(1e6·(−ln(−ln(u))))` with `u` a pure
    * md5 function of the row id (the [[Sampling.weightedTopK]]
    * reproducibility contract; Gumbel avoids the `exp(score)` overflow
    * the A-ES key would hit at document log-weight magnitudes).
    *
    * Scale: fit = [[dsirLogRatios]] (one dim-keyed agg, dim-row collect);
    * score = ONE zero-exchange codegen'd map over the corpus
    * ([[graft.functions.DsirBucketSum]] against the broadcast weight
    * array); selection = `orderBy(key desc).limit(k)` →
    * TakeOrderedAndProject (per-partition top-k, k-bounded driver merge —
    * never a full sort shuffle). Returns `(id, n_grams, score_e6,
    * key_e6)` in selection order (key desc, id asc). */
  def dsirResample(
      docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, dim: Int, k: Int,
      salt: String = "dsir"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val bc = dsirFitWeights(docs, idCol, textCol, isTarget, dim)
    val scored = dsirScore(docs, idCol, textCol, bc, dim)
    val h = conv(substring(
      md5(concat_ws("|", lit(salt), col("id").cast("string"))), 1, 8),
      16, 10).cast("long")
    val u = (h.cast("double") + lit(0.5)) / lit(4294967296.0) // (0, 1)
    scored
      .withColumn("key_e6",
        col("score_e6") +
          round(-log(-log(u)) * lit(1e6), 0).cast("long"))
      .orderBy(col("key_e6").desc, col("id"))
      .limit(k)
  }
}
