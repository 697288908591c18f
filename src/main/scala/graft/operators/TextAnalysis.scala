package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextOps._

/** Text-analysis operators for training-data curation: language ID, quality
  * scoring, token statistics, and content fingerprinting.
  *
  * All per-row narrow transformations (no shuffle), codegen'd Catalyst
  * lambdas, integer/rounded outputs for exact oracle reproducibility.
  */
object TextAnalysis {

  /** Tiny per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Deliberately small — the operator shape (multiset membership
    * scoring + argmax) is the point; swap lists for real ones in production. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "por"),
    "fr" -> Seq("le", "la", "de", "et", "est", "un", "une", "dans"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有", "我"))

  private def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words))).cast("long")

  /** Language ID: per-language stopword hit counts + argmax prediction
    * (ties break alphabetically). Output: (id, s_<lang>..., lang_pred). */
  def langId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val scored = docs.select(
      (col(idCol).as("id") +:
        stopwords.map { case (l, ws) => stopwordHits(toks, ws).as(s"s_$l") }): _*)
    // argmax with alphabetical tie-break: first lang (in sorted order) whose
    // score is >= all others wins — identical CASE chain in the oracle.
    val langs = stopwords.map(_._1)
    val pred = langs.foldRight(lit(langs.last)) { (l, els) =>
      val ge = langs.filter(_ != l).map(o => col(s"s_$l") >= col(s"s_$o")).reduce(_ && _)
      when(ge, lit(l)).otherwise(els)
    }
    scored.withColumn("lang_pred", pred)
  }

  /** Quality signals: token count, type/token ratio, English stopword ratio,
    * mean token length, alphabetic-character ratio — all exact integers
    * (ratios ×10⁴) — plus a simple keep/drop flag. */
  def quality(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = lower(trim(col(textCol)))
    val toks = tokens(col(textCol))
    val nTok = size(toks).cast("long")
    val nTypes = size(array_distinct(toks)).cast("long")
    val nStop = stopwordHits(toks, stopwords.toMap.apply("en"))
    val nChars = length(t).cast("long")
    val nAlpha = length(regexp_replace(t, "[^a-z]", "")).cast("long")
    val sumTokLen = aggregate(toks, lit(0L), (acc, x) => acc + length(x).cast("long"))
    def e4(num: Column, den: Column): Column =
      when(den === 0, lit(0L)).otherwise(round(num * lit(10000.0) / den, 0).cast("long"))
    docs.select(
      col(idCol).as("id"),
      nTok.as("n_tokens"),
      e4(nTypes, nTok).as("ttr_e4"),
      e4(nStop, nTok).as("stop_e4"),
      e4(sumTokLen, nTok).as("mean_tok_len_e4"),
      e4(nAlpha, nChars).as("alpha_e4"))
      .withColumn("keep",
        col("n_tokens") >= 10 && col("ttr_e4") >= 2000 && col("alpha_e4") >= 5000)
  }

  /** GPT-2-style pre-tokenizer pattern, in the Java∩RE2 regex subset both
    * engines share: English contraction suffixes, optionally-space-prefixed
    * letter runs / digit runs / symbol runs, then whitespace runs. The real
    * GPT-2 pattern's `\s+(?!\S)` lookahead is dropped (RE2 has no
    * lookahead), so interior multi-space runs tokenize as one run instead
    * of splitting before the next word — a fixed ±1-per-run offset, fine
    * for a token-count statistic. Both engines use ordered (leftmost-first)
    * alternation, so match sets are identical. */
  val BpeRe = "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** Token statistics: counts via whitespace, via a word-regex, and via the
    * [[BpeRe]] BPE-ish pre-tokenizer (the count an LLM token budget tracks,
    * up to the merge table). All per-row narrow maps. */
  def tokenStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = lower(trim(col(textCol)))
    docs.select(
      col(idCol).as("id"),
      size(tokens(col(textCol))).cast("long").as("n_ws_tokens"),
      size(filter(split(t, "[^a-z0-9]+"), x => x =!= "")).cast("long").as("n_word_tokens"),
      size(regexp_extract_all(col(textCol), lit(BpeRe), lit(0)))
        .cast("long").as("n_bpe_tokens"),
      length(t).cast("long").as("n_chars"))
  }

  /** Corpus-level statistics: one exact-integer row — document count, token
    * totals, vocabulary size, and ×100-scaled mean tokens/doc. The global
    * aggregate is partial+final (map-side combine); distinct is a hash
    * shuffle on the token. */
  def corpusStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ex = docs.select(col(idCol).as("id"), explode_outer(tokens(col(textCol))).as("t"))
    ex.agg(
      countDistinct(col("id")).as("n_docs"),
      count(col("t")).as("total_tokens"),
      countDistinct(col("t")).as("vocab"),
      // ANSI guard: an empty corpus still yields one agg row with
      // n_docs = 0 — the mean must not execute the division on it
      when(countDistinct(col("id")) > 0,
        round(count(col("t")) * lit(100.0) / countDistinct(col("id")), 0).cast("long"))
        .otherwise(lit(0L)).as("avg_tokens_e2"))
  }

  /** Unigram-LM negative log-likelihood per document — the shape of
    * perplexity filtering (CCNet / LLaMA-style curation: score each doc
    * under a language model trained on the corpus, drop the tails). The
    * "model" here is the corpus's own add-one-smoothed unigram LM:
    * `lp(t) = ln((c_t + 1) / (N + V))`, scored as the per-doc mean NLL
    * ×10⁴ (lower = more typical text). Swap the count table for a
    * pretrained one and the plan is unchanged.
    *
    * Scale: pass 1 builds the vocab-sized count table (hash agg on the
    * token, Zipf-bounded); pass 2 re-joins tokens to their counts (AQE
    * broadcasts the count side while it fits; degrades to a shuffled
    * equi-join, never a BNLJ) and aggregates per doc with map-side
    * partials. Zero-token docs are retained with (0, 0). */
  def unigramNll(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ex = docs
      .select(col(idCol).as("id"), explode_outer(tokens(col(textCol))).as("t"))
    val counts = ex.filter(col("t").isNotNull)
      .groupBy("t").agg(count(lit(1)).as("c"))
    val totals = counts.agg(
      sum(col("c")).as("n_total"), count(lit(1)).as("vocab"))
    nllAgainst(docs, idCol, textCol, counts, totals)
  }

  /** The scoring half of [[unigramNll]] against an EXTERNAL count table —
    * shared by the inline operator (which passes its own just-computed
    * frames) and [[LmStore.score]] (which passes bare parquet scans of
    * the persisted model), so the two paths cannot drift. `counts` is
    * `(t, c)`, `totals` ONE row `(n_total, vocab)`. Tokens absent from
    * the table score the add-one floor `ln(1 / (N + V))` — on the inline
    * path every token is present, so the coalesce is a no-op there. */
  private[operators] def nllAgainst(
      docs: DataFrame, idCol: String, textCol: String,
      counts: DataFrame, totals: DataFrame): DataFrame = {
    val ex = docs
      .select(col(idCol).as("id"), explode_outer(tokens(col(textCol))).as("t"))
    val lp = ex
      .join(counts, Seq("t"), "left")
      .crossJoin(broadcast(totals)) // 1 row: corpus N and V
      .select(col("id"), col("t"),
        when(col("t").isNotNull,
          log((coalesce(col("c"), lit(0L)) + lit(1.0)) /
            (col("n_total") + col("vocab"))))
          .as("lp"))
    // ordered fold (token-sorted) instead of a bare double sum() — the
    // partition-combine-order parity trap at a rounding cut; equal tokens
    // carry identical lp, so the t sort pins the order (see charEntropy)
    lp.groupBy("id")
      .agg(
        count(col("lp")).as("n_tokens"),
        array_sort(collect_list(
          when(col("lp").isNotNull, struct(col("t"), col("lp"))))).as("__ls"))
      .select(col("id"), col("n_tokens"),
        // ANSI guard: empty docs survive explode_outer as t=null rows, so
        // their group reaches this projection with n_tokens = 0 — the
        // division must not EXECUTE on that row (ANSI DIVIDE_BY_ZERO
        // throws; it does not yield the null a coalesce could absorb)
        when(col("n_tokens") > 0,
          round(-aggregate(col("__ls"), lit(0.0),
            (acc, s) => acc + s.getField("lp"))
            * lit(10000.0) / col("n_tokens"), 0).cast("long"))
          .otherwise(lit(0L)).as("nll_e4"))
  }

  /** BM25 top-k keyword retrieval (Robertson et al., public Okapi BM25;
    * k1 = 1.2, b = 0.75 defaults) — the ranked-search shape a corpus
    * exploration pipeline needs. Scoring a BOUNDED query term list needs
    * no inverted index at all in Spark: per-doc term frequencies are
    * row-local array counts (one narrow pass, no explode/shuffle), the
    * corpus statistics (N, Σdl, per-term df) are ONE partial-aggregated
    * row broadcast back, and the top-k is a distributed
    * TakeOrderedAndProject — the only single-partition work is the k-row
    * rank window. Two corpus scans total (stats + scoring), zero hash
    * shuffles.
    *
    * Cross-engine exactness: the per-doc score is a FIXED-ORDER sum over
    * the literal term list (left-assoc `+`, same tree the oracle spells
    * out), idf = ln((N − df + 0.5)/(df + 0.5) + 1) is always positive
    * (the "+1" Lucene form), avgdl is the exact long Σdl divided once,
    * and the cut surfaces as round(score·10⁴) with id tie-breaks.
    * Output: (rank, id, dl, score_e4). */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25TopK needs at least one query term")
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      size(filter(col("__toks"), x => x === lit(t))).cast("long").as(s"tf$i")
    }
    val base = docs
      .select(col(idCol).as("id"), tokens(col(textCol)).as("__toks"))
      .select(col("id") +: size(col("__toks")).cast("long").as("dl") +: tfCols: _*)
    val g = base.agg(
      count(lit(1)).as("n"),
      sum(col("dl")).as("sum_dl") +: terms.indices.map(i =>
        sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i")): _*)
    val avgdl = col("sum_dl").cast("double") / col("n")
    // ANSI guard: a corpus of all-empty docs has sum_dl = 0, so avgdl = 0
    // and dl/avgdl would EXECUTE 0/0 per row (ANSI throws). The length
    // norm degenerates to 0 there, leaving the tf + k1·(1−b) denominator
    // strictly positive.
    val lenNorm = when(col("sum_dl") > 0, col("dl").cast("double") / avgdl)
      .otherwise(lit(0.0))
    def termScore(i: Int): Column = {
      val tf = col(s"tf$i").cast("double")
      val idf = log(((col("n") - col(s"df$i")).cast("double") + lit(0.5)) /
        (col(s"df$i").cast("double") + lit(0.5)) + lit(1.0))
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * lenNorm))
    }
    val score = terms.indices.map(termScore).reduce(_ + _)
    val cut = base.crossJoin(broadcast(g))
      .select(col("id"), col("dl"), round(score * 1e4, 0).cast("long").as("score_e4"))
      .orderBy(col("score_e4").desc, col("id"))
      .limit(k)
    cut
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("score_e4").desc, col("id"))))
      .select("rank", "id", "dl", "score_e4")
  }

  /** Hashed-feature linear text classifier — the fastText / quality-model
    * scoring shape (Joulin et al. 2016, public paper): tokens hash into
    * `dim` feature buckets (the md5-nibble idiom every sampling oracle
    * shares), the document's score is the mean bucket weight, surfaced as
    * a sigmoid probability. `weights` is any (j, w_e6) table — a trained
    * model in production, a deterministic fixture in the battery — with
    * INTEGER e6 weights so the per-doc reduction is an exact long
    * Σ c_j·w_j: order-independent, no float-summation divergence; doubles
    * appear only in the final sigmoid.
    *
    * Scale: explode → (doc, bucket) hash agg (partial'd) → broadcast join
    * against the dim-bounded weight table → per-doc long-sum agg. Zero-
    * token docs retained at sigmoid(0). Output:
    * (id, n_tokens, dot_e6, prob_e6). */
  def linearScore(docs: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, dim: Int): DataFrame = {
    val feats = docs
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("t"))
      .select(col("id"),
        (conv(substring(md5(col("t")), 1, 4), 16, 10).cast("long") % dim).as("j"))
      .groupBy("id", "j").agg(count(lit(1)).as("c"))
    // LEFT join + coalesce(0): a SPARSE trained table (zero-weight buckets
    // omitted) must still count the token in n_tokens and score it 0 —
    // exactly what the row-local twin's zero-default array does, keeping
    // the bit-identity contract for any weight table, not just the
    // all-buckets fixture
    val dotted = feats
      .join(broadcast(weights.select(col("j"), col("w_e6"))), Seq("j"), "left")
      .groupBy("id").agg(
        sum(col("c") * coalesce(col("w_e6"), lit(0L))).as("dot_e6"),
        sum(col("c")).as("n_tokens"))
    val s = when(col("n_tokens") === 0, lit(0.0))
      .otherwise(col("dot_e6").cast("double") / 1e6 / col("n_tokens"))
    docs.select(col(idCol).as("id")).join(dotted, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("dot_e6"), lit(0L)).as("dot_e6"))
      .withColumn("prob_e6",
        round(lit(1e6) / (lit(1.0) + exp(negate(s))), 0).cast("long"))
  }

  /** Row-local twin of [[linearScore]]: the identical integer math folded
    * over each row's own tokens with the weight table broadcast — no
    * shuffle, no aggregation, so it composes unchanged onto a live stream
    * in append mode (results are bit-identical to the agg path: both are
    * exact long sums of the same per-token weights). The in-JVM
    * tokenizer/md5-bucket replica of the `tokens()`/`md5()` Catalyst pair
    * is pinned against the agg path on real data by TextAnalysisSpec —
    * and normalization goes through UTF8String.trim/toLowerCase, the
    * LITERAL implementation Catalyst's `trim`/`lower` call, so the two
    * paths cannot diverge on control characters or locale-sensitive case
    * (Java String.trim strips all chars ≤ U+0020 where SQL trim strips
    * spaces only — a measured divergence channel). mapPartitions is the
    * documented exception pattern here (a per-token table lookup as a
    * Catalyst literal map would re-hash the literal per row — the
    * measured stream_decontam trap). */
  def linearScoreRowLocal(docs: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, dim: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wArr = new Array[Long](dim)
    weights.select(col("j").cast("long"), col("w_e6").cast("long"))
      .collect().foreach(r => wArr(r.getLong(0).toInt) = r.getLong(1))
    val bc = spark.sparkContext.broadcast(wArr)
    docs
      .select(col(idCol).cast("long").as("id"), col(textCol).cast("string").as("t"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val w = bc.value
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, t0) =>
          val t = if (t0 == null) "" else t0
          var n = 0L
          var dot = 0L
          org.apache.spark.unsafe.types.UTF8String.fromString(t)
            .trim().toLowerCase().toString.split("\\s+")
            .iterator.filter(_.nonEmpty).foreach { tok =>
              val h = md.digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
              dot += w((((h(0) & 0xff) << 8) | (h(1) & 0xff)) % dim)
              n += 1
            }
          val s = if (n == 0L) 0.0 else dot.toDouble / 1e6 / n
          (id, n, dot, math.round(1e6 / (1.0 + math.exp(-s))))
        }
      }
      .toDF("id", "n_tokens", "dot_e6", "prob_e6")
  }

  /** In-engine TRAINED multinomial Naive Bayes text classifier — train
    * and apply in one distributed plan (the complement of [[linearScore]],
    * whose weights arrive pretrained). NB is the one classical text model
    * whose training is PURE COUNTING, so the whole loop is Spark-native
    * and oracle-expressible: no gradient state, no iteration.
    *
    *  - train: per-(class, bucket) token counts + class totals + doc
    *    priors — two partial-aggregated hash aggs, output bounded by
    *    C·dim (the model, broadcast back);
    *  - model: add-one-smoothed log-likelihoods L(c,j) = ln((m+1)/(M_c +
    *    dim)) and priors ln(n_c/N), both e6-rounded to LONGS — so every
    *    document score is an EXACT integer prior + Σ cnt·L
    *    (order-independent; no float-summation divergence);
    *  - score: doc features join the broadcast model grid, one hash agg
    *    per (doc, class), argmax with (score desc, class asc) ties.
    *
    * Zero-token docs rank by priors alone. Output:
    * (id, actual, pred, correct). */
  def nbTrainScore(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, dim: Int): DataFrame = {
    val base = docs.select(col(idCol).as("id"), col(labelCol).as("actual"),
      col(textCol).as("__text"))
    val ex = base
      .select(col("id"), col("actual").as("c"),
        explode(tokens(col("__text"))).as("t"))
      .withColumn("j",
        conv(substring(md5(col("t")), 1, 4), 16, 10).cast("long") % dim)
    // ---- train (counting only; model is C·dim rows, broadcast-sized)
    val classTok = ex.groupBy("c", "j").agg(count(lit(1)).as("m"))
    val classTot = classTok.groupBy("c").agg(sum(col("m")).as("mc"))
    val nd = base.groupBy("actual").agg(count(lit(1)).as("ndocs"))
    val total = base.agg(count(lit(1)).as("n"))
    val priors = nd.crossJoin(broadcast(total))
      .select(col("actual").as("c"),
        round(log(col("ndocs").cast("double") / col("n")) * 1e6, 0)
          .cast("long").as("prior_e6"))
    // full (class × bucket) grid so unseen buckets score the smoothed floor
    val grid = classTot
      .crossJoin(docs.sparkSession.range(dim).select(col("id").cast("long").as("j")))
      .join(classTok, Seq("c", "j"), "left")
      .select(col("c"), col("j"),
        round(log((coalesce(col("m"), lit(0L)).cast("double") + lit(1.0)) /
          (col("mc").cast("double") + lit(dim.toDouble))) * 1e6, 0)
          .cast("long").as("l_e6"))
    // ---- score: exact integer Σ cnt·L per (doc, class), plus prior
    val feats = ex.groupBy("id", "j").agg(count(lit(1)).as("cnt"))
    val sums = feats
      .join(broadcast(grid), Seq("j"))
      .groupBy("id", "c").agg(sum(col("cnt") * col("l_e6")).as("fsum_e6"))
    val scored = base.select(col("id"), col("actual"))
      .crossJoin(broadcast(priors))
      .join(sums, Seq("id", "c"), "left")
      .select(col("id"), col("actual"), col("c"),
        (col("prior_e6") + coalesce(col("fsum_e6"), lit(0L))).as("score_e6"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("score_e6").desc, col("c").asc)
    scored.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col("id"), col("actual"), col("c").as("pred"),
        (col("c") === col("actual")).as("correct"))
  }

  /** The battery's deterministic weight fixture: w_e6(j) = a Knuth-hash
    * spread over ±1e6 — stands in for a trained model, reproducible in
    * integer SQL on both engines. */
  def fixtureWeights(spark: org.apache.spark.sql.SparkSession, dim: Int): DataFrame =
    spark.range(dim).select(col("id").as("j"),
      ((col("id") * 2654435761L) % 2000001L - 1000000L).as("w_e6"))

  /** TF-IDF top-k terms per document — keyword extraction over the whole
    * corpus, the inverted-index-shaped workload ([[bm25TopK]] deliberately
    * avoids the index for bounded queries; this is the dual: ALL terms, so
    * the explode is the right plan). Stages, each partial-aggregated:
    * token explode → (doc, term) tf hash agg → term df hash agg (posting
    * sizes, vocab-bounded) → tf×df equi-join (AQE broadcasts the df side
    * while it fits) → per-doc top-k window on (score desc, term asc).
    * Score = tf · ln(N/df) as a single double product (no float
    * summation anywhere), surfaced ×10⁴. Output:
    * (id, rank, term, tf, score_e4). */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val ex = docs.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("t"))
    val tf = ex.groupBy("id", "t").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("t").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val sc = tf.join(df, Seq("t"))
      .crossJoin(broadcast(n))
      .select(col("id"), col("t").as("term"), col("tf"),
        round(col("tf").cast("double") *
          log(col("n").cast("double") / col("df")) * 1e4, 0)
          .cast("long").as("score_e4"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("score_e4").desc, col("term").asc)
    sc.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("id", "rank", "term", "tf", "score_e4")
  }

  /** Bigram-LM negative log-likelihood per document — the context-aware
    * upgrade of [[unigramNll]] (same CCNet-style filtering shape; a
    * repetitive doc scores low under a bigram LM even when its unigram
    * distribution looks typical). Add-one smoothing over the corpus's own
    * bigrams: `lp(w_i | w_{i-1}) = ln((c2(w_{i-1} w_i) + 1) /
    * (c1(w_{i-1}) + V))`, surfaced as mean NLL ×10⁴ over the doc's
    * bigram positions; docs with < 2 tokens retained at (0, 0).
    *
    * Scale: bigram construction is a row-local transform (no
    * explode-join); the count tables are hash aggs bounded by the bigram
    * vocabulary (Zipf-bounded); scoring is two equi-joins (AQE broadcasts
    * the count sides while they fit) + one per-doc agg with map-side
    * partials — the unigramNll plan with one extra vocab join. */
  def bigramNll(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toksDf = docs.select(col(idCol).as("id"), tokens(col(textCol)).as("toks"))
    val bgx = toksDf
      .withColumn("bgs",
        when(size(col("toks")) < 2, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(1), size(col("toks")) - 1),
            i => concat_ws(" ", slice(col("toks"), i, lit(2))))))
      .select(col("id"), explode(col("bgs")).as("bg"))
    val c2 = bgx.groupBy("bg").agg(count(lit(1)).as("c2"))
    val ex1 = toksDf.select(col("id"), explode(col("toks")).as("t"))
    val c1 = ex1.groupBy("t").agg(count(lit(1)).as("c1"))
    val v = c1.agg(count(lit(1)).as("v"))
    val lp = bgx
      .join(c2, Seq("bg"))
      .join(c1, split(col("bg"), " ").getItem(0) === col("t"))
      .crossJoin(broadcast(v))
      .select(col("id"), col("bg"),
        log((col("c2") + lit(1.0)) / (col("c1") + col("v"))).as("lp"))
    // ordered fold over (bg-sorted) lp values — see charEntropy: a bare
    // double sum() at a rounding cut is the documented parity trap; equal
    // bigrams carry identical lp, so the bg sort pins the order fully
    val agg = lp.groupBy("id").agg(
      count(lit(1)).as("n_bigrams"),
      array_sort(collect_list(struct(col("bg"), col("lp")))).as("__ls"))
      .select(col("id"), col("n_bigrams"),
        round(-aggregate(col("__ls"), lit(0.0),
          (acc, s) => acc + s.getField("lp"))
          * lit(10000.0) / col("n_bigrams"), 0)
          .cast("long").as("nll_e4"))
    docs.select(col(idCol).as("id")).join(agg, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("nll_e4"), lit(0L)).as("nll_e4"))
  }

  /** Character-entropy quality signal per document — the
    * compression-ratio-style boilerplate detector (low-entropy text is
    * repetitive/templated; complements the Gopher repetition rules with a
    * distribution-level measure). `H = ln(n) − (Σ_c count_c·ln count_c)/n`
    * over the characters of `lower(trim(text))`, surfaced ×10⁴; empty
    * docs retained at (0, 0).
    *
    * Scale: char explode → per-(doc, char) hash agg (alphabet-bounded
    * fan-in per doc) → per-doc partial-agg'd reduction — the unigramNll
    * summation pattern. */
  def charEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = lower(trim(col(textCol)))
    val ex = docs.select(col(idCol).as("id"),
      explode(filter(split(t, ""), c => c =!= "")).as("ch"))
    val counts = ex.groupBy("id", "ch").agg(count(lit(1)).as("c"))
    // ORDERED fold for the per-doc double sum: a bare sum() of doubles
    // accumulates in partition-combine order (not guaranteed, and not
    // DuckDB's order) — at a ×1e4 rounding cut that is the documented
    // parity trap. The char alphabet per doc is bounded, so the sorted
    // collect + left-to-right fold (mirrored by list_sum(list(x ORDER BY
    // ch)) in the oracle) costs nothing and is bit-deterministic.
    val agg = counts.groupBy("id").agg(
      sum(col("c")).as("n"),
      array_sort(collect_list(struct(col("ch"), col("c")))).as("__cs"))
      .select(col("id"), col("n"),
        aggregate(col("__cs"), lit(0.0), (acc, s) =>
          acc + s.getField("c").cast("double") *
            log(s.getField("c").cast("double"))).as("clc"))
    docs.select(col(idCol).as("id")).join(agg, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n"), lit(0L)).as("n_chars"),
        coalesce(
          round((log(col("n").cast("double")) - col("clc") / col("n"))
            * 1e4, 0).cast("long"),
          lit(0L)).as("entropy_e4"))
  }

  /** Document frequency of word n-gram shingles: in how many documents each
    * shingle appears, top-k by (df desc, shingle asc). The distinct-per-doc
    * shingle set means one count per containing document. */
  def ngramDocFreq(docs: DataFrame, idCol: String, textCol: String,
      k: Int, topK: Int): DataFrame =
    docs
      .select(col(idCol).as("id"), tokens(col(textCol)).as("__toks"))
      .select(col("id"), explode(wordShingles(col("__toks"), k)).as("shingle"))
      .groupBy("shingle").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("shingle"))
      .limit(topK)

  /** Content fingerprints: full-text md5 plus a winnowing-style robust
    * fingerprint (lexicographic min md5 over char-8-gram shingles — stable
    * under small edits at either end of the document). */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("id"), normText(col(textCol)).as("__lt"))
      .select(
        col("id"),
        md5s(col("__lt")).as("md5_full"),
        array_min(transform(charShingles(col("__lt"), 8), s => md5s(s))).as("fp_min8"))

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): label every
    * doc head/middle/tail by where its LM score falls against exact
    * corpus-level quantile thresholds — the published pre-filtering shape
    * that keeps the whole corpus but stratifies it by fluency. `cuts` are
    * ascending (fraction, label) pairs; docs with `nll_e4 <=
    * quantile(fraction)` take the first matching label, the rest
    * `tailLabel`. Scoring is [[unigramNll]] (action-scope cached — the
    * scored frame feeds both the threshold aggregate and the labeling
    * side); thresholds are the distributed bracket+refine
    * [[Quantiles.quantileCont]] (never the value-buffering Percentile
    * aggregate), broadcast back as ONE row, so labeling is a narrow map.
    * Output `(id, n_tokens, nll_e4, bucket)`. */
  def perplexityBuckets(
      docs: DataFrame, idCol: String, textCol: String,
      cuts: Seq[(Double, String)] = Seq(1.0 / 3 -> "head", 2.0 / 3 -> "middle"),
      tailLabel: String = "tail"): DataFrame = {
    require(cuts.nonEmpty && cuts.map(_._1) == cuts.map(_._1).sorted &&
      cuts.map(_._1).distinct.size == cuts.size &&
      cuts.forall(c => c._1 > 0 && c._1 < 1),
      s"cuts must be strictly ascending fractions in (0,1), got $cuts")
    val scored = OperatorCache.scoped(
      unigramNll(docs, idCol, textCol).withColumn("__all", lit("all")))
    val aggs = cuts.zipWithIndex.map { case ((p, _), i) =>
      max(when(col("p") === lit(p), col("q"))).as(s"__t$i")
    }
    val thr = Quantiles.quantileCont(
        scored.select(col("__all"), col("nll_e4")), "__all", "nll_e4",
        cuts.map(_._1))
      .groupBy("__all").agg(aggs.head, aggs.tail: _*)
    val bucket = cuts.zipWithIndex
      .foldLeft(Option.empty[Column]) { case (acc, ((_, label), i)) =>
        val c = col("nll_e4") <= col(s"__t$i")
        Some(acc.map(_.when(c, lit(label))).getOrElse(when(c, lit(label))))
      }.get.otherwise(lit(tailLabel))
    scored.crossJoin(broadcast(thr.drop("__all"))) // 1 row: the thresholds
      .select(col("id"), col("n_tokens"), col("nll_e4"), bucket.as("bucket"))
  }
}
