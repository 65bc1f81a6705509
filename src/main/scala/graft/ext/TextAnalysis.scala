package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ingest.Tables

/**
 * Text-analysis operators over `documents`: language-ID heuristic, quality
 * scoring, token counting, and content fingerprinting. All pure column
 * expressions — per-row work inside whole-stage codegen, no shuffle at all
 * except the final ORDER BY (dropped in production; present here for
 * deterministic oracle compare). These are the per-document scoring passes
 * of a training-data pipeline: at 100 TB they are embarrassingly parallel
 * map-only scans.
 */
object TextAnalysis {

  /** x9's chars/4 token estimate — the ONE rendering shared by every
    * packer (x46/x49/x55) and the composed pipeline (x60); their oracles
    * pin this exact expression. */
  private[ext] def estTokensOf(text: Column): Column =
    ceil(length(text) / 4.0).cast("long")

  private def estTokensCol: Column = estTokensOf(col("text"))

  /** First md5 byte of `id` mod `n` — the packers' shared shard key
    * (uniform for n dividing 256); oracle-pinned like [[estTokensOf]]. */
  private[ext] def mdShardOf(id: Column, n: Int): Column =
    pmod(conv(substring(md5(id.cast("string")
      .cast("binary")), 1, 2), 16, 10).cast("int"), lit(n))

  private def mdShard(n: Int): Column = mdShardOf(col("doc_id"), n)

  private[ext] val stopwords = Seq("the", "a", "of", "and", "to", "in", "is")
  private[ext] val dataWords = Seq("spark", "table", "query", "join", "batch",
    "stream", "vector", "column")

  /**
   * Language-ID by token-profile voting: score the token stream against
   * per-language profiles (here: an English function-word profile vs a
   * data/tech jargon profile), predict the higher-scoring one. A real
   * deployment swaps in per-language character-n-gram profiles; the scoring
   * plan (explode → conditional agg → argmax) is identical.
   */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val toks = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("tok"))
    toks.groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("tok").isin(stopwords: _*), 1).otherwise(0)).as("en_hits"),
        sum(when(col("tok").isin(dataWords: _*), 1).otherwise(0)).as("data_hits"))
      .withColumn("pred_lang",
        when(col("en_hits") >= col("data_hits"), lit("en"))
          .otherwise(lit("data")))
      .withColumn("confidence",
        round(greatest(col("en_hits"), col("data_hits"))
          .cast("double") / col("n_tokens"), 6))
      .select(col("doc_id"), col("pred_lang"), col("en_hits"),
        col("data_hits"), col("confidence"))
      .orderBy(col("doc_id"))
  }

  /** Occurrences of a substring via the length-difference trick —
    * identical semantics in any SQL engine. */
  private def occurrences(text: Column, pat: String): Column =
    (length(text) - length(regexp_replace(text, java.util.regex.Pattern.quote(pat), ""))) / pat.length

  // character-bigram profiles (the classic Cavnar-Trenkle n-gram cue set,
  // trimmed): English function-word bigrams vs tech-jargon bigrams
  private val enBigrams = Seq("th", "he", "an", "re", "er")
  private val dataBigrams = Seq("qu", "rk", "ba", "ve", "jo")

  /**
   * Language-ID by character-n-gram profile scoring (x7's token-profile
   * voting is the word-level variant): count profile-bigram occurrences
   * over the raw character stream, normalize by text length, predict the
   * higher-scoring profile. Pure column expressions — map-only at scale.
   */
  def langIdNgram(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val enScore = enBigrams.map(occurrences(col("text"), _)).reduce(_ + _)
    val dataScore = dataBigrams.map(occurrences(col("text"), _)).reduce(_ + _)
    docs.select(col("doc_id"),
        enScore.cast("long").as("en_ngrams"),
        dataScore.cast("long").as("data_ngrams"),
        length(col("text")).cast("long").as("n_chars"))
      .withColumn("pred_lang",
        when(col("en_ngrams") >= col("data_ngrams"), lit("en"))
          .otherwise(lit("data")))
      .withColumn("density",
        round((col("en_ngrams") + col("data_ngrams")) / col("n_chars"), 6))
      .orderBy(col("doc_id"))
  }

  /**
   * Quality scoring: length, token count, type-token ratio, average token
   * length, stopword ratio, and a composite score — the standard cheap
   * filters applied before expensive model-based scoring.
   */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val toks = split(col("text"), " ")
    docs.select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_types"))
      .withColumn("ttr", round(col("n_types").cast("double") / col("n_tokens"), 6))
      .withColumn("avg_tok_len",
        round((col("n_chars") - col("n_tokens") + 1).cast("double")
          / col("n_tokens"), 6))
      .withColumn("score",
        round(least(lit(1.0), col("n_tokens").cast("double") / 100)
          * col("ttr"), 6))
      .orderBy(col("doc_id"))
  }

  /**
   * Model-based quality classification (x70) — the step the x8 heuristics
   * gate ahead of: a fastText-style hashed-linear classifier scored at
   * inference time over every document (the FineWeb-Edu / DCLM filtering
   * shape). Each token occurrence hashes into one of 1024 weight buckets
   * ([[graft.functions.HashedLinearScore]]'s pinned md5 contract) and the
   * document's score is the integer weight sum; `kept = score > 0` is the
   * filter decision. The weight table is a deterministic closed form —
   * `w(b) = (b·131 mod 997) − 498` — so the DuckDB oracle recomputes the
   * exact scores without a model artifact; swapping trained weights in
   * changes one lookup, not the plan.
   *
   * Plan: ONE map-only projection (native per-row fold — no explode, no
   * shuffle, no higher-order interpreted lambda); at 100 TB this runs at
   * scan speed next to the x8 heuristics in the same stage.
   */
  def qualityClassifier(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    docs.select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        graft.functions.HashedLinearScore.hashedLinearScore(col("text"))
          .as("score"))
      .withColumn("kept", col("score") > 0)
      .orderBy(col("doc_id"))
  }

  /**
   * Token counting: whitespace tokens, a BPE-ish regex segmentation
   * (letter runs / digit runs / other), and the chars/4 heuristic LLM
   * token estimate.
   */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    docs.select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("ws_tokens"),
        size(regexp_extract_all(col("text"),
          lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0))).cast("long").as("bpe_ish_tokens"),
        ceil(length(col("text")).cast("double") / 4).cast("long")
          .as("est_llm_tokens"))
      .orderBy(col("doc_id"))
  }

  /**
   * Tokenizer fertility by language — the multilingual-pretraining
   * budget table: how many BPE-ish tokens a language costs per unit of
   * text. High-fertility languages are over-charged by a shared
   * tokenizer (each char yields more tokens), which skews any
   * token-budgeted mixture; this is the diagnostic that drives
   * per-language sampling corrections. Exact integers only: token and
   * char SUMS per language plus fertility as tokens-per-10k-chars by
   * positive floor-division (the x56 rule — never a rounded average).
   * One map-side-combined shuffle on `lang` (dozens of keys; partial
   * aggregation absorbs the skew of dominant languages), linear scans
   * of `text` in the tokenizer regex.
   */
  def tokenizerFertility(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "documents")
      .select(col("lang"),
        size(regexp_extract_all(col("text"),
          lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0)))
          .cast("long").as("toks"),
        length(col("text")).cast("long").as("chars"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).as("tokens"),
        sum(col("chars")).as("chars"))
      .withColumn("tok_per_10k_chars",
        expr("(tokens * 10000) div chars"))
      .orderBy(col("lang"))
  }

  /**
   * Length-binned batching audit — the seq2seq batch-shaping table:
   * documents bucketed into fixed-width token-length bins (the padded
   * sequence length a bucketed batcher would allocate; 16 tokens here
   * so the synthetic 10-99-token fixtures spread across ~6 bins — a
   * production tokenizer swaps in 128/256), with the padding waste
   * each bin pays. Pure positive-integer arithmetic:
   * `bin_hi = ((t-1) div W + 1) * W` with `t` floored at 1 (an
   * empty doc tokenizes to 0 and a NEGATIVE floor-div numerator splits
   * engines: Spark `div` truncates toward zero, DuckDB `//` floors),
   * padded = bin_hi * n_docs, waste in basis points by floor-div of a
   * positive numerator. Map-only binning then one tiny shuffle on the
   * bin key — the output is |bins| rows regardless of corpus size.
   */
  def lengthBins(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "documents")
      .select(greatest(
        size(regexp_extract_all(col("text"),
          lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0))).cast("long"),
        lit(1L)).as("toks"))
      .withColumn("bin_hi", expr("((toks - 1) div 16 + 1) * 16"))
      .groupBy(col("bin_hi"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("sum_tokens"))
      .withColumn("padded_tokens", col("bin_hi") * col("n_docs"))
      .withColumn("waste_bp",
        expr("((padded_tokens - sum_tokens) * 10000) div padded_tokens"))
      .orderBy(col("bin_hi"))
  }

  /**
   * TF-IDF keyword extraction: top-3 terms per document by
   * tf · ln(N/df), deterministic tiebreak on the term. The classic
   * two-aggregation shape: term frequencies shuffle on (doc, term),
   * document frequencies on term. N is folded into the plan as a 1-row
   * broadcast aggregate (NOT a driver-side `count()` — that would run an
   * extra full pass over the corpus before the real job). The df join is
   * left to AQE: at fixture scale it broadcasts, at corpus scale the
   * vocabulary-sized df table may be too large to broadcast and AQE picks
   * a shuffle join instead of OOMing the executors.
   */
  def tfidfTopTerms(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, dir, "documents")
    val nDocs = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    // ES-analyzed terms (lowercase + punctuation split), so the TF-IDF
    // vocabulary matches what the search surface (bm25/kq18) tokenizes
    val toks = docs.select(col("doc_id"),
      explode(graft.functions.AnalyzeTokens.analyze(col("text"))).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = toks.select(col("doc_id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    tf.join(df, "term")
      .crossJoin(broadcast(nDocs)) // 1-row scalar, not a corpus-side cross
      .withColumn("score",
        round(col("tf") * log(col("n_docs") / col("df")), 6))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("score"), col("rk"))
      .orderBy(col("doc_id"), col("rk"))
  }

  /**
   * BM25-ranked full-text search — the relevance-scored match query of
   * the Kibana surface (the reference's users get this from ES `match`;
   * the engine's Q4 field search is equality-only without it). Standard
   * Okapi BM25 (k1 = 1.2, b = 0.75):
   *   score(d) = Σ_t idf(t) · tf · (k1+1) / (tf + k1·(1−b+b·len/avgdl)),
   *   idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).
   *
   * Scale + determinism shape: the token stream is filtered to the QUERY
   * TERMS first (the tiny side), so the only aggregations run over
   * matching postings — at 100 TB this is the classic "score only the
   * candidate postings" layout, one shuffle on doc_id. Per-term tf/df are
   * INTEGER conditional sums (exact, order-independent) and the double
   * formula is evaluated per term in a FIXED expression order, so the
   * DuckDB oracle reproduces every score bit-for-bit — no
   * sum-of-doubles-across-rows anywhere.
   */
  /**
   * x84 — SEARCH RELEVANCE EVALUATION (the ES `rank_eval` API):
   * precision@k, recall@k, MRR and DCG@k for a set of ranked queries
   * against graded judgments, in ONE pass over the postings. Each query
   * is a single analyzed term ranked by its own BM25 leg (the x22
   * formula per term, 6dp-rounded); judgments are derived from the
   * corpus deterministically — rating = min(tf, 3), relevant iff
   * tf ≥ 2 (ES's `relevant_rating_threshold`) — so the oracle can
   * rebuild them exactly.
   *
   * Determinism: set metrics (precision/recall/MRR) are exact integer
   * ppm by floor division; DCG's per-position contribution
   * `(2^rating − 1)·ln2 / ln(pos+1)` is 6dp-rounded and DECIMAL-summed
   * in the x44 recipe (ln is bit-identical across engines, division is
   * IEEE), so partitioning can never flip a metric. Scale shape: one
   * postings-pruned pass builds tf/df/judgments together; rankings are
   * per-term bounded windows over score>0 postings only; every
   * downstream frame is judgment-sized.
   */
  def rankEval(spark: SparkSession, dir: String,
      terms: Seq[String] = Seq("spark", "query", "stream"), k: Int = 10,
      relThreshold: Int = 2, k1: Double = 1.2, b: Double = 0.75)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, dir, "documents")
    val qTerms = terms.map(_.toLowerCase(java.util.Locale.ROOT))
    val tokens = graft.functions.AnalyzeTokens.analyze(col("text"))
    val stats = docs.agg(count(lit(1)).cast("double").as("n_docs"),
      sum(size(tokens)).cast("double").as("sum_len"))
    val tf = docs.select(col("doc_id"), tokens.as("toks"))
      .select(col("doc_id"), size(col("toks")).as("len"),
        explode(col("toks")).as("term"))
      .where(col("term").isin(qTerms: _*))
      .groupBy(col("term"), col("doc_id"), col("len"))
      .agg(count(lit(1)).as("tf"))
    val dfs = tf.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("df"))
    val rel = tf.where(col("tf") >= relThreshold)
      .groupBy(col("term")).agg(count(lit(1)).as("n_relevant"))
    val tfd = col("tf").cast("double")
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val norm = tfd + lit(k1) * (lit(1.0 - b) +
      lit(b) * col("len").cast("double") / (col("sum_len") / col("n_docs")))
    val scored = tf.join(broadcast(dfs), "term").crossJoin(broadcast(stats))
      .withColumn("score", round(idf * (tfd * lit(k1 + 1)) / norm, 6))
      .where(col("score") > 0)
    val w = Window.partitionBy(col("term"))
      .orderBy(col("score").desc, col("doc_id"))
    val top = scored.withColumn("pos", row_number().over(w))
      .where(col("pos") <= k)
      .withColumn("rating", least(col("tf"), lit(3L)))
      .withColumn("relevant",
        (col("tf") >= relThreshold).cast("long"))
      .withColumn("gain", when(col("rating") === 1, 1.0)
        .when(col("rating") === 2, 3.0).otherwise(7.0))
      .withColumn("dcg_c", round(col("gain") * log(lit(2.0)) /
          log(col("pos").cast("double") + lit(1.0)), 6)
        .cast("decimal(20,6)"))
    top.groupBy(col("term")).agg(
        sum(col("relevant")).as("n_rel_at_k"),
        min(when(col("relevant") === 1, col("pos"))).as("first_rel_pos"),
        sum(col("dcg_c")).as("dcg_sum"))
      .join(broadcast(rel), "term")
      .select(col("term"), col("n_relevant"), col("n_rel_at_k"),
        expr(s"n_rel_at_k * 1000000 div $k").cast("long")
          .as("precision_ppm"),
        expr("n_rel_at_k * 1000000 div n_relevant").cast("long")
          .as("recall_ppm"),
        coalesce(expr("1000000 div first_rel_pos"), lit(0L)).cast("long")
          .as("mrr_ppm"),
        col("dcg_sum").cast("double").as("dcg"))
      .orderBy(col("term"))
  }

  def bm25Search(spark: SparkSession, dir: String,
      terms: Seq[String] = Seq("spark", "query", "stream"),
      k: Int = 20): DataFrame =
    bm25(Tables.load(spark, dir, "documents"), "doc_id", "text", terms, k)

  /** Generic BM25 core over any (id, text) frame — reused by the
    * changelog facade's `matchQuery` (ranked search over payload JSON)
    * and the x22 corpus query above.
    *
    * Both the documents AND the query terms go through the ES-standard
    * analyzer ([[graft.functions.AnalyzeTokens]]: lowercase +
    * punctuation split), matching how the reference's users search —
    * Kibana's match query analyzes both sides, so `"Spark,"` in a log
    * line matches the query `Spark` (reference README.md:40-42). */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val id = col(idCol)
    val qTerms = terms.map(_.toLowerCase(java.util.Locale.ROOT))
    val tokens = graft.functions.AnalyzeTokens.analyze(col(textCol))
    val stats = docs.agg(
      count(lit(1)).cast("double").as("n_docs"),
      sum(size(tokens)).cast("double").as("sum_len"))
    // tokenize ONCE per row: size(tokens) + explode(tokens) in one
    // projection would evaluate the AnalyzeTokens expression twice
    val toks = docs.select(id, tokens.as("toks"))
      .select(id, size(col("toks")).as("len"),
        explode(col("toks")).as("term"))
      .where(col("term").isin(qTerms: _*)) // prune to the query postings
    val tfCols = qTerms.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === t, 1).otherwise(0)).as(s"tf_$i")
    }
    // Per-term document frequencies WITHOUT countDistinct: N parallel
    // countDistincts compile to a multi-distinct Expand that replicates
    // every posting row N times before the shuffle — the same
    // anti-pattern whose removal took x29 from 10.2 s to 0.26 s. One
    // (id, term) distinct pass, then plain conditional sums.
    val dfCols = qTerms.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === t, 1L).otherwise(0L)).as(s"df_$i")
    }
    val perDoc = toks.groupBy(id, col("len"))
      .agg(tfCols.head, tfCols.tail: _*)
    val dfs = toks.select(id, col("term")).distinct()
      .agg(dfCols.head, dfCols.tail: _*)
    val scored = perDoc
      .crossJoin(broadcast(dfs))   // 1 row
      .crossJoin(broadcast(stats)) // 1 row
    val termScore = terms.indices.map { i =>
      val tf = col(s"tf_$i").cast("double")
      val df = col(s"df_$i").cast("double")
      val idf = log(lit(1.0) +
        (col("n_docs") - df + lit(0.5)) / (df + lit(0.5)))
      val norm = tf + lit(k1) * (lit(1.0 - b) +
        lit(b) * col("len").cast("double") / (col("sum_len") / col("n_docs")))
      idf * (tf * lit(k1 + 1)) / norm
    }.reduce(_ + _) // fixed left-to-right term order — both engines agree
    // top-k via orderBy+limit (TakeOrderedAndProject — per-partition heaps,
    // no global sort); the rank window then runs over k rows only
    val top = scored.withColumn("score", round(termScore, 6))
      .where(col("score") > 0)
      .orderBy(col("score").desc, id)
      .limit(k)
    // the frame is ≤ k rows (post-limit), so a single partition is exactly
    // right. The partition key is a non-foldable zero: a literal would be
    // constant-folded out of the spec and WindowExec would warn as if the
    // frame were unbounded ((score - score) can't be folded — NaN/∞
    // semantics — but is 0.0 for every finite score, and scores here are
    // finite by construction).
    val w = Window.partitionBy(col("score") - col("score"))
      .orderBy(col("score").desc, id)
    top.withColumn("rank", row_number().over(w))
      .select(id, col("score"), col("rank"))
      .orderBy(col("rank"))
  }

  /**
   * SIGNIFICANT TERMS — Kibana's `significant_terms` aggregation: which
   * terms are OVERREPRESENTED in a foreground slice (here `source =
   * 'src0'`) relative to the whole corpus. Scored as the
   * foreground-to-background document-frequency lift
   * `(fg_df/fg_docs) / (bg_df/bg_docs)` with a minimum foreground
   * support of 5 docs (Kibana's min_doc_count), top 20 by (lift, term).
   *
   * One distinct-token explode + one term-keyed aggregation computing
   * BOTH frequencies in a single pass, a broadcast of the 1-row totals —
   * no per-term joins, no second corpus scan. Because the explode is over
   * `array_distinct`, every (doc, term) row is already unique, so the
   * document frequencies are plain `count`/conditional-`sum` — NOT
   * `countDistinct`, whose multi-distinct Expand would double the shuffle
   * volume for nothing (measured 10.2 s → ~1 s at sf0.1). Lift is integer
   * counts through one fixed-order double expression, so both engines
   * compute identical bits.
   */
  def significantTerms(spark: SparkSession, dir: String,
      fgSource: String = "src0", minFgDf: Int = 5, k: Int = 20): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    // terms are ANALYZED (AnalyzeTokens, like ES's significant_terms over
    // an analyzed field) — the last search-family operator moved off the
    // whitespace split; on this corpus (lowercase space-separated words)
    // the streams coincide, but the semantic contract now matches
    // x15/x22/kq21
    val toks = docs.select(col("doc_id"), col("source"),
      explode(array_distinct(
        graft.functions.AnalyzeTokens.analyze(col("text")))).as("term"))
    val totals = docs.agg(count(lit(1)).as("n_docs"),
      sum(when(col("source") === fgSource, 1).otherwise(0)).as("fg_docs"))
    toks.groupBy(col("term"))
      .agg(count(lit(1)).as("bg_df"),
        sum(when(col("source") === fgSource, 1L).otherwise(0L)).as("fg_df"))
      .crossJoin(broadcast(totals))
      .where(col("fg_df") >= minFgDf)
      .withColumn("lift", round(
        (col("fg_df").cast("double") / col("fg_docs"))
          / (col("bg_df").cast("double") / col("n_docs")), 6))
      .select(col("term"), col("fg_df"), col("bg_df"), col("lift"))
      .orderBy(col("lift").desc, col("term"))
      .limit(k)
  }

  /**
   * Unigram language-model scoring — the perplexity-style quality filter
   * of CCNet-like pipelines: score every document by the mean log
   * probability of its tokens under the corpus unigram distribution
   * (rare-garbage-heavy docs score low and get dropped). Self-scored
   * here (the LM is the corpus itself); production swaps in a reference
   * corpus' frequency table — the plan is identical: one aggregation for
   * the frequency table, one token↔freq join, one per-doc aggregation.
   *
   * Determinism: a per-doc SUM of double log-probs would depend on
   * partitioning/merge order. Instead each token's log-prob is rounded
   * to 9 dp and summed as DECIMAL(28,12) — exact, order-independent
   * addition — then divided by the token count. ln() outputs never land
   * on .5e-9 decimal boundaries (a double's decimal expansion doesn't
   * terminate at digit 10), so the rounding itself can't diverge between
   * engines either.
   */
  def unigramLogprob(spark: SparkSession, dir: String,
      cutoff: Double = -8.0): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val toks = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("tok"))
    val total = toks.agg(count(lit(1)).cast("double").as("n_total"))
    val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("n_tok"))
    toks.join(freq, "tok")
      .crossJoin(broadcast(total)) // 1-row scalar
      .withColumn("lp",
        round(log(col("n_tok").cast("double") / col("n_total")), 9)
          .cast("decimal(28,12)"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("lp")).as("sum_lp")) // decimal: exact, order-independent
      .withColumn("avg_logprob",
        round(col("sum_lp").cast("double") / col("n_tokens"), 6))
      .withColumn("keep", col("avg_logprob") >= cutoff)
      .select(col("doc_id"), col("n_tokens"), col("avg_logprob"), col("keep"))
      .orderBy(col("doc_id"))
  }

  /**
   * PII anonymization pass over the event log: stable pseudonymous key
   * (sha-256 of the raw key — joinable but not reversible), digits in the
   * free-form payload redacted. The standard pre-release scrub of a
   * training corpus; pure column work, map-only at scale.
   */
  def anonymize(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    ev.select(
        col("event_id"),
        sha2(col("user_id").cast("string").cast("binary"), 256)
          .as("user_pseudonym"),
        col("event_type"),
        regexp_replace(col("props"), "[0-9]", "#").as("props_redacted"))
      .where(col("event_id") < 2000)
      .orderBy(col("event_id"))
  }

  /**
   * Weighted corpus mixture: deterministic per-source sampling rates
   * (full / half / quarter by md5 bucket — the reproducible "data
   * recipe" step that builds a training mix from heterogeneous sources).
   * Same selection on every engine and every run.
   */
  /**
   * x67 — STRATIFIED TRAIN/VAL/TEST SPLIT: the deterministic hash split
   * every corpus build ships — bucket = first 8 md5 hex digits of the
   * doc id, mod 1000; buckets <960 train, <980 val, rest test. A doc's
   * assignment depends only on its own id, so the split is stable under
   * corpus growth and identical across engines/runs (the q19/x36 md5
   * recipe), and per-source stratification is free because the hash is
   * uniform within every source. Emits the per-(source, split) audit
   * table: doc counts, token sums, bucket range. Map-only projection +
   * one hash aggregate over ~|sources|×3 groups — a single pass at any
   * scale, no shuffle beyond the tiny final aggregate.
   */
  def stratifiedSplit(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 8),
      16, 10).cast("long") % 1000
    val part = when(col("bucket") < 960, "train")
      .when(col("bucket") < 980, "val").otherwise("test")
    docs.select(col("source"), col("doc_id"), bucket.as("bucket"),
        size(split(col("text"), " ")).cast("long").as("n_toks"))
      .withColumn("part", part)
      .groupBy(col("source"), col("part"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("tok_sum"),
        min(col("bucket")).as("b_min"),
        max(col("bucket")).as("b_max"))
      .orderBy(col("source"), col("part"))
  }

  /**
   * x85 — DATASET CARD: the per-source summary table a curation pipeline
   * publishes with every release (HuggingFace dataset-card / Datasheets
   * for Datasets shape): doc and token counts, mean length, short-doc
   * and exact-duplicate tallies, vocabulary size, and the most frequent
   * token — every figure an EXACT integer (counts, sums, floor-divided
   * permille; no averages), so the card is reproducible bit-for-bit on
   * any engine and any partitioning.
   *
   * Scale shape: one doc-level pass (md5 + token count in the scan
   * projection) feeds the per-source rollup and the duplicate tally
   * (content-hash groupBy — x1's shuffle); one explode pass feeds the
   * (source, token) vocabulary aggregate, whose per-source top-1 is a
   * bounded window over vocabulary-sized data. Nothing collects; every
   * join key is `source` (a handful of groups), joined small-to-small
   * after aggregation.
   */
  def datasetCard(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, dir, "documents")
      .select(col("source"), col("doc_id"), col("text"),
        split(col("text"), " ").as("toks"))
    val base = docs.select(col("source"), md5(col("text")).as("h"),
      size(col("toks")).cast("long").as("n_tok"))
    val perSource = base.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_tok")).as("token_sum"),
      sum(when(col("n_tok") < 20, 1L).otherwise(0L)).as("short_docs"))
    val dups = base.groupBy(col("source"), col("h"))
      .agg(count(lit(1)).as("c")).where(col("c") > 1)
      .groupBy(col("source")).agg(sum(col("c")).as("dup_docs"))
    val tok = docs.select(col("source"), explode(col("toks")).as("token"))
      .groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("n_occ"))
    val vocab = tok.groupBy(col("source"))
      .agg(count(lit(1)).as("distinct_tokens"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_occ").desc, col("token"))
    val top = tok.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("source"), col("token").as("top_token"),
        col("n_occ").as("top_token_occ"))
    perSource
      .join(dups, Seq("source"), "left")
      .na.fill(0L, Seq("dup_docs"))
      .join(vocab, Seq("source"))
      .join(top, Seq("source"))
      .withColumn("mean_tokens_permille",
        expr("token_sum * 1000 div n_docs").cast("long"))
      .select(col("source"), col("n_docs"), col("token_sum"),
        col("mean_tokens_permille"), col("short_docs"), col("dup_docs"),
        col("distinct_tokens"), col("top_token"), col("top_token_occ"))
      .orderBy(col("source"))
  }

  /**
   * x91 — DIFFERENTIALLY-PRIVATE count release (ε-DP, Laplace
   * mechanism): per-source doc counts published with Laplace(1/ε) noise
   * — the privacy-preserving statistics release a data clearing-house
   * runs before sharing corpus composition (counting queries have
   * sensitivity 1, so `b = 1/ε`). The Laplace sample is the inverse-CDF
   * transform `−b·sgn(u−½)·ln(1−2|u−½|)` of a DETERMINISTIC md5-seeded
   * uniform (`(h+0.5)/2³²`, x36's recipe — never exactly ½ because the
   * numerator `2h+1−2³²` is odd, so the ln argument is never 0), frozen
   * to exact integer nano-units (x56's 9dp DECIMAL schedule), so the
   * release is reproducible bit-for-bit — real deployments swap the
   * seeded uniform for a CSPRNG and drop `n_docs`; both facts are the
   * oracle's requirements, not the operator's limits. Map-only after
   * one tiny per-source aggregate.
   */
  def dpRelease(spark: SparkSession, dir: String,
      epsilon: Double = 1.0): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val h = conv(substring(md5(concat(lit("dp:"), col("source"))), 1, 8),
      16, 10).cast("long")
    val u = (h.cast("double") + lit(0.5)) / lit(4294967296.0)
    val absTerm = abs(u - lit(0.5))
    val noise = -lit(1.0 / epsilon) * signum(u - lit(0.5)) *
      log(lit(1.0) - lit(2.0) * absTerm)
    val noiseNano = (round(noise, 9).cast("decimal(20,9)") * 1000000000L)
      .cast("long")
    docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .withColumn("noise_nano", noiseNano)
      .select(col("source"), col("n_docs"), col("noise_nano"),
        (col("n_docs") * 1000000000L + col("noise_nano"))
          .as("released_nano"))
      .orderBy(col("source"))
  }

  /**
   * x92 — K-ANONYMITY with hierarchy generalization (Sweeney 2002), the
   * other half of the privacy pair (x91 protects aggregates; this
   * protects the microdata): quasi-identifier groups
   * (mktsegment, nation) smaller than k are GENERALIZED one hierarchy
   * level up (nation → region, the TPC-H geography); groups still under
   * k after generalization are SUPPRESSED — the release discipline
   * before sharing per-customer rows. Output is the per-original-group
   * verdict: release at nation level, at region level (with the merged
   * size), or suppress. All counts exact integers; generalization is
   * one broadcast join to the 25-row nation dim + one region-level
   * re-aggregate of only the FAILING groups (the standard bottom-up
   * local recoding), so cost is two tiny aggregates above one scan.
   */
  def kAnonymize(spark: SparkSession, dir: String, k: Int = 5)
      : DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
    val nation = Tables.load(spark, dir, "nation")
      .select(col("n_nationkey"), col("n_regionkey"))
    val l0 = cust.groupBy(col("c_mktsegment"), col("c_nationkey"))
      .agg(count(lit(1)).as("n_custs"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .drop("n_nationkey")
    val l1 = l0.where(col("n_custs") < k)
      .groupBy(col("c_mktsegment"), col("n_regionkey"))
      .agg(sum(col("n_custs")).as("n_region"))
    l0.join(l1, Seq("c_mktsegment", "n_regionkey"), "left")
      .select(col("c_mktsegment"), col("c_nationkey"),
        col("n_regionkey"), col("n_custs"),
        when(col("n_custs") >= k, "nation")
          .when(coalesce(col("n_region"), lit(0L)) >= k, "region")
          .otherwise("suppressed").as("level"),
        when(col("n_custs") >= k, col("n_custs"))
          .when(coalesce(col("n_region"), lit(0L)) >= k, col("n_region"))
          .otherwise(lit(0L)).as("released_size"))
      .orderBy(col("c_mktsegment"), col("c_nationkey"))
  }

  /**
   * x121 — L-DIVERSITY audit (Machanavajjhala et al. 2007), the gap
   * k-anonymity (x92) leaves open: a group can be large enough to
   * release yet have every member share the same SENSITIVE value —
   * group size protects identity, not the attribute. Per
   * quasi-identifier group (mktsegment, nation) over the released
   * x92-style microdata, count DISTINCT sensitive values (the account
   * balance bucketed to coarse bands — sign and magnitude, the
   * attribute a release would leak) and the size of the largest
   * single-value block; the group passes distinct-l-diversity iff it
   * has ≥ l distinct sensitive values. All exact integers (counts,
   * distinct counts, a max) — one group-by with a distinct aggregate,
   * partial-aggregated map-side like any other; at 100 TB the
   * sensitive domain is tiny so the distinct count never blows up
   * the hash table.
   */
  def lDiversity(spark: SparkSession, dir: String, l: Int = 2)
      : DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
      // sensitive bands: negative / low / high balance — integer cents
      // thresholds so the band edges are exact
      .withColumn("sens",
        when(col("c_acctbal") < 0, "debt")
          .when(col("c_acctbal") < 5000, "low")
          .otherwise(lit("high")))
    cust.groupBy(col("c_mktsegment"), col("c_nationkey"))
      .agg(count(lit(1)).as("n_custs"),
        countDistinct(col("sens")).as("n_sens"))
      .join(
        cust.groupBy(col("c_mktsegment"), col("c_nationkey"), col("sens"))
          .agg(count(lit(1)).as("block"))
          .groupBy(col("c_mktsegment"), col("c_nationkey"))
          .agg(max(col("block")).as("max_block")),
        Seq("c_mktsegment", "c_nationkey"))
      .withColumn("l_diverse",
        when(col("n_sens") >= l, 1L).otherwise(0L))
      .select(col("c_mktsegment"), col("c_nationkey"), col("n_custs"),
        col("n_sens"), col("max_block"), col("l_diverse"))
      .orderBy(col("c_mktsegment"), col("c_nationkey"))
  }

  /**
   * x122 — CORPUS DIVERSITY: per-source unigram Shannon entropy in
   * exact integer nano-nats plus the type-token ratio in permille —
   * the diversity panel of a dataset card (x85 counts and dups; this
   * measures how REPETITIVE a source's token distribution is, the
   * signal that separates boilerplate-heavy crawl slices from diverse
   * text). Exactness: H·n = Σ c_t·(ln n − ln c_t) with each ln frozen
   * to the x56 nano-nat schedule, summed as exact longs and
   * floor-divided by the positive n — never a floating average. One
   * explode + two map-side-combinable aggregations; the totals table
   * (|sources| rows) broadcasts back onto the per-token counts.
   */
  def unigramEntropy(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.load(spark, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("c"))
    val totals = counts.groupBy(col("source"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("vocab"))
    counts.join(broadcast(totals), "source")
      .withColumn("contrib",
        col("c") * (lnNano(col("n")) - lnNano(col("c"))))
      .groupBy(col("source"))
      .agg(first(col("n")).as("n_tokens"),
        first(col("vocab")).as("vocab"),
        sum(col("contrib")).as("hsum"))
      .withColumn("entropy_nano", expr("hsum div n_tokens"))
      .withColumn("ttr_permille", expr("(vocab * 1000) div n_tokens"))
      .select(col("source"), col("n_tokens"), col("vocab"),
        col("entropy_nano"), col("ttr_permille"))
      .orderBy(col("source"))
  }

  /**
   * x123 — FILL-IN-THE-MIDDLE (FIM) transformation (Bavarian et al.
   * 2022): each document is split at two hash-derived token cuts into
   * (prefix, middle, suffix) and re-emitted in PSM order — prefix,
   * suffix, then middle behind sentinel tokens — so a causal LM learns
   * infilling from plain next-token prediction. The cuts are
   * md5-seeded from the doc id (reproducible on any partitioning, no
   * RNG state — the q19/x36 hash-sampling discipline); degenerate cuts
   * (c1 = c2) legally yield an empty middle. Map-only: one pass, no
   * shuffle before the output sort; at 100 TB this composes with the
   * pack stage (x55) unchanged. Docs under 3 tokens pass through
   * untransformed (fim_applied = 0) — the production rate knob.
   */
  def fimSplit(spark: SparkSession, dir: String): DataFrame = {
    def cutHash(salt: String): Column =
      conv(substring(md5(concat(col("doc_id").cast("string"),
        lit(salt))), 1, 8), 16, 10).cast("long")
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
    val eligible = col("n") >= 3
    val a = lit(1L) + pmod(cutHash(":fim-a"), col("n") - 1)
    val b = lit(1L) + pmod(cutHash(":fim-b"), col("n") - 1)
    docs
      .withColumn("c1", when(eligible, least(a, b)))
      .withColumn("c2", when(eligible, greatest(a, b)))
      .withColumn("fim_applied", when(eligible, 1L).otherwise(0L))
      // explicit concat, not concat_ws: an EMPTY middle must yield
      // "...<MID>" with no trailing separator — Spark's concat_ws keeps
      // empty-string elements while DuckDB's drops them, so the two
      // would disagree exactly on degenerate (c1 = c2) cuts
      .withColumn("psm_text", when(eligible, {
        val mid = concat_ws(" ",
          slice(col("toks"), (col("c1") + 1).cast("int"),
            (col("c2") - col("c1")).cast("int")))
        concat(lit("<PRE> "),
          concat_ws(" ", slice(col("toks"), lit(1), col("c1").cast("int"))),
          lit(" <SUF> "),
          concat_ws(" ", slice(col("toks"), (col("c2") + 1).cast("int"),
            (col("n") - col("c2")).cast("int"))),
          lit(" <MID>"),
          when(col("c2") === col("c1"), lit(""))
            .otherwise(concat(lit(" "), mid)))
      }).otherwise(concat_ws(" ", col("toks"))))
      .select(col("doc_id"), col("n").as("n_tokens"), col("c1"),
        col("c2"), col("fim_applied"), col("psm_text"))
      .orderBy(col("doc_id"))
  }

  /**
   * x124 — T5-STYLE SPAN CORRUPTION (Raffel et al. 2020): ~15 % of each
   * document's tokens are masked in length-3 spans, each span replaced
   * by a numbered sentinel in the INPUT and emitted after its sentinel
   * in the TARGET — the denoising objective's data transform as a
   * deterministic map-only pass. Span placement is md5-seeded per
   * (doc, span) with one span per equal segment, so spans never
   * overlap, the output is reproducible on any partitioning, and the
   * DuckDB oracle replays every token decision exactly (pure integer
   * arithmetic: segment bounds by floor-div, offsets by mod). Docs
   * under 10 tokens pass through (applied = 0). The per-token lambda
   * work is linear in doc length; at 100 TB the same transform drops
   * into the native-expression tier if profiling demands (the x117
   * winnow precedent) — semantics are pinned here either way.
   */
  def spanCorruption(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"),
        split(col("text"), " ").as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
      .withColumn("s", expr(
        "CASE WHEN n >= 10 THEN greatest(1L, (n * 15) div 300) " +
          "ELSE 0L END"))
      .withColumn("spans", expr(
        """CASE WHEN n >= 10 THEN
          |  transform(sequence(0L, s - 1), j -> named_struct(
          |    'j', j,
          |    'st', (j * n) div s + pmod(
          |      CAST(conv(substring(md5(concat(CAST(doc_id AS STRING),
          |        ':span-', CAST(j AS STRING))), 1, 8), 16, 10) AS BIGINT),
          |      ((j + 1) * n) div s - (j * n) div s - 2)))
          |ELSE CAST(array() AS ARRAY<STRUCT<j: BIGINT, st: BIGINT>>) END
          |""".stripMargin))
      .withColumn("input_text", expr(
        """CASE WHEN n >= 10 THEN
          |  concat_ws(' ', flatten(transform(sequence(0L, n - 1), p ->
          |    CASE
          |      WHEN size(filter(spans, sp -> sp.st = p)) > 0
          |      THEN array(concat('<X_',
          |        CAST(filter(spans, sp -> sp.st = p)[0].j AS STRING), '>'))
          |      WHEN size(filter(spans,
          |        sp -> p > sp.st AND p < sp.st + 3)) > 0
          |      THEN CAST(array() AS ARRAY<STRING>)
          |      ELSE array(toks[CAST(p AS INT)]) END)))
          |ELSE text END""".stripMargin))
      .withColumn("target_text", expr(
        """CASE WHEN n >= 10 THEN
          |  concat_ws(' ', flatten(transform(spans, sp -> array(
          |    concat('<X_', CAST(sp.j AS STRING), '>'),
          |    toks[CAST(sp.st AS INT)],
          |    toks[CAST(sp.st + 1 AS INT)],
          |    toks[CAST(sp.st + 2 AS INT)]))))
          |ELSE '' END""".stripMargin))
      .select(col("doc_id"), col("n").as("n_tokens"),
        col("s").as("n_spans"), (col("s") * 3).as("corrupted_tokens"),
        col("input_text"), col("target_text"))
      .orderBy(col("doc_id"))
  }

  def sourceMixture(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val bucket = conv(substring(md5(col("doc_id").cast("string")
      .cast("binary")), 1, 2), 16, 10).cast("int") // 0..255, uniform
    docs.withColumn("bucket", bucket)
      .where(
        (col("source") === "src0") ||
        (col("source") === "src1" && col("bucket") < 128) ||
        (col("source") =!= "src0" && col("source") =!= "src1"
          && col("bucket") < 64))
      .select(col("doc_id"), col("source"), col("bucket"))
      .orderBy(col("doc_id"))
  }

  /**
   * x36 — quality-WEIGHTED deterministic sampling (Efraimidis–Spirakis
   * A-ES, the weighted-reservoir formulation): every doc gets a uniform
   * u from md5(doc_id) (first 8 hex digits → (h+0.5)/2³²) and the sort
   * key ln(u)/w, where w is the x8 quality score (floored at 0.001); the
   * k LARGEST keys are a without-replacement sample with inclusion
   * probability proportional to w. ln(u)/w orders identically to the
   * textbook u^(1/w) (ln is monotone) while avoiding cross-engine `pow`.
   *
   * This is THE curation primitive for "train on the best N docs,
   * preferring quality but not deterministically truncating": the sample
   * is reproducible (hash-seeded, no RNG state), embarrassingly parallel
   * (map + top-k: TakeOrderedAndProject per partition, k rows to the
   * driver-side heap merge — no global sort), and re-runs identically on
   * any partitioning — the same properties as q19's hash split, with
   * weights.
   */
  def weightedSample(spark: SparkSession, dir: String, k: Int = 100)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, dir, "documents")
    val toks = split(col("text"), " ")
    val w = greatest(
      round(least(lit(1.0), size(toks).cast("double") / 100)
        * (size(array_distinct(toks)).cast("double") / size(toks)), 6),
      lit(0.001))
    val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 8),
      16, 10).cast("double") + lit(0.5)) / lit(4294967296.0)
    val keyed = docs.select(col("doc_id"), w.as("w"),
      round(log(u) / w, 6).as("key"))
    // top-k via orderBy+limit (per-partition heaps); rank over ≤ k rows
    val wnd = Window.partitionBy(col("key") - col("key"))
      .orderBy(col("key").desc, col("doc_id"))
    keyed.orderBy(col("key").desc, col("doc_id")).limit(k)
      .withColumn("rank", row_number().over(wnd))
      .select(col("doc_id"), col("w"), col("key"), col("rank"))
      .orderBy(col("rank"))
  }

  /**
   * x79 — DSIR importance resampling (Xie et al., "Data Selection for
   * Language Models via Importance Resampling", NeurIPS 2023): select raw
   * documents that LOOK LIKE a small target corpus by estimating hashed
   * n-gram bag-of-words models of both distributions and Gumbel-top-k
   * sampling on the per-document log importance weight. This is the
   * principled upgrade of [[weightedSample]]'s heuristic weights — the
   * target slice here is the held-out `src9` docs (the same slice
   * [[decontaminate]] treats as eval data).
   *
   * Estimation (one corpus pass): every adjacent-token bigram hashes into
   * one of B=2048 buckets ([[graft.functions.HashedBigramWeightSum]]'s
   * pinned md5-32 contract) and each side's bucket distribution gets
   * add-one smoothing: p(b) = (c_b + 1) / (total + B). The per-bucket log
   * ratio is frozen to EXACT INTEGER NANO-NATS via x56's pinned rounding
   * schedule — each ln is rounded to 9dp and scaled, and only integers
   * are combined afterwards, so the weight table is bit-identical across
   * engines and the per-doc score (an int64 sum over bigram occurrences)
   * is order-free exact:
   * {{{
   *   w_nano(b) = L(tgt_b+1) − L(tgtTot+B) − (L(raw_b+1) − L(rawTot+B))
   *   where L(x) = round9(ln(x)) · 1e9  as int64
   * }}}
   *
   * Scoring (second pass, MAP-ONLY): the B-long weight table is a bounded
   * driver sync (16 KB — the x6 centroid-sync pattern) folded into the
   * plan as a literal, so each doc's score is one native per-row fold: no
   * explode, no join, no shuffle. At 100 TB the stats pass is x73's
   * explode+agg shape over a 2048-row output and the scoring pass runs at
   * scan speed.
   *
   * Selection: Gumbel top-k — key = score + g where
   * g = round9(−ln(−ln(u))) · 1e9 and u is the pinned md5 uniform of
   * `'dsir:' || doc_id` — equivalent to sampling k docs without
   * replacement ∝ exp(score) (the A-ES connection x36 exploits), fully
   * deterministic and reproducible on any partitioning. All sort keys are
   * int64: zero cross-engine tie surface.
   */
  def dsirSelect(spark: SparkSession, dir: String, k: Int = 100): DataFrame =
    dsirSelectOf(Tables.load(spark, dir, "documents"), k)

  /** DSIR hashed-feature bucket count (B). */
  private[graft] val DsirBuckets = 2048

  /** The target distribution: the held-out src9 slice (x47's eval set). */
  private[graft] val DsirTarget = "src9"

  /** x56's pinned ln→nano-nat schedule: round ln to 9dp, scale to int64.
    * The explicit double cast keeps the Spark and DuckDB forms textually
    * parallel (exact for counts ≤ 2^53 either way). */
  private def lnNano(c: Column): Column =
    (round(log(c.cast("double")), 9).cast("decimal(20,9)") * 1000000000)
      .cast("long")

  /** The estimated per-bucket nano-nat log-ratio table (B rows). */
  private[graft] def dsirWeightTable(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val b = DsirBuckets
    val bg = docs.select(col("source"), split(col("text"), " ").as("toks"))
      // < 2 tokens → no bigrams (and sequence(1, 0) is descending: the
      // StatsProps-caught ANSI trap — guard BEFORE the transform)
      .where(size(col("toks")) >= 2)
      .select(col("source"), explode(expr(
        "transform(sequence(1, size(toks) - 1)," +
          " i -> concat(toks[i - 1], ' ', toks[i]))")).as("feat"))
      .select(col("source"),
        (conv(substring(md5(col("feat")), 1, 8), 16, 10).cast("long") % b)
          .as("bucket"))
    val counts = bg.groupBy(col("bucket")).agg(
      sum(when(col("source") === DsirTarget, 1L).otherwise(0L)).as("tgt"),
      sum(when(col("source") === DsirTarget, 0L).otherwise(1L)).as("raw"))
    val totals = counts.agg(sum(col("tgt")).as("tgt_tot"),
      sum(col("raw")).as("raw_tot")) // 1-row scalar
    spark.range(b).select(col("id").as("bucket"))
      .join(counts, Seq("bucket"), "left")
      .na.fill(0L, Seq("tgt", "raw"))
      .crossJoin(broadcast(totals))
      .select(col("bucket"),
        (lnNano(col("tgt") + 1) - lnNano(col("tgt_tot") + b)
          - (lnNano(col("raw") + 1) - lnNano(col("raw_tot") + b)))
          .as("w_nano"))
  }

  /** [[dsirSelect]] over any (doc_id, source, text) frame — the spec
    * drives this directly and replays the math independently. */
  private[graft] def dsirSelectOf(docs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = DsirBuckets
    // Bounded driver sync: B int64 weights (16 KB) — the same pattern as
    // the k×dim centroid collect; DSIR is definitionally two passes
    // (estimate the ratio model, then score with it).
    val wRows = dsirWeightTable(docs).orderBy(col("bucket")).collect()
    val weights = Array.ofDim[Long](b)
    wRows.foreach(r => weights(r.getLong(0).toInt) = r.getLong(1))
    val u = (conv(substring(md5(concat(lit("dsir:"),
        col("doc_id").cast("string"))), 1, 8), 16, 10).cast("double")
      + lit(0.5)) / lit(4294967296.0)
    val scored = docs.select(col("doc_id"), col("source"),
        greatest(size(split(col("text"), " ")) - 1, lit(0)).cast("long")
          .as("n_bigrams"),
        graft.functions.HashedBigramWeightSum.bigramWeightSum(col("text"),
          typedLit(weights.toSeq)).as("score_nano"),
        (round(-log(-log(u)), 9).cast("decimal(20,9)") * 1000000000)
          .cast("long").as("gumbel_nano"))
      .withColumn("key_nano", col("score_nano") + col("gumbel_nano"))
    // top-k via orderBy+limit (per-partition heaps); rank over ≤ k rows
    val wnd = Window.partitionBy(col("key_nano") - col("key_nano"))
      .orderBy(col("key_nano").desc, col("doc_id"))
    scored.orderBy(col("key_nano").desc, col("doc_id")).limit(k)
      .withColumn("rank", row_number().over(wnd))
      .select(col("doc_id"), col("source"), col("n_bigrams"),
        col("score_nano"), col("gumbel_nano"), col("key_nano"), col("rank"))
      .orderBy(col("rank"))
  }

  /**
   * x38 — TEMPERATURE-scaled source mixture (α = 0.5): per-source quotas
   * ∝ n_s^α / Σ n_t^α — the multinomial temperature sampling multilingual
   * LLM pipelines use to keep low-resource sources from vanishing under
   * proportional sampling while still favoring bigger sources. Quota math
   * is cross-engine exact: per-source weights are round(sqrt(n), 6)
   * (sqrt is IEEE correctly-rounded on both engines) summed as DECIMAL
   * (order-free), and the final share is ONE double division — so
   * `floor(keepN · share)` lands on identical bits. Selection within a
   * source is the deterministic md5 rank (same reproducibility story as
   * [[weightedSample]] / q19).
   *
   * Scale shape: the quota table is a tiny broadcast (one row per
   * source); selection is one per-source window rank. At 100 TB the
   * window sort on md5 within each source is the cost — the map-only
   * alternative (keep iff hash/2³² < quota/n, a Binomial approximation
   * of the quota) trades exact counts for zero shuffle; this operator
   * keeps the EXACT contract the oracle can verify.
   */
  def temperatureMixture(spark: SparkSession, dir: String,
      keepN: Int = 300): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, dir, "documents")
    val weights = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("w", round(sqrt(col("n_docs")), 6).cast("decimal(18,6)"))
    val total = weights.agg(
      sum(col("w")).cast("decimal(18,6)").as("wt"))
    val quotas = weights.crossJoin(broadcast(total)) // 1 row
      .withColumn("quota",
        floor(lit(keepN.toDouble) *
          (col("w").cast("double") / col("wt").cast("double"))).cast("long"))
      .select(col("source"), col("quota"))
    val rk = row_number().over(Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id")))
    docs.select(col("doc_id"), col("source"))
      .withColumn("rk", rk)
      .join(broadcast(quotas), "source")
      .where(col("rk") <= col("quota"))
      .select(col("doc_id"), col("source"), col("rk"), col("quota"))
      .orderBy(col("source"), col("rk"))
  }

  /**
   * x132 — UNIMAX language sampling (Chung et al., ICLR 2023 §3): the
   * epoch-capped WATER-FILLING allocator that replaced temperature
   * sampling (x38) in large multilingual pretraining mixes. Languages
   * are processed in ASCENDING corpus-size order; each receives
   * `min(n_docs × maxEpochs, floor(remaining_budget / remaining_langs))`
   * and the unused surplus of small languages redistributes to larger
   * ones — so no language is repeated past the epoch cap (the
   * overfitting temperature sampling can't bound) and small languages
   * are kept whole whenever the fair share allows. All integer: budget
   * is a percent of the corpus, every step a floor division of a
   * non-negative numerator, so both engines replay the fold exactly
   * (the oracle runs it as a recursive CTE over the language table).
   *
   * Scale shape: the fold runs over the LANGUAGE HISTOGRAM (a driver
   * sync of one tiny aggregate — the x6 centroid-sync pattern; language
   * counts are ~dozens of rows at any corpus size); selection within a
   * language is the deterministic md5 rank window (x38's
   * reproducibility story), quota table broadcast back.
   */
  def unimaxMixture(spark: SparkSession, dir: String,
      budgetPct: Int = 80, maxEpochs: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, dir, "documents")
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val quotas = unimaxQuotas(counts, budgetPct, maxEpochs)
    import spark.implicits._
    val qdf = quotas.toSeq.toDF("lang", "n_docs", "quota")
    val rk = row_number().over(Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id")))
    docs.select(col("doc_id"), col("lang"))
      .withColumn("rk", rk)
      .join(broadcast(qdf.select(col("lang"), col("quota"))), "lang")
      .where(col("rk") <= col("quota"))
      .select(col("doc_id"), col("lang"), col("rk"), col("quota"))
      .orderBy(col("lang"), col("rk"))
  }

  /** Independent replay of the [[unimaxMixture]] allocator for specs:
    * (lang, n_docs, quota) in ascending processing order. */
  private[graft] def unimaxQuotas(counts: Seq[(String, Long)],
      budgetPct: Int, maxEpochs: Int): Seq[(String, Long, Long)] = {
    var remaining = counts.map(_._2).sum * budgetPct / 100
    var left = counts.length.toLong
    counts.sortBy { case (l, n) => (n, l) }.map { case (lang, n) =>
      val q = math.min(n * maxEpochs, remaining / left)
      remaining -= q; left -= 1
      (lang, n, q)
    }
  }

  /**
   * x135 — FILTER-AGREEMENT AUDIT (Cohen's κ): when a pipeline runs two
   * keep/drop filters — here the x8-style heuristic gate (enough tokens
   * AND type/token ratio ≥ 1/2, both exact integer comparisons) and the
   * x70 hashed-linear classifier — raw percent agreement is inflated by
   * class imbalance; κ subtracts chance agreement and is the standard
   * figure an annotation/filter-calibration report leads with. Computed
   * EXACTLY: the 2×2 confusion counts come from ONE map-only corpus
   * pass folded into a single aggregate row, and κ = (pₒ − pₑ)/(1 − pₑ)
   * clears denominators to the integer form
   * (n·n_agree − Σ) · 10⁶ / (n² − Σ) with Σ = a₊b₊ + a₋b₋ — one
   * sign-split truncating division (κ can be negative; Spark `div` and
   * DuckDB `//` differ on negatives, the kq82 rule), zero doubles.
   * Degenerate case (a constant filter ⇒ denominator 0) reports 0 by
   * convention, guarded identically in both engines. The cleared
   * numerator is Θ(n²·10⁶), which exceeds int64 past n ≈ 3·10⁶ docs —
   * so the products compute in DECIMAL(38,0) (Spark) / HUGEINT
   * (DuckDB): exact to 10³⁸, i.e. any corpus below ~10¹⁶ documents,
   * with `div`/`//` truncating identically on both widened types.
   */
  def filterAgreement(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val toks = split(col("text"), " ")
    val flags = docs.select(
      (size(toks).cast("long") >= 20 &&
        size(array_distinct(toks)).cast("long") * 2 >=
          size(toks).cast("long")).as("a"),
      (graft.functions.HashedLinearScore.hashedLinearScore(col("text"))
        > 0).as("b"))
    val nD = "CAST(n AS DECIMAL(38,0))"
    val sigma = s"(CAST(a_pos AS DECIMAL(38,0)) * b_pos + " +
      s"($nD - a_pos) * (n - b_pos))"
    val num = s"(($nD * n_agree - $sigma) * 1000000)"
    val den = s"($nD * n - $sigma)"
    flags.agg(
        count(lit(1)).as("n"),
        sum(when(col("a"), 1L).otherwise(0L)).as("a_pos"),
        sum(when(col("b"), 1L).otherwise(0L)).as("b_pos"),
        sum(when(col("a") === col("b"), 1L).otherwise(0L)).as("n_agree"),
        sum(when(col("a") && col("b"), 1L).otherwise(0L)).as("pos_agree"))
      .withColumn("kappa_ppm", expr(
        s"CASE WHEN $den = 0 THEN 0L WHEN $num >= 0 THEN $num div $den " +
          s"ELSE -((-($num)) div $den) END"))
  }

  /** Frozen Poisson(1) inverse-CDF thresholds for [[bootstrapCi]]:
    * T_k = floor(P(W <= k) · 2^32) for k = 0..6 (tail mass beyond 7
    * copies < 1e-4 maps to multiplicity 7). Computed ONCE here; both
    * engines receive the identical integer literals (the kq107
    * driver-literal discipline), so every multiplicity is an exact
    * integer comparison. */
  private[graft] val BootCdf32: Seq[Long] = {
    val probs = (0 to 6).map { k =>
      math.exp(-1.0) / (1 to k).map(_.toDouble).product
    }
    probs.scanLeft(0.0)(_ + _).tail
      .map(c => math.floor(c * 4294967296.0).toLong)
  }

  /** Engine-shared multiplicity fragment: w = #{k : u32 >= T_k}. */
  private[ext] def bootWSql: String =
    BootCdf32.map(t => s"(CASE WHEN u32 >= $t THEN 1 ELSE 0 END)")
      .mkString("(", " + ", ")")

  /**
   * x134 — POISSON-BOOTSTRAP CONFIDENCE INTERVAL (Chamandy et al. 2012,
   * "Estimating uncertainty for massive data streams"): the error bar a
   * dataset card (x85) should print next to any corpus mean. The
   * classical bootstrap materializes B resamples of the corpus —
   * impossible at 100 TB; the Poisson approximation draws each
   * document's per-resample multiplicity w ~ Poisson(1) independently,
   * so ALL B resamples compute in ONE corpus pass: explode B map-side,
   * one (resample)-keyed partial aggregation into B groups, no
   * resampling shuffle, no second read.
   *
   * Determinism end to end: multiplicities are the pinned md5-32 value
   * against the frozen [[BootCdf32]] thresholds; each resample's mean
   * (of the whitespace token count) is exact integer micro-units by
   * positive floor division; the CI is ORDER STATISTICS of the B means
   * — ranks floor(q·(B−1)) + 1 for q = 0.025 / 0.5 / 0.975 (lower
   * order statistic; no interpolation, no doubles). A theoretically
   * possible empty resample (P = e^-N) is excluded identically on both
   * sides before ranking.
   */
  def bootstrapCi(spark: SparkSession, dir: String,
      b: Int = 200): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("score"))
    val res = docs
      .withColumn("b", explode(sequence(lit(0), lit(b - 1))))
      .withColumn("u32", expr("CAST(conv(substring(md5(concat('boot:', " +
        "CAST(b AS STRING), ':', CAST(doc_id AS STRING))), 1, 8), 16, 10)" +
        " AS BIGINT)"))
      .withColumn("w", expr(bootWSql))
      .groupBy(col("b"))
      .agg(sum(col("w")).as("sw"),
        sum(col("w") * col("score")).as("sws"))
      .where(col("sw") > 0)
      .select(col("b"), expr("(sws * 1000000) div sw").as("mean_micro"))
    val ranked = res
      .select(col("b"), col("mean_micro").as("rs_mean"))
      .withColumn("rn",
        row_number().over(Window.orderBy(col("rs_mean"), col("b"))))
    val nb = res.agg(count(lit(1)).as("n_resamples"))
    val full = docs.agg(count(lit(1)).as("n_docs"),
      expr("(sum(score) * 1000000) div count(1)").as("mean_micro"))
    ranked.crossJoin(broadcast(nb)).crossJoin(broadcast(full))
      .groupBy(col("n_docs"), col("n_resamples"), col("mean_micro"))
      .agg(
        max(when(col("rn") === expr("(25 * (n_resamples - 1)) div 1000 + 1"),
          col("rs_mean"))).as("lo_micro"),
        max(when(col("rn") === expr("(500 * (n_resamples - 1)) div 1000 + 1"),
          col("rs_mean"))).as("mid_micro"),
        max(when(col("rn") === expr("(975 * (n_resamples - 1)) div 1000 + 1"),
          col("rs_mean"))).as("hi_micro"))
  }

  /**
   * Document fingerprinting: (a) a polynomial rolling hash over the full
   * character stream (base 257 mod 1e9+7 — Karp-Rabin style), and (b) a
   * min-shingle-hash (the 1-hash MinHash special case). Equal fingerprints
   * ⇒ near-certain duplicates; both are O(doc length) map-only work.
   */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val chars = split(col("text"), "")
    val rolling = aggregate(
      chars, lit(0L),
      (h, c) => pmod(h * 257 + ascii(c), lit(1000000007L)))
    val minShingle = array_min(transform(
      array_distinct(split(col("text"), " ")),
      t => substring(md5(t.cast("binary")), 1, 16)))
    docs.select(col("doc_id"),
        rolling.as("rolling_hash"),
        minShingle.as("min_token_hash"))
      .orderBy(col("doc_id"))
  }

  /**
   * REPETITION signals — the Gopher-style (Rae et al. 2021, "Scaling
   * Language Models", table A1) quality heuristics that flag
   * degenerate/boilerplate documents by how much they repeat themselves:
   * per doc, the fraction of word-bigram occurrences belonging to the
   * single most frequent bigram (`top_gram_frac`) and the fraction
   * belonging to any bigram occurring more than once (`dup_gram_frac`).
   * A filtering pipeline drops docs above thresholds (Gopher uses 0.18 /
   * 0.4 for 2-grams).
   *
   * Scale shape: the per-doc bigram counting is a pure per-row loop, so
   * it runs in the native one-pass [[graft.functions.BigramStats]]
   * expression — a SHUFFLE-FREE map scan (the SQL-shaped alternative
   * explodes n_tokens − 1 gram rows per doc and shuffles the re-tokenized
   * corpus twice; the DuckDB oracle runs that explode form and matches
   * bit-for-bit because all counting is integer-exact). Docs with fewer
   * than 2 tokens have no bigrams and drop out, like the explode form.
   */
  def repetitionSignals(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val st = graft.functions.BigramStats.bigramStats(col("text"))
    docs.select(col("doc_id"), st.as("st"))
      .where(col("st.n_grams") > 0)
      .select(col("doc_id"), col("st.n_grams").as("n_grams"),
        round(col("st.top_c").cast("double") / col("st.n_grams"), 6)
          .as("top_gram_frac"),
        round(col("st.dup_c").cast("double") / col("st.n_grams"), 6)
          .as("dup_gram_frac"))
      .orderBy(col("doc_id"))
  }

  /**
   * x110 — the GOPHER QUALITY RULE BATTERY (Rae et al. 2021, table A1;
   * the same battery ships in NeMo-Curator/DataTrove): every rule as an
   * EXACT-INTEGER metric plus the composed keep decision, per document.
   * Word-count bounds, mean word length (milli-chars), minimum stopword
   * hits, top-bigram token fraction (ppm), and duplicate-3-gram token
   * COVERAGE (ppm) — coverage, not occurrence-sum: overlapping
   * duplicated grams are interval-merged ([[graft.ext.Dedup
   * .exactSubstrExcise]]'s island window, here per-doc), so a token is
   * counted once however many duplicated grams cross it. Thresholds are
   * rescaled to the fixture corpus (30-word minimum vs the paper's 50;
   * the ratios keep the paper's values) and are explicit parameters.
   *
   * Scale shape: the per-doc scalars are map-only (one native
   * [[graft.functions.BigramStats]] pass — no explode for the bigram
   * rule); the 3-gram coverage explodes once and shuffles twice, on
   * (doc_id, gram) then doc_id — both uniform keys, linear in corpus
   * tokens. Nothing is quadratic and no rule needs a second corpus
   * read.
   */
  def gopherRules(spark: SparkSession, dir: String,
      minWords: Long = 30L, maxWords: Long = 100000L,
      minWlenMilli: Long = 3000L, maxWlenMilli: Long = 10000L,
      minStop: Long = 2L, maxTop2Ppm: Long = 200000L,
      maxDup3Ppm: Long = 180000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, dir, "documents")
    val toksC = split(col("text"), " ")
    val st = graft.functions.BigramStats.bigramStats(col("text"))
    val prepared = docs.select(col("doc_id"), toksC.as("toks"),
        size(toksC).cast("long").as("n_words"),
        length(col("text")).cast("long").as("text_len"), st.as("st"),
        size(filter(toksC, t => t.isInCollection(stopwords))).cast("long")
          .as("stop_n"))
      .withColumn("char_sum", col("text_len") - (col("n_words") - 1L))
    val grams = prepared.select(col("doc_id"),
      posexplode(when(col("n_words") >= 3,
        transform(sequence(lit(0), (col("n_words") - 3).cast("int")), i =>
          md5(concat_ws(" ", slice(col("toks"), i + 1, lit(3)))
            .cast("binary"))))
        .otherwise(array().cast("array<string>"))))
      .toDF("doc_id", "s", "gram")
    val wOrd = Window.partitionBy(col("doc_id")).orderBy(col("s"))
    val covered = grams
      .withColumn("occ",
        count(lit(1)).over(Window.partitionBy(col("doc_id"), col("gram"))))
      .where(col("occ") >= 2)
      .withColumn("prev_max_e", max(col("s") + 3).over(
        wOrd.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_island",
        when(col("prev_max_e").isNull || col("s") > col("prev_max_e"), 1)
          .otherwise(0))
      .withColumn("island", sum(col("new_island")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("s")).as("i_s"), max(col("s") + 3).as("i_e"))
      .groupBy(col("doc_id"))
      .agg(sum((col("i_e") - col("i_s")).cast("long")).as("dup3_tokens"))
    prepared.join(covered, Seq("doc_id"), "left")
      .withColumn("dup3_tokens", coalesce(col("dup3_tokens"), lit(0L)))
      .select(col("doc_id"), col("n_words"),
        expr("(char_sum * 1000) div n_words").as("mean_wlen_milli"),
        col("stop_n"),
        when(col("st.n_grams") > 0,
          expr("(CAST(st.top_c AS BIGINT) * 1000000) div st.n_grams"))
          .otherwise(0L).as("top2_ppm"),
        expr("(dup3_tokens * 1000000) div n_words").as("dup3_ppm"))
      .withColumn("keep",
        col("n_words").between(minWords, maxWords) &&
          col("mean_wlen_milli").between(minWlenMilli, maxWlenMilli) &&
          col("stop_n") >= minStop && col("top2_ppm") <= maxTop2Ppm &&
          col("dup3_ppm") <= maxDup3Ppm)
      .orderBy(col("doc_id"))
  }

  /**
   * CONTAMINATION check — the benchmark-decontamination step every
   * training-data pipeline runs before a model sees the corpus (GPT-3
   * appendix C; PaLM §6): for each training document, the fraction of its
   * 8-token spans (stride 1) that also occur in a held-out/test set (here
   * the `testSource` slice stands in for the benchmark corpus). Docs with
   * contamination above a threshold get dropped or excised.
   *
   * Scale shape: the test-set span table is DISTINCT and tiny relative to
   * the corpus, so it is explicitly `broadcast` — the training side is
   * never shuffled at all (map-side hash join + one doc_id aggregation).
   * That is the only layout that survives a 100 TB train side: the
   * benchmark set is fixed-size no matter how large the corpus grows.
   * Span identity is md5 so the DuckDB oracle reproduces it exactly.
   */
  def contamination(spark: SparkSession, dir: String,
      testSource: String = "src9", n: Int = 8): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val toks = split(col("text"), " ")
    val spans = docs.select(col("doc_id"), col("source"),
      explode(when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)), i =>
          md5(concat_ws(" ", slice(toks, i, lit(n))).cast("binary"))))
        .otherwise(array().cast("array<string>"))).as("h"))
    // the benchmark leg is MATERIALIZED once (benchmark-sized — the
    // broadcast artifact): otherwise the interpreted span chain plans
    // into both the test and train branches of the join (PlanGuard
    // check 6), and a task retry would re-derive the registry
    val testSpans = spans.where(col("source") === testSource)
      .select(col("h")).distinct().withColumn("hit", lit(1))
      .localCheckpoint()
    spans.where(col("source") =!= testSource)
      .join(broadcast(testSpans), Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(coalesce(col("hit"), lit(0))).as("n_hit"))
      .withColumn("contamination",
        round(col("n_hit").cast("double") / col("n_spans"), 6))
      .orderBy(col("doc_id"))
  }

  /**
   * x107 — CURRICULUM ORDERING: the easiest-first training order
   * (Bengio et al. 2009) with per-source stratification — each source
   * ranks its docs by difficulty (token count, ties by doc_id), and
   * the global curriculum round-robins the strata by (stage, source):
   * every source contributes its k-th-easiest doc before any source
   * contributes its (k+1)-th, so no stratum is exhausted early and the
   * mixture stays balanced through the ramp. The entry emits the first
   * 200 curriculum positions.
   *
   * Scale: the per-source stage is a bounded group-keyed window; the
   * global cut is a TOP-K on the computable key (stage, source,
   * doc_id) — never a global sort of the corpus — and the final
   * position numbering runs on the 200 surviving rows.
   */
  def curriculum(spark: SparkSession, dir: String,
      topN: Int = 200): DataFrame = {
    val ws = Window.partitionBy(col("source"))
      .orderBy(col("difficulty"), col("doc_id"))
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("difficulty"))
      .withColumn("stage", row_number().over(ws))
      .orderBy(col("stage"), col("source"), col("doc_id"))
      .limit(topN)
      .withColumn("position", row_number().over(
        Window.orderBy(col("stage"), col("source"), col("doc_id"))))
      .select(col("position"), col("doc_id"), col("source"), col("stage"),
        col("difficulty"))
      .orderBy(col("position"))
  }

  /**
   * x106 — BLOOM-FILTER decontamination probe: the fixed-memory variant
   * of [[contamination]]'s exact broadcast join, with its error measured.
   * The benchmark set's 8-gram hashes populate a k = 2, m = 2²⁰-bit
   * Bloom filter (bit positions are the two md5 32-bit halves mod m —
   * fully deterministic, no seed); every training-doc span probes both
   * bits. The result reports, per doc, the Bloom verdicts NEXT TO the
   * exact ones — bloom_hits ⊇ exact_hits always (no false negatives, the
   * Bloom guarantee, pinned in ExtSpec) and `false_positives` is the
   * measured cost of the compression (n ≈ |bench|·2 bits set of 2²⁰).
   *
   * Scale story: the exact join ships the full benchmark span set to
   * every executor and grows with the benchmark; the Bloom filter is a
   * FIXED 128 KiB broadcast no matter how many benchmarks feed it — the
   * shape that lets a 100 TB curation pass screen against every eval
   * suite at once, exact-verifying only the flagged survivors (q33's
   * runtime bloom join is the same idea applied by Catalyst itself).
   * Here the bit set is a relational DISTINCT-positions table (≤ m rows
   * of one int) consumed via two broadcast membership joins — the
   * degenerate-but-exact DataFrame encoding of the bitmap.
   */
  def bloomDecontaminate(spark: SparkSession, dir: String,
      testSource: String = "src9", n: Int = 8,
      mBits: Long = 1048576L): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val toks = split(col("text"), " ")
    val spans = docs.select(col("doc_id"), col("source"),
      explode(when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)), i =>
          md5(concat_ws(" ", slice(toks, i, lit(n))).cast("binary"))))
        .otherwise(array().cast("array<string>"))).as("h"))
    def withPos(df: DataFrame): DataFrame = df
      .withColumn("p1",
        expr(s"cast(conv(substring(h, 1, 8), 16, 10) as bigint) % $mBits"))
      .withColumn("p2",
        expr(s"cast(conv(substring(h, 9, 8), 16, 10) as bigint) % $mBits"))
    // benchmark-sized, materialized once: feeds the bloom bit set AND
    // the exact-verify join — un-materialized, the interpreted span
    // chain re-plans into both legs (PlanGuard check 6)
    val test = spans.where(col("source") === testSource)
      .select(col("h")).distinct()
      .localCheckpoint()
    val bloomBits = withPos(test)
      .select(explode(array(col("p1"), col("p2"))).as("p")).distinct()
    val probe = withPos(spans.where(col("source") =!= testSource)
      .select(col("doc_id"), col("h")).distinct())
    probe
      .join(broadcast(bloomBits.withColumnRenamed("p", "p1")
        .withColumn("hit1", lit(1))), Seq("p1"), "left")
      .join(broadcast(bloomBits.withColumnRenamed("p", "p2")
        .withColumn("hit2", lit(1))), Seq("p2"), "left")
      .join(broadcast(test.withColumn("exact_hit", lit(1L))),
        Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("hit1") === 1 && col("hit2") === 1, 1L).otherwise(0L))
          .as("bloom_hits"),
        sum(coalesce(col("exact_hit"), lit(0L))).as("exact_hits"))
      .withColumn("false_positives", col("bloom_hits") - col("exact_hits"))
      .orderBy(col("doc_id"))
  }

  /**
   * x44 — ES `more_like_this`: rank the corpus by similarity to a QUERY
   * DOCUMENT. The query doc's most distinctive terms (top `nTerms` by
   * the x15 TF-IDF score) become the search terms, and every other doc
   * is scored with Okapi BM25 over them — the ES MLT pipeline
   * (max_query_terms → boosted term query) re-expressed relationally.
   *
   * Unlike [[bm25]] (whose terms are PLAN-TIME literals compiled into
   * conditional-sum columns), MLT's terms are DATA — a 3-row frame
   * selected by a windowless top-k and BROADCAST into the scoring join,
   * so the whole thing is still ONE plan with no driver-side collect.
   * The per-(doc, term) BM25 contribution reuses x22's exact literal
   * structure (same association order, ln, k1 = 1.2, b = 0.75); because
   * the per-doc score is now an AGGREGATE over term rows (not a fixed
   * left-to-right expression), each contribution is rounded to 6 dp and
   * summed as DECIMAL(28,12) — the x24 order-independence trick — so
   * partitioning can never flip a rank.
   *
   * Scale shape: tf/df/len aggregations are the inverted-index builds
   * (one shuffle each, term- and doc-keyed); the query-term table is
   * tiny and broadcast; scoring touches only postings of the selected
   * terms. Linear in matching postings at any corpus size.
   */
  def moreLikeThis(spark: SparkSession, dir: String, queryDoc: Long = 0L,
      nTerms: Int = 3, k: Int = 10): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val toks = docs.select(col("doc_id"),
      explode(graft.functions.AnalyzeTokens.analyze(col("text"))).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val lens = toks.groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("double").as("len"))
    val sumLen = toks.agg(count(lit(1)).cast("double").as("sum_len"))
    // the query doc's top-nTerms by the x15 tf·ln(N/df) score — (score
    // desc, term) is a total order, so the cut is deterministic
    val qterms = tf.where(col("doc_id") === queryDoc)
      .join(df, "term")
      .crossJoin(broadcast(stats))
      .withColumn("qscore",
        round(col("tf") * log(col("n_docs") / col("df")), 6))
      .orderBy(col("qscore").desc, col("term"))
      .limit(nTerms)
      .select(col("term"), col("df"))
    val k1 = 1.2; val b = 0.75
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val norm = col("tf") + lit(k1) * (lit(1.0 - b) +
      lit(b) * col("len") / (col("sum_len") / col("n_docs")))
    val contrib = tf.where(col("doc_id") =!= queryDoc)
      .join(broadcast(qterms), "term")
      .join(lens, "doc_id")
      .crossJoin(broadcast(stats))
      .crossJoin(broadcast(sumLen))
      .withColumn("ts",
        round(idf * (col("tf") * lit(k1 + 1)) / norm, 6)
          .cast("decimal(28,12)"))
    contrib.groupBy(col("doc_id"))
      .agg(sum(col("ts")).cast("double").as("score"))
      .where(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("score") - col("score")) // non-foldable 0 (x22)
          .orderBy(col("score").desc, col("doc_id"))))
      .select(col("doc_id"), col("score"), col("rank"))
      .orderBy(col("rank"))
  }

  /**
   * x47 — DECONTAMINATION EXCISION: the removal transform behind x31's
   * contamination REPORT. Every training-doc token covered by any
   * sliding `n`-token span that also occurs in the held-out test slice
   * is cut out, and the text is rebuilt from the surviving tokens — the
   * span-level benchmark-decontamination step (dropping whole docs at a
   * contamination threshold loses data; excising just the leaked spans
   * keeps the rest).
   *
   * Unlike x39 (non-overlapping spans, span-level rebuild), the sliding
   * spans OVERLAP, so removal works at TOKEN granularity — but the
   * REBUILD never touches uncontaminated tokens: matched spans explode
   * to their `n` covered positions (bounded fanout, matched spans only),
   * which aggregate into ONE sorted position-array per contaminated doc;
   * that slim frame joins back to the INTACT docs on doc_id, and the
   * excision is an index-aware higher-order filter over the doc's own
   * token array. The test-span table is BROADCAST (held-out slices are
   * small by construction), so when contamination is sparse the only
   * shuffled rows are the matched spans and the per-doc position arrays
   * — the 100 TB training token stream itself is never exploded or
   * reshuffled for the rebuild (it was before round 8: every token went
   * through a posexplode → anti-join → collect_list round trip). The
   * interpreted filter lambda runs only on the contaminated docs (the
   * null-guard's otherwise branch), not the corpus hot path.
   */
  def decontaminate(spark: SparkSession, dir: String,
      testSource: String = "src9", n: Int = 8): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val toksC = split(col("text"), " ")
    decontaminateOf(
      docs.where(col("source") =!= testSource)
        .select(col("doc_id"), toksC.as("toks")),
      docs.where(col("source") === testSource)
        .select(col("doc_id"), toksC.as("toks")), n)
      .orderBy(col("doc_id"))
  }

  /** [[decontaminate]] over arbitrary `(doc_id, toks)` train/test frames,
    * UNSORTED — the form the composed pipeline (x60) embeds mid-plan. */
  private[graft] def decontaminateOf(train: DataFrame, test: DataFrame,
      n: Int): DataFrame = {
    def slidingSpans(frame: DataFrame) = frame
      .select(col("doc_id"),
        posexplode(when(size(col("toks")) >= n,
          transform(sequence(lit(1), size(col("toks")) - (n - 1)), i =>
            md5(concat_ws(" ", slice(col("toks"), i, lit(n)))
              .cast("binary"))))
          .otherwise(array().cast("array<string>"))).as(Seq("i0", "h")))
      .select(col("doc_id"), (col("i0") + 1).as("start"), col("h"))
    val testSpans = slidingSpans(test).select(col("h")).distinct()
    // one row per CONTAMINATED doc: its distinct covered positions,
    // sorted — the shuffle is sized by matched spans, not the corpus
    val covered = slidingSpans(train)
      .join(broadcast(testSpans), "h")
      .select(col("doc_id"),
        explode(sequence(col("start"), col("start") + (n - 1))).as("pos"))
      .groupBy(col("doc_id"))
      .agg(array_sort(array_distinct(collect_list(col("pos")))).as("cov"))
    // 1-based token index i+1 against the covered-position array; docs
    // with no contamination (cov null after the left join) pass through
    val kept = when(col("cov").isNull, col("toks"))
      .otherwise(filter(col("toks"),
        (tok, i) => !array_contains(col("cov"), i + 1)))
    train.join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"),
        kept.as("kept"))
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - size(col("kept"))).as("n_dropped"),
        concat_ws(" ", col("kept")).as("cleaned_text"))
  }

  /**
   * x46 — BATCH PACKING assignment: distribute documents into
   * fixed-capacity training bins, the sequence-packing preprocessing
   * step of LLM training pipelines (docs are packed into context-window
   * batches; balanced bins minimize padding waste). True bin packing is
   * inherently sequential, so the scalable formulation packs PER SHARD:
   * docs are hash-sharded (md5 bucket — deterministic, skew-free), and
   * within each shard a longest-first ROUND-ROBIN assigns docs to the
   * shard's bins — LPT's sort without its least-loaded-bin placement
   * (round-robin ignores current bin loads, so it carries no 4/3
   * optimality bound; it is the one-window-function formulation that
   * balances well when sizes are not heavy-tailed — [[packBinsLpt]] is
   * the true-LPT sibling when the bound matters). Emits each doc's
   * (shard, bin) plus the bin's total tokens and fill ratio against the
   * capacity.
   *
   * Scale shape: the only window partitions on the SHARD key — packing
   * parallelism equals shard count, each shard's sort is over its own
   * docs, never a global order. One shuffle for the window, one
   * (bin)-keyed window sum. All-integer math except the final rounded
   * fill ratio.
   */
  def packBins(spark: SparkSession, dir: String, nShards: Int = 8,
      binsPerShard: Int = 4, capacity: Int = 2048): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, dir, "documents")
    val estTokens = estTokensCol
    val shard = mdShard(nShards)
    val wShard = Window.partitionBy(col("shard"))
      .orderBy(col("est_tokens").desc, col("doc_id"))
    val assigned = docs
      .select(col("doc_id"), estTokens.as("est_tokens"), shard.as("shard"))
      .withColumn("rn", row_number().over(wShard))
      .withColumn("bin",
        col("shard") * binsPerShard + pmod(col("rn") - 1, lit(binsPerShard)))
    val wBin = Window.partitionBy(col("bin"))
    assigned
      .withColumn("bin_tokens", sum(col("est_tokens")).over(wBin))
      .withColumn("bin_fill",
        round(col("bin_tokens").cast("double") / capacity, 6))
      .select(col("doc_id"), col("shard"), col("bin"), col("est_tokens"),
        col("bin_tokens"), col("bin_fill"))
      .orderBy(col("doc_id"))
  }

  /**
   * x49 — BATCH PACKING with TRUE per-shard LPT: [[packBins]]'s sharding
   * but with Graham's actual Longest-Processing-Time placement — each
   * doc (longest first) lands on the shard's currently LEAST-LOADED
   * bin, the 4/3-optimal makespan heuristic x46's round-robin is not.
   *
   * The fold is inherently sequential per shard, so the scalable
   * formulation ships ONLY the per-shard LONG size arrays (8 bytes per
   * doc; shard count is the parallelism knob and bounds each list):
   * one window ranks docs within their shard, one agg gathers the
   * rank-ordered sizes, the native [[graft.functions.LptAssign]] fold
   * (O(bins) argmin per item, codegen'd) emits the 0-based local bin
   * per rank, and the exploded (shard, rank) → bin frame joins back to
   * the docs. Same output shape as x46 so the two packers are directly
   * comparable; `bin_fill` shows LPT's tighter balance.
   */
  def packBinsLpt(spark: SparkSession, dir: String, nShards: Int = 8,
      binsPerShard: Int = 4, capacity: Int = 2048): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, dir, "documents")
    val estTokens = estTokensCol
    val shard = mdShard(nShards)
    val wShard = Window.partitionBy(col("shard"))
      .orderBy(col("est_tokens").desc, col("doc_id"))
    val ranked = docs
      .select(col("doc_id"), estTokens.as("est_tokens"), shard.as("shard"))
      .withColumn("rn", row_number().over(wShard))
    // rank-ordered per-shard size lists (array_sort on (rn, est) structs
    // — collect_list order is not a contract), folded natively
    val assigned = ranked
      .groupBy(col("shard"))
      .agg(transform(
        array_sort(collect_list(struct(col("rn"), col("est_tokens")))),
        _.getField("est_tokens")).as("sizes"))
      .select(col("shard"),
        posexplode(graft.functions.LptAssign.lpt(col("sizes"), binsPerShard))
          .as(Seq("rn0", "bin_local")))
      .select(col("shard"), (col("rn0") + 1).as("rn"),
        (col("shard") * binsPerShard + col("bin_local")).as("bin"))
    val wBin = Window.partitionBy(col("bin"))
    ranked.join(assigned, Seq("shard", "rn"))
      .withColumn("bin_tokens", sum(col("est_tokens")).over(wBin))
      .withColumn("bin_fill",
        round(col("bin_tokens").cast("double") / capacity, 6))
      .select(col("doc_id"), col("shard"), col("bin"), col("est_tokens"),
        col("bin_tokens"), col("bin_fill"))
      .orderBy(col("doc_id"))
  }

  /**
   * x51 — TOKEN-WINDOW CHUNKING with stride: every long document split
   * into fixed-width token windows overlapping by `window - stride` —
   * the sequence-prep step in front of tokenize-and-pack (the sibling of
   * [[packBins]]/[[packBinsLpt]], which pack the chunks this emits).
   * Chunk starts are 0, stride, 2·stride, … while they fall inside the
   * doc, so every token is covered and short docs yield exactly one
   * chunk.
   *
   * Map-only at any scale: `explode(sequence(...))` fans each doc to its
   * chunk count (bounded by len/stride) with no shuffle, `slice` +
   * `array_join` rebuild the chunk text inside codegen, and no state
   * crosses documents. The only shuffle in this entry is the
   * deterministic output ORDER BY for the oracle compare.
   */
  def chunkTokens(spark: SparkSession, dir: String,
      window: Int = 32, stride: Int = 24): DataFrame =
    chunkTokensOf(Tables.load(spark, dir, "documents"), window, stride)

  /** [[chunkTokens]] over an arbitrary (doc_id, text) frame — the
    * property suite drives this directly with generated corpora. */
  def chunkTokensOf(docs: DataFrame,
      window: Int, stride: Int): DataFrame = {
    docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("n", size(col("toks")))
      .withColumn("chunk_id",
        explode(sequence(lit(0), floor((col("n") - 1) / stride).cast("int"))))
      .withColumn("start", col("chunk_id") * stride)
      .select(col("doc_id"), col("chunk_id"),
        least(lit(window), col("n") - col("start")).cast("long")
          .as("n_tokens"),
        array_join(slice(col("toks"), col("start") + 1, lit(window)), " ")
          .as("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /**
   * x52 — EPOCH-AWARE TRAINING SHUFFLE: the deterministic global reorder
   * every training run needs per epoch, WITHOUT a global sort. Each
   * (epoch, doc) gets an md5 order key; the batch is the key's first byte
   * mod `nBatches` (256 % 8 = 0 ⇒ exactly uniform), so batch assignment
   * is MAP-ONLY, and the within-batch position is a window partitioned by
   * (epoch, batch) — parallelism = epochs × batches, each partition
   * ~corpus/nBatches, no single-partition window, no driver state. A new
   * epoch is a new salt: the whole corpus reshuffles with zero lineage
   * back to the previous order.
   */
  def epochShuffle(spark: SparkSession, dir: String, nEpochs: Int = 2,
      nBatches: Int = 8): DataFrame =
    epochShuffleOf(Tables.load(spark, dir, "documents"), nEpochs, nBatches)

  /** [[epochShuffle]] over an arbitrary frame with a doc_id column — the
    * property suite drives this directly with generated id sets. */
  def epochShuffleOf(docs: DataFrame, nEpochs: Int,
      nBatches: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val key = md5(concat(col("doc_id").cast("string"), lit(":"),
      col("epoch").cast("string")).cast("binary"))
    val w = Window.partitionBy(col("epoch"), col("batch_id"))
      .orderBy(col("order_key"), col("doc_id"))
    docs.select(col("doc_id"))
      .withColumn("epoch", explode(sequence(lit(0), lit(nEpochs - 1))))
      .withColumn("order_key", key)
      .withColumn("batch_id",
        pmod(conv(substring(col("order_key"), 1, 2), 16, 10).cast("int"),
          lit(nBatches)))
      .withColumn("pos", row_number().over(w))
      .select(col("epoch"), col("batch_id"), col("pos"), col("doc_id"),
        col("order_key"))
      .orderBy(col("epoch"), col("batch_id"), col("pos"))
  }

  /**
   * x53 — PII REDACTION over a PLANTED-PII corpus (x48's messify pattern:
   * the fixture is synthetic word soup, so the PII to find is planted
   * deterministically in-query — every 7th doc gets an email, every 11th
   * a phone number, doc 0 and 77 both). Redaction itself is the real
   * operator: regex scrub to typed placeholders plus per-doc match counts
   * — entirely MAP-ONLY (one projection, no shuffle but the output sort),
   * which is what makes regex-PII the cheap first pass of every corpus
   * cleanup at 100 TB. Patterns are RE2-safe (no backtracking constructs)
   * so Spark's Java regex and the oracle's RE2 agree exactly.
   */
  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val emailPat = "[a-z0-9]+@[a-z]+\\.[a-z]+"
    val phonePat = "555-[0-9]{4}"
    val planted = concat(col("text"),
      when(col("doc_id") % 7 === 0,
        concat(lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com for details"))).otherwise(lit("")),
      when(col("doc_id") % 11 === 0,
        concat(lit(" or call 555-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")))
        .otherwise(lit("")))
    docs.select(col("doc_id"), planted.as("t"))
      .select(col("doc_id"),
        regexp_count(col("t"), lit(emailPat)).cast("long").as("n_emails"),
        regexp_count(col("t"), lit(phonePat)).cast("long").as("n_phones"),
        regexp_replace(regexp_replace(col("t"), emailPat, "[EMAIL]"),
          phonePat, "[PHONE]").as("clean_text"))
      .orderBy(col("doc_id"))
  }

  /**
   * x54 — EXACT CLASS BALANCING: downsample every stratum (source) to
   * the size of the SMALLEST stratum — the balanced-evaluation-set cut
   * (the approximate sibling is [[sourceMixture]]'s map-only
   * hash-threshold sampling; this is the exact-count variant). The
   * target size is ONE 1-row broadcast aggregate (min over per-stratum
   * counts); selection is an md5-ranked window per stratum, so the
   * chosen subset is deterministic and engine-independent. The
   * per-stratum rank is the honest cost: an ordered window over each
   * stratum (strata are few, each ~corpus/|strata|) — at 100 TB prefer
   * the hash-threshold cut unless exact counts are contractual.
   */
  def classBalance(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, dir, "documents")
    val key = md5(col("doc_id").cast("string").cast("binary"))
    val target = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("cnt"))
      .agg(min(col("cnt")).as("target")) // 1-row scalar
    val w = Window.partitionBy(col("source"))
      .orderBy(col("sample_key"), col("doc_id"))
    docs.select(col("doc_id"), col("source"), key.as("sample_key"))
      .withColumn("rn", row_number().over(w))
      .crossJoin(broadcast(target))
      .where(col("rn") <= col("target"))
      .select(col("doc_id"), col("source"), col("rn"))
      .orderBy(col("source"), col("rn"))
  }

  /**
   * x55 — CONCATENATION PACKING (GPT-style sequence packing): per shard,
   * documents are concatenated in a deterministic stream and CUT at
   * fixed context-size boundaries — every token lands in exactly one
   * context, documents may straddle a boundary (that is the defining
   * difference from the bin-assignment packers [[packBins]]/
   * [[packBinsLpt]], which never split a doc). Each doc's context is
   * floor(cum_tokens_before / capacity) with its offset inside that
   * context — ONE running-sum window per shard (shard = md5 bucket, so
   * parallelism = shard count and the stream order is reproducible
   * everywhere). The window's input is (doc_id, est_tokens) only —
   * 16 B/doc through the shuffle.
   */
  def concatPack(spark: SparkSession, dir: String, nShards: Int = 8,
      capacity: Int = 2048): DataFrame =
    concatPackOf(Tables.load(spark, dir, "documents"), nShards, capacity)

  /** [[concatPack]] over an arbitrary (doc_id, text) frame — the
    * property suite drives this directly with generated corpora. */
  def concatPackOf(docs: DataFrame, nShards: Int,
      capacity: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val estTokens = estTokensCol
    val shard = mdShard(nShards)
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(col("doc_id"), estTokens.as("est_tokens"),
        shard.as("shard"))
      .withColumn("cum_before",
        coalesce(sum(col("est_tokens")).over(w), lit(0L)))
      .select(col("shard"), col("doc_id"), col("est_tokens"),
        expr(s"cum_before div $capacity").as("context_id"),
        (col("cum_before") % capacity).as("offset_in_context"))
      .orderBy(col("shard"), col("doc_id"))
  }

  /**
   * x56 — INTERPOLATED BIGRAM LM SCORING: per-document average negative
   * log-likelihood (nats) under a Jelinek–Mercer bigram model estimated
   * on the corpus itself — the standard LM-quality filter one rung above
   * [[unigramLogprob]]: p(w2|w1) = λ·c(w1w2)/c(w1·) + (1−λ)·c(w2)/N,
   * with c(w1·) the bigram-prefix count. Cross-engine determinism is
   * x22/x30's recipe hardened one step: probabilities are IEEE doubles
   * from exact integer counts with IDENTICAL association order in both
   * engines, each distinct bigram's ln is rounded to 9dp and
   * DECIMAL-summed (order-independent) — and the per-doc AVERAGE stays
   * in EXACT INTEGER NANO-NATS (the 9dp sum is an exact multiple of
   * 1e-9; negate to a positive numerator, then floor-divide by the
   * bigram count). A rounded double average tied at the 6th decimal on
   * 22/500 sf0.01 docs — engines resolve .5 differently; integers
   * cannot. Shape: one bigram-postings aggregate + three count joins +
   * a 1-row broadcast scalar — no collect, postings-join scale like
   * BM25.
   */
  def bigramNll(spark: SparkSession, dir: String,
      lambda: Double = 0.75): DataFrame =
    bigramNllOf(Tables.load(spark, dir, "documents"), lambda)

  /** [[bigramNll]] over any (doc_id, text) frame — the property suite
    * feeds arbitrary corpora through this to pin the exact-integer
    * nano-nat contract ([[graft.StatsProps]]). */
  private[graft] def bigramNllOf(docs: DataFrame,
      lambda: Double): DataFrame = {
    val bigrams = docs.select(col("doc_id"),
        split(col("text"), " ").as("toks"))
      // single-token docs have no bigrams — and MUST be filtered before
      // the transform: sequence(1, 0) is DESCENDING in Spark ([1, 0]),
      // so without the guard a 1-token doc indexes toks[1] out of
      // bounds (ANSI error). Caught by StatsProps on arbitrary corpora.
      .where(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(toks) - 1)," +
          " i -> struct(toks[i - 1] AS w1, toks[i] AS w2))")).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val toks = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("tok"))
    // the per-doc postings are the ONE aggregate that touches the
    // interpreted bigram chain; c12 and c1 derive from it by exact
    // integer re-aggregation (sum of per-doc counts == corpus count),
    // so the corpus is split+transformed ONCE instead of three times
    // (PlanGuard check 6 caught the 3-way re-plan, round 16) — the
    // standard materialize-the-postings index-build shape
    val perDoc = bigrams.groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("m"))
      .localCheckpoint()
    val c12 = perDoc.groupBy(col("w1"), col("w2"))
      .agg(sum(col("m")).as("c12"))
    val c1 = perDoc.groupBy(col("w1")).agg(sum(col("m")).as("c1"))
    val c2 = toks.groupBy(col("tok")).agg(count(lit(1)).as("c2"))
    val n = toks.agg(count(lit(1)).as("n_total")) // 1-row scalar
    val p = lit(lambda) * (col("c12").cast("double") / col("c1")) +
      lit(1.0 - lambda) * (col("c2").cast("double") / col("n_total"))
    perDoc
      .join(c12, Seq("w1", "w2")).join(c1, Seq("w1"))
      .join(c2, perDoc("w2") === c2("tok")).drop("tok")
      .crossJoin(broadcast(n))
      // nano-nats per DISTINCT bigram as an exact LONG before any sum —
      // decimal(20,9) * 10^9 stays inside precision 38 (a wide decimal
      // sum multiplied afterwards silently loses scale when the product
      // overflows precision: sums came back truncated to 6dp)
      .withColumn("lp_nano",
        (round(log(p), 9).cast("decimal(20,9)") * 1000000000).cast("long"))
      .withColumn("contrib_nano", col("lp_nano") * col("m"))
      .groupBy(col("doc_id"))
      .agg(sum(col("m")).as("n_bigrams"),
        sum(col("contrib_nano")).as("lp_nano_sum"))
      .select(col("doc_id"), col("n_bigrams"),
        (-col("lp_nano_sum")).as("nll_nano_sum"))
      .withColumn("avg_nll_nano", expr("nll_nano_sum div n_bigrams"))
      .orderBy(col("doc_id"))
  }

  /**
   * x58 — TEXT NORMALIZATION: the canonical first cleanup pass of every
   * corpus build — casefold, collapse whitespace runs, trim — over a
   * deterministically MESSIFIED corpus (x48's pattern: the fixture is
   * clean word soup, so the mess to clean is planted in-query — every
   * 3rd doc uppercased with doubled spaces, every 4th wrapped in
   * tab/trailing whitespace). Entirely MAP-ONLY (one projection; the
   * only exchange is the output sort), which is why normalization is
   * free at 100 TB. `changed` distinguishes repaired docs for audit.
   */
  def normalizeText(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val messy = when(col("doc_id") % 3 === 0,
        upper(regexp_replace(col("text"), " ", "  ")))
      .otherwise(col("text"))
    val wrapped = when(col("doc_id") % 4 === 0,
        concat(lit("\t"), messy, lit("   "))).otherwise(messy)
    val normalized =
      trim(regexp_replace(lower(col("raw")), "\\s+", " "))
    docs.select(col("doc_id"), wrapped.as("raw"))
      .select(col("doc_id"), normalized.as("normalized"),
        (col("raw") =!= normalized).as("changed"))
      .orderBy(col("doc_id"))
  }

  /**
   * x41 — the COMPOSED curation decision table: the per-document verdict a
   * real training-data pipeline materializes before writing its kept set.
   * Three gates in priority order, each a proven standalone operator
   * reused as-is so the math is already cross-engine-pinned:
   *
   *  1. `span_dup`     — x28 span-duplication ratio ≥ `maxDupRatio`
   *                      (boilerplate-heavy doc, C4/RefinedWeb gate);
   *  2. `low_quality`  — x8 quality score < `minScore` (Gopher-style);
   *  3. `not_sampled`  — outside the x17 md5-bucket source mixture.
   *
   * `keep` = survives all gates; `drop_reason` names the FIRST failing
   * gate (the triage view curation dashboards aggregate on). The point of
   * the operator is COMPOSITION: all three signals evaluate in ONE
   * Catalyst plan — the map-only quality/bucket columns fuse into the
   * scan stage, the span gate adds its one explode + one md5-keyed
   * aggregation + one join back, and nothing is materialized between
   * stages. At 100 TB that is one pass over the corpus plus one bounded
   * shuffle pair, versus the three full materializations a
   * stage-per-job pipeline would write.
   */
  def curationDecisions(spark: SparkSession, dir: String,
      minScore: Double = 0.2, maxDupRatio: Double = 0.5): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val quality = qualityScore(spark, dir).select(col("doc_id"), col("score"))
    val spanDup = graft.ext.Dedup.spanDupStats(spark, dir)
      .select(col("doc_id"), col("dup_ratio"))
    val bucket = conv(substring(md5(col("doc_id").cast("string")
      .cast("binary")), 1, 2), 16, 10).cast("int") // 0..255, as x17
    val sampled = (col("source") === "src0") ||
      (col("source") === "src1" && col("bucket") < 128) ||
      (col("source") =!= "src0" && col("source") =!= "src1"
        && col("bucket") < 64)
    docs.select(col("doc_id"), col("source"), bucket.as("bucket"))
      .join(quality, "doc_id")
      .join(spanDup, Seq("doc_id"), "left")
      .withColumn("dup_ratio", coalesce(col("dup_ratio"), lit(0.0)))
      .withColumn("drop_reason",
        when(col("dup_ratio") >= maxDupRatio, lit("span_dup"))
          .when(col("score") < minScore, lit("low_quality"))
          .when(!sampled, lit("not_sampled")))
      .withColumn("keep", col("drop_reason").isNull)
      .select(col("doc_id"), col("source"), col("score"), col("dup_ratio"),
        col("keep"), col("drop_reason"))
      .orderBy(col("doc_id"))
  }

  /**
   * x72 — corpus SNAPSHOT DIFF, the dataset-versioning primitive: given
   * two releases of a corpus, report every added / removed / changed
   * document by content hash — what a training-data registry records
   * between dataset versions (and what an incremental pipeline consumes
   * to reprocess only the delta). The comparison is one full-outer hash
   * join on `doc_id` with per-side md5 content digests: both snapshots
   * are read ONCE, the digest is computed in the scan stage, and the
   * only shuffle is the join's — at 100 TB this is two corpus scans plus
   * one co-partitioned join, with no driver-side state. Rows with status
   * `unchanged` are filtered out (the delta is what a diff consumer
   * reads; the unchanged mass would dominate the output otherwise).
   *
   * Snapshot B is DERIVED deterministically from the fixture corpus
   * (remove `doc_id % 13 == 0`, append " v2" to the text of surviving
   * `doc_id % 7 == 0`, add a `doc_id + 1_000_000` copy prefixed "new "
   * for `doc_id % 11 == 0`) so the DuckDB oracle can rebuild the exact
   * same release; a production run points `b` at the next snapshot's
   * parquet instead — the diff plan is unchanged.
   */
  /** The derived "next release" snapshot shared by x72 (diff) and x136
    * (distribution drift): remove doc_id % 13, " v2"-edit surviving
    * % 7, add "new "-prefixed +1e6 copies of % 11. */
  private[graft] def snapshotB(a: DataFrame): DataFrame =
    a.where(col("doc_id") % 13 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")))
      .unionByName(a.where(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("source"),
          concat(lit("new "), col("text")).as("text")))

  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val a = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    val b = snapshotB(a)
    val aH = a.select(col("doc_id"), col("source").as("a_source"),
      md5(col("text")).as("old_md5"))
    val bH = b.select(col("doc_id"), col("source").as("b_source"),
      md5(col("text")).as("new_md5"))
    aH.join(bH, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("a_source"), col("b_source")).as("source"),
        when(col("new_md5").isNull, lit("removed"))
          .when(col("old_md5").isNull, lit("added"))
          .when(col("old_md5") =!= col("new_md5"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"),
        col("old_md5"), col("new_md5"))
      .where(col("status") =!= "unchanged")
      .orderBy(col("doc_id"))
  }

  /**
   * x136 — UNIGRAM DISTRIBUTION DRIFT between two corpus snapshots:
   * the smoothed KL divergence (both directions) of the whitespace
   * unigram distributions — the standard distribution-shift monitor a
   * dataset registry tracks between releases (x72 reports WHICH docs
   * changed; this reports how much the TOKEN MIX moved, which is what
   * actually perturbs a tokenizer or mixture downstream). Add-1
   * smoothing over the union vocabulary keeps every log finite.
   *
   * Exact-integer discipline (the x56 recipe): with p = (c+1)/(N+V),
   * q = (d+1)/(M+V), the scaled divergence KL(A‖B)·(N+V)·1e9 expands to
   *   Σ (c+1)·[ln9(c+1) − ln9(d+1)]  +  (N+V)·[ln9(M+V) − ln9(N+V)]
   * where ln9(x) is the 9dp-rounded natural log frozen to integer
   * nano-nats — ln of identical integer arguments is bit-exact across
   * engines (x22/x24/x56 precedents), every product and sum is exact
   * int64, so the hash has zero tie surface.
   *
   * Scale shape: two token-keyed map-side-combinable counts, one
   * vocab-sized full-outer join, one aggregate row — no doc-level
   * state, no driver work beyond the 1-row result.
   */
  def unigramDrift(spark: SparkSession, dir: String): DataFrame = {
    val a = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    val b = snapshotB(a)
    def ln9(x: Column): Column =
      (round(log(x.cast("double")), 9).cast("decimal(20,9)")
        * 1000000000L).cast("long")
    def counts(df: DataFrame, as: String): DataFrame =
      df.select(explode(split(col("text"), " ")).as("t"))
        .groupBy(col("t")).agg(count(lit(1)).as(as))
    val j = counts(a, "c").join(counts(b, "d"), Seq("t"), "full_outer")
      .na.fill(0L, Seq("c", "d"))
    j.agg(
        sum(col("c")).as("n_tokens_a"),
        sum(col("d")).as("n_tokens_b"),
        count(lit(1)).as("vocab"),
        sum((col("c") + 1) * (ln9(col("c") + 1) - ln9(col("d") + 1)))
          .as("t_ab"),
        sum((col("d") + 1) * (ln9(col("d") + 1) - ln9(col("c") + 1)))
          .as("t_ba"))
      .select(col("n_tokens_a"), col("n_tokens_b"), col("vocab"),
        (col("t_ab") + (col("n_tokens_a") + col("vocab")) *
          (ln9(col("n_tokens_b") + col("vocab")) -
            ln9(col("n_tokens_a") + col("vocab"))))
          .as("kl_ab_scaled_nano"),
        (col("t_ba") + (col("n_tokens_b") + col("vocab")) *
          (ln9(col("n_tokens_a") + col("vocab")) -
            ln9(col("n_tokens_b") + col("vocab"))))
          .as("kl_ba_scaled_nano"))
  }

  /**
   * x73 — tokenizer-training VOCABULARY BUILD: global token frequencies,
   * the top-V vocabulary by (occurrences DESC, token ASC), and each
   * rank's cumulative corpus coverage — the frequency-cutoff prestep of
   * BPE/WordPiece training and the standard "what does a V-entry vocab
   * cover" diagnostic. Coverage is EXACT integer arithmetic: cumulative
   * occurrences via an integer window sum over the V-row frame, and
   * parts-per-million as a floor division (`cum_occ * 1e6 div total`) —
   * no double division, so no cross-engine rounding-tie surface.
   *
   * Plan shape at 100 TB: one explode + one hash aggregation shuffled on
   * the token (the vocabulary, not the corpus, is the reduce-side
   * cardinality), then TakeOrderedAndProject for the top V — per
   * partition heaps, V rows to the driver-side merge, never a global
   * sort. The counts frame feeds BOTH the top-V selection and the
   * `total_occ` scalar; a naive diamond would re-run the corpus scan
   * for each branch (probed: the total branch column-prunes doc_id
   * away, so the two aggregation subtrees canonicalize differently and
   * exchange reuse can never fire) — the vocab-sized counts are
   * therefore materialized ONCE via `localCheckpoint`, the same
   * cut-the-lineage pattern the CC rounds use; a production run
   * persists the vocab table instead. The rank/cumsum window runs on
   * the bounded V-row result — the WindowExec single-partition warning
   * is this ≤V-row frame, not corpus data.
   */
  /**
   * x74 — deterministic RANGE-SHARDED export: assign every doc to one of
   * S contiguous key ranges with boundaries at the EXACT S-quantiles,
   * then report the per-shard audit (count, key bounds, token mass).
   * This is `repartitionByRange` with the sampling removed: Spark's
   * built-in range partitioner draws a reservoir SAMPLE, so shard
   * boundaries differ run to run — unacceptable for a reproducible
   * corpus export (resumable jobs, diffable shards, stable manifests).
   * Here the boundary pass is an exact `percentile` aggregate and
   * assignment is a pure function of the key, so the same corpus always
   * produces byte-identical shards.
   *
   * Scale design: the shard key is the first 24 BITS of md5(doc_id) —
   * uniform (shard balance ~1/√n per shard) and, crucially, a BOUNDED
   * domain (≤16.7M distinct values), so the exact-percentile aggregate
   * shuffles at most the (key → count) histogram REGARDLESS of corpus
   * size — no reservoir, no t-digest approximation, deterministic at
   * 100 TB. Two corpus passes total (boundary histogram + assignment),
   * the same count `repartitionByRange` spends (sample pass + shuffle);
   * the boundary row broadcasts. Interpolated boundaries are exact
   * dyadic doubles (quantiles at k/8 of 24-bit ints), and DuckDB's
   * `quantile_cont` uses the identical type-7 `h=(n-1)q` formula
   * (probed) — no cross-engine float surface.
   */
  def rangeShards(spark: SparkSession, dir: String, shards: Int = 8)
      : DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val keyed = docs.select(col("doc_id"),
      conv(substring(md5(col("doc_id").cast("string")), 1, 6), 16, 10)
        .cast("long").as("key"),
      estTokensOf(col("text")).as("est_tokens"))
    val qs = (1 until shards).map(q => s"${q}D / $shards")
    val bounds = keyed.agg(
      expr(s"percentile(key, array(${qs.mkString(", ")}))").as("bnds"))
    keyed.crossJoin(broadcast(bounds))
      .withColumn("shard",
        expr("size(filter(bnds, b -> key > b))").cast("long"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("key")).as("key_min"),
        max(col("key")).as("key_max"),
        sum(col("est_tokens")).as("tok_sum"))
      .orderBy(col("shard"))
  }

  /**
   * x77 — CCNet-style PERPLEXITY BUCKETING: every doc scored by its
   * average unigram negative log-likelihood and cut into head / middle
   * / tail buckets at corpus-relative quantile boundaries — the CCNet
   * (Wenzek et al. 2020) quality-stratification step between x24's
   * fixed-cutoff LM filter and training-set assembly (`kept` drops the
   * tail, the standard CCNet action).
   *
   * Determinism stack: scores are EXACT INTEGER nano-nats (x56's
   * recipe — per-type `round(ln p, 9)` widened to DECIMAL(20,9), ×1e9
   * to LONG before any sum, positive numerator floor-division), and
   * the bucket boundaries are the exact 25th/75th percentiles —
   * QUARTILES rather than CCNet's terciles deliberately: dyadic q
   * makes the type-7 interpolation exact in double (x74's argument),
   * where q=1/3 would round and risk a last-ulp boundary straddle
   * between engines.
   *
   * Scale: one explode + vocab-keyed freq aggregation, one (doc, tok)
   * aggregation joined to the broadcast-scale vocab, then the
   * doc-level score frame (16 B/doc) is localCheckpoint-materialized
   * so the boundary aggregate and the bucket assignment share ONE
   * scoring pass (the x73 diamond lesson); CCNet itself fits its LM
   * and percentiles on a reference corpus for the same reason.
   */
  def ccnetBuckets(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val toks = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("tok"))
    val total = toks.agg(count(lit(1)).cast("double").as("n_total"))
    val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("n_tok"))
    val scores = toks.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("m"))
      .join(freq, "tok")
      .crossJoin(broadcast(total))
      .withColumn("lp_nano",
        (round(log(col("n_tok").cast("double") / col("n_total")), 9)
          .cast("decimal(20,9)") * 1000000000).cast("long"))
      .groupBy(col("doc_id"))
      .agg(sum(col("m")).as("n_tokens"),
        (-sum(col("m") * col("lp_nano"))).as("nll_nano_sum"))
      .withColumn("nll_nano", expr("nll_nano_sum div n_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("nll_nano"))
      .localCheckpoint()
    val bounds = scores.agg(
      expr("percentile(nll_nano, array(1D / 4, 3D / 4))").as("q"))
    scores.crossJoin(broadcast(bounds))
      .withColumn("bucket",
        when(col("nll_nano") <= expr("q[0]"), "head")
          .when(col("nll_nano") > expr("q[1]"), "tail")
          .otherwise("middle"))
      .withColumn("kept", col("bucket") =!= "tail")
      .select(col("doc_id"), col("n_tokens"), col("nll_nano"),
        col("bucket"), col("kept"))
      .orderBy(col("doc_id"))
  }

  def vocabBuild(spark: SparkSession, dir: String, topV: Int = 64)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, dir, "documents")
    val tok = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("token"))
    val counts = tok.groupBy(col("token"))
      .agg(count(lit(1)).as("n_occ"),
        countDistinct(col("doc_id")).as("n_docs"))
      .localCheckpoint()
    val total = counts.agg(sum(col("n_occ")).as("total_occ"))
    val top = counts.orderBy(col("n_occ").desc, col("token")).limit(topV)
    val w = Window.orderBy(col("n_occ").desc, col("token"))
    top.crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_occ",
        sum(col("n_occ")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("cov_ppm", expr("cum_occ * 1000000 div total_occ"))
      .select(col("rank"), col("token"), col("n_occ"), col("n_docs"),
        col("cum_occ"), col("cov_ppm"))
      .orderBy(col("rank"))
  }

  /**
   * x101 — ES `multi_match` (type `best_fields` with tie_breaker 0.5):
   * the same query scored independently against TWO fields — a derived
   * `title` (the document's first 5 tokens) and `body` (the rest) —
   * combined as ES does: `best + tie_breaker * other`. Per-field
   * scoring is [[bm25]] verbatim, each field with its OWN df/avgdl
   * statistics (exactly why ES scores per field and then combines:
   * term rarity differs per field). Both legs keep EVERY scoring doc
   * (postings-pruned — only docs matching a query term score at all),
   * because with a nonzero tie_breaker a per-leg top-k truncation is
   * NOT lossless; the global top-k happens once, after fusion. Each
   * leg score freezes once to exact integer micro-units and the fused
   * score lives in HALF-micro units (2*best + other == best +
   * 0.5*other up to ordering) — all-integer, zero re-rounding.
   */
  def multiMatchBestFields(spark: SparkSession, dir: String,
      terms: Seq[String] = Seq("spark", "query", "stream"),
      k: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, dir, "documents")
    val legK = 1 << 20 // keep all scoring docs per field leg
    val title = docs.select(col("doc_id"),
      array_join(slice(split(col("text"), " "), 1, 5), " ").as("text"))
    val body = docs.select(col("doc_id"), array_join(expr(
      "slice(split(text, ' '), 6, greatest(size(split(text, ' ')) - 5, 0))"),
      " ").as("text"))
    val t = bm25(title, "doc_id", "text", terms, legK)
      .select(col("doc_id"), col("score").as("title_score"))
    val b = bm25(body, "doc_id", "text", terms, legK)
      .select(col("doc_id"), col("score").as("body_score"))
    // ES best_fields with tie_breaker: score = best + tb * other with
    // tb = 0.5. Each leg score freezes ONCE to exact integer micro
    // units (the cosMicro discipline — re-rounding the combined DOUBLE
    // split a .0000005 tie between engines, caught at sf0.001), and the
    // combination is kept in HALF-micro units: 2*best + other — an
    // exact integer, order-equivalent to best + 0.5*other, zero
    // further tie surface.
    def micro(c: org.apache.spark.sql.Column) =
      coalesce((c.cast("decimal(10,6)") * 1000000).cast("long"), lit(0L))
    val fused = t.join(b, Seq("doc_id"), "full_outer")
      .withColumn("score_hmicro",
        lit(2L) * greatest(micro(col("title_score")),
          micro(col("body_score")))
          + least(micro(col("title_score")), micro(col("body_score"))))
      .orderBy(col("score_hmicro").desc, col("doc_id")).limit(k)
    val w = Window.partitionBy(col("score_hmicro") - col("score_hmicro"))
      .orderBy(col("score_hmicro").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(w))
      .select(col("doc_id"), col("title_score"), col("body_score"),
        col("score_hmicro"), col("rank"))
      .orderBy(col("rank"))
  }

  /**
   * x100 — TOKEN-BUDGET EPOCH ALLOCATION, the "data recipe" table a
   * pretraining run is configured from (the Llama-style per-source
   * epochs sheet): given per-source token counts, a total token budget
   * (3x the corpus here) splits across sources by temperature-smoothed
   * weights (τ = 0.5 — x38's sqrt rule, frozen to exact integer
   * micro-units), and each source's allocation converts to EPOCHS in
   * exact integer permille, capped at 3.0 epochs (the repeat ceiling
   * after which curated data degrades — both capped and uncapped legs
   * are populated at every fixture SF, probed). Every figure after the
   * one pinned sqrt rounding is integer floor arithmetic — the recipe
   * reproduces bit-for-bit on any engine, which is exactly what one
   * wants from the config artifact of a 100 TB training run. One
   * doc-level map pass + a per-source rollup; the allocation table is
   * handful-of-rows.
   */
  def tokenBudget(spark: SparkSession, dir: String,
      budgetMult: Int = 3, capPermille: Long = 3000L): DataFrame = {
    val perSource = Tables.load(spark, dir, "documents")
      .select(col("source"), expr(
        "size(filter(split(text, ' '), x -> x <> ''))").cast("long")
        .as("n"))
      .groupBy(col("source")).agg(sum(col("n")).as("tokens"))
      .withColumn("sqrt_micro", expr(
        "CAST(CAST(round(sqrt(CAST(tokens AS DOUBLE)), 6) " +
          "AS DECIMAL(18,6)) * 1000000 AS BIGINT)"))
      .localCheckpoint()
    val totals = perSource.agg(sum(col("tokens")).as("total_tokens"),
      sum(col("sqrt_micro")).as("total_micro"))
    perSource.crossJoin(broadcast(totals))
      .withColumn("planned_tokens", expr(
        s"($budgetMult * total_tokens * sqrt_micro) div total_micro"))
      .withColumn("epochs_permille",
        least(expr("(planned_tokens * 1000) div tokens"),
          lit(capPermille)))
      .withColumn("final_tokens",
        expr("(tokens * epochs_permille) div 1000"))
      .select(col("source"), col("tokens"), col("sqrt_micro"),
        col("planned_tokens"), col("epochs_permille"),
        col("final_tokens"))
      .orderBy(col("source"))
  }
}
