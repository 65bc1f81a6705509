package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.BpeMerge
import graft.ingest.Tables

/**
 * Byte-pair-encoding tokenizer TRAINING and application — the real
 * Sennrich (2016) algorithm, not x9's "BPE-ish" regex estimate: learn
 * the K most frequent adjacent-symbol merges from the corpus, then
 * tokenize with them.
 *
 * Scale design — why BPE training is cheap on Spark despite being
 * iterative: the ONLY corpus-sized pass is the initial word-TYPE count
 * (one explode + one hash aggregation, exactly x73's shape). Every
 * merge round after that operates on the word-type table — bounded by
 * the VOCABULARY, not the corpus (Heaps' law: ~millions of types at
 * 100 TB, each a short symbol array) — so K rounds cost K small jobs,
 * localCheckpoint-bounded like the CC rounds. Per round, the argmax
 * merge rule is ONE row collected to the driver: the learned merge
 * list IS driver state by definition (it is the training artifact,
 * like x6's k×dim centroid sync), bounded by K.
 *
 * Determinism: pair counts are exact integers; the argmax tiebreak is
 * (count DESC, left ASC, right ASC) on ASCII symbols, identical under
 * Spark's and DuckDB's binary string orderings. The merge APPLICATION
 * is the greedy left-to-right scan ([[graft.functions.BpeMerge]]),
 * whose DuckDB mirror is the run-parity closed form over window
 * functions; the oracle replays all K rounds as a generated CTE chain
 * ([[oracleCtes]]).
 */
object Bpe {

  /** End-of-word marker — '>' does not occur in the corpus charset
    * (space + a-w,y; probed), so merged symbols can encode "token ends
    * a word" exactly like Sennrich's `</w>`. */
  val Marker = ">"

  /** Merge-round count shared by the entries and their oracles. */
  val Steps = 12

  /** One learned merge rule. */
  case class MergeRule(step: Long, lhs: String, rhs: String, cnt: Long)

  /** Word-type table: one row per DISTINCT word with its corpus
    * frequency and initial symbol array (chars + end marker). The one
    * corpus-sized pass; checkpointed so the K rounds never rescan. */
  private def wordTypes(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .withColumn("syms",
        concat(split(col("word"), ""), array(lit(Marker))))
      .localCheckpoint()

  /** Run `steps` merge rounds; returns the learned rules and the final
    * word-type frame (symbols after all merges). */
  private[ext] def train(spark: SparkSession, dir: String,
      steps: Int = Steps): (Seq[MergeRule], DataFrame) = {
    var wt = wordTypes(spark, dir)
    val rules = Seq.newBuilder[MergeRule]
    var k = 1
    var exhausted = false
    while (k <= steps && !exhausted) {
      // adjacent-pair counts over word TYPES weighted by frequency;
      // the size >= 2 filter also guards ANSI against the descending
      // sequence(0, -1) a fully-merged 1-symbol word would produce
      val best = wt.where(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(0, size(syms) - 2)," +
            " i -> struct(syms[i] AS lhs, syms[i + 1] AS rhs))")).as("p"))
        .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("lhs"), col("rhs"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, c) = (best(0).getAs[String]("lhs"),
          best(0).getAs[String]("rhs"), best(0).getAs[Long]("cnt"))
        rules += MergeRule(k.toLong, l, r, c)
        wt = wt.withColumn("syms", BpeMerge(col("syms"), l, r))
          .localCheckpoint()
        k += 1
      }
    }
    (rules.result(), wt)
  }

  /** x75 — the learned merge-rule table (the tokenizer artifact). */
  def bpeTrain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    train(spark, dir)._1.toDF().orderBy(col("step"))
  }

  /**
   * x76 — tokenize the corpus with the learned merges: per doc, total
   * subword count and word count. Words tokenize once on the TYPE
   * table (where all K merges already ran); the per-doc rollup is one
   * (doc, word) aggregation joined to the broadcast-sized type table —
   * the corpus text itself is never re-tokenized per occurrence.
   */
  def bpeTokenize(spark: SparkSession, dir: String): DataFrame = {
    val (_, wt) = train(spark, dir)
    val perWord = wt.select(col("word"),
      size(col("syms")).cast("long").as("n_sub"))
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("n_occ"))
      .join(broadcast(perWord), "word")
      .groupBy(col("doc_id"))
      .agg(sum(col("n_occ") * col("n_sub")).as("bpe_tokens"),
        sum(col("n_occ")).as("n_words"))
      .orderBy(col("doc_id"))
  }

  /**
   * x87 — TOKENIZER EVAL: fertility (subwords per word) and compression
   * (text bytes per subword) of the trained x75 BPE, per source — the
   * two figures a tokenizer report always leads with (a fertility jump
   * on one source means the vocabulary underfits it; bytes/token is the
   * context-window budget). Exact integer permille by floor division.
   * Reuses the tokenize-on-the-TYPE-table path (text never re-tokenized
   * per occurrence); the eval itself is one doc-level join + a
   * per-source rollup.
   */
  def tokenizerEval(spark: SparkSession, dir: String): DataFrame = {
    val perDoc = bpeTokenize(spark, dir)
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        octet_length(col("text")).cast("long").as("n_bytes"))
    perDoc.join(docs, "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("words"),
        sum(col("bpe_tokens")).as("bpe_tokens"),
        sum(col("n_bytes")).as("text_bytes"))
      .withColumn("fertility_permille",
        expr("bpe_tokens * 1000 div words").cast("long"))
      .withColumn("bytes_per_token_permille",
        expr("text_bytes * 1000 div bpe_tokens").cast("long"))
      .orderBy(col("source"))
  }

  /** x87's oracle: the same 12-round replay, rolled up per source
    * (DuckDB `strlen` is BYTE length, matching Spark's octet_length). */
  private[ext] def tokenizerEvalOracle(steps: Int): String =
    s"""${oracleCtes(steps)},
       |pd AS (SELECT d.doc_id,
       |    CAST(SUM(len(w.syms)) AS BIGINT) AS bpe_tokens,
       |    CAST(COUNT(*) AS BIGINT) AS n_words
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
       |        FROM documents) d
       |  JOIN w$steps w ON d.word = w.word
       |  GROUP BY d.doc_id),
       |db AS (SELECT doc_id, source,
       |    CAST(strlen(text) AS BIGINT) AS n_bytes FROM documents)
       |SELECT db.source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(pd.n_words) AS BIGINT) AS words,
       |  CAST(sum(pd.bpe_tokens) AS BIGINT) AS bpe_tokens,
       |  CAST(sum(db.n_bytes) AS BIGINT) AS text_bytes,
       |  CAST((sum(pd.bpe_tokens) * 1000) // sum(pd.n_words) AS BIGINT)
       |    AS fertility_permille,
       |  CAST((sum(db.n_bytes) * 1000) // sum(pd.bpe_tokens) AS BIGINT)
       |    AS bytes_per_token_permille
       |FROM pd JOIN db USING (doc_id)
       |GROUP BY db.source ORDER BY db.source""".stripMargin

  /**
   * Generated DuckDB CTE chain replaying `steps` training rounds: each
   * round recounts adjacent pairs, picks the same (cnt DESC, lhs, rhs)
   * argmax, and applies the merge via the run-parity closed form (a
   * match position is kept iff its offset inside its maximal
   * consecutive-match run is even — equivalent to the greedy
   * left-to-right scan; runs > 1 only arise when lhs = rhs).
   * `w{steps}` is the final word-type relation.
   */
  private[ext] def oracleCtes(steps: Int): String = {
    val b = new StringBuilder
    b ++= s"""WITH w0 AS MATERIALIZED (
             |  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq,
             |    list_append(string_split(word, ''), '$Marker') AS syms
             |  FROM (SELECT unnest(string_split(text, ' ')) AS word
             |        FROM documents)
             |  GROUP BY word)""".stripMargin
    for (k <- 0 until steps) {
      b ++= s""",
        |p$k AS MATERIALIZED (
        |  SELECT syms[i] AS lhs, syms[i + 1] AS rhs,
        |    CAST(SUM(freq) AS BIGINT) AS cnt
        |  FROM w$k, UNNEST(range(1, len(syms))) AS t(i)
        |  GROUP BY 1, 2),
        |b$k AS MATERIALIZED (SELECT lhs, rhs, cnt FROM p$k
        |        ORDER BY cnt DESC, lhs, rhs LIMIT 1),
        |pos$k AS MATERIALIZED (
        |  SELECT word, freq, t.i AS i, syms[i] AS s
        |  FROM w$k, UNNEST(range(1, len(syms) + 1)) AS t(i)),
        |mk$k AS MATERIALIZED (
        |  SELECT p.word, p.freq, p.i, p.s,
        |    CASE WHEN p.s = b.lhs AND lead(p.s) OVER
        |      (PARTITION BY p.word ORDER BY p.i) = b.rhs
        |    THEN 1 ELSE 0 END AS m
        |  FROM pos$k p, b$k b),
        |kp$k AS MATERIALIZED (
        |  SELECT word, freq, i, s, CASE WHEN m = 1 AND
        |      (ROW_NUMBER() OVER (PARTITION BY word, m, grp ORDER BY i)
        |        - 1) % 2 = 0
        |    THEN 1 ELSE 0 END AS kept
        |  FROM (SELECT *, i - ROW_NUMBER() OVER
        |          (PARTITION BY word, m ORDER BY i) AS grp
        |        FROM mk$k)),
        |w${k + 1} AS MATERIALIZED (
        |  SELECT word, freq, list(sym ORDER BY i) AS syms FROM (
        |    SELECT word, freq, i,
        |      CASE WHEN kept = 1 THEN s || lead(s) OVER
        |             (PARTITION BY word ORDER BY i)
        |           WHEN lag(kept) OVER
        |             (PARTITION BY word ORDER BY i) = 1 THEN NULL
        |           ELSE s END AS sym
        |    FROM kp$k)
        |  WHERE sym IS NOT NULL GROUP BY word, freq)""".stripMargin
    }
    b.result()
  }

  /** x75's oracle: the union of every round's chosen rule. */
  private[ext] def trainOracle(steps: Int): String = {
    val unions = (0 until steps).map(k =>
      s"SELECT CAST(${k + 1} AS BIGINT) AS step, lhs, rhs, cnt FROM b$k")
      .mkString("\n  UNION ALL ")
    s"${oracleCtes(steps)}\nSELECT * FROM (\n  $unions\n) ORDER BY step"
  }

  /** x76's oracle: per-doc subword totals from the final type table. */
  private[ext] def tokenizeOracle(steps: Int): String =
    s"""${oracleCtes(steps)}
       |SELECT d.doc_id,
       |  CAST(SUM(len(w.syms)) AS BIGINT) AS bpe_tokens,
       |  CAST(COUNT(*) AS BIGINT) AS n_words
       |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
       |      FROM documents) d
       |JOIN w$steps w ON d.word = w.word
       |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin

  // ------------------- unigram-LM (SentencePiece) tokenizer ------------

  /** Unigram vocab geometry: substring pieces up to this length. */
  private[ext] val UniMaxPiece = 4
  /** Multi-char pieces kept (plus ALL single chars for coverage). */
  private[ext] val UniTopPieces = 16
  /** DP-chain depth for the oracle (>= the longest fixture word). */
  private[ext] val UniMaxWord = 12

  /**
   * x99 — UNIGRAM-LM TOKENIZATION (the SentencePiece family's other
   * tokenizer, Kudo 2018), completing the tokenizer trio next to x75's
   * learned BPE and x9's regex baseline: a piece vocabulary (every
   * corpus character for coverage plus the top-16 weighted substrings
   * of length 2..4) gets integer nano-nat log-probabilities
   * (w = scaled9(ln freq) - scaled9(ln total) — each ln rounded THEN
   * scaled, the x56/x79 schedule), and every word TYPE segments by the
   * native [[graft.functions.UnigramViterbi]] max-likelihood DP
   * (ties -> longer last piece — a total integer order).
   *
   * Scale shape: the only corpus-sized pass is the word-TYPE count
   * (x73's explode+agg); candidate-piece counting explodes the BOUNDED
   * type table (31 types x <=30 substrings here; vocab-bounded always);
   * the collected vocabulary is ~40 (piece, weight) rows — the k x dim
   * centroid-sync pattern — inlined into the expression so the
   * segmentation pass is map-only on the type table. Text is never
   * re-segmented per occurrence (x76's lesson).
   */
  def unigramTokenize(spark: SparkSession, dir: String): DataFrame = {
    val types = Tables.load(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("word"))
      .where(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("n_occ"))
      .localCheckpoint()
    // candidate substrings of length 1..4, weighted by type frequency
    val cand = types.select(col("word"), col("n_occ"),
      explode(expr(
        s"""flatten(transform(sequence(1, $UniMaxPiece), l ->
           |  IF(l <= length(word),
           |     transform(sequence(1, length(word) - l + 1),
           |               p -> substring(word, p, l)),
           |     CAST(array() AS ARRAY<STRING>))))""".stripMargin))
        .as("piece"))
    // vocab-bounded and consumed by BOTH the singles and multis branch
    // — materialized once so the interpreted substring-explosion chain
    // is not re-planned per branch (PlanGuard check 6, round 16)
    val freq = cand.groupBy(col("piece")).agg(sum(col("n_occ")).as("freq"))
      .localCheckpoint()
    val multi = freq.where(length(col("piece")) >= 2)
      .orderBy(col("freq").desc, col("piece")).limit(UniTopPieces)
    val chosen = freq.where(length(col("piece")) === 1)
      .unionByName(multi)
    val total = chosen.agg(sum(col("freq")).as("total"))
    def scaled9(c: String): String =
      s"CAST(CAST(round(ln(CAST($c AS DOUBLE)), 9) AS DECIMAL(20,9)) " +
        "* 1000000000 AS BIGINT)"
    val vocab = chosen.crossJoin(broadcast(total))
      .select(col("piece"),
        (expr(scaled9("freq")) - expr(scaled9("total"))).as("w_nano"))
      .orderBy(col("piece"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val seg = graft.functions.UnigramViterbi.viterbi(col("word"), vocab)
    types
      .withColumn("seg", seg)
      .select(col("word"), col("n_occ"),
        col("seg.pieces").as("pieces"),
        col("seg.n_pieces").as("n_pieces"),
        col("seg.score_nano").as("score_nano"))
      .orderBy(col("word"))
  }

  /** The x56 nano-nat schedule as DuckDB SQL (each ln rounded to 9dp
    * THEN scaled — shared by the x99 and x137 oracles). */
  private def s9Sql(c: String): String =
    s"CAST(CAST(round(ln(CAST($c AS DOUBLE)), 9) AS DECIMAL(20,9)) " +
      "* 1000000000 AS BIGINT)"

  /** The shared INITIAL-vocabulary CTEs of x99/x137: word types,
    * substring candidates, frequencies, the alphabet (`alpha`), the
    * initial multi-piece set (`mv0`), initial vocab/total/weights
    * (`vocab0`/`tot0`/`w0`). */
  private def baseVocabCtes: String =
    s"""types AS MATERIALIZED (
       |  SELECT t AS word, CAST(count(*) AS BIGINT) AS n_occ
       |  FROM (SELECT unnest(string_split(text, ' ')) AS t
       |        FROM documents)
       |  WHERE t <> '' GROUP BY 1),
       |cand AS (SELECT substr(word, p, l) AS piece, n_occ
       |  FROM types,
       |       UNNEST(range(1, $UniMaxPiece + 1)) AS tl(l),
       |       UNNEST(range(1, 13)) AS tp(p)
       |  WHERE l <= length(word) AND p + l - 1 <= length(word)),
       |f AS (SELECT piece, CAST(sum(n_occ) AS BIGINT) AS freq
       |      FROM cand GROUP BY 1),
       |alpha AS MATERIALIZED (SELECT piece FROM f WHERE length(piece) = 1),
       |mv0 AS MATERIALIZED (
       |  SELECT piece, freq FROM (
       |    SELECT piece, freq FROM f WHERE length(piece) >= 2
       |    ORDER BY freq DESC, piece LIMIT $UniTopPieces)),
       |vocab0 AS (
       |  SELECT piece, freq FROM f WHERE length(piece) = 1
       |  UNION ALL
       |  SELECT piece, freq FROM mv0),
       |tot0 AS (SELECT CAST(sum(freq) AS BIGINT) AS total FROM vocab0),
       |w0 AS MATERIALIZED (SELECT piece,
       |    ${s9Sql("freq")} - ${s9Sql("total")} AS w_nano
       |  FROM vocab0, tot0)""".stripMargin

  /** A full Viterbi DP chain over `types` under weight CTE `wCte`, as
    * generated MATERIALIZED prefix CTEs `${p}0..${p}12` (dp_j from
    * dp_{j-1..j-4}; ties -> longer piece via `k DESC`) + the per-length
    * finals union `fin_$p` (word, n_occ, score, path). */
  private def dpChainSql(p: String, wCte: String): String = {
    val dps = (1 to UniMaxWord).map { j =>
      val legs = (1 to math.min(UniMaxPiece, j)).map { k =>
        s"""SELECT d.word, d.n_occ, $k AS k,
           |      d.score + w.w_nano AS score,
           |      CASE WHEN d.path = '' THEN w.piece
           |           ELSE d.path || '|' || w.piece END AS path
           |    FROM $p${j - k} d
           |    JOIN $wCte w ON w.piece = substr(d.word, ${j - k + 1}, $k)
           |    WHERE length(d.word) >= $j""".stripMargin
      }.mkString("\n    UNION ALL\n    ")
      s"""$p$j AS MATERIALIZED (
         |  SELECT word, n_occ, score, path FROM (
         |    SELECT *, row_number() OVER (PARTITION BY word
         |        ORDER BY score DESC, k DESC) AS rn FROM (
         |    $legs))
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    val finals = (1 to UniMaxWord).map(j =>
      s"SELECT word, n_occ, score, path FROM $p$j WHERE length(word) = $j")
      .mkString("\n  UNION ALL ")
    s"""${p}0 AS (SELECT word, n_occ, CAST(0 AS BIGINT) AS score,
       |        '' AS path FROM types),
       |$dps,
       |fin_$p AS (
       |  $finals)""".stripMargin
  }

  /** x99's oracle: the vocabulary derivation replayed in SQL, then the
    * Viterbi DP as [[dpChainSql]]'s generated chain. */
  private[ext] def unigramOracle: String =
    s"WITH $baseVocabCtes,\n${dpChainSql("dp", "w0")}\n" +
      """SELECT word, n_occ, path AS pieces,
        |  CAST(length(path) - length(replace(path, '|', '')) + 1 AS INT)
        |    AS n_pieces,
        |  CAST(score AS BIGINT) AS score_nano
        |FROM fin_dp ORDER BY word""".stripMargin

  /** Driver-side x56 nano-nat schedule — Double.toString-based HALF_UP
    * like Spark's round(ln(x), 9) and DuckDB's, so the three agree. */
  private def s9l(x: Long): Long =
    new java.math.BigDecimal(java.lang.Double.toString(math.log(x.toDouble)))
      .setScale(9, java.math.RoundingMode.HALF_UP)
      .movePointRight(9).longValueExact()

  /**
   * x137 — UNIGRAM-LM EM TRAINING (Kudo 2018 §3.2's iterative
   * re-estimation + pruning, completing the tokenizer family: x75/x76
   * TRAIN+apply BPE, x99 only APPLIES frequency-seeded unigram weights).
   * K rounds of the hard-EM (Viterbi) variant — the E-step assigns each
   * word TYPE its single max-likelihood segmentation instead of
   * soft forward-backward expectations, which keeps every quantity an
   * exact integer across engines (soft EM's fractional expected counts
   * have no cross-engine-stable representation):
   *
   *  - E-step: Viterbi-segment every word type under the current
   *    nano-nat weights (the x99 native DP, ties -> longer last piece);
   *    piece count = Σ n_occ over its occurrences in the chosen paths.
   *  - M-step: re-estimate w = s9(count) − s9(total) (each ln rounded
   *    to 9dp then scaled — the x56 schedule, zero float surface in
   *    any comparison).
   *  - Prune: drop the bottom 25% of USED multi-char pieces by
   *    (count DESC, piece) rank — m − m div 4 survive; unused multis
   *    (count 0) drop outright; the alphabet always survives with a
   *    count floor of 1 (Kudo's character-coverage invariant).
   *
   * Scale shape: the corpus is touched ONCE (the word-type aggregate —
   * x75's lesson); every EM round runs on the vocab-bounded TYPE table
   * with the vocabulary inlined into the native expression, and the
   * per-round sync is the collected piece-count table (~40 rows — the
   * k×dim centroid-sync pattern, x78's Lloyd shape). Rounds 1..K−1
   * sync on the driver; round K's count/prune/re-weight stays a
   * DataFrame so the output plan is the distributed computation.
   *
   * Oracle: the identical K rounds as generated MATERIALIZED-CTE
   * chains — one [[dpChainSql]] Viterbi DP per round against that
   * round's weight CTE (the x75 MATERIALIZED lesson; DuckDB would
   * otherwise re-inline each chain exponentially).
   */
  def unigramEm(spark: SparkSession, dir: String,
      rounds: Int = UniEmRounds): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val types = Tables.load(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("word"))
      .where(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("n_occ"))
      .localCheckpoint()
    val cand = types.select(col("word"), col("n_occ"),
      explode(expr(
        s"""flatten(transform(sequence(1, $UniMaxPiece), l ->
           |  IF(l <= length(word),
           |     transform(sequence(1, length(word) - l + 1),
           |               p -> substring(word, p, l)),
           |     CAST(array() AS ARRAY<STRING>))))""".stripMargin))
        .as("piece"))
    // same freq-diamond as x99: materialized once (vocab-bounded)
    val freq = cand.groupBy(col("piece")).agg(sum(col("n_occ")).as("freq"))
      .localCheckpoint()
    val singles0 = freq.where(length(col("piece")) === 1)
    val multi0 = freq.where(length(col("piece")) >= 2)
      .orderBy(col("freq").desc, col("piece")).limit(UniTopPieces)
    // ONE driver sync for the seed vocabulary: alphabet and the multi
    // set are projections of the same collected rows (previously three
    // separate collect jobs over the checkpointed freq table)
    var vocab: Seq[(String, Long)] = singles0.unionByName(multi0)
      .orderBy(col("piece")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    // code-point length, matching SQL length() (not UTF-16 units)
    def cpLen(p: String): Int = p.codePointCount(0, p.length)
    val alphabet: Seq[String] =
      vocab.collect { case (p, _) if cpLen(p) == 1 => p }
    var multiSet: Set[String] =
      vocab.collect { case (p, _) if cpLen(p) >= 2 => p }.toSet
    def wts(v: Seq[(String, Long)]): Seq[(String, Long)] = {
      val total = s9l(v.map(_._2).sum)
      v.map { case (p, f) => p -> (s9l(f) - total) }
    }
    def cntFrame(vw: Seq[(String, Long)]): DataFrame =
      types
        .withColumn("seg",
          graft.functions.UnigramViterbi.viterbi(col("word"), vw))
        .select(explode(split(col("seg.pieces"), "[|]")).as("piece"),
          col("n_occ"))
        .groupBy(col("piece")).agg(sum(col("n_occ")).as("cnt"))
    for (_ <- 1 until rounds) {
      val cnt = cntFrame(wts(vocab)).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val singles = alphabet.map(c => c -> math.max(cnt.getOrElse(c, 0L), 1L))
      val elig = multiSet.toSeq
        .flatMap(p => cnt.get(p).filter(_ >= 1L).map(p -> _))
        .sortBy { case (p, c) => (-c, p) }
      val kept = elig.take(elig.size - elig.size / 4)
      multiSet = kept.map(_._1).toSet
      vocab = (singles ++ kept).sortBy(_._1)
    }
    // final round distributed: count, floor/prune, re-weight as a plan
    import spark.implicits._
    val cnts = cntFrame(wts(vocab))
    val singlesF = singles0.select(col("piece"))
      .join(cnts, Seq("piece"), "left")
      .select(col("piece"),
        greatest(coalesce(col("cnt"), lit(0L)), lit(1L)).as("freq"))
    val eligF = cnts
      .join(broadcast(multiSet.toSeq.sorted.toDF("piece")), Seq("piece"))
      .where(col("cnt") >= 1L)
      .select(col("piece"), col("cnt").as("freq"))
    val keptF = eligF
      .withColumn("rn",
        row_number().over(Window.orderBy(col("freq").desc, col("piece")))
          .cast("long"))
      .withColumn("m", count(lit(1)).over(Window.partitionBy()))
      .where(col("rn") <= col("m") - expr("m div 4"))
      .select(col("piece"), col("freq"))
    val vocabF = singlesF.unionByName(keptF)
    val totalF = vocabF.agg(sum(col("freq")).as("total"))
    def scaled9(c: String): String =
      s"CAST(CAST(round(ln(CAST($c AS DOUBLE)), 9) AS DECIMAL(20,9)) " +
        "* 1000000000 AS BIGINT)"
    vocabF.crossJoin(broadcast(totalF))
      .select(col("piece"), col("freq"),
        (expr(scaled9("freq")) - expr(scaled9("total"))).as("w_nano"))
      .orderBy(col("piece"))
  }

  /** EM rounds for x137 (K Viterbi DP chains in the oracle — keep
    * bounded). */
  private[ext] val UniEmRounds = 3

  /**
   * x142 — SUBWORD REGULARIZATION n-best segmentation (Kudo 2018 §4,
   * the paper's deployment trick): training-time tokenization samples
   * among each word's top-n segmentations under the TRAINED unigram
   * model rather than always applying the 1-best Viterbi path —
   * segmentation diversity is the regularizer. This entry materializes
   * the deterministic n-best LIST per word TYPE under the x137-trained
   * vocabulary (the sampled pick is a downstream md5-keyed choice, the
   * x36/x79 pattern — the list is the reusable artifact).
   *
   * Pipeline: [[unigramEm]] trains exactly as x137 (same rounds, same
   * vocabulary — the collected (piece, w_nano) table is the bounded
   * training-artifact sync); the n-best DP is one map-side pass of the
   * native [[graft.functions.UnigramNbest]] over the word-TYPE table
   * (corpus touched once; text never re-segmented per occurrence).
   * Order contract: (score_nano DESC, pieces ASC) — a total integer +
   * ASCII order both engines share; rank is the 1-based position.
   */
  def unigramNbest(spark: SparkSession, dir: String, nBest: Int = 3,
      rounds: Int = UniEmRounds): DataFrame = {
    val vocab = unigramEm(spark, dir, rounds)
      .select(col("piece"), col("w_nano"))
      .orderBy(col("piece"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val types = Tables.load(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("word"))
      .where(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("n_occ"))
    types
      .select(col("word"), col("n_occ"),
        posexplode(graft.functions.UnigramNbest.nbest(
          col("word"), vocab, nBest)))
      .select(col("word"), col("n_occ"),
        (col("pos") + 1).cast("int").as("rank"),
        col("col.pieces").as("pieces"),
        col("col.n_pieces").as("n_pieces"),
        col("col.score_nano").as("score_nano"))
      .orderBy(col("word"), col("rank"))
  }

  /** x142's oracle: the FULL x137 training replay ([[emCtes]]) and then
    * an n-best DP chain over the trained weights — like [[dpChainSql]]
    * but keeping the top `nBest` partials per (word, position) under
    * (score DESC, path ASC), the extension-invariant total order the
    * native expression pins. */
  private[ext] def unigramNbestOracle(nBest: Int = 3,
      rounds: Int = UniEmRounds): String = {
    val p = "nb"
    val wCte = s"w$rounds"
    val dps = (1 to UniMaxWord).map { j =>
      val legs = (1 to math.min(UniMaxPiece, j)).map { k =>
        s"""SELECT d.word, d.n_occ,
           |      d.score + w.w_nano AS score,
           |      CASE WHEN d.path = '' THEN w.piece
           |           ELSE d.path || '|' || w.piece END AS path
           |    FROM $p${j - k} d
           |    JOIN $wCte w ON w.piece = substr(d.word, ${j - k + 1}, $k)
           |    WHERE length(d.word) >= $j""".stripMargin
      }.mkString("\n    UNION ALL\n    ")
      s"""$p$j AS MATERIALIZED (
         |  SELECT word, n_occ, score, path FROM (
         |    SELECT *, row_number() OVER (PARTITION BY word
         |        ORDER BY score DESC, path) AS rn FROM (
         |    $legs))
         |  WHERE rn <= $nBest)""".stripMargin
    }.mkString(",\n")
    val finals = (1 to UniMaxWord).map(j =>
      s"SELECT word, n_occ, score, path FROM $p$j WHERE length(word) = $j")
      .mkString("\n  UNION ALL ")
    s"WITH ${emCtes(rounds)},\n" +
      s"""${p}0 AS (SELECT word, n_occ, CAST(0 AS BIGINT) AS score,
         |        '' AS path FROM types),
         |$dps,
         |fin AS (
         |  $finals)
         |SELECT word, n_occ, CAST(rank AS INT) AS rank, path AS pieces,
         |  CAST(length(path) - length(replace(path, '|', '')) + 1 AS INT)
         |    AS n_pieces,
         |  CAST(score AS BIGINT) AS score_nano
         |FROM (SELECT *, row_number() OVER (PARTITION BY word
         |        ORDER BY score DESC, path) AS rank FROM fin)
         |WHERE rank <= $nBest
         |ORDER BY word, rank""".stripMargin
  }

  /**
   * x145 — SAMPLED SEGMENTATION (Kudo 2018 §4's deployment trick, the
   * α-sampling HALF of subword regularization — x142 ships the n-best
   * list, this entry ships the training-time DRAW): each word
   * OCCURRENCE samples one segmentation from the word's n-best list
   * with P(seg_i) ∝ P(seg_i | word)^α, α = 1/5 — realized as a
   * deterministic Gumbel-argmax (the x36/x79 A-ES pattern):
   * `argmax_r (score_nano_r + 5·g_r)` ≡ `argmax_r (score_nano_r/5 +
   * g_r)`, i.e. sampling ∝ exp(score/5), with
   * `g = round9(−ln(−ln(u)))·1e9` and `u` the pinned md5-32 uniform of
   * `'useg:' || word || ':' || occ || ':' || rank` — fully
   * reproducible on any partitioning and replayable by the oracle
   * (`ln` agrees bit-for-bit across engines, the x22/x24/x36
   * precedent). All sort keys are int64: the ONLY tie surface is an
   * exact integer collision, broken toward the lower rank on both
   * engines.
   *
   * Scale shape: the n-best page is TYPE-bounded and materialized once
   * (two consumers — the draw and the segmentation join-back; the x73
   * pattern). The occurrence frame is token-scale but MAP-ONLY: each
   * occurrence's drawn rank is one in-row argmax over the ≤ nBest
   * struct list (no (word, occ) shuffle, no window — the per-type
   * n-best list rides along from the same row), and the only shuffle
   * is the (word, rank) draw-count aggregate, which partial-aggregates
   * map-side down to type-bounded traffic. Output: one row per DRAWN
   * (word, rank) with its draw count — type-bounded, the reusable
   * training artifact.
   */
  def unigramSample(spark: SparkSession, dir: String, nBest: Int = 3,
      rounds: Int = UniEmRounds): DataFrame = {
    val vocab = unigramEm(spark, dir, rounds)
      .select(col("piece"), col("w_nano"))
      .orderBy(col("piece"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val types = Tables.load(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("word"))
      .where(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("n_occ"))
    // type-bounded n-best page, materialized once (the x73 pattern):
    // consumed by the occurrence draw AND the segmentation join-back
    val nbl = types.select(col("word"), col("n_occ"),
        graft.functions.UnigramNbest.nbest(col("word"), vocab, nBest)
          .as("nb"))
      .localCheckpoint()
    val occ = nbl.select(col("word"), col("nb"),
      explode(expr("sequence(1L, n_occ)")).as("occ"))
    // drawn rank per occurrence: ONE fused native Gumbel-argmax over
    // the nb list ([[graft.functions.GumbelPick]] — bit-identical to
    // the interpreted array_max(transform(...md5...ln...)) chain it
    // replaces, which re-ran the HOF ladder per occurrence row).
    // coalesce(…, 0): the expression is never null in practice (the
    // n-best list is non-empty — the alphabet always segments), but a
    // NULLABLE join key makes the optimizer infer an isnotnull filter
    // below the aggregate and DUPLICATE the draw into it (PlanGuard
    // check 6 caught exactly that); the non-null coalesce folds the
    // inferred filter away.
    val drawn = occ.select(col("word"),
      coalesce(graft.functions.GumbelPick.pick(
          col("word"), col("occ"), col("nb"), 5L), lit(0))
        .cast("int").as("rank"))
    val counts = drawn.groupBy(col("word"), col("rank"))
      .agg(count(lit(1)).as("n_draws"))
    val page = nbl.select(col("word"), col("n_occ"), posexplode(col("nb")))
      .select(col("word"), col("n_occ"),
        (col("pos") + 1).cast("int").as("rank"),
        col("col.pieces").as("pieces"),
        col("col.n_pieces").as("n_pieces"),
        col("col.score_nano").as("score_nano"))
    page.join(counts, Seq("word", "rank"))
      .orderBy(col("word"), col("rank"))
  }

  /** x145's oracle: the WHOLE x142 n-best oracle nested as a subquery
    * (the x144 composition pattern), the occurrence fan-out via
    * generate_series, the identical md5-Gumbel key (SKILL's pinned
    * md5-hex→int fold = Spark's `conv(substring(md5(x),1,8),16,10)`),
    * the (key DESC, rank) argmax draw, and the (word, rank) draw-count
    * re-aggregation. */
  private[ext] def unigramSampleOracle(nBest: Int = 3,
      rounds: Int = UniEmRounds): String = {
    val gumbel =
      "CAST(CAST(round(-ln(-ln((list_reduce(list_transform(string_split(" +
        "substr(md5('useg:' || o.word || ':' || CAST(o.occ AS VARCHAR) " +
        "|| ':' || CAST(n.rank AS VARCHAR)), 1, 8), ''), " +
        "c -> instr('0123456789abcdef', c) - 1), (a, b) -> a * 16 + b) " +
        "+ 0.5) / 4294967296.0)), 9) AS DECIMAL(20,9)) " +
        "* 1000000000 AS BIGINT)"
    s"WITH nbr AS MATERIALIZED (SELECT * FROM (\n" +
      unigramNbestOracle(nBest, rounds).replace("\n", "\n  ") +
      s"""
         |) t),
         |occs AS (SELECT word, n_occ,
         |    unnest(generate_series(1, CAST(n_occ AS BIGINT))) AS occ
         |  FROM (SELECT DISTINCT word, n_occ FROM nbr)),
         |keys AS (SELECT o.word, o.occ, n.rank,
         |    n.score_nano + 5 * $gumbel AS key_nano
         |  FROM occs o JOIN nbr n USING (word)),
         |drawn AS (SELECT word, occ, rank FROM (
         |    SELECT *, row_number() OVER (PARTITION BY word, occ
         |        ORDER BY key_nano DESC, rank) AS rn FROM keys)
         |  WHERE rn = 1),
         |dc AS (SELECT word, rank, CAST(count(*) AS BIGINT) AS n_draws
         |       FROM drawn GROUP BY 1, 2)
         |SELECT n.word, n.n_occ, n.rank, n.pieces, n.n_pieces,
         |  n.score_nano, d.n_draws
         |FROM nbr n JOIN dc d USING (word, rank)
         |ORDER BY n.word, n.rank""".stripMargin
  }

  /**
   * x147 — TOKENIZER FERTILITY EVAL: pieces-per-word (fertility) and
   * chars-per-piece (compression) per LANGUAGE bucket over the
   * x137-trained unigram vocabulary — the standard multilingual
   * tokenizer health metric (a language whose fertility is 2× pays 2×
   * the sequence length for the same text; UniMax-style mixture tuning
   * consumes exactly this table). Language is x7's langid rule
   * (en-stopword vs data-jargon hits, `en_hits >= data_hits` — the
   * SAME lists, so the bucket assignment is pinned to the existing
   * entry); segmentation is the x137 final vocabulary applied by the
   * native Viterbi DP to the (lang, word) TYPE table.
   *
   * All outputs are EXACT INTEGERS (the x12/x65 recipe): occurrence /
   * char / piece totals per language, and the two ratios as
   * floor-divided micro-units (positive numerators — Spark `div` and
   * DuckDB `//` agree). Scale shape: corpus touched twice map-side
   * (once for the per-doc lang aggregate, once for the (lang, word)
   * types), the Viterbi DP runs on the type table only, and the final
   * aggregate is ≤ |langs| rows. Words longer than [[UniMaxWord]] are
   * out of the DP's contract on both engines (none exist in any
   * fixture — the x99 precedent) and excluded explicitly.
   */
  def tokenizerFertility(spark: SparkSession, dir: String,
      rounds: Int = UniEmRounds): DataFrame = {
    val vocab = unigramEm(spark, dir, rounds)
      .select(col("piece"), col("w_nano"))
      .orderBy(col("piece"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val toks = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
    val lang = toks.groupBy(col("doc_id")).agg(
        sum(when(col("word").isin(TextAnalysis.stopwords: _*), 1L)
          .otherwise(0L)).as("en_hits"),
        sum(when(col("word").isin(TextAnalysis.dataWords: _*), 1L)
          .otherwise(0L)).as("data_hits"))
      .select(col("doc_id"),
        when(col("en_hits") >= col("data_hits"), lit("en"))
          .otherwise(lit("data")).as("lang"))
    val lw = toks
      .where(length(col("word")) > 0 &&
        length(col("word")) <= UniMaxWord)
      .join(lang, "doc_id")
      .groupBy(col("lang"), col("word")).agg(count(lit(1)).as("n_occ"))
    val seg = lw.withColumn("n_pieces",
      graft.functions.UnigramViterbi.viterbi(col("word"), vocab)
        .getField("n_pieces").cast("long"))
    seg.groupBy(col("lang")).agg(
        sum(col("n_occ")).as("n_words"),
        sum(col("n_occ") * length(col("word"))).as("total_chars"),
        sum(col("n_occ") * col("n_pieces")).as("total_pieces"))
      .select(col("lang"), col("n_words"), col("total_chars"),
        col("total_pieces"),
        expr("total_pieces * 1000000L div n_words").as("fertility_micro"),
        expr("total_chars * 1000000L div total_pieces")
          .as("chars_per_piece_micro"))
      .orderBy(col("lang"))
  }

  /** x147's oracle: the x137 training replay, one Viterbi DP chain
    * under the trained weights for per-word piece counts, the x7 lang
    * rule per doc, and exact-integer re-aggregation per language. */
  private[ext] def fertilityOracle(rounds: Int = UniEmRounds): String =
    s"WITH ${emCtes(rounds)},\n${dpChainSql("fd", s"w$rounds")},\n" +
      s"""seg AS (SELECT word,
         |    CAST(length(path) - length(replace(path, '|', '')) + 1
         |         AS BIGINT) AS n_pieces
         |  FROM fin_fd),
         |toksf AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
         |          FROM documents),
         |lang AS (SELECT doc_id, CASE WHEN en_hits >= data_hits THEN 'en'
         |                             ELSE 'data' END AS lang
         |  FROM (SELECT doc_id,
         |          sum(CASE WHEN word IN ('the','a','of','and','to','in',
         |              'is') THEN 1 ELSE 0 END) AS en_hits,
         |          sum(CASE WHEN word IN ('spark','table','query','join',
         |              'batch','stream','vector','column') THEN 1 ELSE 0
         |              END) AS data_hits
         |        FROM toksf GROUP BY 1)),
         |lw AS (SELECT l.lang, t.word, count(*) AS n_occ
         |       FROM toksf t JOIN lang l USING (doc_id)
         |       WHERE t.word <> '' AND length(t.word) <= $UniMaxWord
         |       GROUP BY 1, 2)
         |SELECT w.lang, CAST(sum(w.n_occ) AS BIGINT) AS n_words,
         |  CAST(sum(w.n_occ * length(w.word)) AS BIGINT) AS total_chars,
         |  CAST(sum(w.n_occ * s.n_pieces) AS BIGINT) AS total_pieces,
         |  CAST(sum(w.n_occ * s.n_pieces) AS BIGINT) * 1000000
         |    // CAST(sum(w.n_occ) AS BIGINT) AS fertility_micro,
         |  CAST(sum(w.n_occ * length(w.word)) AS BIGINT) * 1000000
         |    // CAST(sum(w.n_occ * s.n_pieces) AS BIGINT)
         |    AS chars_per_piece_micro
         |FROM lw w JOIN seg s USING (word)
         |GROUP BY 1 ORDER BY 1""".stripMargin

  /** x137's oracle: [[baseVocabCtes]] then [[UniEmRounds]] generated
    * rounds — each a [[dpChainSql]] Viterbi chain under the previous
    * round's weights, the piece-count aggregate, the alphabet floor,
    * the (count DESC, piece) prune to m − m//4 multis, and the
    * re-weight — finishing with the final vocabulary. */
  private[ext] def unigramEmOracle(rounds: Int = UniEmRounds): String = {
    s"WITH ${emCtes(rounds)}\n" +
      s"""SELECT v.piece, CAST(v.freq AS BIGINT) AS freq, w.w_nano
         |FROM vocab$rounds v JOIN w$rounds w ON v.piece = w.piece
         |ORDER BY v.piece""".stripMargin
  }

  /** The x137 training replay as CTE text (shared by the x137 and x142
    * oracles): [[baseVocabCtes]] + `rounds` generated EM rounds, ending
    * with `vocab$rounds` / `w$rounds`. */
  private def emCtes(rounds: Int): String = {
    val roundCtes = (1 to rounds).map { r =>
      val dp = dpChainSql(s"r${r}dp", s"w${r - 1}")
      s"""$dp,
         |cnt$r AS MATERIALIZED (
         |  SELECT piece, CAST(sum(n_occ) AS BIGINT) AS cnt
         |  FROM (SELECT unnest(string_split(path, '|')) AS piece, n_occ
         |        FROM fin_r${r}dp)
         |  GROUP BY 1),
         |single$r AS (SELECT a.piece,
         |    greatest(COALESCE(c.cnt, 0), 1) AS freq
         |  FROM alpha a LEFT JOIN cnt$r c ON a.piece = c.piece),
         |mv$r AS MATERIALIZED (SELECT piece, freq FROM (
         |    SELECT piece, freq,
         |      row_number() OVER (ORDER BY freq DESC, piece) AS rn,
         |      count(*) OVER () AS m
         |    FROM (SELECT v.piece, c.cnt AS freq
         |          FROM mv${r - 1} v JOIN cnt$r c ON v.piece = c.piece
         |          WHERE c.cnt >= 1))
         |  WHERE rn <= m - m // 4),
         |vocab$r AS (SELECT piece, freq FROM single$r
         |  UNION ALL SELECT piece, freq FROM mv$r),
         |tot$r AS (SELECT CAST(sum(freq) AS BIGINT) AS total
         |          FROM vocab$r),
         |w$r AS MATERIALIZED (SELECT piece,
         |    ${s9Sql("freq")} - ${s9Sql("total")} AS w_nano
         |  FROM vocab$r, tot$r)""".stripMargin
    }.mkString(",\n")
    s"$baseVocabCtes,\n$roundCtes"
  }
}
