package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ingest.Tables

/**
 * x60 — the COMPOSED curation pipeline: the end-to-end corpus build a
 * training-data team actually ships, as ONE Catalyst plan. Six proven
 * standalone operators chained with nothing materialized between stages:
 *
 *  1. normalize      — x58's casefold/whitespace cleanup (planted mess);
 *  2. near-dup prune — x3's MinHash+LSH pairs ([[Dedup.minhashPairsOf]]),
 *                      greedy survivor rule: every pair's LARGER id drops
 *                      (each cluster's minimum id can never drop, so at
 *                      least one representative always survives);
 *  3. decontaminate  — x47's sliding-span excision
 *                      ([[TextAnalysis.decontaminateOf]]) of the held-out
 *                      `src9` slice from the surviving training docs;
 *  4. chunk          — x51's token-window split (window 32 / stride 24)
 *                      of the cleaned text;
 *  5. pack           — x55's concat-packing running-sum, applied at CHUNK
 *                      granularity (chunk_uid = doc_id·1000 + chunk_id):
 *                      each chunk lands at a (context_id, offset) in the
 *                      fixed-capacity context stream of its md5 shard;
 *  6. shuffle        — x52's epoch-aware deterministic reorder of the
 *                      packed chunk stream (2 epochs × 8 batches).
 *
 * Output: one training-roster row per (epoch, chunk) — where the chunk
 * sits in the shuffled batch order (epoch, batch_id, pos) and in the
 * packed context stream (shard, context_id, offset_in_context).
 *
 * Scale shape (the point of composing in one plan): stages 1 and 4 are
 * map-only and fuse into the adjacent scans; stage 2 is the LSH band
 * self-join sized by candidate pairs (never all-pairs) plus one left-anti
 * join back; stage 3's test spans are BROADCAST and only matched spans
 * shuffle; stages 5 and 6 are two slim windows over (shard) and
 * (epoch, batch) whose inputs are a few fixed-width columns per chunk.
 * At 100 TB nothing is written between stages and the corpus text
 * crosses a shuffle only where semantics force it (the dedup candidate
 * join and the per-doc covered-position aggregation); the chunk/pack/
 * shuffle tail moves only ids and counts. Every stage reuses the exact
 * column formulas its standalone oracle already pins (x58/x3/x47/x51/
 * x55/x52), so the composed DuckDB oracle is those CTEs chained.
 *
 * Reference scope: FrederikS/kafana has no curation pipeline; this is
 * the training-data extension family (SURVEY.md §2.4) composed.
 */
object CurationPipeline {

  def curate(spark: SparkSession, dir: String,
      testSource: String = "src9", nSpan: Int = 8,
      window: Int = 32, stride: Int = 24,
      nShards: Int = 8, capacity: Int = 2048,
      nEpochs: Int = 2, nBatches: Int = 8): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")

    // 1 — normalize (x58's planted mess + cleanup, verbatim)
    val messy = when(col("doc_id") % 3 === 0,
      upper(regexp_replace(col("text"), " ", "  "))).otherwise(col("text"))
    val wrapped = when(col("doc_id") % 4 === 0,
      concat(lit("\t"), messy, lit("   "))).otherwise(messy)
    val normalized = docs
      .select(col("doc_id"), col("source"), wrapped.as("raw"))
      .select(col("doc_id"), col("source"),
        trim(regexp_replace(lower(col("raw")), "\\s+", " ")).as("text"))

    // 2 — near-dup pruning: drop every pair's larger id
    val dupIds = Dedup
      .minhashPairsOf(normalized.select(col("doc_id"), col("text")),
        numHashes = 12, rowsPerBand = 3)
      .select(col("d2").as("doc_id")).distinct()
    val survivors = normalized.join(dupIds, Seq("doc_id"), "left_anti")

    // 3 — span decontamination of survivors vs the held-out slice
    val toks = split(col("text"), " ")
    val cleaned = TextAnalysis.decontaminateOf(
      survivors.where(col("source") =!= testSource)
        .select(col("doc_id"), toks.as("toks")),
      normalized.where(col("source") === testSource)
        .select(col("doc_id"), toks.as("toks")),
      nSpan)

    // 4 — token-window chunking (x51 formulas) of the cleaned text
    val chunks = cleaned
      .select(col("doc_id"), split(col("cleaned_text"), " ").as("toks"))
      .withColumn("n", size(col("toks")))
      .withColumn("chunk_id",
        explode(sequence(lit(0), floor((col("n") - 1) / stride).cast("int"))))
      .withColumn("start", col("chunk_id") * stride)
      .select(col("doc_id"), col("chunk_id"),
        least(lit(window), col("n") - col("start")).cast("long")
          .as("n_tokens"),
        array_join(slice(col("toks"), col("start") + 1, lit(window)), " ")
          .as("chunk_text"))

    // 5 — concat-pack the chunk stream (x55 formulas, chunk granularity)
    val chunkUid = col("doc_id") * 1000 + col("chunk_id")
    val wPack = Window.partitionBy(col("shard")).orderBy(col("chunk_uid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val packed = chunks
      .select(chunkUid.as("chunk_uid"), col("doc_id"), col("chunk_id"),
        col("n_tokens"),
        TextAnalysis.estTokensOf(col("chunk_text")).as("est_tokens"),
        TextAnalysis.mdShardOf(chunkUid, nShards).as("shard"))
      .withColumn("cum_before",
        coalesce(sum(col("est_tokens")).over(wPack), lit(0L)))
      .withColumn("context_id", expr(s"cum_before div $capacity"))
      .withColumn("offset_in_context", col("cum_before") % capacity)

    // 6 — epoch shuffle (x52 formulas) keyed by chunk_uid, pass-through
    val orderKey = md5(concat(col("chunk_uid").cast("string"), lit(":"),
      col("epoch").cast("string")).cast("binary"))
    val wPos = Window.partitionBy(col("epoch"), col("batch_id"))
      .orderBy(col("order_key"), col("chunk_uid"))
    packed
      .withColumn("epoch", explode(sequence(lit(0), lit(nEpochs - 1))))
      .withColumn("order_key", orderKey)
      .withColumn("batch_id",
        pmod(conv(substring(col("order_key"), 1, 2), 16, 10).cast("int"),
          lit(nBatches)))
      .withColumn("pos", row_number().over(wPos))
      .select(col("epoch"), col("batch_id"), col("pos"), col("chunk_uid"),
        col("doc_id"), col("chunk_id"), col("n_tokens"), col("est_tokens"),
        col("shard"), col("context_id"), col("offset_in_context"))
      .orderBy(col("epoch"), col("batch_id"), col("pos"))
  }
}
