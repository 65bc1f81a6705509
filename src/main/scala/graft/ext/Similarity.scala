package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ingest.Tables

/**
 * Similarity search over the `embeddings` table (Array[Float] vectors).
 *
 * Two paths, mirroring how ANN is actually deployed:
 *  - [[knnBrute]]: exact brute-force cosine top-k — the correctness
 *    baseline. Query set × corpus via broadcast of the (small) query side,
 *    dot products inside whole-stage codegen (zip_with/aggregate fold —
 *    no UDF), distributed top-k via window row_number.
 *  - [[annIvf]]: IVF-style bucketed search — the 100 TB path. Vectors are
 *    assigned to their nearest centroid once (a broadcast join against the
 *    tiny centroid set); a query probes only its centroid's bucket, so the
 *    per-query cost drops from O(N) to O(N/C). Centroids here are a
 *    deterministic subset (vec_id < C) standing in for k-means output —
 *    the plumbing (assignment, bucketing, probe-time pruning) is the real
 *    thing.
 */
object Similarity {

  /** Cosine similarity of two float-array columns: the native codegen'd
    * [[graft.functions.CosineSimilarity]] expression — one fused loop per
    * row, no lambda dispatch, no intermediate arrays. Accumulates in
    * doubles in array order (bit-matches DuckDB's list_cosine_similarity
    * on DOUBLE[], verified by the oracle). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimilarity.cosine(a, b)

  /** Exact top-k neighbors for the query vectors (vec_id < nQueries). */
  def knnBrute(spark: SparkSession, dir: String,
      nQueries: Int = 10, k: Int = 5): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val queries = emb.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"))
    val cands = emb.select(col("vec_id").as("cand_id"),
      col("embedding").as("c"))
    val scored = cands.crossJoin(broadcast(queries))
      .where(col("cand_id") =!= col("query_id"))
      .withColumn("sim", round(cosine(col("q"), col("c")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("cand_id"))
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("query_id"), col("cand_id"), col("sim"), col("rn"))
      .orderBy(col("query_id"), col("rn"))
  }

  /**
   * Embedding-cosine near-duplicate pairs: all pairs with cosine ≥ τ.
   * Exact all-pairs at fixture scale (the correctness baseline); the
   * 100 TB path reuses [[annIvf]]'s bucket assignment so only same-bucket
   * pairs are compared — same output when τ exceeds the bucket radius.
   */
  def embedNearDupPairs(spark: SparkSession, dir: String,
      threshold: Double = 0.45): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val a = emb.select(col("vec_id").as("d1"), col("embedding").as("e1"))
    val b = emb.select(col("vec_id").as("d2"), col("embedding").as("e2"))
    a.crossJoin(b).where(col("d1") < col("d2"))
      .withColumn("sim", round(cosine(col("e1"), col("e2")), 6))
      .where(col("sim") >= threshold)
      .select(col("d1"), col("d2"), col("sim"))
      .orderBy(col("d1"), col("d2"))
  }

  /** IVF-bucketed ANN: assign all vectors to nearest centroid (vec_id <
    * nCentroids), probe only the query's bucket. */
  def annIvf(spark: SparkSession, dir: String,
      nCentroids: Int = 8, nQueries: Int = 10, k: Int = 3): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val centroids = emb.where(col("vec_id") < nCentroids)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cent"))

    // nearest-centroid assignment: broadcast the tiny centroid set,
    // argmax cosine with deterministic tiebreak on centroid_id
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("csim").desc, col("centroid_id"))
    val assigned = emb.crossJoin(broadcast(centroids))
      .withColumn("csim", round(cosine(col("embedding"), col("cent")), 6))
      .withColumn("arn", row_number().over(wAssign))
      .where(col("arn") === 1)
      .select(col("vec_id"), col("embedding"), col("centroid_id").as("bucket"))

    val queries = assigned.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"),
        col("bucket"))
    // probe ONLY the query's bucket — this equi-join on bucket is the
    // pruning step that makes the search sublinear per query
    val scored = assigned
      .select(col("vec_id").as("cand_id"), col("embedding").as("c"),
        col("bucket"))
      .join(broadcast(queries), "bucket")
      .where(col("cand_id") =!= col("query_id"))
      .withColumn("sim", round(cosine(col("q"), col("c")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("cand_id"))
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("query_id"), col("bucket"), col("cand_id"), col("sim"),
        col("rn"))
      .orderBy(col("query_id"), col("rn"))
  }
}
