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
    val queries = emb.where(col("vec_id") < nQueries).limit(nQueries)
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
   * x50 — HARD-NEGATIVE MINING for contrastive training: for each query
   * vector, the top-k most-similar vectors with a DIFFERENT label — the
   * near-misses that make the best negatives (in-batch random negatives
   * are mostly trivially far; training signal comes from the hard ones).
   * Same broadcast-queries × corpus scan as [[knnBrute]] with the label
   * inequality fused into the scan filter BEFORE any scoring ranks — no
   * extra shuffle over kNN, and the per-query state is still one k-row
   * heap inside the window top-k. At 100 TB the corpus side swaps to the
   * IVF bucket probe ([[annIvf]]) unchanged: the label filter composes
   * with bucket pruning because it touches only candidate rows.
   */
  def hardNegatives(spark: SparkSession, dir: String,
      nQueries: Int = 10, k: Int = 5): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val queries = emb.where(col("vec_id") < nQueries).limit(nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"),
        col("label").as("q_label"))
    val cands = emb.select(col("vec_id").as("cand_id"),
      col("embedding").as("c"), col("label").as("c_label"))
    val scored = cands.crossJoin(broadcast(queries))
      .where(col("c_label") =!= col("q_label"))
      .withColumn("sim", round(cosine(col("q"), col("c")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("cand_id"))
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("query_id"), col("q_label"), col("cand_id"),
        col("c_label"), col("sim"), col("rn"))
      .orderBy(col("query_id"), col("rn"))
  }

  /**
   * Embedding-cosine near-duplicate pairs, EXACT: all pairs with
   * cosine ≥ τ. The candidate generation is a block-partitioned equi-join,
   * not a `crossJoin`: each vector gets a block id (`vec_id % B`), the
   * B×B block-pair list (a 256-row literal — broadcast) fans the left side
   * out to its B partner blocks, and the pairing itself is a shuffled
   * equi-join on the partner block id. Same output as the naive cross
   * join (every unordered pair meets in exactly one (b1,b2) cell), but the
   * physical plan is Exchange(hash on block) + shuffled join — the N²
   * comparison work is tiled into B² independent key groups that spread
   * across executors, with per-task memory bounded by 2·N/B vectors
   * instead of a nested-loop over the whole corpus. This is the canonical
   * blocked layout for EXACT all-pairs similarity; τ this low (0.45) on
   * near-orthogonal random embeddings admits no exact pruning (every
   * bucketing scheme has qualifying pairs straddling buckets). For the
   * sublinear approximate path used at 100 TB — where near-dups sit at
   * cosine ≥ 0.9 and LSH collision gaps are real — see
   * [[signLshNearDupPairs]].
   */
  def embedNearDupPairs(spark: SparkSession, dir: String,
      threshold: Double = 0.45, blocks: Int = 16): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    import spark.implicits._
    val blockPairs = (for { i <- 0 until blocks; j <- 0 until blocks }
      yield (i, j)).toDF("b1", "b2")
    val a = emb.select(col("vec_id").as("d1"), col("embedding").as("e1"),
      pmod(col("vec_id"), lit(blocks)).cast("int").as("b1"))
    val b = emb.select(col("vec_id").as("d2"), col("embedding").as("e2"),
      pmod(col("vec_id"), lit(blocks)).cast("int").as("b2"))
    a.join(broadcast(blockPairs), "b1")
      .join(b, "b2")
      .where(col("d1") < col("d2"))
      .withColumn("sim", round(cosine(col("e1"), col("e2")), 6))
      .where(col("sim") >= threshold)
      .select(col("d1"), col("d2"), col("sim"))
      .orderBy(col("d1"), col("d2"))
  }

  /**
   * Sign-random-projection LSH near-duplicate pairs — the sublinear
   * 100 TB path (Charikar STOC'02 simhash for cosine; the standard
   * random-hyperplane LSH). Every vector gets a `nBands·bandBits`-bit
   * signature (bit i = sign of the dot product with a deterministic
   * md5-derived ±1 hyperplane — [[graft.functions.SignProjection]]), the
   * signature is banded, and ONLY pairs colliding on a full band are ever
   * compared — an equi-join on (band, band value), the same shape as
   * [[Dedup.minhashLshPairs]]. Candidates are verified with the exact
   * cosine.
   *
   * The operator's contract is the LSH-candidate semantics itself (the
   * DuckDB oracle implements the identical hyperplanes, fold order and
   * banding, so both engines produce the same pairs): with 8 bands × 8
   * bits, a random near-orthogonal pair collides somewhere with p ≈ 3%
   * (the pruning) while a true near-dup at cosine 0.95 collides with
   * p ≈ 99.9% (the recall) — at the fixture's deliberately low τ = 0.45
   * the candidate set exercises the full verify path. Per-vector cost is
   * one signature (64 dot products) + one shuffle on band keys:
   * linear, not quadratic.
   */
  def signLshNearDupPairs(spark: SparkSession, dir: String,
      threshold: Double = 0.45, nBands: Int = 8, bandBits: Int = 8): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    // banded rows carry ONLY (vec_id, band, band_val) — 3 small ints per
    // row through the candidate shuffle instead of the full embedding ×
    // nBands; the deduped (d1, d2) candidates then join BACK to the
    // vector table for the exact verify (the same layout x2 uses for its
    // full shingle sets)
    val bands = emb.select(col("vec_id"),
        posexplode(graft.functions.SignProjection.bands(
          col("embedding"), nBands, bandBits)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_val")
    val l = bands.as("l"); val r = bands.as("r")
    val candidates = l.join(r,
        col("l.band") === col("r.band") &&
          col("l.band_val") === col("r.band_val") &&
          col("l.vec_id") < col("r.vec_id"))
      .select(col("l.vec_id").as("d1"), col("r.vec_id").as("d2"))
      .distinct()
    val e1 = emb.select(col("vec_id").as("d1"), col("embedding").as("e1"))
    val e2 = emb.select(col("vec_id").as("d2"), col("embedding").as("e2"))
    candidates.join(e1, "d1").join(e2, "d2")
      .withColumn("sim", round(cosine(col("e1"), col("e2")), 6))
      .where(col("sim") >= threshold)
      .select(col("d1"), col("d2"), col("sim"))
      .orderBy(col("d1"), col("d2"))
  }

  /**
   * K-means centroids by Lloyd iterations, DataFrame-native and
   * cross-engine deterministic (the DuckDB oracle reproduces every
   * centroid bit-for-bit):
   *  - seeds: the embeddings of `vec_id < k` (deterministic init);
   *  - assignment: per-row argmax over the centroid matrix via the
   *    zero-shuffle [[graft.functions.NearestCentroid]] expression;
   *  - update: element-wise mean computed as an EXACT DECIMAL(38,15) sum
   *    divided by the count, with the sum cast to double before the
   *    divide — decimal addition is order-independent, so the centroids
   *    don't drift with partitioning / merge order the way a double sum
   *    would (cross-engine hash-match requires this);
   *  - empty clusters keep their previous centroid.
   * Only the k×dim means cross the driver between iterations (the same
   * sync pattern as Spark ML's own KMeans); each iteration is one
   * map-only assignment pass + one bucket-keyed aggregation carrying a
   * decimal-sum column per dimension (row-count-preserving — no
   * posexplode row expansion ahead of the partial aggregate).
   */
  private[graft] def kmeansCentroids(emb: DataFrame, k: Int,
      iterations: Int): Seq[Seq[Double]] = {
    var centroids: Seq[Seq[Double]] = emb.where(col("vec_id") < k)
      .orderBy(col("vec_id")).select(col("embedding"))
      .collect().map(_.getSeq[Float](0).map(_.toDouble).toSeq).toSeq
    val dim = centroids.headOption.map(_.length).getOrElse(0)
    for (_ <- 0 until iterations) {
      val bucket = graft.functions.NearestCentroid
        .nearest(col("embedding"), centroids).getField("bucket")
      // one per-dim decimal-sum column per dimension, grouped by bucket
      // alone: the same exact DECIMAL(38,15) per-(bucket, dim) sums and
      // the same double division as the previous posexplode +
      // groupBy(bucket, pos) form (probed bit-equal), WITHOUT the 64×
      // row expansion feeding the partial aggregate
      val sums = (0 until dim).map(i =>
        sum(col("embedding").getItem(i).cast("double")
          .cast("decimal(38,15)")).as(s"s$i"))
      // contract guard: the per-dim getItem(i)/count(*) division is only
      // the per-(bucket, dim) mean while every embedding is exactly
      // `dim` wide — sum() skipping a short row's null would otherwise
      // skew means SILENTLY. One cheap long column on the existing agg.
      val badCol = sum(when(size(col("embedding")) =!= dim, 1L)
        .otherwise(0L)).as("n_bad")
      val stats = emb.select(bucket.as("bucket"), col("embedding"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("c"), sums :+ badCol: _*)
        .select(Seq(col("bucket"), col("n_bad")) ++ (0 until dim).map(i =>
          (col(s"s$i").cast("double") / col("c")).as(s"m$i")): _*)
        .collect()
      val nBad = stats.map(_.getLong(1)).sum
      if (nBad > 0) throw new IllegalArgumentException(
        s"kmeansCentroids: $nBad embeddings are not exactly $dim-wide")
      val means = stats.map(r =>
        r.getInt(0) -> (0 until dim).map(i => r.getDouble(2 + i))).toMap
      centroids = centroids.indices.map(b => means.getOrElse(b, centroids(b)))
    }
    centroids
  }

  /**
   * Multi-probe IVF ANN — the recall knob production IVF deployments
   * tune: each query probes its `nProbe` NEAREST buckets instead of one,
   * trading `nProbe×` per-query candidate cost for recall (misses happen
   * when a true neighbor sits just across a Voronoi boundary; probing the
   * runner-up buckets recovers it). The corpus side is untouched — same
   * zero-shuffle argmax assignment as [[annIvf]]; only the tiny query
   * frame ranks all centroids ([[graft.functions.NearestCentroid.sims]])
   * and fans out to `nProbe` rows, so the extra work is
   * O(queries × nProbe), not corpus-sized. A (query, candidate) pair can
   * arise from at most one probe (each candidate lives in exactly one
   * bucket), so no dedup step is needed.
   */
  def annMultiProbe(spark: SparkSession, dir: String,
      nCentroids: Int = 8, nQueries: Int = 10, k: Int = 3,
      nProbe: Int = 2, iterations: Int = 2): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val centroids = kmeansCentroids(emb, nCentroids, iterations)
    val nc = graft.functions.NearestCentroid.nearest(col("embedding"), centroids)
    val assigned = emb.select(col("vec_id"), col("embedding"),
      nc.getField("bucket").cast("long").as("bucket"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("csim").desc, col("centroid_id"))
    val probes = emb.where(col("vec_id") < nQueries).limit(nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"),
        posexplode(graft.functions.NearestCentroid.sims(
          col("embedding"), centroids)))
      .withColumnRenamed("pos", "centroid_id")
      .withColumnRenamed("col", "csim")
      .withColumn("prn", row_number().over(wProbe))
      .where(col("prn") <= nProbe)
      .select(col("query_id"), col("q"),
        col("centroid_id").cast("long").as("bucket"))
    val scored = assigned
      .select(col("vec_id").as("cand_id"), col("embedding").as("c"),
        col("bucket"))
      .join(broadcast(probes), "bucket")
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
   * x71 — SEMANTIC DEDUPLICATION (SemDeDup, Abbas et al. 2023): the
   * cluster-scoped embedding dedup that makes semantic pruning tractable
   * at corpus scale. Where x13/x20 find near-dup PAIRS globally, SemDeDup
   * k-means-clusters the embedding space first and compares ONLY within
   * clusters — O(Σ|cluster|²) instead of O(N²), and each cluster's
   * pairwise block is an independent task (at 100 TB: cap cluster sizes
   * via more centroids; the shuffle key is the cluster id).
   *
   * Keep rule (the paper's): within a τ-similar group, keep the example
   * FARTHEST from its centroid (low centroid-sim = the informative
   * outlier; the prototypical redundant copies drop). Declaratively: a
   * vector is pruned iff some same-cluster τ-neighbor precedes it in
   * (centroid_sim ASC, vec_id ASC) order — the standard one-pass
   * dominance approximation of the paper's greedy sweep (a dominated
   * item drops even if its dominator also dropped; same guarantee
   * direction — never keeps two τ-neighbors where the greedy would keep
   * one — and no sequential dependency).
   *
   * All comparisons use round(cos, 6) (the x6 idiom) with vec_id
   * tiebreaks, so the order is total and the DuckDB oracle replays the
   * identical k-means (shared kmeansCtes), assignment, and dominance
   * predicate bit-for-bit.
   */
  def semDedup(spark: SparkSession, dir: String, nCentroids: Int = 8,
      iterations: Int = 2, threshold: Double = 0.35): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val centroids = kmeansCentroids(emb, nCentroids, iterations)
    val nc = graft.functions.NearestCentroid.nearest(col("embedding"),
      centroids)
    val asg = emb.select(col("vec_id"), col("embedding"),
      nc.getField("bucket").cast("long").as("bucket"),
      nc.getField("csim").as("csim"))
    val l = asg.select(col("bucket"), col("vec_id"), col("embedding"),
      col("csim"))
    val r = asg.select(col("bucket").as("o_bucket"),
      col("vec_id").as("o_id"), col("embedding").as("o_emb"),
      col("csim").as("o_csim"))
    val neighbors = l.join(r,
        col("bucket") === col("o_bucket") && col("vec_id") =!= col("o_id"))
      .where(round(cosine(col("embedding"), col("o_emb")), 6)
        >= threshold)
      .groupBy(col("vec_id"))
      .agg(count(lit(1)).as("n_dups"),
        max(when(col("o_csim") < col("csim") ||
          (col("o_csim") === col("csim") && col("o_id") < col("vec_id")),
          1L).otherwise(0L)).as("dominated"))
    asg.join(neighbors, Seq("vec_id"), "left")
      .select(col("vec_id"), col("bucket"), col("csim"),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"),
        (coalesce(col("dominated"), lit(0L)) === 0L).as("kept"))
      .orderBy(col("vec_id"))
  }

  /**
   * x95 — PAGERANK over the cluster-scoped kNN similarity graph: the
   * link-analysis quality signal (Page et al. 1999) a web-curation
   * pipeline computes over crawl graphs, here over the data-driven
   * graph the embedding space induces (each vector links to its k = 4
   * most-similar same-cluster neighbors — x71's cluster scoping keeps
   * edge construction subquadratic; a centrality-ranked corpus view).
   *
   * Determinism: the whole iteration is EXACT INTEGER nano-units.
   * pr_0 = 1e9 per node; each round every node with out-edges sends
   * `pr div outdeg` along each edge (floor division, positive — DuckDB
   * `//` agrees) and every node restarts from the damped base:
   * pr' = 0.15e9 + (85 * inbox) div 100. Mass lost to floor remainders
   * and to dangling nodes (singleton clusters) is DROPPED — the
   * renormalization-free PageRank variant — which costs nothing for
   * RANKING and buys bit-exact cross-engine replay with zero doubles.
   *
   * Scale: the graph is built once (one within-cluster pair join + one
   * bounded top-k window) and each round is ONE edge-keyed join + ONE
   * dst-keyed aggregation — O(E) per round, the x21/x26 connected-
   * components iteration shape, with `localCheckpoint` cutting lineage
   * per round so the 6-round plan never re-derives the graph.
   */
  /** x95's graph: each vector's k most-similar SAME-CLUSTER neighbors
    * (round(cos, 6) DESC, id ASC), as (src, dst) edges plus the node
    * table — shared by the entry and its spec's driver-side replay. */
  private[graft] def knnGraph(spark: SparkSession, dir: String,
      nCentroids: Int, iterations: Int, k: Int): (DataFrame, DataFrame) = {
    val emb = Tables.load(spark, dir, "embeddings")
    val centroids = kmeansCentroids(emb, nCentroids, iterations)
    val nc = graft.functions.NearestCentroid.nearest(col("embedding"),
      centroids)
    val asg = emb.select(col("vec_id"), col("embedding"),
      nc.getField("bucket").cast("long").as("bucket"))
    val other = asg.select(col("bucket").as("o_bucket"),
      col("vec_id").as("o_id"), col("embedding").as("o_emb"))
    val wk = Window.partitionBy(col("vec_id"))
      .orderBy(col("sim").desc, col("o_id"))
    val edges = asg.join(other,
        col("bucket") === col("o_bucket") && col("vec_id") =!= col("o_id"))
      .withColumn("sim", round(cosine(col("embedding"), col("o_emb")), 6))
      .withColumn("rn", row_number().over(wk))
      .where(col("rn") <= k)
      .select(col("vec_id").as("src"), col("o_id").as("dst"))
      .localCheckpoint()
    (edges, asg.select(col("vec_id"), col("bucket")).localCheckpoint())
  }

  def pageRank(spark: SparkSession, dir: String, nCentroids: Int = 8,
      iterations: Int = 2, k: Int = 4, rounds: Int = 6,
      topN: Int = 20): DataFrame = {
    val (edges, nodeTable) = knnGraph(spark, dir, nCentroids, iterations, k)
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val withDeg = edges.join(outdeg, "src").localCheckpoint()
    val nodes = nodeTable
    var pr = nodes.select(col("vec_id"), lit(1000000000L).as("pr"))
    for (_ <- 1 to rounds) {
      val inbox = withDeg
        .join(pr.withColumnRenamed("vec_id", "src"), "src")
        .select(col("dst"), expr("pr div outdeg").as("share"))
        .groupBy(col("dst")).agg(sum(col("share")).as("inbox"))
      pr = nodes.select(col("vec_id"))
        .join(inbox, col("vec_id") === col("dst"), "left")
        .select(col("vec_id"),
          (lit(150000000L) + expr("(85 * coalesce(inbox, 0L)) div 100"))
            .as("pr"))
        .localCheckpoint()
    }
    val indeg = edges.groupBy(col("dst")).agg(count(lit(1)).as("indeg"))
    val wr = Window.orderBy(col("pr_nano").desc, col("vec_id"))
    nodes
      .join(outdeg, nodes("vec_id") === outdeg("src"), "left")
      .join(indeg, nodes("vec_id") === indeg("dst"), "left")
      .join(pr.withColumnRenamed("pr", "pr_nano"), "vec_id")
      .select(col("vec_id"), col("bucket"),
        coalesce(col("outdeg"), lit(0L)).as("outdeg"),
        coalesce(col("indeg"), lit(0L)).as("indeg"), col("pr_nano"))
      .withColumn("rank", row_number().over(wr))
      .where(col("rank") <= topN)
      .select(col("rank"), col("vec_id"), col("bucket"), col("outdeg"),
        col("indeg"), col("pr_nano"))
      .orderBy(col("rank"))
  }

  /** The UNDIRECTED edge set of [[knnGraph]]: each directed kNN edge
    * canonicalized to (a = min, b = max) and deduplicated — shared by
    * the x104 triangle census and the x105 Adamic–Adar entries. Both
    * endpoints of every edge share a cluster by construction. */
  private def undirectedKnn(spark: SparkSession, dir: String,
      nCentroids: Int, iterations: Int, k: Int): (DataFrame, DataFrame) = {
    val (edges, nodes) = knnGraph(spark, dir, nCentroids, iterations, k)
    val und = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
      .localCheckpoint() // referenced 3x by the triangle join
    (und, nodes)
  }

  /**
   * x133 — LABEL-PROPAGATION COMMUNITIES (Raghavan et al. 2007) over
   * the cluster-scoped kNN similarity graph: the near-linear community
   * detector that complements the family's structural metrics (x21/x26
   * find connected components — the coarsest communities; x95 ranks
   * nodes; x104/x120 measure density). SYNCHRONOUS variant, made fully
   * deterministic: labels start as vec_id; each round every node adopts
   * the label MOST FREQUENT among its undirected neighbors, ties broken
   * toward the SMALLEST label (the canonical determinization — the
   * random tie-break of the paper trades stability for speed of
   * convergence, which an oracle-checked pipeline cannot accept);
   * isolated nodes keep their own label. A FIXED round count is the
   * contract (synchronous LPA can oscillate on bipartite-ish
   * structures, so "until stable" is not well-defined): 4 rounds, the
   * x95 iteration-shape precedent.
   *
   * Scale: each round is ONE adjacency join + ONE (node, label) count
   * aggregation + ONE bounded top-1 window — O(E) per round like
   * x21/x95, lineage cut per round with localCheckpoint. No per-node
   * adjacency materialization, no driver state (the label frame stays
   * distributed end to end).
   */
  def labelProp(spark: SparkSession, dir: String, nCentroids: Int = 8,
      iterations: Int = 2, k: Int = 4, rounds: Int = 4): DataFrame = {
    val (und, nodes) = undirectedKnn(spark, dir, nCentroids, iterations, k)
    val adj = und.select(col("a").as("u"), col("b").as("v"))
      .union(und.select(col("b").as("u"), col("a").as("v")))
      .localCheckpoint()
    var lab = nodes.select(col("vec_id"), col("vec_id").as("label"))
    for (_ <- 1 to rounds) {
      val wTop = Window.partitionBy(col("u"))
        .orderBy(col("c").desc, col("label"))
      val best = adj
        .join(lab.withColumnRenamed("vec_id", "v"), "v")
        .groupBy(col("u"), col("label")).agg(count(lit(1)).as("c"))
        .withColumn("rn", row_number().over(wTop))
        .where(col("rn") === 1)
        .select(col("u").as("vec_id"), col("label").as("new_label"))
      lab = lab.join(best, Seq("vec_id"), "left")
        .select(col("vec_id"),
          coalesce(col("new_label"), col("label")).as("label"))
        .localCheckpoint()
    }
    nodes.join(lab, "vec_id")
      .select(col("vec_id"), col("bucket"), col("label"))
      .orderBy(col("vec_id"))
  }

  /**
   * x104 — TRIANGLE CENSUS over the cluster-scoped kNN similarity
   * graph: per cluster, the node/edge counts, open-wedge count
   * (Σ deg·(deg−1)/2), triangle count, and the global clustering
   * coefficient 3·triangles/wedges in exact integer ppm. Triangles are
   * the classic graph-quality signal (how clique-like is each
   * neighborhood) and the standard benchmark for join-based graph
   * processing.
   *
   * Determinism: pure integer arithmetic end to end — counts, the
   * wedge sum, and a positive floor division for the ppm coefficient
   * (DuckDB `//` and Spark `div` agree on non-negative operands).
   *
   * Scale: the compute-optimal ordered node-iterator formulation — the
   * undirected edge list is canonicalized (a < b) so each triangle is
   * counted exactly once by joining e1(a,b) ⋈ e2(a,c>b) on the shared
   * LOW endpoint, then probing the (b,c) closure edge. All three legs
   * shuffle on an edge endpoint; the fanout of the wedge join is
   * Σ deg², bounded by k² per node (k = 4), so the plan is O(E·k) —
   * no per-node adjacency materialization, no driver state. The edge
   * list is localCheckpoint'd once (three consumers).
   */
  def triangleCensus(spark: SparkSession, dir: String, nCentroids: Int = 8,
      iterations: Int = 2, k: Int = 4): DataFrame = {
    val (und, nodes) = undirectedKnn(spark, dir, nCentroids, iterations, k)
    val buckets = nodes.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_nodes"))
    val aBucket = nodes.select(col("vec_id").as("a"), col("bucket"))
    val edgesB = und.join(aBucket, "a")
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_edges"))
    val deg = und.select(col("a").as("v"))
      .unionAll(und.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    val wedges = deg
      .join(nodes.withColumnRenamed("vec_id", "v"), "v")
      .groupBy(col("bucket"))
      .agg(sum(expr("deg * (deg - 1) div 2")).as("wedges"))
    val tri = und
      .join(und.select(col("a").as("a2"), col("b").as("c")),
        col("a") === col("a2") && col("c") > col("b"))
      .join(und.select(col("a").as("b3"), col("b").as("c3")),
        col("b") === col("b3") && col("c") === col("c3"))
      .join(aBucket, "a")
      .groupBy(col("bucket")).agg(count(lit(1)).as("triangles"))
    buckets
      .join(edgesB, Seq("bucket"), "left")
      .join(wedges, Seq("bucket"), "left")
      .join(tri, Seq("bucket"), "left")
      .select(col("bucket"), col("n_nodes"),
        coalesce(col("n_edges"), lit(0L)).as("n_edges"),
        coalesce(col("wedges"), lit(0L)).as("wedges"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      .withColumn("closure_ppm",
        when(col("wedges") > 0,
          expr("(3000000 * triangles) div wedges")).otherwise(lit(0L)))
      .orderBy(col("bucket"))
  }

  /**
   * x105 — ADAMIC–ADAR link prediction over the same graph: for every
   * same-cluster NON-adjacent pair with at least one common neighbor,
   * score AA(a,b) = Σ_z 1/ln(deg z) over common neighbors z — the
   * classic "which near-duplicate communities are about to merge" /
   * recommendation signal (Adamic & Adar 2003) — and keep the global
   * top 30.
   *
   * Determinism: ln is bit-identical across engines (x22/x24
   * precedent); each neighbor's contribution is frozen to integers as
   * 1e18 div ⌊ln(deg)·1e9⌋ — floor on a positive double, then positive
   * integer floor-division — so the SUM is exact BIGINT arithmetic in
   * any order. deg(z) ≥ 2 for any common neighbor, so the divisor is
   * ≥ ⌊ln 2·1e9⌋ > 0.
   *
   * Scale: candidate pairs are generated through the shared hub z
   * (adjacency exploded both directions, self-joined on z with a < b) —
   * Σ deg² fanout, k-bounded like x104 — then one hash aggregation on
   * (a,b) and a broadcast-able anti-join against the edge list drops
   * already-adjacent pairs. A global top-k window finishes; nothing is
   * quadratic in the corpus.
   */
  def adamicAdar(spark: SparkSession, dir: String, nCentroids: Int = 8,
      iterations: Int = 2, k: Int = 4, topN: Int = 30): DataFrame = {
    val (und, _) = undirectedKnn(spark, dir, nCentroids, iterations, k)
    val adj = und.select(col("a").as("v"), col("b").as("n"))
      .unionAll(und.select(col("b").as("v"), col("a").as("n")))
    val lnNano = adj.groupBy(col("v")).agg(count(lit(1)).as("deg"))
      .select(col("v"),
        floor(log(col("deg").cast("double")) * lit(1.0e9))
          .cast("long").as("ln_nano"))
    val cand = adj.select(col("v").as("z"), col("n").as("a"))
      .join(adj.select(col("v").as("z2"), col("n").as("b")),
        col("z") === col("z2") && col("b") > col("a"))
      .join(lnNano.withColumnRenamed("v", "z"), "z")
      .select(col("a"), col("b"),
        expr("cast(1000000000000000000 as bigint) div ln_nano")
          .as("contrib"))
    cand.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("cn"), sum(col("contrib")).as("aa_nano"))
      .join(und, Seq("a", "b"), "left_anti")
      .orderBy(col("aa_nano").desc, col("a"), col("b"))
      .limit(topN)
  }

  /**
   * x120 — K-CORE DECOMPOSITION (bounded peel) over the
   * similarity-THRESHOLD graph (edges = pairs with 6dp cosine ≥ τ, the
   * x13 near-dup graph — NOT the kNN graph, whose min-degree-k floor
   * makes every k-core trivially all-or-empty): iteratively remove
   * every node whose degree among SURVIVING nodes is below `coreK`;
   * what remains is the `coreK`-core — the standard density filter for
   * community structure and the graph-side analog of the quality
   * filters (a 3-core node has ≥ 3 neighbors that themselves survive:
   * genuinely dense similarity structure, not a chain or a pendant).
   * The peel is the x21/x26 iteration shape — each round ONE
   * endpoint-keyed semi-join pair + ONE degree aggregation, O(E) per
   * round, `localCheckpoint` lineage cuts, no driver state. The round
   * count is FIXED (part of the result contract, like x95's 6 pagerank
   * rounds) so the oracle replays identically; ExtSpec asserts the
   * peel has actually converged by then on the fixtures (probed: 10 /
   * 8 / 0 rounds at the three SFs). At 100 TB each round's joins
   * shuffle only the (shrinking) alive set, and the peel converges in
   * O(log n)-ish rounds on real graphs.
   */
  def kCore(spark: SparkSession, dir: String, threshold: Double = 0.30,
      coreK: Int = 3, rounds: Int = 12): DataFrame = {
    val und = embedNearDupPairs(spark, dir, threshold)
      .select(col("d1").as("a"), col("d2").as("b"))
    val both = und.select(col("a").as("u"), col("b").as("v"))
      .unionByName(und.select(col("b").as("u"), col("a").as("v")))
      .localCheckpoint()
    def aliveDeg(alive: DataFrame): DataFrame = both
      .join(alive.select(col("vec_id").as("u")), "u")
      .join(alive.select(col("vec_id").as("v")), "v")
      .groupBy(col("u")).agg(count(lit(1)).as("deg"))
    var alive = both.select(col("u").as("vec_id")).distinct()
      .localCheckpoint()
    // early exit preserves the fixed-round contract exactly: the peel
    // only ever REMOVES nodes, so an unchanged count proves the
    // fixpoint — every remaining round would be a no-op (the oracle's
    // full 12 rounds produce the identical set). At sf0.1 the graph is
    // already its own 3-core and this saves 11 redundant join rounds.
    var prev = -1L
    var n = alive.count()
    var r = 0
    while (r < rounds && n != prev) {
      alive = aliveDeg(alive).where(col("deg") >= coreK)
        .select(col("u").as("vec_id")).localCheckpoint()
      prev = n
      n = alive.count()
      r += 1
    }
    aliveDeg(alive)
      .select(col("u").as("vec_id"), col("deg").as("core_deg"))
      .orderBy(col("vec_id"))
  }

  /**
   * x61 — "index once, query many" for ANN (the IVF counterpart of
   * [[graft.ext.Dedup.dedupIndexReuse]]): the expensive build — Lloyd
   * iterations (driver-synced k×dim centroids) plus the full-corpus
   * nearest-centroid assignment pass — runs ONCE and persists as two
   * tables: the (vec_id, embedding, bucket) assignment table, bucketed
   * (file-layout bucketed, by the IVF `bucket` key) via
   * [[graft.sink.BucketedTables]], and the small centroid matrix. At
   * query time NOTHING rescans `embeddings` or reruns k-means: queries
   * probe the STORED assignment table (their bucket is already in the
   * index; a brand-new out-of-corpus query would assign itself against
   * the stored centroid table — k×dim, a broadcast scalar). Identical
   * result contract to [[annIvf]] — the oracle is shared.
   */
  /** Builds + persists the IVF index (k-means centroids table + bucketed
    * assignment table); returns the assignment-table name. */
  private def buildAnnIndex(spark: SparkSession, dir: String,
      nCentroids: Int, iterations: Int): String = {
    val suffix = Dedup.indexSuffix(dir)
    val idxTable = s"graft_ivf_index_$suffix"
    val centTable = s"graft_ivf_centroids_$suffix"
    val tmp = sys.props("java.io.tmpdir")
    val emb = Tables.load(spark, dir, "embeddings")
    val centroids = kmeansCentroids(emb, nCentroids, iterations)
    val nc = graft.functions.NearestCentroid.nearest(col("embedding"), centroids)
    graft.sink.BucketedTables.writeBucketed(
      emb.select(col("vec_id"), col("embedding"),
        nc.getField("bucket").cast("long").as("bucket")),
      idxTable, "bucket", 8, path = Some(s"$tmp/graft_index/$idxTable"))
    import spark.implicits._
    centroids.zipWithIndex.map { case (c, i) => (i.toLong, c) }
      .toDF("centroid_id", "centroid")
      .write.mode("overwrite")
      .parquet(s"$tmp/graft_index/$centTable")
    idxTable
  }

  /** Query-time probe of the stored assignment table — no embeddings
    * scan, no k-means rerun. */
  private def probeAnnIndex(spark: SparkSession, idxTable: String,
      nQueries: Int, k: Int): DataFrame = {
    val assigned = spark.table(idxTable)
    val queries = assigned.where(col("vec_id") < nQueries).limit(nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"),
        col("bucket"))
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

  def annIndexReuse(spark: SparkSession, dir: String,
      nCentroids: Int = 8, nQueries: Int = 10, k: Int = 3,
      iterations: Int = 2): DataFrame =
    probeAnnIndex(spark,
      buildAnnIndex(spark, dir, nCentroids, iterations), nQueries, k)

  /**
   * x63 — the PROBE-ONLY side of x61: reuses the stored IVF index if
   * this session already built it (building once if not) — the
   * steady-state serving cost. Identical result contract to [[annIvf]]
   * and [[annIndexReuse]] — the oracle is shared; the BENCH delta
   * between x61 (k-means + write every run) and x63 (probe-only after
   * the first run) shows probe ≪ build.
   */
  def annIndexProbe(spark: SparkSession, dir: String,
      nCentroids: Int = 8, nQueries: Int = 10, k: Int = 3,
      iterations: Int = 2): DataFrame = {
    val idxTable = s"graft_ivf_index_${Dedup.indexSuffix(dir)}"
    if (!spark.catalog.tableExists(idxTable))
      buildAnnIndex(spark, dir, nCentroids, iterations)
    probeAnnIndex(spark, idxTable, nQueries, k)
  }

  /**
   * x68 — IVF SEGMENT-APPEND maintenance (the ANN counterpart of
   * [[graft.ext.Dedup.dedupIndexAppend]], x64): a NEW VECTOR BATCH
   * (every 5th embedding, ids +1e6) joins the index WITHOUT re-running
   * k-means — each new vector is assigned against the STORED centroid
   * table (a k×dim broadcast scalar; the one bounded collect this
   * module documents) and persisted as its OWN bucketed segment, the
   * ES/Lucene segment model. Query time: new out-of-corpus queries
   * (every 7th embedding, ids +2e6) likewise bucket-assign via the
   * stored centroids, then probe corpus + appended segments UNIONED,
   * with ONE global top-k window across segments (a per-segment top-k
   * would be wrong the moment a true neighbor lives in the new
   * segment). Queries whose source id is divisible by 35 must find
   * their verbatim +1e6 copy at sim 1.0 (spec-pinned). Centroid drift
   * under appends is the documented operational limit: production
   * re-clusters when segment skew degrades recall; the probe path is
   * unchanged by that rebuild.
   */
  def annIndexAppend(spark: SparkSession, dir: String,
      nCentroids: Int = 8, k: Int = 3, iterations: Int = 2): DataFrame = {
    val suffix = Dedup.indexSuffix(dir)
    val idxTable = s"graft_ivf_index_$suffix"
    if (!spark.catalog.tableExists(idxTable))
      buildAnnIndex(spark, dir, nCentroids, iterations)
    val tmp = sys.props("java.io.tmpdir")
    // stored centroids: k×dim, the bounded broadcast-scalar collect
    val stored = spark.read.parquet(s"$tmp/graft_index/graft_ivf_centroids_$suffix")
      .orderBy(col("centroid_id")).collect()
      .map(_.getSeq[Double](1).toSeq).toSeq
    def bucketOf(c: Column): Column = graft.functions.NearestCentroid
      .nearest(c, stored).getField("bucket").cast("long")
    val emb = Tables.load(spark, dir, "embeddings")
    val segTable = idxTable + "_seg1"
    graft.sink.BucketedTables.writeBucketed(
      emb.where(col("vec_id") % 5 === 0)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"),
          bucketOf(col("embedding")).as("bucket")),
      segTable, "bucket", 8, path = Some(s"$tmp/graft_index/$segTable"))
    val queries = emb.where(col("vec_id") % 7 === 0)
      .select((col("vec_id") + 2000000L).as("query_id"),
        col("embedding").as("q"), bucketOf(col("embedding")).as("bucket"))
    val assigned = spark.table(idxTable).unionByName(spark.table(segTable))
    val scored = assigned
      .select(col("vec_id").as("cand_id"), col("embedding").as("c"),
        col("bucket"))
      .join(broadcast(queries), "bucket")
      .withColumn("sim", round(cosine(col("q"), col("c")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("cand_id"))
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("query_id"), col("bucket"), col("cand_id"), col("sim"),
        col("rn"))
      .orderBy(col("query_id"), col("rn"))
  }

  /**
   * INT8 EMBEDDING QUANTIZATION — the storage/serving compression step of
   * an embedding pipeline (a float32 corpus shrinks 4× before ANN
   * serving). Symmetric per-vector max-abs scaling: `scale = max|x_i|`,
   * `q_i = round(x_i/scale·127)` clipped by construction to [-127, 127].
   * Emits the scale, quantized min/max/checksum and the exact L2
   * reconstruction error per vector.
   *
   * Map-only — zero shuffles except the final presentation sort. The
   * per-row folds are declarative higher-order functions here (64-dim
   * fixture vectors); the production path for wide vectors is a native
   * expression like [[graft.functions.CosineSimilarity]].
   *
   * Cross-engine determinism: elements are cast to double BEFORE any
   * arithmetic (DuckDB computes FLOAT[] lambdas in float32 otherwise);
   * rounding is `floor(v·127/scale + 0.5)` — pure IEEE double ops,
   * bit-identical in both engines, with no round-half library semantics
   * involved; the reconstruction error folds in array order (the
   * list_prepend/list_reduce trick on the DuckDB side); a zero vector is
   * guarded by substituting scale 1 (quantizes to all zeros either way).
   */
  def quantizeInt8(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val x = transform(col("embedding"), _.cast("double"))
    val withScale = emb.select(col("vec_id"), x.as("x"))
      .withColumn("scale", array_max(transform(col("x"), abs(_))))
      .withColumn("s_safe", when(col("scale") === 0d, lit(1d))
        .otherwise(col("scale")))
    val q = transform(col("x"),
      v => floor(v / col("s_safe") * lit(127d) + lit(0.5d)).cast("int"))
    val diffSq = zip_with(col("x"), col("q"), (xi, qi) => {
      val d = xi - qi.cast("double") * col("s_safe") / lit(127d)
      d * d
    })
    withScale.withColumn("q", q)
      .withColumn("recon_err",
        round(sqrt(aggregate(diffSq, lit(0d), (acc, v) => acc + v)), 6))
      .select(col("vec_id"), round(col("scale"), 6).as("scale"),
        array_min(col("q")).as("q_min"), array_max(col("q")).as("q_max"),
        aggregate(col("q"), lit(0L), (acc, v) => acc + v).as("q_sum"),
        col("recon_err"))
      .orderBy(col("vec_id"))
  }

  /**
   * x37 — per-label embedding COHESION: each label's centroid
   * (element-wise DECIMAL-exact mean, same cross-engine contract as the
   * k-means oracle) and every vector's cosine to its own label centroid.
   * This is the cluster-quality / embedding-drift report a curation
   * pipeline runs after labeling or clustering: low-cohesion vectors are
   * outliers/mislabels, and a label whose cohesion distribution sags
   * signals drift between ingestion batches.
   *
   * Scale shape: ONE posexplode aggregation keyed by (label, pos) —
   * cardinality labels×dim regardless of corpus size — then the tiny
   * centroid table broadcast-joins back for a map-only cosine pass. No
   * all-pairs anything; the corpus is read twice and shuffled once (by
   * label×pos, bounded). The cosine is the double fold in array order
   * (dot / sqrt(na) / sqrt(nb)) that bit-matches DuckDB's
   * `list_cosine_similarity` on DOUBLE[].
   */
  def embedCohesion(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), _.cast("double")).as("emb"))
    val cents = labelCentroids(e)
    val dot = aggregate(zip_with(col("emb"), col("centroid"),
      (x, y) => x * y), lit(0d), (acc, v) => acc + v)
    val na = aggregate(col("emb"), lit(0d), (acc, v) => acc + v * v)
    val nb = aggregate(col("centroid"), lit(0d), (acc, v) => acc + v * v)
    e.join(broadcast(cents), "label")
      .withColumn("cohesion", round(dot / sqrt(na) / sqrt(nb), 6))
      .select(col("vec_id"), col("label"), col("cohesion"))
      .orderBy(col("vec_id"))
  }

  /**
   * x112 — SEMANTIC PACKING (the in-context-pretraining recipe, Shi et
   * al. 2023: related documents placed in the SAME context window so
   * the model sees coherent long-range structure, instead of the
   * doc_id-order packing of x55): within each embedding cluster
   * (`label`), documents are ordered centroid-outward — by their
   * [[embedCohesion]] cosine to the cluster centroid, descending — and
   * greedily concatenated into fixed-capacity contexts with the exact
   * x55 boundary convention (`cum_before div capacity`, so a doc
   * straddling a boundary starts the carry into the next context).
   *
   * Cross-engine determinism: the ordering key is the 6dp-ROUNDED
   * cohesion (the x37-proven bit-identical value) with vec_id as the
   * tie-break, and every packing quantity is an exact integer.
   *
   * Scale shape: [[embedCohesion]]'s one bounded (label×pos) shuffle +
   * broadcast centroid join, one doc-table equi-join on the id, and ONE
   * per-label window pair — the cluster is the shard key, so packing
   * parallelizes across labels exactly like x55 across md5 shards; no
   * global sort, nothing quadratic.
   */
  /** Per-label element-wise DECIMAL-exact centroid means (the k-means
    * oracle contract): one posexplode aggregation keyed by (label, pos)
    * — cardinality labels×dim regardless of corpus size. Shared by
    * [[embedCohesion]]/[[semanticPack]] and [[silhouette]]. */
  private def labelCentroids(e: DataFrame): DataFrame = {
    val means = e.select(col("label"),
        posexplode(col("emb")).as(Seq("pos", "val")))
      .groupBy(col("label"), col("pos"))
      .agg((sum(col("val").cast("decimal(38,15)")).cast("double")
        / count(lit(1))).as("m"))
    means.groupBy(col("label"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("m")))),
        _.getField("m")).as("centroid"))
  }

  /**
   * x114 — centroid-based SILHOUETTE (the simplified silhouette of
   * Hartigan / the sklearn "silhouette via centroids" shortcut): per
   * vector, a = euclidean distance to its OWN label centroid, b = the
   * distance to the NEAREST OTHER centroid, s = (b−a)/max(a,b); per
   * label the report is n, the exact-integer micro-sum of the
   * 6dp-rounded s (signed — s < 0 flags vectors closer to a foreign
   * centroid, so no floor-division of a possibly-negative mean), and
   * the min/max s. This is the cluster-quality audit a curation
   * pipeline runs on its semdedup/IVF clustering (x71/x6): sagging
   * silhouette = drifting or over-merged clusters.
   *
   * Scale shape: the centroid table is labels×dim and BROADCAST; the
   * per-vector work is one map-only pass over k centroids (never a
   * vector-vector pair), and the rollup is a label-keyed aggregate —
   * the full-silhouette O(n²) pairwise form is exactly what this
   * re-expression avoids at 100 TB. Cross-engine: distances are the
   * same left-to-right double fold as the x37 cosine (the DuckDB
   * oracle folds with list_reduce in identical association order).
   */
  def silhouette(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), _.cast("double")).as("emb"))
    val cents = labelCentroids(e)
      .select(col("label").as("c_label"), col("centroid"))
    val dist = sqrt(aggregate(zip_with(col("emb"), col("centroid"),
      (x, y) => (x - y) * (x - y)), lit(0d), (acc, v) => acc + v))
    val ab = e.crossJoin(broadcast(cents))
      .withColumn("dist", dist)
      .groupBy(col("vec_id"), col("label"))
      .agg(min(when(col("c_label") === col("label"), col("dist"))).as("a"),
        min(when(col("c_label") =!= col("label"), col("dist"))).as("b"))
    ab.withColumn("sil",
        round((col("b") - col("a")) / greatest(col("a"), col("b")), 6))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        sum((col("sil").cast("decimal(10,6)") * 1000000).cast("long"))
          .as("sum_sil_micro"),
        min(col("sil")).as("min_sil"), max(col("sil")).as("max_sil"))
      .orderBy(col("label"))
  }

  /**
   * x113 — TRIPLET MINING for contrastive embedding training: for each
   * anchor of a query sample, the hardest POSITIVE (most-similar
   * same-label vector — [[knnBrute]]'s top-1 restricted to the label)
   * and the hardest NEGATIVE (most-similar different-label vector —
   * [[hardNegatives]]' top-1) from ONE broadcast-queries corpus scan:
   * the (anchor, positive, negative) rows with their margin are exactly
   * the batch a triplet-loss trainer consumes, and small margins mark
   * the pairs worth mining more of. The margin obeys the x101 rule:
   * each 6dp-rounded cosine is frozen to integer MICRO units and the
   * margin is their integer difference — never a re-rounded double.
   *
   * Scale shape: one corpus scan × broadcast sample (the x83
   * sample-sized-at-scale contract), both branches ranked by a single
   * (anchor, same-label?) window whose per-group state is one row; at
   * 100 TB the corpus side swaps to the IVF bucket probe unchanged.
   */
  def tripletMining(spark: SparkSession, dir: String,
      nQueries: Int = 50): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val queries = emb.where(col("vec_id") < nQueries).limit(nQueries)
      .select(col("vec_id").as("anchor_id"), col("embedding").as("q"),
        col("label").as("a_label"))
    val cands = emb.select(col("vec_id").as("cand_id"),
      col("embedding").as("c"), col("label").as("c_label"))
    val scored = cands.crossJoin(broadcast(queries))
      .where(col("cand_id") =!= col("anchor_id"))
      .withColumn("sim", round(cosine(col("q"), col("c")), 6))
      .withColumn("same", col("c_label") === col("a_label"))
    val w = Window.partitionBy(col("anchor_id"), col("same"))
      .orderBy(col("sim").desc, col("cand_id"))
    val top = scored.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
    val pos = top.where(col("same"))
      .select(col("anchor_id"), col("a_label"),
        col("cand_id").as("pos_id"), col("sim").as("pos_sim"))
    val neg = top.where(!col("same"))
      .select(col("anchor_id"), col("cand_id").as("neg_id"),
        col("c_label").as("neg_label"), col("sim").as("neg_sim"))
    pos.join(neg, "anchor_id")
      .withColumn("margin_micro",
        (col("pos_sim").cast("decimal(10,6)") * 1000000).cast("long")
          - (col("neg_sim").cast("decimal(10,6)") * 1000000).cast("long"))
      .select(col("anchor_id"), col("a_label"), col("pos_id"),
        col("pos_sim"), col("neg_id"), col("neg_label"), col("neg_sim"),
        col("margin_micro"))
      .orderBy(col("anchor_id"))
  }

  def semanticPack(spark: SparkSession, dir: String,
      capacity: Int = 512): DataFrame = {
    val coh = embedCohesion(spark, dir)
    val toks = Tables.load(spark, dir, "documents")
      .select(col("doc_id").as("vec_id"),
        TextAnalysis.estTokensOf(col("text")).as("est_tokens"))
    val w = Window.partitionBy(col("label"))
      .orderBy(col("cohesion").desc, col("vec_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    coh.join(toks, "vec_id")
      .withColumn("cum_before",
        coalesce(sum(col("est_tokens")).over(w), lit(0L)))
      .select(col("label"), expr(s"cum_before div $capacity")
          .as("context_id"),
        col("vec_id"), col("cohesion"), col("est_tokens"),
        (col("cum_before") % capacity).as("offset_in_context"))
      .orderBy(col("label"), col("context_id"), col("offset_in_context"))
  }

  /** IVF-bucketed ANN: k-means centroids ([[kmeansCentroids]], 2 Lloyd
    * iterations seeded from `vec_id < nCentroids`), zero-shuffle
    * per-row assignment, probe only the query's bucket. */
  def annIvf(spark: SparkSession, dir: String,
      nCentroids: Int = 8, nQueries: Int = 10, k: Int = 3,
      iterations: Int = 2): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val centroids = kmeansCentroids(emb, nCentroids, iterations)

    // nearest-centroid assignment: one map-only pass over the broadcast
    // centroid matrix — no crossJoin, no window sort, no shuffle
    val nc = graft.functions.NearestCentroid.nearest(col("embedding"), centroids)
    val assigned = emb.select(col("vec_id"), col("embedding"),
      nc.getField("bucket").cast("long").as("bucket"))

    val queries = assigned.where(col("vec_id") < nQueries).limit(nQueries)
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

  /**
   * x141 — FILTERED kNN (ES 8's `knn` query with a metadata `filter`,
   * PRE-FILTER semantics): the metadata predicate constrains the
   * candidate set BEFORE/within the bucket probe, so the search
   * returns the top-k of the vectors that SATISFY the filter —
   * post-filtering an unfiltered top-k instead loses recall whenever
   * fewer than k of the unfiltered winners match (ES docs call this
   * out explicitly; FilteredKnnSpec pins the recall gap on a planted
   * selective filter). Plan shape: the label predicate sits directly
   * on the candidate scan — it reaches the parquet reader as a pushed
   * data filter (pinned in the spec), so at 100 TB the probe reads
   * only pages that can match, THEN prunes to the query's bucket; the
   * per-query cost is O(selectivity × N/C). Everything else is
   * [[annIvf]] verbatim: shared k-means, zero-shuffle assignment,
   * broadcast query probe, windowed top-k. Like ES's pre-filtered HNSW,
   * a very selective filter can leave a bucket with < k matches — the
   * entry returns what exists (deterministic; the oracle replays it).
   */
  def filteredKnn(spark: SparkSession, dir: String,
      labels: Seq[Int] = Seq(2, 5), nCentroids: Int = 8,
      nQueries: Int = 10, k: Int = 3, iterations: Int = 2): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val centroids = kmeansCentroids(emb, nCentroids, iterations)
    val nc = graft.functions.NearestCentroid.nearest(col("embedding"),
      centroids)
    val bucket = nc.getField("bucket").cast("long").as("bucket")
    // PRE-filter: the predicate lands on the candidate scan itself
    // (parquet-pushed), before any assignment or scoring work
    val cands = emb.where(col("label").isin(labels: _*))
      .select(col("vec_id").as("cand_id"), col("embedding").as("c"),
        col("label"), bucket)
    val queries = emb.where(col("vec_id") < nQueries).limit(nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"),
        bucket)
    val scored = cands.join(broadcast(queries), "bucket")
      .where(col("cand_id") =!= col("query_id"))
      .withColumn("sim", round(cosine(col("q"), col("c")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("cand_id"))
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("query_id"), col("bucket"), col("cand_id"),
        col("label"), col("sim"), col("rn"))
      .orderBy(col("query_id"), col("rn"))
  }

  /**
   * x69 — HYBRID SEARCH via Reciprocal Rank Fusion (ES 8.x's `rrf`
   * retriever): the lexical BM25 ranking (x22's analyzed query) fused
   * with a dense-vector cosine ranking (query vector = embedding 0, the
   * stand-in for an externally encoded query) by
   * `score = Σ_lists 1/(K + rank)`, K = 60 — the standard fusion that
   * needs NO score normalization because it consumes ranks only, which
   * is exactly why it composes arbitrary retrievers. Docs missing from
   * a list contribute 0 for it (retrieved-lists semantics).
   *
   * Both legs reuse their pinned deterministic orders (BM25 6dp score
   * desc, doc_id; cosine 6dp desc, vec_id) and their scale shapes
   * (postings-pruned aggregate; broadcast query × corpus scan with
   * TakeOrdered top-depth — the corpus side swaps to the IVF probe
   * unchanged). Fusion itself is a full-outer join of two ≤depth-row
   * frames — driver-free, broadcast-size.
   *
   * Cross-engine determinism: ranks are exact ints; each RRF term is ONE
   * double division `1.0/(60+rank)`, summed in fixed lex-then-vec order.
   * No 6dp rounding tie is possible: a reduced denominator (60+r) ∈
   * [61, 80] containing any prime other than 2/5 gives a non-terminating
   * decimal (can't land on an exact half), and the only 2^a·5^b values
   * (64, 80) terminate within 6 digits.
   */
  def hybridRrf(spark: SparkSession, dir: String,
      terms: Seq[String] = Seq("spark", "query", "stream"),
      depth: Int = 20, k: Int = 10, rrfK: Int = 60): DataFrame = {
    val lex = graft.ext.TextAnalysis.bm25(
        Tables.load(spark, dir, "documents"), "doc_id", "text", terms, depth)
      .select(col("doc_id"), col("rank").as("r_lex"))
    val emb = Tables.load(spark, dir, "embeddings")
    val q0 = emb.where(col("vec_id") === 0).limit(1)
      .select(col("embedding").as("qv"))
    val vecTop = emb.where(col("vec_id") =!= 0)
      .crossJoin(broadcast(q0))
      .withColumn("sim", round(cosine(col("qv"), col("embedding")), 6))
      .orderBy(col("sim").desc, col("vec_id")).limit(depth)
    val vec = vecTop.withColumn("r_vec", row_number().over(
        Window.partitionBy(col("sim") - col("sim"))
          .orderBy(col("sim").desc, col("vec_id"))))
      .select(col("vec_id").as("doc_id"), col("r_vec"))
    val fused = lex.join(vec, Seq("doc_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(rrfK) + col("r_lex")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("r_vec")), lit(0.0)), 6))
    fused.orderBy(col("rrf").desc, col("doc_id")).limit(k)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("rrf") - col("rrf"))
          .orderBy(col("rrf").desc, col("doc_id"))))
      .select(col("doc_id"), col("r_lex"), col("r_vec"), col("rrf"),
        col("rank"))
      .orderBy(col("rank"))
  }

  /**
   * x144 — COMPOSED RETRIEVER TREE (ES 8.14+'s nestable `retriever`
   * algebra): retrievers are closed under composition — an `rrf` node
   * can fuse a `linear` node that itself fuses `standard` (BM25) and
   * `knn` legs, next to a filtered `knn` leg. This entry is exactly
   * that tree:
   *
   *   rrf( linear(bm25, dense)   — [[linearFusion]]'s top-10 page,
   *        knn(filter: label)  ) — the label-filtered dense top-20
   *                                for the same query vector
   *
   * The rrf node consumes RANKS only (which is why arbitrary
   * retrievers compose under it — x69's insight); the nested linear
   * node keeps its all-integer normalized-score contract; the filtered
   * leg keeps x141's pre-filter semantics (predicate on the candidate
   * scan, here the exact form — the IVF-probed form composes
   * identically because only ranks cross the node boundary). Each RRF
   * term is ONE double division with the x69 non-tie argument
   * (denominators 61–80). Scale: every leg keeps its own pinned shape;
   * the tree itself is a full-outer join of two ≤depth-row pages.
   */
  def retrieverTree(spark: SparkSession, dir: String,
      labels: Seq[Int] = Seq(2, 5), depth: Int = 20, k: Int = 10,
      rrfK: Int = 60): DataFrame = {
    val lin = linearFusion(spark, dir)
      .select(col("doc_id"), col("rank").as("r_lin"))
    val emb = Tables.load(spark, dir, "embeddings")
    val q0 = emb.where(col("vec_id") === 0).limit(1)
      .select(col("embedding").as("qv"))
    val fTop = emb.where(col("vec_id") =!= 0 &&
        col("label").isin(labels: _*))
      .crossJoin(broadcast(q0))
      .withColumn("sim", round(cosine(col("qv"), col("embedding")), 6))
      .orderBy(col("sim").desc, col("vec_id")).limit(depth)
    val fknn = fTop.withColumn("r_fknn", row_number().over(
        Window.partitionBy(col("sim") - col("sim"))
          .orderBy(col("sim").desc, col("vec_id"))))
      .select(col("vec_id").as("doc_id"), col("r_fknn"))
    val fused = lin.join(fknn, Seq("doc_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(rrfK) + col("r_lin")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("r_fknn")), lit(0.0)), 6))
    fused.orderBy(col("rrf").desc, col("doc_id")).limit(k)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("rrf") - col("rrf"))
          .orderBy(col("rrf").desc, col("doc_id"))))
      .select(col("doc_id"), col("r_lin"), col("r_fknn"), col("rrf"),
        col("rank"))
      .orderBy(col("rank"))
  }

  /**
   * x146 — RESCORER retriever node (ES 8.15+'s `rescorer`, the last
   * node type of the retriever algebra x144 composes): a second-stage
   * EXACT re-score over a BOUNDED WINDOW of the first-stage page.
   * The first stage is the whole x144 tree ([[retrieverTree]]
   * verbatim — retrievers nest, so a rescorer's child is any
   * retriever); its top-`window` docs are re-scored by the exact
   * full-vector cosine against the query vector and REORDERED WITHIN
   * the window by `queryWeight·rrf + rescoreWeight·rescore` (ES's
   * query_weight/rescore_query_weight combination, both 1 by
   * default); ranks beyond the window keep their first-stage order
   * untouched — rescoring can only permute INSIDE the window (pinned
   * in ExtSpec: the window doc set and the tail ranks are invariant).
   *
   * Exactness (the x101 rule): the first-stage rrf and the rescore
   * cosine each freeze ONCE to int64 micro-units and combine with
   * INTEGER weights — no derived double is re-rounded, the
   * (combined DESC, doc_id) order is total and engine-free. A
   * first-stage doc with no embedding row (a BM25-only doc id beyond
   * the embeddings table, real at sf0.1 where docs > vectors)
   * rescores as 0 — it sinks deterministically within the window,
   * mirrored by the oracle's COALESCE.
   *
   * Scale: the first stage keeps its own pinned shapes; rescoring
   * touches exactly `window` rows — one broadcast-able page joined
   * against the embeddings table by id (index lookup at scale) plus
   * one ≤window-row sort. This is the entire point of the ES
   * rescorer: the expensive exact scorer runs on a page, never the
   * corpus.
   */
  def rescorerRetriever(spark: SparkSession, dir: String,
      window: Int = 5, queryWeight: Int = 1,
      rescoreWeight: Int = 1): DataFrame = {
    // the ≤k-row first-stage page, materialized once (two consumers:
    // the rescored window and the untouched tail)
    val base = retrieverTree(spark, dir)
      .select(col("doc_id"), col("rrf"), col("rank"))
      .localCheckpoint()
    val emb = Tables.load(spark, dir, "embeddings")
    val q0 = emb.where(col("vec_id") === 0).limit(1)
      .select(col("embedding").as("qv"))
    val win = base.where(col("rank") <= window)
      .join(emb.select(col("vec_id").as("doc_id"),
        col("embedding").as("cv")), Seq("doc_id"), "left")
      .crossJoin(broadcast(q0))
      .withColumn("resc_micro",
        coalesce(simMicroOf(col("qv"), col("cv")), lit(0L)))
      .withColumn("combined_scaled",
        lit(queryWeight.toLong) *
          (col("rrf").cast(org.apache.spark.sql.types.DecimalType(10, 6))
            * lit(1000000)).cast("long") +
          lit(rescoreWeight.toLong) * col("resc_micro"))
    val rescored = win
      .withColumn("new_rank", row_number().over(
        Window.partitionBy(col("combined_scaled") - col("combined_scaled"))
          .orderBy(col("combined_scaled").desc, col("doc_id"))))
      .select(col("doc_id"), col("rank").as("first_rank"),
        col("resc_micro"), col("combined_scaled"),
        col("new_rank").cast("int").as("rank"))
    val tail = base.where(col("rank") > window)
      .select(col("doc_id"), col("rank").as("first_rank"),
        lit(null).cast("long").as("resc_micro"),
        lit(null).cast("long").as("combined_scaled"),
        col("rank"))
    rescored.unionByName(tail).orderBy(col("rank"))
  }

  /**
   * x143 — WEIGHTED LINEAR retriever fusion (ES 8.16's `linear`
   * retriever, the score-based sibling of x69's rank-only RRF): each
   * leg's retrieved page is MIN-MAX normalized to [0, 1] over that
   * page and the fused score is the weighted sum
   * `w_lex·norm_lex + w_vec·norm_vec`; docs missing from a leg
   * contribute 0 for it (retrieved-lists semantics, as x69).
   *
   * Exactness (the x101 rule): each leg's 6dp score freezes ONCE to
   * int64 micro-units; min-max normalization is a POSITIVE-numerator
   * floor division to exact ppm (s ≥ min by construction, so Spark
   * `div` and DuckDB `//` agree); fusion combines ppm units with
   * INTEGER weights (3/7 ≙ 0.3/0.7 scaled by 10). No derived double is
   * re-rounded anywhere, so the (fused DESC, doc_id) order is total
   * and engine-free. An all-equal page normalizes to 1e6 — every
   * member IS the max (the minmax degenerate edge, mirrored in the
   * oracle).
   *
   * Scale: both legs keep their pinned shapes (postings-pruned BM25
   * aggregate; broadcast query × corpus scan with TakeOrdered
   * top-depth — the corpus side swaps to the IVF probe unchanged);
   * normalization is one 1-row min/max attach per leg and the fusion
   * is a full-outer join of two ≤depth-row frames. Driver-free.
   */
  def linearFusion(spark: SparkSession, dir: String,
      terms: Seq[String] = Seq("spark", "query", "stream"),
      depth: Int = 20, k: Int = 10, wLex: Int = 3,
      wVec: Int = 7): DataFrame = {
    def micro(c: Column): Column =
      (c.cast("decimal(10,6)") * 1000000).cast("long")
    val lex = graft.ext.TextAnalysis.bm25(
        Tables.load(spark, dir, "documents"), "doc_id", "text", terms,
        depth)
      .select(col("doc_id"), micro(col("score")).as("s_lex"))
    val emb = Tables.load(spark, dir, "embeddings")
    val q0 = emb.where(col("vec_id") === 0).limit(1)
      .select(col("embedding").as("qv"))
    val vec = emb.where(col("vec_id") =!= 0)
      .crossJoin(broadcast(q0))
      .withColumn("sim", round(cosine(col("qv"), col("embedding")), 6))
      .orderBy(col("sim").desc, col("vec_id")).limit(depth)
      .select(col("vec_id").as("doc_id"), micro(col("sim")).as("s_vec"))
    def normPpm(df: DataFrame, s: String, out: String): DataFrame = {
      val mm = df.agg(min(col(s)).as("mn"), max(col(s)).as("mx"))
      df.crossJoin(broadcast(mm))
        .withColumn(out, when(col("mx") === col("mn"), lit(1000000L))
          .otherwise(expr(s"(($s - mn) * 1000000L) div (mx - mn)")))
        .drop("mn", "mx")
    }
    val nl = normPpm(lex, "s_lex", "n_lex_ppm")
    val nv = normPpm(vec, "s_vec", "n_vec_ppm")
    val fused = nl.join(nv, Seq("doc_id"), "full_outer")
      .withColumn("fused_scaled",
        lit(wLex.toLong) * coalesce(col("n_lex_ppm"), lit(0L)) +
          lit(wVec.toLong) * coalesce(col("n_vec_ppm"), lit(0L)))
    fused.orderBy(col("fused_scaled").desc, col("doc_id")).limit(k)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("fused_scaled") - col("fused_scaled"))
          .orderBy(col("fused_scaled").desc, col("doc_id"))))
      .select(col("doc_id"), col("s_lex"), col("s_vec"),
        col("n_lex_ppm"), col("n_vec_ppm"), col("fused_scaled"),
        col("rank"))
      .orderBy(col("rank"))
  }

  /**
   * Per-subspace PQ codebooks: `result(s)(c)` is centroid `c` of
   * subspace `s` after `iterations` Lloyd steps with EUCLIDEAN
   * assignment (PQ quantizes raw subvectors; cosine is the wrong
   * metric inside a subspace). Deterministic: init centroid c =
   * vector c's slice, assignment on 6dp-rounded distances with
   * lowest-c ties, means DECIMAL(38,15)-exact. The driver sync per
   * iteration is the S×k×subDim codebook (256 doubles) — the x6
   * centroid-sync pattern.
   */
  private[graft] def pqCodebooks(emb: DataFrame, subspaces: Int, k: Int,
      subDim: Int, iterations: Int): Seq[Seq[Seq[Double]]] = {
    val init = emb.where(col("vec_id") < k).orderBy(col("vec_id"))
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq)
    var books: Seq[Seq[Seq[Double]]] = (0 until subspaces).map(s =>
      init.toSeq.map(_.slice(s * subDim, (s + 1) * subDim)))
    for (_ <- 0 until iterations) {
      // one fused native assignment loop per row (codes(s) == the old
      // argminC-over-rounded-subDist fold, bit-for-bit) — the literal
      // S×k fold trees recompiled in janino every iteration because the
      // codebook literals were inlined in the generated source
      val sSub = (col("pos") / lit(subDim)).cast("int")
      val stats = emb.select(
          graft.functions.PqAssign.assign(col("embedding"), books)
            .getField("codes").as("bs"),
          col("embedding"))
        .select(col("bs"),
          posexplode(col("embedding")).as(Seq("pos", "v")))
        .select(sSub.as("s_sub"),
          element_at(col("bs"), sSub + 1).as("c"),
          pmod(col("pos"), lit(subDim)).as("lpos"), col("v"))
        .groupBy(col("s_sub"), col("c"), col("lpos"))
        .agg(sum(col("v").cast("double").cast("decimal(38,15)")).as("sm"),
          count(lit(1)).as("n"))
        .select(col("s_sub"), col("c"), col("lpos"),
          (col("sm").cast("double") / col("n")).as("m"))
        .collect()
      val means = stats.groupBy(r => (r.getInt(0), r.getInt(1)))
        .view.mapValues(rows =>
          rows.sortBy(_.getInt(2)).map(_.getDouble(3)).toSeq).toMap
      books = (0 until subspaces).map(s => (0 until k).map(c =>
        means.getOrElse((s, c), books(s)(c))))
    }
    books
  }

  /**
   * x78 — PRODUCT QUANTIZATION (Jégou et al. 2011), the embedding
   * compression behind billion-scale ANN indexes: the 64-dim vector is
   * split into 4 subspaces of 16 dims, each quantized to one of 4
   * per-subspace centroids, so a vector stores as 4 small codes (here
   * 4 bytes vs 256 — a 64× cut; production uses 8-bit codebooks for
   * the same shape). Codebooks come from [[pqCodebooks]]'s
   * deterministic per-subspace Lloyd; the ENCODING pass is then ONE
   * map-only projection — every distance is a literal-centroid
   * codegen'd fold over the scan, no explode, no shuffle, no UDF —
   * which is the whole point at 100 TB: PQ encoding runs at scan
   * speed. Reported per vector: the 4 codes and the total squared
   * reconstruction error (the quantization-quality metric), 6dp like
   * every similarity in this package; the four per-subspace errors add
   * in fixed s-order so partitioning cannot flip the rounding.
   */
  def pq(spark: SparkSession, dir: String, subspaces: Int = 4,
      k: Int = 4, iterations: Int = 2): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val dim = 64
    val subDim = dim / subspaces
    val books = pqCodebooks(emb, subspaces, k, subDim, iterations)
    // one fused native loop per row for codes AND reconstruction errors
    // (codes == the old argminC-over-rounded-subDist, errs == the old
    // unrounded `least` legs, bit-for-bit — see PqAssign's contract)
    emb.select(col("vec_id"),
        graft.functions.PqAssign.assign(col("embedding"), books).as("pa"))
      .select(Seq(col("vec_id")) ++
        (0 until subspaces).map(s =>
          element_at(col("pa.codes"), s + 1).cast("long").as(s"c$s")) :+
        round((0 until subspaces)
          .map(s => element_at(col("pa.errs"), s + 1)).reduce(_ + _), 6)
          .as("err"): _*)
      .orderBy(col("vec_id"))
  }

  /**
   * x97 — IVF+PQ SEARCH (the serving path of billion-scale ANN, Jégou
   * et al. 2011): the coarse quantizer (the shared cosine k-means
   * buckets — x6's IVF) prunes the corpus to the query's cell, and
   * within it candidates are scored by ASYMMETRIC DISTANCE (ADC): the
   * query keeps full precision while each candidate is just its 4 PQ
   * codes (x78's codebooks), so per-candidate cost is 4 lookups into
   * the query's 16-cell distance table instead of a 64-dim scan.
   * (Codes here quantize raw subvectors within cells, not residuals —
   * the IVFFlat-PQ hybrid; residual coding changes the training input,
   * not this serving shape.)
   *
   * Spark shape: candidate codes + IVF bucket come from ONE map-only
   * scan projection (literal-codebook codegen'd folds — x78's "encode
   * at scan speed"); queries broadcast carrying their PRECOMPUTED
   * 16-cell LUT as an array column (computed once per query — textbook
   * ADC); the bucket equi-join IS the IVF prune; the per-candidate ADC
   * is 4 `element_at` lookups + adds inside whole-stage codegen. Every
   * LUT cell is 6dp-rounded then frozen to exact integer micro-units
   * (the cosMicro discipline), so the ADC sum is int64 — zero tie
   * surface — and the DuckDB oracle computes the same cells via an
   * explicit (query, s, c) LUT join over the replayed codebooks.
   */
  /** The ADC scoring + per-query top-k shared by x97 (build+search in
    * one invocation), x102 (probe of the PERSISTED index) and x131
    * (out-of-corpus serving): `cands` carries (cand_id, bucket,
    * c0..cS), `queries` (query_id, q, bucket). The per-query distance
    * LUT — every cell 6dp-rounded then frozen to integer micro-units —
    * is computed ONCE per query as an S×k array column on the
    * broadcast-sized query frame (textbook ADC), so the per-candidate
    * work is S `element_at` lookups + adds inside whole-stage codegen.
    * (The previous form inlined the literal-codebook subDist folds as
    * CASE branches in the per-candidate projection: it re-derived a
    * 16-dim distance per candidate row AND blew janino's 64 KB method
    * limit, dropping the whole probe stage to interpreted execution.) */
  private def adcTopK(cands: DataFrame, queries: DataFrame,
      books: Seq[Seq[Seq[Double]]], subDim: Int, topK: Int,
      excludeSelf: Boolean = true): DataFrame = {
    val subspaces = books.length
    val k = books.head.length
    // cell (s, c) lives at 1-based index s*k + c + 1; the whole LUT is
    // ONE fused native loop per query row (same 6dp-freeze micro-units
    // as the literal-fold cells it replaces — PqLutMicro's contract)
    val qWithLut = queries.withColumn("lut",
      graft.functions.PqAssign.lutMicro(col("q"), books))
    val adc = (0 until subspaces).map(s =>
        element_at(col("lut"), (col(s"c$s").cast("int") + lit(s * k + 1))))
      .reduce(_ + _)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_micro"), col("cand_id"))
    cands.join(broadcast(qWithLut), "bucket")
      .where(if (excludeSelf) col("cand_id") =!= col("query_id")
             else lit(true))
      .withColumn("adc_micro", adc)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= topK)
      .select(col("query_id"), col("bucket"), col("cand_id"),
        col("adc_micro"), col("rn"))
      .orderBy(col("query_id"), col("rn"))
  }

  /** Runs the two INDEPENDENT quantizer trainings (coarse cosine
    * k-means and per-subspace PQ Lloyd) as concurrent driver threads:
    * actions are only sequential because the driver calls them
    * sequentially, so each trainer's per-iteration jobs back-fill the
    * other's stage tails (each training's own iterations stay
    * sequential; the trainings share no state, so determinism is
    * untouched — job descriptions are thread-local). */
  private def trainCoarseAndPq(emb: DataFrame, nCentroids: Int,
      subspaces: Int, k: Int, subDim: Int, iterations: Int)
      : (Seq[Seq[Double]], Seq[Seq[Seq[Double]]]) = {
    // daemon threads: a failure path that never reaches shutdownNow must
    // not pin the JVM on two live pool threads
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2,
      new java.util.concurrent.ThreadFactory {
        def newThread(r: Runnable) = {
          val t = new Thread(r, "graft-train")
          t.setDaemon(true); t
        }
      })
    try {
      val fc = pool.submit(
        new java.util.concurrent.Callable[Seq[Seq[Double]]] {
          def call() = kmeansCentroids(emb, nCentroids, iterations) })
      val fb = pool.submit(
        new java.util.concurrent.Callable[Seq[Seq[Seq[Double]]]] {
          def call() = pqCodebooks(emb, subspaces, k, subDim, iterations) })
      try (fc.get(), fb.get())
      catch {
        // surface the training's own exception, not the pool wrapper,
        // and stop the sibling training's remaining jobs
        case e: java.util.concurrent.ExecutionException =>
          pool.shutdownNow()
          throw Option(e.getCause).getOrElse(e)
      }
    } finally pool.shutdown()
  }

  def ivfPqSearch(spark: SparkSession, dir: String, nCentroids: Int = 8,
      iterations: Int = 2, subspaces: Int = 4, k: Int = 4,
      nQueries: Int = 10, topK: Int = 5): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val subDim = 64 / subspaces
    val (centroids, books) =
      trainCoarseAndPq(emb, nCentroids, subspaces, k, subDim, iterations)
    val nc = graft.functions.NearestCentroid.nearest(col("embedding"),
      centroids)
    val cands = emb.select(col("vec_id").as("cand_id"),
        nc.getField("bucket").cast("long").as("bucket"),
        graft.functions.PqAssign.assign(col("embedding"), books)
          .getField("codes").as("cs"))
      .select(Seq(col("cand_id"), col("bucket")) ++
        (0 until subspaces).map(s =>
          element_at(col("cs"), s + 1).cast("long").as(s"c$s")): _*)
    val queries = emb.where(col("vec_id") < nQueries).limit(nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"),
        nc.getField("bucket").cast("long").as("bucket"))
    adcTopK(cands, queries, books, subDim, topK)
  }

  /** Builds + persists the IVF+PQ index: the (vec_id, embedding,
    * bucket, c0..cS) table bucketed on the IVF key, the flattened
    * codebook table, AND the coarse centroids — the piece a serving
    * deployment needs to assign vectors it has never seen (x131).
    * Returns (indexTable, codebookPath). */
  private def buildIvfPqIndex(spark: SparkSession, dir: String,
      nCentroids: Int, iterations: Int, subspaces: Int,
      k: Int): (String, String) = {
    val suffix = Dedup.indexSuffix(dir)
    val idxTable = s"graft_ivfpq_index_$suffix"
    val cbPath =
      s"${sys.props("java.io.tmpdir")}/graft_index/graft_ivfpq_cb_$suffix"
    val ctPath =
      s"${sys.props("java.io.tmpdir")}/graft_index/graft_ivfpq_ct_$suffix"
    val emb = Tables.load(spark, dir, "embeddings")
    val subDim = 64 / subspaces
    val (centroids, books) =
      trainCoarseAndPq(emb, nCentroids, subspaces, k, subDim, iterations)
    val nc = graft.functions.NearestCentroid.nearest(col("embedding"),
      centroids)
    graft.sink.BucketedTables.writeBucketed(
      emb.select(col("vec_id"), col("embedding"),
          nc.getField("bucket").cast("long").as("bucket"),
          graft.functions.PqAssign.assign(col("embedding"), books)
            .getField("codes").as("cs"))
        .select(Seq(col("vec_id"), col("embedding"), col("bucket")) ++
          (0 until subspaces).map(s =>
            element_at(col("cs"), s + 1).cast("long").as(s"c$s")): _*),
      idxTable, "bucket", 8,
      path = Some(s"${sys.props("java.io.tmpdir")}/graft_index/$idxTable"))
    import spark.implicits._
    books.zipWithIndex.flatMap { case (cs, s) =>
      cs.zipWithIndex.flatMap { case (cv, c) =>
        cv.zipWithIndex.map { case (v, pos) => (s, c, pos, v) } } }
      .toDF("s", "c", "pos", "v")
      .write.mode("overwrite").parquet(cbPath)
    centroids.zipWithIndex.flatMap { case (cv, b) =>
      cv.zipWithIndex.map { case (v, pos) => (b, pos, v) } }
      .toDF("centroid_id", "pos", "v")
      .write.mode("overwrite").parquet(ctPath)
    (idxTable, cbPath)
  }

  /** A persisted index artifact counts only when its parquet COMMITTED
    * (`_SUCCESS` present): a pre-round-14 build that never wrote the
    * centroids, or a crash mid-write, must trigger a rebuild instead of
    * a raw path-does-not-exist failure downstream (the stored table and
    * the side parquets are one atomic artifact set or nothing). */
  private def parquetCommitted(path: String): Boolean =
    new java.io.File(path, "_SUCCESS").exists()

  /**
   * x102 — the PROBE-ONLY side of x97's IVF+PQ (the x62/x63 lifecycle
   * split applied to the compressed index): the expensive part — BOTH
   * quantizer trainings (cosine k-means and the per-subspace PQ Lloyd)
   * plus the corpus coding pass — runs ONCE and persists as a bucketed
   * (vec_id, bucket, codes) table and a 256-double codebook table. At
   * query time NOTHING rescans `embeddings` or re-trains: queries pull
   * their bucket and full-precision vector from the stored index, the
   * codebooks load as one bounded driver read (the k x dim sync
   * pattern), and the ADC scan runs against the stored codes. Result
   * contract identical to [[ivfPqSearch]] — the oracle is shared.
   */
  def ivfPqProbe(spark: SparkSession, dir: String, nCentroids: Int = 8,
      iterations: Int = 2, subspaces: Int = 4, k: Int = 4,
      nQueries: Int = 10, topK: Int = 5): DataFrame = {
    val suffix = Dedup.indexSuffix(dir)
    val idxTable = s"graft_ivfpq_index_$suffix"
    val cbPath =
      s"${sys.props("java.io.tmpdir")}/graft_index/graft_ivfpq_cb_$suffix"
    val ctPath =
      s"${sys.props("java.io.tmpdir")}/graft_index/graft_ivfpq_ct_$suffix"
    if (!spark.catalog.tableExists(idxTable) ||
        !parquetCommitted(cbPath) || !parquetCommitted(ctPath))
      buildIvfPqIndex(spark, dir, nCentroids, iterations, subspaces, k)
    val subDim = 64 / subspaces
    val books = loadCodebooks(spark, cbPath, subspaces, k)
    val assigned = spark.table(idxTable)
    val cands = assigned.select(Seq(col("vec_id").as("cand_id"),
      col("bucket")) ++ (0 until subspaces).map(s => col(s"c$s")): _*)
    val queries = assigned.where(col("vec_id") < nQueries).limit(nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"),
        col("bucket"))
    adcTopK(cands, queries, books, subDim, topK)
  }

  /** Reads the flattened PQ codebook parquet back into the in-memory
    * `books(s)(c)` shape — one bounded driver read (256 doubles). */
  private def loadCodebooks(spark: SparkSession, cbPath: String,
      subspaces: Int, k: Int): Seq[Seq[Seq[Double]]] = {
    val rows = spark.read.parquet(cbPath)
      .select(col("s"), col("c"), col("pos"), col("v"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)),
        (r.getInt(2), r.getDouble(3))))
    (0 until subspaces).map(s => (0 until k).map(c =>
      rows.filter(_._1 == ((s, c))).map(_._2).sortBy(_._1)
        .map(_._2).toSeq))
  }

  /**
   * x131 — IVF+PQ SERVING for OUT-OF-CORPUS queries, the piece that
   * makes the persisted index a real serving artifact: x102 proves the
   * stored codes answer queries drawn FROM the corpus (their coarse
   * bucket rides on the stored row), but a deployed ANN service is
   * probed with vectors the index has never seen. This entry persists
   * the COARSE CENTROIDS alongside the codes and codebooks
   * ([[buildIvfPqIndex]]), then serves synthetic unseen queries — the
   * element-wise mean of stored pairs (2i, 2i+1), which equals no
   * stored vector — by (1) assigning each to its IVF cell with the
   * zero-shuffle [[graft.functions.NearestCentroid]] scan over the
   * RELOADED centroids, and (2) ADC-scoring the cell's stored codes
   * exactly as x97/x102. Nothing rescans `embeddings`, nothing
   * retrains: the three persisted artifacts (centroids, codebooks,
   * coded corpus) are sufficient — which is the operational definition
   * of an index. No self-exclusion: an unseen query owns none of the
   * candidates.
   *
   * Cross-engine determinism: the query mean is one double add + an
   * exact halving per element (floats are exact in double, so Spark's
   * `(x + y) / 2` fold bit-matches DuckDB's `(a[i] + b[i]) / 2` over
   * `DOUBLE[]` casts); bucket assignment and every ADC LUT cell then
   * follow the established 6dp-round → integer-micro discipline.
   */
  def ivfPqServe(spark: SparkSession, dir: String, nCentroids: Int = 8,
      iterations: Int = 2, subspaces: Int = 4, k: Int = 4,
      nQueries: Int = 10, topK: Int = 5): DataFrame = {
    val suffix = Dedup.indexSuffix(dir)
    val idxTable = s"graft_ivfpq_index_$suffix"
    val cbPath =
      s"${sys.props("java.io.tmpdir")}/graft_index/graft_ivfpq_cb_$suffix"
    val ctPath =
      s"${sys.props("java.io.tmpdir")}/graft_index/graft_ivfpq_ct_$suffix"
    if (!spark.catalog.tableExists(idxTable) ||
        !parquetCommitted(cbPath) || !parquetCommitted(ctPath))
      buildIvfPqIndex(spark, dir, nCentroids, iterations, subspaces, k)
    val subDim = 64 / subspaces
    val books = loadCodebooks(spark, cbPath, subspaces, k)
    val centroids: Seq[Seq[Double]] = spark.read.parquet(ctPath)
      .select(col("centroid_id"), col("pos"), col("v"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3).toSeq)
    val assigned = spark.table(idxTable)
    val cands = assigned.select(Seq(col("vec_id").as("cand_id"),
      col("bucket")) ++ (0 until subspaces).map(s => col(s"c$s")): _*)
    // unseen query vectors: mean of stored pairs (2i, 2i+1), i < nQueries
    val a = assigned.where(col("vec_id") < 2 * nQueries &&
        col("vec_id") % 2 === 0)
      .select(expr("vec_id DIV 2").as("query_id"), col("embedding").as("ea"))
    val b = assigned.where(col("vec_id") < 2 * nQueries &&
        col("vec_id") % 2 === 1)
      .select(expr("vec_id DIV 2").as("query_id"), col("embedding").as("eb"))
    val queries = a.join(b, "query_id")
      .withColumn("q", zip_with(col("ea"), col("eb"),
        (x, y) => (x.cast("double") + y.cast("double")) / lit(2)))
      .withColumn("bucket", graft.functions.NearestCentroid
        .nearest(col("q"), centroids).getField("bucket").cast("long"))
      .select(col("query_id"), col("q"), col("bucket"))
    adcTopK(cands, queries, books, subDim, topK, excludeSelf = false)
  }

  /**
   * x138 — MARGIN-BASED BITEXT MINING (Artetxe & Schwenk 2019): the
   * multilingual-pipeline stage that pairs parallel sentences across
   * two corpora by embedding similarity. Raw cosine is miscalibrated —
   * some sentences are "hubs" that score high against everything — so
   * each candidate pair is scored by the MARGIN between its similarity
   * and the mean similarity of each side's k nearest neighbors (the
   * paper's 'distance' margin, §3.1), and a pair is mined only when it
   * is the mutual best: x's best-margin candidate is y AND y's is x
   * (the forward∩backward consistency of §3.2).
   *
   * Sides here are the even (X) / odd (Y) halves of `embeddings` — the
   * x72 derived-fixture discipline. Exactness end to end: each cosine
   * freezes to 6dp integer micro-units ONCE; the margin clears the
   * /2k division by scaling — margin_scaled = 2k·sim − (Σkx + Σky),
   * pure BIGINT (the x101 lesson: rounded legs combine in scaled
   * integer units, a derived double is never re-rounded). Both argmax
   * selections break ties by candidate id.
   *
   * Scale: the exact all-pairs scoring leg is the fixture-size truth
   * contract (the x86 pattern), bounded STRUCTURALLY by [[MineCap]] per
   * side (row-identical at every fixture/probe SF and plan-visible to
   * PlanGuard — a truth leg must never broadcast an unbounded table);
   * at 100 TB both kNN legs swap verbatim for the bucketed ANN probe
   * (x6/x102 — the paper itself mines with FAISS indexes), and
   * everything downstream of the ONCE-materialized ranked frame is
   * per-id bounded windows + one k-row-sum join per side.
   */
  def bitextMine(spark: SparkSession, dir: String, k: Int = 4): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    // the id predicate makes the capped subset DETERMINISTIC above
    // MineCap (even/odd ids below 2·MineCap are exactly ≤ MineCap rows
    // per side, the same rows every run — a bare limit would keep an
    // arbitrary subset, round-15 ADVICE) and the oracle mirrors it; the
    // limit stays as the plan-visible GlobalLimit bound PlanGuard and
    // PlansSpec pin.
    val xs = emb.where(col("vec_id") % 2 === 0 &&
        col("vec_id") < lit(2L * MineCap))
      .select(col("vec_id").as("x_id"), col("embedding").as("xv"))
      .limit(MineCap)
    val ys = emb.where(col("vec_id") % 2 === 1 &&
        col("vec_id") < lit(2L * MineCap))
      .select(col("vec_id").as("y_id"), col("embedding").as("yv"))
      .limit(MineCap)
    val sims = xs.crossJoin(ys)
      .select(col("x_id"), col("y_id"), simMicroOf(col("xv"), col("yv")))
    mineMutualBest(sims, k)
  }

  /** The frozen-6dp integer-micro cosine both bitext legs score with. */
  private def simMicroOf(xv: Column, yv: Column): Column =
    (round(cosine(xv, yv), 6)
      .cast(org.apache.spark.sql.types.DecimalType(10, 6)) * lit(1000000))
      .cast("long").as("sim_micro")

  /** The margin + mutual-best stage shared by BOTH bitext-mining legs
    * ([[bitextMine]]'s exact scores, [[bitextMineAnn]]'s probed scores):
    * rank the scored (x_id, y_id, sim_micro) frame both ways, sum each
    * side's top-k sims, clear the /2k margin to scaled BIGINT, keep the
    * forward∩backward mutual bests. Everything downstream of the
    * ONCE-materialized ranked frame is per-id bounded windows + one
    * k-row-sum join per side — candidate-set-sized, never corpus². */
  private def mineMutualBest(sims: DataFrame, k: Int): DataFrame = {
    val wX = Window.partitionBy(col("x_id"))
      .orderBy(col("sim_micro").desc, col("y_id"))
    val wY = Window.partitionBy(col("y_id"))
      .orderBy(col("sim_micro").desc, col("x_id"))
    // materialized ONCE: four downstream consumers (both k-sums, both
    // argmax legs) would otherwise each recompute the scoring leg
    val ranked = sims
      .withColumn("rx", row_number().over(wX))
      .withColumn("ry", row_number().over(wY))
      .localCheckpoint()
    val kxSum = ranked.where(col("rx") <= k).groupBy(col("x_id"))
      .agg(sum(col("sim_micro")).as("kx_sum"))
    val kySum = ranked.where(col("ry") <= k).groupBy(col("y_id"))
      .agg(sum(col("sim_micro")).as("ky_sum"))
    val cand = ranked.where(col("rx") <= k || col("ry") <= k)
      .join(kxSum, "x_id").join(kySum, "y_id")
      .withColumn("margin_scaled",
        lit(2L * k) * col("sim_micro") - (col("kx_sum") + col("ky_sum")))
    val fwd = cand.where(col("rx") <= k)
      .withColumn("rf", row_number().over(Window.partitionBy(col("x_id"))
        .orderBy(col("margin_scaled").desc, col("y_id"))))
      .where(col("rf") === 1)
      .select(col("x_id"), col("y_id"), col("sim_micro"),
        col("margin_scaled"))
    val bwd = cand.where(col("ry") <= k)
      .withColumn("rb", row_number().over(Window.partitionBy(col("y_id"))
        .orderBy(col("margin_scaled").desc, col("x_id"))))
      .where(col("rb") === 1)
      .select(col("x_id"), col("y_id"))
    fwd.join(bwd, Seq("x_id", "y_id"))
      .select(col("x_id"), col("y_id"), col("sim_micro"),
        col("margin_scaled"))
      .orderBy(col("x_id"))
  }

  /**
   * x140 — ANN-LEGGED BITEXT MINING: [[bitextMine]]'s scale path made
   * an executable entry. Both kNN legs swap for the bucketed IVF probe
   * (the paper itself mines with FAISS indexes — Artetxe & Schwenk
   * 2019 §5): vectors are assigned once to their nearest k-means
   * centroid (the shared [[kmeansCentroids]] + zero-shuffle
   * [[graft.functions.NearestCentroid]] pass from x6), and a pair is
   * SCORED only when both sides share a bucket — one shuffled
   * equi-join on the bucket id replaces the capped crossJoin, so the
   * scored-pair count is Σ_b |X_b|·|Y_b| instead of |X|·|Y|. The
   * margin and mutual-best stages are [[mineMutualBest]] VERBATIM over
   * the probed candidate frame (the per-side top-k and margins are
   * computed within the probe results, exactly how FAISS-legged mining
   * scores its retrieved lists).
   *
   * Each side probes its `nProbe` nearest buckets (the FAISS `nprobe`
   * recall knob, x23's construction): a pair is scored when y's bucket
   * is among x's probes OR x's bucket is among y's — the union of the
   * forward and backward retrieved lists, deduplicated BEFORE scoring
   * so each pair's cosine runs once.
   *
   * Centroid count scales as C ∝ √N — `max(8, ceil(√N / 6))`, the
   * FAISS coarse-quantizer guidance (c·√N centroids; FAISS's own docs
   * recommend 4√N–16√N — the smaller constant here keeps the
   * driver-held C×D centroid artifact minimal while buckets stay
   * O(√N)) — so per-probe scoring work is Σ_b |X_b|·|Y_b| ≈ N·√N·const
   * and the assignment pass is N·C = N·√N/6 cosines: SUBLINEAR per
   * row, vs the round-16 N/250 rule whose N×C assignment term was
   * N²/250 with a corpus-LINEAR driver artifact (the round-16 `weak`
   * flag). Every fixture SF still lands exactly at the floor of 8;
   * the DuckDB oracle derives C from the SAME rule inside SQL
   * (`greatest(8, ceil(sqrt(count(*)) / 6))`), so entry and oracle
   * cannot drift however large a fixture grows (round-16 ADVICE —
   * sqrt/ceil are exactly-rounded IEEE ops, bit-identical across
   * engines). At true corpus scale the Lloyd training pass runs on a
   * sample (standard IVF practice); the assignment and probe passes
   * here are already the at-scale shape.
   *
   * Probe ranking is the native [[graft.functions.TopProbes]]
   * expression — the n best buckets returned DIRECTLY from the per-row
   * centroid loop. The round-16 shape posexploded ALL C sims per
   * vector and ranked them through a partitioned window: an N×C-row
   * shuffle, invisible at the fixture C-floor and ruinous at C ∝ √N.
   * The scored-candidate stage now contains NO window at all (pinned
   * by ExtSpec): explode of the nProbe-length array, two bucket
   * equi-joins, a union-dedup, one cosine per candidate pair.
   *
   * Recall loss vs the exact leg is pair-level, not correctness:
   * ExtSpec pins the mined-pair agreement against [[bitextMine]] on
   * the fixtures (the random near-orthogonal fixture vectors are the
   * ADVERSARIAL case — real parallel sentences score high and
   * co-bucket). `forceCentroids` overrides the C rule for scaling
   * probes (BENCH_CURVE measures the assignment term at a C above the
   * fixture floor); 0 = derive from N.
   */
  def bitextMineAnn(spark: SparkSession, dir: String, k: Int = 4,
      nProbe: Int = 2, iterations: Int = 2,
      forceCentroids: Int = 0): DataFrame =
    mineMutualBest(
      bitextAnnScored(spark, dir, nProbe, iterations, forceCentroids), k)

  /** The C ∝ √N centroid-count rule shared (textually) with the x140
    * oracle's `greatest(8, ceil(sqrt(count(*)) / 6))`. */
  private[graft] def annCentroidCount(n: Long): Int =
    math.max(8L, math.ceil(math.sqrt(n.toDouble) / 6.0).toLong).toInt

  /** [[bitextMineAnn]]'s candidate-generation + scoring stage, split out
    * so ExtSpec can pin its plan shape in isolation (no WindowExec
    * anywhere — the mutual-best stage downstream is window-based but
    * candidate-bounded and behind a lineage cut). */
  private[graft] def bitextAnnScored(spark: SparkSession, dir: String,
      nProbe: Int = 2, iterations: Int = 2,
      forceCentroids: Int = 0): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val nCentroids =
      if (forceCentroids > 0) forceCentroids
      else annCentroidCount(emb.count())
    val centroids = kmeansCentroids(emb, nCentroids, iterations)
    val tp = graft.functions.NearestCentroid.topProbes(col("embedding"),
      centroids, nProbe)
    // assignment bucket = probe rank 1 (TopProbes' first element IS
    // NearestCentroid's argmax), so one expression serves both frames
    val asg = emb.select(col("vec_id"), col("embedding"),
      element_at(tp, 1).cast("long").as("bucket"))
    // per-vector top-nProbe buckets, map-only: N×nProbe rows, no
    // explode of all C sims, no window shuffle
    val probes = emb.select(col("vec_id"), explode(tp).as("pb"))
      .select(col("vec_id"), col("pb").cast("long").as("pbucket"))
    val xs = asg.where(col("vec_id") % 2 === 0)
      .select(col("vec_id").as("x_id"), col("embedding").as("xv"),
        col("bucket"))
    val ys = asg.where(col("vec_id") % 2 === 1)
      .select(col("vec_id").as("y_id"), col("embedding").as("yv"),
        col("bucket"))
    val px = probes.where(col("vec_id") % 2 === 0)
      .select(col("vec_id").as("x_id"), col("pbucket"))
    val py = probes.where(col("vec_id") % 2 === 1)
      .select(col("vec_id").as("y_id"), col("pbucket"))
    val fwd = px.join(ys.select(col("y_id"), col("bucket")),
        px("pbucket") === ys("bucket"))
      .select(col("x_id"), col("y_id"))
    val bwd = py.join(xs.select(col("x_id"), col("bucket")),
        py("pbucket") === xs("bucket"))
      .select(col("x_id"), col("y_id"))
    val candPairs = fwd.union(bwd).distinct()
    candPairs
      .join(xs.select(col("x_id"), col("xv")), "x_id")
      .join(ys.select(col("y_id"), col("yv")), "y_id")
      .select(col("x_id"), col("y_id"), simMicroOf(col("xv"), col("yv")))
  }

  /** x138's per-side truth-leg bound: the exact all-pairs leg runs only
    * below this (fixture/probe scale by construction); larger corpora
    * mine via the ANN legs. Plan-visible (GlobalLimit) to PlanGuard. */
  private val MineCap = 100000

  /** x138's oracle: the identical pipeline over DOUBLE[] casts. */
  private[ext] def bitextMineOracle(k: Int = 4): String =
    s"""WITH xs AS (SELECT vec_id AS x_id,
       |    CAST(embedding AS DOUBLE[]) AS xv
       |  FROM embeddings WHERE vec_id % 2 = 0 AND vec_id < ${2L * MineCap}),
       |ys AS (SELECT vec_id AS y_id, CAST(embedding AS DOUBLE[]) AS yv
       |  FROM embeddings WHERE vec_id % 2 = 1 AND vec_id < ${2L * MineCap}),
       |s AS MATERIALIZED (SELECT x_id, y_id,
       |    CAST(CAST(round(list_cosine_similarity(xv, yv), 6)
       |         AS DECIMAL(10,6)) * 1000000 AS BIGINT) AS sim_micro
       |  FROM xs, ys),
       |""".stripMargin + bitextChainSql(k)

  /** The margin + mutual-best CTE chain over a scored `s`
    * (x_id, y_id, sim_micro) relation — [[mineMutualBest]] in SQL,
    * shared by the x138 (exact `s`) and x140 (bucket-probed `s`)
    * oracles so the two legs can never drift. */
  private[ext] def bitextChainSql(k: Int = 4): String =
    s"""r AS MATERIALIZED (SELECT *,
       |    row_number() OVER (PARTITION BY x_id
       |      ORDER BY sim_micro DESC, y_id) AS rx,
       |    row_number() OVER (PARTITION BY y_id
       |      ORDER BY sim_micro DESC, x_id) AS ry
       |  FROM s),
       |kx AS (SELECT x_id, CAST(sum(sim_micro) AS BIGINT) AS kx_sum
       |  FROM r WHERE rx <= $k GROUP BY 1),
       |ky AS (SELECT y_id, CAST(sum(sim_micro) AS BIGINT) AS ky_sum
       |  FROM r WHERE ry <= $k GROUP BY 1),
       |c AS MATERIALIZED (SELECT r.x_id, r.y_id, r.sim_micro, r.rx, r.ry,
       |    ${2 * k} * r.sim_micro - (kx.kx_sum + ky.ky_sum)
       |      AS margin_scaled
       |  FROM r JOIN kx ON r.x_id = kx.x_id JOIN ky ON r.y_id = ky.y_id
       |  WHERE r.rx <= $k OR r.ry <= $k),
       |f AS (SELECT x_id, y_id, sim_micro, margin_scaled FROM (
       |    SELECT *, row_number() OVER (PARTITION BY x_id
       |      ORDER BY margin_scaled DESC, y_id) AS rf
       |    FROM c WHERE rx <= $k) WHERE rf = 1),
       |b AS (SELECT x_id, y_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY y_id
       |      ORDER BY margin_scaled DESC, x_id) AS rb
       |    FROM c WHERE ry <= $k) WHERE rb = 1)
       |SELECT f.x_id, f.y_id, f.sim_micro, f.margin_scaled
       |FROM f JOIN b ON f.x_id = b.x_id AND f.y_id = b.y_id
       |ORDER BY f.x_id""".stripMargin

  /**
   * x83 — ANN QUALITY EVAL: recall@k of the IVF probe ([[annIvf]])
   * against the exact brute-force kNN ([[knnBrute]]), as a first-class
   * entry. At 100 TB nobody can eyeball whether bucket pruning loses
   * neighbors; the standard operational health metric is recall@k over a
   * query SAMPLE — the exact leg runs on the sample only (nQueries × N,
   * not N²), so the eval stays tractable at any corpus size and runs as
   * one job beside the serving path. Reuses both pinned searches
   * verbatim; the comparison is a left join of two nQueries×k frames +
   * one tiny aggregate, and recall lands as an exact integer ppm
   * (floor division — no rounding-tie surface).
   */
  def annRecall(spark: SparkSession, dir: String, nQueries: Int = 10,
      k: Int = 5): DataFrame = {
    val exact = knnBrute(spark, dir, nQueries, k)
      .select(col("query_id"), col("cand_id"))
    val approx = annIvf(spark, dir, nCentroids = 8, nQueries = nQueries,
        k = k, iterations = 2)
      .select(col("query_id"), col("cand_id"))
      .withColumn("hit", lit(1L))
    exact.join(approx, Seq("query_id", "cand_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .withColumn("recall_ppm", expr("n_hit * 1000000 div n_exact"))
      .orderBy(col("query_id"))
  }

  /**
   * x118 — MATRYOSHKA TRUNCATION AUDIT, the dimension-axis member of
   * the approximation-eval family (x83 measures the INDEX's loss, x90
   * the cluster-scoping loss, x27 the int8-precision loss): MRL-style
   * embeddings promise that the FIRST d/2 or d/4 coordinates alone
   * rank nearly as well as the full vector, and storage/bandwidth at
   * 100 TB scale is linear in the kept prefix — so this is the table
   * that decides how many dimensions the serving index actually
   * stores. For each query, exact top-k under the full 64 dims is the
   * truth set; top-k under prefix lengths 64/32/16 is scored against
   * it as exact integer recall ppm. One corpus×queries×levels scan
   * (queries and levels broadcast — the corpus side is read ONCE per
   * level with no shuffle before the per-query top-k), and the
   * truncation is `slice()` on the stored vector: no re-embedding, no
   * second copy of the corpus.
   */
  def matryoshkaRecall(spark: SparkSession, dir: String,
      nQueries: Int = 10, k: Int = 5): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val queries = emb.where(col("vec_id") < nQueries).limit(nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"))
    val levels = spark.range(1).select(
      explode(array(lit(64), lit(32), lit(16))).as("level"))
    val scored = emb.select(col("vec_id").as("cand_id"),
        col("embedding").as("c"))
      .crossJoin(broadcast(queries))
      .crossJoin(broadcast(levels))
      .where(col("cand_id") =!= col("query_id"))
      .withColumn("sim", round(cosine(
        slice(col("q"), lit(1), col("level")),
        slice(col("c"), lit(1), col("level"))), 6))
    val w = Window.partitionBy(col("query_id"), col("level"))
      .orderBy(col("sim").desc, col("cand_id"))
    val topk = scored.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("query_id"), col("level"), col("cand_id"))
    val truth = topk.where(col("level") === 64)
      .select(col("query_id"), col("cand_id")).withColumn("hit", lit(1L))
    topk.join(truth, Seq("query_id", "cand_id"), "left")
      .groupBy(col("query_id"), col("level"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .withColumn("recall_ppm", expr(s"n_hit * 1000000 div $k"))
      .orderBy(col("query_id"), col("level"))
  }

  /**
   * x90 — SEMDEDUP CLUSTER-SCOPING EVAL, the third member of the
   * approximate-path eval family (x83 ANN recall, x86 LSH banding):
   * SemDeDup (x71) only compares vectors WITHIN a k-means cluster, so
   * every τ-similar pair straddling a cluster boundary is a duplicate
   * the pruning can never see — this entry measures exactly that loss:
   * all τ-pairs (blocked exact all-pairs, x13's shape), split into
   * within-cluster vs cross-cluster against the SAME shared
   * deterministic k-means assignment x71 uses, with the within fraction
   * as exact integer ppm. At corpus scale the all-pairs truth leg runs
   * on a SAMPLE (documented like x86's); the assignment side stays the
   * broadcast nearest-centroid map pass.
   */
  def semDedupEval(spark: SparkSession, dir: String, nCentroids: Int = 8,
      iterations: Int = 2, threshold: Double = 0.35): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val centroids = kmeansCentroids(emb, nCentroids, iterations)
    val nc = graft.functions.NearestCentroid.nearest(col("embedding"),
      centroids)
    val asg = emb.select(col("vec_id"),
      nc.getField("bucket").cast("long").as("bucket"))
    val pairs = embedNearDupPairs(spark, dir, threshold)
      .select(col("d1"), col("d2"))
    pairs
      .join(asg.select(col("vec_id").as("d1"), col("bucket").as("b1")),
        Seq("d1"))
      .join(asg.select(col("vec_id").as("d2"), col("bucket").as("b2")),
        Seq("d2"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("b1") === col("b2"), 1L).otherwise(0L))
          .as("n_within"),
        sum(when(col("b1") =!= col("b2"), 1L).otherwise(0L))
          .as("n_cross"))
      .withColumn("within_ppm",
        expr("n_within * 1000000 div n_pairs"))
  }

  /** 6dp-rounded cosine frozen to exact integer micro-units (the x56
    * DECIMAL freeze: round → DECIMAL(10,6) → ×1e6 → BIGINT), so every
    * downstream MMR comparison is int64 — no cross-engine rounding-tie
    * surface past this one pinned rounding. */
  private def cosMicro(a: Column, b: Column): Column =
    (round(cosine(a, b), 6).cast("decimal(10,6)") * 1000000).cast("long")

  /**
   * x80 — MAXIMAL MARGINAL RELEVANCE diversified re-rank (Carbonell &
   * Goldstein 1998; ES's `diversified_sampler` / result-diversification
   * shape): from each query's top-`nCand` relevance page, greedily pick
   * `k` results maximizing `λ·rel(q,d) − (1−λ)·max_{s∈S} sim(d,s)` — the
   * relevance/redundancy trade that keeps a results page from showing k
   * near-copies (and a fine-tuning batch from k near-duplicate
   * exemplars).
   *
   * Scale shape: the corpus-sized work is exactly ONE relevance pass
   * (the brute-force scan here; the IVF probe at 100 TB — they compose
   * because MMR only needs the page). Everything after operates on the
   * bounded nQueries×nCand candidate page: the pairwise matrix is a
   * page×page self-join keyed on query_id, and each greedy round is one
   * (join + max + window-argmax) over page-sized frames,
   * `localCheckpoint`ed so lineage stays flat across rounds (the CC/BPE
   * pattern). All scores are exact int64 micro-units: λ=0.7 scaled by 10
   * to `7·rel − 3·maxsim`, ties broken by cand_id — fully deterministic.
   */
  def mmrRerank(spark: SparkSession, dir: String, nQueries: Int = 4,
      nCand: Int = 20, k: Int = 8): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val queries = emb.where(col("vec_id") < nQueries).limit(nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val scored = emb.select(col("vec_id").as("cand_id"),
        col("embedding").as("cv"))
      .crossJoin(broadcast(queries))
      .where(col("cand_id") =!= col("query_id"))
      .withColumn("rel_micro", cosMicro(col("cv"), col("qv")))
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("rel_micro").desc, col("cand_id"))
    val cand = scored.withColumn("rn", row_number().over(wTop))
      .where(col("rn") <= nCand)
      .select(col("query_id"), col("cand_id"), col("cv"), col("rel_micro"))
      .localCheckpoint() // bounded: nQueries × nCand rows
    val pair = cand.select(col("query_id"), col("cand_id").as("a"),
        col("cv").as("va"))
      .join(cand.select(col("query_id"), col("cand_id").as("b"),
        col("cv").as("vb")), Seq("query_id"))
      .where(col("a") =!= col("b"))
      .withColumn("sim_micro", cosMicro(col("va"), col("vb")))
      .select(col("query_id"), col("a"), col("b"), col("sim_micro"))
      .localCheckpoint() // bounded: nQueries × nCand²
    val bare = cand.select(col("query_id"), col("cand_id"),
      col("rel_micro"))
    val wPick = Window.partitionBy(col("query_id"))
      .orderBy(col("mmr_micro").desc, col("cand_id"))
    // round 1: S is empty, maxsim ≡ 0 — MMR degenerates to argmax rel
    var selected = bare.withColumn("mmr_micro", col("rel_micro") * 7)
      .withColumn("rn", row_number().over(wPick)).where(col("rn") === 1)
      .select(col("query_id"), col("cand_id"), col("rel_micro"),
        lit(1).as("sel_round"), col("mmr_micro"))
      .localCheckpoint()
    for (r <- 2 to k) {
      val maxsim = pair
        .join(selected.select(col("query_id"), col("cand_id").as("b")),
          Seq("query_id", "b"))
        .groupBy(col("query_id"), col("a"))
        .agg(max(col("sim_micro")).as("maxsim_micro"))
      val pick = bare
        .join(selected.select(col("query_id"), col("cand_id")),
          Seq("query_id", "cand_id"), "left_anti")
        .join(maxsim.withColumnRenamed("a", "cand_id"),
          Seq("query_id", "cand_id"))
        .withColumn("mmr_micro",
          col("rel_micro") * 7 - col("maxsim_micro") * 3)
        .withColumn("rn", row_number().over(wPick)).where(col("rn") === 1)
        .select(col("query_id"), col("cand_id"), col("rel_micro"),
          lit(r).as("sel_round"), col("mmr_micro"))
      selected = selected.unionByName(pick).localCheckpoint()
    }
    selected.orderBy(col("query_id"), col("sel_round"))
  }

  /**
   * x81 — JOHNSON–LINDENSTRAUSS RANDOM PROJECTION (Achlioptas 2003
   * database-friendly ±1 variant): 64-dim embeddings sketched to 16 dims
   * through a deterministic md5-derived sign matrix — the cheap
   * dimensionality reduction in front of clustering / dedup / ANN when
   * the full vectors are too wide to shuffle (4× less shuffle bytes here;
   * at 100 TB the projection runs at scan speed and only the sketch moves).
   *
   * Determinism: each input element is frozen ONCE to exact int64
   * micro-units (the 6dp DECIMAL freeze), after which projections and
   * both norm audits are pure integer sums — order-free, so neither
   * engine's aggregation order matters, and overflow-safe (|p_j| ≤
   * 64·|e|·1e6 ≪ 2⁶³). The whole sketch is ONE native
   * [[graft.functions.RademacherSketch]] loop per row (the equivalent
   * 64-column declarative fold blows janino's 64 KB method limit and
   * silently drops to interpreted — measured, hence native); the norm
   * audit (in_normsq vs out_normsq, with E[out] = 16·in for ±1 JL)
   * makes the distortion measurable downstream.
   */
  def randomProjection(spark: SparkSession, dir: String, dIn: Int = 64,
      dOut: Int = 16): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val wide = emb.select(col("vec_id"),
      graft.functions.RademacherSketch.sketch(col("embedding"), dOut)
        .as("sk"))
    wide.select(col("vec_id") +:
        ((0 until dOut).map(j => element_at(col("sk"), j + 1).as(s"p$j")) :+
          element_at(col("sk"), dOut + 1).as("in_normsq")): _*)
      .withColumn("out_normsq",
        (0 until dOut).map(j => col(s"p$j") * col(s"p$j")).reduce(_ + _))
      .orderBy(col("vec_id"))
  }

  /** DuckDB oracle for [[randomProjection]]: the sign matrix is derived
    * IN SQL from the same md5 recipe (not shared as literals), elements
    * get the same 6dp freeze, and everything downstream is integer
    * grouping — order-free on both engines. */
  def randomProjectionOracle(dIn: Int = 64, dOut: Int = 16): String = {
    val pCols = (0 until dOut)
      .map(j => s"CAST(sum(CASE WHEN j = $j THEN pj END) AS BIGINT) AS p$j")
      .mkString(",\n  ")
    s"""WITH s AS (
       |  SELECT i.i, j.j,
       |    CASE WHEN ('0x' || substr(md5('rp:' || i.i || ':' || j.j),
       |      1, 1))::INT < 8 THEN 1 ELSE -1 END AS sgn
       |  FROM (SELECT unnest(range($dIn)) AS i) i,
       |       (SELECT unnest(range($dOut)) AS j) j),
       |m AS MATERIALIZED (
       |  SELECT vec_id, i.i,
       |    CAST(CAST(round(CAST(embedding[CAST(i.i AS INT) + 1] AS DOUBLE),
       |      6) AS DECIMAL(10,6)) * 1000000 AS BIGINT) AS mi
       |  FROM embeddings, (SELECT unnest(range($dIn)) AS i) i),
       |p AS MATERIALIZED (
       |  SELECT m.vec_id, s.j, CAST(sum(s.sgn * m.mi) AS BIGINT) AS pj
       |  FROM m JOIN s ON m.i = s.i GROUP BY 1, 2),
       |norms AS (
       |  SELECT vec_id, CAST(sum(mi * mi) AS BIGINT) AS in_normsq
       |  FROM m GROUP BY 1),
       |wide AS (
       |  SELECT vec_id,
       |  $pCols,
       |  CAST(sum(pj * pj) AS BIGINT) AS out_normsq
       |  FROM p GROUP BY 1)
       |SELECT w.vec_id, ${(0 until dOut).map(j => s"w.p$j").mkString(", ")},
       |  n.in_normsq, w.out_normsq
       |FROM wide w JOIN norms n ON w.vec_id = n.vec_id
       |ORDER BY w.vec_id""".stripMargin
  }

  /** DuckDB oracle for [[mmrRerank]]: the greedy rounds as a generated
    * MATERIALIZED CTE chain (each round references the previous selection
    * three times — without MATERIALIZED DuckDB inlines and the tree grows
    * 3^k, the x75 lesson). */
  def mmrOracle(nQueries: Int = 4, nCand: Int = 20, k: Int = 8): String = {
    def cosM(a: String, b: String): String =
      s"CAST(CAST(round(list_cosine_similarity(CAST($a AS DOUBLE[]), " +
        s"CAST($b AS DOUBLE[])), 6) AS DECIMAL(10,6)) * 1000000 AS BIGINT)"
    val rounds = (2 to k).map { r =>
      s"""sel$r AS MATERIALIZED (
         |  SELECT * FROM sel${r - 1}
         |  UNION ALL
         |  SELECT query_id, cand_id, rel_micro, $r AS sel_round, mmr_micro
         |  FROM (
         |    SELECT c.query_id, c.cand_id, c.rel_micro,
         |      7 * c.rel_micro - 3 * m.maxsim_micro AS mmr_micro,
         |      row_number() OVER (PARTITION BY c.query_id
         |        ORDER BY 7 * c.rel_micro - 3 * m.maxsim_micro DESC,
         |                 c.cand_id) AS rn
         |    FROM cand c
         |    JOIN (SELECT p.query_id, p.a,
         |            max(p.sim_micro) AS maxsim_micro
         |          FROM pair p JOIN sel${r - 1} s
         |            ON p.query_id = s.query_id AND p.b = s.cand_id
         |          GROUP BY p.query_id, p.a) m
         |      ON c.query_id = m.query_id AND c.cand_id = m.a
         |    WHERE NOT EXISTS (SELECT 1 FROM sel${r - 1} s2
         |      WHERE s2.query_id = c.query_id
         |        AND s2.cand_id = c.cand_id))
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
       |           FROM embeddings WHERE vec_id < $nQueries),
       |scored AS MATERIALIZED (
       |  SELECT q.query_id, e.vec_id AS cand_id, e.embedding AS cv,
       |    ${cosM("e.embedding", "q.qv")} AS rel_micro
       |  FROM embeddings e, q WHERE e.vec_id <> q.query_id),
       |cand AS MATERIALIZED (
       |  SELECT query_id, cand_id, cv, rel_micro FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY rel_micro DESC, cand_id) AS rn FROM scored)
       |  WHERE rn <= $nCand),
       |pair AS MATERIALIZED (
       |  SELECT x.query_id, x.cand_id AS a, y.cand_id AS b,
       |    ${cosM("x.cv", "y.cv")} AS sim_micro
       |  FROM cand x JOIN cand y
       |    ON x.query_id = y.query_id AND x.cand_id <> y.cand_id),
       |sel1 AS MATERIALIZED (
       |  SELECT query_id, cand_id, rel_micro, 1 AS sel_round,
       |    7 * rel_micro AS mmr_micro
       |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
       |          ORDER BY 7 * rel_micro DESC, cand_id) AS rn FROM cand)
       |  WHERE rn = 1),
       |$rounds
       |SELECT query_id, cand_id, rel_micro, sel_round, mmr_micro
       |FROM sel$k ORDER BY query_id, sel_round""".stripMargin
  }
}
