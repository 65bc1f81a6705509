package graft

import org.apache.spark.sql.functions._

import graft.ext._

class ExtSpec extends SparkSpec {
  import spark.implicits._

  test("exact dedup: every doc annotated, canonical is group min") {
    val d = Dedup.exactDedup(spark, sf)
    assert(d.count() == 500)
    assert(d.where(col("canonical_id") > col("doc_id")).count() == 0)
    assert(d.where(col("is_canonical") && col("doc_id") =!= col("canonical_id"))
      .count() == 0)
  }

  test("ngram jaccard pairs: ordered, thresholded, symmetric-free") {
    val p = Dedup.ngramJaccardPairs(spark, sf, threshold = 0.1)
    assert(p.where(col("d1") >= col("d2")).count() == 0)
    assert(p.where(col("jaccard") < 0.1 || col("jaccard") > 1.0).count() == 0)
  }

  test("minhash LSH: estimates bounded, identical docs always collide") {
    val p = Dedup.minhashLshPairs(spark, sf)
    assert(p.where(col("est_jaccard") < 0.5 || col("est_jaccard") > 1.0).count() == 0)
    // identical-shingle-set docs (true J=1.0 pairs) MUST be LSH candidates
    // with full signature agreement — minhash of equal sets is equal
    val exact = Dedup.ngramJaccardPairs(spark, sf, threshold = 1.0)
      .select(col("d1"), col("d2"))
    val found = p.where(col("est_jaccard") === 1.0)
      .select(col("d1"), col("d2"))
    assert(exact.except(found).count() == 0)
  }

  test("simhash: 32-bit signatures, cluster sizes consistent") {
    val s = Dedup.simhash(spark, sf)
    assert(s.count() == 500)
    assert(s.where(col("simhash") < 0 || col("simhash") >= (1L << 32)).count() == 0)
    val n = s.agg(sum(lit(1))).as[Long].head()
    assert(n == 500)
  }

  test("brute-force kNN: k per query, descending sims, no self-matches") {
    val k = Similarity.knnBrute(spark, sf, nQueries = 5, k = 3)
    assert(k.where(col("query_id") === col("cand_id")).count() == 0)
    val perQ = k.groupBy(col("query_id")).count()
    assert(perQ.where(col("count") =!= 3).count() == 0)
    // rank order matches sim order
    assert(k.where(col("rn") === 1).count() == 5)
  }

  test("IVF ANN: every result stays in the query's bucket; sims ≤ brute top-1") {
    val ivf = Similarity.annIvf(spark, sf, nCentroids = 4, nQueries = 5, k = 2)
    val brute = Similarity.knnBrute(spark, sf, nQueries = 5, k = 1)
      .select(col("query_id"), col("sim").as("best"))
    val joined = ivf.join(brute, "query_id")
    assert(joined.where(col("sim") > col("best")).count() == 0)
  }

  test("quality + tokens: ratios in range, token counts consistent") {
    val q = TextAnalysis.qualityScore(spark, sf)
    assert(q.where(col("ttr") <= 0 || col("ttr") > 1).count() == 0)
    val t = TextAnalysis.tokenCounts(spark, sf)
    // all-lowercase word corpus: regex segmentation == whitespace tokens
    assert(t.where(col("bpe_ish_tokens") < col("ws_tokens")).count() == 0)
  }

  test("fingerprint: deterministic across runs, rolling hash in field") {
    val f1 = TextAnalysis.fingerprint(spark, sf).collect()
    val f2 = TextAnalysis.fingerprint(spark, sf).collect()
    assert(f1.sameElements(f2))
    assert(f1.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 1000000007L))
  }

  test("native expressions callable from the spark.sql surface") {
    graft.functions.GraftFunctions.register(spark)
    graft.ingest.Tables.load(spark, sf, "embeddings")
      .createOrReplaceTempView("emb")
    val viaSql = spark.sql(
      """SELECT a.vec_id, round(cosine_similarity(a.embedding, b.embedding), 6) AS s
        |FROM emb a JOIN emb b ON b.vec_id = 0 WHERE a.vec_id < 5
        |ORDER BY a.vec_id""".stripMargin).collect()
    val viaApi = {
      val e = graft.ingest.Tables.load(spark, sf, "embeddings")
      val q = e.where(col("vec_id") === 0).select(col("embedding").as("q"))
      e.where(col("vec_id") < 5).crossJoin(q)
        .select(col("vec_id"),
          round(Similarity.cosine(col("embedding"), col("q")), 6).as("s"))
        .orderBy(col("vec_id")).collect()
    }
    assert(viaSql.map(_.getDouble(1)).toSeq == viaApi.map(_.getDouble(1)).toSeq)
    graft.ingest.Tables.load(spark, sf, "documents")
      .createOrReplaceTempView("docs_v")
    val sh = spark.sql(
      "SELECT simhash32(text) AS h, size(word_shingles(text, 3)) AS ns " +
        "FROM docs_v WHERE doc_id = 0").head()
    assert(sh.getLong(0) >= 0 && sh.getInt(1) > 0)
  }

  test("tfidf: k terms per doc, rank follows score") {
    val t = TextAnalysis.tfidfTopTerms(spark, sf, k = 3)
    val perDoc = t.groupBy(col("doc_id")).count()
    assert(perDoc.where(col("count") > 3).count() == 0)
    assert(t.where(col("rk") === 1).count() == 500)
  }

  test("multimodal: metadata real, stub decode deterministic with batch shape") {
    val meta = Multimodal.mediaMetadata(spark, sf)
    val row = meta.where(col("media_id") === 0).head()
    assert(row.getAs[Long]("n_bytes") > 0)
    assert(row.getAs[String]("header_hex").length == 8) // 4 bytes → 8 hex
    val feats = Multimodal.decodeFeatures(spark, sf)
    assert(feats.count() == 500)
    assert(feats.where(col("width") < 16 || col("width") >= 80).count() == 0)
    val again = Multimodal.decodeFeatures(spark, sf).collect()
    assert(feats.collect().sameElements(again))
    // resize stub: deterministic byte downsample, ~1/4 the payload
    import spark.implicits._
    val in = Multimodal.mediaFrame(spark, sf)
      .select(col("media_id"), col("payload")).as[Multimodal.MediaIn]
    val resized = Multimodal.resizeStub(in, factor = 4)
    val (o, r) = (in.head(), Multimodal.resizeStub(in, 4).head())
    assert(r.payload.length == (o.payload.length + 3) / 4)
    assert(resized.count() == in.count())
  }
}
