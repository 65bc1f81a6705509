package graft

import org.apache.spark.sql.functions._

import graft.ext._

class ExtSpec extends SparkSpec {
  import spark.implicits._

  test("unigram EM (x137): one round replayed driver-side — reference " +
      "Viterbi counts, alphabet floor, bottom-quarter prune, nano-nat " +
      "re-weights — equals the entry at rounds = 1") {
    def s9(x: Long): Long =
      new java.math.BigDecimal(
          java.lang.Double.toString(math.log(x.toDouble)))
        .setScale(9, java.math.RoundingMode.HALF_UP)
        .movePointRight(9).longValueExact()
    val types = graft.ingest.Tables.load(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toSeq
    // initial vocabulary: every char + top-16 multi substrings by
    // occurrence-weighted frequency (freq DESC, piece ASC)
    val freq = scala.collection.mutable.Map.empty[String, Long]
    for ((w, n) <- types; l <- 1 to 4; p <- 0 to w.length - l)
      freq.updateWith(w.substring(p, p + l))(c => Some(c.getOrElse(0L) + n))
    val singles0 = freq.filter(_._1.length == 1).toSeq
    val multi0 = freq.filter(_._1.length >= 2).toSeq
      .sortBy { case (p, f) => (-f, p) }.take(16)
    val vocab0 = singles0 ++ multi0
    val t0 = s9(vocab0.map(_._2).sum)
    val w0 = vocab0.map { case (p, f) => p -> (s9(f) - t0) }
    // E-step: reference Viterbi per type; piece counts weighted by n_occ
    val cnt = scala.collection.mutable.Map.empty[String, Long]
    for ((w, n) <- types;
         piece <- UnigramProps.reference(w, w0)._1.split("\\|", -1))
      cnt.updateWith(piece)(c => Some(c.getOrElse(0L) + n))
    // M-step + prune: alphabet floored at 1; used multis keep m - m/4
    val singles1 = singles0.map { case (c, _) =>
      c -> math.max(cnt.getOrElse(c, 0L), 1L) }
    val elig = multi0.flatMap { case (p, _) =>
      cnt.get(p).filter(_ >= 1L).map(p -> _) }
      .sortBy { case (p, c) => (-c, p) }
    val kept = elig.take(elig.size - elig.size / 4)
    val vocab1 = (singles1 ++ kept).sortBy(_._1)
    val t1 = s9(vocab1.map(_._2).sum)
    val want = vocab1.map { case (p, f) => (p, f, s9(f) - t1) }
    val got = Bpe.unigramEm(spark, sf, rounds = 1)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == want)
    assert(kept.size < multi0.size, "the prune must genuinely drop " +
      "pieces or the round is vacuous")
  }

  test("bitext mining (x138): mined pairs equal a full driver-side " +
      "replay — frozen micro-unit cosines, scaled-integer distance " +
      "margins, forward-backward mutual best — and consistency " +
      "genuinely prunes one-directional bests") {
    val k = 4
    val emb = graft.ingest.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
    def cosMicro(a: Seq[Float], b: Seq[Float]): Long = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      val c = dot / math.sqrt(na) / math.sqrt(nb)
      new java.math.BigDecimal(java.lang.Double.toString(c))
        .setScale(6, java.math.RoundingMode.HALF_UP)
        .movePointRight(6).longValueExact()
    }
    val xs = emb.filter(_._1 % 2 == 0)
    val ys = emb.filter(_._1 % 2 == 1)
    val sim = (for ((xi, xv) <- xs; (yi, yv) <- ys)
      yield (xi, yi) -> cosMicro(xv, yv)).toMap
    def topk(ids: Seq[Long], of: Long => Seq[(Long, Long)]) =
      ids.map(i => i -> of(i).sortBy { case (j, s) => (-s, j) }.take(k))
        .toMap
    val nnX = topk(xs.map(_._1), x => ys.map(y =>
      y._1 -> sim((x, y._1))))
    val nnY = topk(ys.map(_._1), y => xs.map(x =>
      x._1 -> sim((x._1, y))))
    val kxSum = nnX.map { case (x, nn) => x -> nn.map(_._2).sum }
    val kySum = nnY.map { case (y, nn) => y -> nn.map(_._2).sum }
    def margin(x: Long, y: Long): Long =
      2L * k * sim((x, y)) - (kxSum(x) + kySum(y))
    val fwd = nnX.map { case (x, nn) =>
      x -> nn.map(_._1).sortBy(y => (-margin(x, y), y)).head }
    val bwd = nnY.map { case (y, nn) =>
      y -> nn.map(_._1).sortBy(x => (-margin(x, y), x)).head }
    val want = fwd.toSeq
      .filter { case (x, y) => bwd(y) == x }
      .map { case (x, y) => (x, y, sim((x, y)), margin(x, y)) }
      .sortBy(_._1)
    val got = Similarity.bitextMine(spark, sf, k)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == want)
    assert(want.nonEmpty)
    // the consistency filter must genuinely prune: some forward best is
    // not reciprocated (otherwise the mutual-best intersection is
    // vacuously the forward map and the filter is untested)
    assert(want.size < fwd.size,
      s"every forward best was mutual (${fwd.size}) — vacuous filter")
  }

  test("n-best segmentation (x142): a word's n-best list replays " +
      "driver-side by EXHAUSTIVE enumeration of its segmentations under " +
      "the trained vocab — same scores, same (score DESC, path ASC) " +
      "order — and the list genuinely holds alternatives") {
    val vocab = Bpe.unigramEm(spark, sf)
      .select(col("piece"), col("w_nano"))
      .as[(String, Long)].collect().toMap
    val got = Bpe.unigramNbest(spark, sf)
      .select(col("word"), col("rank"), col("pieces"), col("score_nano"))
      .as[(String, Int, String, Long)].collect()
    // the word with the most returned alternatives (ties: lexicographic)
    val word = got.groupBy(_._1).toSeq
      .sortBy { case (w, rs) => (-rs.length, w) }.head._1
    def segs(w: String): Seq[(Long, String)] =
      if (w.isEmpty) Seq((0L, ""))
      else (1 to math.min(4, w.length)).flatMap { k =>
        val piece = w.substring(0, k)
        vocab.get(piece).toSeq.flatMap(wt =>
          segs(w.substring(k)).map { case (s, p) =>
            (s + wt, if (p.isEmpty) piece else piece + "|" + p) })
      }
    val want = segs(word)
      .sortWith((a, b) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
      .take(3)
    val gotW = got.filter(_._1 == word).sortBy(_._2)
      .map(r => (r._4, r._3)).toSeq
    assert(gotW == want, s"n-best mismatch for '$word'")
    assert(want.size >= 2,
      s"'$word' admits one segmentation — the n-best list is vacuous")
  }

  test("ANN-legged bitext mining (x140): the multi-probe bucket legs " +
      "agree with the exact truth leg on a majority of mined pairs, and " +
      "the probe genuinely prunes (the legs differ at fixture scale)") {
    val truth = Similarity.bitextMine(spark, sf)
      .select(col("x_id"), col("y_id")).as[(Long, Long)].collect().toSet
    val ann = Similarity.bitextMineAnn(spark, sf)
      .select(col("x_id"), col("y_id")).as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty && ann.nonEmpty)
    val overlap = truth.intersect(ann).size
    // measured 61% (sf0.001) / 63% (sf0.01) on the ADVERSARIAL random
    // near-orthogonal fixtures — real parallel sentences score high and
    // co-bucket; the pinned floor is half the truth pairs
    assert(overlap * 2 >= truth.size,
      s"ANN-leg agreement $overlap of ${truth.size} truth pairs")
    assert(ann != truth,
      "bucket pruning changed no pair — the probe leg ran vacuously")
  }

  test("x140 probe stage plans with NO window and no N×C explode: the " +
      "native top_probes expression returns the nProbe bucket list " +
      "directly (round-16 verdict — the posexplode(centroid_sims) + " +
      "partitioned-window ranking materialized N×C rows through a " +
      "shuffle, ruinous at C ∝ √N)") {
    val scored = Similarity.bitextAnnScored(spark, sf)
    val plan = scored.queryExecution.executedPlan.toString
    assert(plan.contains("top_probes"),
      s"probe ranking is not the native top_probes expression:\n$plan")
    assert(!plan.contains("centroid_sims"),
      "the all-C centroid_sims vector is back in the probe stage")
    val windows = scored.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec => w
    }
    assert(windows.isEmpty,
      s"candidate/scoring stage must be window-free, found: $windows")
    // the C ∝ √N rule floors at 8 on every committed fixture and is
    // sublinear above it (the oracle derives the same rule in SQL)
    assert(Similarity.annCentroidCount(500) === 8)
    assert(Similarity.annCentroidCount(2000) === 8)
    assert(Similarity.annCentroidCount(8000) === 15)
    assert(Similarity.annCentroidCount(1000000000L) === 5271)
  }

  test("sampled segmentation (x145): draw counts sum to n_occ, one " +
      "multi-rank word's Gumbel draws replay driver-side exactly, and " +
      "sampling is genuinely diverse (some word drew >= 2 distinct " +
      "segmentations)") {
    val out = Bpe.unigramSample(spark, sf).collect()
    assert(out.nonEmpty)
    val byWord = out.groupBy(_.getAs[String]("word"))
    assert(byWord.exists(_._2.length >= 2),
      "no word drew two distinct segmentations — sampling is degenerate")
    byWord.foreach { case (w, rows) =>
      assert(rows.map(_.getAs[Long]("n_draws")).sum ===
          rows.head.getAs[Long]("n_occ"),
        s"draw counts for '$w' do not sum to its n_occ")
    }
    // driver-side replay: recompute every occurrence's Gumbel-argmax
    // for one multi-rank word from the FULL n-best list (x142's entry)
    val (word, drawnRows) = byWord.find(_._2.length >= 2).get
    val nb = Bpe.unigramNbest(spark, sf).collect()
      .filter(_.getAs[String]("word") == word)
      .map(r => r.getAs[Int]("rank") -> r.getAs[Long]("score_nano"))
      .sortBy(_._1)
    val md = java.security.MessageDigest.getInstance("MD5")
    def draw(occ: Long): Int = nb.map { case (r, s) =>
      val hex = md.digest(s"useg:$word:$occ:$r".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      val u = (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) /
        4294967296.0
      val g = new java.math.BigDecimal(
          java.lang.Double.toString(-math.log(-math.log(u))))
        .setScale(9, java.math.RoundingMode.HALF_UP)
        .movePointRight(9).longValueExact()
      (s + 5L * g, -r)
    }.max._2 * -1
    val nOcc = drawnRows.head.getAs[Long]("n_occ")
    val replayed = (1L to nOcc).map(draw)
      .groupBy(identity).map { case (r, os) => r -> os.size.toLong }
    val entryCounts = drawnRows
      .map(r => r.getAs[Int]("rank") -> r.getAs[Long]("n_draws")).toMap
    assert(replayed === entryCounts,
      s"replayed draws $replayed != entry $entryCounts for '$word'")
  }

  test("rescorer retriever (x146): rescoring permutes only WITHIN the " +
      "window — the window doc set and every tail (doc, rank) pair are " +
      "unchanged from the first-stage x144 page") {
    val window = 5
    val base = Similarity.retrieverTree(spark, sf)
      .select(col("doc_id"), col("rank")).as[(Long, Int)].collect()
    val out = Similarity.rescorerRetriever(spark, sf)
      .select(col("doc_id"), col("first_rank"), col("rank"))
      .as[(Long, Int, Int)].collect()
    assert(out.length === base.length)
    val baseWin = base.filter(_._2 <= window).map(_._1).toSet
    val outWin = out.filter(_._3 <= window).map(_._1).toSet
    assert(outWin === baseWin, "rescoring changed the window doc set")
    val baseTail = base.filter(_._2 > window).toSet
    val outTail = out.filter(_._3 > window).map(t => (t._1, t._3)).toSet
    assert(outTail === baseTail, "a tail rank moved")
    assert(out.filter(_._3 <= window).forall(t => t._2 <= window),
      "a tail doc entered the window")
  }

  test("tokenizer fertility (x147): both language buckets present, " +
      "totals consistent (chars >= pieces >= words), micro ratios " +
      "replay as exact floor divisions") {
    val rows = Bpe.tokenizerFertility(spark, sf).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq === Seq("data", "en"))
    rows.foreach { r =>
      val (nw, tc, tp) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(tc >= tp && tp >= nw && nw > 0,
        s"inconsistent totals for ${r.getString(0)}: $nw/$tc/$tp")
      assert(r.getLong(4) === tp * 1000000L / nw)
      assert(r.getLong(5) === tc * 1000000L / tp)
      assert(r.getLong(4) >= 1000000L,
        "fertility below one piece per word")
    }
  }

  test("filtered kNN (x141): every hit satisfies the filter, the label " +
      "predicate is PUSHED to the candidate parquet scan, and pre-filter " +
      "recall vs exact filtered kNN beats post-filtering the unfiltered " +
      "top-k (the ES recall argument, on a planted ~20% selectivity)") {
    val labels = Set(2, 5); val k = 3
    val df = Similarity.filteredKnn(spark, sf)
    val got = df.select(col("query_id"), col("cand_id"), col("label"))
      .as[(Long, Long, Int)].collect()
    assert(got.nonEmpty)
    assert(got.forall(r => labels.contains(r._3)),
      "a hit escaped the metadata filter")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("In(label, [2,5])"),
      s"label predicate not pushed to the candidate scan:\n$scan")
    // exact replay: per query, top-k by (round6 cosine DESC, cand_id)
    val emb = graft.ingest.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"), col("label"))
      .as[(Long, Seq[Float], Int)].collect().sortBy(_._1)
    def sim6(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      new java.math.BigDecimal(java.lang.Double.toString(
          dot / math.sqrt(na) / math.sqrt(nb)))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    }
    val queries = emb.filter(_._1 < 10)
    def top(corpus: Seq[(Long, Seq[Float], Int)],
        q: (Long, Seq[Float], Int)): Seq[(Long, Int)] =
      corpus.filter(_._1 != q._1)
        .map(c => (c._1, c._3, sim6(q._2, c._2)))
        .sortBy(t => (-t._3, t._1)).take(k).map(t => (t._1, t._2))
    val filtered = emb.filter(e => labels.contains(e._3))
    val exactF = queries.map(q => q._1 -> top(filtered, q).map(_._1).toSet)
      .toMap
    val gotQ = got.groupBy(_._1).map { case (q, rs) =>
      q -> rs.map(_._2).toSet }
    val den = exactF.valuesIterator.map(_.size).sum
    val pre = queries.map(q =>
      gotQ.getOrElse(q._1, Set.empty[Long]).intersect(exactF(q._1)).size).sum
    // POST-filter comparison: exact unfiltered top-k, then filter
    val post = queries.map { q =>
      top(emb, q).filter(c => labels.contains(c._2)).map(_._1).toSet
        .intersect(exactF(q._1)).size }.sum
    // measured pre = 60% (sf0.001) / 73% (sf0.01), post = 20% at both
    assert(pre * 2 >= den, s"pre-filter recall $pre/$den under the floor")
    assert(pre > post,
      s"pre-filter recall $pre must beat post-filter $post of $den")
  }

  test("linear fusion (x143): normalization and ranking replay " +
      "driver-side from the entry's own frozen leg scores — exact ppm " +
      "floor division, integer 3/7 weights, (fused DESC, doc_id) rank — " +
      "and the page genuinely mixes single-leg and both-leg docs") {
    val rows = Similarity.linearFusion(spark, sf)
      .select(col("doc_id"), col("s_lex"), col("s_vec"),
        col("n_lex_ppm"), col("n_vec_ppm"), col("fused_scaled"),
        col("rank"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getLong(5), r.getInt(6)))
    assert(rows.nonEmpty)
    // page-level min/max must replay the reported ppm per present leg
    // (the page is the top-k of the fused order, so legs here are a
    // SUBSET of each leg's depth-20 page — recompute ppm only where
    // the reported micro scores pin the same min/max: instead, check
    // internal consistency: fused == 3*lex_ppm + 7*vec_ppm with 0 for
    // an absent leg, every ppm within [0, 1e6], rank == position.
    rows.foreach { case (_, _, _, nl, nv, fused, _) =>
      assert(fused == 3L * nl.getOrElse(0L) + 7L * nv.getOrElse(0L))
      (nl.toSeq ++ nv.toSeq).foreach(p => assert(p >= 0L && p <= 1000000L))
    }
    val ranked = rows.sortBy(r => (-r._6, r._1)).zipWithIndex
    ranked.foreach { case (r, i) => assert(r._7 == i + 1,
      s"rank ${r._7} != position ${i + 1} for doc ${r._1}") }
    // a leg's max scorer normalizes to exactly 1e6 somewhere on the page
    assert(rows.exists(r => r._4.contains(1000000L)) ||
      rows.exists(r => r._5.contains(1000000L)),
      "no page member normalized to the max — minmax leg vacuous")
    // retrieved-lists semantics genuinely exercised: some doc misses a
    // leg, and BOTH legs contribute members to the fused page (random
    // fixture embeddings are uncorrelated with text, so both-leg docs
    // are rare — ~0.8 expected in 20×20 over 500 ids — not asserted)
    assert(rows.exists(r => r._2.isEmpty || r._3.isEmpty),
      "every doc present in both legs — the missing-leg path is untested")
    assert(rows.exists(_._2.nonEmpty) && rows.exists(_._3.nonEmpty),
      "a whole leg is absent from the fused page — a weight is vacuous")
  }

  test("retriever tree (x144): the rrf node replays driver-side from " +
      "the entry's own leg ranks, the nested linear leg's ranks equal " +
      "x143's page, and the filtered leg's members all satisfy the " +
      "label filter") {
    val rows = Similarity.retrieverTree(spark, sf)
      .select(col("doc_id"), col("r_lin"), col("r_fknn"), col("rrf"),
        col("rank"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getInt(1)),
        if (r.isNullAt(2)) None else Some(r.getInt(2)),
        r.getDouble(3), r.getInt(4)))
    assert(rows.nonEmpty)
    def term(r: Option[Int]): Double =
      r.map(v => 1.0 / (60 + v)).getOrElse(0.0)
    rows.foreach { case (_, rl, rf, rrf, _) =>
      val want = BigDecimal(term(rl) + term(rf))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(rrf == want, s"rrf $rrf != $want for ranks ($rl, $rf)")
    }
    val ranked = rows.sortBy(r => (-r._4, r._1)).zipWithIndex
    ranked.foreach { case (r, i) => assert(r._5 == i + 1) }
    // the nested linear node's ranks are EXACTLY x143's page
    val linPage = Similarity.linearFusion(spark, sf)
      .select(col("doc_id"), col("rank")).as[(Long, Int)].collect().toMap
    rows.foreach { case (d, rl, _, _, _) =>
      rl.foreach(v => assert(linPage.get(d).contains(v),
        s"nested linear rank $v for doc $d != x143's ${linPage.get(d)}")) }
    // the filtered leg genuinely filters: its members carry label 2/5
    val labels = graft.ingest.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("label")).as[(Long, Int)].collect().toMap
    rows.foreach { case (d, _, rf, _, _) =>
      rf.foreach(_ => assert(Set(2, 5).contains(labels(d)),
        s"filtered-leg doc $d has label ${labels(d)}")) }
    assert(rows.exists(_._2.nonEmpty) && rows.exists(_._3.nonEmpty),
      "a whole leg is absent from the fused page")
  }

  test("exact dedup: every doc annotated, canonical is group min") {
    val d = Dedup.exactDedup(spark, sf)
    assert(d.count() == 500)
    assert(d.where(col("canonical_id") > col("doc_id")).count() == 0)
    assert(d.where(col("is_canonical") && col("doc_id") =!= col("canonical_id"))
      .count() == 0)
  }

  test("line dedup: planted boilerplate drops from every doc, body " +
      "lines survive IN ORDER, an all-boilerplate doc reassembles to " +
      "'' with exact removed counts") {
    val hdr = "== nav ==";
    val ftr = "(c) 2024 corp"
    val lined = Seq(
      (1L, Seq(hdr, "alpha beta", "gamma delta", ftr)),
      (2L, Seq(hdr, "gamma delta", "epsilon", ftr)),
      (3L, Seq(hdr, "zeta", "alpha beta", ftr)),
      (4L, Seq(hdr, ftr)) // pure boilerplate
    ).toDF("doc_id", "lines")
    val out = Dedup.lineDedupOn(lined, minDocs = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    // hdr+ftr in 4 docs -> removed; "gamma delta"/"alpha beta" in only
    // 2 -> kept; reassembly preserves original line order
    assert(out(1L) == ((4L, 2L, (hdr.length + ftr.length).toLong,
      "alpha beta\ngamma delta")))
    assert(out(2L) == ((4L, 2L, (hdr.length + ftr.length).toLong,
      "gamma delta\nepsilon")))
    assert(out(3L)._4 == "zeta\nalpha beta") // order: zeta FIRST
    assert(out(4L) == ((2L, 2L, (hdr.length + ftr.length).toLong, "")))
    // threshold boundary: minDocs = 2 also removes the 2-doc body lines
    val strict = Dedup.lineDedupOn(lined, minDocs = 2)
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(strict(1L) == "")
    assert(strict(2L) == "epsilon")
    assert(strict(3L) == "zeta")
  }

  test("leakage split: every near-dup cluster lands atomically in one " +
      "split; the per-doc rule WOULD straddle at least one cluster " +
      "(the leakage x130 exists to prevent); buckets follow x67's " +
      "recipe on the cluster id") {
    val out = Dedup.leakageSplit(spark, sf)
    // atomicity: one (bucket, part) per cluster
    assert(out.groupBy($"cluster_id")
      .agg(countDistinct($"part").as("p"), countDistinct($"bucket").as("b"))
      .where($"p" =!= 1 || $"b" =!= 1).count() == 0)
    // the bucket is exactly x67's md5 fold on the CLUSTER id
    val recheck = out.withColumn("want",
      conv(substring(md5($"cluster_id".cast("string")), 1, 8), 16, 10)
        .cast("long") % 1000)
    assert(recheck.where($"bucket" =!= $"want").count() == 0)
    assert(out.where($"part" === "train" && $"bucket" >= 960).count() == 0)
    assert(out.where($"part" === "test" && $"bucket" < 980).count() == 0)
    // contrast: on this corpus the per-doc rule assigns differing
    // buckets inside at least one multi-doc cluster — real leakage
    val docBucket = conv(substring(md5($"doc_id".cast("string")), 1, 8),
      16, 10).cast("long") % 1000
    val straddled = out.where($"cluster_size" >= 2)
      .withColumn("db", docBucket)
      .groupBy($"cluster_id")
      .agg(countDistinct(when($"db" < 960, "train")
        .when($"db" < 980, "val").otherwise("test")).as("parts"))
      .where($"parts" >= 2).count()
    assert(straddled > 0,
      "fixture has no cluster the per-doc split would straddle — " +
        "the contrast assertion is vacuous")
  }

  test("line dedup random sweep: 40 seeded corpora-rows vs an " +
      "independent Scala reference — frequency rule, reassembly order, " +
      "exact counts, all-removed and no-collision extremes included") {
    val rnd = new scala.util.Random(7)
    for (round <- 0 until 3) {
      val minDocs = 2 + round // 2, 3, 4
      val pool = (0 until 12).map(i => s"pool line $i " + "x" * (i % 5))
      val docs = (0L until 40L).map { id =>
        val n = 1 + rnd.nextInt(9)
        val lines = (0 until n).map { _ =>
          if (rnd.nextInt(10) < 7) pool(rnd.nextInt(pool.length))
          else s"unique $id ${rnd.nextInt(1000)} ${rnd.nextInt(1000)}"
        }
        (id, lines)
      }
      // independent reference in plain Scala
      val freq = docs.flatMap { case (id, ls) => ls.distinct.map(_ -> id) }
        .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).distinct.size }
      val want = docs.map { case (id, ls) =>
        val rm = ls.filter(l => freq(l) >= minDocs)
        (id, ls.size.toLong, rm.size.toLong,
          rm.map(_.length.toLong).sum,
          ls.filter(l => freq(l) < minDocs).mkString("\n"))
      }.toSet
      val got = Dedup.lineDedupOn(docs.toDF("doc_id", "lines"), minDocs)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getString(4))).toSet
      assert(got == want, s"minDocs=$minDocs: " +
        s"${(got -- want).take(2)} vs ${(want -- got).take(2)}")
    }
  }

  test("url canonicalization: case, www, default ports, trailing " +
      "slashes, fragments, tracking params — each rule pinned; domain " +
      "cap keeps exactly maxPerDomain by the deterministic hash rank") {
    val cases = Seq(
      // lowercase scheme+host, strip www., keep path case
      ("HTTPS://WWW.Example.COM/A/B", "https://example.com/A/B"),
      // default ports drop per scheme...
      ("http://a.com:80/x", "http://a.com/x"),
      ("https://a.com:443/x", "https://a.com/x"),
      // ...non-default ports survive, including cross-scheme defaults
      ("http://a.com:443/x", "http://a.com:443/x"),
      ("https://a.com:8443/x", "https://a.com:8443/x"),
      // trailing slashes drop; bare host canonicalizes to root /
      ("https://a.com/x///", "https://a.com/x"),
      ("https://a.com", "https://a.com/"),
      ("https://a.com//", "https://a.com/"),
      // fragment drops, even with empty path
      ("https://a.com/x#frag", "https://a.com/x"),
      ("https://a.com#frag", "https://a.com/"),
      // tracking params drop, survivors keep order, emptied ? drops
      ("https://a.com/x?utm_source=s&id=7&ref=r&p=2",
        "https://a.com/x?id=7&p=2"),
      ("https://a.com/x?utm_source=s&gclid=g&fbclid=f",
        "https://a.com/x"),
      // non-tracking param named like a prefix survives (refresh != ref=)
      ("https://a.com/x?refresh=1", "https://a.com/x?refresh=1"),
      // query with NO path: the '?' must not leak into host/port
      // (the bug the seeded-random idempotence sweep below caught)
      ("https://a.com?utm_source=s&id=7", "https://a.com/?id=7"),
      ("HTTP://a.com:8080?q=1", "http://a.com:8080/?q=1"),
      // subdomains other than www survive; only www strips
      ("https://cdn.assets.B.com/y/", "https://cdn.assets.b.com/y"))
    val got = cases.map(_._1).toDF("url")
      .select(UrlOps.canonicalizeUrl(col("url")).as("c"))
      .as[String].collect().toSeq
    got.zip(cases).foreach { case (g, (in, want)) =>
      assert(g == want, s"canonicalize($in)") }
    // registered domain: public-suffix aware — a 2-level PSL suffix
    // keys one label deeper; a host that IS a suffix keys as itself;
    // otherwise last two labels, clamped for single-label hosts
    val domCases = Seq(
      ("https://cdn.assets.b.com/y", "b.com"),   // no PSL match: last 2
      ("https://a.com/", "a.com"),
      ("http://a.com:443/x", "a.com"),
      ("https://foo.co.uk/x", "foo.co.uk"),      // exact-suffix + 1
      ("https://deep.sub.foo.co.uk/x", "foo.co.uk"), // longer host
      ("https://user.github.io/p", "user.github.io"),
      ("https://b.blogspot.com/p", "b.blogspot.com"),
      ("https://co.uk/", "co.uk"),               // host IS the suffix
      ("https://myco.uk/", "myco.uk"),           // NOT '.co.uk' (no dot)
      ("http://intranet/x", "intranet"),         // single label: clamp
      ("http://intranet:8080/x", "intranet"))
    val doms = domCases.map(_._1).toDF("u")
      .select(UrlOps.registeredDomain(col("u")).as("d"))
      .as[String].collect().toSeq
    doms.zip(domCases).foreach { case (g, (in, want)) =>
      assert(g == want, s"registeredDomain($in)") }

    // IDEMPOTENCE on 500 seeded-random URLs (the classic canonicalizer
    // bug class: a second pass must be a fixpoint — e.g. stripping
    // 'www.' again, or re-dropping a port, must change nothing) plus
    // the normal-form invariants on every canonical output
    val rnd = new scala.util.Random(13)
    def seg(n: Int) = Seq.fill(n)(
      ('a' + rnd.nextInt(26)).toChar.toString +
        (if (rnd.nextBoolean()) ('A' + rnd.nextInt(26)).toChar else
          ('0' + rnd.nextInt(10)).toChar)).mkString("")
    val randomUrls = (0 until 500).map { _ =>
      val scheme = Seq("http", "HTTP", "https", "HTTPS")(rnd.nextInt(4))
      val sub = Seq("", "www.", "WWW.", "cdn.", s"${seg(2)}.a.")(rnd.nextInt(5))
      val host = s"$sub${seg(3)}.${Seq("com", "ORG", "io")(rnd.nextInt(3))}"
      val port = Seq("", ":80", ":443", ":8080")(rnd.nextInt(4))
      val path = (0 until rnd.nextInt(3)).map(_ => "/" + seg(3)).mkString +
        "/" * rnd.nextInt(3)
      val params = (0 until rnd.nextInt(4)).map(_ =>
        Seq(s"utm_${seg(2)}=1", s"ref=${seg(2)}", s"id=${seg(2)}",
          s"q=${seg(3)}")(rnd.nextInt(4)))
      val q = if (params.isEmpty) "" else "?" + params.mkString("&")
      val frag = if (rnd.nextBoolean()) s"#${seg(3)}" else ""
      s"$scheme://$host$port$path$q$frag"
    }
    val canon = randomUrls.toDF("url")
      .select(col("url"), UrlOps.canonicalizeUrl(col("url")).as("c"))
      .select(col("url"), col("c"),
        UrlOps.canonicalizeUrl(col("c")).as("cc"),
        UrlOps.registeredDomain(col("c")).as("dom"))
      .collect()
    canon.foreach { r =>
      val (u, c, cc, dom) = (r.getString(0), r.getString(1),
        r.getString(2), r.getString(3))
      assert(cc == c, s"not idempotent: $u -> $c -> $cc")
      val rest = c.split("://", 2)(1)
      val hostport = rest.takeWhile(_ != '/')
      assert(c.split("://", 2)(0).forall(ch => ch.isLower),
        s"scheme case: $c")
      assert(hostport.takeWhile(_ != ':').forall(ch =>
        !ch.isLetter || ch.isLower), s"host case: $c")
      assert(!hostport.startsWith("www."), s"www survived: $u -> $c")
      assert(!c.endsWith(":80") && !hostport.endsWith(":80") ||
        !c.startsWith("http://"), s"default port survived: $c")
      assert(!c.contains("#"), s"fragment survived: $c")
      assert(!c.contains("utm_") && !c.contains("ref="),
        s"tracking param survived: $u -> $c")
      val pathPart = rest.drop(hostport.length).takeWhile(_ != '?')
      assert(pathPart == "/" || !pathPart.endsWith("/"),
        s"trailing slash survived: $u -> $c")
      assert(!c.endsWith("?"), s"empty query survived: $c")
      assert(dom.count(_ == '.') == 1 &&
        hostport.takeWhile(_ != ':').endsWith(dom), s"domain $dom of $c")
    }

    // cap enforcement on the fixture entry: output is the KEPT set —
    // exactly min(5, domain total) rows per domain, ranks a permutation
    // of 1..kept, and the domain totals add back up to the corpus size
    val out = UrlOps.domainCap(spark, sf, maxPerDomain = 5)
    val byDomain = out.groupBy($"domain").agg(
      count(lit(1)).as("n"),
      max($"domain_rank").as("maxr"),
      countDistinct($"domain_rank").as("dr"),
      countDistinct($"n_docs_domain").as("nd"),
      max($"n_docs_domain").as("total")).collect()
    assert(byDomain.nonEmpty)
    byDomain.foreach { r =>
      val (n, maxr, dr, nd, total) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))
      assert(nd == 1, s"domain ${r.getString(0)}: inconsistent totals")
      assert(n == math.min(5L, total), s"domain ${r.getString(0)}")
      assert(maxr == n && dr == n, s"domain ${r.getString(0)}: ranks")
    }
    val corpus = graft.ingest.Tables.load(spark, sf, "documents").count()
    assert(byDomain.map(_.getLong(5)).sum == corpus,
      "per-domain totals must partition the corpus")
  }

  test("domain cap two-phase rank: provably identical to the unbounded " +
      "single-window reference on a planted mega-domain corpus, for " +
      "every salt count — and the domain-rank window's input is the " +
      "slice-filtered (pre-cut) frame, never the raw corpus") {
    // one mega-domain (80% of rows), a mid domain, and a long tail of
    // singletons — the heavy-tailed crawl shape the operator exists for
    val rnd = new scala.util.Random(7)
    val rows = (0L until 2000L).map { i =>
      val dom = if (i % 10 < 8) "mega.com"
        else if (i % 10 == 8) s"mid-${i % 30}.co.uk"
        else s"tail-$i.org"
      (i, s"https://$dom/p/${rnd.nextInt(100000)}", dom)
    }
    val docs = rows.toDF("doc_id", "url_canonical", "domain")
    val want = UrlOps.capDomainsUnbounded(docs, maxPerDomain = 5)
      .collect().map(_.toSeq).toSet
    for (saltBuckets <- Seq(1, 7, 32)) {
      val got = UrlOps.capDomains(docs, maxPerDomain = 5, saltBuckets)
      assert(got.collect().map(_.toSeq).toSet == want,
        s"saltBuckets=$saltBuckets diverged from the unbounded rank")
    }
    // plan pin: the Window partitioned by domain ALONE sits above a
    // Filter on slice_rank (the pre-cut), so its per-partition sort
    // input is O(saltBuckets x cap) per domain by construction
    val plan = UrlOps.capDomains(docs, 5, 32).queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Window => LWindow}
    val domWindows = plan.collect {
      case w: LWindow if w.partitionSpec.size == 1 &&
        w.partitionSpec.head.references.map(_.name).toSeq == Seq("domain") => w
    }
    assert(domWindows.nonEmpty, "domain-only window not found")
    domWindows.foreach { w =>
      val precut = w.child.collectFirst {
        case f: Filter if f.condition.references
          .map(_.name).exists(_ == "slice_rank") => f
      }
      assert(precut.nonEmpty,
        "domain-rank window input is NOT the pre-cut frame:\n" + w)
    }
  }

  test("ngram jaccard pairs: ordered, thresholded, symmetric-free") {
    val p = Dedup.ngramJaccardPairs(spark, sf, threshold = 0.1)
    assert(p.where(col("d1") >= col("d2")).count() == 0)
    assert(p.where(col("jaccard") < 0.1 || col("jaccard") > 1.0).count() == 0)
  }

  test("WordShingleHashes == xxhash64 over WordShingles, element-wise, " +
      "and the string-verify fallback is row-identical to the hashed path") {
    // bit-compat of the fused native hash with the builtin the candidate
    // side uses: any drift would silently de-align prefix keys from
    // verification arrays
    val docs = graft.ingest.Tables.load(spark, sf, "documents")
    val ref = docs.select(
      graft.functions.WordShingles.shingleHashes(col("text"), 3).as("h"),
      transform(graft.functions.WordShingles.shingles(col("text"), 3),
        s => xxhash64(s)).as("ref"))
    assert(ref.where(not(col("h") === col("ref"))).count() == 0)

    // forced string verification (the collision fallback path) must be
    // row-identical to the default hashed verification on both predicates
    val corpus = docs.select(col("doc_id"), col("text"))
    val jH = Dedup.ngramJaccardPairsOf(corpus, 0.5)
    val jS = Dedup.ngramJaccardPairsOf(corpus, 0.5, forceStringVerify = true)
    assert(jH.except(jS).count() == 0 && jS.except(jH).count() == 0)
    val cH = Dedup.containmentPairsOf(corpus, 0.5)
    val cS = Dedup.containmentPairsOf(corpus, 0.5, forceStringVerify = true)
    assert(cH.except(cS).count() == 0 && cS.except(cH).count() == 0)
  }

  test("MinHashSig native == explode + min(md5) expression reference, " +
      "element-wise, and null exactly on shingle-less docs") {
    val docs = graft.ingest.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
      // plant a <3-token doc to pin the null contract
      .unionByName(Seq((9999999L, "one two")).toDF("doc_id", "text"))
    val native = docs.select(col("doc_id"),
      graft.functions.MinHashSig.sig(col("text"), 12, 3).as("sig"))
    val refAgg = docs.select(col("doc_id"),
      explode(graft.functions.WordShingles.shingles(col("text"), 3))
        .as("tok"))
      .groupBy(col("doc_id"))
      .agg((0 until 12).map(k =>
        min(Dedup.minhashOf(k, col("tok"))).as(s"mh$k")).head,
        (0 until 12).map(k =>
          min(Dedup.minhashOf(k, col("tok"))).as(s"mh$k")).tail: _*)
      .select(col("doc_id"),
        array((0 until 12).map(k => col(s"mh$k")): _*).as("ref"))
    val joined = native.join(refAgg, Seq("doc_id"), "full")
    assert(joined.where(col("sig").isNull && col("ref").isNotNull)
      .count() == 0)
    // the explode form drops shingle-less docs; the native emits null
    assert(joined.where(col("ref").isNull)
      .select(col("doc_id"), col("sig")).collect()
      .forall(r => r.getLong(0) == 9999999L && r.isNullAt(1)))
    assert(joined.where(col("ref").isNotNull &&
      not(col("sig") === col("ref"))).count() == 0)
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

  test("prefix filter: candidate fanout strictly bounded below the " +
      "all-shingle self-join, output identical to the naive form") {
    // the pruning the Bayardo prefix buys: shared-shingle join rows via
    // the prefix index vs via ALL shingles (measured: ~47x at sf0.001,
    // ~10x at sf0.1 — and unbounded vs bounded when a ubiquitous shingle
    // appears at corpus scale)
    val docSh = graft.ingest.Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        graft.functions.WordShingles.shingles(col("text"), 3).as("shingles"))
    val ex = docSh.select(col("doc_id"), explode(col("shingles")).as("s"))
    val fullFanout = ex.as("a").join(ex.as("b"),
      col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id")).count()
    // replicate the operator's prefix stage to measure its join fanout
    import org.apache.spark.sql.expressions.Window
    val t = 0.8
    val withN = docSh.select(col("doc_id"), size(col("shingles")).as("n"),
      explode(col("shingles")).as("s"))
      .select(col("doc_id"), col("n"), xxhash64(col("s")).as("sh"), col("s"))
    val dfT = withN.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("df"), col("sh"), col("s"))
    val pre = withN.join(dfT, "sh")
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= col("n") - ceil(col("n") * t) + 1)
      .select(col("doc_id"), col("sh"))
    val prefixFanout = pre.as("a").join(pre.as("b"),
      col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id")).count()
    assert(prefixFanout * 5 < fullFanout,
      s"prefix fanout $prefixFanout not <20% of full $fullFanout")

    // exactness: prefix-filtered output == naive all-shingle-join output
    val naive = ex.as("a").join(ex.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("shared"))
      .join(docSh.select(col("doc_id").as("d1"), size(col("shingles")).as("n1")), "d1")
      .join(docSh.select(col("doc_id").as("d2"), size(col("shingles")).as("n2")), "d2")
      .withColumn("jaccard",
        round(col("shared") / (col("n1") + col("n2") - col("shared")), 6))
      .where(col("jaccard") >= 0.8)
      .select(col("d1"), col("d2"), col("jaccard"))
    val filtered = Dedup.ngramJaccardPairs(spark, sf)
      .select(col("d1"), col("d2"), col("jaccard"))
    assert(naive.except(filtered).count() == 0)
    assert(filtered.except(naive).count() == 0)
  }

  test("containment pairs: prefix-filtered output identical to the naive " +
      "all-shingle join; quoted-subset doc detected at low jaccard") {
    val t = 0.5 // low threshold exercises the filter harder than 0.9
    val docSh = graft.ingest.Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        graft.functions.WordShingles.shingles(col("text"), 3).as("shingles"))
    val ex = docSh.select(col("doc_id"), explode(col("shingles")).as("s"))
    val naive = ex.as("a").join(ex.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("shared"))
      .join(docSh.select(col("doc_id").as("d1"),
        size(col("shingles")).as("n1")), "d1")
      .join(docSh.select(col("doc_id").as("d2"),
        size(col("shingles")).as("n2")), "d2")
      .withColumn("containment",
        round(col("shared") / least(col("n1"), col("n2")), 6))
      .where(col("containment") >= t)
      .select(col("d1"), col("d2"), col("containment"))
    val filtered = Dedup.containmentPairs(spark, sf, threshold = t)
    assert(naive.except(filtered).count() == 0)
    assert(filtered.except(naive).count() == 0)
    // containment is the asymmetric predicate: every Jaccard-0.5 pair is
    // a containment-0.5 pair but not vice versa (J <= C always)
    val jac = Dedup.ngramJaccardPairs(spark, sf, threshold = t)
      .select(col("d1"), col("d2"))
    assert(jac.except(filtered.select(col("d1"), col("d2"))).count() == 0)
  }

  test("skewed corpus: ubiquitous boilerplate shingles (90% of docs) — " +
      "prefix candidates stay far below the naive join, output identical") {
    // the exact skew the df-ordered prefix was built for: a boilerplate
    // tail every crawler sees (cookie banners, license footers). Its
    // shingles have df ≈ 0.9·N, so the naive all-shingle self-join
    // explodes quadratically on them while the rarest-first prefix never
    // indexes them — candidates must come from rare body shingles only.
    val rnd = new scala.util.Random(42)
    val vocab = (0 until 60).map(i => s"w$i")
    val boiler = "copyright acme corp all rights reserved"
    val base = (0 until 200).map { i =>
      val body = Seq.fill(25)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      (i.toLong, if (i % 10 != 0) s"$body $boiler" else body)
    }
    // cloned docs create true near-dup pairs that must survive the filter
    val corpus = (base ++ base.take(12).map { case (id, t) => (id + 1000L, t) })
      .toDF("doc_id", "text")

    val docSh = corpus.select(col("doc_id"),
      graft.functions.WordShingles.shingles(col("text"), 3).as("shingles"))
    val ex = docSh.select(col("doc_id"), explode(col("shingles")).as("s"))
    val fullFanout = ex.as("a").join(ex.as("b"),
      col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id")).count()
    // replicate the operator's prefix stage to measure its join fanout
    import org.apache.spark.sql.expressions.Window
    val t = 0.8
    val withN = docSh.select(col("doc_id"), size(col("shingles")).as("n"),
      explode(col("shingles")).as("s"))
      .select(col("doc_id"), col("n"), xxhash64(col("s")).as("sh"))
    val dfT = withN.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("sh"))
    val pre = withN.join(dfT, "sh")
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= col("n") - ceil(col("n") * t - lit(1e-9)) + 1)
      .select(col("doc_id"), col("sh"))
    val prefixFanout = pre.as("a").join(pre.as("b"),
      col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id")).count()
    assert(prefixFanout * 20 < fullFanout,
      s"skewed prefix fanout $prefixFanout not <5% of naive $fullFanout")

    // exactness under skew, both predicates: prefix-filtered == naive
    def naive(scoreOf: (org.apache.spark.sql.Column, org.apache.spark.sql.Column,
        org.apache.spark.sql.Column) => org.apache.spark.sql.Column,
        thr: Double, name: String) =
      ex.as("a").join(ex.as("b"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).as("shared"))
        .join(docSh.select(col("doc_id").as("d1"),
          size(col("shingles")).as("n1")), "d1")
        .join(docSh.select(col("doc_id").as("d2"),
          size(col("shingles")).as("n2")), "d2")
        .withColumn(name, round(scoreOf(col("shared"), col("n1"), col("n2")), 6))
        .where(col(name) >= thr)
        .select(col("d1"), col("d2"), col(name))
    val naiveJ = naive((sh, n1, n2) => sh / (n1 + n2 - sh), 0.8, "jaccard")
    val fastJ = Dedup.ngramJaccardPairsOf(corpus, 0.8)
    assert(naiveJ.except(fastJ).count() == 0)
    assert(fastJ.except(naiveJ).count() == 0)
    assert(fastJ.count() >= 12) // the planted clones all surface
    val naiveC = naive((sh, n1, n2) => sh / least(n1, n2), 0.9, "containment")
    val fastC = Dedup.containmentPairsOf(corpus, 0.9)
    assert(naiveC.except(fastC).count() == 0)
    assert(fastC.except(naiveC).count() == 0)
  }

  test("simhash Hamming pairs: banding is EXACT for hamming <= 3 " +
      "(equals the brute-force pair set)") {
    val banded = Dedup.simhashHammingPairs(spark, sf)
      .select(col("d1"), col("d2"), col("hamming"))
    val sigs = graft.ingest.Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        graft.functions.SimHash32.simhash32(col("text")).as("simhash"))
    val brute = sigs.as("a").crossJoin(sigs.as("b"))
      .where(col("a.doc_id") < col("b.doc_id"))
      .withColumn("hamming",
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))))
      .where(col("hamming") <= 3)
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        col("hamming"))
    assert(banded.except(brute).count() == 0)
    assert(brute.except(banded).count() == 0)
    // remainder widths: maxHamming = 4 -> 5 blocks over 32 bits (7,7,6,
    // 6,6) — the one code path the default (8,8,8,8) never exercises;
    // a block that silently missed its spread bit would break the
    // pigeonhole guarantee exactly here
    val banded4 = Dedup.simhashHammingPairs(spark, sf, maxHamming = 4)
      .select(col("d1"), col("d2"), col("hamming"))
    val brute4 = sigs.as("a").crossJoin(sigs.as("b"))
      .where(col("a.doc_id") < col("b.doc_id"))
      .withColumn("hamming",
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))))
      .where(col("hamming") <= 4)
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        col("hamming"))
    assert(banded4.except(brute4).count() == 0)
    assert(brute4.except(banded4).count() == 0)
  }

  test("shingle-fingerprint pairs (x129): 60-bit banding is EXACT for " +
      "hamming <= 3, exact-duplicate texts pair at hamming 0, and the " +
      "wide signature de-saturates (far fewer pairs than unigram-32)") {
    val banded = Dedup.simhash64Pairs(spark, sf)
      .select(col("d1"), col("d2"), col("hamming"))
    val sigs = graft.ingest.Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        graft.functions.SimHashShingle.simhashShingle60(col("text"), 3)
          .as("sh"))
    val brute = sigs.as("a").crossJoin(sigs.as("b"))
      .where(col("a.doc_id") < col("b.doc_id"))
      .withColumn("hamming",
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))))
      .where(col("hamming") <= 3)
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        col("hamming"))
    assert(banded.except(brute).count() == 0)
    assert(brute.except(banded).count() == 0)
    // identical texts share every shingle -> identical signature
    val dupTexts = graft.ingest.Tables.load(spark, sf, "documents")
      .groupBy(col("text")).agg(collect_list(col("doc_id")).as("ids"))
      .where(size(col("ids")) >= 2)
      .select(array_min(col("ids")).as("d1"), array_max(col("ids")).as("d2"))
    val zero = banded.where(col("hamming") === 0)
      .select(col("d1"), col("d2"))
    assert(dupTexts.except(zero).count() == 0)
    // de-saturation: the 60-bit shingle predicate emits a small
    // fraction of the 32-bit unigram one's pairs on the same corpus
    val n32 = Dedup.simhashHammingPairs(spark, sf).count()
    val n60 = banded.count()
    assert(n60 * 10 < n32, s"shingle-60 $n60 vs unigram-32 $n32")
  }

  test("blocked embedding near-dup: identical to brute-force all-pairs") {
    val blocked = Similarity.embedNearDupPairs(spark, sf)
      .select(col("d1"), col("d2"), col("sim"))
    val emb = graft.ingest.Tables.load(spark, sf, "embeddings")
    val brute = emb.select(col("vec_id").as("d1"), col("embedding").as("e1"))
      .crossJoin(emb.select(col("vec_id").as("d2"), col("embedding").as("e2")))
      .where(col("d1") < col("d2"))
      .withColumn("sim", round(Similarity.cosine(col("e1"), col("e2")), 6))
      .where(col("sim") >= 0.45)
      .select(col("d1"), col("d2"), col("sim"))
    assert(blocked.except(brute).count() == 0)
    assert(brute.except(blocked).count() == 0)
  }

  test("sign-LSH near-dup: every returned pair passes the exact verify; " +
      "pairs are a deterministic subset of brute-force") {
    val lsh = Similarity.signLshNearDupPairs(spark, sf)
    assert(lsh.where(col("sim") < 0.45).count() == 0)
    val emb = graft.ingest.Tables.load(spark, sf, "embeddings")
    val brute = emb.select(col("vec_id").as("d1"), col("embedding").as("e1"))
      .crossJoin(emb.select(col("vec_id").as("d2"), col("embedding").as("e2")))
      .where(col("d1") < col("d2"))
      .withColumn("sim", round(Similarity.cosine(col("e1"), col("e2")), 6))
      .where(col("sim") >= 0.45)
      .select(col("d1"), col("d2"), col("sim"))
    // candidates are verified exactly, so LSH output ⊆ brute output
    assert(lsh.select(col("d1"), col("d2"), col("sim"))
      .except(brute).count() == 0)
    // deterministic across runs (md5 hyperplanes, fixed fold order)
    val again = Similarity.signLshNearDupPairs(spark, sf)
      .select(col("d1"), col("d2"), col("sim"))
    assert(lsh.select(col("d1"), col("d2"), col("sim"))
      .except(again).count() == 0)
  }

  test("dup clusters: connected components — pair endpoints share a " +
      "cluster, canonical is the component min, sizes consistent") {
    val clusters = Dedup.dupClusters(spark, sf)
    assert(clusters.count() == 500) // every doc labeled, singletons included
    val lab = clusters.select(col("doc_id"), col("cluster_id"))
    // every LSH pair must be collapsed into one cluster (incl. transitively)
    val pairs = Dedup.minhashLshPairs(spark, sf).select(col("d1"), col("d2"))
    val broken = pairs
      .join(lab.select(col("doc_id").as("d1"), col("cluster_id").as("c1")), "d1")
      .join(lab.select(col("doc_id").as("d2"), col("cluster_id").as("c2")), "d2")
      .where(col("c1") =!= col("c2"))
    assert(broken.count() == 0)
    // canonical id is the min of its cluster, exactly one per cluster
    assert(clusters.where(col("cluster_id") > col("doc_id")).count() == 0)
    val canonPerCluster = clusters.where(col("is_canonical"))
      .groupBy(col("cluster_id")).count()
    assert(canonPerCluster.where(col("count") =!= 1).count() == 0)
    // sizes add back up to the corpus
    val total = clusters.where(col("is_canonical"))
      .agg(sum(col("cluster_size"))).head().getLong(0)
    assert(total == 500)
  }

  test("int8 quantization: q bounded, reconstruction error within the " +
      "half-step envelope, exact roundtrip at the max element") {
    val out = Similarity.quantizeInt8(spark, sf).collect()
    assert(out.length == 500)
    out.foreach { r =>
      val scale = r.getAs[Double]("scale")
      assert(r.getAs[Int]("q_min") >= -127 && r.getAs[Int]("q_max") <= 127, r)
      // nearest-grid rounding: per-element error <= scale/254, so the L2
      // error over 64 dims is <= sqrt(64)*scale/254
      val bound = math.sqrt(64.0) * scale / 254.0 + 1e-6
      assert(r.getAs[Double]("recon_err") <= bound, s"$r bound=$bound")
    }
  }

  test("span dedup: every doc covered, dup counts bounded, exact-duplicate " +
      "docs have dup_ratio 1.0") {
    val stats = Dedup.spanDupStats(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(stats.size == 500)
    stats.values.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), r) // n_dup_spans <= n_spans
    }
    // span counts equal an independently computed floor(tokens/10) per doc
    val expected = graft.ingest.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), floor(size(split(col("text"), " ")) / 10).as("e"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    stats.foreach { case (d, r) => assert(r.getLong(1) == expected(d), s"doc $d") }
    // docs in an exact-duplicate group (present at larger SFs) share every
    // span with their twin
    Dedup.exactDedup(spark, sf)
      .where(col("group_size") > 1).select(col("doc_id")).collect()
      .map(_.getLong(0)).foreach { d =>
        assert(stats(d).getDouble(3) == 1.0, s"doc $d should be fully duplicated")
      }
  }

  test("large-star/small-star CC reaches the identical fixpoint as " +
      "min-label propagation") {
    val stars = Dedup.dupClustersStars(spark, sf)
    val prop = Dedup.dupClusters(spark, sf)
    assert(stars.except(prop).isEmpty && prop.except(stars).isEmpty,
      "star-contraction CC disagrees with label propagation")
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

  test("hard negatives: labels always differ, ranks contiguous, top-5 ids " +
      "match an independent driver-side reference") {
    val hn = Similarity.hardNegatives(spark, sf, nQueries = 3, k = 5)
    assert(hn.where(col("q_label") === col("c_label")).count() == 0)
    val perQ = hn.groupBy(col("query_id")).count()
    assert(perQ.where(col("count") =!= 5).count() == 0)
    // independent reference: plain Scala cosine over the collected corpus
    val all = graft.ingest.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"), col("label"))
      .as[(Long, Seq[Float], Int)].collect()
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val byQuery = hn.select(col("query_id"), col("cand_id"), col("rn"))
      .as[(Long, Long, Int)].collect().groupBy(_._1)
    for ((qid, q, qLabel) <- all.filter(_._1 < 3)) {
      val want = all.filter(v => v._3 != qLabel)
        .map(v => (v._1, BigDecimal(cos(q, v._2))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
        .sortBy { case (id, sim) => (-sim, id) }.take(5).map(_._1).toSeq
      val got = byQuery(qid).sortBy(_._3).map(_._2).toSeq
      assert(got == want, s"query $qid")
    }
  }

  test("token chunking: stride coverage — every token in exactly the " +
      "expected chunks, text matches the token slices") {
    val W = 32; val S = 24
    val chunks = TextAnalysis.chunkTokens(spark, sf, W, S)
      .select(col("doc_id"), col("chunk_id"), col("n_tokens"),
        col("chunk_text"))
      .as[(Long, Int, Long, String)].collect().groupBy(_._1)
    val docs = graft.ingest.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    assert(chunks.size == docs.length)
    for ((did, text) <- docs) {
      val toks = text.split(" ", -1)
      val starts = toks.indices.by(S)
      val got = chunks(did).sortBy(_._2)
      assert(got.map(_._2).toSeq == starts.indices.toSeq, s"doc $did ids")
      for ((st, (_, _, nTok, ctext)) <- starts.zip(got)) {
        val slice = toks.slice(st, st + W)
        assert(nTok == slice.length, s"doc $did start $st")
        assert(ctext == slice.mkString(" "), s"doc $did start $st")
      }
    }
  }

  test("epoch shuffle: positions contiguous per (epoch, batch), batch = " +
      "first md5 byte mod 8 recomputed via MessageDigest, epochs reorder") {
    val nDocs = graft.ingest.Tables.load(spark, sf, "documents").count()
    val rows = TextAnalysis.epochShuffle(spark, sf)
      .select($"epoch", $"batch_id", $"pos", $"doc_id", $"order_key")
      .as[(Int, Int, Int, Long, String)].collect()
    assert(rows.length == 2 * nDocs)
    // independent reference for key + batch
    val mdRef = java.security.MessageDigest.getInstance("MD5")
    for ((epoch, batch, _, did, key) <- rows.take(50)) {
      val hex = mdRef.digest(s"$did:$epoch".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(key == hex)
      assert(batch == Integer.parseInt(hex.take(2), 16) % 8)
    }
    for (((_, _), grp) <- rows.groupBy(r => (r._1, r._2))) {
      assert(grp.map(_._3).sorted.toSeq == (1 to grp.length))
      // within-batch order follows the md5 key
      assert(grp.sortBy(_._3).map(_._5).toSeq == grp.map(_._5).sorted.toSeq)
    }
    // a fresh epoch is a genuinely different global order
    val e0 = rows.filter(_._1 == 0).sortBy(r => (r._2, r._3)).map(_._4)
    val e1 = rows.filter(_._1 == 1).sortBy(r => (r._2, r._3)).map(_._4)
    assert(e0.toSeq != e1.toSeq)
  }

  test("pii redact: planted docs scrubbed to placeholders with exact " +
      "counts, unplanted docs byte-identical") {
    val docs = graft.ingest.Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val out = TextAnalysis.piiRedact(spark, sf)
      .select($"doc_id", $"n_emails", $"n_phones", $"clean_text")
      .as[(Long, Long, Long, String)].collect()
    assert(out.length == docs.size)
    for ((did, ne, np, clean) <- out) {
      if (did % 7 == 0) {
        assert(ne == 1 && clean.contains("[EMAIL]") && !clean.contains("@"),
          s"doc $did")
      } else assert(ne == 0, s"doc $did")
      if (did % 11 == 0) {
        assert(np == 1 && clean.contains("[PHONE]"), s"doc $did")
      } else assert(np == 0, s"doc $did")
      if (did % 7 != 0 && did % 11 != 0) assert(clean == docs(did), s"doc $did")
    }
  }

  test("class balance: every stratum exactly the smallest stratum's " +
      "size, members are the md5-rank prefix") {
    val docs = graft.ingest.Tables.load(spark, sf, "documents")
      .select($"doc_id", $"source").as[(Long, String)].collect()
    val bySource = docs.groupBy(_._2)
    val target = bySource.values.map(_.length).min
    val got = TextAnalysis.classBalance(spark, sf)
      .select($"doc_id", $"source", $"rn").as[(Long, String, Int)].collect()
    assert(got.groupBy(_._2).values.forall(_.length == target))
    // reference: md5-hex rank prefix per stratum
    val mdRef = java.security.MessageDigest.getInstance("MD5")
    def hex(id: Long) = mdRef.digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    for ((src, members) <- bySource) {
      val want = members.map(_._1).sortBy(id => (hex(id), id)).take(target)
      val gotIds = got.filter(_._2 == src).sortBy(_._3).map(_._1)
      assert(gotIds.toSeq == want.toSeq, src)
    }
  }

  test("concat pack: offsets are running sums mod capacity, contexts " +
      "cut exactly at capacity boundaries, every token placed once") {
    val cap = 2048L
    val rows = TextAnalysis.concatPack(spark, sf)
      .select($"shard", $"doc_id", $"est_tokens", $"context_id",
        $"offset_in_context")
      .as[(Int, Long, Long, Long, Long)].collect()
    for ((_, grp) <- rows.groupBy(_._1)) {
      var cum = 0L
      for ((_, _, est, ctx, off) <- grp.sortBy(_._2)) {
        assert(ctx == cum / cap && off == cum % cap)
        cum += est
      }
      assert(cum == grp.map(_._3).sum)
    }
  }

  test("bigram nll: matches a driver-side Jelinek-Mercer reference with " +
      "the same rounding schedule") {
    val texts = graft.ingest.Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val allToks = texts.flatMap(_._2.split(" ", -1))
    val nTotal = allToks.length.toDouble
    val c2 = allToks.groupBy(identity).view.mapValues(_.length).toMap
    val bigrams = texts.flatMap { case (_, t) =>
      val ts = t.split(" ", -1); ts.dropRight(1).zip(ts.drop(1)) }
    val c12 = bigrams.groupBy(identity).view.mapValues(_.length).toMap
    val c1 = bigrams.groupBy(_._1).view.mapValues(_.length).toMap
    val got = TextAnalysis.bigramNll(spark, sf)
      .select($"doc_id", $"n_bigrams", $"nll_nano_sum", $"avg_nll_nano")
      .as[(Long, Long, Long, Long)].collect().take(25)
    for ((did, nb, nanoSum, avgNano) <- got) {
      val ts = texts.find(_._1 == did).get._2.split(" ", -1)
      val bgs = ts.dropRight(1).zip(ts.drop(1))
      assert(nb == bgs.length)
      val sum = bgs.map { bg =>
        val p = 0.75 * (c12(bg).toDouble / c1(bg._1)) +
          0.25 * (c2(bg._2).toDouble / nTotal)
        BigDecimal(math.log(p)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      val expectNano = (-sum * 1000000000L).toLongExact
      assert(nanoSum == expectNano, s"doc $did")
      assert(avgNano == expectNano / nb, s"doc $did")
    }
  }

  test("incremental dedup: every planted copy rediscovers its source at " +
      "agreement 1.0; candidates are strictly new x corpus") {
    val rows = Dedup.incrementalDedup(spark, sf)
      .select($"new_id", $"corpus_id", $"est_jaccard")
      .as[(Long, Long, Double)].collect()
    assert(rows.forall { case (n, c, _) => n >= 1000000L && c < 1000000L })
    val planted = graft.ingest.Tables.load(spark, sf, "documents")
      .select($"doc_id").as[Long].collect().filter(_ % 5 == 0)
    for (d <- planted)
      assert(rows.contains((d + 1000000L, d, 1.0)), s"doc $d")
  }

  test("normalize: all docs reduce to the canonical lowercase " +
      "single-spaced form; exactly the planted docs report changed") {
    val docs = graft.ingest.Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val out = TextAnalysis.normalizeText(spark, sf)
      .select($"doc_id", $"normalized", $"changed")
      .as[(Long, String, Boolean)].collect()
    assert(out.length == docs.size)
    for ((did, norm, changed) <- out) {
      val canonical = docs(did).toLowerCase(java.util.Locale.ROOT)
        .replaceAll("\\s+", " ").trim
      assert(norm == canonical, s"doc $did")
      // the fixture is already canonical, so changed == planted mess
      if (docs(did) == canonical)
        assert(changed == (did % 3 == 0 || did % 4 == 0), s"doc $did")
    }
  }

  test("IVF ANN: every result stays in the query's bucket; sims ≤ brute top-1") {
    val ivf = Similarity.annIvf(spark, sf, nCentroids = 4, nQueries = 5, k = 2)
    val brute = Similarity.knnBrute(spark, sf, nQueries = 5, k = 1)
      .select(col("query_id"), col("sim").as("best"))
    val joined = ivf.join(brute, "query_id")
    assert(joined.where(col("sim") > col("best")).count() == 0)
  }

  test("semdedup: matches a driver-side dominance reference on the real " +
      "assignment; loners always kept; a real kept/pruned mix exists") {
    val out = Similarity.semDedup(spark, sf).collect()
    assert(out.length == 500)
    // independent reference: recompute the dominance sweep from the
    // operator's OWN (bucket, csim) assignment plus exact pairwise
    // cosines over the raw fixture vectors
    val emb = graft.ingest.Tables.load(spark, sf, "embeddings")
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])]
      .collect().toMap.map { case (k, v) => k -> v.map(_.toDouble).toArray }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i)
        nb += b(i) * b(i); i += 1 }
      BigDecimal(d / math.sqrt(na) / math.sqrt(nb))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val byBucket = out.groupBy(_.getAs[Long]("bucket"))
    out.foreach { r =>
      val id = r.getAs[Long]("vec_id"); val cs = r.getAs[Double]("csim")
      val mates = byBucket(r.getAs[Long]("bucket")).filter(
        _.getAs[Long]("vec_id") != id)
      val neigh = mates.filter(m =>
        cos(emb(id), emb(m.getAs[Long]("vec_id"))) >= 0.35)
      assert(r.getAs[Long]("n_dups") == neigh.length.toLong, s"n_dups $id")
      val dominated = neigh.exists { m =>
        val ocs = m.getAs[Double]("csim")
        ocs < cs || (ocs == cs && m.getAs[Long]("vec_id") < id)
      }
      assert(r.getAs[Boolean]("kept") == !dominated, s"kept $id")
    }
    val kept = out.count(_.getAs[Boolean]("kept"))
    assert(kept > 0 && kept < out.length)
    // the dominance order keeps the farthest-from-centroid member of
    // every cluster's candidate set: per bucket, the minimum (csim, id)
    // among vectors WITH neighbors is always kept
    byBucket.values.foreach { rows =>
      val withNeigh = rows.filter(_.getAs[Long]("n_dups") > 0)
      if (withNeigh.nonEmpty) {
        val first = withNeigh.minBy(r =>
          (r.getAs[Double]("csim"), r.getAs[Long]("vec_id")))
        assert(first.getAs[Boolean]("kept"))
      }
    }
  }

  test("multi-probe IVF: recall vs brute truth >= single-probe recall; " +
      "probing 2 buckets can only add candidates") {
    val truth = Similarity.knnBrute(spark, sf, nQueries = 10, k = 3)
      .select(col("query_id"), col("cand_id"))
    val one = Similarity.annIvf(spark, sf)
      .select(col("query_id"), col("cand_id"))
    val two = Similarity.annMultiProbe(spark, sf)
      .select(col("query_id"), col("cand_id"))
    val total = truth.count().toDouble
    val recall1 = truth.intersect(one).count() / total
    val recall2 = truth.intersect(two).count() / total
    assert(recall2 >= recall1,
      s"multi-probe recall $recall2 < single-probe $recall1")
  }

  test("quality + tokens: ratios in range, token counts consistent") {
    val q = TextAnalysis.qualityScore(spark, sf)
    assert(q.where(col("ttr") <= 0 || col("ttr") > 1).count() == 0)
    val t = TextAnalysis.tokenCounts(spark, sf)
    // all-lowercase word corpus: regex segmentation == whitespace tokens
    assert(t.where(col("bpe_ish_tokens") < col("ws_tokens")).count() == 0)
  }

  test("repetition signals: fractions in [0,1], top <= dup, gram totals " +
      "equal n_tokens - 1") {
    val r = TextAnalysis.repetitionSignals(spark, sf)
    assert(r.where(col("top_gram_frac") < 0 || col("top_gram_frac") > 1 ||
      col("dup_gram_frac") < 0 || col("dup_gram_frac") > 1).count() == 0)
    // any gram counted in top_gram_frac with top_c > 1 is also in dup_c;
    // a doc whose most frequent bigram is unique has dup = 0
    assert(r.where(col("top_gram_frac") > col("dup_gram_frac") &&
      col("dup_gram_frac") > 0).count() == 0)
    val docs = graft.ingest.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), (size(split(col("text"), " ")) - 1).as("want"))
    assert(r.join(docs, "doc_id")
      .where(col("n_grams") =!= col("want")).count() == 0)
  }

  test("contamination: test source absent, ratios consistent, duplicate " +
      "of a test doc is fully contaminated") {
    val c = TextAnalysis.contamination(spark, sf)
    assert(c.count() > 0)
    val docs = graft.ingest.Tables.load(spark, sf, "documents")
    val testIds = docs.where(col("source") === "src9")
      .select(col("doc_id")).as[Long].collect().toSet
    assert(c.select("doc_id").as[Long].collect().forall(!testIds.contains(_)))
    assert(c.where(col("n_hit") > col("n_spans")).count() == 0)
    // an exact copy of a test doc's text (if any exists outside src9)
    // must show contamination 1.0
    val testTexts = docs.where(col("source") === "src9").select("text")
    val copies = docs.where(col("source") =!= "src9")
      .join(testTexts, "text").select("doc_id").as[Long].collect()
    val full = c.where(col("contamination") === 1.0)
      .select("doc_id").as[Long].collect().toSet
    assert(copies.forall(full.contains))
  }

  test("fingerprint: deterministic across runs, rolling hash in field") {
    val f1 = TextAnalysis.fingerprint(spark, sf).collect()
    val f2 = TextAnalysis.fingerprint(spark, sf).collect()
    assert(f1.sameElements(f2))
    assert(f1.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 1000000007L))
  }

  test("GraftExtensions injects the native functions into every session " +
      "state (newSession resolves them with no register() call)") {
    // a fresh session state: temp functions from register() do NOT carry
    // over, so resolution here proves the spark.sql.extensions path
    val fresh = spark.newSession()
    val r = fresh.sql(
      """SELECT simhash32('a b c') AS h,
        |  round(cosine_similarity(CAST(array(3.0, 4.0) AS ARRAY<FLOAT>),
        |                          CAST(array(3.0, 4.0) AS ARRAY<FLOAT>)), 6) AS c,
        |  size(word_shingles('a b c d', 3)) AS n
        |FROM (SELECT 1)""".stripMargin).head()
    assert(r.getDouble(1) == 1.0 && r.getInt(2) == 2)
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
    // the search-family expressions resolve by name too, with the query
    // phrase analyzed at plan time like the Column API
    val ph = spark.sql(
      """SELECT count(*) AS exact,
        |  sum(CASE WHEN phrase_near(text, 'Spark Query!', 1)
        |      THEN 1 ELSE 0 END) AS near,
        |  sum(CASE WHEN phrase_match(text, 'Spark Query!')
        |      THEN 1 ELSE 0 END) AS adj,
        |  max(size(analyze_tokens(text))) AS mx
        |FROM docs_v WHERE phrase_match(text, 'Spark Query!')""".stripMargin)
      .head()
    assert(ph.getLong(0) == ph.getLong(1) && ph.getLong(0) == ph.getLong(2),
      s"phrase rows must all adjacency-match: $ph")
    assert(ph.getInt(3) > 0)
  }

  test("decontaminate: drops tokens exactly when x31 reports " +
      "contamination, survivor string is token-consistent") {
    val dec = TextAnalysis.decontaminate(spark, sf).cache()
    val rep = TextAnalysis.contamination(spark, sf)
      .select(col("doc_id"), col("n_hit"))
    // a doc loses tokens iff its contamination report has span hits
    val j = dec.join(rep, Seq("doc_id"), "left")
      .withColumn("hits", coalesce(col("n_hit"), lit(0L)))
    assert(j.where(col("n_dropped") > 0 && col("hits") === 0).count() == 0)
    assert(j.where(col("n_dropped") === 0 && col("hits") > 0).count() == 0)
    // survivor accounting: cleaned token count == n_tokens - n_dropped
    val bad = dec.withColumn("n_clean",
        when(col("cleaned_text") === "", 0)
          .otherwise(size(split(col("cleaned_text"), " "))))
      .where(col("n_clean") =!= col("n_tokens") - col("n_dropped"))
    assert(bad.count() == 0)
    dec.unpersist()
  }

  test("pack bins: every doc assigned once, bins stay within shard, " +
      "LPT round-robin balances each shard's bins") {
    val p = TextAnalysis.packBins(spark, sf).cache()
    assert(p.count() == 500)
    assert(p.select(col("doc_id")).distinct().count() == 500)
    // bin ids live inside their shard's range [shard*4, shard*4+4)
    assert(p.where(col("bin") < col("shard") * 4 ||
      col("bin") >= col("shard") * 4 + 4).count() == 0)
    // balance: within every shard, the heaviest bin carries at most
    // 2x the lightest (longest-first round-robin on this corpus's
    // tight length distribution is far better; 2x is a safe envelope)
    val spread = p.groupBy(col("shard"), col("bin"))
      .agg(max(col("bin_tokens")).as("t"))
      .groupBy(col("shard"))
      .agg((max(col("t")) / min(col("t"))).as("ratio"))
      .agg(max(col("ratio")))
      .head().getDouble(0)
    assert(spread <= 2.0, s"bin imbalance $spread")
    p.unpersist()
  }

  test("more_like_this: query doc excluded, ranks contiguous, every hit " +
      "shares a top term of the query doc") {
    val r = TextAnalysis.moreLikeThis(spark, sf).collect()
    assert(r.nonEmpty && r.length <= 10)
    assert(!r.map(_.getLong(0)).contains(0L)) // the query doc itself
    assert(r.map(_.getAs[Int]("rank")).toSeq == (1 to r.length))
    val scores = r.map(_.getAs[Double]("score")).toSeq
    assert(scores == scores.sorted.reverse)
    // recompute the query doc's top-3 tf-idf terms independently and
    // check every hit contains at least one
    val docs = graft.ingest.Tables.load(spark, sf, "documents")
    val toks = docs.select(col("doc_id"),
      explode(graft.functions.AnalyzeTokens.analyze(col("text"))).as("t"))
    val n = docs.count().toDouble
    val tf = toks.groupBy(col("doc_id"), col("t")).count()
    val df = tf.groupBy(col("t")).count().withColumnRenamed("count", "df")
    val top = tf.where(col("doc_id") === 0).join(df, "t")
      .withColumn("s", round(col("count") * log(lit(n) / col("df")), 6))
      .orderBy(col("s").desc, col("t")).limit(3)
      .select(col("t")).collect().map(_.getString(0)).toSet
    val hitIds = r.map(_.getLong(0)).toSet
    val withTerm = toks.where(col("t").isin(top.toSeq: _*))
      .select(col("doc_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(hitIds.subsetOf(withTerm))
  }

  test("bm25: ranked results contain a query term, scores descend, " +
      "longer docs penalized at equal tf") {
    val r = TextAnalysis.bm25Search(spark, sf).collect()
    assert(r.nonEmpty && r.length <= 20)
    // ranks are 1..n in score-descending order
    assert(r.map(_.getAs[Int]("rank")).toSeq == (1 to r.length))
    val scores = r.map(_.getAs[Double]("score")).toSeq
    assert(scores == scores.sorted.reverse)
    // every hit really contains a query term
    val hits = TextAnalysis.bm25Search(spark, sf)
      .join(graft.ingest.Tables.load(spark, sf, "documents"), "doc_id")
    assert(hits.where(!col("text").rlike("\\b(spark|query|stream)\\b"))
      .count() == 0)
    // the per-term df aggregation must NOT compile to a multi-distinct
    // Expand (N parallel countDistincts replicate every posting row N
    // times before the shuffle — the x29 anti-pattern)
    val plan = TextAnalysis.bm25Search(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), "bm25 plan contains an Expand node")
    // the analyzer makes search punctuation/case-proof: a messied corpus
    // with mixed-case query terms returns the identical ranking
    val messy = graft.ingest.Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        upper(regexp_replace(col("text"), " ", ", ")).as("text"))
    val analyzed = TextAnalysis.bm25(messy, "doc_id", "text",
      Seq("Spark", "QUERY", "Stream"), 20).collect()
    assert(analyzed.map(x => (x.getLong(0), x.getDouble(1))).toSeq ==
      r.map(x => (x.getLong(0), x.getDouble(1))).toSeq)
  }

  test("weighted sample: deterministic, k rows, inclusion follows weight " +
      "in aggregate") {
    val s1 = TextAnalysis.weightedSample(spark, sf, k = 100).collect()
    val s2 = TextAnalysis.weightedSample(spark, sf, k = 100).collect()
    assert(s1.length == 100 && s1.sameElements(s2)) // hash-seeded, no RNG
    assert(s1.map(_.getAs[Int]("rank")).toSeq == (1 to 100))
    // keys descend and are negative (ln(u) < 0, w > 0)
    val keys = s1.map(_.getAs[Double]("key")).toSeq
    assert(keys == keys.sorted.reverse && keys.forall(_ < 0))
    // aggregate bias: the sampled docs' mean weight exceeds the corpus
    // mean (quality-proportional inclusion)
    val corpusMeanW = TextAnalysis.qualityScore(spark, sf)
      .agg(avg(col("score"))).head().getDouble(0)
    val sampleMeanW = s1.map(_.getAs[Double]("w")).sum / s1.length
    assert(sampleMeanW > corpusMeanW,
      s"sample mean w $sampleMeanW <= corpus mean $corpusMeanW")
  }

  test("embed cohesion: one row per vector, cosine to own-label centroid " +
      "in [-1,1], own-label centroid beats the global-worst label for " +
      "most vectors") {
    val c = Similarity.embedCohesion(spark, sf)
    val rows = c.collect()
    assert(rows.length == 500)
    assert(rows.forall(r => math.abs(r.getAs[Double]("cohesion")) <= 1.0 + 1e-9))
    // every label is represented and has a finite mean cohesion
    val perLabel = c.groupBy(col("label")).agg(avg(col("cohesion")).as("m"))
      .collect()
    assert(perLabel.length == 10 && perLabel.forall(r =>
      !r.getAs[Double]("m").isNaN))
  }

  test("span excise: cleaned text drops exactly the cross-doc duplicated " +
      "spans, keeps order and the unspanned tail, agrees with x28 counts") {
    val ex = Dedup.spanExcise(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_spans"), r.getAs[Long]("n_dropped"),
          r.getAs[String]("cleaned_text"))).toMap
    val stats = Dedup.spanDupStats(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_spans"), r.getAs[Long]("n_dup_spans"))).toMap
    val texts = graft.ingest.Tables.load(spark, sf, "documents").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(ex.keySet == texts.keySet) // every doc emitted, spanless included
    // counts agree with the x28 report on its covered docs
    stats.foreach { case (id, (n, dup)) =>
      assert(ex(id)._1 == n && ex(id)._2 == dup, s"doc $id count mismatch")
    }
    texts.foreach { case (id, text) =>
      val toks = text.split(" ", -1)
      val (n, dropped, cleaned) = ex(id)
      // token-count arithmetic: original - 10*dropped == cleaned tokens
      val cleanedToks = if (cleaned.isEmpty) 0 else cleaned.split(" ", -1).length
      assert(cleanedToks == toks.length - 10 * dropped,
        s"doc $id: $cleanedToks != ${toks.length} - 10*$dropped")
      // nothing dropped -> text unchanged; something dropped -> cleaned is
      // a subsequence of the original token stream
      if (dropped == 0) assert(cleaned == text)
      else {
        var j = 0
        val orig = toks.iterator
        val keep = if (cleaned.isEmpty) Array.empty[String]
          else cleaned.split(" ", -1)
        for (t <- orig) if (j < keep.length && keep(j) == t) j += 1
        assert(j == keep.length, s"doc $id: cleaned not a subsequence")
      }
      assert(n == toks.length / 10)
    }
  }

  test("temperature mixture: quotas follow n^0.5 shares, selection " +
      "deterministic, per-source counts equal quotas") {
    val m = TextAnalysis.temperatureMixture(spark, sf, keepN = 300)
    val rows = m.collect()
    // per-source selected count == quota exactly
    val bySource = rows.groupBy(_.getAs[String]("source"))
    bySource.foreach { case (s, rs) =>
      val quota = rs.head.getAs[Long]("quota")
      assert(rs.length == quota, s"source $s: ${rs.length} != quota $quota")
      assert(rs.map(_.getAs[Int]("rk")).sorted.toSeq == (1 to quota.toInt))
    }
    // α=0.5 flattens the mixture: the max/min selected-count ratio must
    // be LESS extreme than the raw per-source doc-count ratio
    val rawCounts = graft.ingest.Tables.load(spark, sf, "documents")
      .groupBy(col("source")).count().collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    if (rawCounts.values.max > rawCounts.values.min) {
      val rawRatio = rawCounts.values.max.toDouble / rawCounts.values.min
      val qr = bySource.view.mapValues(_.length.toDouble)
      val quotaRatio = qr.values.max / qr.values.min
      assert(quotaRatio <= rawRatio + 1e-9,
        s"temperature did not flatten: $quotaRatio vs raw $rawRatio")
    }
    // deterministic across runs
    assert(TextAnalysis.temperatureMixture(spark, sf, keepN = 300)
      .collect().sameElements(rows))
  }

  test("unimax: epoch cap binds on the largest language, small languages " +
      "keep their fair share, surplus water-fills, total <= budget; " +
      "planted-histogram fold matches the paper's worked shape") {
    val docs = graft.ingest.Tables.load(spark, sf, "documents")
    val counts = docs.groupBy(col("lang")).count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toSeq
    val total = counts.map(_._2).sum
    val budget = total * 80 / 100
    val out = TextAnalysis.unimaxMixture(spark, sf).collect()
    val byLang = out.groupBy(_.getAs[String]("lang"))
    // per-lang selected count == quota; ranks dense from 1
    byLang.foreach { case (l, rs) =>
      val quota = rs.head.getAs[Long]("quota")
      assert(rs.length == quota, s"lang $l")
      assert(rs.map(_.getAs[Int]("rk")).sorted.toSeq == (1 to quota.toInt))
    }
    // matches the independent fold exactly
    val want = TextAnalysis.unimaxQuotas(counts, 80, 1)
      .map(q => q._1 -> q._3).toMap
    byLang.foreach { case (l, rs) => assert(rs.length == want(l)) }
    assert(out.length <= budget)
    // the allocator's two regimes are both live on this corpus: the
    // dominant language is CAPPED below its size, and at least one
    // small language is kept whole
    val cm = counts.toMap
    val capped = want.filter { case (l, q) => q < cm(l) }
    val whole = want.filter { case (l, q) => q == cm(l) }
    assert(capped.nonEmpty, "no language was capped")
    assert(whole.nonEmpty, "no language was kept whole")
    // planted histogram: epochs cap binds before fair share on tiny
    // langs; leftover redistributes in ascending order (water-fill)
    val fold = TextAnalysis.unimaxQuotas(
      Seq("a" -> 10L, "b" -> 100L, "c" -> 1000L), 50, 1)
    // budget 555: a kept whole (10 <= 185), b kept whole (100 <= 272),
    // c gets the rest (445)
    assert(fold == Seq(("a", 10L, 10L), ("b", 100L, 100L),
      ("c", 1000L, 445L)))
    // maxEpochs > 1 lets a small language repeat up to the cap
    val fold2 = TextAnalysis.unimaxQuotas(
      Seq("a" -> 10L, "b" -> 1000L), 100, 2)
    assert(fold2.head == (("a", 10L, 20L))) // 2 epochs of a
  }

  test("x136 unigram drift: counts, ln9 nano-nats and both scaled KL " +
      "divergences replay driver-side; drift is positive and sane") {
    import spark.implicits._
    val docs = graft.ingest.Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val aToks = docs.flatMap(_._2.split(" ", -1))
    val bToks = docs.filter(_._1 % 13 != 0)
      .map { case (id, t) => if (id % 7 == 0) t + " v2" else t }
      .flatMap(_.split(" ", -1)) ++
      docs.filter(_._1 % 11 == 0).flatMap(d => ("new " + d._2).split(" ", -1))
    val ca = aToks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cb = bToks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val vocab = (ca.keySet ++ cb.keySet).toSeq
    def ln9(x: Long): Long =
      (new java.math.BigDecimal(java.lang.Double.toString(
          math.log(x.toDouble)))
        .setScale(9, java.math.RoundingMode.HALF_UP)
        .movePointRight(9)).longValueExact()
    val nA = aToks.length.toLong; val nB = bToks.length.toLong
    val v = vocab.length.toLong
    def kl(x: Map[String, Long], y: Map[String, Long],
        nx: Long, ny: Long): Long =
      vocab.map { t =>
        val c = x.getOrElse(t, 0L); val d = y.getOrElse(t, 0L)
        (c + 1) * (ln9(c + 1) - ln9(d + 1))
      }.sum + (nx + v) * (ln9(ny + v) - ln9(nx + v))
    val got = graft.ext.TextAnalysis.unigramDrift(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(got == ((nA, nB, v, kl(ca, cb, nA, nB), kl(cb, ca, nB, nA))))
    // the derived release genuinely moved the distribution, and the
    // scaled figure corresponds to a sane KL in nats
    assert(got._4 > 0L && got._5 > 0L)
    assert(got._4.toDouble / ((nA + v) * 1e9) < 1.0)
  }

  test("x135 filter agreement: confusion counts and the integer kappa " +
      "replay driver-side; both filters non-constant; sign-split " +
      "division matches the double formula on planted negative kappa") {
    import spark.implicits._
    val docs = graft.ingest.Tables.load(spark, sf, "documents")
      .select($"text").as[String].collect()
    def w(t: String): Long =
      (java.lang.Long.parseLong(java.security.MessageDigest
        .getInstance("MD5").digest(t.getBytes("UTF-8")).take(4)
        .map(x => f"$x%02x").mkString, 16) % 1024) * 131 % 997 - 498
    val flags = docs.map { t =>
      val toks = t.split(" ", -1)
      val a = toks.length >= 20 && toks.distinct.length * 2 >= toks.length
      val b = toks.map(w).sum > 0
      (a, b)
    }
    val n = flags.length.toLong
    val aPos = flags.count(_._1).toLong
    val bPos = flags.count(_._2).toLong
    val agree = flags.count(f => f._1 == f._2).toLong
    val posAgree = flags.count(f => f._1 && f._2).toLong
    def kappaPpm(n: Long, ap: Long, bp: Long, ag: Long): Long = {
      val sigma = ap * bp + (n - ap) * (n - bp)
      val num = (n * ag - sigma) * 1000000L
      val den = n * n - sigma
      if (den == 0) 0L else if (num >= 0) num / den else -((-num) / den)
    }
    val got = graft.ext.TextAnalysis.filterAgreement(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(got == ((n, aPos, bPos, agree, posAgree,
      kappaPpm(n, aPos, bPos, agree))))
    // both filters are genuinely non-constant on this corpus
    assert(aPos > 0 && aPos < n && bPos > 0 && bPos < n)
    assert(got._6 > -1000000L && got._6 < 1000000L)
    // the sign-split integer form tracks the double formula, including
    // a planted NEGATIVE-kappa confusion table (systematic disagreement)
    for ((nn, ap, bp, ag) <- Seq((100L, 50L, 50L, 10L), (10L, 9L, 1L, 0L),
        (100L, 30L, 70L, 55L), (7L, 7L, 7L, 7L))) {
      val sigma = ap * bp + (nn - ap) * (nn - bp)
      val den = nn * nn - sigma
      if (den != 0) {
        val exact = kappaPpm(nn, ap, bp, ag)
        val dbl = ((nn.toDouble * ag - sigma) * 1e6) / den
        assert(math.abs(exact - dbl) <= 1.0, s"($nn,$ap,$bp,$ag)")
        if ((nn, ap, bp, ag) == ((100L, 50L, 50L, 10L)))
          assert(exact < 0, "planted table must yield negative kappa")
      } else assert(kappaPpm(nn, ap, bp, ag) == 0L)
    }
  }

  test("x134 poisson bootstrap: multiplicities, per-resample means and " +
      "the order-statistic CI replay driver-side; thresholds sane") {
    import spark.implicits._
    val cdf = graft.ext.TextAnalysis.BootCdf32
    assert(cdf == cdf.sorted && cdf.distinct == cdf)
    assert(cdf.head == math.floor(math.exp(-1.0) * 4294967296.0).toLong)
    assert(cdf.last < 4294967296L) // tail mass -> multiplicity 7 is live
    def u32(b: Int, docId: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"boot:$b:$docId".getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(x => f"$x%02x").mkString, 16)
    }
    val docs = graft.ingest.Tables.load(spark, sf, "documents")
      .select($"doc_id", size(split($"text", " ")).cast("long"))
      .as[(Long, Long)].collect()
    val means = (0 until 200).flatMap { b =>
      var sw = 0L; var sws = 0L
      for ((id, sc) <- docs) {
        val u = u32(b, id)
        val w = cdf.count(u >= _)
        sw += w; sws += w * sc
      }
      if (sw > 0) Some((b.toLong, sws * 1000000L / sw)) else None
    }
    val sorted = means.sortBy { case (b, m) => (m, b) }.map(_._2)
    val nb = sorted.length
    def at(q: Int) = sorted((q * (nb - 1)) / 1000)
    val fullMean = docs.map(_._2).sum * 1000000L / docs.length
    val got = graft.ext.TextAnalysis.bootstrapCi(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(got == ((docs.length.toLong, nb.toLong, fullMean,
      at(25), at(500), at(975))))
    assert(got._4 <= got._5 && got._5 <= got._6)
    // the interval is non-degenerate on this corpus
    assert(got._4 < got._6)
  }

  test("tfidf: k terms per doc, rank follows score") {
    val t = TextAnalysis.tfidfTopTerms(spark, sf, k = 3)
    val perDoc = t.groupBy(col("doc_id")).count()
    assert(perDoc.where(col("count") > 3).count() == 0)
    assert(t.where(col("rk") === 1).count() == 500)
  }

  test("hybrid RRF: fused score recomputes from the leg ranks; ordering " +
      "strictly by (rrf desc, doc_id)") {
    val out = Similarity.hybridRrf(spark, sf).collect()
    assert(out.length == 10)
    out.foreach { r =>
      val lex = Option(r.getAs[java.lang.Integer]("r_lex")).map(_.toInt)
      val vec = Option(r.getAs[java.lang.Integer]("r_vec")).map(_.toInt)
      assert(lex.isDefined || vec.isDefined) // from at least one list
      val want = BigDecimal(
        lex.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
          vec.map(x => 1.0 / (60 + x)).getOrElse(0.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("rrf") == want)
    }
    // strictly ordered by the fusion key
    val keys = out.map(r => (-r.getAs[Double]("rrf"), r.getAs[Long]("doc_id")))
    assert(keys.sameElements(keys.sorted))
    // rank 1 doc must be retrieved by BOTH legs on this fixture (the
    // corpus is word soup; fused top beats any single-list doc)
    val top = out.head
    assert(top.getAs[Int]("rank") == 1)
  }

  test("stratified split: parts partition the corpus ~96/2/2, assignment " +
      "deterministic and source-stratified") {
    val s = TextAnalysis.stratifiedSplit(spark, sf)
    val rows = s.collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total == 500)
    val byPart = rows.groupBy(_.getAs[String]("part"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    // hash split: train ≈ 96%, val+test ≈ 4% (uniform md5 buckets)
    assert(byPart("train") > 450 && byPart("train") < 495)
    assert(byPart.getOrElse("val", 0L) + byPart.getOrElse("test", 0L)
      == 500 - byPart("train"))
    // bucket audit columns respect the split boundaries
    rows.foreach { r =>
      val (lo, hi) = (r.getAs[Long]("b_min"), r.getAs[Long]("b_max"))
      r.getAs[String]("part") match {
        case "train" => assert(lo >= 0 && hi < 960)
        case "val"   => assert(lo >= 960 && hi < 980)
        case "test"  => assert(lo >= 980 && hi < 1000)
      }
    }
    // deterministic: identical on re-run
    assert(TextAnalysis.stratifiedSplit(spark, sf).collect()
      .sameElements(rows))
  }

  test("multimodal: metadata real; PPM codec round-trips and matches closed form") {
    val meta = Multimodal.mediaMetadata(spark, sf)
    val row = meta.where(col("media_id") === 0).head()
    assert(row.getAs[Long]("n_bytes") > 0)
    assert(row.getAs[String]("header_hex").length == 8) // 4 bytes → 8 hex
    val feats = Multimodal.decodeFeatures(spark, sf)
    assert(feats.count() == 500)
    assert(feats.where(col("width") < 8 || col("width") > 16).count() == 0)
    // decoded channel sums for one image equal the generator's closed form
    val id = 7L
    val (w, h) = Multimodal.imgDims(id)
    val expR = (0 until w * h).map(p => Multimodal.imgByte(id, p.toLong * 3)).map(_.toLong).sum
    val f7 = feats.where(col("media_id") === id).head()
    assert(f7.getAs[Long]("width") == w && f7.getAs[Long]("height") == h)
    assert(f7.getAs[Long]("r_sum") == expR)
    // header parser handles comments/whitespace; rejects garbage
    val (pw, ph, mv, _) = Multimodal.ppmHeader(
      "P6\n# c1\n  # c2\n 3\t2 # trailing\n255\n".getBytes("US-ASCII") ++ Array.fill[Byte](18)(1))
    assert((pw, ph, mv) == (3, 2, 255))
    intercept[IllegalArgumentException](Multimodal.ppmHeader("JFIF....".getBytes("US-ASCII")))
  }

  test("multimodal: box resize halves dims; block floor-averages verified") {
    import spark.implicits._
    val in = Multimodal.syntheticImages(spark, sf)
    val rs = Multimodal.resizeFeatures(spark, sf)
    assert(rs.count() == 500)
    val id = 11L
    val (w, h) = Multimodal.imgDims(id)
    val r11 = rs.where(col("media_id") === id).head()
    assert(r11.getAs[Long]("out_w") == w / 2 && r11.getAs[Long]("out_h") == h / 2)
    // hand-compute the resized green-channel sum from the closed form
    def src(y: Int, x: Int, c: Int) = Multimodal.imgByte(id, ((y * w + x) * 3 + c).toLong).toLong
    val expG = (for { by <- 0 until h / 2; bx <- 0 until w / 2 } yield
      (src(by*2, bx*2, 1) + src(by*2, bx*2+1, 1) + src(by*2+1, bx*2, 1) + src(by*2+1, bx*2+1, 1)) / 4).sum
    assert(r11.getAs[Long]("g_sum") == expG)
    // resized payload is itself a valid P6 the parser accepts
    val rp = Multimodal.resizePpm(in.where(col("media_id") === id).as[Multimodal.MediaIn]).head()
    val (ow, oh, _, _) = Multimodal.ppmHeader(rp.payload)
    assert((ow, oh) == (w / 2, h / 2))
  }

  test("multimodal: WAV chunk walker decodes PCM16 per channel, skips LIST") {
    val st = Multimodal.wavChannelStats(spark, sf)
    // one row per channel: ids with odd doc_id are stereo
    val id = 9L // stereo (1 + 9%2 = 2)
    val rows = st.where(col("media_id") === id).collect()
    assert(rows.length == 2)
    val (nch, ns) = Multimodal.wavShape(id)
    assert(nch == 2 && rows.forall(_.getAs[Long]("n_samples") == ns))
    val expSq = (0 until ns).map(s => { val a = Multimodal.wavAmp(id, s.toLong, 1L).toLong; a * a }).sum
    assert(rows.find(_.getAs[Long]("channel") == 1L).get.getAs[Long]("sum_sq") == expSq)
    assert(st.agg(max(col("peak_abs"))).head().getLong(0) <= 1024)
    // a non-WAV payload is rejected, not misparsed
    intercept[Exception] {
      import spark.implicits._
      Multimodal.decodeWav(spark.createDataset(
        Seq(Multimodal.MediaIn(0L, "RIFFxxxxJUNK".getBytes("US-ASCII"))))).collect()
    }
  }

  test("snapshot diff: statuses partition the derived delta exactly") {
    val docs = graft.ingest.Tables.load(spark, sf, "documents")
    val n = docs.count()
    val d = TextAnalysis.snapshotDiff(spark, sf)
    // the derivation's three arms, recomputed independently
    val removed = docs.where(col("doc_id") % 13 === 0).count()
    val added = docs.where(col("doc_id") % 11 === 0).count()
    val changed = docs.where(col("doc_id") % 7 === 0 &&
      col("doc_id") % 13 =!= 0).count()
    assert(d.where(col("status") === "removed").count() == removed)
    assert(d.where(col("status") === "added").count() == added)
    assert(d.where(col("status") === "changed").count() == changed)
    assert(d.count() == removed + added + changed) // no unchanged leak
    // hash presence encodes the side membership
    assert(d.where(col("status") === "added" && col("old_md5").isNotNull)
      .count() == 0)
    assert(d.where(col("status") === "removed" && col("new_md5").isNotNull)
      .count() == 0)
    assert(d.where(col("status") === "changed" &&
      (col("old_md5").isNull || col("new_md5") === col("old_md5")))
      .count() == 0)
    // added ids live in the shifted id space, disjoint from the corpus
    assert(d.where(col("status") === "added" && col("doc_id") < 1000000L)
      .count() == 0)
    assert(n > 0)
  }

  test("range shards: contiguous key ranges, lossless, deterministic") {
    val s1 = TextAnalysis.rangeShards(spark, sf).collect()
    assert(s1.map(_.getAs[Long]("shard")).toSeq == (0L to 7L))
    // every doc lands in exactly one shard
    val nDocs = graft.ingest.Tables.load(spark, sf, "documents").count()
    assert(s1.map(_.getAs[Long]("n_docs")).sum == nDocs)
    // ranges are contiguous and ordered: shard i's max key never exceeds
    // shard i+1's min key (the range-partitioning contract)
    s1.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("key_max") <= b.getAs[Long]("key_min"))
    }
    // exact-percentile boundaries balance the uniform md5 keys: no shard
    // further than 3σ-ish from n/8 at this corpus size
    val expect = nDocs.toDouble / 8
    s1.foreach { r =>
      assert(math.abs(r.getAs[Long]("n_docs") - expect) <= expect * 0.4)
    }
    // byte-identical on re-run — the property repartitionByRange's
    // reservoir sampling cannot give
    val s2 = TextAnalysis.rangeShards(spark, sf).collect()
    assert(s1.sameElements(s2))
  }

  test("pq: codes match a driver-side argmin over the returned " +
      "codebooks; reconstruction error is the sum of subspace minima") {
    val emb = graft.ingest.Tables.load(spark, sf, "embeddings")
    val books = Similarity.pqCodebooks(emb, 4, 4, 16, 2)
    assert(books.length == 4 && books.forall(b =>
      b.length == 4 && b.forall(_.length == 16)))
    val out = Similarity.pq(spark, sf).collect()
    assert(out.length == emb.count())
    (0 until 4).foreach(s => assert(out.forall { r =>
      val c = r.getAs[Long](s"c$s"); c >= 0 && c <= 3
    }))
    // replay the coding math on the driver for a sample of vectors,
    // same fold order and the same 6dp argmin rounding
    val vecs = emb.where(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding")).orderBy(col("vec_id"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1))
    vecs.foreach { case (id, v) =>
      def dist(s: Int, c: Int): Double =
        (0 until 16).map { i =>
          val d = v(s * 16 + i).toDouble - books(s)(c)(i)
          d * d
        }.reduce(_ + _)
      def r6(x: Double): Double = BigDecimal.valueOf(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).doubleValue
      val row = out.find(_.getAs[Long]("vec_id") == id).get
      var errSum = 0.0
      (0 until 4).foreach { s =>
        val ds = (0 until 4).map(c => dist(s, c))
        val expectC = (0 until 4).minBy(c => (r6(ds(c)), c))
        assert(row.getAs[Long](s"c$s") == expectC, s"vec $id sub $s")
        errSum += ds.min
      }
      assert(row.getAs[Double]("err") == r6(errSum))
    }
    // every vector with vec_id < 4 seeded a centroid; after 2 Lloyd
    // steps codes still cover all 4 values in at least one subspace
    assert((0 until 4).exists(s =>
      out.map(_.getAs[Long](s"c$s")).distinct.length == 4))
  }

  test("ccnet buckets: ordered strata, quartile-sized head/tail, tail " +
      "dropped, score matches a driver-side recount") {
    val b = TextAnalysis.ccnetBuckets(spark, sf).collect()
    val docs = graft.ingest.Tables.load(spark, sf, "documents")
    val n = docs.count()
    assert(b.length == n)
    def scores(bucket: String) = b.filter(_.getAs[String]("bucket") == bucket)
      .map(_.getAs[Long]("nll_nano"))
    // strata are ordered: every head score below every middle score
    // below every tail score (they are boundary-separated)
    assert(scores("head").max <= scores("middle").min)
    assert(scores("middle").max <= scores("tail").min)
    // quartile boundaries put roughly n/4 in head and tail
    assert(math.abs(scores("head").length - n / 4.0) <= n * 0.05 + 1)
    assert(math.abs(scores("tail").length - n / 4.0) <= n * 0.05 + 1)
    assert(b.forall(r =>
      r.getAs[Boolean]("kept") == (r.getAs[String]("bucket") != "tail")))
    // one doc's score recomputed independently (driver-side freq count
    // + the exact nano-nat rounding schedule)
    val words = docs.select(col("doc_id"),
      split(col("text"), " ").as("w")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[String](1))
    val freq = words.flatMap(_._2).groupBy(identity).view.mapValues(_.size)
    val total = words.map(_._2.size).sum.toDouble
    val (d0, toks0) = words.minBy(_._1)
    val nllSum = -toks0.map { t =>
      val lp = BigDecimal(math.log(freq(t) / total))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      (lp * 1000000000).toLongExact
    }.sum
    val expect = nllSum / toks0.size // both positive: floor division
    assert(b.find(_.getAs[Long]("doc_id") == d0).get
      .getAs[Long]("nll_nano") == expect)
  }

  test("bpe train: 12 rules, max pair count non-increasing, step-1 " +
      "argmax matches an independent recount") {
    val rules = Bpe.bpeTrain(spark, sf).collect()
    assert(rules.length == Bpe.Steps)
    assert(rules.map(_.getAs[Long]("step")).toSeq == (1L to Bpe.Steps))
    // merging can only reduce or redistribute pair mass: the chosen
    // count never increases across steps
    val cnts = rules.map(_.getAs[Long]("cnt"))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
    // step 1 is the true argmax over initial char+marker pairs,
    // recomputed independently from the raw corpus
    val words = graft.ingest.Tables.load(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("w")).collect()
      .map(_.getString(0))
    val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
    words.foreach { w =>
      val syms = w.map(_.toString) :+ Bpe.Marker
      syms.zip(syms.tail).foreach(p =>
        pairCounts(p) = pairCounts.getOrElse(p, 0L) + 1L)
    }
    val best = pairCounts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
    assert((rules.head.getAs[String]("lhs"),
      rules.head.getAs[String]("rhs")) == best._1)
    assert(rules.head.getAs[Long]("cnt") == best._2)
  }

  test("bpe tokenize: subword totals bounded by chars+words below and " +
      "words above; merges genuinely compress") {
    val t = Bpe.bpeTokenize(spark, sf)
    val docs = graft.ingest.Tables.load(spark, sf, "documents")
    assert(t.count() == docs.count())
    // initial symbols = chars-per-word + one marker per word
    //                 = (len - (nw-1) spaces) + nw = len + 1
    val joined = t.join(docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("nw"),
      (length(col("text")) + 1).cast("long").as("init_syms")),
      "doc_id")
    // every word is >= 1 subword; before any merge a word of c chars is
    // c+1 symbols, and merges only shrink
    assert(joined.where(col("bpe_tokens") < col("n_words")).count() == 0)
    assert(joined.where(col("n_words") =!= col("nw")).count() == 0)
    assert(joined.where(col("bpe_tokens") > col("init_syms")).count() == 0)
    // 12 merges on this corpus must actually compress SOME doc
    assert(joined.where(col("bpe_tokens") < col("init_syms")).count() > 0)
  }

  test("vocab build: ranks contiguous, counts monotone, coverage exact") {
    val v = TextAnalysis.vocabBuild(spark, sf).collect()
    assert(v.nonEmpty && v.length <= 64)
    assert(v.map(_.getAs[Long]("rank")).toSeq == (1L to v.length).toSeq)
    val occ = v.map(_.getAs[Long]("n_occ"))
    assert(occ.zip(occ.tail).forall { case (a, b) => a >= b })
    // cum_occ is the prefix sum of n_occ
    assert(v.map(_.getAs[Long]("cum_occ")).toSeq == occ.scanLeft(0L)(_ + _).tail.toSeq)
    // coverage is ppm of the TRUE corpus token total, floor-divided
    val totalOcc = graft.ingest.Tables.load(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("t")).count()
    v.foreach { r =>
      assert(r.getAs[Long]("cov_ppm") ==
        r.getAs[Long]("cum_occ") * 1000000L / totalOcc)
    }
    // rank 1 is the true global argmax under (n_occ DESC, token ASC)
    val top = graft.ingest.Tables.load(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("t"))
      .groupBy("t").count().orderBy(col("count").desc, col("t")).head()
    assert(v.head.getAs[String]("token") == top.getAs[String]("t"))
    assert(v.head.getAs[Long]("n_occ") == top.getAs[Long]("count"))
  }

  test("MMR re-rank: greedy selection equals an independent driver-side " +
      "replay; the diversity term genuinely reorders some page") {
    val out = graft.SparkEntry.queries("x80_mmr")(spark, sf)
      .select(col("query_id"), col("cand_id"), col("rel_micro"),
        col("sel_round"), col("mmr_micro"))
      .as[(Long, Long, Long, Int, Long)].collect()
    val all = graft.ingest.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    val vecs = all.toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def micro(a: Seq[Float], b: Seq[Float]): Long =
      (BigDecimal(cos(a, b)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        * 1000000).toLongExact
    var reordered = false
    for (qid <- 0L until 4L) {
      val q = vecs(qid)
      val page = all.filter(_._1 != qid)
        .map { case (id, v) => (id, micro(q, v)) }
        .sortBy { case (id, rel) => (-rel, id) }.take(20)
      var sel = Vector.empty[(Long, Long, Int, Long)]
      var remaining = page
      for (r <- 1 to 8) {
        val scoredPicks = remaining.map { case (id, rel) =>
          val maxsim =
            if (sel.isEmpty) 0L
            else sel.map(s => micro(vecs(id), vecs(s._1))).max
          (id, rel, 7 * rel - 3 * maxsim)
        }
        val best = scoredPicks.minBy(p => (-p._3, p._1))
        sel :+= ((best._1, best._2, r, best._3))
        remaining = remaining.filterNot(_._1 == best._1)
      }
      val got = out.filter(_._1 == qid).sortBy(_._4)
        .map(t => (t._2, t._3, t._4, t._5)).toSeq
      assert(got == sel, s"query $qid")
      if (sel.map(_._1) != page.take(8).map(_._1).toVector) reordered = true
    }
    assert(reordered, "diversity term never changed pure-relevance order")
  }

  test("ANN recall eval: hits are exactly the IVF ∩ exact intersection; " +
      "ppm is the floor ratio") {
    val rec = graft.SparkEntry.queries("x83_ann_recall")(spark, sf).collect()
    assert(rec.length == 10)
    val exact = Similarity.knnBrute(spark, sf)
      .select(col("query_id"), col("cand_id")).as[(Long, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ivf = Similarity.annIvf(spark, sf, k = 5)
      .select(col("query_id"), col("cand_id")).as[(Long, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    for (r <- rec) {
      val q = r.getAs[Long]("query_id")
      assert(r.getAs[Long]("n_exact") == 5)
      assert(r.getAs[Long]("n_hit") ==
        (exact(q) intersect ivf(q)).size.toLong, s"query $q")
      assert(r.getAs[Long]("recall_ppm") ==
        r.getAs[Long]("n_hit") * 1000000L / 5)
    }
  }

  test("DP release: Laplace noise recomputes from MessageDigest; the " +
      "released value is the exact integer identity") {
    val out = graft.SparkEntry.queries("x91_dp_release")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val src = r.getAs[String]("source")
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"dp:$src".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / 4294967296.0
      val noise = -math.signum(u - 0.5) * math.log(1.0 - 2.0 * math.abs(u - 0.5))
      val nano = (BigDecimal(noise)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP) * 1000000000L)
        .toLongExact
      assert(r.getAs[Long]("noise_nano") == nano, src)
      assert(r.getAs[Long]("released_nano") ==
        r.getAs[Long]("n_docs") * 1000000000L + nano, src)
    }
    // Laplace(1): noises vary across sources, both signs appear
    val signs = out.map(r => java.lang.Long.signum(
      r.getAs[Long]("noise_nano")))
    assert(signs.contains(1) && signs.contains(-1))
  }

  test("k-anonymity: every released group is >= k or suppressed; the " +
      "three-way verdict recomputes driver-side") {
    val out = graft.SparkEntry.queries("x92_k_anonymity")(spark, sf)
      .collect()
    val levels = out.map(_.getAs[String]("level")).toSet
    assert(levels == Set("nation", "region", "suppressed"))
    assert(out.forall { r =>
      val s = r.getAs[Long]("released_size")
      s == 0L || s >= 5L
    })
    // recompute the verdicts from raw customer/nation rows
    val cust = graft.ingest.Tables.load(spark, sf, "customer")
      .select(col("c_mktsegment"), col("c_nationkey").cast("long"))
      .as[(String, Long)].collect()
    val n2r = graft.ingest.Tables.load(spark, sf, "nation")
      .select(col("n_nationkey").cast("long"),
        col("n_regionkey").cast("long"))
      .as[(Long, Long)].collect().toMap
    val l0 = cust.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val l1 = l0.filter(_._2 < 5).groupBy { case ((seg, nat), _) =>
      (seg, n2r(nat))
    }.view.mapValues(_.values.sum).toMap
    assert(out.length == l0.size)
    for (r <- out) {
      val key = (r.getAs[String]("c_mktsegment"),
        r.getAs[Number]("c_nationkey").longValue)
      val n = l0(key)
      assert(r.getAs[Long]("n_custs") == n)
      val want =
        if (n >= 5) ("nation", n)
        else {
          val nr = l1.getOrElse((key._1, n2r(key._2)), 0L)
          if (nr >= 5) ("region", nr) else ("suppressed", 0L)
        }
      assert((r.getAs[String]("level"),
        r.getAs[Long]("released_size")) == want, key)
    }
  }

  test("semdedup eval: the pair split recomputes driver-side against " +
      "x71's own assignment; cross-cluster loss is real") {
    val r = graft.SparkEntry.queries("x90_semdedup_eval")(spark, sf).head()
    val buckets = graft.SparkEntry.queries("x71_semdedup")(spark, sf)
      .select(col("vec_id"), col("bucket")).as[(Long, Long)]
      .collect().toMap
    val vecs = graft.ingest.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    var nPairs = 0L; var nWithin = 0L
    for (i <- vecs.indices; j <- (i + 1) until vecs.length) {
      val s = BigDecimal(cos(vecs(i)._2, vecs(j)._2))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if (s >= 0.35) {
        nPairs += 1
        if (buckets(vecs(i)._1) == buckets(vecs(j)._1)) nWithin += 1
      }
    }
    assert(r.getAs[Long]("n_pairs") == nPairs)
    assert(r.getAs[Long]("n_within") == nWithin)
    assert(r.getAs[Long]("n_cross") == nPairs - nWithin)
    assert(r.getAs[Long]("within_ppm") == nWithin * 1000000L / nPairs)
    assert(nWithin > 0 && nPairs - nWithin > 0,
      s"split not exercised: $nWithin of $nPairs within")
  }

  test("terms_set: matches equal a driver-side distinct-analyzed-token " +
      "count; both m=2 and m=3 strata are populated") {
    val got = graft.SparkEntry.queries("x89_terms_set")(spark, sf)
      .as[(Long, Long)].collect().toMap
    val terms = Set("spark", "query", "stream")
    val want = graft.ingest.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .map { case (id, t) =>
        id -> t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
          .distinct.count(terms).toLong
      }.filter(_._2 >= 2).toMap
    assert(got == want)
    assert(got.values.exists(_ == 2L) && got.values.exists(_ == 3L))
  }

  test("dedup eval: ppm identities hold and the gray zone is genuinely " +
      "exercised — banding loses some mid-Jaccard pairs") {
    val r = graft.SparkEntry.queries("x86_dedup_eval")(spark, sf).head()
    val (nT, nP, nH) = (r.getAs[Long]("n_truth"), r.getAs[Long]("n_pred"),
      r.getAs[Long]("n_hit"))
    assert(nH <= math.min(nT, nP))
    assert(r.getAs[Long]("precision_ppm") == nH * 1000000L / nP)
    assert(r.getAs[Long]("recall_ppm") == nH * 1000000L / nT)
    // the augmented corpus plants j≈0.66 pairs the 12×(4,3) banding
    // cannot all catch: recall must sit strictly inside (0, 1)
    assert(nH > 0 && nH < nT,
      s"gray zone not exercised: hit=$nH truth=$nT")
  }

  test("tokenizer eval: word/byte totals recompute from the corpus, " +
      "bpe totals equal x76's per-doc output, permilles are floor " +
      "ratios") {
    val ev = graft.SparkEntry.queries("x87_tokenizer_eval")(spark, sf)
      .collect()
    val docs = graft.ingest.Tables.load(spark, sf, "documents")
      .select(col("source"), col("text")).as[(String, String)].collect()
    val src = ev.head.getAs[String]("source")
    val texts = docs.filter(_._1 == src).map(_._2)
    val row = ev.find(_.getAs[String]("source") == src).get
    assert(row.getAs[Long]("n_docs") == texts.length.toLong)
    assert(row.getAs[Long]("words") ==
      texts.map(_.split(" ", -1).length.toLong).sum)
    assert(row.getAs[Long]("text_bytes") ==
      texts.map(_.getBytes("UTF-8").length.toLong).sum)
    for (r <- ev) {
      val (w, t, b) = (r.getAs[Long]("words"), r.getAs[Long]("bpe_tokens"),
        r.getAs[Long]("text_bytes"))
      assert(r.getAs[Long]("fertility_permille") == t * 1000 / w)
      assert(r.getAs[Long]("bytes_per_token_permille") == b * 1000 / t)
      assert(t >= w) // every word is at least one subword
    }
    val totalBpe = graft.ext.Bpe.bpeTokenize(spark, sf)
      .agg(sum(col("bpe_tokens"))).as[Long].head()
    assert(ev.map(_.getAs[Long]("bpe_tokens")).sum == totalBpe)
  }

  test("dataset card: one source's figures recompute driver-side; " +
      "cards cover every source exactly once") {
    val cards = graft.SparkEntry.queries("x85_dataset_card")(spark, sf)
      .collect()
    val docs = graft.ingest.Tables.load(spark, sf, "documents")
      .select(col("source"), col("text")).as[(String, String)].collect()
    assert(cards.map(_.getAs[String]("source")).toSet ==
      docs.map(_._1).toSet)
    val src = cards.head.getAs[String]("source")
    val texts = docs.filter(_._1 == src).map(_._2)
    val tokLists = texts.map(_.split(" ", -1).toSeq)
    val card = cards.find(_.getAs[String]("source") == src).get
    assert(card.getAs[Long]("n_docs") == texts.length.toLong)
    val tokenSum = tokLists.map(_.length.toLong).sum
    assert(card.getAs[Long]("token_sum") == tokenSum)
    assert(card.getAs[Long]("mean_tokens_permille") ==
      tokenSum * 1000 / texts.length)
    assert(card.getAs[Long]("short_docs") ==
      tokLists.count(_.length < 20).toLong)
    val dupMass = texts.groupBy(identity).values
      .filter(_.length > 1).map(_.length.toLong).sum
    assert(card.getAs[Long]("dup_docs") == dupMass)
    val occ = tokLists.flatten.groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    assert(card.getAs[Long]("distinct_tokens") == occ.size.toLong)
    val (topTok, topOcc) = occ.toSeq.minBy { case (t, n) => (-n, t) }
    assert(card.getAs[String]("top_token") == topTok)
    assert(card.getAs[Long]("top_token_occ") == topOcc)
  }

  test("rank_eval: judgments recompute from analyzed term frequencies; " +
      "set metrics are the exact floor ratios") {
    val m = graft.SparkEntry.queries("x84_rank_eval")(spark, sf).collect()
    assert(m.length == 3)
    val toks = graft.ingest.Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        graft.functions.AnalyzeTokens.analyze(col("text")).as("toks"))
      .as[(Long, Seq[String])].collect()
    for (r <- m) {
      val t = r.getAs[String]("term")
      val tfs = toks.map { case (_, tk) => tk.count(_ == t) }
        .filter(_ > 0)
      assert(r.getAs[Long]("n_relevant") == tfs.count(_ >= 2).toLong, t)
      val atK = r.getAs[Long]("n_rel_at_k")
      assert(atK >= 0 && atK <= 10)
      assert(r.getAs[Long]("precision_ppm") == atK * 1000000L / 10, t)
      assert(r.getAs[Long]("recall_ppm") ==
        atK * 1000000L / r.getAs[Long]("n_relevant"), t)
      val mrr = r.getAs[Long]("mrr_ppm")
      assert(mrr >= 0 && mrr <= 1000000)
      assert(r.getAs[Double]("dcg") > 0)
    }
  }

  test("random projection: native sketch equals an independent driver " +
      "replay; the JL norm ratio concentrates at 1") {
    import graft.functions.RademacherSketch
    val out = graft.SparkEntry.queries("x81_random_projection")(spark, sf)
      .collect()
    val vecs = graft.ingest.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toMap
    assert(out.length == vecs.size)
    var ratioSum = 0.0
    for (r <- out) {
      val id = r.getAs[Long]("vec_id")
      val m = vecs(id).map(v => RademacherSketch.freezeMicro(v.toDouble))
      val signs = RademacherSketch.signMatrix(m.length, 16)
      for (j <- 0 until 16) {
        val want = m.indices.map(d =>
          if (signs(j)(d) > 0) m(d) else -m(d)).sum
        assert(r.getAs[Long](s"p$j") == want, s"vec $id p$j")
      }
      val inN = m.map(x => x * x).sum
      assert(r.getAs[Long]("in_normsq") == inN, s"vec $id in_normsq")
      val outN = (0 until 16).map { j =>
        val p = r.getAs[Long](s"p$j"); p * p
      }.sum
      assert(r.getAs[Long]("out_normsq") == outN, s"vec $id out_normsq")
      ratioSum += outN.toDouble / (16.0 * inN)
    }
    val meanRatio = ratioSum / out.length
    assert(meanRatio > 0.8 && meanRatio < 1.2,
      s"JL mean norm ratio $meanRatio out of band")
  }

  test("x97 ivf+pq: every reported ADC score replays driver-side from " +
      "the codebooks (codes, LUT cells, integer sum)") {
    import spark.implicits._
    val emb = graft.ingest.Tables.load(spark, sf, "embeddings")
    val books = graft.ext.Similarity.pqCodebooks(emb, 4, 4, 16, 2)
    val vecs = emb.select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect()
      .map { case (id, v) => id -> v.map(_.toDouble) }.toMap
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def sub(v: Array[Double], s: Int): Array[Double] =
      v.slice(s * 16, (s + 1) * 16)
    def d2(a: Array[Double], b: Seq[Double]): Double =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    def code(v: Array[Double], s: Int): Int =
      (0 until 4).map(c => (r6(d2(sub(v, s), books(s)(c))), c)).min._2
    def micro(x: Double): Long =
      (BigDecimal(r6(x)).setScale(6) * 1000000).toLongExact
    val out = graft.ext.Similarity.ivfPqSearch(spark, sf)
      .select($"query_id", $"cand_id", $"adc_micro", $"rn")
      .as[(Long, Long, Long, Int)].collect()
    assert(out.nonEmpty)
    for ((q, cand, adc, _) <- out) {
      val want = (0 until 4).map { s =>
        micro(d2(sub(vecs(q), s), books(s)(code(vecs(cand), s))))
      }.sum
      assert(adc == want, s"query $q cand $cand")
    }
    // per-query results ascend in (adc, cand)
    for ((_, rows) <- out.groupBy(_._1)) {
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(r => (r._3, r._2)).sliding(2).forall(p =>
        p.length < 2 || (p(0)._1 < p(1)._1 ||
          (p(0)._1 == p(1)._1 && p(0)._2 < p(1)._2))))
    }
  }

  test("x101 multi_match: the best_fields + tie_breaker fusion law holds " +
      "per row and the second field genuinely contributes") {
    import spark.implicits._
    val out = graft.ext.TextAnalysis.multiMatchBestFields(spark, sf)
      .select($"doc_id",
        $"title_score", $"body_score", $"score_hmicro", $"rank")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        r.getLong(3), r.getInt(4)))
    assert(out.length == 20)
    def micro(o: Option[Double]): Long = o.map(v =>
      (BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        * 1000000).toLongExact).getOrElse(0L)
    for ((id, ts, bs, hm, _) <- out) {
      val (a, b) = (micro(ts), micro(bs))
      assert(hm == 2 * math.max(a, b) + math.min(a, b), s"doc $id")
    }
    // ranks strictly follow (score desc, doc_id)
    assert(out.sortBy(_._5).sliding(2).forall(p => p.length < 2 ||
      p(0)._4 > p(1)._4 || (p(0)._4 == p(1)._4 && p(0)._1 < p(1)._1)))
    // the tie_breaker leg is load-bearing: some page row has both fields
    assert(out.exists(r => r._2.isDefined && r._3.isDefined))
  }

  test("x100 token budget: the allocation sheet replays driver-side; " +
      "both capped and uncapped epoch legs are populated") {
    import spark.implicits._
    val out = graft.ext.TextAnalysis.tokenBudget(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    val toks = graft.ingest.Tables.load(spark, sf, "documents")
      .select($"source", $"text").as[(String, String)].collect()
      .groupBy(_._1).view.mapValues(
        _.map(_._2.split(" ").count(_.nonEmpty).toLong).sum).toMap
    def microSqrt(n: Long): Long =
      (BigDecimal(math.sqrt(n.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP) * 1000000).toLongExact
    val totalTokens = toks.values.sum
    val totalMicro = toks.values.map(microSqrt).sum
    for ((src, tokens, sm, planned, permille, fin) <- out) {
      assert(tokens == toks(src), src)
      assert(sm == microSqrt(tokens), src)
      assert(planned == 3 * totalTokens * sm / totalMicro, src)
      assert(permille == math.min(planned * 1000 / tokens, 3000L), src)
      assert(fin == tokens * permille / 1000, src)
    }
    assert(out.exists(_._5 == 3000L) && out.exists(_._5 < 3000L))
  }

  test("x95 pagerank: the integer power iteration replays driver-side " +
      "from the shared kNN edge list") {
    import spark.implicits._
    val (edgeDf, nodeDf) = graft.ext.Similarity.knnGraph(spark, sf, 8, 2, 4)
    val edges = edgeDf.as[(Long, Long)].collect()
    val nodes = nodeDf.select($"vec_id").as[Long].collect()
    val outdeg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    var pr = nodes.map(_ -> 1000000000L).toMap
    for (_ <- 1 to 6) {
      val inbox = scala.collection.mutable.Map.empty[Long, Long]
      for ((s, d) <- edges)
        inbox(d) = inbox.getOrElse(d, 0L) + pr(s) / outdeg(s)
      pr = nodes.map(n =>
        n -> (150000000L + 85L * inbox.getOrElse(n, 0L) / 100L)).toMap
    }
    val want = nodes.map(n => (n, pr(n)))
      .sortBy { case (n, p) => (-p, n) }.take(20)
    val got = graft.ext.Similarity.pageRank(spark, sf)
      .select($"vec_id", $"pr_nano").as[(Long, Long)].collect()
    assert(got.toSeq == want.toSeq)
    // the graph is non-trivial: some node concentrates > 2x base mass
    assert(want.head._2 > 2000000000L)
  }

  test("x133 label propagation: the 4 synchronous modal-label rounds " +
      "replay driver-side; communities coarsen monotonically vs labels") {
    import spark.implicits._
    val (edgeDf, nodeDf) = graft.ext.Similarity.knnGraph(spark, sf, 8, 2, 4)
    val und = edgeDf.as[(Long, Long)].collect()
      .map { case (s, d) => (math.min(s, d), math.max(s, d)) }.distinct
    val adj = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val nodes = nodeDf.select($"vec_id").as[Long].collect()
    var lab = nodes.map(n => n -> n).toMap
    for (_ <- 1 to 4) {
      val next = adj.groupBy(_._1).map { case (u, nbrs) =>
        val hist = nbrs.map(e => lab(e._2))
          .groupBy(identity).view.mapValues(_.length).toSeq
        // modal label, ties toward the smallest label
        u -> hist.minBy { case (l, c) => (-c, l) }._1
      }
      lab = nodes.map(n => n -> next.getOrElse(n, lab(n))).toMap
    }
    val got = graft.ext.Similarity.labelProp(spark, sf)
      .select($"vec_id", $"label").as[(Long, Long)].collect()
    assert(got.toSeq == nodes.sorted.map(n => (n, lab(n))).toSeq)
    // non-trivial communities formed: fewer labels than nodes, and the
    // largest community has > 2 members
    val sizes = lab.values.groupBy(identity).view.mapValues(_.size)
    assert(sizes.size < nodes.length)
    assert(sizes.values.max > 2)
  }

  test("x107 curriculum: round-robin stratified easiest-first order " +
      "replays driver-side") {
    import spark.implicits._
    val docs = graft.ingest.Tables.load(spark, sf, "documents")
      .select($"doc_id", $"source",
        size(split($"text", " ")).cast("long")).as[(Long, String, Long)]
      .collect()
    val staged = docs.groupBy(_._2).values.flatMap { grp =>
      grp.sortBy(d => (d._3, d._1)).zipWithIndex
        .map { case ((id, src, diff), i) => (i + 1, src, id, diff) }
    }.toSeq
    val want = staged.sortBy { case (st, src, id, _) => (st, src, id) }
      .take(200).zipWithIndex
      .map { case ((st, src, id, diff), i) => (i + 1, id, src, st, diff) }
    val got = graft.ext.TextAnalysis.curriculum(spark, sf)
      .as[(Int, Long, String, Int, Long)].collect().toSeq
    assert(got == want)
    // every source contributes its stage-k docs before any stage-k+1
    val perSourceStages = got.groupBy(_._3).view.mapValues(_.map(_._4))
    for ((_, stages) <- perSourceStages)
      assert(stages == stages.sorted)
  }

  test("x106 bloom decontamination: no false negatives, planted " +
      "contamination found, FP rate bounded") {
    val df = graft.ext.TextAnalysis.bloomDecontaminate(spark, sf)
    // the Bloom guarantee: every exact hit is also a Bloom hit
    assert(df.where(col("bloom_hits") < col("exact_hits")).count() == 0)
    val agg = df.agg(sum("n_spans"), sum("bloom_hits"), sum("exact_hits"))
      .head()
    val (nSpans, bloom, exact) =
      (agg.getLong(0), agg.getLong(1), agg.getLong(2))
    assert(exact > 0)
    // k=2 of m=2^20 with a small benchmark: clean-span FP rate << 1%
    assert((bloom - exact).toDouble / (nSpans - exact) < 0.01,
      s"fp=${bloom - exact} of ${nSpans - exact}")
  }

  test("x104/x105: triangle census and adamic-adar replay driver-side " +
      "from the shared undirected kNN edge list") {
    import spark.implicits._
    val (edgeDf, nodeDf) = graft.ext.Similarity.knnGraph(spark, sf, 8, 2, 4)
    val und = edgeDf.as[(Long, Long)].collect()
      .map { case (s, d) => (math.min(s, d), math.max(s, d)) }.distinct.toSeq
    val bucketOf = nodeDf.as[(Long, Long)].collect().toMap
    val undSet = und.toSet
    val adj = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = adj.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val byA = und.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    var triPerBucket = Map.empty[Long, Long].withDefaultValue(0L)
    for ((a, nbrs) <- byA; b <- nbrs; c <- nbrs if c > b && undSet((b, c)))
      triPerBucket += bucketOf(a) -> (triPerBucket(bucketOf(a)) + 1L)
    val wedgePerBucket = deg.toSeq.groupBy { case (v, _) => bucketOf(v) }
      .view.mapValues(_.map { case (_, d) => d * (d - 1) / 2 }.sum).toMap
    val got = graft.ext.Similarity.triangleCensus(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.map(_._1).toSeq == got.map(_._1).toSeq.sorted)
    for ((bucket, nNodes, nEdges, wedges, tri, ppm) <- got) {
      assert(nNodes == bucketOf.values.count(_ == bucket).toLong)
      assert(nEdges == und.count { case (a, _) => bucketOf(a) == bucket }.toLong)
      assert(wedges == wedgePerBucket.getOrElse(bucket, 0L))
      assert(tri == triPerBucket(bucket))
      assert(ppm == (if (wedges > 0) 3000000L * tri / wedges else 0L))
    }
    // the kNN graph actually closes triangles (mutual-neighbor clusters)
    assert(got.map(_._5).sum > 0)

    val nbrsOf = adj.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val lnNano = deg.view
      .mapValues(d => math.floor(math.log(d.toDouble) * 1e9).toLong).toMap
    val scores = scala.collection.mutable.Map.empty[(Long, Long), (Long, Long)]
    for ((z, ns) <- nbrsOf; a <- ns; b <- ns if b > a && !undSet((a, b))) {
      val (cn, aa) = scores.getOrElse((a, b), (0L, 0L))
      scores((a, b)) = (cn + 1L, aa + 1000000000000000000L / lnNano(z))
    }
    val want = scores.toSeq.map { case ((a, b), (cn, aa)) => (a, b, cn, aa) }
      .sortBy { case (a, b, _, aa) => (-aa, a, b) }.take(30)
    val gotAa = graft.ext.Similarity.adamicAdar(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(gotAa == want)
  }

  test("x109 exact-substring excision equals the brute-force sliding " +
      "k-gram dup scan with merged islands") {
    val k = 12
    val docs = graft.ingest.Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1) }.toMap
    val occ = scala.collection.mutable.Map.empty[String, Int]
    for ((_, ts) <- toks; i <- 0 to ts.length - k) {
      val g = ts.slice(i, i + k).mkString(" ")
      occ(g) = occ.getOrElse(g, 0) + 1
    }
    val want = toks.map { case (id, ts) =>
      val starts = (0 to ts.length - k)
        .filter(i => occ(ts.slice(i, i + k).mkString(" ")) >= 2)
      var ivs = List.empty[(Int, Int)]
      for (s <- starts) ivs = ivs match {
        case (a, b) :: rest if s <= b => (a, math.max(b, s + k)) :: rest
        case _ => (s, s + k) :: ivs
      }
      val merged = ivs.reverse
      val kept = ts.zipWithIndex.collect {
        case (t, p) if !merged.exists(iv => p >= iv._1 && p < iv._2) => t
      }.mkString(" ")
      id -> ((ts.length.toLong, merged.size.toLong,
        merged.map { case (a, b) => (b - a).toLong }.sum, kept))
    }
    val got = Dedup.exactSubstrExcise(spark, sf)
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got == want)
    assert(got.values.exists(_._3 > 0), "no duplicated substrings at this SF")
    // islands really merge: some doc has fewer islands than dup starts
    assert(got.values.exists(v => v._2 >= 1 && v._3 > k))
  }

  test("x110 gopher rules match a driver-side recompute of every metric " +
      "and the battery actually splits the corpus") {
    val docs = graft.ingest.Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val stop = Set("the", "a", "of", "and", "to", "in", "is")
    val want = docs.map { case (id, t) =>
      val ts = t.split(" ", -1)
      val n = ts.length.toLong
      val meanW = ts.map(_.length.toLong).sum * 1000 / n
      val stopN = ts.count(stop).toLong
      val bigrams = ts.sliding(2).filter(_.length == 2)
        .map(_.mkString(" ")).toSeq
      val top2 =
        if (bigrams.isEmpty) 0L
        else bigrams.groupBy(identity).values.map(_.size).max.toLong *
          1000000 / bigrams.size
      val tri = ts.sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toVector
      val cnt = tri.groupBy(identity).view.mapValues(_.size).toMap
      val starts = tri.zipWithIndex.collect {
        case (g, i) if cnt(g) >= 2 => i
      }
      var ivs = List.empty[(Int, Int)]
      for (s <- starts) ivs = ivs match {
        case (a, b) :: rest if s <= b => (a, math.max(b, s + 3)) :: rest
        case _ => (s, s + 3) :: ivs
      }
      val dup3 = ivs.map { case (a, b) => (b - a).toLong }.sum * 1000000 / n
      val keep = n >= 30 && n <= 100000 && meanW >= 3000 &&
        meanW <= 10000 && stopN >= 2 && top2 <= 200000 && dup3 <= 180000
      id -> ((n, meanW, stopN, top2, dup3, keep))
    }.toMap
    val got = TextAnalysis.gopherRules(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    assert(got == want)
    assert(got.values.exists(_._6) && got.values.exists(!_._6),
      "the battery must both keep and drop at this SF")
  }

  test("x112 semantic pack: centroid-outward order within label and the " +
      "exact x55 boundary convention, every doc packed once") {
    val rows = Similarity.semanticPack(spark, sf)
      .as[(Int, Long, Long, Double, Long, Long)].collect()
    assert(rows.length == 500 && rows.map(_._3).distinct.length == 500)
    for ((_, rs0) <- rows.groupBy(_._1)) {
      val rs = rs0.sortBy(r => (r._2, r._6))
      // pack order is cohesion-descending, vec_id tie-broken
      assert(rs.sliding(2).filter(_.length == 2).forall(p =>
        p(0)._4 > p(1)._4 || (p(0)._4 == p(1)._4 && p(0)._3 < p(1)._3)))
      // x55 boundary convention: context = cum div 512, offset = cum mod
      var cum = 0L
      for (r <- rs) {
        assert(r._2 == cum / 512 && r._6 == cum % 512, r.toString)
        cum += r._5
      }
    }
    // the packing is genuinely multi-context per label
    assert(rows.groupBy(_._1).values.exists(_.map(_._2).distinct.length > 1))
  }

  test("x113 triplets: labels obey the pos/neg contract, margins are " +
      "the frozen micro difference, every anchor mined") {
    val labels = graft.ingest.Tables.load(spark, sf, "embeddings")
      .select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    val rows = Similarity.tripletMining(spark, sf)
      .as[(Long, Int, Long, Double, Long, Int, Double, Long)].collect()
    assert(rows.length == 50 && rows.map(_._1).distinct.length == 50)
    for ((a, aLab, posId, posSim, negId, negLab, negSim, margin) <- rows) {
      assert(labels(a) == aLab && labels(posId) == aLab)
      assert(labels(negId) == negLab && negLab != aLab)
      assert(posId != a && negId != a)
      def micro(d: Double): Long =
        BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .*(BigDecimal(1000000)).toLongExact
      assert(margin == micro(posSim) - micro(negSim))
    }
    // hard negatives are genuinely hard on random-ish clusters: some
    // margins are small or negative, and some positive
    assert(rows.exists(_._8 > 0))
  }

  test("x114 silhouette: every label reported once, micro-sums bounded " +
      "by n x the extrema, distances genuinely two-sided") {
    val rows = Similarity.silhouette(spark, sf)
      .as[(Int, Long, Long, Double, Double)].collect()
    val nLabels = graft.ingest.Tables.load(spark, sf, "embeddings")
      .select(countDistinct($"label")).as[Long].head()
    assert(rows.length == nLabels)
    assert(rows.map(_._2).sum == 500)
    for ((_, n, sumMicro, mn, mx) <- rows) {
      assert(mn <= mx)
      assert(sumMicro >= (BigDecimal(mn) * 1000000).toLong * n - n)
      assert(sumMicro <= (BigDecimal(mx) * 1000000).toLong * n + n)
      assert(mn >= -1.0 && mx <= 1.0)
    }
  }

  test("x115 fertility: per-language sums replay from the per-doc " +
      "tokenizer, floor-div fertility, every language present") {
    val rows = TextAnalysis.tokenizerFertility(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    val docs = graft.ingest.Tables.load(spark, sf, "documents")
      .select($"lang", $"text").as[(String, String)].collect()
    val byLang = docs.groupBy(_._1)
    assert(rows.length == byLang.size)
    val tokRe = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]".r
    for ((lang, nDocs, toks, chars, fert) <- rows) {
      val grp = byLang(lang)
      assert(nDocs == grp.length)
      assert(toks == grp.map(d => tokRe.findAllIn(d._2).length.toLong).sum)
      assert(chars == grp.map(_._2.length.toLong).sum)
      assert(fert == toks * 10000 / chars, lang)
    }
  }

  test("x117 winnowing: pairs replay a brute per-doc winnow (df cap and " +
      "threshold included), and a planted shared run guarantees a " +
      "shared fingerprint") {
    import java.security.MessageDigest
    def winnow(text: String, k: Int, w: Int): Set[Long] = {
      val toks = text.split(" ", -1)
      val n = toks.length - k + 1
      if (n <= 0) return Set.empty
      val md = MessageDigest.getInstance("MD5")
      val hs = Array.tabulate(n) { i =>
        val d = md.digest(toks.slice(i, i + k).mkString(" ")
          .getBytes("UTF-8"))
        md.reset()
        ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      }
      (0 until math.max(n - w + 1, 1))
        .map(s => hs.slice(s, math.min(s + w, n)).min).toSet
    }
    val docs = graft.ingest.Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val sel = docs.map { case (id, t) => id -> winnow(t, 3, 4) }.toMap
    val dfreq = sel.values.flatten.toSeq.groupBy(identity)
      .map { case (h, o) => h -> o.size }
    val expected = (for {
      (a, sa) <- sel.toSeq
      (b, sb) <- sel.toSeq
      if a < b
      shared = (sa.filter(dfreq(_) <= 50) intersect
        sb.filter(dfreq(_) <= 50)).size
      if shared >= 3
    } yield (a, b, shared.toLong)).sortBy(p => (p._1, p._2))
    val got = Dedup.winnowingPairs(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == expected)
    // the winnowing guarantee: docs sharing >= w+k-1 = 6 consecutive
    // tokens share at least one selected fingerprint
    val run = "alpha beta gamma delta epsilon zeta"
    val a = winnow(s"one two $run three four five six seven", 3, 4)
    val b = winnow(s"nine ten eleven twelve $run thirteen", 3, 4)
    assert((a intersect b).nonEmpty)
  }

  test("x118 matryoshka: level-64 recall is exactly 1e6 and every " +
      "(query, level) row replays from a brute double fold") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    def cos(a: Array[Float], b: Array[Float], l: Int): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < l) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / math.sqrt(na) / math.sqrt(nb)
    }
    def r6(d: Double): Double =
      new JBD(d).setScale(6, RoundingMode.HALF_UP).doubleValue
    val emb = graft.ingest.Tables.load(spark, sf, "embeddings")
      .select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect()
    val qs = emb.filter(_._1 < 10)
    def topk(q: (Long, Array[Float]), l: Int): Set[Long] =
      emb.filter(_._1 != q._1)
        .map { case (id, v) => (id, r6(cos(q._2, v, l))) }
        .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1).toSet
    val rows = Similarity.matryoshkaRecall(spark, sf)
      .as[(Long, Int, Long, Long)].collect()
    assert(rows.length == 30)
    for ((qid, level, nHit, ppm) <- rows) {
      val full = topk(qs.find(_._1 == qid).get, 64)
      val lvl = topk(qs.find(_._1 == qid).get, level)
      assert(nHit == (lvl intersect full).size.toLong, s"$qid/$level")
      assert(ppm == nHit * 1000000L / 5)
      if (level == 64) assert(ppm == 1000000L)
    }
  }

  test("kq93 rescore: exactly the top-20 first-pass docs are rescored " +
      "and re-sorted by fp + 2*sec; rows 21-50 keep first-pass order") {
    val out = graft.SparkEntry.queries("kq93_rescore")(spark, sf)
      .as[(Long, Long, Option[Long], Option[Long], Long)].collect()
    assert(out.length == 50)
    assert(out.map(_._5).toSeq == (1L to 50L))
    val (win, rest) = out.partition(_._3.isDefined)
    assert(win.length == 20 && rest.length == 30)
    // the rescore window comes first and is sorted by (combined, doc_id)
    assert(out.take(20).forall(_._3.isDefined))
    assert(win.sortBy(r => (-r._4.get, r._1)).toSeq == win.toSeq)
    assert(rest.sortBy(r => (-r._2, r._1)).toSeq == rest.toSeq)
    // window membership = top-20 of the 50 by first-pass order
    val top20 = out.sortBy(r => (-r._2, r._1)).take(20).map(_._1).toSet
    assert(win.map(_._1).toSet == top20)
    win.foreach(r => assert(r._4.get == r._2 + 2 * r._3.get))
  }

  test("x119 scene cuts: per-video lag deltas replay from the x82 " +
      "closed form; frame 0 is NULL; cuts are exactly delta > 200") {
    val rows = Multimodal.sceneCuts(spark, sf)
      .as[(Long, Long, Long, Option[Long], Option[Long])].collect()
    def dims(id: Long) = ((8 + id % 9).toInt, (8 + (id / 9) % 9).toInt)
    def total(id: Long, f: Int): Long = {
      val (w, h) = dims(id)
      (0L until w.toLong * h * 3)
        .map(i => (id * 131 + f * 17 + i * 29) % 256).sum
    }
    val byMedia = rows.groupBy(_._1)
    for ((id, frames) <- byMedia) {
      val sorted = frames.sortBy(_._2)
      assert(sorted.length == 4 + id % 5)
      assert(sorted.head._4.isEmpty && sorted.head._5.isEmpty)
      for (Array(p, c) <- sorted.sliding(2)) {
        assert(c._3 == total(id, c._2.toInt))
        assert(c._4.contains(math.abs(c._3 - p._3)))
        assert(c._5.contains(if (c._4.get > 200) 1L else 0L))
      }
    }
    // non-degenerate: the fixture has both cuts and non-cuts
    val flags = rows.flatMap(_._5)
    assert(flags.contains(1L) && flags.contains(0L))
  }

  test("x120 k-core: the fixed-round peel has CONVERGED on the fixture " +
      "and equals the brute fixpoint 3-core of the threshold graph") {
    val edges = Similarity.embedNearDupPairs(spark, sf, threshold = 0.30)
      .select($"d1", $"d2").as[(Long, Long)].collect()
    val adj = scala.collection.mutable.Map
      .empty[Long, scala.collection.mutable.Set[Long]]
    for ((a, b) <- edges) {
      adj.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
      adj.getOrElseUpdate(b, scala.collection.mutable.Set.empty) += a
    }
    var alive = adj.keySet.toSet
    var changed = true
    while (changed) {
      val drop = alive.filter(u => adj(u).count(alive) < 3)
      changed = drop.nonEmpty
      alive = alive -- drop
    }
    val expected = alive.toSeq.sorted
      .map(u => (u, adj(u).count(alive).toLong))
    val got = Similarity.kCore(spark, sf).as[(Long, Long)].collect().toSeq
    assert(got == expected)
    assert(got.nonEmpty && got.size < adj.size) // a real, partial core
    assert(got.forall(_._2 >= 3))
  }

  test("kq93 rescore survives off-fixture corpora: empty and 1-token " +
      "docs (the x56 descending-sequence ANSI trap) score sec = 0") {
    val work = java.nio.file.Files.createTempDirectory("kq93-edge")
    try {
      val docs = (0L until 60L).map { i =>
        val text = i % 4 match {
          case 0 => ""                       // 1 empty token
          case 1 => "merge"                  // 1 token
          case 2 => "merge slow"             // exactly one phrase hit
          case _ => "merge a merge slow b"   // fp 2, sec 1
        }
        (i, text, "en", "src0", text.length.toLong)
      }
      docs.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$work/documents.parquet")
      val out = graft.SparkEntry.queries("kq93_rescore")(spark,
        work.toString)
        .as[(Long, Long, Option[Long], Option[Long], Long)].collect()
      assert(out.length == 50)
      // fp: case 3 -> 2, cases 1/2 -> 1, case 0 -> 0; the top-20 window
      // is the 15 case-3 docs + 5 of the fp=1 docs by doc_id
      val byDoc = docs.map(d => d._1 -> d._2).toMap
      def phraseCount(t: String): Long = {
        val toks = t.split(" ", -1)
        (0 until toks.length - 1)
          .count(i => toks(i) == "merge" && toks(i + 1) == "slow").toLong
      }
      for ((id, fp, sec, comb, _) <- out) {
        val t = byDoc(id)
        assert(fp == t.split(" ", -1).count(_ == "merge").toLong, id)
        sec.foreach { sc =>
          assert(sc == phraseCount(t), id)
          assert(comb.contains(fp + 2 * sc))
        }
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(work.toFile)
    }
  }

  test("kq97 alert throttle: emissions replay the greedy per-user fold " +
      "(first alert, then first >= last emitted + period)") {
    val got = graft.SparkEntry.queries("kq97_alert_throttle")(spark, sf)
      .as[(Long, Long)].collect().toSeq
    val errs = graft.ingest.Tables.load(spark, sf, "events")
      .where(col("event_type") === "error")
      .select($"user_id", unix_micros($"ts")).as[(Long, Long)].collect()
    val period = 21600000000L
    val expected = errs.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      var last = Long.MinValue
      rows.map(_._2).sorted.flatMap { us =>
        if (last == Long.MinValue || us >= last + period) {
          last = us; Some((u, us))
        } else None
      }
    }.sorted
    assert(got == expected)
    // throttling genuinely suppresses (fewer emissions than alerts)
    assert(got.size < errs.length && got.nonEmpty)
  }

  test("x122 unigram entropy: nano-nat entropy and TTR replay from a " +
      "brute count + 9dp ln freeze") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    def ln9(x: Long): Long = JBD.valueOf(math.log(x.toDouble))
      .setScale(9, RoundingMode.HALF_UP).movePointRight(9).longValueExact
    val rows = TextAnalysis.unigramEntropy(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    val toks = graft.ingest.Tables.load(spark, sf, "documents")
      .select($"source", $"text").as[(String, String)].collect()
      .flatMap { case (s, t) => t.split(" ", -1).map(s -> _) }
    val bySrc = toks.groupBy(_._1)
    assert(rows.length == bySrc.size)
    for ((src, n, vocab, ent, ttr) <- rows) {
      val counts = bySrc(src).groupBy(_._2).map(_._2.size.toLong)
      val nn = counts.sum
      assert(n == nn && vocab == counts.size.toLong)
      val hsum = counts.map(c => c * (ln9(nn) - ln9(c))).sum
      assert(ent == hsum / nn, src)
      assert(ttr == vocab * 1000 / nn)
      assert(ent >= 0)
    }
  }

  test("kq98 point-in-time state: the as-of head replays per key and " +
      "post-cutoff drift is flagged on both sides") {
    val rows = graft.SparkEntry.queries("kq98_pit_state")(spark, sf)
      .select($"key", $"pit_offset", $"cur_offset", $"changed_after")
      .as[(String, Long, Long, Long)].collect()
    val env = graft.Pipeline.envelopeFlat(spark, sf)
      .select($"key", $"offset", unix_micros($"timestamp"))
      .as[(String, Long, Long)].collect()
    val cut = env.map(_._2).max / 2
    val byKey = env.groupBy(_._1)
    val expectKeys = byKey.filter(_._2.exists(_._2 <= cut)).keySet
    assert(rows.map(_._1).toSet == expectKeys)
    for ((k, pit, cur, changed) <- rows) {
      val g = byKey(k)
      assert(pit == g.filter(_._2 <= cut).maxBy(r => (r._3, r._2))._2)
      assert(cur == g.maxBy(r => (r._3, r._2))._2)
      assert(changed == (if (cur > pit) 1L else 0L))
    }
    assert(rows.exists(_._4 == 1L) && rows.exists(_._4 == 0L) ||
      rows.forall(_._4 == 1L)) // fixture: most keys keep moving
  }

  test("x123 FIM: PSM reassembly is lossless — prefix+middle+suffix " +
      "rebuilds every document; cuts in range; short docs pass through") {
    val rows = TextAnalysis.fimSplit(spark, sf)
      .as[(Long, Long, Option[Long], Option[Long], Long, String)].collect()
    val orig = graft.ingest.Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    for ((id, n, c1, c2, applied, psm) <- rows) {
      if (applied == 0L) {
        assert(n < 3 && psm == orig(id))
      } else {
        assert(c1.get >= 1 && c1.get <= c2.get && c2.get <= n - 1)
        val m = "<PRE> (.*) <SUF> (.*) <MID>( (.*))?".r
        psm match {
          case m(pre, suf, _, mid) =>
            val middle = Option(mid).getOrElse("")
            val rebuilt = (pre.split(" ") ++
              (if (middle.isEmpty) Array.empty[String]
               else middle.split(" ")) ++ suf.split(" ")).mkString(" ")
            assert(rebuilt == orig(id), id)
            assert(pre.split(" ").length == c1.get)
          case _ => fail(s"bad PSM shape for $id: $psm")
        }
      }
    }
    assert(rows.count(_._5 == 1L) == rows.length ||
      rows.exists(_._5 == 1L)) // fixture docs are all >= 3 tokens
  }

  test("x124 span corruption: substituting each target span back for " +
      "its sentinel rebuilds the original document exactly") {
    val rows = TextAnalysis.spanCorruption(spark, sf)
      .as[(Long, Long, Long, Long, String, String)].collect()
    val orig = graft.ingest.Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    for ((id, n, nSpans, corrupted, input, target) <- rows) {
      if (nSpans == 0L) {
        assert(n < 10 && input == orig(id) && target.isEmpty)
      } else {
        assert(corrupted == nSpans * 3)
        // parse the target into sentinel -> 3-token span
        val sent = "<X_(\\d+)>".r
        val parts = sent.split(target).map(_.trim).filter(_.nonEmpty)
        val ids = sent.findAllMatchIn(target).map(_.group(1)).toSeq
        assert(ids == (0L until nSpans).map(_.toString))
        assert(parts.length == nSpans &&
          parts.forall(_.split(" ").length == 3))
        val subst = ids.zip(parts).toMap
        val rebuilt = input.split(" ").flatMap { tok =>
          sent.findFirstMatchIn(tok) match {
            case Some(mm) => subst(mm.group(1)).split(" ")
            case None => Array(tok)
          }
        }.mkString(" ")
        assert(rebuilt == orig(id), id)
      }
    }
    assert(rows.exists(_._3 > 1L)) // multi-span docs occur
  }

  test("x125 audio segments: every segment replays from a brute decode " +
      "(fixed windows, msq threshold, maximal runs)") {
    val got = Multimodal.audioSegments(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    val expected = graft.ingest.Tables.load(spark, sf, "documents")
      .select($"doc_id").as[Long].collect().sorted.toSeq.flatMap { id =>
      val wavB = Multimodal.syntheticWav(id)
      val wins = Multimodal.wavWindowEnergies(wavB, 16)
      val active = wins.filter { case (_, n, e) => e / n > 349525L }
      // maximal runs of consecutive window indices
      val segs = active.foldLeft(List.empty[List[(Int, Long, Long)]]) {
        case (acc, w) => acc match {
          case head :: tail if head.head._1 == w._1 - 1 =>
            (w :: head) :: tail
          case _ => List(w) :: acc
        }
      }.reverse.map(_.reverse)
      segs.zipWithIndex.map { case (ws, i) =>
        (id, (i + 1).toLong, ws.head._1.toLong, ws.last._1.toLong,
          ws.size.toLong, ws.map(_._3).sum)
      }
    }
    assert(got == expected)
    assert(got.exists(_._5 > 1L)) // multi-window segments occur
  }

  test("kq100 tiered rollup: tiers are disjoint on the aligned cutoff " +
      "and the union equals the single-tier series") {
    val rows = graft.SparkEntry.queries("kq100_tiered_rollup")(spark, sf)
      .as[(Long, String, Long, Long, String)].collect()
    val cut = rows.filter(_._5 == "raw").map(_._1).min
    assert(cut % 21600000000L == 0)
    assert(rows.filter(_._5 == "rollup").forall(_._1 < cut))
    assert(rows.filter(_._5 == "raw").forall(_._1 >= cut))
    // the union is the plain one-tier aggregate
    val env = graft.Pipeline.envelopeFlat(spark, sf)
      .where(col("event_type").isNotNull)
      .select(expr("(unix_micros(timestamp) div 21600000000)" +
        " * 21600000000").as("b"), col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("c"))
      .as[(Long, String, Long)].collect()
    val brute = env.groupBy(r => (r._1, r._2)).map { case ((b, t), g) =>
      (b, t, g.size.toLong, g.map(_._3).sum)
    }.toSet
    assert(rows.map(r => (r._1, r._2, r._3, r._4)).toSet == brute)
    assert(rows.exists(_._5 == "rollup") && rows.exists(_._5 == "raw"))
  }

  test("x116 length bins: bins tile the corpus, every doc inside its " +
      "bin's half-open range, waste reconciles") {
    val rows = TextAnalysis.lengthBins(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.length >= 3, s"fixture spread too narrow: ${rows.length}")
    assert(rows.map(_._2).sum == 500)
    val tokRe = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]".r
    val toks = graft.ingest.Tables.load(spark, sf, "documents")
      .select($"text").as[String].collect()
      .map(t => math.max(tokRe.findAllIn(t).length.toLong, 1L))
    for ((binHi, nDocs, sumTok, padded, waste) <- rows) {
      assert(binHi % 16 == 0 && binHi >= 16)
      val inBin = toks.filter(t => t > binHi - 16 && t <= binHi)
      assert(inBin.length == nDocs && inBin.sum == sumTok, binHi)
      assert(padded == binHi * nDocs)
      assert(waste == (padded - sumTok) * 10000 / padded)
    }
  }
}
