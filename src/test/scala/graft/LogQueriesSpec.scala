package graft

import org.apache.spark.sql.functions._

import graft.model.Envelope
import graft.query.LogQueries

class LogQueriesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val env = Pipeline.envelope(spark, sf)

  test("Q1a discover page: time-descending, bounded, within range") {
    val page = LogQueries.discoverPage(env,
      lit("2024-01-01").cast("timestamp"), lit("2030-01-01").cast("timestamp"), 25)
    val ts = page.select($"timestamp").as[java.sql.Timestamp].collect()
    assert(ts.length == 25)
    assert(ts.sliding(2).forall(p => !p(0).before(p(1))))
  }

  test("Q1b discover histogram: buckets sum to total row count") {
    val hist = LogQueries.discoverHistogram(env, "hour")
    val total = hist.agg(sum($"n")).as[Long].head()
    assert(total == env.count())
  }

  test("Q2 search key: only that key, across all topics") {
    val hits = LogQueries.searchKey(env, "13")
    assert(hits.count() > 0)
    assert(hits.select($"key").distinct().as[String].collect().toSeq == Seq("13"))
  }

  test("Q3 search key+topic conjunction") {
    val hits = LogQueries.searchKeyTopic(env, "7", "events")
    assert(hits.count() > 0)
    assert(hits.where($"topic" =!= "events" || $"key" =!= "7").count() == 0)
  }

  test("Q4 structured field search and JSON-path search agree") {
    val structured = LogQueries.searchField(env, "event_type", "error")
    val viaJson = LogQueries.searchJson(env, Pipeline.ValueJsonField,
      "$.event_type", "error")
    assert(structured.count() == viaJson.count())
    assert(structured.count() > 0)
  }

  test("Q5 tombstones: deletions visible as rows, payload fields null") {
    val tombs = LogQueries.tombstones(env, Pipeline.ValueJsonField)
    assert(tombs.count() > 0)
    assert(tombs.where($"message.event_type".isNotNull).count() == 0)
    assert(tombs.select($"message.${Pipeline.ValueJsonField}")
      .distinct().as[String].collect().toSeq == Seq(Envelope.Tombstone))
  }

  test("kq27's unpartitioned window reads the BOUNDED post-aggregation " +
      "bucket frame, never the raw envelope") {
    // the pipeline-aggs cumulative sum/derivative window is global by
    // semantics (a cumulative sum has no partition key) — the scale
    // contract is that its INPUT is the hourly aggregate, bounded by the
    // time range (one row per hour), not by data volume. Pin the plan
    // shape: every WindowExec's subtree must contain the hash aggregate
    // that collapses the envelope to buckets BEFORE the window.
    // (string-order check: a tree prints parents before children, so
    // Window-before-HashAggregate-before-FileScan pins the shape; the
    // AQE wrapper hides the subtree from a structural collect)
    val df = SparkEntry.queries("kq27_pipeline_aggs")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    val wIdx = plan.indexOf("Window ")
    assert(wIdx >= 0, plan)
    val aggIdx = plan.indexOf("HashAggregate", wIdx)
    assert(aggIdx > wIdx, plan) // the grouped aggregate sits BELOW the window
    val scanIdx = plan.indexOf("FileScan", wIdx)
    assert(scanIdx > aggIdx, plan) // and the raw scan only below the aggregate
    // and the bound holds numerically: window input rows == distinct
    // hour buckets <= hours in the fixture's one-month range — invariant
    // across scale factors, while the envelope row count is not
    val buckets = Pipeline.envelopeFlat(spark, sf)
      .select(date_trunc("hour", $"timestamp")).distinct().count()
    assert(df.count() == buckets)
    assert(buckets <= 744)
  }

  test("search_after: page 2 by keyset equals rows 101..200 of the global " +
      "order; cursor predicate pushed to the scan; plan stays top-k") {
    val flat = Pipeline.envelopeFlat(spark, sf)
    val all = flat.orderBy($"timestamp".desc, $"offset".desc).limit(200)
      .select($"timestamp", $"offset")
      .as[(java.sql.Timestamp, Long)].collect()
    val (cursorTs, cursorOff) = all(99)
    val page2 = LogQueries.searchAfter(flat,
      lit(cursorTs), lit(cursorOff), 100)
    val got = page2.select($"timestamp", $"offset")
      .as[(java.sql.Timestamp, Long)].collect()
    assert(got.toSeq == all.drop(100).toSeq)
    // deep pages stay O(page): distributed top-k, not a global sort, and
    // the cursor inequality evaluates in the scan stage BELOW the envelope
    // projection (string order: parents before children, so top-k, then
    // Filter, then the raw scan; the derived nanos->micros timestamp keeps
    // it out of parquet PushedFilters but inside whole-stage codegen)
    val plan = page2.queryExecution.executedPlan.toString
    val topkIdx = plan.indexOf("TakeOrderedAndProject")
    assert(topkIdx >= 0, plan)
    val filterIdx = plan.indexOf("Filter", topkIdx)
    assert(filterIdx > topkIdx, plan)
    assert(plan.indexOf("Scan parquet", filterIdx) > filterIdx, plan)
  }

  test("composite agg: page equals the bucket-stream slice after the " +
      "cursor; the after-key filter sits below the aggregate") {
    val flat = Pipeline.envelopeFlat(spark, sf)
    val page = LogQueries.compositeAgg(flat, "event_type", "key",
      Some(("error", "42")), 20)
    val got = page.select($"event_type", $"key", $"doc_count")
      .as[(String, String, Long)].collect()
    // reference: the FULL bucket stream, sliced strictly after the cursor
    val full = flat.where($"event_type".isNotNull && $"key".isNotNull)
      .groupBy($"event_type", $"key").agg(count(lit(1)).as("doc_count"))
      .orderBy($"event_type", $"key")
      .as[(String, String, Long)].collect()
    val want = full.dropWhile { case (t, k, _) =>
      t < "error" || (t == "error" && k <= "42") }.take(20)
    assert(got.toSeq == want.toSeq)
    // the cursor filters GROUPING keys, so Catalyst pushes it below the
    // aggregate (optimized tree prints Aggregate before its Filter child)
    val opt = page.queryExecution.optimizedPlan.toString
    val aggIdx = opt.indexOf("Aggregate")
    val filterIdx = opt.indexOf("Filter", aggIdx)
    assert(aggIdx >= 0 && filterIdx > aggIdx, opt)
  }

  test("auto_date_histogram: buckets cover every row, rung is the " +
      "smallest ladder entry fitting the budget") {
    val flat = Pipeline.envelopeFlat(spark, sf)
    val hist = LogQueries.autoDateHistogram(flat, 100)
    assert(hist.agg(sum($"n")).as[Long].head() == flat.count())
    val intervals = hist.select($"interval_sec").distinct().as[Long].collect()
    assert(intervals.length == 1)
    val ladder = Seq(60L, 300L, 900L, 3600L, 10800L, 43200L, 86400L, 604800L)
    assert(ladder.contains(intervals.head))
    assert(hist.count() <= 100)
    // the NEXT-smaller rung must overflow the budget (else it'd be chosen)
    val (lo, hi) = flat.agg(min($"timestamp".cast("long")),
      max($"timestamp".cast("long"))).as[(Long, Long)].head()
    ladder.takeWhile(_ < intervals.head).lastOption.foreach { smaller =>
      assert(hi / smaller - lo / smaller + 1 > 100)
    }
  }

  test("extended_stats: every moment matches an exact integer-cents " +
      "reference, bit-for-bit including variance and std") {
    val flat = Pipeline.envelopeFlat(spark, sf)
    val got = LogQueries.extendedStats(flat)
      .select($"event_type", $"n", $"min_v", $"max_v", $"sum_v", $"avg_v",
        $"var_pop", $"std_pop")
      .as[(String, Long, Double, Double, Double, Double, Double, Double)]
      .collect()
    val cents = flat.where($"value".isNotNull)
      .select($"event_type",
        ($"value".cast("decimal(18,2)") * 100).cast("long"))
      .as[(String, Long)].collect().groupBy(_._1)
    assert(got.map(_._1).toSet == cents.keySet)
    for ((et, n, minV, maxV, sumV, avgV, varP, stdP) <- got) {
      val vs = cents(et).map(_._2)
      val (s1, s2) = (vs.sum, vs.map(v => v * v).sum)
      assert(n == vs.length)
      assert(minV == vs.min.toDouble / 100 && maxV == vs.max.toDouble / 100)
      assert(sumV == s1.toDouble / 100)
      assert(avgV == s1.toDouble / 100 / n)
      val expectVar = (n * s2 - s1 * s1).toDouble / (n.toDouble * n * 10000)
      assert(varP == expectVar && stdP == math.sqrt(expectVar), et)
    }
  }

  test("matrix_stats: moment numerators match an exact BigInt reference; " +
      "correlation is the pinned cov/sqrt/sqrt; zero variance -> null") {
    val flat = Pipeline.envelopeFlat(spark, sf)
    val got = LogQueries.matrixStats(flat)
      .select($"event_type", $"n", $"mean_x", $"mean_y", $"cov_num",
        $"varx_num", $"vary_num", $"corr")
      .collect()
    val raw = flat.where($"value".isNotNull)
      .select($"event_type",
        ($"value".cast("decimal(18,2)") * 100).cast("long"),
        hour($"timestamp").cast("long"))
      .as[(String, Long, Long)].collect().groupBy(_._1)
    assert(got.map(_.getString(0)).toSet == raw.keySet)
    got.foreach { r =>
      val vs = raw(r.getString(0))
      val n = BigInt(vs.length)
      val sx = vs.map(v => BigInt(v._2)).sum
      val sy = vs.map(v => BigInt(v._3)).sum
      val sxx = vs.map(v => BigInt(v._2) * v._2).sum
      val syy = vs.map(v => BigInt(v._3) * v._3).sum
      val sxy = vs.map(v => BigInt(v._2) * v._3).sum
      assert(r.getLong(1) == vs.length)
      assert(r.getDouble(2) == sx.toDouble / 100 / vs.length)
      assert(r.getDouble(3) == sy.toDouble / vs.length)
      val (cov, vx, vy) = (n * sxy - sx * sy, n * sxx - sx * sx,
        n * syy - sy * sy)
      assert(r.getLong(4) == cov.toLong && r.getLong(5) == vx.toLong &&
        r.getLong(6) == vy.toLong, r.getString(0))
      assert(r.getDouble(7) ==
        cov.toDouble / math.sqrt(vx.toDouble) / math.sqrt(vy.toDouble))
    }
    // a constant field yields vary_num = 0 → NULL correlation, not ±inf
    val const = Seq(("a", 1.00, "2024-01-01 05:00:00"),
        ("a", 2.00, "2024-01-01 05:30:00"))
      .toDF("event_type", "value", "t")
      .select($"event_type", $"value", to_timestamp($"t").as("timestamp"))
    val row = LogQueries.matrixStats(const).collect().head
    assert(row.getLong(6) == 0L && row.isNullAt(7))
  }

  test("bucket_script: ppm is the exact integer floor-division of the " +
      "sibling metrics; one aggregate, script above it") {
    val flat = Pipeline.envelopeFlat(spark, sf)
    val rows = LogQueries.bucketScript(flat)
      .select($"total", $"errors", $"error_ppm")
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    for ((total, errors, ppm) <- rows) {
      assert(errors <= total)
      assert(ppm == errors * 1000000L / total)
    }
    // exactly one aggregate in the plan — the script is a projection
    val plan = LogQueries.bucketScript(flat)
      .queryExecution.optimizedPlan.toString
    assert("Aggregate \\[".r.findAllIn(plan).size == 1, plan)
  }

  test("adjacency_matrix: cells match independent filter counts; " +
      "intersections bounded by their margins") {
    val flat = Pipeline.envelopeFlat(spark, sf)
    val (a, b, c, ac, bc) = LogQueries.adjacencyMatrix(flat)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(a == flat.where($"event_type" === "click").count())
    assert(b == flat.where($"event_type" === "purchase").count())
    assert(c == flat.where($"value" > 20).count())
    assert(ac == flat.where($"event_type" === "click" && $"value" > 20).count())
    assert(bc == flat.where($"event_type" === "purchase" && $"value" > 20).count())
    assert(ac <= math.min(a, c) && bc <= math.min(b, c))
  }

  test("percentile_ranks: counts match direct filters; ranks of the kq14 " +
      "percentile values invert correctly") {
    val flat = Pipeline.envelopeFlat(spark, sf)
    val row = LogQueries.percentileRanks(flat)
      .select($"n", $"n_le_10", $"n_le_25", $"n_le_50",
        $"pct_10", $"pct_25", $"pct_50")
      .as[(Long, Long, Long, Long, Double, Double, Double)].head()
    val (n, le10, le25, le50, p10, p25, p50) = row
    assert(n == flat.where($"value".isNotNull).count())
    assert(le10 == flat.where($"value" <= 10).count())
    assert(le25 == flat.where($"value" <= 25).count())
    assert(le50 == flat.where($"value" <= 50).count())
    assert(p10 == le10.toDouble * 100 / n)
    assert(le10 <= le25 && le25 <= le50 && p10 <= p25 && p25 <= p50)
  }

  test("weighted_avg: equals the exact cents-x-weight ratio computed " +
      "driver-side; weights come from the JSON payload") {
    val flat = Pipeline.envelopeFlat(spark, sf)
    val got = LogQueries.weightedAvg(flat)
      .select($"event_type", $"n", $"sw", $"weighted_avg")
      .as[(String, Long, Long, Double)].collect()
    val raw = flat.where($"value".isNotNull && $"props".isNotNull)
      .select($"event_type",
        ($"value".cast("decimal(18,2)") * 100).cast("long"),
        get_json_object($"props", "$.k").cast("long"))
      .as[(String, Long, Long)].collect().groupBy(_._1)
    assert(got.nonEmpty && got.map(_._1).toSet == raw.keySet)
    for ((et, n, sw, wavg) <- got) {
      val rs = raw(et)
      assert(n == rs.length)
      assert(sw == rs.map(_._3).sum)
      val swv = rs.map(r => r._2 * r._3).sum
      assert(wavg == swv.toDouble / 100 / sw, et)
    }
  }

  test("categorize_text: categories are digit-free 5-token prefixes, " +
      "counts cover every message, examples are minimal uids") {
    val flat = Pipeline.envelopeFlat(spark, sf)
    val cats = LogQueries.categorizeText(flat)
      .select($"category", $"doc_count", $"example_uid")
      .as[(String, Long, String)].collect()
    assert(cats.map(_._2).sum == flat.count())
    for ((cat, _, _) <- cats) {
      val toks = cat.split(" ", -1).filter(_.nonEmpty)
      assert(toks.length <= 5)
      assert(toks.forall(t => !t.forall(_.isDigit)))
    }
    // every category key replays from its example doc's message
    val byUid = flat.select($"uid", $"value_json")
      .as[(String, String)].collect().toMap
    for ((cat, _, uid) <- cats) {
      val want = byUid(uid).toLowerCase
        .split("[^a-z0-9]+").filter(_.nonEmpty)
        .filterNot(_.forall(_.isDigit)).take(5).mkString(" ")
      assert(cat == want, uid)
    }
  }

  test("field collapse: one row per key, the top hit is that key's most " +
      "recent record, inner-hit counts are the true group sizes") {
    val page = SparkEntry.queries("kq54_collapse")(spark, sf)
      .select($"key", $"uid", $"n_hits")
      .as[(String, String, Long)].collect()
    assert(page.nonEmpty && page.length <= 20)
    assert(page.map(_._1).distinct.length == page.length) // collapsed
    val flat = Pipeline.envelopeFlat(spark, sf)
    for ((k, uid, n) <- page.take(3)) {
      val grp = flat.where($"key" === k)
        .select($"timestamp", $"offset", $"uid")
        .as[(java.sql.Timestamp, Long, String)].collect()
      assert(n == grp.length, k)
      // Discover sort: timestamp DESC, offset DESC, uid ASC tiebreak
      val micros = (t: java.sql.Timestamp) =>
        t.getTime * 1000 + (t.getNanos % 1000000) / 1000
      val want = grp.sortBy(r => (-micros(r._1), -r._2, r._3)).head._3
      assert(uid == want, k)
    }
  }

  test("percolate: per-query match sets equal direct predicate filters; " +
      "a record matching several stored queries emits once per query") {
    val out = SparkEntry.queries("kq55_percolate")(spark, sf)
      .as[(Int, String)].collect()
    val flat = Pipeline.envelopeFlat(spark, sf)
    val q2 = flat.where($"event_type".startsWith("p"))
      .select($"uid").as[String].collect().toSet
    assert(out.filter(_._1 == 2).map(_._2).toSet == q2)
    val q4 = flat.where($"value" < 10 || $"event_type" === "signup")
      .select($"uid").as[String].collect().toSet
    assert(out.filter(_._1 == 4).map(_._2).toSet == q4)
    assert(out.groupBy(_._2).exists(_._2.size > 1))
  }

  test("moving_fn models: ewma/linear/holt replay bit-for-bit from the " +
      "bucket counts (dyadic ewma, pinned left-assoc holt sequence)") {
    val out = SparkEntry.queries("kq58_moving_model")(spark, sf)
      .select($"n", $"ewma24", $"lin_num", $"lin_den", $"holt1")
      .as[(Long, Double, Long, Long, Double)].collect()
    val ns = out.map(_._1)
    for (i <- ns.indices) {
      val win = ns.slice(math.max(0, i - 23), i + 1)
      // ES MovingFunctions.ewma: seed = first value, then a*(x)+(1-a)*avg
      var avg = win.head.toDouble
      for (x <- win.tail) avg = (x.toDouble + avg) / 2
      assert(out(i)._2 == avg, s"ewma at $i")
      // linearWeightedAvg numerator/denominator, exact integers
      val num = win.zipWithIndex.map { case (v, j) => v * (j + 1L) }.sum
      assert(out(i)._3 == num && out(i)._4 == win.length * (win.length + 1L) / 2)
      // holt: s1=v1, b1=0; s'=((x+s)+b)/2, b'=((s'-s)+b)/2 — the exact
      // IEEE sequence the entry and the DuckDB oracle both execute
      var s = win.head.toDouble; var b = 0.0
      for (x <- win.tail) {
        val s2 = (x.toDouble + s + b) / 2
        b = (s2 - s + b) / 2
        s = s2
      }
      assert(out(i)._5 == s + b, s"holt at $i")
    }
    // the short-prefix windows (k < 24) are genuinely exercised
    assert(ns.length > 24)
  }

  test("geo: the integer-interleave geohash equals the canonical " +
      "bisection algorithm; nearest-k replays driver-side") {
    val alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    // canonical geohash: alternating lon/lat range bisection, in exact
    // integer micro-degrees scaled x1024 so midpoints stay integral
    def reference(latU: Long, lonU: Long): String = {
      var laLo = -90000000L * 1024; var laHi = 90000000L * 1024
      var loLo = -180000000L * 1024; var loHi = 180000000L * 1024
      val bits = new StringBuilder
      var lonTurn = true
      while (bits.length < 20) {
        if (lonTurn) {
          val mid = (loLo + loHi) / 2
          if (lonU * 1024 >= mid) { bits.append('1'); loLo = mid }
          else { bits.append('0'); loHi = mid }
        } else {
          val mid = (laLo + laHi) / 2
          if (latU * 1024 >= mid) { bits.append('1'); laLo = mid }
          else { bits.append('0'); laHi = mid }
        }
        lonTurn = !lonTurn
      }
      val cell = java.lang.Long.parseLong(bits.toString, 2)
      (3 to 0 by -1).map(i => alpha(((cell >> (i * 5)) & 31).toInt)).mkString
    }
    val pts = graft.query.Geo.pointsWithGeohash(spark, sf)
      .select($"c_custkey", $"lat_u", $"lon_u", $"geohash4")
      .as[(Long, Long, Long, String)].collect()
    assert(pts.nonEmpty)
    for ((k, la, lo, gh) <- pts)
      assert(gh == reference(la, lo), s"customer $k ($la, $lo)")
    // nearest-k: independent driver-side bbox + d2 ranking
    val want = pts
      .filter(p => p._2 >= 10000000L && p._2 <= 60000000L &&
        p._3 >= -30000000L && p._3 <= 40000000L)
      .map(p => (p._1, (p._2 - 48856600L) * (p._2 - 48856600L) +
        (p._3 - 2352200L) * (p._3 - 2352200L)))
      .sortBy { case (k2, d2) => (d2, k2) }.take(10).map(_._1).toSeq
    val got = SparkEntry.queries("kq60_geo_distance")(spark, sf)
      .select($"c_custkey").as[Long].collect().toSeq
    assert(got == want)
  }

  test("geotile: tile assignment matches the standard Web-Mercator " +
      "formula; antimeridian and pole clamps pinned") {
    val b1 = graft.query.Geo.YBounds.head     // top boundary (~+84.55°)
    val bLast = graft.query.Geo.YBounds.last  // bottom boundary (~-84.55°)
    // planted knife-edges: (lat_u, lon_u) -> expected (tx, ty)
    val edges = Seq(
      (90000000L, 180000000L, 63L, 0L),  // north pole; antimeridian east
      (90000000L, -180000000L, 0L, 0L),  // antimeridian west
      (-90000000L, 0L, 32L, 63L),        // south pole clamp
      (0L, 0L, 32L, 32L),                // equator exactly ON boundary 32
      (b1, 179999999L, 63L, 1L),         // exactly ON the top boundary
      (b1 + 1, 0L, 32L, 0L),             // 1 µdeg above: arctic cap
      (bLast, 0L, 32L, 63L),             // exactly ON the bottom boundary
      (86000000L, 0L, 32L, 0L))          // beyond the ±85.05° limit: clamp
    val planted = graft.query.Geo.withGeotile(
        edges.map(e => (e._1, e._2)).toDF("lat_u", "lon_u"))
      .select($"lat_u", $"lon_u", $"tx", $"ty", $"tile")
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    for ((la, lo, tx, ty) <- edges) {
      assert(planted((la, lo)) == ((tx, ty, s"6/$tx/$ty")),
        s"edge ($la, $lo): got ${planted((la, lo))}, want ($tx, $ty)")
    }
    // fixture sweep vs an INDEPENDENT double-math reference (the textbook
    // asinh-form slippy formula + clamp). The boundary literals are
    // rounded to the nearest µdeg, so the two can differ only for a lat
    // exactly equal to a literal — those edges are pinned above.
    def stdTy(latU: Long): Long = {
      val latRad = math.toRadians(latU / 1e6)
      val y = (1.0 - math.log(math.tan(latRad) + 1.0 / math.cos(latRad))
        / math.Pi) / 2.0 * 64
      math.max(0L, math.min(63L, math.floor(y).toLong))
    }
    val bounds = graft.query.Geo.YBounds.toSet
    val pts = graft.query.Geo.pointsWithGeotile(spark, sf)
      .select($"lat_u", $"lon_u", $"tx", $"ty")
      .as[(Long, Long, Long, Long)].collect()
    assert(pts.nonEmpty)
    for ((la, lo, tx, ty) <- pts) {
      assert(tx == math.min(63L, (lo + 180000000L) * 64 / 360000000L),
        s"tx at lon $lo")
      if (!bounds.contains(la))
        assert(ty == stdTy(la), s"ty at lat $la")
    }
    // the fixture genuinely exercises both polar clamps at this sf
    assert(pts.exists(_._4 == 0L) && pts.exists(_._4 == 63L))
  }

  test("ip_prefix: /16 buckets replay from an independent md5 " +
      "derivation; top-20 ordering and per-bucket counts exact") {
    def ip32(userId: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ip:$userId".getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(4).map(b => f"$b%02x").mkString, 16)
    }
    val events = graft.ingest.Tables.load(spark, sf, "events")
      .select($"user_id").as[Long].collect()
    val expected = events
      .map { u => val ip = ip32(u)
        (s"${ip >> 24}.${(ip >> 16) % 256}.0.0/16", u, ip) }
    val hist = expected.groupBy(_._1).map { case (p, rs) =>
      (p, rs.length.toLong, rs.map(_._2).distinct.length.toLong,
        rs.map(_._3).min, rs.map(_._3).max) }
      .toSeq.sortBy { case (p, n, _, _, _) => (-n, p) }.take(20)
    val got = SparkEntry.queries("kq108_ip_prefix")(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == hist)
  }

  test("seasonal anomaly: the integer z^2 cross-multiplication replays " +
      "driver-side and both verdicts are populated") {
    val out = SparkEntry.queries("kq62_anomaly")(spark, sf)
      .select($"hh", $"n", $"cnt", $"s", $"dev", $"var_num", $"is_anomaly")
      .as[(Int, Long, Long, Long, Long, Long, Boolean)].collect()
    assert(out.exists(_._7) && out.exists(!_._7))
    // profile re-derivation: per hour-of-day, cnt/s recompute from the
    // bucket rows themselves
    val byHh = out.groupBy(_._1)
    for ((hh, rows) <- byHh) {
      assert(rows.forall(_._3 == rows.length), s"cnt at $hh")
      assert(rows.forall(_._4 == rows.map(_._2).sum), s"s at $hh")
      val ss = rows.map(r => r._2 * r._2).sum
      for (r <- rows) {
        assert(r._5 == r._2 * r._3 - r._4)
        assert(r._6 == r._3 * ss - r._4 * r._4)
        assert(r._7 == (r._5 * r._5 > 9 * r._6), s"verdict at $hh")
      }
    }
  }

  test("function_score: linear recency decay times value factor replays " +
      "driver-side; ranking is the exact integer product") {
    val out = SparkEntry.queries("kq63_function_score")(spark, sf)
      .select($"uid", $"age_us", $"cents", $"decay_ppm", $"score")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.length == 20)
    val scale = 604800000000L
    for ((uid, age, cents, ppm, score) <- out) {
      assert(ppm == math.max(scale - age, 0L) * 1000000L / scale, uid)
      assert(score == cents * ppm, uid)
    }
    // descending by score with uid tiebreak
    assert(out.sliding(2).forall(p =>
      p(0)._5 > p(1)._5 || (p(0)._5 == p(1)._5 && p(0)._1 < p(1)._1)))
  }

  test("downsample: daily figures from the hourly rollup equal raw-to-" +
      "daily directly (mergeability), rollup stays bucket-bounded") {
    val out = SparkEntry.queries("kq64_downsample")(spark, sf)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val raw = Pipeline.envelopeFlat(spark, sf)
      .where($"event_type".isNotNull)
      .select(date_format($"timestamp", "yyyy-MM-dd"), $"event_type",
        $"value".cast("decimal(18,2)").multiply(lit(100)).cast("long"))
      .as[(String, String, Long)].collect()
    val byKey = raw.groupBy(r => (r._1, r._2))
    assert(out.keySet == byKey.keySet)
    for ((k, rows) <- byKey) {
      val cents = rows.map(_._3)
      assert(out(k) == ((cents.length.toLong, cents.sum, cents.min,
        cents.max)), k)
    }
    // the rollup granularity is hours x types — bounded however many
    // raw events exist
    val hourlyGroups = Pipeline.envelopeFlat(spark, sf)
      .where($"event_type".isNotNull)
      .select(date_trunc("hour", $"timestamp"), $"event_type")
      .distinct().count()
    assert(hourlyGroups <= 744L * 6)
  }

  test("terms_enum: prefix-filtered analyzed terms with true doc counts, " +
      "in index order") {
    val out = SparkEntry.queries("kq66_terms_enum")(spark, sf)
      .as[(String, Long)].collect()
    assert(out.nonEmpty && out.length <= 10)
    assert(out.forall(_._1.startsWith("s")))
    assert(out.map(_._1).sorted.toSeq == out.map(_._1).toSeq)
    val docs = graft.ingest.Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    for ((term, n) <- out)
      assert(n == docs.count(_._2.toLowerCase
        .split("[^a-z0-9]+").contains(term)), term)
  }

  test("cohort retention: the daily matrix replays driver-side from " +
      "(user, day) activity") {
    val out = SparkEntry.queries("kq67_retention")(spark, sf)
      .as[(String, Long, Int, Long, Long)].collect()
    assert(out.nonEmpty)
    val act = Pipeline.envelopeFlat(spark, sf)
      .select($"key", date_format(date_trunc("day", $"timestamp"),
        "yyyy-MM-dd"))
      .distinct().as[(String, String)].collect()
    val first = act.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val cohorts = first.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val fmt = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE
    def dayDiff(a: String, b: String): Long =
      java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.parse(a, fmt), java.time.LocalDate.parse(b, fmt))
    val cells = act.groupBy(r => (first(r._1), dayDiff(first(r._1), r._2)))
      .view.mapValues(_.map(_._1).distinct.size.toLong).toMap
    for ((c, nUsers, k, nActive, ppm) <- out) {
      assert(nUsers == cohorts(c), c)
      assert(nActive == cells((c, k.toLong)), s"$c k=$k")
      assert(ppm == nActive * 1000000 / nUsers)
    }
    // every (cohort, k<=6) cell with activity is present
    assert(out.length == cells.keys.count(_._2 <= 6))
    // retention genuinely decays somewhere (not a constant matrix)
    assert(out.map(_._5).distinct.length > 1)
  }

  test("gap detection: every reported silence replays from the raw " +
      "per-user timeline; nothing above threshold is missed in top-50") {
    val out = SparkEntry.queries("kq68_gap_detection")(spark, sf)
      .select($"key", unix_micros($"gap_start"), unix_micros($"gap_end"),
        $"gap_us")
      .as[(String, Long, Long, Long)].collect()
    assert(out.nonEmpty && out.length <= 50)
    val timeline = Pipeline.envelopeFlat(spark, sf)
      .select($"key", unix_micros($"timestamp"), $"offset")
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(r => (r._2, r._3)).map(_._2).toSeq).toMap
    val allGaps = (for {
      (k, ts) <- timeline.toSeq
      pair <- ts.sliding(2) if pair.length == 2
      a = pair(0); b = pair(1)
      if b - a > 43200000000L
    } yield (k, a, b, b - a))
      .sortBy(g => (-g._4, g._1, g._2))
    assert(out.toSeq == allGaps.take(out.length))
    for ((_, a, b, g) <- out) assert(g == b - a && g > 43200000000L)
  }

  test("kq69/kq70/kq71: string_stats entropy, Welch t, and MAD replay " +
      "driver-side from the raw envelope") {
    // kq69: entropy of the char distribution of 'click' props payloads
    val props = Pipeline.envelopeFlat(spark, sf)
      .where($"event_type" === "click" && $"props".isNotNull)
      .select($"props").as[String].collect()
    val counts = props.flatMap(_.toSeq).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val total = counts.values.sum
    def lnNano(x: Long) = math.floor(math.log(x.toDouble) * 1e9).toLong
    val klnk = counts.values.map(k => k * lnNano(k)).sum
    val wantEntropy = lnNano(total) - klnk / total
    val gotRow = SparkEntry.queries("kq69_string_stats")(spark, sf)
      .where($"event_type" === "click")
      .select($"total_chars", $"uniq_chars", $"entropy_nano")
      .as[(Long, Long, Long)].head()
    assert(gotRow == ((total, counts.size.toLong, wantEntropy)))

    // kq70: replay Welch t for the busiest day from the raw cents
    val byDay = Pipeline.envelopeFlat(spark, sf)
      .where($"value".isNotNull && $"event_type".isin("click", "purchase"))
      .select(date_trunc("day", $"timestamp").cast("string").as("d"),
        $"event_type",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("xc"))
      .as[(String, String, Long)].collect().groupBy(_._1)
    val (day, rows) = byDay.maxBy(_._2.length)
    val c = rows.filter(_._2 == "click").map(_._3)
    val p = rows.filter(_._2 == "purchase").map(_._3)
    val (n1, n2) = (c.length.toLong, p.length.toLong)
    val (sx1, sx2) = (c.sum, p.sum)
    val (sxx1, sxx2) = (c.map(x => BigInt(x) * x).sum, p.map(x => BigInt(x) * x).sum)
    val v1 = (BigInt(n1) * sxx1 - BigInt(sx1) * sx1).toLong
    val v2 = (BigInt(n2) * sxx2 - BigInt(sx2) * sx2).toLong
    val diff = (BigInt(sx1) * n2 - BigInt(sx2) * n1).toLong
    val wantT = diff.toDouble / (n1 * n2) /
      math.sqrt(v1.toDouble / (n1 * n1 * (n1 - 1)) +
        v2.toDouble / (n2 * n2 * (n2 - 1)))
    val gotT = SparkEntry.queries("kq70_t_test")(spark, sf)
      .where($"day".cast("string") === day)
      .select($"t_welch").as[Double].head()
    assert(gotT == wantT)

    // kq71: lower-median MAD replay for every event_type
    val vals = Pipeline.envelopeFlat(spark, sf)
      .where($"event_type".isNotNull && $"value".isNotNull)
      .select($"event_type", $"value").as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val got = SparkEntry.queries("kq71_mad")(spark, sf)
      .select($"event_type", $"n", $"median", $"mad")
      .as[(String, Long, Double, Double)].collect()
    assert(got.map(_._1).toSeq == vals.keys.toSeq.sorted)
    for ((et, n, med, mad) <- got) {
      val vs = vals(et)
      assert(n == vs.length.toLong)
      val wantMed = vs((vs.length + 1) / 2 - 1)
      assert(med == wantMed)
      val devs = vs.map(v => math.abs(v - wantMed)).sorted
      assert(mad == devs((devs.length + 1) / 2 - 1))
    }
  }

  test("kq72/kq73: linear interpolation and the diversified sample " +
      "replay driver-side") {
    // kq72: replay the per-type interpolation from the known buckets
    val rows = SparkEntry.queries("kq72_interpolate")(spark, sf)
      .select($"event_type",
        expr("unix_micros(bucket) div 3600000000"),
        $"n", $"interp_micro", $"interpolated")
      .as[(String, Long, Option[Long], Long, Boolean)].collect()
    assert(rows.exists(_._5), "no gaps at this SF — nothing interpolated")
    for ((et, tl) <- rows.groupBy(_._1)) {
      val known = tl.collect { case (_, hi, Some(n), _, _) => hi -> n }.toMap
      for ((_, hi, n, micro, interp) <- tl) n match {
        case Some(v) =>
          assert(!interp && micro == v * 1000000L)
        case None =>
          assert(interp, s"$et@$hi")
          val ph = known.keys.filter(_ < hi).max
          val nh = known.keys.filter(_ > hi).min
          val (pn, nn) = (known(ph), known(nh))
          val want =
            if (nn >= pn) pn * 1000000L + ((nn - pn) * (hi - ph) * 1000000L) / (nh - ph)
            else pn * 1000000L - ((pn - nn) * (hi - ph) * 1000000L) / (nh - ph)
          assert(micro == want, s"$et@$hi")
          val lo = math.min(pn, nn) * 1000000L
          val hi2 = math.max(pn, nn) * 1000000L
          assert(micro >= lo && micro <= hi2)
      }
    }

    // kq73: rebuild the diversity-capped top-100 sample and its terms
    val env = Pipeline.envelopeFlat(spark, sf)
      .select($"key", unix_micros($"timestamp"), $"offset", $"uid",
        $"event_type")
      .as[(String, Long, Long, String, Option[String])].collect()
    val capped = env.groupBy(_._1).values.flatMap(
      _.sortBy(r => (-r._2, -r._3, r._4)).take(2))
    val sample = capped.toSeq.sortBy(r => (-r._2, -r._3, r._4)).take(100)
    val want = sample.flatMap(_._5).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val got = SparkEntry.queries("kq73_diversified_sampler")(spark, sf)
      .as[(String, Long)].collect().toMap
    assert(got == want)
  }

  test("kq75 counter rate: replays the wrap-at-2e5 counter and " +
      "reset-aware deltas driver-side") {
    val samples = Pipeline.envelopeFlat(spark, sf)
      .select($"key", unix_micros($"timestamp"), $"offset",
        coalesce(($"value".cast("decimal(18,2)") * 100).cast("long"),
          lit(0L)))
      .as[(String, Long, Long, Long)].collect()
    val want = scala.collection.mutable.Map.empty[Long, (Long, Long, Long)]
    for ((_, tl) <- samples.groupBy(_._1)) {
      var run = 0L; var prev = Option.empty[Long]
      for ((_, us, _, cents) <- tl.sortBy(r => (r._2, r._3))) {
        run += cents
        val counter = run % 200000L
        val delta = prev match {
          case None => 0L
          case Some(p) if counter >= p => counter - p
          case Some(_) => counter
        }
        val reset = prev.exists(counter < _)
        val hour = us / 3600000000L
        val (n, inc, r) = want.getOrElse(hour, (0L, 0L, 0L))
        want(hour) = (n + 1, inc + delta, r + (if (reset) 1L else 0L))
        prev = Some(counter)
      }
    }
    val got = SparkEntry.queries("kq75_counter_rate")(spark, sf)
      .select(expr("unix_micros(bucket) div 3600000000"), $"n_samples",
        $"increase_cents", $"n_resets")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == want.toMap)
    assert(got.values.map(_._3).sum > 0, "no resets planted at this SF")
  }

  test("kq76 histogram_quantile: replays the cumulative-bucket walk and " +
      "integer interpolation driver-side") {
    val rows = Pipeline.envelopeFlat(spark, sf)
      .where($"value".isNotNull && $"event_type".isNotNull)
      .select($"event_type", date_trunc("day", $"timestamp").cast("string"),
        ($"value".cast("decimal(18,2)") * 100).cast("decimal(18,0)")
          .cast("long"))
      .as[(String, String, Long)].collect()
    val les = Seq(1000L, 2500L, 5000L, 10000L, 20000L, 99999L)
    def leOf(c: Long): Long = les.find(l => c <= l || l == 99999L).get
    val want = rows.groupBy(r => (r._1, r._2)).flatMap { case ((et, day), rs) =>
      val byLe = rs.groupBy(r => leOf(r._3)).view.mapValues(_.size.toLong).toMap
      val n = rs.size.toLong
      val present = les.filter(byLe.contains)
      Seq(50, 90, 99).map { phi =>
        var cum = 0L; var prevLe = 0L; var res = 0L; var done = false
        for (le <- present if !done) {
          val cnt = byLe(le); val cumPrev = cum; cum += cnt
          if (cum * 100 >= phi * n && cumPrev * 100 < phi * n) {
            res = if (le == 99999L) 20000L * 1000000L
            else prevLe * 1000000L +
              ((le - prevLe) * (phi * n - cumPrev * 100) * 1000000L) /
                (100L * cnt)
            done = true
          }
          prevLe = le
        }
        (et, day, phi) -> ((n, res))
      }
    }
    val got = SparkEntry.queries("kq76_histogram_quantile")(spark, sf)
      .select($"event_type", $"day".cast("string"), $"phi", $"n_samples",
        $"q_micro_cents")
      .as[(String, String, Int, Long, Long)].collect()
      .map(r => (r._1, r._2, r._3) -> ((r._4, r._5))).toMap
    assert(got == want.toMap)
    assert(got.nonEmpty)
  }

  test("kq77 boxplot: quartiles are order statistics (emitted values are " +
      "inputs) and whiskers respect the half-cent Tukey fences") {
    val rows = Pipeline.envelopeFlat(spark, sf)
      .where($"value".isNotNull && $"event_type".isNotNull)
      .select($"event_type", date_trunc("day", $"timestamp").cast("string"),
        $"value",
        ($"value".cast("decimal(18,2)") * 100).cast("decimal(18,0)")
          .cast("long"))
      .as[(String, String, Double, Long)].collect()
    val want = rows.groupBy(r => (r._1, r._2)).map { case (g, rs) =>
      val vals = rs.map(r => (r._3, r._4)).sortBy(_._1).toIndexedSeq
      val n = vals.size
      def at(r: Int) = vals(r - 1)
      val (q1, q1c) = at((n + 3) / 4)
      val (med, _) = at((n + 1) / 2)
      val (q3, q3c) = at((3 * n + 3) / 4)
      val loF = 2 * q1c - 3 * (q3c - q1c)
      val hiF = 2 * q3c + 3 * (q3c - q1c)
      val in = vals.filter(v => v._2 * 2 >= loF && v._2 * 2 <= hiF)
      g -> ((n.toLong, q1, med, q3, in.head._1, in.last._1,
        vals.count(v => v._2 * 2 < loF || v._2 * 2 > hiF).toLong))
    }
    val got = SparkEntry.queries("kq77_boxplot")(spark, sf)
      .select($"event_type", $"day".cast("string"), $"n_samples", $"q1",
        $"median", $"q3", $"whisker_lo", $"whisker_hi", $"n_outliers")
      .as[(String, String, Long, Double, Double, Double, Double, Double,
        Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6, r._7, r._8, r._9)))
      .toMap
    assert(got == want.toMap)
    assert(got.values.exists(_._7 > 0), "no outliers at this SF")
  }

  test("kq78 frequent_item_sets: supports equal the brute-force basket " +
      "scan at every set size") {
    val baskets = Pipeline.envelopeFlat(spark, sf)
      .where($"event_type".isNotNull)
      .select($"key", $"event_type").distinct()
      .as[(String, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val n = baskets.size.toLong
    val supports = scala.collection.mutable.Map.empty[Seq[String], Long]
    for ((_, items) <- baskets; sz <- 1 to 3;
         combo <- items.toSeq.sorted.combinations(sz))
      supports(combo) = supports.getOrElse(combo, 0L) + 1L
    val want = supports.collect {
      case (combo, sup) if sup * 10 >= n =>
        (combo.length, combo.mkString("+")) -> ((sup, sup * 1000000L / n))
    }.toMap
    // frequent supersets only from frequent subsets (anti-monotonicity
    // makes the frequent-1 prune lossless)
    val got = SparkEntry.queries("kq78_frequent_itemsets")(spark, sf)
      .as[(Int, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got == want)
    assert(got.keys.exists(_._1 == 3), "no frequent triple at this SF")
  }

  test("kq79 change_point: the division-free cusum argmax matches the " +
      "driver-side scan") {
    val counts = Pipeline.envelopeFlat(spark, sf)
      .where($"event_type".isNotNull)
      .groupBy($"event_type", date_trunc("hour", $"timestamp").as("b"))
      .agg(count(lit(1)).as("cnt"))
      .select($"event_type", $"b".cast("string"), $"cnt")
      .as[(String, String, Long)].collect()
    val want = counts.groupBy(_._1).collect { case (et, rs) if rs.length > 1 =>
      val series = rs.sortBy(_._2)
      val m = series.length.toLong
      val total = series.map(_._3).sum
      var p = 0L
      val cands = series.dropRight(1).zipWithIndex.map { case ((_, b, c), i) =>
        p += c
        (b, i + 1L, p, (m * p - (i + 1L) * total).abs)
      }
      val best = cands.minBy(c => (-c._4, c._1))
      et -> ((best._1, best._2, m, best._4, best._3, total - best._3,
        ((total - best._3) * best._2 - best._3 * (m - best._2)).sign))
    }
    val got = SparkEntry.queries("kq79_change_point")(spark, sf)
      .select($"event_type", $"cp_bucket".cast("string"), $"k_before",
        $"m_buckets", $"cusum_stat", $"left_sum", $"right_sum",
        $"direction")
      .as[(String, String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7, r._8))).toMap
    assert(got == want.toMap)
    assert(got.nonEmpty)
  }

  test("kq80 moving_percentiles: the trailing-7 lower median replays " +
      "driver-side and every emitted value is a window member") {
    val counts = Pipeline.envelopeFlat(spark, sf)
      .where($"event_type".isNotNull)
      .groupBy($"event_type", date_trunc("hour", $"timestamp").as("b"))
      .agg(count(lit(1)).as("cnt"))
      .select($"event_type", $"b".cast("string"), $"cnt")
      .as[(String, String, Long)].collect()
    val want = counts.groupBy(_._1).flatMap { case (et, rs) =>
      val series = rs.sortBy(_._2)
      series.indices.map { i =>
        val win = series.slice(math.max(0, i - 6), i + 1).map(_._3).sorted
        (et, series(i)._2) ->
          ((series(i)._3, win.length.toLong, win((win.length - 1) / 2)))
      }
    }
    val got = SparkEntry.queries("kq80_moving_median")(spark, sf)
      .select($"event_type", $"bucket".cast("string"), $"cnt", $"win_n",
        $"moving_median")
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got == want.toMap)
    // the window really fills to 7 somewhere
    assert(got.values.exists(_._2 == 7L))
  }

  test("kq81 variable_width_histogram: buckets split at the 4 largest " +
      "gaps, cover every event, and never overlap") {
    val got = SparkEntry.queries("kq81_variable_width_histogram")(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    val rows = Pipeline.envelopeFlat(spark, sf)
      .where($"event_type".isNotNull && $"value".isNotNull)
      .select($"event_type",
        ($"value".cast("decimal(18,2)") * 100).cast("decimal(18,0)")
          .cast("long"))
      .as[(String, Long)].collect()
    for ((et, rs) <- rows.groupBy(_._1)) {
      val cents = rs.map(_._2)
      val distinct = cents.distinct.sorted
      val gaps = distinct.sliding(2).collect { case Array(a, b) =>
        (b - a, b) }.toSeq
      val boundaries = gaps.sortBy { case (g, v) => (-g, v) }.take(4)
        .map(_._2).toSet
      val wantBuckets = distinct.map(v => v ->
        distinct.count(b => boundaries.contains(b) && b <= v).toLong).toMap
      val g = got.filter(_._1 == et).sortBy(_._2)
      assert(g.map(_._3).sum == cents.length.toLong)
      assert(g.map(_._2).toSeq == g.map(_._2).toSeq.sorted)
      for (Array(a, b) <- g.sliding(2).map(_.toArray))
        assert(a._5 < b._4, s"$et buckets overlap")
      for ((_, bucket, _, mn, mx) <- g) {
        assert(mn <= mx)
        assert(wantBuckets(mn) == bucket && wantBuckets(mx) == bucket)
      }
      assert(g.length == math.min(5, distinct.length))
    }
  }

  test("kq82 geo_centroid/bounds: centroids replay with sign-split " +
      "truncating division and sit inside their bounds") {
    val pts = graft.query.Geo.pointsWithGeohash(spark, sf)
      .select($"geohash4", $"lat_u", $"lon_u")
      .as[(String, Long, Long)].collect()
    def tz(n: Long, d: Long): Long = if (n >= 0) n / d else -((-n) / d)
    val want = pts.groupBy(_._1).map { case (gh, ps) =>
      gh -> ((ps.length.toLong,
        tz(ps.map(_._2).sum, ps.length), tz(ps.map(_._3).sum, ps.length),
        ps.map(_._2).min, ps.map(_._2).max,
        ps.map(_._3).min, ps.map(_._3).max))
    }
    val got = SparkEntry.queries("kq82_geo_centroid")(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.length == math.min(20, want.size))
    for ((gh, n, cla, clo, lmn, lmx, omn, omx) <- got) {
      assert(want(gh) == ((n, cla, clo, lmn, lmx, omn, omx)))
      assert(cla >= lmn && cla <= lmx && clo >= omn && clo <= omx)
    }
  }

  test("kq85 top_metrics: the per-type top-1 prunes via WindowGroupLimit " +
      "and matches the brute-force latest reading") {
    val df = SparkEntry.queries("kq85_top_metrics")(spark, sf)
    val rows = df.collect()
    assert(df.queryExecution.executedPlan.toString
      .contains("WindowGroupLimit"))
    def us(t: java.sql.Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.getNanos / 1000L
    val raw = Pipeline.envelopeFlat(spark, sf)
      .where($"event_type".isNotNull)
      .select($"event_type", $"timestamp", $"offset",
        ($"value".cast("decimal(18,2)") * 100).cast("decimal(18,0)")
          .cast("long"))
      .as[(String, java.sql.Timestamp, Long, Long)].collect()
    val want = raw.groupBy(_._1).view
      .mapValues(_.maxBy(r => (us(r._2), r._3))).toMap
    assert(rows.length == want.size)
    for (r <- rows) {
      val w = want(r.getString(0))
      assert(r.getTimestamp(1) == w._2 && r.getLong(2) == w._4)
    }
  }

  test("kq87 cumulative cardinality: monotone, ends at the total " +
      "distinct-user count, new_users sums to the same") {
    val rows = SparkEntry.queries("kq87_cumulative_cardinality")(spark, sf)
      .select($"new_users", $"cum_users").as[(Long, Long)].collect()
    val total = Pipeline.envelopeFlat(spark, sf)
      .select(countDistinct($"key")).as[Long].head()
    assert(rows.last._2 == total && rows.map(_._1).sum == total)
    assert(rows.scanLeft(0L)(_ + _._1).drop(1).sameElements(rows.map(_._2)))
  }

  test("latest-state view: one row per key, the max offset one") {
    val latest = LogQueries.latestStatePerKey(env)
    val keys = latest.groupBy($"key").count().where($"count" > 1).count()
    assert(keys == 0)
    // spot-check: key 13's surviving row has that key's max offset
    val maxOff = env.where($"key" === "13").agg(max($"offset")).as[Long].head()
    val got = latest.where($"key" === "13").select($"offset").as[Long].head()
    assert(got == maxOff)
  }
}
