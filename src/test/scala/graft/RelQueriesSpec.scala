package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sql.RelQueries

/** Plan-shape assertions: correctness is covered by the DuckDB oracle
  * (tools/local_verify.py); these tests pin the PHYSICAL plans we want at
  * scale — broadcast joins for dims, top-k instead of global sort, partial
  * hash aggregation, and filter pushdown to the parquet scan. */
class RelQueriesSpec extends SparkSpec {

  private def plan(df: DataFrame): String = {
    df.collect() // force AQE final plan
    df.queryExecution.executedPlan.toString
  }

  test("q2_topk plans as TakeOrderedAndProject (no global sort)") {
    val p = plan(RelQueries.q2TopK(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q3 star join broadcasts every dimension (no shuffle of the fact)") {
    val p = plan(RelQueries.q3JoinBroadcast(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q1_agg uses partial+final hash aggregation") {
    val p = plan(RelQueries.q1Agg(spark, sf))
    assert(p.contains("HashAggregate"), p)
  }

  test("changelog-table reads push filters down to the parquet scan") {
    val dir = java.nio.file.Files.createTempDirectory("sink").toString
    graft.sink.ChangelogSink.append(Pipeline.envelope(spark, sf), dir)
    val q = graft.sink.ChangelogSink.read(spark, dir).where(col("key") === "13")
    q.collect()
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(key), EqualTo(key,13)]"), scan)
  }

  test("sketch estimates bounded by exact counterparts (q20)") {
    // the error-bound booleans ARE the query output now (oracle-checkable:
    // DuckDB asserts them TRUE) — every group must report in-envelope
    val r = RelQueries.q20Sketch(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Boolean]("hll_within_15pct"),
        s"HLL estimate left its 15% envelope: $row")
      assert(row.getAs[Boolean]("approx_median_within_2"),
        s"approx median left its ±2.0 envelope: $row")
    }
  }

  test("every declared query returns rows with its declared columns") {
    RelQueries.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, name)
      // q13_anti legitimately returns 0 rows (every customer has orders at
      // some SFs); everything else must be non-empty
      if (name != "q13_anti") assert(df.count() > 0, s"$name returned 0 rows")
    }
  }

  test("q22 as-of join equals the brute-force inequality join; plan is a " +
      "single window pass (no nested-loop join)") {
    import org.apache.spark.sql.expressions.Window
    val ev = graft.ingest.Tables.load(spark, sf, "events")
    val sig = ev.where(col("event_type") === "signup")
      .select(col("user_id").as("su"), col("ts").as("sts"),
        col("event_id").as("sid"))
    // brute force: left inequality join, keep latest signup (ts, then id)
    val w = Window.partitionBy(col("event_id"))
      .orderBy(col("sts").desc_nulls_last, col("sid").desc_nulls_last)
    val brute = ev.where(col("event_type") =!= "signup")
      .join(sig, col("user_id") === col("su") && col("sts") <= col("ts"), "left")
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("event_id"), col("sid").as("sig_id"), col("sts").as("sig_ts"))
    val asof = RelQueries.q22AsofJoin(spark, sf)
      .select(col("event_id"), col("sig_id"), col("sig_ts"))
    assert(asof.except(brute).isEmpty && brute.except(asof).isEmpty,
      "as-of join disagrees with brute-force inequality join")
    val p = plan(RelQueries.q22AsofJoin(spark, sf))
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p)
    assert(p.contains("Window"), p)
  }

  test("q23 bucketed range join equals the brute-force interval join; no " +
      "nested-loop join in the plan") {
    val win = 300000000L
    val ev = graft.ingest.Tables.load(spark, sf, "events")
    val errs = ev.where(col("event_type") === "error")
      .select(col("event_id"), unix_micros(col("ts")).as("e_us"))
    val facts = ev.select(unix_micros(col("ts")).as("f_us"), col("user_id"))
    val counts = errs.crossJoin(facts)
      .where(col("f_us") >= col("e_us") - win && col("f_us") < col("e_us"))
      .groupBy(col("event_id"))
      .agg(count(lit(1)).as("n_events_5m"),
        countDistinct(col("user_id")).as("n_users_5m"))
    val brute = errs.select(col("event_id")).join(counts, Seq("event_id"), "left")
      .select(col("event_id"),
        coalesce(col("n_events_5m"), lit(0L)).as("n_events_5m"),
        coalesce(col("n_users_5m"), lit(0L)).as("n_users_5m"))
    val bucketed = RelQueries.q23RangeJoin(spark, sf)
    assert(bucketed.except(brute).isEmpty && brute.except(bucketed).isEmpty,
      "bucketed range join disagrees with brute-force interval join")
    val p = plan(RelQueries.q23RangeJoin(spark, sf))
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p)
  }

  test("q25 sessionization matches an independent per-user reconstruction") {
    val out = RelQueries.q25Sessionize(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val ev = graft.ingest.Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .where(col("user_id") < 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    ev.groupBy(_._1).foreach { case (uid, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      var idx = 0L
      var prev = Long.MinValue
      val sessions = scala.collection.mutable.Map[Long, List[Long]]()
      sorted.foreach { case (_, _, us) =>
        if (prev == Long.MinValue || us - prev > 1800000000L) idx += 1
        sessions(idx) = us :: sessions.getOrElse(idx, Nil)
        prev = us
      }
      sessions.foreach { case (sidx, uss) =>
        assert(out((uid, sidx)) == ((uss.size.toLong, uss.min, uss.max)),
          s"user $uid session $sidx")
      }
    }
    // every event lands in exactly one session
    val total = out.values.map(_._1).sum
    assert(total == graft.ingest.Tables.load(spark, sf, "events").count())
  }

  test("q36 recursive closure: every chain replays the decimal-trie walk " +
      "driver-side; roots partition the full key space") {
    val out = RelQueries.q36Recursive(spark, sf)
      .select(col("c_custkey"), col("root"), col("depth"), col("path"),
        col("root_size"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getString(3),
        r.getLong(4)))
    val n = graft.ingest.Tables.load(spark, sf, "customer").count()
    assert(out.length == n)           // one closure row per customer
    for ((k, root, depth, path, _) <- out) {
      // independent walk: divide by 10 until <= 9
      var cur = k; var d = 0; val sb = new StringBuilder(cur.toString)
      while (cur > 9) { cur /= 10; d += 1; sb.append(">").append(cur) }
      assert(root == cur && depth == d && path == sb.toString, s"key $k")
    }
    // root_size is the true cohort size and cohorts cover the key space
    val cohorts = out.groupBy(_._2)
    assert(cohorts.values.map(_.length.toLong).sum == n)
    for ((root, rows) <- cohorts)
      assert(rows.forall(_._5 == rows.length), s"root $root")
    assert(out.map(_._3).max >= 2)    // multi-level recursion exercised
  }

  test("q37 variant: typed path extraction round-trips the original " +
      "columns; missing paths yield null via try_variant_get") {
    val ev = graft.ingest.Tables.load(spark, sf, "events").limit(200)
    val v = ev.select(col("event_id"), col("event_type"), col("value"),
      parse_json(to_json(struct(
        struct(col("event_type").as("type")).as("meta"),
        array(col("value")).as("vals")))).as("v"))
    val got = v.select(col("event_id"),
        expr("variant_get(v, '$.meta.type', 'string')"),
        expr("variant_get(v, '$.vals[0]', 'double')"),
        expr("try_variant_get(v, '$.meta.absent', 'string')"))
      .collect()
    val want = ev.select(col("event_id"), col("event_type"), col("value"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got.nonEmpty)
    for (r <- got) {
      val w = want(r.getLong(0))
      assert(r.getString(1) == w.getString(1))
      assert(r.getDouble(2) == w.getDouble(2)) // exact JSON round-trip
      assert(r.isNullAt(3))                    // missing path -> null
    }
    // the aggregate entry's grouping keys are the true event types
    val types = RelQueries.q37Variant(spark, sf)
      .select(col("vtype")).collect().map(_.getString(0)).toSet
    assert(types.subsetOf(graft.ingest.Tables.load(spark, sf, "events")
      .select(col("event_type")).distinct().collect()
      .map(_.getString(0)).toSet))
  }

  test("q38 unpivot: the melt is lossless — every wide cell appears as " +
      "exactly one (key, metric, value) row") {
    val out = RelQueries.q38Unpivot(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val flags = out.map(_._1).distinct
    assert(out.length == flags.length * 3)
    val wide = graft.ingest.Tables.load(spark, sf, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for (f <- flags)
      assert(out.contains((f, "n_rows", wide(f))), f)
    assert(out.map(_._2).distinct.sorted.toSeq ==
      Seq("n_rows", "sum_price_cents", "sum_qty_cents"))
  }

  test("q39 lateral: per-order top-2 replays driver-side; the correlated " +
      "subquery decorrelates (no cartesian/nested loop in the plan)") {
    val df = RelQueries.q39Lateral(spark, sf)
    val p = plan(df)
    assert(!p.contains("CartesianProduct"), p)
    val out = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val li = graft.ingest.Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice").cast("decimal(18,2)").multiply(lit(100))
          .cast("long"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byOrder = li.groupBy(_._1)
    for ((ok, rows) <- out.groupBy(_._1)) {
      val want = byOrder(ok).sortBy(r => (-r._3, r._2)).take(2)
        .map(r => (r._1, r._2, r._3)).toSeq
      assert(rows.sortBy(r => (-r._3, r._2)).toSeq == want, s"order $ok")
      assert(ok % 10 == 0)
    }
  }

  test("q26 funnel matches a driver-side reconstruction for sampled users") {
    val funnel = RelQueries.q26Funnel(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    val ev = graft.ingest.Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .where(col("user_id") < 10).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    ev.groupBy(_._1).foreach { case (uid, rows) =>
      val signups = rows.filter(_._2 == "signup").map(_._3)
      if (signups.isEmpty) assert(!funnel.contains(uid), s"user $uid")
      else {
        val s = signups.min
        val r = funnel(uid)
        assert(r.getLong(1) == s, s"user $uid signup")
        val purchases = rows.filter(x => x._2 == "purchase" && x._3 >= s).map(_._3)
        if (purchases.isEmpty) {
          assert(r.isNullAt(2) && !r.getBoolean(4), s"user $uid no purchase")
        } else {
          assert(r.getLong(2) == purchases.min, s"user $uid purchase")
          assert(r.getBoolean(4) == (purchases.min - s <= 86400000000L))
        }
      }
    }
  }

  test("q40 zorder: Z-layout bounds pruning on BOTH dims; the linear " +
      "layout only prunes its own sort column") {
    import spark.implicits._
    val rows = RelQueries.q40Zorder(spark, sf)
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(rows.size == 6)
    // rows_selected is layout-independent
    for (q <- Seq("q1_quadrant", "q2_x_stripe", "q3_y_stripe"))
      assert(rows(("zorder", q))._3 == rows(("linear", q))._3)
    // the y-stripe is the killer: linear (sorted by x) prunes nothing,
    // zorder bounds y per file (8 of 64 in the uniform-fill limit)
    val linY = rows(("linear", "q3_y_stripe"))._2
    val zY = rows(("zorder", "q3_y_stripe"))._2
    assert(linY >= 32 && zY <= 16 && zY < linY, s"linear=$linY zorder=$zY")
    // and zorder stays bounded on every box (≤ 16 of 64 files)
    for (q <- Seq("q1_quadrant", "q2_x_stripe", "q3_y_stripe"))
      assert(rows(("zorder", q))._2 <= 16)
  }

  test("q41 attribution: replays the naive per-purchase lookback " +
      "driver-side") {
    import spark.implicits._
    val ev = graft.ingest.Tables.load(spark, sf, "events")
      .select($"user_id", $"event_id", unix_micros($"ts").as("us"),
        $"event_type", get_json_object($"props", "$.k").cast("long"),
        ($"value".cast("decimal(18,2)") * 100).cast("long"))
      .as[(Long, Long, Long, String, Long, Long)].collect()
    val want = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    for ((_, rows) <- ev.groupBy(_._1)) {
      val tl = rows.sortBy(r => (r._3, r._2))
      var lastClick: Option[(Long, Long)] = None // (us, campaign)
      for ((_, _, us, et, k, cents) <- tl) {
        if (et == "click") lastClick = Some((us, k))
        if (et == "purchase") lastClick match {
          case Some((cus, camp)) if us - cus <= 604800000000L =>
            val (n, s) = want.getOrElse(camp, (0L, 0L))
            want(camp) = (n + 1L, s + cents)
          case _ =>
        }
      }
    }
    val got = RelQueries.q41Attribution(spark, sf)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == want.toMap)
  }

  test("q42 rfm: segment counts cover every customer; extreme " +
      "customers land in score 5") {
    import spark.implicits._
    val seg = RelQueries.q42Rfm(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    val nCustomers = graft.ingest.Tables.load(spark, sf, "orders")
      .select($"o_custkey").distinct().count()
    assert(seg.map(_._4).sum == nCustomers)
    for ((r, f, m, _, _) <- seg)
      assert(Seq(r, f, m).forall(s => s >= 1 && s <= 5))
    // the top-monetary customer's segment must carry m_score 5
    assert(seg.filter(_._3 == 5L).map(_._4).sum >= nCustomers / 5 - 1)
  }

  test("q43 listagg: ordered roster equals the sorted nation list") {
    import spark.implicits._
    val want = graft.ingest.Tables.load(spark, sf, "nation")
      .join(graft.ingest.Tables.load(spark, sf, "region"),
        col("n_regionkey") === col("r_regionkey"))
      .select($"r_name", $"n_name").as[(String, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.mkString(", ")).toMap
    val got = RelQueries.q43Listagg(spark, sf)
      .as[(String, Long, String)].collect()
    assert(got.map(_._1).toSeq == want.keys.toSeq.sorted)
    for ((r, n, roster) <- got) {
      assert(roster == want(r))
      assert(n == roster.split(", ").length.toLong)
    }
  }

  test("q44 scd2: versions chain per customer — intervals abut, exactly " +
      "one current version, no consecutive equal statuses") {
    import spark.implicits._
    val rows = RelQueries.q44Scd2(spark, sf)
      .select($"o_custkey", $"version", $"status",
        $"valid_from".cast("string"), $"valid_to".cast("string"),
        $"is_current")
      .as[(Long, Long, String, String, Option[String], Boolean)].collect()
    val byKey = rows.groupBy(_._1)
    for ((_, vs) <- byKey) {
      val sorted = vs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to vs.length.toLong))
      // each version's valid_to equals the next version's valid_from
      for (Array(a, b) <- sorted.sliding(2).map(_.toArray))
        { assert(a._5.contains(b._4)); assert(a._3 != b._3) }
      assert(sorted.count(_._6) == 1)
      assert(sorted.last._6 && sorted.last._5.isEmpty)
    }
    // change compression is real: some customer has > 2 versions
    assert(byKey.values.exists(_.length > 2))
  }

  test("q45 temporal join: every lineitem resolves exactly one version " +
      "(row conservation) and current/closed versions both match") {
    import spark.implicits._
    val got = RelQueries.q45TemporalJoin(spark, sf)
      .select($"status", $"is_current", $"n_items")
      .as[(String, Boolean, Long)].collect()
    val nLi = graft.ingest.Tables.load(spark, sf, "lineitem").count()
    assert(got.map(_._3).sum == nLi)
    assert(got.exists(_._2) && got.exists(!_._2))
  }

  test("q46 incremental agg: base + delta merge reconciles with the " +
      "one-shot recompute and the delta is non-trivial") {
    import spark.implicits._
    val got = RelQueries.q46IncrementalAgg(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    val direct = graft.ingest.Tables.load(spark, sf, "orders")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(($"o_totalprice".cast("decimal(18,2)") * 100).cast("long"))
          .as("cents"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    for ((prio, baseN, deltaN, n, cents) <- got) {
      assert(baseN + deltaN == n)
      assert(direct(prio) == ((n, cents)))
      assert(baseN > 0, s"empty base at $prio")
    }
    // the tail month really contributes somewhere
    assert(got.map(_._3).sum > 0)
  }

  test("q48 pivot: five priority rows whose year columns reconcile with " +
      "the direct per-priority revenue total") {
    import spark.implicits._
    val rows = RelQueries.q48Pivot(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.length == 5)
    val direct = graft.ingest.Tables.load(spark, sf, "orders")
      .groupBy($"o_orderpriority")
      .agg(sum(($"o_totalprice".cast("decimal(18,2)") * 100)
        .cast("decimal(18,0)").cast("long")).as("cents"))
      .as[(String, Long)].collect().toMap
    for (r <- rows) {
      val total = r._2 + r._3 + r._4 + r._5 + r._6 + r._7 + r._8
      assert(total == direct(r._1), r._1)
    }
    // the cross-tab is genuinely two-dimensional: no all-zero column
    assert((2 to 8).forall(i =>
      rows.exists(_.productElement(i - 1).asInstanceOf[Long] > 0L)))
  }

  test("q49 dq audit: all six constraint checks pass on the fixtures and " +
      "the tombstone budget is the only nonzero metric") {
    import spark.implicits._
    val rows = RelQueries.q49DqAudit(spark, sf)
      .as[(String, String, Long, Boolean)].collect()
    assert(rows.length == 6 && rows.forall(_._4))
    val (nonzero, zero) = rows.partition(_._3 > 0)
    assert(zero.length == 5)
    assert(nonzero.map(r => (r._1, r._2)) ===
      Array(("changelog", "value_null_budget")))
    val nTombstones = graft.ingest.Tables.load(spark, sf, "events")
      .where($"event_id" % 50 === 0).count()
    assert(nonzero.head._3 == nTombstones)
  }

  test("q50 merge: all three MERGE actions fire, per-key totals " +
      "reconcile with the unsplit aggregate") {
    import spark.implicits._
    val rows = RelQueries.q50Merge(spark, sf)
      .as[(Long, String, String, Long, Long)].collect()
    assert(Set("keep", "insert", "update").subsetOf(rows.map(_._3).toSet),
      rows.map(_._3).distinct.mkString(","))
    // keys unique; post-merge state equals the cutoff-free aggregate
    assert(rows.map(r => (r._1, r._2)).distinct.length == rows.length)
    val direct = graft.ingest.Tables.load(spark, sf, "orders")
      .groupBy($"o_custkey", $"o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(($"o_totalprice".cast("decimal(18,2)") * 100)
          .cast("decimal(18,0)").cast("long")).as("cents"))
      .as[(Long, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(rows.length == direct.size)
    for ((ck, pr, _, n, cents) <- rows)
      assert(direct((ck, pr)) == ((n, cents)), s"$ck/$pr")
    // insert rows carry only source-side history
    val tail = graft.ingest.Tables.load(spark, sf, "orders")
      .where($"o_orderdate" >= "2001-01-01")
      .groupBy($"o_custkey", $"o_orderpriority").count()
      .as[(Long, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    for ((ck, pr, a, n, _) <- rows if a == "insert")
      assert(tail((ck, pr)) == n)
  }

  test("q51 ordered-set: percentile_cont replays driver-side from the " +
      "sorted cents and the FILTER legs match direct slices") {
    import spark.implicits._
    val rows = RelQueries.q51OrderedSet(spark, sf)
      .as[(String, Long, Double, Double, Double, Long, Long)].collect()
    val li = graft.ingest.Tables.load(spark, sf, "lineitem")
      .select($"l_returnflag",
        ($"l_extendedprice".cast("decimal(18,2)") * 100).cast("long"),
        $"l_quantity".cast("double"))
      .as[(String, Long, Double)].collect()
    val byFlag = li.groupBy(_._1)
    assert(rows.length == byFlag.size)
    def pct(sorted: Array[Long], q: Double): Double = {
      val pos = q * (sorted.length - 1)
      val lo = pos.toInt
      val frac = pos - lo
      if (frac == 0) sorted(lo).toDouble
      else sorted(lo) + (sorted(lo + 1) - sorted(lo)) * frac
    }
    for ((flag, n, p25, p50, p75, nh, hc) <- rows) {
      val grp = byFlag(flag)
      val sorted = grp.map(_._2).sorted
      assert(n == grp.length)
      assert(p25 == pct(sorted, 0.25) && p50 == pct(sorted, 0.5) &&
        p75 == pct(sorted, 0.75), flag)
      val heavy = grp.filter(_._3 > 25)
      assert(nh == heavy.length && hc == heavy.map(_._2).sum, flag)
    }
  }

  test("q53 bitmap distinct: the bitmap path reproduces brute distinct " +
      "counts at both grains, and the flag rollup never rescans") {
    import spark.implicits._
    val rows = RelQueries.q53BitmapDistinct(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    val li = graft.ingest.Tables.load(spark, sf, "lineitem")
      .select($"l_returnflag", $"l_linestatus", $"l_partkey")
      .as[(String, String, Long)].collect()
    val byFlag = li.groupBy(_._1)
    assert(rows.length == byFlag.size)
    for ((flag, nStatuses, sumStatus, flagDistinct) <- rows) {
      val grp = byFlag(flag)
      val statuses = grp.groupBy(_._2)
      assert(nStatuses == statuses.size.toLong)
      assert(sumStatus ==
        statuses.values.map(_.map(_._3).distinct.size.toLong).sum)
      assert(flagDistinct == grp.map(_._3).distinct.size.toLong, flag)
      // the whole point of the bitmap layout: statuses overlap in parts,
      // so the naive sum exceeds the true rollup
      assert(sumStatus >= flagDistinct)
    }
  }

  test("q54 null-safe join: the NULL bucket matches itself and every " +
      "group replays from a brute split") {
    val rows = RelQueries.q54NullsafeJoin(spark, sf).collect()
    val li = graft.ingest.Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"),
        (col("l_quantity").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def key(p: Long): Option[Long] =
      if (p % 10 < 3) None else Some(p % 10)
    val dim = li.filter(_._1 % 2 == 1).groupBy(t => key(t._2))
      .map { case (k, g) => k -> g.map(_._3).sum }
    val probe = li.filter(_._1 % 2 == 0).groupBy(t => key(t._2))
      .map { case (k, g) => k -> g.size.toLong }
    assert(rows.length == probe.size)
    // NULLS FIRST: row 0 is the NULL bucket, and it DID join
    assert(rows.head.isNullAt(0))
    for (r <- rows) {
      val k = if (r.isNullAt(0)) None else Some(r.getLong(0))
      assert(r.getLong(1) == probe(k), s"n_rows $k")
      assert(r.getLong(2) == dim(k), s"dim_qty_cents $k")
    }
  }

  test("q55 asof tolerance: every event replays the brute latest-signup " +
      "lookup with the 48h staleness gate; all three states occur") {
    import spark.implicits._
    val rows = RelQueries.q55AsofTolerance(spark, sf)
      .select(col("event_id"), col("sig_id"), col("age_us"),
        col("match_state"))
      .as[(Long, Option[Long], Option[Long], String)].collect()
    val ev = graft.ingest.Tables.load(spark, sf, "events")
      .select($"event_id", $"user_id", unix_micros($"ts"), $"event_type")
      .as[(Long, Long, Long, String)].collect()
    val sigs = ev.filter(_._4 == "signup").groupBy(_._2)
    val tol = 172800000000L
    for ((eid, sigId, age, state) <- rows) {
      val e = ev.find(_._1 == eid).get
      val prior = sigs.getOrElse(e._2, Array.empty[(Long, Long, Long, String)])
        .filter(s => s._3 < e._3 || (s._3 == e._3))
      if (prior.isEmpty) {
        assert(state == "none" && sigId.isEmpty && age.isEmpty, eid)
      } else {
        val best = prior.maxBy(s => (s._3, s._1))
        val a = e._3 - best._3
        if (a <= tol)
          assert(state == "fresh" && sigId.contains(best._1) &&
            age.contains(a), eid)
        else assert(state == "stale" && sigId.isEmpty && age.isEmpty, eid)
      }
    }
    assert(Set("fresh", "stale", "none").subsetOf(
      rows.map(_._4).toSet))
  }

  test("q56 try_cast: failures are exactly the planted N/A rows and " +
      "the parsed sum replays; q57: the NOT IN null trap holds") {
    import spark.implicits._
    val rows = RelQueries.q56TryCast(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    val li = graft.ingest.Tables.load(spark, sf, "lineitem")
      .select($"l_returnflag", $"l_partkey", $"l_quantity")
      .as[(String, Long, Double)].collect()
    for ((flag, n, parsed, failed, cents) <- rows) {
      val grp = li.filter(_._1 == flag)
      assert(n == grp.length)
      assert(failed == grp.count(_._2 % 7 == 0))
      assert(parsed == n - failed)
      assert(cents == grp.filter(_._2 % 7 != 0)
        .map(r => math.round(r._3 * 100)).sum)
    }
    val t = RelQueries.q57NotInTrap(spark, sf)
      .as[(Long, Long, Long, Long)].head()
    assert(t._1 == 0L)            // NOT IN with a NULL: always empty
    assert(t._2 == t._3)          // clean NOT IN == NOT EXISTS
    assert(t._3 > 0 && t._3 < t._4)
  }

  test("q52 qualify: one row per ordering customer, and it is the " +
      "(price desc, orderkey) argmax of that customer's orders") {
    import spark.implicits._
    val rows = RelQueries.q52Qualify(spark, sf)
      .as[(Long, Long, Double)].collect()
    val orders = graft.ingest.Tables.load(spark, sf, "orders")
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
      .as[(Long, Long, Double)].collect()
    val byCust = orders.groupBy(_._1)
    assert(rows.length == byCust.size)
    assert(rows.map(_._1).distinct.length == rows.length)
    for ((ck, ok, price) <- rows) {
      val best = byCust(ck).minBy(o => (-o._3, o._2))
      assert((ok, price) == ((best._2, best._3)), ck)
    }
  }
}
