package graft

import org.apache.spark.sql.functions._

import graft.ingest.Tables
import graft.sql.RelQueries

/**
 * Pins the two RUNTIME join-reduction mechanisms q33/q34 demonstrate:
 * the injected bloom filter on the probe side of a selective join, and
 * dynamic partition pruning on a date-partitioned fact. Both follow the
 * SkewSpec discipline — execute the exact query shape with
 * fixture-proportionate thresholds, `collect()` the very frame whose
 * plan is inspected (a `.count()`/`.write` builds its own
 * QueryExecution), and assert the mechanism appears in the final plan.
 */
class JoinOptSpec extends SparkSpec {

  test("runtime bloom filter: q33's selective join injects " +
      "bloom_filter_might_contain on the probe side; results unchanged") {
    // production thresholds (10 MB creation / 10 GB probe scan) are sized
    // for real tables — lower them fixture-proportionately, and disable
    // auto-broadcast: a broadcast join already prunes at the hash table,
    // so Spark only plants bloom filters on SHUFFLE joins
    withSQLConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      val li = Tables.load(spark, sf, "lineitem")
      val ord = Tables.load(spark, sf, "orders")
        .where(col("o_orderkey") % 100 === 0)
      val joined = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_lines"))
      val rows = joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"), plan.take(4000))

      // the filter is pure pruning: identical results with it disabled
      withSQLConf(
          "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
        val plain = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_lines"))
        assert(rows.map(r => r.getString(0) -> r.getLong(1)).toMap ==
          plain.collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
        assert(!plain.queryExecution.executedPlan.toString
          .contains("might_contain"))
      }
    }
  }

  test("AQE runtime broadcast: q35's aggregate-derived dim demotes the " +
      "statically-planned SMJ to a BroadcastHashJoin at runtime") {
    // disable the STATIC broadcast threshold so the planner must pick a
    // SortMergeJoin (the aggregate hides the dim's true size anyway),
    // but leave the ADAPTIVE threshold generous: once the dim's shuffle
    // stage finishes and turns out tiny, AQE replans the join broadcast
    withSQLConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "10MB",
      "spark.sql.adaptive.localShuffleReader.enabled" -> "true") {
      val li = Tables.load(spark, sf, "lineitem")
      val urgent = Tables.load(spark, sf, "orders")
        .where(col("o_orderpriority") === "1-URGENT" &&
          col("o_orderkey") % 10 === 0)
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n_ord"))
      val joined = li.join(urgent, li("l_orderkey") === urgent("o_orderkey"))
        .groupBy(col("l_linestatus")).agg(count(lit(1)).as("n_lines"))
      val rows = joined.collect()
      // AdaptiveSparkPlan.toString prints BOTH the final and the
      // initial plan — the initial one legitimately contains the SMJ
      // (that IS the demonstration), so split and assert per section
      val full = joined.queryExecution.executedPlan.toString
      val Array(finalPlan, initialPlan) =
        full.split("== Initial Plan ==", 2)
      // the conversion happened: the static pick was an SMJ, the final
      // plan a broadcast join over materialized query stages. Which
      // side gets broadcast comes from RUNTIME stage sizes (at fixture
      // scale both are tiny and Spark may pick either), so pin the
      // mechanism, not the side.
      assert(initialPlan.contains("SortMergeJoin"), full.take(4000))
      assert(finalPlan.contains("BroadcastHashJoin"), full.take(4000))
      assert(!finalPlan.contains("SortMergeJoin"), full.take(4000))
      assert(finalPlan.contains("BroadcastQueryStage"), full.take(4000))
      // results identical to the statically-broadcast plan
      withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "10MB") {
        val plain = li.join(urgent,
            li("l_orderkey") === urgent("o_orderkey"))
          .groupBy(col("l_linestatus")).agg(count(lit(1)).as("n_lines"))
        assert(rows.map(r => r.getString(0) -> r.getLong(1)).toMap ==
          plain.collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
      }
    }
  }

  test("dynamic partition pruning: q34's weekend dim filter becomes a " +
      "DynamicPruningExpression partition filter on the fact scan") {
    val work = java.nio.file.Files.createTempDirectory("joinopt-dpp")
    try {
      val (fact, dim) = RelQueries.dppFactAndDim(spark, sf, work.toString)
      val joined = fact.join(broadcast(dim), Seq("event_date"))
        .groupBy(col("event_date")).agg(count(lit(1)).as("n"))
      val rows = joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("dynamicpruning"), plan.take(4000))

      // semantics: exactly the weekend dates, counts equal the direct agg
      val expected = Tables.load(spark, sf, "events")
        .where(dayofweek(col("ts")).isin(1, 7))
        .groupBy(to_date(col("ts")).as("event_date"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
      assert(rows.map(r => r.getDate(0).toString -> r.getLong(1)).toMap
        == expected)
      assert(rows.nonEmpty)
      // and the pruned scan touched ONLY the weekend partitions: every
      // partition dir minus the scanned set = the weekday dates
      val all = new java.io.File(work.toString).listFiles()
        .filter(_.getName.startsWith("event_date=")).map(_.getName).toSet
      assert(all.size > expected.size) // weekday partitions exist on disk
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(work.toFile)
    }
  }

  test("window group limit: a pure per-key top-k rank filter compiles " +
      "to WindowGroupLimit; an added whole-group window correctly " +
      "disables it") {
    // Spark 3.5+ rewrites rank()/row_number() <= k filters into a
    // WindowGroupLimitExec that drops all but k rows per group BEFORE
    // the window sort — the difference between sorting every event and
    // sorting k per key at 100 TB. collect() the exact frame (the
    // SkewSpec discipline), then assert on its final plan. kq54/kq16
    // also emit per-group totals (count over the whole partition), and
    // that second window NEEDS every row — the optimizer must NOT prune
    // there; both directions are pinned.
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("timestamp").desc, col("offset").desc)
    val base = Pipeline.envelopeFlat(spark, sf)
      .where(col("event_type").isNotNull)
    val topk = base
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 3)
      .select(col("event_type"), col("rk"), col("offset"))
    topk.collect()
    val plan = topk.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"WindowGroupLimit missing from the pure top-k plan:\n$plan")

    val withTotal = base
      .withColumn("rk", row_number().over(w))
      .withColumn("total", count(lit(1)).over(
        Window.partitionBy(col("event_type"))))
      .where(col("rk") <= 3)
      .select(col("event_type"), col("rk"), col("total"))
    val rows = withTotal.collect()
    assert(!withTotal.queryExecution.executedPlan.toString
      .contains("WindowGroupLimit"),
      "pruning must be disabled when a whole-group window rides along")
    // and the totals prove every row survived to the count window
    val wantTotals = base.groupBy(col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(r => r.getString(0) -> r.getLong(2)).toMap == wantTotals)
  }
}
