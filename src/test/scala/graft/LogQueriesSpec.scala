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
