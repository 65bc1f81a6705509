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
}
