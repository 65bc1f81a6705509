package graft

import org.apache.spark.sql.functions._

import graft.ingest.Tables
import graft.sink.BucketedTables

/** Co-located join layout: both fact tables bucketed on the join key →
  * the join plans with NO shuffle exchange at all. */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join has zero shuffle exchanges") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    // force a non-broadcast join so the exchange-free property is provable
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      BucketedTables.writeBucketed(
        Tables.load(spark, sf, "lineitem"), "li_b", "l_orderkey", 8,
        sortCol = Some("l_orderkey"))
      BucketedTables.writeBucketed(
        Tables.load(spark, sf, "orders"), "ord_b", "o_orderkey", 8,
        sortCol = Some("o_orderkey"))
      // the aggregation downstream shuffles on ITS key (expected); the
      // JOIN itself must read matched buckets with no exchange on the
      // join keys
      def joinExchanges(plan: String): Int =
        "Exchange hashpartitioning\\((l_orderkey|o_orderkey)".r
          .findAllIn(plan).length
      val joined = BucketedTables
        .bucketedJoin(spark, "li_b", "ord_b", "l_orderkey", "o_orderkey")
        .groupBy(col("o_orderpriority")).count()
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(plan.contains("SelectedBucketsCount: 8 out of 8"), plan)
      assert(joinExchanges(plan) == 0,
        s"bucketed join still shuffles on the join key:\n$plan")

      // contrast: the same join over plain (unbucketed) reads DOES
      // shuffle both sides on the join keys
      val li = Tables.load(spark, sf, "lineitem")
      val ord = Tables.load(spark, sf, "orders")
      val plain = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .groupBy(col("o_orderpriority")).count()
      plain.collect()
      assert(joinExchanges(plain.queryExecution.executedPlan.toString) >= 2)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}
