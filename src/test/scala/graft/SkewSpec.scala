package graft

import org.apache.spark.sql.functions._

import graft.ingest.Tables
import graft.sql.Skew

/** Pins the salted-join skew discipline: identical results to the plain
  * join, with the exchange hashing on (key, salt) so a hot key's rows
  * spread across `salts` tasks instead of one. */
class SkewSpec extends SparkSpec {

  test("salted join: result identical to plain join; shuffle key carries " +
      "the salt so hot keys split across tasks") {
    // events.event_type has ~5 distinct values — the classic hot-key join:
    // unsalted, each event_type lands on ONE shuffle task
    val fact = Tables.load(spark, sf, "events")
      .select(col("event_id"), col("event_type"), col("value"))
    val dim = fact.groupBy(col("event_type"))
      .agg(count(lit(1)).as("type_n"))

    val salted = Skew.saltedEquiJoin(fact, dim, "event_type",
      factId = col("event_id"), salts = 8)
    val plain = fact.join(dim, "event_type")
      .select(salted.columns.map(col).toSeq: _*)

    assert(salted.count() == fact.count())
    assert(salted.except(plain).count() == 0)
    assert(plain.except(salted).count() == 0)

    // the physical exchange must hash on BOTH the key and the salt
    // (disable auto-broadcast so the join actually shuffles, as it would
    // with an unbroadcastable dim at scale)
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val shuffled = Skew.saltedEquiJoin(fact, dim, "event_type",
        factId = col("event_id"), salts = 8)
      shuffled.write.format("noop").mode("overwrite").save()
      val plan = shuffled.queryExecution.executedPlan.toString
      assert(plan.contains("hashpartitioning(event_type") &&
        plan.contains("_salt"), plan)
    }
  }

  test("AQE splits the planted heavy key at runtime: SortMergeJoin " +
      "carries skew=true in the final adaptive plan (q32's shape)") {
    // q32's exact join shape: 70% of events on one literal key, dim
    // unbroadcastable (threshold -1), skew thresholds proportionate to
    // the fixture's shuffle bytes — at production defaults the same
    // trigger fires at 256 MB partitions
    withSQLConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2kb",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1kb",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      // AQE splits a skewed REDUCE partition at MAPPER-output boundaries:
      // a single-mapper scan is unsplittable, so fan the tiny fixture
      // scan out into several input splits (at real scale the mapper
      // count is already in the thousands)
      "spark.sql.files.maxPartitionBytes" -> "4kb",
      "spark.sql.files.openCostInBytes" -> "512b") {
      import spark.implicits._
      // the fixture parquet is ONE row group → one effective mapper, and
      // a skewed reduce partition can only split at mapper boundaries;
      // repartition(8) stands in for the thousands of scan splits a real
      // table has
      val ev = Tables.load(spark, sf, "events").repartition(8)
      val fact = ev.select(col("event_id"),
        when(col("event_id") % 10 < 7, lit("hot"))
          .otherwise(col("event_type")).as("k"),
        col("value"))
      val dim = Seq("hot", "click", "error", "purchase", "signup", "view")
        .zipWithIndex.map { case (k, i) => (k, (i + 1) * 10L) }
        .toDF("k", "k_weight")
      val joined = fact.join(dim, "k")
      // materialize THIS frame's own QueryExecution (a write/count builds
      // a separate one whose adaptive plan we couldn't inspect)
      val rows = joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), plan)
      assert(plan.contains("skew=true"), plan)
      // and the result is the plain join's result regardless of the split
      assert(rows.length == ev.count())
    }
  }

}
