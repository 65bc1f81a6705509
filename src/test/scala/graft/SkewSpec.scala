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

  private def withSQLConf(kv: (String, String)*)(f: => Unit): Unit = {
    val old = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
