package graft

import org.apache.spark.sql.types.TimestampType
import graft.ingest.{Sources, Tables}

/** Guards the fixture/loader contract against environment-side testdata
  * regeneration: the driver has shipped `ts` columns as both
  * TIMESTAMP(NANOS) and timestamp[us] (TIMESTAMP_NTZ) over time, and a
  * silent type flip once broke 9 driver entries (round 10). Every
  * timestamp column must come out of `Tables.load` as TimestampType, and
  * the Kafka-envelope stand-in must keep a TimestampType `timestamp`
  * (a real Kafka source's record timestamp is an instant, not a naive
  * local time).
  */
class FixturesSpec extends SparkSpec {

  private val tsColsByTable =
    Map("events" -> "ts", "lineitem" -> "l_shipdate", "orders" -> "o_orderdate")

  for ((table, c) <- tsColsByTable)
    test(s"Tables.load($table).$c is TimestampType") {
      val dt = Tables.load(spark, sf, table).schema(c).dataType
      assert(dt == TimestampType, s"$table.$c loaded as $dt")
    }

  test("envelope timestamp from the events fixture source is TimestampType") {
    val env = Sources.eventsAsRecords(spark, sf)
    assert(env.schema("timestamp").dataType == TimestampType)
  }

  test("all fixture tables load with rows at sf0.001") {
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    for (t <- tables) assert(Tables.load(spark, sf, t).limit(1).count() == 1L, s"$t empty")
  }
}
