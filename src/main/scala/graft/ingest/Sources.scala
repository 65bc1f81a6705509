package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Record sources. A "record frame" is the engine's ingest-side contract:
 * {{{
 *   key       STRING (or any castable type)
 *   value     STRUCT<payload...>  (null = tombstone)
 *   topic     STRING
 *   partition INT
 *   offset    LONG
 *   timestamp TIMESTAMP
 * }}}
 * This is exactly the column set Spark's Kafka source emits (key, value,
 * topic, partition, offset, timestamp) — the reference's ConnectRecord
 * metadata model (reference: transform/.../InsertKey.java:151-159) — so a
 * real Kafka topic, a parquet fixture, or a memory stream all plug into the
 * same enrichment chain.
 */
object Sources {

  /**
   * Batch Kafka source (requires the spark-sql-kafka connector on the
   * cluster classpath). Values arrive as binary and are decoded per-topic
   * by [[graft.ingest.ConfluentAvro]].
   *
   * NOT exercised end-to-end in this container, and cannot be: the
   * zero-egress sandbox ships neither the spark-sql-kafka connector jar
   * nor kafka-clients/kafka-server (checked: no kafka artifact under
   * /opt/spark/jars or the coursier cache), so even an in-JVM embedded
   * broker is unbuildable here. The contract is covered from both ends
   * instead: kq22_wire_path round-trips real Confluent framing
   * (magic+id+avro binary, tombstones) through encode→decode→SMT, and
   * every downstream operator consumes the exact column set the Kafka
   * source emits. On a real cluster this function is the only line that
   * changes.
   */
  def kafka(spark: SparkSession, bootstrap: String, topics: String): DataFrame =
    spark.read
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topics)
      .option("startingOffsets", "earliest")
      .load()
      .select(col("key"), col("value"), col("topic"), col("partition"),
        col("offset"), col("timestamp"))

  /** Streaming flavor of [[kafka]]. */
  def kafkaStream(spark: SparkSession, bootstrap: String, topics: String): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topics)
      .load()
      .select(col("key"), col("value"), col("topic"), col("partition"),
        col("offset"), col("timestamp"))

  /** Every Nth record is a tombstone in the simulated topic (FIXTURES.md §B). */
  val TombstoneEvery = 50

  /**
   * The `events` fixture table viewed as a Kafka topic (FIXTURES.md §B
   * mapping): key = user_id, payload = (event_type, value, props),
   * timestamp = ts, topic = "events", partition = pmod(user_id, 4),
   * offset = event_id; every [[TombstoneEvery]]th offset is a tombstone
   * (null value) to exercise the reference's tombstone path (reference:
   * kafana.http:19-30, convert/.../TombstoneAwareAvroConverter.java:26-31).
   */
  /**
   * A second simulated topic (`orders`) so the fixture changelog is
   * heterogeneous like the reference's `foo,bar` pair (kafana.http:75):
   * key = o_custkey, payload = (o_orderstatus, o_totalprice,
   * o_orderpriority), timestamp = o_orderdate, offset = o_orderkey.
   * No tombstones on this topic (mirrors that topics differ in shape).
   */
  def ordersAsRecords(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.load(spark, sfDir, "orders")
    o.select(
      col("o_custkey").cast("string").as("key"),
      struct(col("o_orderstatus"), col("o_totalprice"), col("o_orderpriority"))
        .as("value"),
      lit("orders").as("topic"),
      pmod(col("o_custkey"), lit(4)).cast("int").as("partition"),
      col("o_orderkey").as("offset"),
      col("o_orderdate").as("timestamp"))
  }

  def eventsAsRecords(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    ev.select(
      col("user_id").cast("string").as("key"),
      when(col("event_id") % TombstoneEvery === 0, lit(null))
        .otherwise(struct(col("event_type"), col("value"), col("props")))
        .as("value"),
      lit("events").as("topic"),
      pmod(col("user_id"), lit(4)).cast("int").as("partition"),
      col("event_id").as("offset"),
      col("ts").as("timestamp"))
  }
}
