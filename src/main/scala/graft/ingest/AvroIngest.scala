package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.transform.Transforms

/**
 * E2 — the reference's ingest path composed end-to-end for Avro topics
 * (SURVEY.md §3): framed-Avro record frame → S1 decode (tombstone-aware)
 * → T1–T7 enrichment → envelope; heterogeneous topics union into one
 * changelog table exactly like the single ES index over `foo,bar`
 * (reference: kafana.http:75).
 */
object AvroIngest {

  /** Decode a topic's framed-Avro `value` column into its typed struct
    * (null value stays null = tombstone; enrich materializes the sentinel). */
  def decodeTopic(records: DataFrame, schemaJson: String): DataFrame = {
    val (structCol, _) = ConfluentAvro.decodeOrTombstone(col("value"), schemaJson)
    records.withColumn("value", structCol)
  }

  /** One topic: decode + full SMT-chain enrichment. */
  def ingestTopic(records: DataFrame, schemaJson: String,
      valueJsonField: String = "value"): DataFrame =
    Transforms.enrich(valueJsonField)(decodeTopic(records, schemaJson))

  /**
   * Multi-topic changelog: per-topic envelopes unioned by name with
   * missing columns allowed — Foo rows carry null Bar fields and vice
   * versa, while the JSON-string field keeps every payload searchable
   * across schemas (the reference's key trick, SURVEY.md §7 hard-parts).
   * The union is plan-level only — no shuffle, no repartition.
   */
  def ingestTopics(perTopic: Seq[(DataFrame, String)],
      valueJsonField: String = "value"): DataFrame =
    perTopic.map { case (records, schema) =>
      // flatten message so unionByName can align heterogeneous payloads
      val env = ingestTopic(records, schema, valueJsonField)
      env.select(col("message.*"), col("timestamp"), col("topic"),
        col("partition"), col("offset"), col("key"), col("uid"))
    }.reduce(_.unionByName(_, allowMissingColumns = true))
}
