package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.Envelope

/**
 * The query surface of the engine — the capabilities Kibana/ES provide over
 * the sunk changelog in the reference (reference: README.md:26-42 and the
 * attachments screenshots), as composable DataFrame operations over an envelope
 * frame. Every function RETURNS a DataFrame (no collect, no driver-side
 * row work): callers keep composing, and at cluster scale the plan stays
 * fully distributed with filters pushed to the scan.
 */
object LogQueries {

  /** The Kibana search-box surface: parse a KQL-ish query string into a
    * Catalyst predicate (see [[Kql]] for the grammar). */
  def kql(query: String): Column = Kql.parse(query)

  /**
   * Q1a — Discover, log view: time-descending page over a time range
   * (reference: README.md:28-30, attachments/discover.png). `orderBy+limit`
   * plans as `TakeOrderedAndProject` — a distributed top-k, NOT a full sort:
   * each partition keeps only `n` rows, so this survives a 100 TB scan.
   * Ties on timestamp are broken by (topic, partition, offset) so pagination
   * is deterministic.
   */
  def discoverPage(env: DataFrame, from: Column, to: Column, n: Int): DataFrame =
    env.where(col("timestamp").between(from, to))
      .orderBy(col("timestamp").desc, col("topic"), col("partition"),
        col("offset").desc)
      .limit(n)

  /**
   * Q1b — Discover, date histogram: bucketed counts over a time range
   * (the bar chart atop Kibana Discover). Partial+final hash aggregation is
   * Catalyst-automatic; the only shuffle is on the (truncated) bucket key.
   */
  def discoverHistogram(env: DataFrame, bucket: String): DataFrame =
    env.groupBy(date_trunc(bucket, col("timestamp")).as("bucket"))
      .agg(count(lit(1)).as("n"))

  /**
   * Q2 — Search key across topics (reference: README.md:32-34,
   * attachments/search_for_key.png). A plain equality filter — pushed down
   * to the parquet scan (PushedFilters), no shuffle, no join.
   */
  def searchKey(env: DataFrame, key: String): DataFrame =
    env.where(col("key") === key)

  /**
   * Q3 — Search key AND topic (reference: README.md:36-38). With the sink
   * partitioned by topic, the topic predicate is PARTITION-pruned — at
   * 100 TB only the one topic's files are listed, let alone read.
   */
  def searchKeyTopic(env: DataFrame, key: String, topic: String): DataFrame =
    env.where(col("key") === key && col("topic") === topic)

  /**
   * Q4 — Search on a message field across topics (reference:
   * README.md:40-42, attachments/search_for_message_field.png). Structured
   * variant: predicate on a typed payload field nested in `message`.
   */
  def searchField(env: DataFrame, fieldPath: String, value: Any): DataFrame =
    env.where(col(s"message.$fieldPath") === lit(value))

  /**
   * Q4 (heterogeneous variant) — full-payload search via the JSON-string
   * field, the reference's trick that makes cross-schema search work (T1;
   * payload is indexed both structured and as text). `path` is a JSON path
   * like `$.k`.
   */
  def searchJson(env: DataFrame, valueJsonField: String, path: String,
      value: String): DataFrame =
    env.where(get_json_object(col(s"message.$valueJsonField"), path) === value)

  /**
   * Q5 — Tombstone visibility: deletions appear as rows (reference:
   * README.md:12; convert/.../TombstoneAwareAvroConverter.java:27-30).
   */
  def tombstones(env: DataFrame, valueJsonField: String): DataFrame =
    env.where(col(s"message.$valueJsonField") === Envelope.Tombstone)

  /**
   * Latest-state-per-key compaction view — "ES should reflect state in
   * kafka as close as possible" (reference: README.md:13) realized as a
   * window function: the newest record per (topic, key) by (offset within
   * partition). One shuffle on the window key; at scale this is the
   * standard log-compaction pattern and benefits from AQE skew handling
   * for hot keys.
   */
  def latestStatePerKey(env: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("topic"), col("key"))
      .orderBy(col("timestamp").desc, col("offset").desc)
    env.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_rn")
  }
}
