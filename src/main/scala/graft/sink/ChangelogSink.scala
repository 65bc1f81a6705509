package graft.sink

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * K1/K3 — the changelog sink. The reference bulk-indexes every enriched
 * record into Elasticsearch with `_id = topic+partition+offset` and bounds
 * index size via rollover (reference: kafana.http:69-95, README.md:11,14).
 * Spark-natively that is an APPEND-ONLY parquet table partitioned by
 * (topic, date):
 *
 *  - append mode matches the changelog model — no upsert machinery needed,
 *    the `uid` column makes replays idempotent via `dropDuplicates("uid")`
 *    at read time (or in `foreachBatch` for streaming);
 *  - (topic, date) partitioning replaces both the ES index-per-pattern
 *    layout AND rollover: queries with topic/time predicates partition-prune
 *    (at 100 TB only matching directories are even listed), and retention
 *    is a metadata-only partition drop, never a data rewrite.
 */
object ChangelogSink {

  /** Append an envelope frame to the partitioned changelog table. */
  def append(env: DataFrame, path: String): Unit =
    env.withColumn("date", to_date(col("timestamp")))
      .write
      .partitionBy("topic", "date")
      .mode("append")
      .parquet(path)

  /** Read the changelog back (partition columns topic/date restored). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /**
   * Streaming flavor of [[append]]: a `foreachBatch` writer that dedups
   * each micro-batch on `uid` before appending. Combined with the
   * append-only model this gives the reference's effectively-once story
   * (README.md:11: the topic+partition+offset id makes replays
   * idempotent) without a transactional sink: within-batch replays are
   * dropped here, historical replays at read time via
   * `dropDuplicates("uid")`.
   */
  def streamAppend(env: DataFrame, path: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    env.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        append(batch.dropDuplicates("uid"), path)
      }
      .start()

  /**
   * K3 — retention: drop date partitions strictly older than `cutoff`
   * (yyyy-MM-dd). The reference's "define some rollover conditions"
   * (README.md:14) becomes an O(#partitions) filesystem operation — no
   * records are read or rewritten, which is the only retention strategy
   * that survives 100 TB.
   */
  def dropPartitionsBefore(spark: SparkSession, path: String, cutoff: String): Int = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return 0
    var dropped = 0
    for (topicDir <- fs.listStatus(root) if topicDir.isDirectory) {
      for (dateDir <- fs.listStatus(topicDir.getPath) if dateDir.isDirectory) {
        val name = dateDir.getPath.getName // date=yyyy-MM-dd
        if (name.startsWith("date=") && name.stripPrefix("date=") < cutoff) {
          fs.delete(dateDir.getPath, true)
          dropped += 1
        }
      }
    }
    dropped
  }
}
