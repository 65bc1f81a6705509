package graft.sink

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Bucketed (co-located) tables — the shuffle-free join layout for the
 * repeated fact-fact joins of a 100 TB deployment. Writing both sides
 * bucketed by the join key into the same number of buckets lets Spark's
 * planner join them with ZERO exchanges: each task reads matching bucket
 * files from both tables. This is the batch analog of Kafka's
 * partition-aligned consumption the reference relies on
 * (docker-compose.yml:45-69 — one Connect task per topic partition).
 */
object BucketedTables {

  /** Persist `df` as a bucketed table (parquet, no Hive needed) — managed
    * (warehouse-dir) by default, external at `path` when given. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int, sortCol: Option[String] = None,
      path: Option[String] = None): Unit = {
    val w0 = df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
    val w = path.fold(w0)(p => w0.option("path", p))
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
    // An overwrite of an external-path table can leave the session's
    // FileStatusCache holding the PREVIOUS part-file listing for `path`
    // (the drop+recreate makes a new InMemoryFileIndex over the same
    // path key), so a later `spark.table(table)` read fails with
    // FILE_NOT_EXIST on the replaced files. Refresh both keys.
    df.sparkSession.catalog.refreshTable(table)
    path.foreach(df.sparkSession.catalog.refreshByPath)
  }

  /** Join two same-bucketed tables on their bucket key. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(left)
    val r = spark.table(right)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
