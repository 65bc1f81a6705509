package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Central loader for the fixture tables (TESTDATA.md).
 *
 * The driver-generated parquet stores timestamps as INT64
 * TIMESTAMP(NANOS) (pyarrow default), which Spark's parquet reader
 * rejects outright ([PARQUET_TYPE_ILLEGAL]). The supported route is the
 * `spark.sql.legacy.parquet.nanosAsLong` flag — nanos arrive as LongType —
 * after which we restore a true TimestampType via integer-division to
 * micros. Truncation matches what DuckDB does when it reads the same
 * files (nanos → micro timestamps), so oracle parity is preserved.
 */
object Tables {

  /** Timestamp-typed columns per fixture table (FIXTURES.md §B). */
  private val tsCols: Map[String, Seq[String]] = Map(
    "events"   -> Seq("ts"),
    "lineitem" -> Seq("l_shipdate"),
    "orders"   -> Seq("o_orderdate")
  )

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // Runtime-settable legacy conf; idempotent.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    var df = spark.read.parquet(s"$sfDir/$name.parquet")
    for (c <- tsCols.getOrElse(name, Nil) if df.schema(c).dataType == LongType)
      df = df.withColumn(c, timestamp_micros(expr(s"$c div 1000")))
    df
  }
}
