package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc plan/profiling probe (dev tool, not part of the contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    time("warmup")(graft.ingest.Tables.load(spark, dir, "events").count())
    val hist = SparkEntry.queries("kq1_discover_hist")(spark, dir)
    time("kq1_discover_hist")(hist.write.format("noop").mode("overwrite").save())
    hist.explain("formatted")
    val x4 = SparkEntry.queries("x4_dedup_simhash")(spark, dir)
    time("x4_simhash")(x4.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
