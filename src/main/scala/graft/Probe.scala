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
    val x22 = SparkEntry.queries("x22_bm25_search")(spark, dir)
    time("x22_bm25")(x22.write.format("noop").mode("overwrite").save())
    x22.explain("formatted")
    val x19 = SparkEntry.queries("x19_simhash_pairs")(spark, dir)
    time("x19_simhash_pairs")(x19.write.format("noop").mode("overwrite").save())
    time("x19_simhash_pairs run2")(x19.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
