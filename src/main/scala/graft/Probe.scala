package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe main — current use: cost decomposition of the shared
  * envelope chain (Sources → enrich → flatten) that underlies every
  * kq entry, plus kq65's remaining legs. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")

    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    SparkEntry.queries("q2_topk")(spark, dir)
      .write.format("noop").mode("overwrite").save()

    for (r <- 1 to 2) {
      timed(s"r$r raw events scan")(
        noop(graft.ingest.Tables.load(spark, dir, "events")))
      timed(s"r$r eventsAsRecords")(
        noop(graft.ingest.Sources.eventsAsRecords(spark, dir)))
      timed(s"r$r envelope (enrich)")(noop(Pipeline.envelope(spark, dir)))
      timed(s"r$r envelopeFlat")(noop(Pipeline.envelopeFlat(spark, dir)))
      timed(s"r$r envFlat bucket+key distinct")(
        noop(Pipeline.envelopeFlat(spark, dir)
          .select(date_trunc("hour", col("timestamp")).as("bucket"),
            col("key")).distinct()))
      timed(s"r$r kq65 full")(
        noop(SparkEntry.queries("kq65_sliding_uniques")(spark, dir)))
    }
    spark.stop()
  }
}
