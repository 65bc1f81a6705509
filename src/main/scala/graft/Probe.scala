package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe main — current use: the x140 forced-C>8 scaling probe
  * (round-16 done-criterion): time bitextAnnScored at the SAME forced
  * centroid count (32) on sf0.1 (2000 vecs) and the sf1 probe (8000
  * vecs) — at fixed C the assignment+probe stage should scale ~linearly
  * in N, which with C ∝ √N makes the per-row work √N (sublinear). */
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

    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    SparkEntry.queries("q2_topk")(spark, "/root/testdata/sf0.1")
      .write.format("noop").mode("overwrite").save()

    for (r <- 1 to 3) {
      timed(s"r$r sf0.1 (2000 vecs) forced C=32")(
        noop(graft.ext.Similarity.bitextAnnScored(spark,
          "/root/testdata/sf0.1", forceCentroids = 32)))
      timed(s"r$r sf1probe (8000 vecs) forced C=32")(
        noop(graft.ext.Similarity.bitextAnnScored(spark,
          "/root/repo/tmp/sf1probe", forceCentroids = 32)))
      timed(s"r$r sf0.1 default C (floor 8)")(
        noop(graft.ext.Similarity.bitextAnnScored(spark,
          "/root/testdata/sf0.1")))
    }
    spark.stop()
  }
}
