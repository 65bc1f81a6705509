package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe main — current use: is q51's cost the THREE separate
  * percentile_cont buffers (vs one shared array-percentile buffer), and
  * where does q20_sketch's time go? */
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
    graft.ingest.Tables.load(spark, dir, "lineitem")
      .createOrReplaceTempView("li")

    for (r <- 1 to 2) {
      timed(s"r$r q51 as-is")(
        noop(SparkEntry.queries("q51_ordered_set")(spark, dir)))
      timed(s"r$r q51 one-array-percentile")(noop(spark.sql(
        """SELECT l_returnflag, n,
          |  ps[0] AS p25_cents, ps[1] AS p50_cents, ps[2] AS p75_cents,
          |  n_heavy, heavy_cents FROM (
          |SELECT l_returnflag, count(*) AS n,
          |  percentile(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT),
          |    array(0.25D, 0.5D, 0.75D)) AS ps,
          |  count(*) FILTER (WHERE l_quantity > 25) AS n_heavy,
          |  sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
          |    FILTER (WHERE l_quantity > 25) AS heavy_cents
          |FROM li GROUP BY l_returnflag) ORDER BY l_returnflag""".stripMargin)))
      timed(s"r$r q20 as-is")(
        noop(SparkEntry.queries("q20_sketch")(spark, dir)))
      timed(s"r$r q20 exact-only")(noop(spark.sql(
        """SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
          |  percentile(l_quantity, 0.5D) AS m
          |FROM li GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)))
      timed(s"r$r q20 approx-only")(noop(spark.sql(
        """SELECT l_returnflag, approx_count_distinct(l_partkey) AS a,
          |  approx_percentile(l_quantity, 0.5D, 1000) AS m
          |FROM li GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)))
    }
    spark.stop()
  }
}
