package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe main — current use: under which conditions does
  * InjectRuntimeFilter plant a bloom filter on q33's probe side? */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")

    def probe(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val df = mk
      val opt = df.queryExecution.optimizedPlan.toString
      println(s"[probe] $tag: bloom=" +
        opt.toLowerCase.contains("bloom") + " might_contain=" +
        opt.contains("might_contain"))
      if (!opt.toLowerCase.contains("bloom")) println(opt.take(2500))
    }

    val li = graft.ingest.Tables.load(spark, dir, "lineitem")
    val liRaw = spark.read.parquet(s"$dir/lineitem.parquet")
    val ordRaw = spark.read.parquet(s"$dir/orders.parquet")
      .drop("o_orderdate")
    val ord = graft.ingest.Tables.load(spark, dir, "orders")

    probe("mod-filter, Tables.load") {
      li.join(ord.where(col("o_orderkey") % 100 === 0),
          li("l_orderkey") === ord("o_orderkey"))
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
    }
    probe("eq-filter, Tables.load") {
      li.join(ord.where(col("o_orderpriority") === "1-URGENT"),
          li("l_orderkey") === ord("o_orderkey"))
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
    }
    probe("eq-filter, raw scans") {
      liRaw.join(ordRaw.where(col("o_orderpriority") === "1-URGENT"),
          liRaw("l_orderkey") === ordRaw("o_orderkey"))
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
    }
    spark.stop()
  }
}
