package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Scratch probe main — current use: does x73's total-over-vocab branch
  * reuse the token-counts aggregation exchange at runtime (AQE stage
  * cache), or does the corpus get scanned twice? */
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

    val df = graft.ext.TextAnalysis.vocabBuild(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    // the FINAL adaptive plan, post-execution
    val executed = df.queryExecution.executedPlan
    val finalPlan = executed.collectFirst {
      case a: AdaptiveSparkPlanExec => a.executedPlan
    }.getOrElse(executed)
    val s = finalPlan.toString
    println("[probe] ReusedExchange in final plan: " +
      s.contains("ReusedExchange"))
    println("[probe] ReusedQueryStage in final plan: " +
      s.contains("ReusedQueryStage"))
    println("[probe] parquet scans in final plan: " +
      "Scan parquet".r.findAllIn(s).length)
    println("[probe] shuffle stage ids: " +
      "ShuffleQueryStage (\\d+)".r.findAllMatchIn(s)
        .map(_.group(1)).toList.mkString(","))
    println(s)
    spark.stop()
  }
}
