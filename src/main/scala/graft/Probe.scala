package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe main — current use: where does kq57_forget_key's
  * bench time go (fixture append vs the erasure itself)? */
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
    val work = java.nio.file.Files.createTempDirectory("kq57-probe").toFile
    val sink = new java.io.File(work, "log").toString
    val env = timed("envelope build")(Pipeline.envelopeFlat(spark, dir))
    timed("append")(graft.sink.ChangelogSink.append(env, sink))
    val nFiles = timed("list files")(
      java.nio.file.Files.walk(new java.io.File(sink).toPath)
        .filter(p => p.toString.endsWith(".parquet")).count())
    println(s"[probe] sink parquet files: $nFiles")
    val audit = timed("forgetKey")(
      graft.sink.ChangelogSink.forgetKey(spark, sink, "13").collect())
    println(s"[probe] audit rows: ${audit.length}")
    org.apache.commons.io.FileUtils.deleteQuietly(work)
    spark.stop()
  }
}
