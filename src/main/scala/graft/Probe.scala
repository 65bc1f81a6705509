package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe main — current use: A/B the minhash signature stage,
  * old explode + 12x min(md5) aggregate vs the fused MinHashSig native,
  * and the two heaviest downstream consumers, in the same session. */
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

    val docs = graft.ingest.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val numHashes = 12

    def oldSig = {
      val toks = docs.select(col("doc_id"),
        explode(graft.functions.WordShingles.shingles(col("text"), 3))
          .as("tok"))
      val sigCols = (0 until numHashes).map(k =>
        min(graft.ext.Dedup.minhashOf(k, col("tok"))).as(s"mh$k"))
      toks.groupBy(col("doc_id"))
        .agg(sigCols.head, sigCols.tail: _*)
        .select(col("doc_id"),
          array((0 until numHashes).map(k => col(s"mh$k")): _*).as("sig"))
    }
    def newSig = docs.select(col("doc_id"),
      graft.functions.MinHashSig.sig(col("text"), numHashes, 3).as("sig"))
      .where(col("sig").isNotNull)

    for (r <- 1 to 3) {
      timed(s"r$r old explode+agg sig")(noop(oldSig))
      timed(s"r$r new native sig")(noop(newSig))
      timed(s"r$r x3 full (native)")(
        noop(SparkEntry.queries("x3_dedup_minhash")(spark, dir)))
      timed(s"r$r x21 full (native)")(
        noop(SparkEntry.queries("x21_dup_clusters")(spark, dir)))
    }
    spark.stop()
  }
}
