package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe main — current use: does localCheckpointing the tiny
  * (doc_id, sig) frame — so the band self-join's two branches read one
  * materialized signature table instead of evaluating the shingle+md5
  * pass twice — beat the current duplicated-subtree plan? */
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
    val rowsPerBand = 3

    def pairsFrom(sig: org.apache.spark.sql.DataFrame) = {
      val keys = array((0 until numHashes / rowsPerBand).map { b =>
        val cols = (b * rowsPerBand until (b + 1) * rowsPerBand)
          .map(k => element_at(col("sig"), k + 1))
        xxhash64(lit(b) +: cols: _*)
      }: _*)
      val bands = sig.select(col("doc_id"), col("sig"),
        explode(keys).as("bkey"))
      val l = bands.as("l"); val r = bands.as("r")
      val agree = (0 until numHashes).map(k =>
        when(element_at(col("sig1"), k + 1) ===
          element_at(col("sig2"), k + 1), 1).otherwise(0))
        .reduce(_ + _)
      l.join(r,
          col("l.bkey") === col("r.bkey") &&
            col("l.doc_id") < col("r.doc_id"))
        .groupBy(col("l.doc_id").as("d1"), col("r.doc_id").as("d2"))
        .agg(first(col("l.sig")).as("sig1"), first(col("r.sig")).as("sig2"))
        .withColumn("est_jaccard",
          round(agree.cast("double") / numHashes, 6))
        .where(col("est_jaccard") >= 0.5)
        .select(col("d1"), col("d2"), col("est_jaccard"))
    }
    def sigFrame = docs.select(col("doc_id"),
      graft.functions.MinHashSig.sig(col("text"), numHashes, 3).as("sig"))
      .where(col("sig").isNotNull)

    for (r <- 1 to 3) {
      timed(s"r$r pairs, duplicated sig subtree")(noop(pairsFrom(sigFrame)))
      timed(s"r$r pairs, localCheckpointed sig")(
        noop(pairsFrom(sigFrame.localCheckpoint())))
      timed(s"r$r pairs, DISK_ONLY persisted sig") {
        val sp = sigFrame.persist(
          org.apache.spark.storage.StorageLevel.DISK_ONLY)
        sp.count()
        noop(pairsFrom(sp))
        sp.unpersist(true)
      }
    }
    spark.stop()
  }
}
