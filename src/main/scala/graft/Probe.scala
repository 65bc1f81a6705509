package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe main — current use: is kmeansCentroids' per-iteration
  * posexplode+groupBy(bucket,pos) aggregation beatable by 64 per-dim
  * decimal-sum columns grouped by bucket alone (same exact sums)? */
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
    SparkEntry.queries("q2_topk")(spark, dir)
      .write.format("noop").mode("overwrite").save()

    val emb = graft.ingest.Tables.load(spark, dir, "embeddings")
    val seeds = emb.where(col("vec_id") < 8).orderBy(col("vec_id"))
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq).toSeq
    val nc = graft.functions.NearestCentroid
      .nearest(col("embedding"), seeds).getField("bucket")

    for (r <- 1 to 3) {
      val a = timed(s"r$r explode form")(
        emb.select(nc.as("bucket"),
            posexplode(col("embedding")).as(Seq("pos", "v")))
          .groupBy(col("bucket"), col("pos"))
          .agg(sum(col("v").cast("double").cast("decimal(38,15)")).as("s"),
            count(lit(1)).as("c"))
          .select(col("bucket"), col("pos"),
            (col("s").cast("double") / col("c")).as("m"))
          .collect())
      val b = timed(s"r$r 64-col form")(
        emb.select(Seq(nc.as("bucket")) ++ (0 until 64).map(i =>
            col("embedding").getItem(i).cast("double")
              .cast("decimal(38,15)").as(s"v$i")): _*)
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("c"),
            (0 until 64).map(i => sum(col(s"v$i")).as(s"s$i")): _*)
          .collect())
      val ma = a.map(r0 => (r0.getInt(0), r0.getInt(1)) -> r0.getDouble(2)).toMap
      val mb = b.flatMap { r0 =>
        val bkt = r0.getInt(0); val c = r0.getLong(1)
        (0 until 64).map(i => (bkt, i) ->
          r0.getDecimal(2 + i).doubleValue() / c)
      }.toMap
      println(s"[probe] r$r equal: ${ma == mb} (${ma.size} cells)")
    }
    spark.stop()
  }
}
