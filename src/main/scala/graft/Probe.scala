package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe main — current use: split PLANNING vs EXECUTION time
  * for one pqCodebooks Lloyd iteration's literal-fold assignment job
  * (is x78/x97's training cost catalyst/codegen of the 4096-node
  * literal trees, or actual execution?). */
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
    emb.count()

    // replicate ONE pq iteration's stats job (books = init slices)
    val subDim = 16; val subspaces = 4; val k = 4
    val init = emb.where(col("vec_id") < k).orderBy(col("vec_id"))
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq)
    val books: Seq[Seq[Seq[Double]]] = (0 until subspaces).map(s =>
      init.toSeq.map(_.slice(s * subDim, (s + 1) * subDim)))

    def subDist(emb: org.apache.spark.sql.Column, cv: Seq[Double],
        off: Int): org.apache.spark.sql.Column =
      cv.indices.map { i =>
        val d = emb.getItem(off + i).cast("double") - lit(cv(i))
        d * d
      }.reduce(_ + _)
    def argminC(d: Seq[org.apache.spark.sql.Column]) = {
      val m = least(d: _*)
      d.zipWithIndex.tail.foldLeft(when(d.head === m, 0)) {
        case (acc, (dc, c)) => acc.when(dc === m, c)
      }
    }

    for (r <- 1 to 2) {
      val bucketCols = (0 until subspaces).map { s =>
        val d = (0 until k).map(c =>
          round(subDist(col("embedding"), books(s)(c), s * subDim), 6))
        argminC(d).as(s"b$s")
      }
      val sSub = (col("pos") / lit(subDim)).cast("int")
      val stats = emb.select(Seq(col("embedding")) ++ bucketCols: _*)
        .select(array((0 until subspaces).map(s => col(s"b$s")): _*)
            .as("bs"),
          posexplode(col("embedding")).as(Seq("pos", "v")))
        .select(sSub.as("s_sub"),
          element_at(col("bs"), sSub + 1).as("c"),
          pmod(col("pos"), lit(subDim)).as("lpos"), col("v"))
        .groupBy(col("s_sub"), col("c"), col("lpos"))
        .agg(sum(col("v").cast("double").cast("decimal(38,15)")).as("sm"),
          count(lit(1)).as("n"))
        .select(col("s_sub"), col("c"), col("lpos"),
          (col("sm").cast("double") / col("n")).as("m"))
      val qe = stats.queryExecution
      timed(s"r$r analyze+optimize")(qe.optimizedPlan)
      timed(s"r$r physical plan")(qe.executedPlan)
      timed(s"r$r execute collect")(stats.collect())
    }
    spark.stop()
  }
}
