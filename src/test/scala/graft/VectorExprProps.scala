package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties}

import graft.ext.Similarity
import graft.functions.{NearestCentroid, SignProjection}

/**
 * Property checks for the zero-shuffle native vector expressions: each must
 * agree with the declarative Spark plan it replaced on ARBITRARY float
 * vectors, not just the fixture embeddings — the native expression is an
 * optimization, never a semantics change.
 */
object VectorExprProps extends Properties("vectorExprs") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(6)

  private lazy val spark = SparkSpec.spark

  private val dim = 8

  private val genVec: Gen[Seq[Float]] =
    Gen.listOfN(dim, Gen.chooseNum(-4.0f, 4.0f)
      .suchThat(v => !v.isNaN && math.abs(v) > 1e-3f)).map(_.toSeq)

  private val genVecs: Gen[List[Seq[Float]]] =
    Gen.choose(3, 12).flatMap(n => Gen.listOfN(n, genVec))

  private val genCentroids: Gen[List[Seq[Double]]] =
    Gen.choose(2, 5).flatMap(c =>
      Gen.listOfN(c, genVec.map(_.map(_.toDouble))))

  private def vecDf(vs: List[Seq[Float]]) = {
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(vs.zipWithIndex.map { case (v, i) =>
        Row(i.toLong, v)
      }),
      schema)
  }

  property("NearestCentroid == crossJoin + round(cos,6) + row_number argmax") =
    Prop.forAll(genVecs, genCentroids) { (vs, cents) =>
      val df = vecDf(vs)
      val native = df.select(col("vec_id"),
          NearestCentroid.nearest(col("embedding"), cents)
            .getField("bucket").as("bucket"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      // the declarative plan the expression replaced (centroids as a frame)
      val centDf = spark.createDataFrame(
        spark.sparkContext.parallelize(cents.zipWithIndex.map { case (c, i) =>
          Row(i, c.map(_.toFloat))
        }),
        StructType(Seq(StructField("centroid_id", IntegerType),
          StructField("cent", ArrayType(FloatType)))))
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("csim").desc, col("centroid_id"))
      val declarative = df.crossJoin(broadcast(centDf))
        .withColumn("csim",
          round(Similarity.cosine(col("embedding"), col("cent")), 6))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .collect().map(r =>
          r.getAs[Long]("vec_id") -> r.getAs[Int]("centroid_id")).toMap
      native == declarative
    }

  property("SignProjection bands == per-bit sign of md5-hyperplane dots") =
    Prop.forAll(genVec) { v =>
      val nBands = 4; val bandBits = 8
      val df = vecDf(List(v))
      val bands = df.select(
          SignProjection.bands(col("embedding"), nBands, bandBits))
        .head().getAs[scala.collection.Seq[Int]](0)
      // re-derive from the definition: ±1 from md5("i:d") first-nibble bit
      val md = java.security.MessageDigest.getInstance("MD5")
      val expected = Array.fill(nBands)(0)
      for (i <- 0 until nBands * bandBits) {
        var dot = 0.0
        for (d <- 0 until dim) {
          md.reset()
          val h = md.digest(s"$i:$d".getBytes("UTF-8"))
          val sgn = if (((h(0) >>> 4) & 1) == 1) 1.0 else -1.0
          dot += sgn * v(d).toDouble
        }
        if (dot > 0.0) expected(i / bandBits) |= (1 << (i % bandBits))
      }
      bands.toSeq == expected.toSeq
    }
}
