package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties}

import graft.transform.Transforms

/**
 * Property-based checks (SURVEY.md §5): the enrichment chain must hold its
 * invariants for ARBITRARY payloads — including strings full of quotes,
 * backslashes, unicode, and empty values — not just the fixture corpus.
 */
object EnrichProps extends Properties("enrich") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.spark

  private val recSchema = StructType(Seq(
    StructField("key", StringType),
    StructField("value", StructType(Seq(
      StructField("a", StringType), StructField("b", DoubleType)))),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType)))

  private val genPayload: Gen[(String, Double)] = for {
    s <- Gen.oneOf(Gen.alphaNumStr,
      Gen.listOf(Gen.oneOf('"', '\\', 'ü', '≈', 'a', ' ', '\n')).map(_.mkString))
    d <- Gen.chooseNum(-1e6, 1e6)
  } yield (s, d)

  private val genRecords: Gen[List[(String, Option[(String, Double)], Long)]] =
    Gen.nonEmptyListOf(for {
      k <- Gen.alphaNumStr.map(_.take(8))
      payload <- Gen.option(genPayload)
    } yield (k, payload, 0L)).map(_.zipWithIndex.map {
      case ((k, p, _), i) => (k, p, i.toLong) // unique offsets
    })

  private def toDf(rows: List[(String, Option[(String, Double)], Long)]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (k, p, o) =>
        Row(k, p.map { case (a, b) => Row(a, b) }.orNull, "t", 0, o,
          new java.sql.Timestamp(1700000000000L + o))
      }, numSlices = 2), recSchema)

  property("row count, uid identity, uid uniqueness") = Prop.forAll(genRecords) { rows =>
    val env = Transforms.enrich("vj")(toDf(rows))
    val n = env.count()
    val uidOk = env.where(
      col("uid") =!= concat_ws("+", col("topic"), col("partition"), col("offset")))
      .count() == 0
    n == rows.length && uidOk &&
      env.select("uid").distinct().count() == rows.length
  }

  property("JSON field round-trips arbitrary payloads") = Prop.forAll(genRecords) { rows =>
    val env = Transforms.enrich("vj")(toDf(rows))
    val back = env.where(col("message.vj") =!= lit("TOMBSTONE"))
      .select(col("message.a").as("orig_a"),
        from_json(col("message.vj"),
          StructType(Seq(StructField("a", StringType), StructField("b", DoubleType))))
          .as("rt"))
    back.where(
      // to_json omits null fields; both-null counts as a match
      !(col("orig_a") <=> col("rt.a"))).count() == 0
  }

  property("tombstones: sentinel + all-null payload, count preserved") =
    Prop.forAll(genRecords) { rows =>
      val env = Transforms.enrich("vj")(toDf(rows))
      val tombs = env.where(col("message.vj") === "TOMBSTONE")
      tombs.count() == rows.count(_._2.isEmpty) &&
        tombs.where(col("message.a").isNotNull || col("message.b").isNotNull)
          .count() == 0
    }
}
