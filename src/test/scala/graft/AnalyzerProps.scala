package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.{AnalyzeTokens, TokenPositions}

/**
 * Property checks for the ES-standard-analyzer tokenizer: the native
 * one-pass [[AnalyzeTokens]] must agree with the DECLARATIVE Spark plan
 * it replaces — `filter(split(lower(text), "[^a-z0-9]+"), t -> t <> "")`
 * — on ARBITRARY ASCII text (the expression's documented contract), not
 * just the clean fixture corpus. That declarative form is also the exact
 * shape of the DuckDB oracle (`list_filter(regexp_split_to_array(...))`),
 * so this property pins all three implementations to one semantics.
 */
object AnalyzerProps extends Properties("analyzeTokens") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.spark

  // ASCII soup: letters (both cases), digits, punctuation, whitespace —
  // including strings that are ALL delimiters and empty strings
  private val genChar: Gen[Char] = Gen.frequency(
    6 -> Gen.alphaChar,
    2 -> Gen.numChar,
    3 -> Gen.oneOf(' ', ',', '.', ';', ':', '!', '?', '"', '\'', '(', ')',
      '[', ']', '{', '}', '-', '_', '/', '\\', '@', '#', '*', '\t', '\n'))
  private val genText: Gen[String] =
    Gen.choose(0, 80).flatMap(n => Gen.listOfN(n, genChar)).map(_.mkString)
  private val genTexts: Gen[List[String]] =
    Gen.choose(1, 10).flatMap(n => Gen.listOfN(n, genText))

  property("native == filter(split(lower(text), punct)) == the oracle shape") =
    Prop.forAll(genTexts) { texts =>
      val schema = StructType(Seq(
        StructField("id", LongType),
        StructField("text", StringType)))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(texts.zipWithIndex.map {
          case (t, i) => Row(i.toLong, t)
        }),
        schema)
      val both = df.select(col("id"),
          AnalyzeTokens.analyze(col("text")).as("native"),
          filter(split(lower(col("text")), "[^a-z0-9]+"),
            t => t =!= "").as("declarative"))
        .collect()
      both.forall { r =>
        r.getSeq[String](1) == r.getSeq[String](2)
      }
    }

  property("token_positions: native short-circuit scan == declarative " +
      "slice(filter(sequence), 1, max) over the analyzed stream") =
    Prop.forAll(genTexts, Gen.oneOf("a", "ab", "a1", "zz"),
        Gen.choose(1, 4)) { (texts, term, max) =>
      val schema = StructType(Seq(
        StructField("id", LongType),
        StructField("text", StringType)))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(texts.zipWithIndex.map {
          case (t, i) => Row(i.toLong, t)
        }),
        schema)
      val toks = AnalyzeTokens.analyze(col("text"))
      // the when() guard: Spark's sequence(1, 0) DESCENDS, not empties
      val decl = when(size(toks) > 0,
        slice(filter(sequence(lit(1), size(toks)),
          p => element_at(toks, p) === term), 1, max))
        .otherwise(array().cast("array<int>"))
      val both = df.select(
          TokenPositions.positionsOf(col("text"), term, max).as("native"),
          decl.as("declarative"))
        .collect()
      both.forall(r => r.getSeq[Int](0) == r.getSeq[Int](1))
    }
}
