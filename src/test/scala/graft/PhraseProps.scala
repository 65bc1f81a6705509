package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.{AnalyzeTokens, PhraseMatch}

/**
 * Property checks for the native match_phrase: [[PhraseMatch]]'s one-pass
 * ring-buffer scan must agree with the DECLARATIVE consecutive-window
 * check over the analyzed token array — `exists(sequence over window
 * starts, all k positions equal)` — on ARBITRARY ASCII soup and phrases,
 * including phrases absent from the text, phrases longer than the text,
 * and empty/all-delimiter phrases (zero analyzed tokens match NOTHING,
 * ES `zero_terms_query: none`). The declarative form is also the exact
 * shape of the DuckDB oracle (`list_filter(range(len(toks)-k+1), ...)`),
 * so the property pins all three implementations to one semantics.
 */
object PhraseProps extends Properties("phraseMatch") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(12)

  private lazy val spark = SparkSpec.spark

  private val genChar: Gen[Char] = Gen.frequency(
    6 -> Gen.oneOf('a', 'b', 'A', 'B', '1'), // tiny alphabet → real matches
    3 -> Gen.oneOf(' ', ',', '.', ':', '_', '!', '-'))
  private val genText: Gen[String] =
    Gen.choose(0, 60).flatMap(n => Gen.listOfN(n, genChar)).map(_.mkString)
  private val genTexts: Gen[List[String]] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, genText))
  private val genPhrase: Gen[String] =
    Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, genChar)).map(_.mkString)

  property("native ring-buffer == declarative window check over " +
      "analyzed tokens") =
    Prop.forAll(genTexts, genPhrase) { (texts, phrase) =>
      val ptoks = PhraseMatch.analyzePhrase(phrase)
      val schema = StructType(Seq(
        StructField("id", LongType),
        StructField("text", StringType)))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(texts.zipWithIndex.map {
          case (t, i) => Row(i.toLong, t)
        }),
        schema)
      val declarative: org.apache.spark.sql.Column =
        if (ptoks.isEmpty) lit(false)
        else {
          val toks = AnalyzeTokens.analyze(col("text"))
          val k = ptoks.length
          // window starts 0 .. size-k; the when() guard matters because
          // Spark's sequence(0, negative) DESCENDS instead of being empty
          when(size(toks) >= k,
            exists(
              sequence(lit(0), size(toks) - k),
              start => ptoks.zipWithIndex.map { case (p, j) =>
                element_at(toks, start + j + 1) === lit(p)
              }.reduce(_ && _)))
            .otherwise(lit(false))
        }
      val both = df.select(
          PhraseMatch.phrase(col("text"), phrase).as("native"),
          coalesce(declarative, lit(false)).as("decl"))
        .collect()
      both.forall(r => r.getBoolean(0) == r.getBoolean(1))
    }

  /** Independent reference for span_near(in_order): exhaustive search for
    * positions p1 < … < pk with span <= k + slop (no greedy shortcut). */
  private def bruteNear(toks: Array[String], ph: Seq[String],
      slop: Int): Boolean = {
    val k = ph.length
    if (k == 0) return false
    def go(j: Int, prev: Int, first: Int): Boolean =
      j == k || toks.indices.exists(p =>
        p > prev && p <= first + k + slop - 1 && toks(p) == ph(j) &&
          go(j + 1, p, first))
    toks.indices.exists(p0 => toks(p0) == ph.head && go(1, p0, p0))
  }

  property("span_near greedy window scan == exhaustive position search; " +
      "slop 0 == match_phrase") =
    Prop.forAll(genTexts, genPhrase, Gen.choose(0, 3)) {
      (texts, phrase, slop) =>
        val ptoks = PhraseMatch.analyzePhrase(phrase)
        val schema = StructType(Seq(
          StructField("id", LongType),
          StructField("text", StringType)))
        val df = spark.createDataFrame(
          spark.sparkContext.parallelize(texts.zipWithIndex.map {
            case (t, i) => Row(i.toLong, t)
          }),
          schema)
        val rows = df.select(col("text"),
            PhraseMatch.near(col("text"), phrase, slop).as("near"),
            PhraseMatch.phrase(col("text"), phrase).as("exact"))
          .collect()
        rows.forall { r =>
          val toks = PhraseMatch.analyzePhrase(r.getString(0)).toArray
          r.getBoolean(1) == bruteNear(toks, ptoks, slop) &&
            // slop 0 must coincide with exact phrase adjacency
            (slop != 0 || r.getBoolean(1) == r.getBoolean(2))
        }
    }
}
