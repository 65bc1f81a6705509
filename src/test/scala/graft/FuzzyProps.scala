package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.{AnalyzeTokens, FuzzyMatch}

/**
 * Property checks for the native fuzzy term match — the oracle contract
 * [[FuzzyMatch]]'s scaladoc pins: the one-pass scan (length pre-filter +
 * early-abandon DP + first-match short-circuit) must agree with the
 * DECLARATIVE form `exists(analyze_tokens(text), t -> levenshtein(t,
 * term) <= d)` built from Spark's OWN `levenshtein` built-in, on
 * arbitrary ASCII soup. The declarative form is also the exact shape of
 * the DuckDB oracle (`len(list_filter(toks, t -> levenshtein(t, term)
 * <= d)) > 0`, x48/kq31), so the property pins all three implementations
 * to one semantics. Classic Levenshtein on both sides — Spark's and
 * DuckDB's built-ins both count a transposition as 2.
 */
object FuzzyProps extends Properties("fuzzyMatch") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(12)

  private lazy val spark = SparkSpec.spark

  // tiny alphabet → real near-misses at distance 1-2, not just mismatches
  private val genChar: Gen[Char] = Gen.frequency(
    6 -> Gen.oneOf('a', 'b', 'c', 'A', '1'),
    3 -> Gen.oneOf(' ', ',', '.', ':', '_', '!', '-'))
  private val genText: Gen[String] =
    Gen.choose(0, 60).flatMap(n => Gen.listOfN(n, genChar)).map(_.mkString)
  private val genTexts: Gen[List[String]] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, genText))
  // terms analyze to exactly one token (alnum only, nonempty) — the
  // shape FuzzyMatch.fuzzy accepts; mixed case proves term analysis
  private val genTerm: Gen[String] =
    Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'A', '1'))).map(_.mkString)

  private def frameOf(texts: List[String]) = spark.createDataFrame(
    spark.sparkContext.parallelize(texts.zipWithIndex.map {
      case (t, i) => Row(i.toLong, t)
    }),
    StructType(Seq(StructField("id", LongType),
      StructField("text", StringType))))

  property("native scan == exists(analyze_tokens, levenshtein <= d) " +
      "via Spark's built-in") =
    Prop.forAll(genTexts, genTerm, Gen.choose(0, 2)) { (texts, term, d) =>
      val analyzed = term.toLowerCase(java.util.Locale.ROOT)
      val decl = exists(AnalyzeTokens.analyze(col("text")),
        t => levenshtein(t, lit(analyzed)) <= d)
      val both = frameOf(texts).select(
          FuzzyMatch.fuzzy(col("text"), term, Some(d)).as("native"),
          coalesce(decl, lit(false)).as("decl"))
        .collect()
      both.forall(r => r.getBoolean(0) == r.getBoolean(1))
    }

  property("AUTO schedule == explicit distance from term length " +
      "(0-2/3-5/>=6 -> 0/1/2)") =
    Prop.forAll(genTexts, genTerm) { (texts, term) =>
      val autoD = FuzzyMatch.auto(
        term.toLowerCase(java.util.Locale.ROOT).length)
      (autoD == (if (term.length <= 2) 0 else if (term.length <= 5) 1
                 else 2)) && {
        val both = frameOf(texts).select(
            FuzzyMatch.fuzzy(col("text"), term, None).as("auto"),
            FuzzyMatch.fuzzy(col("text"), term, Some(autoD)).as("explicit"))
          .collect()
        both.forall(r => r.getBoolean(0) == r.getBoolean(1))
      }
    }

  /** Reference classic-Levenshtein: the full textbook DP, no length
    * pre-filter, no early abandon — what `within`'s shortcuts must not
    * change. */
  private def levRef(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  private val genTok: Gen[String] =
    Gen.choose(0, 10).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))).map(_.mkString)

  property("within(tok, term, d) == (textbook DP distance <= d), " +
      "incl. d=0 and abandoned rows") =
    Prop.forAll(genTok, genTok, Gen.choose(0, 2)) { (tok, term, d) =>
      FuzzyMatch.within(tok, term, d) == (levRef(tok, term) <= d)
    }
}
