package graft

import org.apache.spark.sql.AnalysisException

/**
 * Contract tests for the SQL registration of graft's native expressions
 * ([[graft.functions.GraftFunctions]]): the `spark.sql` surface must
 * enforce the SAME guards as the Column API — no bare
 * NoSuchElementException on degenerate terms, no silent truncation of
 * multi-token terms, the ES 0..2 fuzzy-distance cap — and a non-foldable
 * plan-time-constant argument must fail as the standard
 * NON_FOLDABLE_ARGUMENT analysis error (the previously-cited legacy
 * error class does not exist in Spark 4.1 and crashed as
 * INTERNAL_ERROR).
 */
class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val view: Unit = {
    Seq(("the purchase went through", 1L), ("no match here", 2L))
      .toDF("text", "id").createOrReplaceTempView("gf_docs")
  }

  private def sqlRows(q: String) = { view; spark.sql(q).collect() }

  /** The builder runs at analysis time; Spark may wrap its exception —
    * search the cause chain for the expected fragment. */
  private def failureMessage(q: String): String = {
    view
    val e = intercept[Throwable](spark.sql(q).collect())
    Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).filter(_ != null).mkString(" | ")
  }

  test("fuzzy_match: happy path matches the Column API (term analyzed, " +
      "classic Levenshtein <= d)") {
    val hits = sqlRows(
      "SELECT id FROM gf_docs WHERE fuzzy_match(text, 'purchse', 1)")
    assert(hits.map(_.getLong(0)).toSeq == Seq(1L))
    // term analysis on the SQL path too: punctuation/case stripped
    val hits2 = sqlRows(
      "SELECT id FROM gf_docs WHERE fuzzy_match(text, 'PURCHSE!', 1)")
    assert(hits2.map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("fuzzy_match: a term analyzing to zero tokens is FALSE, not a " +
      "NoSuchElementException") {
    assert(sqlRows(
      "SELECT id FROM gf_docs WHERE fuzzy_match(text, '!!!', 1)").isEmpty)
  }

  test("fuzzy_match: multi-token terms are rejected, not silently " +
      "truncated to the first token") {
    assert(failureMessage(
      "SELECT fuzzy_match(text, 'two words', 1) FROM gf_docs")
      .contains("single token"))
  }

  test("fuzzy_match: distance outside ES's 0..2 cap is rejected") {
    assert(failureMessage(
      "SELECT fuzzy_match(text, 'term', 9) FROM gf_docs")
      .contains("0..2"))
    assert(failureMessage(
      "SELECT fuzzy_match(text, 'term', -1) FROM gf_docs")
      .contains("0..2"))
  }

  test("hashed_linear_score: native fold == declarative higher-order " +
      "formulation == driver-side MessageDigest reference, on fixture docs") {
    import org.apache.spark.sql.functions.expr
    val docs = graft.ingest.Tables.load(spark, sf, "documents").limit(50)
    val rows = docs.select($"text",
        graft.functions.HashedLinearScore.hashedLinearScore($"text")
          .as("native"),
        expr("aggregate(transform(split(text, ' ', -1), t -> " +
          "(cast(conv(substring(md5(t), 1, 8), 16, 10) as bigint) % 1024)" +
          " * 131 % 997 - 498), 0L, (a, x) -> a + x)").as("declarative"))
      .collect()
    assert(rows.length == 50)
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.foreach { r =>
      assert(r.getAs[Long]("native") == r.getAs[Long]("declarative"))
      val ref = r.getAs[String]("text").split(" ", -1).map { t =>
        val d = md.digest(t.getBytes("UTF-8")); md.reset()
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        ((h % 1024L) * 131L) % 997L - 498L
      }.sum
      assert(r.getAs[Long]("native") == ref)
    }
    // the filter genuinely discriminates: both classes occur
    val kept = rows.count(_.getAs[Long]("native") > 0)
    assert(kept > 0 && kept < rows.length)
    // the SQL registration resolves it too
    view
    val viaSql = sqlRows(
      "SELECT hashed_linear_score(text) FROM gf_docs WHERE id = 1")
    assert(viaSql.head.getLong(0) ==
      "the purchase went through".split(" ", -1).map { t =>
        val d = md.digest(t.getBytes("UTF-8")); md.reset()
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        ((h % 1024L) * 131L) % 997L - 498L
      }.sum)
  }

  test("non-foldable plan-time-constant arguments fail as " +
      "NON_FOLDABLE_ARGUMENT, not INTERNAL_ERROR") {
    view
    for (q <- Seq(
        "SELECT fuzzy_match(text, text, 1) FROM gf_docs",
        "SELECT fuzzy_match(text, 'term', CAST(id AS INT)) FROM gf_docs",
        "SELECT phrase_match(text, text) FROM gf_docs",
        "SELECT word_shingles(text, CAST(id AS INT)) FROM gf_docs")) {
      val e = intercept[AnalysisException](spark.sql(q).collect())
      assert(e.getCondition == "NON_FOLDABLE_ARGUMENT", q)
    }
  }
}
