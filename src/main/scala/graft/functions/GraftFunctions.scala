package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * SQL registration of graft's native expressions, so the `spark.sql`
 * surface (the strict superset of Kibana's query surface, SURVEY.md §2.3)
 * can call them by name alongside the built-ins.
 *
 * Two installation paths:
 *  - per-session: {{{ GraftFunctions.register(spark) }}} (temp functions
 *    in the current session state only);
 *  - cluster-wide: `--conf spark.sql.extensions=graft.functions.GraftExtensions`
 *    — the standard [[SparkSessionExtensions]] hook, so EVERY session
 *    state built on the cluster (spark-sql CLI, Thrift server, notebook
 *    `newSession()`s) resolves the functions without any driver-side
 *    registration call.
 *
 * {{{
 *   spark.sql("SELECT cosine_similarity(a.embedding, b.embedding) ...")
 * }}}
 */
object GraftFunctions {

  /** Plan-time-constant argument: several builders fold an argument on
    * the driver at resolution time (shingle width, query phrase, fuzzy
    * term). A non-foldable argument (e.g. a column) would hit
    * `eval()` with an opaque unsupported-operation error — fail as a
    * clear ANALYSIS error instead, via the standard
    * `NON_FOLDABLE_ARGUMENT` condition (the legacy template class this
    * once cited does not exist in Spark 4.1's error-conditions.json, so
    * constructing it crashed with INTERNAL_ERROR instead of the intended
    * message). */
  private def constArg(fn: String, param: String, tpe: String,
      e: Expression): Any = {
    if (!e.foldable) throw new org.apache.spark.sql.AnalysisException(
      errorClass = "NON_FOLDABLE_ARGUMENT",
      messageParameters = Map("funcName" -> s"`$fn`",
        "paramName" -> s"`$param`", "paramType" -> s""""$tpe""""))
    e.eval()
  }

  /** name → builder, shared by both installation paths. */
  private[functions] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_similarity" ->
      (exprs => CosineSimilarity(exprs(0), exprs(1))),
    "simhash32" ->
      (exprs => SimHash32(exprs.head)),
    "word_shingles" ->
      (exprs => WordShingles(exprs.head,
        constArg("word_shingles", "n", "INT", exprs(1))
          .asInstanceOf[Int])),
    "bigram_stats" ->
      (exprs => BigramStats(exprs.head)),
    "hashed_linear_score" ->
      (exprs => HashedLinearScore(exprs.head)),
    "hashed_bigram_weight_sum" ->
      (exprs => HashedBigramWeightSum(exprs(0), exprs(1))),
    "analyze_tokens" ->
      (exprs => AnalyzeTokens(exprs.head)),
    // phrase is a plan-time constant (like word_shingles' n): analyzed
    // once on the driver, so SQL callers get the same contract as the
    // Column API — `phrase_match(text, 'Spark streaming')`
    "phrase_match" ->
      (exprs => PhraseMatch(exprs.head, PhraseMatch.analyzePhrase(
        constArg("phrase_match", "phrase", "STRING", exprs(1)).toString))),
    "phrase_near" ->
      (exprs => PhraseNear(exprs.head,
        PhraseMatch.analyzePhrase(
          constArg("phrase_near", "phrase", "STRING", exprs(1)).toString),
        constArg("phrase_near", "slop", "INT", exprs(2))
          .asInstanceOf[Int])),
    // routed through FuzzyMatch.fuzzy so SQL and Column callers share ONE
    // contract: a term analyzing to zero tokens is `false` (not a bare
    // NoSuchElementException), a multi-token term is rejected (not
    // silently truncated to its first token), and the ES 0..2 distance
    // cap is enforced — `fuzzy_match(text, 'purchse', 1)`
    "fuzzy_match" ->
      (exprs => FuzzyMatch.fuzzyExpr(exprs.head,
        constArg("fuzzy_match", "term", "STRING", exprs(1)).toString,
        Some(constArg("fuzzy_match", "distance", "INT", exprs(2))
          .asInstanceOf[Int]))),
    // vocab arrays are plan-time constants (the bounded corpus-derived
    // piece table) — `unigram_viterbi(word, array('a',...), array(-3L,...))`
    "unigram_viterbi" ->
      (exprs => {
        val ps = constArg("unigram_viterbi", "pieces", "ARRAY<STRING>",
          exprs(1)).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toArray[org.apache.spark.unsafe.types.UTF8String](
            org.apache.spark.sql.types.StringType).map(_.toString).toSeq
        val ws = constArg("unigram_viterbi", "weights", "ARRAY<BIGINT>",
          exprs(2)).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toLongArray().toSeq
        UnigramViterbi(exprs.head, ps, ws)
      }),
    "confluent_avro_decode" ->
      (exprs => {
        val schema = constArg("confluent_avro_decode", "schema", "STRING",
          exprs(1)).toString
        graft.ingest.ConfluentAvroDecode(exprs.head,
          graft.ingest.StaticSchemaRegistry(Map(1 -> schema)), schema)
      })
  )

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    builders.foreach { case (name, builder) =>
      registry.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }
}

/** The `spark.sql.extensions` entry point (see [[GraftFunctions]]). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name), builder))
    }
}
