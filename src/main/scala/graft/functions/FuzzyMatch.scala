package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String

/**
 * ES fuzzy term match (`term~` / `fuzziness: AUTO`) as ONE native pass:
 * true iff ANY analyzed token of the text is within Levenshtein edit
 * distance `maxDist` of the (already-analyzed, lowercase) query term.
 * This is the last Kibana-search-box semantic (reference README.md:40-42,
 * the Lucene query-string `term~` suffix): a typo'd query like `purchse~`
 * still finds `purchase` rows.
 *
 * Distance semantics are CLASSIC Levenshtein (insert/delete/substitute,
 * a transposition counts as 2) — the cross-engine-reproducible contract,
 * since both Spark's and DuckDB's `levenshtein` built-ins are classic.
 * ES defaults to Damerau (`fuzzy_transpositions: true`); this models the
 * documented `fuzzy_transpositions: false` configuration, the same
 * deliberate-subset discipline as [[PhraseNear]]'s in-order-only contract.
 * `maxDist` is capped at 2 by the builders, exactly ES's Levenshtein-
 * automaton limit; AUTO maps query-term length 0-2 → 0, 3-5 → 1, ≥6 → 2
 * (the ES `fuzziness: AUTO` schedule).
 *
 * Per row: the text is tokenized with the identical single char scan as
 * [[AnalyzeTokens]]; each completed token first passes a length
 * pre-filter (`|len - termLen| <= maxDist`, a necessary condition), then
 * a two-row DP with EARLY ABANDON (row minimum > maxDist ⇒ no suffix can
 * recover) — O(len·termLen) worst case but O(maxDist·len) effective, and
 * the expression short-circuits on the first matching token. Like
 * [[AnalyzeTokens]]/[[PhraseMatch]] this sits inside scan-stage filter
 * predicates (KQL `term~N`), so `doGenCode` emits a static call and the
 * enclosing whole-stage-codegen span stays fused.
 *
 * Oracle contract: with `toks = list_filter(regexp_split_to_array(
 * lower(text), '[^a-z0-9]+'), t -> t <> '')`, the DuckDB equivalent is
 * `len(list_filter(toks, t -> levenshtein(t, term) <= maxDist)) > 0`
 * (pinned to Spark's built-in `levenshtein` by `FuzzyProps`).
 */
case class FuzzyMatch(child: Expression, term: String, maxDist: Int)
    extends UnaryExpression with Predicate {

  override def nullSafeEval(input: Any): Any =
    FuzzyMatch.matches(input.asInstanceOf[UTF8String], term, maxDist)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("fuzzyTerm", term, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.FuzzyMatch$$.MODULE$$.matches($c, $ref, $maxDist)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)

  override def prettyName: String = "fuzzy_match"
}

object FuzzyMatch {
  import org.apache.spark.sql.GraftColumnBridge

  /** ES `fuzziness: AUTO` distance schedule by query-term length. */
  def auto(termLen: Int): Int =
    if (termLen <= 2) 0 else if (termLen <= 5) 1 else 2

  /** The single-pass scan shared by interpreted eval and codegen:
    * analyze `input` with the [[AnalyzeTokens]] char scan, testing each
    * completed token against `term` as it streams. */
  def matches(input: UTF8String, term: String, maxDist: Int): Boolean = {
    val text = input.toString
    val n = text.length
    var i = 0
    val sb = new java.lang.StringBuilder(16)
    while (i < n) {
      val c = text.charAt(i)
      if (c >= 'a' && c <= 'z' || c >= '0' && c <= '9') sb.append(c)
      else if (c >= 'A' && c <= 'Z') sb.append((c + 32).toChar)
      else if (sb.length > 0) {
        val t = sb.toString; sb.setLength(0)
        if (within(t, term, maxDist)) return true
      }
      i += 1
    }
    sb.length > 0 && within(sb.toString, term, maxDist)
  }

  /** Classic Levenshtein `<= d` with length pre-filter and early abandon
    * (two-row DP; once a full row's minimum exceeds `d`, no completion
    * can bring the distance back under it). */
  private[graft] def within(tok: String, term: String, d: Int): Boolean = {
    val n = tok.length
    val m = term.length
    if (math.abs(n - m) > d) return false
    if (d == 0) return tok == term
    var prev = new Array[Int](m + 1)
    var curr = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= n) {
      curr(0) = i
      var rowMin = i
      val ci = tok.charAt(i - 1)
      j = 1
      while (j <= m) {
        val cost = if (ci == term.charAt(j - 1)) 0 else 1
        val v = math.min(math.min(prev(j) + 1, curr(j - 1) + 1),
          prev(j - 1) + cost)
        curr(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (rowMin > d) return false
      val tmp = prev; prev = curr; curr = tmp
      i += 1
    }
    prev(m) <= d
  }

  /** Expression-level builder shared by the Column API and the SQL
    * registration ([[GraftFunctions]]), so both entry points enforce ONE
    * contract: a term analyzing to zero tokens matches nothing (a plain
    * `false` literal), a multi-token term is rejected (never silently
    * truncated to its first token), and the distance is capped at ES's
    * Levenshtein-automaton limit of 2. */
  private[graft] def fuzzyExpr(child: Expression, termStr: String,
      maxDist: Option[Int]): Expression = {
    val toks = PhraseMatch.analyzePhrase(termStr)
    if (toks.isEmpty)
      org.apache.spark.sql.catalyst.expressions.Literal.FalseLiteral
    else {
      require(toks.length == 1,
        s"fuzzy term must analyze to a single token, got $toks from: $termStr")
      val t = toks.head
      val d = maxDist.getOrElse(auto(t.length))
      require(d >= 0 && d <= 2,
        s"fuzzy edit distance must be 0..2 (ES limit), got $d")
      FuzzyMatch(child, t, d)
    }
  }

  /** Fuzzy term predicate over a text column. `termStr` is analyzed at
    * plan time and must yield EXACTLY one token (ES fuzziness applies to
    * single terms); `maxDist = None` selects the AUTO schedule. A term
    * that analyzes to zero tokens matches nothing. */
  def fuzzy(text: Column, termStr: String,
      maxDist: Option[Int] = None): Column =
    GraftColumnBridge.column(
      fuzzyExpr(GraftColumnBridge.expression(text), termStr, maxDist))
}
