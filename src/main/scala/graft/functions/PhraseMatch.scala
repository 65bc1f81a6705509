package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String

/**
 * ES `match_phrase` as ONE native pass: the ANALYZED tokens of the query
 * phrase must appear CONSECUTIVELY in the analyzed token stream of the
 * text. This is the Kibana search box's quoted-phrase semantics
 * (reference README.md:40-42): `"Spark streaming"` must match
 * `spark, streaming.` — both sides run through the standard analyzer, and
 * token POSITIONS matter (`"type click"` does not match a document whose
 * `type` and `click` tokens are not adjacent).
 *
 * The query phrase is analyzed ONCE at plan time ([[PhraseMatch.phrase]])
 * into a literal token array; per row, the text is tokenized with the
 * identical single char scan as [[AnalyzeTokens]] while a ring buffer of
 * the last k tokens is compared against the phrase — no token array is
 * materialized, no positional postings are built, and the expression
 * short-circuits on the first match. Like [[AnalyzeTokens]] this sits
 * inside scan-stage filter predicates (KQL quoted phrases), so
 * `doGenCode` emits a static call and the enclosing whole-stage-codegen
 * span stays fused.
 *
 * Oracle contract (same analyzer contract as [[AnalyzeTokens]]): with
 * `toks = list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
 * t -> t <> '')` and phrase tokens p1..pk, the DuckDB equivalent is
 * `len(list_filter(range(len(toks) - (k-1)), i -> toks[i+1] = p1 AND ...
 * AND toks[i+k] = pk)) > 0`.
 */
case class PhraseMatch(child: Expression, phrase: Seq[String])
    extends UnaryExpression with Predicate {

  @transient private lazy val phraseArr: Array[String] = phrase.toArray

  override def nullSafeEval(input: Any): Any =
    PhraseMatch.matches(input.asInstanceOf[UTF8String], phraseArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("phraseTokens", phraseArr,
      "java.lang.String[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PhraseMatch$$.MODULE$$.matches($c, $ref)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)

  override def prettyName: String = "phrase_match"
}

/**
 * ES/Lucene `span_near` with `in_order: true`: the analyzed phrase tokens
 * must appear IN ORDER with at most `slop` interleaved non-matching
 * positions — formally, positions p1 < … < pk with
 * `(pk - p1 + 1) - k <= slop` and p1 an occurrence of the first token.
 * `slop = 0` degenerates to [[PhraseMatch]] (exact adjacency). This is
 * the ordered-proximity half of ES's sloppy matching; it deliberately
 * does NOT model `match_phrase`'s out-of-order transpositions (which
 * Lucene admits at slop ≥ 2) — in-order span_near is the documented,
 * cross-engine-reproducible contract.
 *
 * Per row: one analyzer pass materializes the token array, then each
 * occurrence of the first token anchors a GREEDY leftmost subsequence
 * match inside its bounded `k + slop` window (greedy is exact for
 * subsequence existence) — O(tokens · (k + slop)), short-circuiting on
 * the first hit.
 */
case class PhraseNear(child: Expression, phrase: Seq[String], slop: Int)
    extends UnaryExpression with Predicate {

  @transient private lazy val phraseArr: Array[String] = phrase.toArray

  override def nullSafeEval(input: Any): Any =
    PhraseMatch.nearMatches(input.asInstanceOf[UTF8String], phraseArr, slop)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("phraseTokens", phraseArr,
      "java.lang.String[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PhraseMatch$$.MODULE$$.nearMatches($c, $ref, $slop)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)

  override def prettyName: String = "phrase_near"
}

object PhraseMatch {
  import org.apache.spark.sql.GraftColumnBridge

  /** The single-pass scan shared by interpreted eval and codegen: analyze
    * `input` with the [[AnalyzeTokens]] char scan, matching the last k
    * tokens against `phrase` as they stream. */
  def matches(input: UTF8String, phrase: Array[String]): Boolean = {
    val k = phrase.length
    if (k == 0) return false
    val text = input.toString
    val ring = new Array[String](k)
    var seen = 0
    // emits the just-completed token into the ring; true iff the last k
    // tokens now equal the phrase
    def push(tok: String): Boolean = {
      ring(seen % k) = tok
      seen += 1
      seen >= k && {
        var j = 0
        while (j < k && ring((seen - k + j) % k) == phrase(j)) j += 1
        j == k
      }
    }
    val n = text.length
    var i = 0
    val sb = new java.lang.StringBuilder(16)
    while (i < n) {
      val c = text.charAt(i)
      if (c >= 'a' && c <= 'z' || c >= '0' && c <= '9') sb.append(c)
      else if (c >= 'A' && c <= 'Z') sb.append((c + 32).toChar)
      else if (sb.length > 0) {
        val t = sb.toString; sb.setLength(0)
        if (push(t)) return true
      }
      i += 1
    }
    sb.length > 0 && push(sb.toString)
  }

  /** Analyzed tokens of the query phrase — the identical contract as
    * [[AnalyzeTokens.tokenize]], run on the DRIVER at plan time. */
  def analyzePhrase(s: String): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    val sb = new java.lang.StringBuilder(16)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c >= 'a' && c <= 'z' || c >= '0' && c <= '9') sb.append(c)
      else if (c >= 'A' && c <= 'Z') sb.append((c + 32).toChar)
      else if (sb.length > 0) { out += sb.toString; sb.setLength(0) }
      i += 1
    }
    if (sb.length > 0) out += sb.toString
    out.toSeq
  }

  /** match_phrase predicate over a text column. A phrase that analyzes to
    * ZERO tokens matches nothing (ES `zero_terms_query: none`). */
  def phrase(text: Column, phraseStr: String): Column = {
    val toks = analyzePhrase(phraseStr)
    if (toks.isEmpty) org.apache.spark.sql.functions.lit(false)
    else GraftColumnBridge.column(
      PhraseMatch(GraftColumnBridge.expression(text), toks))
  }

  /** The [[PhraseNear]] scan: analyze, then greedy in-window subsequence
    * match anchored at each first-token occurrence. */
  def nearMatches(input: UTF8String, phrase: Array[String],
      slop: Int): Boolean = {
    val k = phrase.length
    if (k == 0) return false
    val toks = tokensOf(input.toString)
    val n = toks.length
    var i = 0
    while (i < n) {
      if (toks(i) == phrase(0)) {
        var j = 1
        var p = i + 1
        val end = math.min(n, i + k + slop) // pk <= p1 + k + slop - 1
        while (j < k && p < end) {
          if (toks(p) == phrase(j)) j += 1
          p += 1
        }
        if (j == k) return true
      }
      i += 1
    }
    false
  }

  /** Analyzer pass shared by [[nearMatches]] — same char-scan contract
    * as [[AnalyzeTokens.tokenize]], into a plain array. */
  private[functions] def tokensOf(text: String): Array[String] = {
    val out = ArrayBuffer.empty[String]
    val sb = new java.lang.StringBuilder(16)
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c >= 'a' && c <= 'z' || c >= '0' && c <= '9') sb.append(c)
      else if (c >= 'A' && c <= 'Z') sb.append((c + 32).toChar)
      else if (sb.length > 0) { out += sb.toString; sb.setLength(0) }
      i += 1
    }
    if (sb.length > 0) out += sb.toString
    out.toArray
  }

  /** span_near(in_order=true, slop) predicate over a text column. */
  def near(text: Column, phraseStr: String, slop: Int): Column = {
    require(slop >= 0, s"slop must be >= 0, got $slop")
    val toks = analyzePhrase(phraseStr)
    if (toks.isEmpty) org.apache.spark.sql.functions.lit(false)
    else GraftColumnBridge.column(
      PhraseNear(GraftColumnBridge.expression(text), toks, slop))
  }
}
