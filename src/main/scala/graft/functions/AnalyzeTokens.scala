package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * ES-standard-analyzer-style tokenizer as ONE native pass: lowercase +
 * punctuation split. Kibana's message search runs through Elasticsearch's
 * standard analyzer (reference README.md:40-42), so `"Spark,"` in a log
 * line must match the query term `spark`; a plain whitespace `split`
 * misses that. This expression emits the analyzed token stream in a
 * single char scan per row — no regex, no interpreted higher-order
 * `filter(split(lower(..)))` chain (Spark lambdas are interpreted per
 * element, and tokenization sits under every search/TF-IDF/BM25 explode).
 *
 * Semantics contract (must match the DuckDB oracle EXACTLY — pinned by
 * `AnalyzerProps` against the declarative `filter(split(lower))` form):
 * tokens are maximal runs of ASCII alphanumerics `[A-Za-z0-9]`, with
 * `A-Z` mapped to lowercase; every other char (punctuation, whitespace,
 * non-ASCII) is a delimiter; empty tokens never appear. The DuckDB
 * equivalent is
 * `list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')`
 * — identical on all ASCII input (non-ASCII letters are delimiters on
 * both sides; exotic Unicode that case-folds INTO ASCII, e.g. U+212A
 * KELVIN SIGN, is out of contract).
 *
 * Unlike the batch-side expressions ([[WordShingles]] etc.) this one also
 * appears inside scan-stage FILTER predicates (analyzed KQL free text,
 * kq18/kq21), where a CodegenFallback would break the scan's whole-stage
 * codegen span — so `doGenCode` emits a static call into [[AnalyzeTokens
 * .tokenize]] and the surrounding operators stay fused.
 */
case class AnalyzeTokens(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    AnalyzeTokens.tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.AnalyzeTokens$$.MODULE$$.tokenize($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)

  override def prettyName: String = "analyze_tokens"
}

object AnalyzeTokens {
  import org.apache.spark.sql.GraftColumnBridge

  /** The single-pass scan shared by interpreted eval and codegen. */
  def tokenize(input: UTF8String): ArrayData = {
    val text = input.toString
    val out = new ArrayBuffer[Any]()
    val n = text.length
    var i = 0
    val sb = new java.lang.StringBuilder(16)
    while (i < n) {
      val c = text.charAt(i)
      if (c >= 'a' && c <= 'z' || c >= '0' && c <= '9') sb.append(c)
      else if (c >= 'A' && c <= 'Z') sb.append((c + 32).toChar)
      else if (sb.length > 0) {
        out += UTF8String.fromString(sb.toString)
        sb.setLength(0)
      }
      i += 1
    }
    if (sb.length > 0) out += UTF8String.fromString(sb.toString)
    new GenericArrayData(out.toArray)
  }

  /** ES-standard-analyzer token stream of a text column. */
  def analyze(text: Column): Column =
    GraftColumnBridge.column(
      AnalyzeTokens(GraftColumnBridge.expression(text)))
}
