package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * First-`max` 1-based positions of `term` in the ANALYZED token stream
 * of the text, as ONE native char-scan pass — the occurrence locator
 * behind multi-fragment highlighting (x43, ES `number_of_fragments`).
 *
 * The declarative equivalent
 * `slice(filter(sequence(1, size(toks)), p -> element_at(toks, p) = term), 1, max)`
 * materializes an index array the size of the token stream and runs an
 * INTERPRETED lambda per element — measured 20x slower over the sf0.1
 * corpus (6.6 s vs 0.3 s for x43) — exactly the per-row hot loop the
 * repo's native-expression rule exists for. This expression reuses the
 * [[AnalyzeTokens]] single char scan, counts completed tokens, records
 * matches, and SHORT-CIRCUITS the scan once `max` positions are found.
 *
 * Semantics contract (mirrored by the DuckDB oracle):
 * `list_filter(range(1, len(toks) + 1), i -> toks[i] = term)[1:max]`
 * with `toks` the [[AnalyzeTokens]] stream — 1-based positions over the
 * analyzed tokens, first `max` only. `term` must already be a single
 * analyzed token (lowercase alphanumeric); the x43 builder passes a
 * literal. Pinned to the declarative form by `AnalyzerProps`.
 */
case class TokenPositions(child: Expression, term: String, max: Int)
    extends UnaryExpression with ExpectsInputTypes {

  // positions() casts to UTF8String — non-string children must fail at
  // analysis, not mid-task with a ClassCastException.
  // (No explicit result type: AbstractDataType is private[sql].)
  override def inputTypes = Seq(StringType)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TokenPositions.positions(input.asInstanceOf[UTF8String], term, max)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("posTerm", term, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TokenPositions$$.MODULE$$.positions($c, $ref, $max)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)

  override def prettyName: String = "token_positions"
}

object TokenPositions {
  import org.apache.spark.sql.GraftColumnBridge

  /** The single-pass scan shared by interpreted eval and codegen:
    * analyze, count tokens, record the first `max` positions of `term`,
    * stop scanning as soon as the cap is reached. */
  def positions(input: UTF8String, term: String, max: Int): ArrayData = {
    val text = input.toString
    val out = new ArrayBuffer[Any](max.min(8))
    val n = text.length
    var i = 0
    var tokIdx = 0
    val sb = new java.lang.StringBuilder(16)
    def complete(): Boolean = { // true when the cap is hit
      tokIdx += 1
      if (sb.toString == term) out += tokIdx
      sb.setLength(0)
      out.length >= max
    }
    while (i < n) {
      val c = text.charAt(i)
      if (c >= 'a' && c <= 'z' || c >= '0' && c <= '9') sb.append(c)
      else if (c >= 'A' && c <= 'Z') sb.append((c + 32).toChar)
      else if (sb.length > 0 && complete()) return new GenericArrayData(out.toArray)
      i += 1
    }
    if (sb.length > 0) complete()
    new GenericArrayData(out.toArray)
  }

  /** First-`max` 1-based analyzed-token positions of `term` in `text`. */
  def positionsOf(text: Column, term: String, max: Int): Column = {
    require(term.nonEmpty && max > 0, s"need a term and a positive cap")
    GraftColumnBridge.column(
      TokenPositions(GraftColumnBridge.expression(text), term, max))
  }
}
