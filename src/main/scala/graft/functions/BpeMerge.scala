package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * ONE byte-pair-encoding merge step over a word's symbol array: every
 * adjacent occurrence of (`l`, `r`) is fused into the single symbol
 * `l+r`, scanning LEFT TO RIGHT greedily (after a fusion the scan
 * resumes AFTER the new symbol, so overlapping candidates resolve to
 * even offsets — "aaaa" under (a,a) becomes [aa, aa], not [aa, a, a]).
 * This is the apply-half of Sennrich-style BPE; the training loop
 * ([[graft.ext.Bpe]]) calls it once per learned merge on the bounded
 * word-TYPE table, never on the corpus.
 *
 * A native expression for the same reason as [[WordShingles]]: the
 * equivalent higher-order-function form (`aggregate` carrying a list
 * accumulator) interprets a lambda per symbol per row. CodegenFallback
 * is fine — one virtual call per row, tight JVM loop inside.
 *
 * Oracle contract: the DuckDB mirror is the run-parity closed form —
 * a match position is kept iff its offset inside its maximal run of
 * consecutive match positions is even (runs longer than one only occur
 * when l == r; for l != r adjacent matches are impossible). Pinned by
 * `BpeProps` against a reference recursion on arbitrary inputs.
 */
case class BpeMerge(child: Expression, l: String, r: String)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    BpeMerge.merge(input.asInstanceOf[ArrayData], l, r)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)

  override def prettyName: String = "bpe_merge"
}

object BpeMerge {
  import org.apache.spark.sql.GraftColumnBridge

  /** Greedy left-to-right single-merge pass shared by eval and tests. */
  def merge(syms: ArrayData, l: String, r: String): ArrayData = {
    val n = syms.numElements()
    val lu = UTF8String.fromString(l)
    val ru = UTF8String.fromString(r)
    val fused = UTF8String.fromString(l + r)
    val out = new ArrayBuffer[Any](n)
    var i = 0
    while (i < n) {
      if (i + 1 < n && syms.getUTF8String(i) == lu &&
          syms.getUTF8String(i + 1) == ru) {
        out += fused
        i += 2
      } else {
        // clone: the input ArrayData may be backed by a reused unsafe
        // buffer; retained symbols must own their bytes
        out += syms.getUTF8String(i).clone()
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** One BPE merge step applied to a symbol-array column. */
  def apply(syms: Column, l: String, r: String): Column =
    GraftColumnBridge.column(
      BpeMerge(GraftColumnBridge.expression(syms), l, r))
}
