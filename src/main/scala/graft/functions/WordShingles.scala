package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Distinct word-n-gram shingles of a text column in ONE pass — the
 * native replacement for `array_distinct(transform(sequence(...),
 * i -> concat(element_at(...))))`. Spark's higher-order functions are
 * interpreted per element (lambda dispatch + boxing for every shingle);
 * on a 2M-shingle corpus that interpretation dominated the near-dup
 * bench. This expression does the split + window + dedup in plain JVM
 * code per row. CodegenFallback is fine: it's ONE virtual call per row
 * with the real work in a tight loop inside.
 *
 * Semantics contract (must match the DuckDB oracle):
 * tokens = text split on single spaces (empty tokens preserved, like
 * `string_split`/Spark `split`), shingles = space-joined windows of n
 * consecutive tokens, deduped keeping first occurrence.
 */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val toks = text.split(" ", -1)
    val out = new mutable.LinkedHashSet[String]
    var i = 0
    val last = toks.length - n
    val sb = new java.lang.StringBuilder(64)
    while (i <= last) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out.add(sb.toString)
      i += 1
    }
    new GenericArrayData(out.iterator.map(UTF8String.fromString).toArray[Any])
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)

  override def prettyName: String = s"word_shingles_$n"
}

/**
 * [[WordShingles]] with the shingles emitted as their `xxhash64` keys
 * (array<long>) instead of strings — the verification-side form of the
 * near-dup pair queries, where the exact `array_intersect` only ever
 * compares shingle IDENTITY, never content. Hashing inside the same
 * one-pass loop keeps the ~35-byte shingle strings out of every join
 * exchange: the arrays move 8 bytes per shingle.
 *
 * Bit-compat contract: element i equals
 * `xxhash64(word_shingles(text, n)[i])` exactly — same dedup (by STRING,
 * first occurrence, so the array LENGTH always equals the string-set
 * size even if two distinct shingles collide) and the same
 * [[XXH64.hashUTF8String]] seed-42 hash the builtin uses (pinned in
 * DedupSpec). Callers that need collision-exactness pair this with a
 * global injectivity check over the (hash, string) vocabulary — see
 * [[graft.ext.Dedup.ngramJaccardPairsOf]].
 */
case class WordShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val toks = text.split(" ", -1)
    val seen = new mutable.LinkedHashSet[String]
    var i = 0
    val last = toks.length - n
    val sb = new java.lang.StringBuilder(64)
    while (i <= last) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Long](seen.size)
    var k = 0
    val it = seen.iterator
    while (it.hasNext) {
      out(k) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUTF8String(UTF8String.fromString(it.next()), 42L)
      k += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)

  override def prettyName: String = s"word_shingle_hashes_$n"
}

object WordShingles {
  import org.apache.spark.sql.GraftColumnBridge

  def shingles(text: Column, n: Int): Column =
    GraftColumnBridge.column(
      WordShingles(GraftColumnBridge.expression(text), n))

  def shingleHashes(text: Column, n: Int): Column =
    GraftColumnBridge.column(
      WordShingleHashes(GraftColumnBridge.expression(text), n))
}
