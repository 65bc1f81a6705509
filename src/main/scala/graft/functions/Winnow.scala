package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD 2003 — the
 * MOSS algorithm) of a text column in ONE pass: hash every word k-gram,
 * slide a window of w consecutive hashes, keep each window's MINIMUM.
 * The selected set is a position-independent ~2/(w+1) sample of the
 * gram stream with the guarantee that any shared run of w+k-1 tokens
 * between two documents contributes at least one SHARED fingerprint —
 * the local-overlap detector exact dedup (x1) and whole-doc MinHash
 * (x3) both miss.
 *
 * Per-row hot loop (split + k-gram hash + sliding min) lives here as a
 * native expression per the project rule — the higher-order-function
 * form dispatches an interpreted lambda per gram. CodegenFallback is
 * one virtual call per row around a tight loop.
 *
 * Semantics contract (the DuckDB oracle reproduces it exactly):
 * tokens = split on single spaces (empties preserved); grams =
 * space-joined windows of k tokens; hash = first 8 hex chars of
 * md5(gram) as an integer (`conv(substring(md5(g),1,8),16,10)` /
 * DuckDB's instr-fold recipe); windows of w hashes — fewer than w
 * grams form ONE window over them all; output = selected hash values,
 * DISTINCT and SORTED ascending (selection is by value, so ties need
 * no position rule). Empty when the doc has fewer than k tokens.
 */
case class Winnow(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1 && w >= 1, "gram width and window must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val toks = text.split(" ", -1)
    val nGrams = toks.length - k + 1
    if (nGrams <= 0) return new GenericArrayData(Array.empty[Any])
    val md = MessageDigest.getInstance("MD5")
    val hashes = new Array[Long](nGrams)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < nGrams) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes("UTF-8"))
      // first 8 hex chars == first 4 bytes, big-endian unsigned
      hashes(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }
    val selected = new java.util.TreeSet[java.lang.Long]()
    val nWindows = math.max(nGrams - w + 1, 1)
    var s = 0
    while (s < nWindows) {
      var m = Long.MaxValue
      var j = s
      val end = math.min(s + w, nGrams)
      while (j < end) {
        if (hashes(j) < m) m = hashes(j)
        j += 1
      }
      selected.add(m)
      s += 1
    }
    val out = new Array[Any](selected.size)
    val it = selected.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next().longValue(); o += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)

  override def prettyName: String = s"winnow_${k}_$w"
}

object Winnow {
  import org.apache.spark.sql.GraftColumnBridge

  def winnow(text: Column, k: Int, w: Int): Column =
    GraftColumnBridge.column(
      Winnow(GraftColumnBridge.expression(text), k, w))
}
