package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * The full `numHashes`-wide minhash signature of a text column in ONE
 * map-only pass: word-`n`-gram shingling ([[WordShingles]]' exact loop)
 * fused with the k md5 minima the previous form computed as
 * `explode(shingles) → groupBy(doc).agg(min(substring(md5(concat(k:,
 * tok)), 1, 8)) × k)` — a corpus-scale row explosion feeding a hash
 * aggregate (12 `Md5` expression calls per shingle row, each allocating
 * a MessageDigest + hex string + concat/cast intermediates, plus the
 * per-doc exchange). Here the per-(shingle, k) work is one thread-local
 * digest update and an unsigned 4-byte compare, and the signature frame
 * becomes a shuffle-free scan projection.
 *
 * Bit-compat contract (the DuckDB oracle recomputes the same math):
 * element k equals `substring(md5(concat('k:', shingle) as binary), 1,
 * 8)` minimized LEXICOGRAPHICALLY over the doc's distinct shingles.
 * The first 8 lowercase-hex chars of a digest are its first 4 bytes,
 * and per-byte hex encoding is strictly order-preserving, so the
 * string min equals the unsigned 32-bit min tracked here (hex-encoded
 * once at the end). Returns NULL when the doc has no shingle (fewer
 * than n tokens) — exactly the rows the explode form dropped from the
 * signature frame; callers filter `isNotNull`.
 */
case class MinHashSig(child: Expression, numHashes: Int, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(numHashes >= 1 && n >= 1)

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val md5 =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }
  @transient private lazy val prefixes: Array[Array[Byte]] =
    (0 until numHashes).map(k => s"$k:".getBytes("UTF-8")).toArray

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
    if (seen.isEmpty) return null
    // per-k minimum of the digest's first 4 bytes as an UNSIGNED int
    // (== the lexicographic min of the first 8 lowercase-hex chars)
    val mins = Array.fill(numHashes)(0xffffffffL + 1)
    val d = md5.get()
    val it = seen.iterator
    while (it.hasNext) {
      val sBytes = it.next().getBytes("UTF-8")
      var k = 0
      while (k < numHashes) {
        d.reset()
        d.update(prefixes(k))
        d.update(sBytes)
        val dig = d.digest()
        var v = 0L
        var b = 0
        while (b < 4) { v = (v << 8) | (dig(b) & 0xffL); b += 1 }
        if (v < mins(k)) mins(k) = v
        k += 1
      }
    }
    val out = new Array[Any](numHashes)
    var k = 0
    while (k < numHashes) {
      out(k) = UTF8String.fromString(f"${mins(k)}%08x")
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)

  override def prettyName: String = s"minhash_sig_${numHashes}x$n"
}

object MinHashSig {
  import org.apache.spark.sql.GraftColumnBridge

  /** Public Column API: `array<string>` of the `numHashes` 8-hex-char
    * minhashes over word-`n`-gram shingles; NULL when no shingle. */
  def sig(text: Column, numHashes: Int, n: Int): Column =
    GraftColumnBridge.column(
      MinHashSig(GraftColumnBridge.expression(text), numHashes, n))
}
