package graft.functions

import java.security.MessageDigest

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * 32-bit SimHash of a text column in one pass: tokenize on spaces, dedup
 * tokens, hash each with md5 (first 4 bytes as an unsigned 32-bit value),
 * accumulate per-bit ±1 weights, emit the sign vector as a long.
 *
 * Math contract (matches the DuckDB oracle bit-for-bit):
 * `h(token) = ('0x' || substr(md5(token),1,8))::BIGINT`,
 * `bit_i = 1 iff Σ_tokens (2·((h>>i)&1) − 1) > 0`.
 *
 * Replaces the SQL formulation (explode tokens × explode 0..31 → two
 * shuffled aggregations — a 32× row blowup) with per-row JVM work and NO
 * shuffle at all: at 100 TB the simhash pass becomes a pure map-only
 * scan, the way production near-dup pipelines run it.
 */
case class SimHash32(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val md = SimHash32.digest.get()
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val seen = new mutable.HashSet[String]
    val weights = new Array[Int](32)
    var t = 0
    while (t < toks.length) {
      val tok = toks(t)
      if (seen.add(tok)) {
        md.reset()
        val d = md.digest(tok.getBytes("UTF-8"))
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        var i = 0
        while (i < 32) {
          weights(i) += (if (((h >> i) & 1L) == 1L) 1 else -1)
          i += 1
        }
      }
      t += 1
    }
    var sig = 0L
    var i = 0
    while (i < 32) {
      if (weights(i) > 0) sig |= (1L << i)
      i += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)

  override def prettyName: String = "simhash32"
}

object SimHash32 {
  private val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  import org.apache.spark.sql.GraftColumnBridge

  def simhash32(text: Column): Column =
    GraftColumnBridge.column(SimHash32(GraftColumnBridge.expression(text)))
}
