package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Hashed-BIGRAM weight sum in one pass — the scoring kernel of DSIR-style
 * importance resampling (Xie et al., "Data Selection for Language Models
 * via Importance Resampling", NeurIPS 2023): tokenize on spaces, hash
 * every ADJACENT TOKEN PAIR into one of `weights.length` buckets, and sum
 * the (integer) bucket weights over all bigram occurrences.
 *
 * Math contract (matches the DuckDB oracle bit-for-bit):
 * {{{
 *   feature(i) = tok(i) || ' ' || tok(i+1)            // the raw bigram text
 *   bucket(i)  = md5_32(feature(i)) mod B             // SimHash32's pinned
 *                                                     // ('0x'||hex)::BIGINT hash
 *   score      = Σ_i weights[bucket(i)]               // exact int64 sum
 * }}}
 * where `md5_32` is the first 8 hex digits of md5 as an unsigned 32-bit
 * integer — the same pinned contract as [[SimHash32]] /
 * [[HashedLinearScore]]. Docs with fewer than two tokens score 0.
 *
 * The weight table arrives as an `array<long>` column (in practice a
 * literal built from a bounded driver-side sync of the corpus-estimated
 * log-ratio table — the k×dim centroid-sync pattern), so the scoring pass
 * itself is a pure map-side fold: no explode, no join, no shuffle. All
 * arithmetic after the weight build is int64 — zero rounding-tie surface.
 */
case class HashedBigramWeightSum(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = left.dataType == StringType && (right.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hashed_bigram_weight_sum expects (string, array<bigint>), got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def nullSafeEval(text: Any, weights: Any): Any = {
    val w = weights.asInstanceOf[ArrayData]
    val b = w.numElements()
    val toks = text.asInstanceOf[UTF8String].toString.split(" ", -1)
    var sum = 0L
    if (toks.length >= 2 && b > 0) {
      val md = HashedBigramWeightSum.digest.get()
      val bytes = new Array[Array[Byte]](toks.length)
      var i = 0
      while (i < toks.length) { bytes(i) = toks(i).getBytes("UTF-8"); i += 1 }
      i = 0
      while (i < toks.length - 1) {
        md.reset()
        md.update(bytes(i))
        md.update(' '.toByte)
        val d = md.digest(bytes(i + 1))
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        sum += w.getLong((h % b).toInt)
        i += 1
      }
    }
    java.lang.Long.valueOf(sum)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "hashed_bigram_weight_sum"
}

object HashedBigramWeightSum {

  private val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  import org.apache.spark.sql.GraftColumnBridge

  def bigramWeightSum(text: Column, weights: Column): Column =
    GraftColumnBridge.column(HashedBigramWeightSum(
      GraftColumnBridge.expression(text),
      GraftColumnBridge.expression(weights)))
}
