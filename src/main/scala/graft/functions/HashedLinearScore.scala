package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Hashed-linear text-classifier score in one pass — the inference side of
 * a fastText-style bag-of-words linear model with the hashing trick
 * (Weinberger et al., "Feature Hashing for Large Scale Multitask
 * Learning"; the shape of FineWeb-Edu / DCLM model-based quality
 * filtering): tokenize on spaces, hash every token occurrence into one of
 * [[HashedLinearScore.Dim]] weight buckets, sum the bucket weights.
 *
 * Math contract (matches the DuckDB oracle bit-for-bit; the token hash is
 * [[SimHash32]]'s pinned `('0x' || substr(md5(token),1,8))::BIGINT`):
 * {{{
 *   bucket(t) = h(t) mod 1024
 *   w(b)      = (b * 131) mod 997 − 498        // integers in [−498, 498]
 *   score     = Σ_occurrences w(bucket(t))
 * }}}
 * The weight table is a deterministic closed form so the cross-engine
 * oracle can recompute it without shipping a model artifact; a production
 * deployment replaces `w` with trained weights broadcast per executor —
 * the plan shape (pure map-side fold, no shuffle, no explode) is
 * identical. All-integer arithmetic: zero rounding-tie surface.
 */
case class HashedLinearScore(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val md = HashedLinearScore.digest.get()
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    var sum = 0L
    var t = 0
    while (t < toks.length) {
      md.reset()
      val d = md.digest(toks(t).getBytes("UTF-8"))
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      sum += ((h % HashedLinearScore.Dim) * 131L) % 997L - 498L
      t += 1
    }
    java.lang.Long.valueOf(sum)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)

  override def prettyName: String = "hashed_linear_score"
}

object HashedLinearScore {

  /** Weight-table size (hashing-trick feature dimension). */
  val Dim = 1024L

  private val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  import org.apache.spark.sql.GraftColumnBridge

  def hashedLinearScore(text: Column): Column =
    GraftColumnBridge.column(
      HashedLinearScore(GraftColumnBridge.expression(text)))
}
