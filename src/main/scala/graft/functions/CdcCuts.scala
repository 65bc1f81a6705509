package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Content-defined-chunking cut points (LBFS/FastCDC family:
 * Muthitacharoen et al., SOSP'01; Xia et al., ATC'16) in ONE rolling
 * pass per document — the native upgrade x126's scaladoc promised over
 * its original per-position md5 explode (one md5 PER CHARACTER, ~16×
 * the bytes scanned; this expression is one multiply-add per
 * character).
 *
 * Boundary rule (the DuckDB oracle reproduces it per-position):
 * position `i` (1-based, in characters, `w <= i <= length`) is a cut
 * iff the Rabin-Karp polynomial hash of the `w`-char window ENDING at
 * `i` is divisible by `divisor`:
 *
 *   h(i) = (sum_{j=0..w-1} code(c_{i-j}) * B^j) mod M,   cut iff
 *   h(i) % divisor == 0
 *
 * with B = 257, M = 1e9+7 (prime), `code` = Unicode codepoint (the
 * same character units as Spark's `length`/`substring`, so cut
 * positions compose directly with them). divisor = 16 gives expected
 * 16-char blocks — the same density as the md5 nibble rule it
 * replaces. The rolling update subtracts the outgoing codepoint's
 * B^(w-1) term and multiplies by B: all intermediates bounded by
 * max_codepoint * M < 2^51, no overflow.
 *
 * Output: the ascending cut positions, NOT including the forced tail
 * at `length` (the caller unions it in, cf. `Dedup.cdcBlocks`). Empty
 * array when the text is shorter than `w`.
 *
 * Per-row hot loop => native expression per the project rule;
 * CodegenFallback is one virtual call per row around the tight loop.
 */
case class CdcCuts(child: Expression, w: Int, divisor: Int)
    extends UnaryExpression with CodegenFallback {

  require(w >= 1, "window must be >= 1")
  require(divisor >= 1, "divisor must be >= 1")

  private val M = 1000000007L
  private val B = 257L
  // B^(w-1) mod M — the outgoing character's weight
  private val topPow: Long = {
    var p = 1L; var k = 0
    while (k < w - 1) { p = p * B % M; k += 1 }
    p
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length // UTF-16 units; we step codepoints below
    val ring = new Array[Long](w)
    val cuts = new scala.collection.mutable.ArrayBuffer[Any]()
    var h = 0L
    var pos = 0L // 1-based codepoint position of the window end
    var ci = 0 // UTF-16 index
    while (ci < n) {
      val cp = s.codePointAt(ci)
      ci += Character.charCount(cp)
      pos += 1
      if (pos <= w) h = (h * B + cp) % M
      else {
        val out = ring(((pos - 1) % w).toInt)
        h = ((h - out * topPow % M + M) % M * B + cp) % M
      }
      ring(((pos - 1) % w).toInt) = cp
      if (pos >= w && h % divisor == 0) cuts += pos
    }
    new GenericArrayData(cuts.toArray)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)

  override def prettyName: String = s"cdc_cuts_${w}_$divisor"
}

object CdcCuts {
  import org.apache.spark.sql.GraftColumnBridge

  def cdcCuts(text: Column, w: Int = 8, divisor: Int = 16): Column =
    GraftColumnBridge.column(
      CdcCuts(GraftColumnBridge.expression(text), w, divisor))
}
