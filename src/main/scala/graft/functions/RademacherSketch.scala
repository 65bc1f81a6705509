package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Johnson–Lindenstrauss ±1 (Rademacher) projection sketch of a
 * float-vector column in exact int64 micro-units: element d is frozen
 * once to `round(e_d, 6)·10⁶` (the repo's pinned 6dp DECIMAL freeze, a
 * scala `BigDecimal(double).setScale(6, HALF_UP)` — identical to Spark's
 * `round(double, 6)` and DuckDB's `round`), then output j is the pure
 * integer sum `Σ_d sign(d,j)·m_d`. The returned array carries the `dOut`
 * projections followed by the input's squared norm `Σ m_d²` — one loop
 * produces the sketch AND the distortion-audit numerator.
 *
 * The sign for cell (d, j) is +1 iff the first hex digit of
 * md5("rp:d:j") is < 8 — recomputable in SQL as
 * `('0x' || substr(md5('rp:' || d || ':' || j), 1, 1))::INT < 8`, so the
 * oracle derives the matrix independently. All arithmetic after the one
 * pinned rounding is int64: no accumulation-order or overflow surface
 * (|p_j| ≤ dims·max|m| ≪ 2⁶³ for any plausible embedding scale).
 *
 * The equivalent declarative form (64 frozen columns + 16 sign-folds)
 * is correct but its single generated method exceeds janino's 64 KB
 * limit and silently drops the whole stage to interpreted execution —
 * this one-loop native expression IS the scan-speed path.
 * CodegenFallback is deliberate: the body is a cached-matrix loop with
 * nothing for codegen to fuse; surrounding expressions stay in
 * whole-stage codegen.
 */
case class RademacherSketch(child: Expression, dOut: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val dims = vec.numElements()
    val signs = RademacherSketch.signMatrix(dims, dOut)
    val m = new Array[Long](dims)
    var normSq = 0L
    var d = 0
    while (d < dims) {
      m(d) = RademacherSketch.freezeMicro(vec.getFloat(d).toDouble)
      normSq += m(d) * m(d)
      d += 1
    }
    val out = new Array[Long](dOut + 1)
    var j = 0
    while (j < dOut) {
      val col = signs(j)
      var acc = 0L
      d = 0
      while (d < dims) {
        acc += (if (col(d) > 0) m(d) else -m(d))
        d += 1
      }
      out(j) = acc
      j += 1
    }
    out(dOut) = normSq
    new GenericArrayData(out.map(java.lang.Long.valueOf(_): Any))
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)

  override def prettyName: String = "rademacher_sketch"
}

object RademacherSketch {

  /** The pinned 6dp micro freeze: `round(v, 6) · 10⁶` as an exact long. */
  private[graft] def freezeMicro(v: Double): Long =
    (BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      * 1000000).toLongExact

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Byte]]]

  /** ±1 matrix indexed [j][d], derived from md5("rp:d:j") — the identical
    * rule the DuckDB oracle evaluates in SQL. */
  private[graft] def signMatrix(dims: Int, dOut: Int): Array[Array[Byte]] =
    cache.computeIfAbsent((dims, dOut), { _ =>
      val md = MessageDigest.getInstance("MD5")
      Array.tabulate(dOut) { j =>
        Array.tabulate(dims) { d =>
          md.reset()
          val h = md.digest(s"rp:$d:$j".getBytes("UTF-8"))
          if (((h(0) >> 4) & 0xf) < 8) 1.toByte else -1.toByte
        }
      }
    })

  import org.apache.spark.sql.GraftColumnBridge

  /** Public Column API: [p_0 … p_{dOut−1}, Σ m_d²] for a float vector. */
  def sketch(vec: Column, dOut: Int): Column =
    GraftColumnBridge.column(
      RademacherSketch(GraftColumnBridge.expression(vec), dOut))
}
