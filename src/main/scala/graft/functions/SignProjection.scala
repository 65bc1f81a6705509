package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Sign-random-projection LSH signature of a float-vector column, banded:
 * returns an array of `nBands` integers, where band b packs `bandBits`
 * sign bits and bit j of band b is 1 iff the dot product with hyperplane
 * i = b·bandBits + j is strictly positive (Charikar STOC'02).
 *
 * Hyperplanes are deterministic md5-derived Rademacher (±1) vectors so the
 * DuckDB oracle can reproduce them in SQL: the sign for (hyperplane i,
 * dimension d) is +1 iff the low bit of the first hex digit of
 * md5("i:d") is 1 — i.e. `('0x' || substr(md5(i || ':' || d), 1, 1))::INT
 * % 2 = 1` in DuckDB, `(md5bytes[0] >>> 4) & 1 == 1` on the JVM. The dot
 * product is accumulated in doubles IN DIMENSION ORDER (an in-order fold,
 * matching the oracle's `list_reduce`), so both engines execute the
 * identical IEEE operation sequence and the sign test can never diverge.
 *
 * One pass per row, zero shuffle: at 100 TB the signature stage is a pure
 * map-only scan (the sign matrix is computed once per executor and
 * cached). CodegenFallback is deliberate — the body is a cached-matrix
 * loop with nothing for codegen to fuse; surrounding expressions stay in
 * whole-stage codegen.
 */
case class SignProjection(child: Expression, nBands: Int, bandBits: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val dims = vec.numElements()
    val nBits = nBands * bandBits
    val signs = SignProjection.signMatrix(nBits, dims)
    val bands = new Array[Int](nBands)
    var i = 0
    while (i < nBits) {
      val row = signs(i)
      var dot = 0.0
      var d = 0
      while (d < dims) {
        val v = vec.getFloat(d).toDouble
        dot += (if (row(d) > 0) v else -v)
        d += 1
      }
      if (dot > 0.0) bands(i / bandBits) |= (1 << (i % bandBits))
      i += 1
    }
    new GenericArrayData(bands.map(Integer.valueOf(_): Any))
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)

  override def prettyName: String = "sign_projection_bands"
}

object SignProjection {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Byte]]]

  /** ±1 hyperplane matrix [nBits × dims], derived from md5("i:d") — the
    * identical rule the DuckDB oracle evaluates in SQL. */
  private[graft] def signMatrix(nBits: Int, dims: Int): Array[Array[Byte]] =
    cache.computeIfAbsent((nBits, dims), { _ =>
      val md = MessageDigest.getInstance("MD5")
      Array.tabulate(nBits) { i =>
        Array.tabulate(dims) { d =>
          md.reset()
          val h = md.digest(s"$i:$d".getBytes("UTF-8"))
          if (((h(0) >>> 4) & 1) == 1) 1.toByte else -1.toByte
        }
      }
    })

  import org.apache.spark.sql.GraftColumnBridge

  /** Public Column API: banded sign-LSH signature of a float vector. */
  def bands(vec: Column, nBands: Int, bandBits: Int): Column =
    GraftColumnBridge.column(
      SignProjection(GraftColumnBridge.expression(vec), nBands, bandBits))
}
