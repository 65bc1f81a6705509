package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Per-row PQ subspace assignment over the BAKED codebook
 * (`books(s)(c)` = centroid `c` of subspace `s`, each `subDim` wide):
 * returns `struct(codes: array<int>, errs: array<double>)` where
 * `codes(s)` is the argmin-squared-L2 sub-centroid under the 6-dp
 * HALF_UP rounded distance with lowest-`c` ties, and `errs(s)` the
 * UNROUNDED minimum distance (the reconstruction error `least` leg).
 *
 * This is the scan-speed PQ encode: ONE fused loop per row instead of
 * the previous S×k literal `subDist` folds — 4096 Catalyst nodes whose
 * generated source changed with every Lloyd iteration's codebook
 * literals, so janino recompiled ~1.5 s per training job (measured,
 * round 17; the codebook here rides as a REFERENCE object, so the
 * generated stage source is iteration-invariant and compiles once).
 *
 * Bit-compat contract with the replaced folds (and the DuckDB oracle):
 *  - each distance accumulates `((double) emb[off+i] - cv(i))²`
 *    LEFT-TO-RIGHT in doubles (the `reduce(_ + _)` association);
 *  - the assignment metric is `round(d, 6)` = HALF_UP decimal rounding
 *    of `Double.toString` (Spark `Round` on DoubleType, the
 *    [[NearestCentroid]] precedent);
 *  - ties keep the LOWEST c (`argminC`'s first-index semantics);
 *  - `errs(s)` is `least` over the unrounded distances — which on a
 *    rounding tie may differ from the CHOSEN code's distance, exactly
 *    like the fold pair it replaces.
 */
case class PqAssign(child: Expression, books: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("codes", ArrayType(IntegerType, containsNull = false),
      nullable = false),
    StructField("errs", ArrayType(DoubleType, containsNull = false),
      nullable = false)))
  override def nullable: Boolean = true

  @transient private lazy val matrix: Array[Array[Array[Double]]] =
    books.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val subDim: Int = matrix(0)(0).length
  @transient private lazy val floatElems: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def round6(d: Double): Double =
    new JBigDecimal(java.lang.Double.toString(d))
      .setScale(6, RoundingMode.HALF_UP).doubleValue()

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val s = matrix.length
    // a width mismatch is a BUG under the fixed-width embedding contract,
    // never data: a null here would flow into element_at(...).cast codes
    // and silently drop candidates downstream (round-17 ADVICE)
    if (vec.numElements() != s * subDim) throw new IllegalArgumentException(
      s"pq_assign: embedding has ${vec.numElements()} elements, " +
        s"codebook expects ${s * subDim}")
    val codes = new Array[Int](s)
    val errs = new Array[Any](s)
    var sub = 0
    while (sub < s) {
      val off = sub * subDim
      val cents = matrix(sub)
      var best = 0
      var bestRounded = Double.PositiveInfinity
      var bestRaw = Double.PositiveInfinity
      var c = 0
      while (c < cents.length) {
        val cv = cents(c)
        var d = 0.0
        var i = 0
        while (i < subDim) {
          val v = if (floatElems) vec.getFloat(off + i).toDouble
                  else vec.getDouble(off + i)
          val t = v - cv(i)
          d += t * t
          i += 1
        }
        val dr = round6(d)
        // ascending-c iteration + STRICT < keeps the lower c on rounded
        // ties (argminC's first-index semantics)
        if (dr < bestRounded) { bestRounded = dr; best = c }
        if (d < bestRaw) bestRaw = d
        c += 1
      }
      codes(sub) = best
      errs(sub) = bestRaw
      sub += 1
    }
    new GenericInternalRow(Array[Any](
      new GenericArrayData(codes.map(Integer.valueOf(_): Any)),
      new GenericArrayData(errs))): InternalRow
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)

  override def prettyName: String = "pq_assign"
}

object PqAssign {
  import org.apache.spark.sql.GraftColumnBridge

  /** Public Column API: `struct(codes array<int>, errs array<double>)`
    * of the per-subspace PQ assignment. */
  def assign(vec: Column, books: Seq[Seq[Seq[Double]]]): Column =
    GraftColumnBridge.column(
      PqAssign(GraftColumnBridge.expression(vec), books))

  /** Public Column API: the per-query ADC LUT as `array<long>` of
    * integer micro-units — cell (s, c) at 0-based index `s*k + c`,
    * value `round(subDist(q, books(s)(c)), 6) * 1e6` exactly (the
    * 6-dp-freeze discipline; unscaledValue at scale 6 IS micro-units). */
  def lutMicro(vec: Column, books: Seq[Seq[Seq[Double]]]): Column =
    GraftColumnBridge.column(
      PqLutMicro(GraftColumnBridge.expression(vec), books))
}

/**
 * Per-query ADC distance LUT in exact integer micro-units: for each
 * codebook cell (s, c), the squared-L2 distance of the query's
 * subspace-s slice to sub-centroid c, 6-dp HALF_UP rounded and frozen
 * to micro-units as ONE exact decimal step (`setScale(6).unscaledValue`
 * == `round(d,6)::decimal(12,6) * 1e6` — no double re-rounding).
 * Replaces the S×k literal-fold LUT projection on the broadcast query
 * frame (same janino-per-codebook recompile class as [[PqAssign]]).
 * Same left-to-right accumulation; float and double inputs accepted
 * (derived query vectors are double).
 */
case class PqLutMicro(child: Expression, books: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val matrix: Array[Array[Array[Double]]] =
    books.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val subDim: Int = matrix(0)(0).length
  @transient private lazy val floatElems: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val s = matrix.length
    // width mismatch = bug, not data — see PqAssign (round-17 ADVICE)
    if (vec.numElements() != s * subDim) throw new IllegalArgumentException(
      s"pq_lut_micro: query has ${vec.numElements()} elements, " +
        s"codebook expects ${s * subDim}")
    val k = matrix(0).length
    val out = new Array[Any](s * k)
    var sub = 0
    while (sub < s) {
      val off = sub * subDim
      val cents = matrix(sub)
      var c = 0
      while (c < cents.length) {
        val cv = cents(c)
        var d = 0.0
        var i = 0
        while (i < subDim) {
          val v = if (floatElems) vec.getFloat(off + i).toDouble
                  else vec.getDouble(off + i)
          val t = v - cv(i)
          d += t * t
          i += 1
        }
        out(sub * k + c) = new JBigDecimal(java.lang.Double.toString(d))
          .setScale(6, RoundingMode.HALF_UP).unscaledValue().longValueExact()
        c += 1
      }
      sub += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)

  override def prettyName: String = "pq_lut_micro"
}
