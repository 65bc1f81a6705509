package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Per-row nearest-centroid assignment over a BROADCAST-sized centroid
 * matrix baked into the expression: returns `struct(bucket, csim)` where
 * `bucket` is the argmax-cosine centroid index (ties broken toward the
 * LOWER index on the 6-dp-rounded cosine, matching `row_number() OVER
 * (ORDER BY csim DESC, centroid_id)`), and `csim` the rounded cosine.
 *
 * This is the zero-shuffle assignment stage of IVF/k-means: one fused
 * loop per row over the C×D matrix — no crossJoin against the centroid
 * frame, no window sort over the N×C cross, no shuffle at all. The
 * cosine math and HALF_UP 6-dp rounding are identical to
 * [[CosineSimilarity]] + Spark's `round`, so the DuckDB oracle (which
 * assigns via `round(list_cosine_similarity(...), 6)` + `row_number`)
 * reproduces every assignment bit-for-bit.
 */
case class NearestCentroid(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("bucket", IntegerType, nullable = false),
    StructField("csim", DoubleType, nullable = false)))
  override def nullable: Boolean = true

  @transient private lazy val matrix: Array[Array[Double]] =
    centroids.map(_.toArray).toArray
  @transient private lazy val centroidNorms: Array[Double] =
    matrix.map(c => math.sqrt(c.map(x => x * x).sum))
  // accepts both array<float> (the stored corpus dtype) and array<double>
  // (derived query vectors, e.g. x131's averaged out-of-corpus probes) —
  // floats are exact in double, so the accumulation is identical
  @transient private lazy val floatElems: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val n = vec.numElements()
    var best = -1
    var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < matrix.length) {
      val cent = matrix(c)
      if (cent.length == n) {
        var dot = 0.0; var na = 0.0
        var i = 0
        while (i < n) {
          val v = if (floatElems) vec.getFloat(i).toDouble
                  else vec.getDouble(i)
          dot += v * cent(i); na += v * v
          i += 1
        }
        val sim = new JBigDecimal(
          java.lang.Double.toString(dot / math.sqrt(na) / centroidNorms(c)))
          .setScale(6, RoundingMode.HALF_UP).doubleValue()
        if (sim > bestSim) { bestSim = sim; best = c }
      }
      c += 1
    }
    if (best < 0) null
    else new GenericInternalRow(Array[Any](best, bestSim)): InternalRow
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)

  override def prettyName: String = "nearest_centroid"
}

object NearestCentroid {
  import org.apache.spark.sql.GraftColumnBridge

  /** Public Column API: `struct(bucket, csim)` of the nearest centroid. */
  def nearest(vec: Column, centroids: Seq[Seq[Double]]): Column =
    GraftColumnBridge.column(
      NearestCentroid(GraftColumnBridge.expression(vec), centroids))

  /** Public Column API: the full per-centroid similarity vector
    * (`array<double>`, 6-dp-rounded, centroid order) — the multi-probe
    * variant where the caller ranks several buckets, not just the argmax. */
  def sims(vec: Column, centroids: Seq[Seq[Double]]): Column =
    GraftColumnBridge.column(
      CentroidSims(GraftColumnBridge.expression(vec), centroids))
}

/** All-centroid cosine vector: same math/rounding as [[NearestCentroid]],
  * but returns every centroid's 6-dp cosine (for multi-probe bucket
  * ranking). Still one fused zero-shuffle pass per row. */
case class CentroidSims(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val matrix: Array[Array[Double]] =
    centroids.map(_.toArray).toArray
  @transient private lazy val centroidNorms: Array[Double] =
    matrix.map(c => math.sqrt(c.map(x => x * x).sum))

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val n = vec.numElements()
    val out = new Array[Any](matrix.length)
    var c = 0
    while (c < matrix.length) {
      val cent = matrix(c)
      var dot = 0.0; var na = 0.0
      var i = 0
      while (i < n) {
        val v = vec.getFloat(i).toDouble
        dot += v * cent(i); na += v * v
        i += 1
      }
      out(c) = new JBigDecimal(
        java.lang.Double.toString(dot / math.sqrt(na) / centroidNorms(c)))
        .setScale(6, RoundingMode.HALF_UP).doubleValue()
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)

  override def prettyName: String = "centroid_sims"
}
