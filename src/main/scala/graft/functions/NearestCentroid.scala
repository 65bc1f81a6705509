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

  /** Public Column API: the `n` best bucket ids directly
    * (`array<int>`, rank order) — see [[TopProbes]]. */
  def topProbes(vec: Column, centroids: Seq[Seq[Double]], n: Int): Column =
    GraftColumnBridge.column(
      TopProbes(GraftColumnBridge.expression(vec), centroids, n))
}

/**
 * Top-`n` probe buckets as ONE map-side expression: the `n` best
 * centroid ids under (6-dp cosine DESC, centroid_id ASC) — identical
 * ordering to `row_number() OVER (PARTITION BY vec_id ORDER BY csim
 * DESC, centroid_id) <= n` over [[CentroidSims]], but WITHOUT ever
 * materializing the N×C (vector, centroid) rows or shuffling them
 * through a partitioned window sort (the round-16 verdict's x140 scale
 * boundary: at C ∝ √N that explode+window is an N×√N-row shuffle).
 * Element 1 is the assignment bucket itself ([[NearestCentroid]]'s
 * argmax), so the result strictly extends the single-probe set. Same
 * cosine math and HALF_UP 6-dp rounding as the siblings, so the DuckDB
 * oracle's all-C window replay reproduces every probe list.
 * `n` is tiny (the FAISS `nprobe` knob, 2 here): the running top-n is a
 * fixed-size insertion pass inside the per-row centroid loop.
 */
case class TopProbes(child: Expression, centroids: Seq[Seq[Double]],
    n: Int) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val matrix: Array[Array[Double]] =
    centroids.map(_.toArray).toArray
  @transient private lazy val centroidNorms: Array[Double] =
    matrix.map(c => math.sqrt(c.map(x => x * x).sum))

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val len = vec.numElements()
    val keep = math.min(n, matrix.length)
    val topId = new Array[Int](keep)
    val topSim = new Array[Double](keep)
    var filled = 0
    var c = 0
    while (c < matrix.length) {
      val cent = matrix(c)
      var dot = 0.0; var na = 0.0
      var i = 0
      while (i < len) {
        val v = vec.getFloat(i).toDouble
        dot += v * cent(i); na += v * v
        i += 1
      }
      val sim = new JBigDecimal(
        java.lang.Double.toString(dot / math.sqrt(na) / centroidNorms(c)))
        .setScale(6, RoundingMode.HALF_UP).doubleValue()
      // ascending-id iteration + STRICT > keeps the lower id on ties,
      // exactly row_number()'s (csim DESC, centroid_id) order
      var pos = filled
      while (pos > 0 && sim > topSim(pos - 1)) pos -= 1
      if (pos < keep) {
        val last = math.min(filled, keep - 1)
        var j = last
        while (j > pos) { topId(j) = topId(j - 1); topSim(j) = topSim(j - 1); j -= 1 }
        topId(pos) = c; topSim(pos) = sim
        if (filled < keep) filled += 1
      }
      c += 1
    }
    if (filled == 0) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(topId, filled))
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)

  override def prettyName: String = "top_probes"
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
