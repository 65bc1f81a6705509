package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/**
 * Longest-Processing-Time (LPT) bin assignment over ONE shard's
 * size-sorted item list: element `i` of the result is the 0-based bin
 * (of `bins`) the `i`-th largest item lands in, each item placed on the
 * CURRENTLY LEAST-LOADED bin (lowest index on ties). With the input
 * sorted descending this is Graham's classic LPT heuristic with its
 * 4/3-optimal makespan bound — the real thing, unlike x46's
 * longest-first round-robin which ignores current loads
 * ([[graft.ext.TextAnalysis.packBins]] scaladoc).
 *
 * The fold is inherently sequential, which is WHY it is an expression
 * over one shard's sizes rather than a window function: the scalable
 * formulation ships only the per-shard LONG sizes array (8 bytes/doc,
 * shard count chosen so a shard's list is bounded), folds natively in
 * one pass with an O(bins) argmin per item (bins is small; no heap
 * needed), and the (shard, rank) → bin result joins back to the docs.
 * Interpreted-lambda folds (`aggregate`) would run per element per row
 * in the interpreter — the same per-row hot loop rule as
 * [[TokenPositions]].
 *
 * Oracle contract: the DuckDB mirror is a recursive CTE advancing every
 * shard one rank per iteration, carrying the bin-load list and picking
 * `list_position(loads, list_min(loads))` (first-index tie-break, like
 * this fold). All-integer math — no cross-engine drift is possible.
 * Pinned by `LptProps` against an independent reference fold and the
 * brute-force optimum (the 4/3 bound) on small instances.
 */
case class LptAssign(child: Expression, bins: Int)
    extends UnaryExpression with ExpectsInputTypes {

  // assign() reads ArrayData.getLong — anything but array<bigint> must
  // fail at analysis, not mid-task with a ClassCastException.
  // (No explicit result type: AbstractDataType is private[sql].)
  override def inputTypes = Seq(ArrayType(LongType))

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    LptAssign.assign(input.asInstanceOf[ArrayData], bins)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LptAssign$$.MODULE$$.assign($c, $bins)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)

  override def prettyName: String = "lpt_assign"
}

object LptAssign {
  import org.apache.spark.sql.GraftColumnBridge

  /** The sequential least-loaded-bin fold shared by interpreted eval and
    * codegen. `sizes` is LONG; ties pick the lowest bin index. */
  def assign(sizes: ArrayData, bins: Int): ArrayData = {
    val n = sizes.numElements()
    val loads = new Array[Long](bins)
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      var best = 0
      var j = 1
      while (j < bins) {
        if (loads(j) < loads(best)) best = j
        j += 1
      }
      loads(best) += sizes.getLong(i)
      out(i) = best
      i += 1
    }
    new GenericArrayData(out)
  }

  /** LPT bin index (0-based) per element of a size array column. */
  def lpt(sizes: Column, bins: Int): Column = {
    require(bins > 0, "need at least one bin")
    GraftColumnBridge.column(
      LptAssign(GraftColumnBridge.expression(sizes), bins))
  }
}
