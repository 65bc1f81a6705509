package graft.sql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Generic time-series operators over keyed event frames — the reusable
 * forms of the q22/q25 contract queries (which delegate here, so the
 * DuckDB oracle checks these implementations end-to-end).
 *
 * Both are single-shuffle plans: the union/window/aggregation stages all
 * partition on the key column, which is the only shape that survives
 * 100 TB (a per-key linear merge; no inequality-join fanout, no global
 * sort). See [[RelQueries.q22AsofJoin]] / [[RelQueries.q25Sessionize]]
 * for the plan discussion.
 */
object TimeJoins {

  /**
   * Left AS-OF join: for every left row, the latest right row with
   * `right(rightTime) <= left(leftTime)` on the same `key`, surfaced as
   * one struct column `asof` (NULL when no right row precedes — left
   * semantics). Deterministic tiebreak at equal times: the MAXIMUM right
   * payload struct (lexicographic over `right`'s non-key columns in
   * order) wins, and a right row at exactly the left row's time IS
   * visible to it.
   *
   * Implementation: tag and union both sides (right collapsed into one
   * struct), order each key's rows by (time, right-first, payload) and
   * take `last(payload, ignoreNulls)` over the unbounded-preceding
   * frame — one shuffle on `key`, O(1) per row, never the quadratic
   * per-key fanout of the naive inequality join.
   *
   * `left`'s columns must not be named `asof` or start with `_asof`
   * (enforced — a violating frame would be silently clobbered
   * otherwise). Note the equal-time tiebreak depends on the POSITIONAL
   * order of `right`'s non-key columns: reordering them changes which of
   * two same-timestamp right rows wins. Call sites that care (q22) pin
   * the projection order explicitly.
   */
  def asof(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String): DataFrame = {
    val clash = left.columns.filter(c => c == "asof" || c.startsWith("_asof"))
    require(clash.isEmpty,
      s"asof: left columns ${clash.mkString(", ")} collide with the " +
        "reserved output/scratch names ('asof', '_asof*') — rename them first")
    val payloadCols = right.columns.filter(_ != key)
    val rightTagged = right.select(col(key), col(rightTime).as("_asof_t"),
      lit(1).as("_asof_r"), struct(payloadCols.map(col).toSeq: _*).as("asof"))
    val payloadType = rightTagged.schema("asof").dataType
    val leftTagged = left.select(left.columns.map(col).toSeq ++ Seq(
      col(leftTime).as("_asof_t"), lit(0).as("_asof_r"),
      lit(null).cast(payloadType).as("asof")): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col("_asof_t"), col("_asof_r").desc, col("asof"))
      .rowsBetween(Window.unboundedPreceding, 0)
    leftTagged.unionByName(rightTagged, allowMissingColumns = true)
      .withColumn("asof", last(col("asof"), ignoreNulls = true).over(w))
      .where(col("_asof_r") === 0)
      .drop("_asof_t", "_asof_r")
  }

  /**
   * Gap-based sessionization: appends a `session_idx` column numbering
   * each key's sessions (1-based, in time order); a new session starts
   * after a silence strictly greater than `gapUs` microseconds. The
   * islands formulation: `lag` marks starts, a running sum numbers them —
   * two window passes over ONE `timeUs`-ordered shuffle on `key`.
   * `tiebreak` makes equal-time ordering deterministic.
   */
  def sessionize(df: DataFrame, key: String, timeUs: Column, gapUs: Long,
      tiebreak: Column): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(timeUs, tiebreak)
    df.withColumn("_sess_prev", lag(timeUs, 1).over(w))
      .withColumn("_sess_new",
        when(col("_sess_prev").isNull || timeUs - col("_sess_prev") > gapUs, 1)
          .otherwise(0))
      .withColumn("session_idx",
        sum(col("_sess_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("_sess_prev", "_sess_new")
  }
}
