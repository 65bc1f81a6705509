package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Per-document word-bigram repetition statistics in ONE pass:
 * `struct(n_grams, top_c, dup_c)` where n_grams is the total bigram
 * occurrence count (n_tokens − 1), top_c the count of the most frequent
 * bigram and dup_c the total occurrences of bigrams appearing more than
 * once — the inputs of the Gopher-style repetition quality filters
 * ([[graft.ext.TextAnalysis.repetitionSignals]]).
 *
 * Replaces the SQL formulation (explode to n_tokens−1 gram rows → a
 * (doc, gram) aggregation → a per-doc rollup, i.e. a full shuffle of the
 * re-tokenized corpus) with per-row JVM work and NO shuffle at all: at
 * 100 TB the repetition scan is map-only, like [[SimHash32]]. The
 * counting math is integer-exact, so the DuckDB oracle (which runs the
 * explode form) matches bit-for-bit.
 */
case class BigramStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("top_c", LongType, nullable = false),
    StructField("dup_c", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val counts = new java.util.HashMap[String, Int]
    var i = 0
    while (i < toks.length - 1) {
      val g = toks(i) + " " + toks(i + 1)
      counts.put(g, counts.getOrDefault(g, 0) + 1)
      i += 1
    }
    var n = 0L; var top = 0L; var dup = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().toLong
      n += c
      if (c > top) top = c
      if (c > 1) dup += c
    }
    InternalRow(n, top, dup)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)

  override def prettyName: String = "bigram_stats"
}

object BigramStats {
  import org.apache.spark.sql.GraftColumnBridge

  def bigramStats(text: Column): Column =
    GraftColumnBridge.column(BigramStats(GraftColumnBridge.expression(text)))
}
