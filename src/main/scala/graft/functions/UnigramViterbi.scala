package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Unigram-LM VITERBI segmentation — the serving path of a
 * SentencePiece-style unigram tokenizer (Kudo 2018, "Subword
 * Regularization"): given a piece vocabulary with integer nano-nat
 * log-probabilities, segment a word into the maximum-likelihood piece
 * sequence by dynamic programming over prefix positions.
 *
 * Math contract (mirrored bit-for-bit by the DuckDB oracle's generated
 * DP-chain CTEs):
 * {{{
 *   dp(0) = 0
 *   dp(j) = max over k in 1..maxPieceLen, i = j-k >= 0,
 *           word[i..j) in vocab:   dp(i) + w(word[i..j))
 *   tie rule: equal score -> prefer the LONGER last piece (larger k)
 * }}}
 * Weights are EXACT int64 nano-nats (each ln 9dp-rounded and scaled
 * before combination — the x56/x79 schedule), so the DP is pure integer
 * arithmetic with a total ordering: zero cross-engine tie surface.
 * The vocabulary must contain every single character of its input words
 * (the standard character-coverage guarantee), making the DP total.
 *
 * The vocab is a PLAN-TIME constant (bounded, corpus-derived — the
 * centroid-sync pattern), so segmentation is one map-side pass per word
 * TYPE: no explode, no join, no shuffle. CodegenFallback: one virtual
 * call per row into this tight DP beats a generated-code blowup over
 * the k x len candidate grid, and the expression sits in a projection
 * over the bounded type table, never the raw corpus.
 *
 * Returns `struct(pieces string, n_pieces int, score_nano long)` with
 * pieces joined by '|'.
 */
case class UnigramViterbi(child: Expression, pieces: Seq[String],
    weights: Seq[Long]) extends UnaryExpression with CodegenFallback {

  require(pieces.length == weights.length,
    "unigram_viterbi: pieces and weights must align")

  override def dataType: DataType = StructType(Seq(
    StructField("pieces", StringType, nullable = false),
    StructField("n_pieces", IntegerType, nullable = false),
    StructField("score_nano", LongType, nullable = false)))

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"unigram_viterbi expects STRING, got ${child.dataType.catalogString}")

  @transient private lazy val vocab
      : java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
    pieces.indices.foreach(i =>
      m.put(pieces(i), java.lang.Long.valueOf(weights(i))))
    m
  }

  @transient private lazy val maxPieceLen: Int =
    if (pieces.isEmpty) 1 else pieces.map(_.length).max

  override def nullSafeEval(input: Any): Any = {
    val word = input.asInstanceOf[UTF8String].toString
    val n = word.length
    val score = new Array[Long](n + 1)
    val from = new Array[Int](n + 1)
    val feasible = new Array[Boolean](n + 1)
    feasible(0) = true
    var j = 1
    while (j <= n) {
      var bestScore = Long.MinValue
      var bestK = -1
      var k = 1
      val kMax = math.min(maxPieceLen, j)
      while (k <= kMax) {
        val i = j - k
        if (feasible(i)) {
          val w = vocab.get(word.substring(i, j))
          if (w ne null) {
            val cand = score(i) + w.longValue
            if (cand > bestScore || (cand == bestScore && k > bestK)) {
              bestScore = cand; bestK = k
            }
          }
        }
        k += 1
      }
      if (bestK > 0) {
        feasible(j) = true; score(j) = bestScore; from(j) = j - bestK
      }
      j += 1
    }
    require(feasible(n),
      s"unigram_viterbi: no segmentation for '$word' (vocab lacks chars)")
    // reconstruct backward
    val parts = scala.collection.mutable.ListBuffer.empty[String]
    var p = n
    while (p > 0) { parts.prepend(word.substring(from(p), p)); p = from(p) }
    InternalRow(UTF8String.fromString(parts.mkString("|")),
      parts.length, score(n))
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object UnigramViterbi {
  /** Column-API entry: `viterbi(col, vocabSeq)` with (piece, w_nano). */
  def viterbi(word: Column, vocab: Seq[(String, Long)]): Column =
    GraftColumnBridge.column(UnigramViterbi(
      GraftColumnBridge.expression(word), vocab.map(_._1), vocab.map(_._2)))
}
