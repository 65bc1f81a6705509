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

/**
 * N-BEST unigram-LM segmentation — the lattice enumeration behind
 * SUBWORD REGULARIZATION (Kudo 2018 §4): training-time tokenizers
 * don't apply the single Viterbi path, they sample among the word's
 * top-n segmentations so the model sees segmentation diversity. This
 * expression produces the deterministic n-best LIST (the sampling
 * itself is a downstream md5-keyed choice, the x36/x79 pattern).
 *
 * DP contract (mirrored by the DuckDB oracle's generated chain): at
 * every prefix position keep the top `n` partial segmentations under
 * the TOTAL order (score_nano DESC, path ASC) — exact for the final
 * n-best because the order is extension-invariant: two partials over
 * the same prefix first differ at an index both retain under any
 * common suffix (neither can be a proper prefix of the other — same
 * letters, pipes only added), so pruning to n per position never
 * discards a final top-n member. Scores are exact int64 nano-nats;
 * path comparison is ASCII-byte order on both engines.
 *
 * Returns `array<struct(pieces string, n_pieces int, score_nano
 * long)>` ordered best-first, at most `n` entries (fewer when the
 * word admits fewer distinct segmentations).
 */
case class UnigramNbest(child: Expression, pieces: Seq[String],
    weights: Seq[Long], n: Int) extends UnaryExpression
    with CodegenFallback {

  require(pieces.length == weights.length,
    "unigram_nbest: pieces and weights must align")
  require(n >= 1, "unigram_nbest: n must be >= 1")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pieces", StringType, nullable = false),
    StructField("n_pieces", IntegerType, nullable = false),
    StructField("score_nano", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"unigram_nbest expects STRING, got ${child.dataType.catalogString}")

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
    val len = word.length
    val best = new Array[Seq[(Long, String)]](len + 1)
    best(0) = Seq((0L, ""))
    var j = 1
    while (j <= len) {
      val cands = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
      var k = 1
      val kMax = math.min(maxPieceLen, j)
      while (k <= kMax) {
        if (best(j - k) ne null) {
          val piece = word.substring(j - k, j)
          val w = vocab.get(piece)
          if (w ne null) best(j - k).foreach { case (s, p) =>
            cands += ((s + w.longValue,
              if (p.isEmpty) piece else p + "|" + piece))
          }
        }
        k += 1
      }
      if (cands.nonEmpty)
        best(j) = cands.sortWith((a, b) =>
          a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)).take(n).toSeq
      j += 1
    }
    require(best(len) ne null,
      s"unigram_nbest: no segmentation for '$word' (vocab lacks chars)")
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      best(len).map { case (s, p) =>
        InternalRow(UTF8String.fromString(p), p.count(_ == '|') + 1, s)
      }.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object UnigramNbest {
  /** Column-API entry: `nbest(col, vocabSeq, n)` with (piece, w_nano). */
  def nbest(word: Column, vocab: Seq[(String, Long)], n: Int): Column =
    GraftColumnBridge.column(UnigramNbest(
      GraftColumnBridge.expression(word), vocab.map(_._1),
      vocab.map(_._2), n))
}
