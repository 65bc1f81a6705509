package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.UnigramViterbi

/**
 * Property checks for the native unigram-Viterbi DP on ARBITRARY words
 * and vocabularies — an independent O(n * maxLen * vocab) reference that
 * enumerates candidates in a DIFFERENT order than the expression's loop,
 * so an ordering/tie bug cannot hide.
 */
object UnigramProps extends Properties("unigramViterbi") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(200)

  private val alphabet = "abcd"

  private val genCase: Gen[(String, Seq[(String, Long)])] = for {
    len <- Gen.choose(1, 10)
    word <- Gen.stringOfN(len, Gen.oneOf(alphabet.toSeq))
    nMulti <- Gen.choose(0, 12)
    multi <- Gen.listOfN(nMulti, for {
      l <- Gen.choose(2, 4)
      p <- Gen.stringOfN(l, Gen.oneOf(alphabet.toSeq))
    } yield p)
    weights <- Gen.listOfN(alphabet.length + multi.distinct.length,
      Gen.choose(-20000000000L, -1000000000L))
  } yield {
    val pieces = alphabet.map(_.toString) ++ multi.distinct
    (word, pieces.zip(weights).toSeq)
  }

  /** Exhaustive reference: enumerate best segmentation by DP with an
    * explicit (score, lastPieceLen) argmax evaluated RIGHT-TO-LEFT.
    * Shared with ExtSpec's x137 one-round EM replay. */
  private[graft] def reference(word: String, vocab: Seq[(String, Long)])
      : (String, Int, Long) = {
    val m = vocab.toMap
    val n = word.length
    val best = Array.fill[Option[(Long, Int)]](n + 1)(None) // (score, from)
    best(0) = Some((0L, 0))
    for (j <- 1 to n) {
      var cand: Option[(Long, Int)] = None // (score, k)
      for (k <- math.min(4, j) to 1 by -1) { // reverse enumeration order
        val piece = word.substring(j - k, j)
        (best(j - k), m.get(piece)) match {
          case (Some((s, _)), Some(w)) =>
            val sc = s + w
            if (cand.isEmpty || sc > cand.get._1) cand = Some((sc, k))
          // ties: the FIRST candidate seen wins here, and we enumerate
          // k descending, so ties keep the LARGER k — the pinned rule
          case _ =>
        }
      }
      cand.foreach { case (sc, k) => best(j) = Some((sc, j - k)) }
    }
    val (score, _) = best(n).get
    val parts = scala.collection.mutable.ListBuffer.empty[String]
    var p = n
    while (p > 0) { val f = best(p).get._2; parts.prepend(
      word.substring(f, p)); p = f }
    (parts.mkString("|"), parts.length, score)
  }

  property("native DP == independent reference on arbitrary words and " +
      "vocabs (score, piece count, exact segmentation)") =
    Prop.forAll(genCase) { case (word, vocab) =>
      val expr = UnigramViterbi(
        Literal(UTF8String.fromString(word),
          org.apache.spark.sql.types.StringType),
        vocab.map(_._1), vocab.map(_._2))
      val row = expr.eval(InternalRow.empty).asInstanceOf[InternalRow]
      val got = (row.getUTF8String(0).toString, row.getInt(1),
        row.getLong(2))
      got == reference(word, vocab)
    }

  property("segmentation concatenates back to the word; score equals " +
      "the sum of its pieces' weights") =
    Prop.forAll(genCase) { case (word, vocab) =>
      val expr = UnigramViterbi(
        Literal(UTF8String.fromString(word),
          org.apache.spark.sql.types.StringType),
        vocab.map(_._1), vocab.map(_._2))
      val row = expr.eval(InternalRow.empty).asInstanceOf[InternalRow]
      val pieces = row.getUTF8String(0).toString.split("\\|", -1).toSeq
      val m = vocab.toMap
      pieces.mkString == word &&
        row.getInt(1) == pieces.length &&
        row.getLong(2) == pieces.map(m).sum
    }
}
