package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties}

import graft.ext.TextAnalysis

/**
 * Property checks for x51's token-window chunking: on ARBITRARY word
 * sequences and (window, stride) shapes, the declarative
 * explode(sequence)+slice chain must agree with an independent
 * sequential chunker — chunk starts at 0, stride, 2·stride, … while
 * inside the doc; the last chunk clamps at the tail; every token of
 * every doc is covered by the chunk that starts at (pos / stride) ·
 * stride.
 */
object ChunkProps extends Properties("chunkTokens") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(15)

  private lazy val spark = SparkSpec.spark

  private val genWord: Gen[String] =
    Gen.choose(1, 5).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val genDoc: Gen[String] =
    Gen.choose(1, 40).flatMap(n =>
      Gen.listOfN(n, genWord).map(_.mkString(" ")))
  private val genCorpus: Gen[List[String]] =
    Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, genDoc))
  private val genShape: Gen[(Int, Int)] = for {
    stride <- Gen.choose(1, 12)
    over <- Gen.choose(0, 8) // window >= stride, like every real config
  } yield (stride + over, stride)

  /** Independent sequential reference chunker. */
  private def refChunks(text: String, window: Int,
      stride: Int): Seq[(Int, Long, String)] = {
    val toks = text.split(" ", -1)
    Iterator.from(0)
      .map(_ * stride)
      .takeWhile(_ < toks.length)
      .zipWithIndex
      .map { case (start, id) =>
        val slice = toks.slice(start, start + window)
        (id, slice.length.toLong, slice.mkString(" "))
      }
      .toSeq
  }

  private def viaSpark(docs: Seq[String], window: Int,
      stride: Int): Map[Long, Seq[(Int, Long, String)]] = {
    val rows = docs.zipWithIndex.map { case (t, i) => Row(i.toLong, t) }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
    TextAnalysis.chunkTokensOf(df, window, stride)
      .collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getLong(2), r.getString(3))))
      .groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).sortBy(_._1).toSeq }
  }

  property("declarative chunking == sequential reference on arbitrary " +
      "corpora and (window, stride) shapes") =
    Prop.forAll(genCorpus, genShape) { case (docs, (window, stride)) =>
      val got = viaSpark(docs, window, stride)
      val want = docs.zipWithIndex.map { case (t, i) =>
        i.toLong -> refChunks(t, window, stride)
      }.toMap
      got == want
    }

  property("coverage: token at position p lands in the chunk starting " +
      "(p div stride) * stride, for every doc and every position") =
    Prop.forAll(genDoc, genShape) { case (doc, (window, stride)) =>
      val toks = doc.split(" ", -1)
      val chunks = refChunks(doc, window, stride)
      toks.indices.forall { p =>
        val id = p / stride
        id < chunks.length && {
          val (_, n, _) = chunks(id)
          p - id * stride < n
        }
      }
    }
}
