package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties}

import graft.ext.TextAnalysis

/**
 * Property checks for x55's concatenation packing: on ARBITRARY corpora
 * and (shards, capacity) shapes, the windowed running-sum formulation
 * must agree with an independent sequential concatenate-and-cut per
 * shard — context_id = floor(tokens_before / capacity), offset =
 * tokens_before mod capacity, docs in doc_id order within their md5
 * shard — and the cut must place every token exactly once (the sum of
 * est_tokens equals each shard's final cumulative total).
 */
object PackProps extends Properties("concatPack") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(15)

  private lazy val spark = SparkSpec.spark

  private val genDoc: Gen[String] =
    Gen.choose(1, 200).flatMap(n => Gen.listOfN(n,
      Gen.alphaLowerChar).map(_.mkString))
  private val genCorpus: Gen[List[String]] =
    Gen.choose(1, 20).flatMap(n => Gen.listOfN(n, genDoc))
  private val genShape: Gen[(Int, Int)] = for {
    shards <- Gen.oneOf(1, 2, 4, 8)
    capacity <- Gen.choose(4, 64)
  } yield (shards, capacity)

  /** The packers' shared md5 shard key, recomputed independently. */
  private def refShard(id: Long, n: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    Integer.parseInt(hex.take(2), 16) % n
  }

  /** Independent sequential reference: concatenate per shard in doc_id
    * order, cut at capacity boundaries. */
  private def refPack(docs: Seq[(Long, String)], shards: Int,
      capacity: Int): Map[Long, (Int, Long, Long, Long)] = {
    val cum = scala.collection.mutable.Map.empty[Int, Long]
      .withDefaultValue(0L)
    docs.sortBy(_._1).map { case (id, text) =>
      val sh = refShard(id, shards)
      val est = math.ceil(text.length / 4.0).toLong
      val before = cum(sh)
      cum(sh) = before + est
      id -> ((sh, est, before / capacity, before % capacity))
    }.toMap
  }

  private def viaSpark(docs: Seq[(Long, String)], shards: Int,
      capacity: Int): Map[Long, (Int, Long, Long, Long)] = {
    val rows = docs.map { case (i, t) => Row(i, t) }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
    TextAnalysis.concatPackOf(df, shards, capacity)
      .collect()
      .map(r => r.getLong(1) ->
        ((r.getInt(0), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
  }

  property("windowed running-sum cut == sequential concatenate-and-cut " +
      "reference on arbitrary corpora and (shards, capacity)") =
    Prop.forAll(genCorpus, genShape) { case (texts, (shards, capacity)) =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      viaSpark(docs, shards, capacity) == refPack(docs, shards, capacity)
    }

  property("every token placed exactly once: per shard, the offsets are " +
      "the running sums and the totals add up") =
    Prop.forAll(genCorpus, genShape) { case (texts, (shards, capacity)) =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val packed = refPack(docs, shards, capacity)
      packed.groupBy { case (_, (sh, _, _, _)) => sh }.forall {
        case (_, grp) =>
          val inOrder = grp.toSeq.sortBy(_._1)
            .map { case (_, (_, est, ctx, off)) => (est, ctx, off) }
          var cum = 0L
          inOrder.forall { case (est, ctx, off) =>
            val ok = ctx == cum / capacity && off == cum % capacity
            cum += est
            ok
          }
      }
    }
}
