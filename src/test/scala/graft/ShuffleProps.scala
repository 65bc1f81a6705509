package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties}

import graft.ext.TextAnalysis

/**
 * Property checks for x52's epoch-aware training shuffle: on ARBITRARY
 * doc-id sets and (epochs, batches) shapes, the md5 order keys, the
 * first-byte batch assignment, and the (epoch, batch)-partitioned
 * positions must all agree with an independent MessageDigest reference —
 * and distinct epochs must order every batch by DIFFERENT keys (the
 * whole point of salting the key with the epoch).
 */
object ShuffleProps extends Properties("epochShuffle") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(15)

  private lazy val spark = SparkSpec.spark

  private val genIds: Gen[List[Long]] =
    Gen.choose(1, 40).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0L, 100000L))).map(_.distinct)
  private val genShape: Gen[(Int, Int)] = for {
    epochs <- Gen.choose(1, 3)
    batches <- Gen.oneOf(1, 2, 4, 8)
  } yield (epochs, batches)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Independent reference: per (epoch, doc) key, first-byte batch,
    * rank within (epoch, batch) by (key, doc_id). */
  private def ref(ids: Seq[Long], epochs: Int,
      batches: Int): Set[(Int, Int, Int, Long, String)] =
    (0 until epochs).flatMap { e =>
      val keyed = ids.map { id =>
        val k = md5hex(s"$id:$e")
        (Integer.parseInt(k.take(2), 16) % batches, id, k)
      }
      keyed.groupBy(_._1).flatMap { case (b, grp) =>
        grp.sortBy { case (_, id, k) => (k, id) }.zipWithIndex.map {
          case ((_, id, k), i) => (e, b, i + 1, id, k)
        }
      }
    }.toSet

  private def viaSpark(ids: Seq[Long], epochs: Int,
      batches: Int): Set[(Int, Int, Int, Long, String)] = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(ids.map(Row(_)), 3),
      StructType(Seq(StructField("doc_id", LongType))))
    TextAnalysis.epochShuffleOf(df, epochs, batches)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getString(4)))
      .toSet
  }

  property("keys, batches and positions == MessageDigest reference on " +
      "arbitrary id sets and (epochs, batches) shapes") =
    Prop.forAll(genIds, genShape) { case (ids, (epochs, batches)) =>
      viaSpark(ids, epochs, batches) == ref(ids, epochs, batches)
    }

  property("epoch salting always changes every doc's key; with >= 10 " +
      "docs the global order genuinely reorders") =
    Prop.forAll(genIds.suchThat(_.length >= 10)) { ids =>
      val rows = ref(ids, 2, 4)
      val keysDiffer = ids.forall(id => md5hex(s"$id:0") != md5hex(s"$id:1"))
      def order(e: Int) = rows.filter(_._1 == e).toSeq
        .sortBy { case (_, b, p, _, _) => (b, p) }.map(_._4)
      keysDiffer && order(0) != order(1)
    }
}
