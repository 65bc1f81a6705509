package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties}

import graft.ext.TextAnalysis
import graft.query.LogQueries

/**
 * Property checks for the two exact-arithmetic determinism contracts the
 * engine leans on hardest:
 *
 * kq36 `extendedStats`: all moments flow through exact DECIMAL cents
 * (s1 as decimal(28,0), s2 = Σcents² as decimal(28,0)) precisely because
 * a LONG s2 overflows at cents ≈ 3 037 000 499 (cents² ≈ 2⁶³) — one
 * 30-million-unit value is enough. The property drives group sizes and
 * magnitudes AROUND that boundary and demands bit-identity with an
 * exact BigInt replay of the documented formula
 * var = (n·s2 − s1²) / (n²·10⁴) evaluated with the same single IEEE
 * division.
 *
 * x56 `bigramNll`: the per-doc average must stay in EXACT INTEGER
 * nano-nats (9dp-rounded ln summed as exact longs, positive numerator
 * floor-divided) — the design that eliminated the 6dp rounding tie that
 * split engines on 22/500 sf0.01 docs. The property replays the recipe
 * independently (BigDecimal 9dp rounding, long arithmetic) on arbitrary
 * small-vocab corpora and checks every output column exactly; tie
 * freedom holds because the division is integral, which the replay
 * asserts via the Euclidean bound avg·n ≤ nll < (avg+1)·n.
 */
object StatsProps extends Properties("exactStats") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkSpec.spark

  // ----------------------------- kq36 --------------------------------

  /** 2dp magnitudes clustered around the int64 s2 boundary
    * (cents² ≈ 2⁶³ at cents = 3 037 000 499) plus small and huge tails.
    * Kept below ~2e12 cents so the double round-trips to the same 2dp. */
  private val genCents: Gen[Long] = Gen.frequency(
    3 -> Gen.choose(-1000000L, 1000000L),
    3 -> Gen.choose(3037000499L - 10, 3037000499L + 10),
    2 -> Gen.choose(1000000000000L, 2000000000000L),
    2 -> Gen.choose(-2000000000000L, -1000000000000L))

  private val genGroups: Gen[List[(String, List[Long])]] = for {
    k <- Gen.choose(1, 3)
    gs <- Gen.sequence[List[List[Long]], List[Long]](List.fill(k)(
      Gen.choose(1, 25).flatMap(n => Gen.listOfN(n, genCents))))
  } yield gs.zipWithIndex.map { case (g, i) => (s"t$i", g) }

  /** Exact replay of extendedStats' documented arithmetic: BigInt
    * moments, one IEEE division per output. */
  private def refStats(cents: Seq[Long]): (Long, Double, Double, Double,
      Double, Double, Double) = {
    val n = cents.size.toLong
    val s1 = cents.map(BigInt(_)).sum
    val s2 = cents.map(c => BigInt(c) * BigInt(c)).sum
    val minV = BigDecimal(cents.min, 2).toDouble
    val maxV = BigDecimal(cents.max, 2).toDouble
    val sumV = BigDecimal(s1).toDouble / 100
    val avgV = BigDecimal(s1).toDouble / 100 / n
    val varP = BigDecimal(BigInt(n) * s2 - s1 * s1).toDouble /
      (n.toDouble * n * 10000)
    (n, minV, maxV, sumV, avgV, varP, math.sqrt(varP))
  }

  private def viaSpark(groups: List[(String, List[Long])]):
      Map[String, (Long, Double, Double, Double, Double, Double, Double)] = {
    val rows = groups.flatMap { case (t, cs) =>
      cs.map(c => Row(t, c / 100.0))
    }
    val env = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3),
      StructType(Seq(StructField("event_type", StringType),
        StructField("value", DoubleType))))
    LogQueries.extendedStats(env).collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))
    }.toMap
  }

  property("extendedStats == exact BigInt replay across the int64 " +
      "s2-overflow boundary (bit-identical doubles)") =
    Prop.forAll(genGroups) { groups =>
      val got = viaSpark(groups)
      groups.forall { case (t, cs) =>
        got(t) == refStats(cs) // Double == : bit-identity demanded
      }
    }

  // ----------------------------- x56 ---------------------------------

  private val vocab = Vector("aa", "bb", "cc", "dd")
  private val genDocWords: Gen[List[String]] =
    Gen.choose(1, 24).flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab)))
  private val genCorpus: Gen[List[List[String]]] =
    Gen.choose(1, 10).flatMap(n => Gen.listOfN(n, genDocWords))

  private val Lambda = 0.75

  /** Independent replay of x56's nano-nat recipe with plain Scala
    * longs/BigDecimals (same JVM ln, same HALF_UP 9dp, same floor-div). */
  private def refNll(docs: List[(Long, List[String])])
      : Map[Long, (Long, Long, Long)] = {
    val bigrams = docs.flatMap { case (id, ws) =>
      ws.zip(ws.drop(1)).map(bg => (id, bg))
    }
    val c12 = bigrams.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val c1 = bigrams.groupBy(_._2._1).view.mapValues(_.size.toLong).toMap
    val toks = docs.flatMap(_._2)
    val c2 = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nTotal = toks.size.toLong
    bigrams.groupBy(_._1).map { case (id, bgs) =>
      val perBg = bgs.groupBy(_._2).view.mapValues(_.size.toLong)
      var lpSum = 0L; var m = 0L
      perBg.foreach { case ((w1, w2), mult) =>
        val p = Lambda * (c12((w1, w2)).toDouble / c1(w1)) +
          (1.0 - Lambda) * (c2(w2).toDouble / nTotal)
        val r9 = BigDecimal(math.log(p))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)
        val nano = (r9 * BigDecimal(1000000000)).toLongExact
        lpSum += nano * mult
        m += mult
      }
      val nll = -lpSum
      id -> ((m, nll, nll / m))
    }
  }

  private def nllViaSpark(docs: List[(Long, List[String])])
      : Map[Long, (Long, Long, Long)] = {
    val rows = docs.map { case (id, ws) => Row(id, ws.mkString(" ")) }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
    TextAnalysis.bigramNllOf(df, Lambda).collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))
    }.toMap
  }

  property("bigramNll nano-nat averages == independent long/BigDecimal " +
      "replay on arbitrary corpora (exact integers, no rounding ties)") =
    Prop.forAll(genCorpus) { wordLists =>
      val docs = wordLists.zipWithIndex.map { case (ws, i) => (i.toLong, ws) }
      val got = nllViaSpark(docs)
      val ref = refNll(docs)
      got == ref && ref.forall { case (_, (m, nll, avg)) =>
        nll >= 0 && avg * m <= nll && nll < (avg + 1) * m
      }
    }
}
