package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties}

import graft.sql.TimeJoins

/**
 * Property-based checks for the generic time-series operators: on
 * ARBITRARY keyed event sets (random keys, clustered times with
 * deliberate collisions), [[TimeJoins.asof]] must equal the brute-force
 * inequality join and [[TimeJoins.sessionize]] must equal a sequential
 * per-key scan. The fixture-backed oracle (q22/q25) checks one
 * distribution; these check the operator's contract itself.
 */
object TimeJoinsProps extends Properties("timejoins") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(6)

  private lazy val spark = SparkSpec.spark

  // small time domain on purpose: equal-time collisions must be common
  private val genEvents: Gen[List[(Long, Long, Long)]] =
    Gen.nonEmptyListOf(for {
      key <- Gen.chooseNum(0L, 3L)
      t <- Gen.chooseNum(0L, 20L)
    } yield (key, t)).map(_.zipWithIndex.map {
      case ((k, t), i) => (k, t, i.toLong) // unique id
    })

  private val schema = StructType(Seq(StructField("k", LongType),
    StructField("t", LongType), StructField("id", LongType)))

  private def toDf(rows: List[(Long, Long, Long)]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (k, t, i) =>
        Row(k, t, i)
      }, numSlices = 2), schema)

  property("asof equals the brute-force latest-right-at-or-before, " +
      "max-payload tiebreak") = Prop.forAll(genEvents, genEvents) {
    (leftRows, rightRows) =>
      val left = toDf(leftRows)
      val right = toDf(rightRows)
        .select(col("k"), col("id").as("rid"), col("t").as("rt"))
      val out = TimeJoins.asof(left, right, "k", "t", "rt")
        .select(col("id"), col("asof.rid"), col("asof.rt")).collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2)))))
        .toMap
      leftRows.forall { case (k, t, id) =>
        // brute force: latest rt <= t; ties -> max (rid, rt) struct =
        // max rid (rt equal within the tie set)
        val cands = rightRows.filter(r => r._1 == k && r._2 <= t)
        val expected =
          if (cands.isEmpty) None
          else {
            val maxT = cands.map(_._2).max
            val atMax = cands.filter(_._2 == maxT)
            Some((atMax.map(_._3).max, maxT))
          }
        out(id) == expected
      }
  }

  property("sessionize equals a sequential per-key gap scan") =
    Prop.forAll(genEvents) { rows =>
      val out = TimeJoins.sessionize(toDf(rows), "k", col("t"), 3L, col("id"))
        .select(col("id"), col("session_idx")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      rows.groupBy(_._1).forall { case (_, keyRows) =>
        val sorted = keyRows.sortBy(r => (r._2, r._3))
        var idx = 0L
        var prev = Long.MinValue
        sorted.forall { case (_, t, id) =>
          if (prev == Long.MinValue || t - prev > 3L) idx += 1
          prev = t
          out(id) == idx
        }
      }
    }
}
