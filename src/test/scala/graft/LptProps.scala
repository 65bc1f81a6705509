package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.LptAssign

/**
 * Property checks for the native LPT fold behind x49: the codegen'd
 * [[LptAssign]] must agree with an independent least-loaded-bin
 * reference fold on arbitrary size lists, and — when the input is
 * sorted descending, as x49 feeds it — its makespan must respect
 * Graham's 4/3 bound against the BRUTE-FORCE optimum on small
 * instances (the claim x46's round-robin could not honestly make).
 */
object LptProps extends Properties("lptAssign") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(20)

  private lazy val spark = SparkSpec.spark

  private val genSizes: Gen[List[Long]] =
    Gen.choose(0, 24).flatMap(n =>
      Gen.listOfN(n, Gen.choose(1L, 500L)))
  private val genBins: Gen[Int] = Gen.choose(1, 5)

  /** Independent reference: explicit loads scan, lowest index on ties. */
  private def refAssign(sizes: Seq[Long], bins: Int): Seq[Int] = {
    val loads = Array.fill(bins)(0L)
    sizes.map { s =>
      val b = (0 until bins).minBy(j => (loads(j), j))
      loads(b) += s
      b
    }
  }

  private def viaSpark(sizes: Seq[Long], bins: Int): Seq[Int] = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(sizes.toArray.toSeq)), 1),
      StructType(Seq(StructField("sizes",
        ArrayType(LongType, containsNull = false)))))
    df.select(LptAssign.lpt(col("sizes"), bins).as("bins"))
      .collect().head.getSeq[Int](0)
  }

  property("native fold == independent least-loaded reference on " +
      "arbitrary size lists") =
    Prop.forAll(genSizes, genBins) { (sizes, bins) =>
      viaSpark(sizes, bins) == refAssign(sizes, bins)
    }

  /** Brute-force optimal makespan (exhaustive assignment). */
  private def optMakespan(sizes: Seq[Long], bins: Int): Long = {
    var best = Long.MaxValue
    def go(i: Int, loads: Array[Long]): Unit =
      if (i == sizes.length) best = best.min(loads.max)
      else {
        var j = 0
        while (j < bins) {
          loads(j) += sizes(i)
          if (loads.max < best) go(i + 1, loads)
          loads(j) -= sizes(i)
          j += 1
        }
      }
    go(0, Array.fill(bins)(0L))
    best
  }

  private val genTiny: Gen[List[Long]] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.choose(1L, 50L)))

  property("sorted-descending LPT makespan <= 4/3 * brute-force optimum " +
      "(Graham's bound)") =
    Prop.forAll(genTiny, Gen.choose(2, 3)) { (sizes, bins) =>
      val sorted = sizes.sorted(Ordering[Long].reverse)
      val asg = refAssign(sorted, bins) // pinned equal to native above
      val loads = Array.fill(bins)(0L)
      sorted.zip(asg).foreach { case (s, b) => loads(b) += s }
      // 4/3 - 1/(3m) exactly; use the looser 4/3 with integer-safe math
      3 * loads.max <= 4 * optMakespan(sorted, bins)
    }
}
