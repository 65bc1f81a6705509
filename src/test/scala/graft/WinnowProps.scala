package graft

import java.security.MessageDigest

import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.Winnow

/**
 * Property checks for the [[graft.functions.Winnow]] native expression —
 * the x56 lesson says the dangerous inputs (empty text, 0/1/2-token
 * docs, duplicate grams) live OFF the fixture distribution, so they are
 * driven here with arbitrary small-vocab corpora:
 *
 *  - bit-equivalence with an independent JVM replay of the documented
 *    contract (split on single spaces keeping empties, k-gram md5-prefix
 *    hashes, w-window minima, distinct + sorted), and
 *  - the winnowing GUARANTEE (Schleimer et al. §3): two documents
 *    sharing a run of ≥ w + k − 1 consecutive tokens share at least one
 *    selected fingerprint.
 */
object WinnowProps extends Properties("winnow") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(20)

  private lazy val spark = SparkSpec.spark

  private val K = 3
  private val W = 4

  private def brute(text: String): Seq[Long] = {
    val toks = text.split(" ", -1)
    val n = toks.length - K + 1
    if (n <= 0) return Seq.empty
    val md = MessageDigest.getInstance("MD5")
    val hs = Array.tabulate(n) { i =>
      val d = md.digest(toks.slice(i, i + K).mkString(" ")
        .getBytes("UTF-8"))
      md.reset()
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    }
    (0 until math.max(n - W + 1, 1))
      .map(s => hs.slice(s, math.min(s + W, n)).min)
      .distinct.sorted
  }

  private val genTok: Gen[String] =
    Gen.oneOf("a", "bb", "c", "dd", "e", "", "zz")
  private val genText: Gen[String] = for {
    n <- Gen.choose(0, 40)
    toks <- Gen.listOfN(n, genTok)
  } yield toks.mkString(" ")

  property("native expression == independent replay on arbitrary " +
      "corpora incl. empty/1-token docs") =
    Prop.forAll(Gen.listOfN(8, genText)) { texts =>
      import spark.implicits._
      val got = texts.toDF("text")
        .select(Winnow.winnow(org.apache.spark.sql.functions.col("text"),
          K, W))
        .as[Seq[Long]].collect().toSeq
      got == texts.map(brute)
    }

  property("guarantee: a shared run of >= w+k-1 tokens yields a shared " +
      "fingerprint") =
    Prop.forAll(
      Gen.listOfN(W + K - 1, Gen.oneOf("r1", "r2", "r3", "r4")),
      Gen.listOfN(6, genTok), Gen.listOfN(6, genTok)) { (run, pre, post) =>
      val a = (pre ++ run).mkString(" ")
      val b = (run ++ post).mkString(" ")
      (brute(a).toSet intersect brute(b).toSet).nonEmpty
    }
}
