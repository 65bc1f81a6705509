package graft

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.BpeMerge

/**
 * Property checks for the native BPE merge step behind x75/x76: the
 * greedy left-to-right [[BpeMerge.merge]] must agree with (a) an
 * independent leftmost-match recursion and (b) the RUN-PARITY closed
 * form the DuckDB oracle uses (a match position is kept iff its offset
 * inside its maximal run of consecutive matches is even) on arbitrary
 * symbol arrays — including the l == r case where overlapping matches
 * make the greedy/parity equivalence non-obvious. Symbol conservation
 * (concatenation unchanged) is pinned as well.
 */
object BpeProps extends Properties("bpeMerge") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(200)

  // tiny alphabet so (l, r) matches (incl. long same-symbol runs) are common
  private val genSym: Gen[String] = Gen.oneOf("a", "b", "ab", "c")
  private val genSyms: Gen[List[String]] =
    Gen.choose(0, 16).flatMap(n => Gen.listOfN(n, genSym))
  private val genPair: Gen[(String, String)] =
    for { l <- genSym; r <- genSym } yield (l, r)

  private def native(syms: List[String], l: String, r: String): List[String] = {
    val in: ArrayData = new GenericArrayData(
      syms.map(UTF8String.fromString).toArray[Any])
    val out = BpeMerge.merge(in, l, r)
    (0 until out.numElements()).map(out.getUTF8String(_).toString).toList
  }

  /** Reference 1: merge the leftmost match, resume after it. */
  private def refRecurse(syms: List[String], l: String, r: String)
      : List[String] = syms match {
    case a :: b :: rest if a == l && b == r =>
      (l + r) :: refRecurse(rest, l, r)
    case a :: rest => a :: refRecurse(rest, l, r)
    case Nil => Nil
  }

  /** Reference 2: the oracle's run-parity closed form. */
  private def refParity(syms: List[String], l: String, r: String)
      : List[String] = {
    val n = syms.length
    val isMatch = (0 until n).map(i =>
      i + 1 < n && syms(i) == l && syms(i + 1) == r)
    val kept = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      if (isMatch(i)) {
        var runStart = i
        while (i < n && isMatch(i)) {
          kept(i) = (i - runStart) % 2 == 0
          i += 1
        }
      } else i += 1
    }
    val out = List.newBuilder[String]
    var j = 0
    while (j < n) {
      if (kept(j)) { out += (l + r); j += 2 }
      else { out += syms(j); j += 1 }
    }
    out.result()
  }

  property("greedy == leftmost-match recursion") =
    Prop.forAll(genSyms, genPair) { (syms, p) =>
      native(syms, p._1, p._2) == refRecurse(syms, p._1, p._2)
    }

  property("greedy == run-parity closed form (the oracle's form)") =
    Prop.forAll(genSyms, genPair) { (syms, p) =>
      native(syms, p._1, p._2) == refParity(syms, p._1, p._2)
    }

  property("symbol conservation: concatenation unchanged") =
    Prop.forAll(genSyms, genPair) { (syms, p) =>
      native(syms, p._1, p._2).mkString == syms.mkString
    }

  property("no adjacent (l, r) survives when l != r") =
    Prop.forAll(genSyms, genPair) { (syms, p) =>
      val (l, r) = p
      val out = native(syms, l, r)
      l == r || out.zip(out.drop(1)).forall { case (a, b) =>
        !(a == l && b == r)
      }
    }
}
