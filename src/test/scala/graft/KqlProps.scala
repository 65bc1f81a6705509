package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

import graft.query.Kql

/**
 * Property check for the KQL parser: ARBITRARY predicate trees rendered
 * to query strings must parse back to a predicate with identical
 * semantics (same filtered row set, including 3-valued NULL handling) as
 * the directly-built Column. Grammar corners (precedence, malformed
 * input) are pinned in [[KqlSpec]]; this covers the combinatorial space.
 */
object KqlProps extends Properties("kql") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(30)

  private lazy val spark = SparkSpec.spark

  private lazy val df = {
    val s = spark
    import s.implicits._
    Seq(
      ("x", 1.0, "alpha beta"),
      ("xy", 5.0, "beta gamma"),
      ("z", 9.0, "TOMBSTONE"),
      (null.asInstanceOf[String], 5.0, "alpha"),
      ("xyz", -3.0, ""))
      .toDF("a", "n", "value_json").cache()
  }

  private sealed trait Ast
  private case class Eq(v: String, quoted: Boolean) extends Ast
  private case class Prefix(p: String) extends Ast
  private case class Cmp(op: String, x: Double) extends Ast
  private case class Free(t: String) extends Ast
  private case class Phrase(ts: Seq[String]) extends Ast
  private case object Exists extends Ast
  private case class Not(c: Ast) extends Ast
  private case class BinOp(kw: String, l: Ast, r: Ast) extends Ast

  private val genLeaf: Gen[Ast] = Gen.oneOf(
    for { v <- Gen.oneOf("x", "xy", "z", "nope"); q <- Gen.oneOf(true, false) }
      yield Eq(v, q),
    Gen.oneOf("x", "xy", "q").map(Prefix(_)),
    for { op <- Gen.oneOf(">", ">=", "<", "<="); x <- Gen.oneOf(-3.0, 1.0, 5.0) }
      yield Cmp(op, x),
    Gen.oneOf("alpha", "beta", "TOMBSTONE", "delta").map(Free(_)),
    Gen.choose(1, 2).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("alpha", "beta", "gamma")).map(Phrase(_))),
    Gen.const(Exists))

  private def genAst(depth: Int): Gen[Ast] =
    if (depth <= 0) genLeaf
    else Gen.frequency(
      3 -> genLeaf,
      1 -> genAst(depth - 1).map(Not(_)),
      2 -> (for {
        kw <- Gen.oneOf("AND", "and", "OR", "or")
        l <- genAst(depth - 1); r <- genAst(depth - 1)
      } yield BinOp(kw, l, r)))

  // fully parenthesized render: precedence is pinned separately in KqlSpec
  private def render(a: Ast): String = a match {
    case Eq(v, true) => s"""a:"$v""""
    case Eq(v, false) => s"a:$v"
    case Prefix(p) => s"a:$p*"
    case Cmp(op, x) => s"n $op $x"
    case Free(t) => t
    case Phrase(ts) => s""""${ts.mkString(", ")}"""" // punctuated render
    case Exists => "a:*"
    case Not(c) => s"NOT (${render(c)})"
    case BinOp(kw, l, r) => s"(${render(l)}) $kw (${render(r)})"
  }

  private def direct(a: Ast): Column = a match {
    case Eq(v, _) => col("a") === lit(v)
    case Prefix(p) => col("a").like(p + "%")
    case Cmp(">", x) => col("n") > lit(x)
    case Cmp(">=", x) => col("n") >= lit(x)
    case Cmp("<", x) => col("n") < lit(x)
    case Cmp(_, x) => col("n") <= lit(x)
    case Free(t) => col("value_json").contains(t)
    case Phrase(ts) =>
      graft.functions.PhraseMatch.phrase(col("value_json"), ts.mkString(" "))
    case Exists => col("a").isNotNull
    case Not(c) => !direct(c)
    case BinOp(kw, l, r) =>
      if (kw.equalsIgnoreCase("and")) direct(l) && direct(r)
      else direct(l) || direct(r)
  }

  private def rows(c: Column): Set[String] =
    df.where(c).select(coalesce(col("a"), lit("NULL")))
      .collect().map(_.getString(0)).toSet

  property("rendered tree parses back to identical semantics") =
    Prop.forAll(genAst(3)) { ast =>
      rows(Kql.parse(render(ast))) == rows(direct(ast))
    }
}
