package graft

import org.apache.spark.sql.functions._

import graft.ext.TextAnalysis

/**
 * x79 DSIR importance resampling: the native hashed-bigram scoring kernel
 * against a declarative higher-order formulation AND a driver-side
 * MessageDigest reference, plus the selection-shape invariants.
 */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    graft.ingest.Tables.load(spark, sf, "documents")

  /** Driver-side reference: md5-32 of "l r" mod B, summed weights. */
  private def refScore(text: String, w: Array[Long]): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val toks = text.split(" ", -1)
    toks.sliding(2).filter(_.length == 2).map { p =>
      val d = md.digest(s"${p(0)} ${p(1)}".getBytes("UTF-8"))
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      w((h % w.length).toInt)
    }.sum
  }

  test("dsir: native bigram scoring == declarative explode+join+agg == " +
      "driver MessageDigest reference") {
    val wt = TextAnalysis.dsirWeightTable(docs)
      .orderBy($"bucket").collect()
    val w = Array.ofDim[Long](TextAnalysis.DsirBuckets)
    wt.foreach(r => w(r.getLong(0).toInt) = r.getLong(1))

    // declarative path: explode bigrams, join the weight frame, agg
    val bg = docs.select($"doc_id", split($"text", " ").as("toks"))
      .where(size($"toks") >= 2)
      .select($"doc_id", explode(expr(
        "transform(sequence(1, size(toks) - 1)," +
          " i -> concat(toks[i - 1], ' ', toks[i]))")).as("feat"))
      .withColumn("bucket",
        conv(substring(md5($"feat"), 1, 8), 16, 10).cast("long")
          % TextAnalysis.DsirBuckets)
    val declarative = bg
      .join(broadcast(TextAnalysis.dsirWeightTable(docs)), Seq("bucket"))
      .groupBy($"doc_id").agg(sum($"w_nano").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val native = docs.select($"doc_id", $"text",
        graft.functions.HashedBigramWeightSum.bigramWeightSum($"text",
          typedLit(w.toSeq)).as("s"))
      .collect()
    assert(native.length == 500)
    native.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(2) == declarative.getOrElse(id, 0L),
        s"native != declarative for doc $id")
      assert(r.getLong(2) == refScore(r.getString(1), w),
        s"native != driver reference for doc $id")
    }
  }

  test("dsir: docs with fewer than two tokens score 0 (no bigrams)") {
    val w = Array.fill(TextAnalysis.DsirBuckets)(7L)
    val rows = Seq((1L, ""), (2L, "single"), (3L, "two tokens"))
      .toDF("doc_id", "text")
      .select($"doc_id", graft.functions.HashedBigramWeightSum
        .bigramWeightSum($"text", typedLit(w.toSeq)).as("s"))
      .orderBy($"doc_id").collect()
    // "" splits to one empty token, "single" to one token → no bigrams;
    // "two tokens" has exactly one bigram → one weight
    assert(rows.map(_.getLong(1)).toSeq == Seq(0L, 0L, 7L))
  }

  test("dsir: selection is a contiguous rank over key = score + gumbel, " +
      "deterministic across runs") {
    val sel = TextAnalysis.dsirSelectOf(docs, 100).collect()
    assert(sel.length == 100)
    assert(sel.map(_.getInt(6)).toSeq == (1 to 100))
    sel.foreach(r =>
      assert(r.getLong(5) == r.getLong(3) + r.getLong(4),
        s"key != score + gumbel for doc ${r.getLong(0)}"))
    // keys strictly ordered (int64 ties broken by doc_id would show as
    // equal keys; either way the sequence must be non-increasing)
    val keys = sel.map(_.getLong(5)).toSeq
    assert(keys == keys.sorted(Ordering[Long].reverse))
    val again = TextAnalysis.dsirSelectOf(docs, 100).collect()
    assert(sel.map(_.getLong(0)).toSeq == again.map(_.getLong(0)).toSeq)
  }
}
