package graft

import graft.ext.{CurationPipeline, Dedup, Similarity}

/** x60/x62/x63/x64 invariants beyond the DuckDB oracle compare. */
class CurationPipelineSpec extends SparkSpec {

  test("x60 roster: every chunk once per epoch, positions contiguous per batch") {
    val rows = CurationPipeline.curate(spark, sf).collect()
    assert(rows.nonEmpty)
    val byEpoch = rows.groupBy(_.getInt(0))
    assert(byEpoch.keySet == Set(0, 1))
    // both epochs shuffle the SAME chunk set
    assert(byEpoch(0).map(_.getLong(3)).toSet == byEpoch(1).map(_.getLong(3)).toSet)
    for ((_, g) <- rows.groupBy(r => (r.getInt(0), r.getInt(1))))
      assert(g.map(_.getInt(2)).sorted.toSeq == (1 to g.length),
        "positions must be 1..n within each (epoch, batch)")
  }

  test("x64 append: docs divisible by 35 match their original AND the appended copy") {
    val res = Dedup.dedupIndexAppend(spark, sf).collect()
    val planted = graft.ingest.Tables.load(spark, sf, "documents")
      .select("doc_id").collect().map(_.getLong(0)).filter(_ % 35 == 0)
    assert(planted.nonEmpty)
    for (d <- planted) {
      assert(res.exists(r => r.getLong(0) == d + 2000000L && r.getLong(1) == d),
        s"doc $d: batch-2 copy must rediscover the corpus original")
      assert(res.exists(r => r.getLong(0) == d + 2000000L && r.getLong(1) == d + 1000000L),
        s"doc $d: batch-2 copy must rediscover the APPENDED batch-1 segment copy")
    }
  }

  test("x62/x63 probe-only results equal the inline recomputes") {
    assert(Dedup.dedupIndexProbe(spark, sf).collect().toSeq ==
      Dedup.incrementalDedup(spark, sf).collect().toSeq)
    assert(Similarity.annIndexProbe(spark, sf).collect().toSeq ==
      Similarity.annIvf(spark, sf).collect().toSeq)
  }
}
