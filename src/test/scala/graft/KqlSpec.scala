package graft

import org.apache.spark.sql.functions._

import graft.query.Kql

/** Grammar-level checks for the KQL-ish parser: each parsed predicate is
  * compared against the hand-written Column over a small typed frame
  * (the kq18 oracle covers the end-to-end envelope path). */
class KqlSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    ("click", 10.0, "{\"event_type\":\"click\"}"),
    ("clack", 95.0, "{\"event_type\":\"clack\"}"),
    ("signup", 99.0, "{\"event_type\":\"signup\"}"),
    ("view", 50.0, "TOMBSTONE"),
    (null.asInstanceOf[String], 91.0, "TOMBSTONE"))
    .toDF("event_type", "value", "value_json")

  private def ids(c: org.apache.spark.sql.Column): Set[String] =
    df.where(c).select(coalesce($"event_type", lit("NULL")))
      .as[String].collect().toSet

  test("equality, quoted phrase, numeric coercion") {
    assert(ids(Kql.parse("event_type:click")) ==
      ids($"event_type" === "click"))
    assert(ids(Kql.parse("event_type:\"signup\"")) ==
      ids($"event_type" === "signup"))
    assert(ids(Kql.parse("value:50")) == ids($"value" === lit("50")))
  }

  test("wildcard prefix, embedded wildcard, ranges") {
    assert(ids(Kql.parse("event_type:cl*")) ==
      ids($"event_type".like("cl%")))
    // embedded * is a wildcard too (KQL semantics): c*ck matches both
    // click and clack, not a literal "c*ck" equality
    assert(ids(Kql.parse("event_type:c*ck")) ==
      ids($"event_type".like("c%ck")))
    assert(ids(Kql.parse("event_type:c*ck")) == Set("click", "clack"))
    assert(ids(Kql.parse("value >= 91")) == ids($"value" >= 91.0))
    assert(ids(Kql.parse("value < 50")) == ids($"value" < 50.0))
  }

  test("AND binds tighter than OR; NOT and parens; 3-valued NULLs") {
    assert(ids(Kql.parse("event_type:view OR event_type:cl* AND value < 50")) ==
      ids($"event_type" === "view" ||
        ($"event_type".like("cl%") && $"value" < 50.0)))
    assert(ids(Kql.parse("(event_type:view OR event_type:click) AND value < 50")) ==
      ids(($"event_type" === "view" || $"event_type" === "click") &&
        $"value" < 50.0))
    // NOT over a NULL field row yields NULL -> filtered, not included
    assert(ids(Kql.parse("NOT event_type:signup")) ==
      ids(!($"event_type" === "signup")))
  }

  test("free text: bare terms match the ANALYZED token stream " +
      "(ES semantics); quoted phrases are analyzed match_phrase") {
    // bare term is analyzed on BOTH sides: mixed-case query finds the
    // token regardless of the JSON punctuation around it
    assert(ids(Kql.parse("TOMBSTONE")) ==
      ids($"value_json".contains("TOMBSTONE")))
    assert(ids(Kql.parse("tombstone")) == ids(Kql.parse("TOMBSTONE")))
    // "click" sits inside {"event_type":"click"} — punctuation-split
    // tokenization finds it where a whitespace split could not
    assert(ids(Kql.parse("CLICK")) == Set("click"))
    // bare-term wildcard matches analyzed tokens
    assert(ids(Kql.parse("cl*")) == Set("click", "clack"))
    // a quoted standalone phrase is an analyzed match_phrase: both sides
    // run through the analyzer (case/punctuation-insensitive) ...
    assert(ids(Kql.parse("\"clack\"")) == Set("clack"))
    assert(ids(Kql.parse("\"CLACK\"")) == Set("clack"))
    // ... and multi-word phrases are POSITIONAL — [event, type, click]
    // appear consecutively in {"event_type":"click"}, [event, click]
    // do not (both tokens exist, adjacency fails)
    assert(ids(Kql.parse("\"Event_Type: CLICK\"")) == Set("click"))
    assert(ids(Kql.parse("\"event click\"")).isEmpty)
    // a phrase analyzing to zero tokens matches nothing (ES
    // zero_terms_query: none)
    assert(ids(Kql.parse("\"...\"")).isEmpty)
  }

  test("Lucene proximity \"a b\"~N: in-order span_near with slop N") {
    // [event, click] are NOT adjacent in {"event_type":"click"} (the
    // 'type' token sits between) — slop 0 misses, slop 1 bridges
    assert(ids(Kql.parse("\"event click\"")).isEmpty)
    assert(ids(Kql.parse("\"event click\"~1")) == Set("click"))
    // order still matters at any slop
    assert(ids(Kql.parse("\"click event\"~3")).isEmpty)
    // slop composes with the rest of the grammar
    assert(ids(Kql.parse("\"event click\"~1 OR event_type:signup")) ==
      Set("click", "signup"))
  }

  test("Lucene fuzzy term~ / term~N: analyzed fuzzy match with AUTO " +
      "or explicit distance; lenient on degenerate input") {
    // clck~1: one substitution+insertion? no — clck→click is one INSERT
    // (distance 1); clck→clack also distance 1 — both match
    assert(ids(Kql.parse("clck~1")) == Set("click", "clack"))
    // explicit distance 0 is exact analyzed-token match
    assert(ids(Kql.parse("click~0")) == Set("click"))
    // AUTO: len(signup)=6 -> distance 2; 'signup' itself matches, and
    // nothing else in the fixture is within 2
    assert(ids(Kql.parse("signup~")) == Set("signup"))
    // AUTO: len(cl)=2 -> distance 0, so only an exact token matches
    assert(ids(Kql.parse("cl~")).isEmpty)
    // fuzzy composes with the grammar
    assert(ids(Kql.parse("clck~1 AND value < 50")) == Set("click"))
    // distance beyond the ES cap is a clear parse error, never a
    // NumberFormatException — even at Long-overflow magnitudes
    intercept[IllegalArgumentException](Kql.parse("term~3"))
    intercept[IllegalArgumentException](Kql.parse("term~99999999999"))
    // a base analyzing to multiple tokens falls back to the analyzed
    // phrase path (Lucene leniency), not a plan-time crash
    assert(ids(Kql.parse("event_type:click AND click-event~1")).isEmpty)
    assert(ids(Kql.parse("event-type~")) == ids(Kql.parse("\"event type\"")))
    // fuzzy + wildcard cannot combine
    intercept[IllegalArgumentException](Kql.parse("cl*ck~1"))
  }

  test("field existence f:* and escaped quotes in values") {
    // a bare * value is KQL field existence, not a match-everything LIKE
    assert(ids(Kql.parse("event_type:*")) == ids($"event_type".isNotNull))
    // \" escapes a quote inside a quoted value (exact equality, so the
    // fixture matches nothing — the point is the lexer doesn't mis-split)
    assert(ids(Kql.parse("event_type:\"cl\\\"ick\"")) ==
      ids($"event_type" === "cl\"ick"))
    assert(ids(Kql.parse("event_type:\"cl\\\\ick\"")) ==
      ids($"event_type" === "cl\\ick"))
    intercept[IllegalArgumentException](Kql.parse("event_type:\"cl\\\""))
  }

  test("parsed predicates push down to the parquet scan like hand-written " +
      "Columns") {
    val dir = java.nio.file.Files.createTempDirectory("kqlsink").toString
    graft.sink.ChangelogSink.append(Pipeline.envelope(spark, sf), dir)
    val q = graft.sink.ChangelogSink.read(spark, dir)
      .where(Kql.parse("key:13"))
    q.collect()
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(key), EqualTo(key,13)]"),
      scan)
  }

  test("malformed input is rejected, not mis-parsed") {
    intercept[IllegalArgumentException](Kql.parse("event_type:\"unterminated"))
    intercept[IllegalArgumentException](Kql.parse("(event_type:click"))
    intercept[IllegalArgumentException](Kql.parse("event_type:click )"))
  }
}
