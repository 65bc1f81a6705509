package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.query.Changelog
import graft.sink.ChangelogSink

/** End-to-end through the user-facing facade: sink a pipeline run, then
  * answer every reference query from the sunk table (the workflow a
  * kafana user migrates to). */
class ChangelogFacadeSpec extends SparkSpec {
  import spark.implicits._

  test("the kafana workflow end-to-end over a sunk changelog") {
    val dir = Files.createTempDirectory("facade").toString
    ChangelogSink.append(Pipeline.envelope(spark, sf), dir)
    // replayed batch: facade must dedup on uid
    ChangelogSink.append(Pipeline.envelope(spark, sf), dir)

    val log = Changelog(spark, dir, Pipeline.ValueJsonField)
    assert(log.frame.count() == 1000) // not 2000: replay deduped

    val page = log.discover(lit("2024-01-01").cast("timestamp"),
      lit("2030-01-01").cast("timestamp"), 10)
    assert(page.count() == 10)

    assert(log.searchKey("13").count() > 0)
    assert(log.searchKeyTopic("13", "events").count() > 0)
    assert(log.searchKeyTopic("13", "nope").count() == 0)
    assert(log.searchField("event_type", "error").count() > 0)
    assert(log.searchJson("$.event_type", "error").count() ==
      log.searchField("event_type", "error").count())
    assert(log.tombstones().count() == 20)

    // Kibana's search box as a query STRING (KQL-ish)
    assert(log.search("key:13 AND topic:events").count() ==
      log.searchKeyTopic("13", "events").count())
    assert(log.search("key:13 OR key:7").count() ==
      log.searchKey("13").count() + log.searchKey("7").count())
    assert(log.search("\"error\"").count() ==
      log.frame.where(
        col(s"message.${Pipeline.ValueJsonField}").contains("error")).count())

    // Kibana's search box: BM25-ranked match over the payload JSON
    val hits = log.matchQuery(Seq("error"), k = 5)
    assert(hits.count() > 0 && hits.count() <= 5)
    assert(hits.where(
      !col(s"message.${Pipeline.ValueJsonField}").contains("error"))
      .count() == 0)
    assert(hits.select($"rank").as[Int].collect().toSeq ==
      (1 to hits.count().toInt))

    // match_phrase over the payload: [event, type, error] must sit at
    // CONSECUTIVE analyzed positions — case/punctuation-insensitive on
    // both sides, and order matters
    assert(log.matchPhrase("Event_Type: ERROR").count() ==
      log.searchField("event_type", "error").count())
    assert(log.matchPhrase("error event type").count() == 0)
    // span_near bridges the interleaved 'type' token the exact phrase
    // misses; order still matters
    assert(log.matchPhrase("event error").count() == 0)
    assert(log.spanNear("event error", 1).count() ==
      log.searchField("event_type", "error").count())
    assert(log.spanNear("error event", 3).count() == 0)
    // Lucene fuzzy: the typo'd query-bar term still finds its records
    // (AUTO distance from term length); explicit distance 0 degenerates
    // to exact analyzed-token containment
    assert(log.fuzzy("errr").count() ==
      log.searchField("event_type", "error").count())
    assert(log.fuzzy("error", Some(0)).count() ==
      log.searchField("event_type", "error").count())
    assert(log.search("errr~1").count() == log.fuzzy("errr", Some(1)).count())
    assert(log.latest().groupBy($"key").count()
      .where($"count" > 1).count() == 0)

    log.asView("changelog_v")
    val viaSql = spark.sql(
      "SELECT count(*) FROM changelog_v WHERE key = '13'").as[Long].head()
    assert(viaSql == log.searchKey("13").count())

    assert(log.histogram("hour").agg(sum($"n")).as[Long].head() == 1000)
  }
}
