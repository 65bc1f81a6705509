package graft

import java.nio.file.Files

import org.apache.hadoop.fs.{Path => HPath, RawLocalFileSystem}
import org.apache.spark.sql.functions._

import graft.sink.ChangelogSink

/** A local filesystem whose renames can be made to FAIL (return false,
  * as HDFS does) for destinations in compaction's hide phase — the
  * failure mode the crash-safe swap must survive. Instantiated by Hadoop
  * via reflection (`fs.flaky.impl`). */
class FlakyRenameFs extends RawLocalFileSystem {
  override def getScheme: String = "flaky"
  override def getUri: java.net.URI = java.net.URI.create("flaky:///")
  override def rename(src: HPath, dst: HPath): Boolean =
    if (FlakyRenameFs.failHides && dst.getName.startsWith(".compacting-"))
      false
    else super.rename(src, dst)
}

object FlakyRenameFs { @volatile var failHides = false }

class ChangelogSinkSpec extends SparkSpec {
  import spark.implicits._

  test("append + read round-trips; partitioned by topic/date; retention drops") {
    val dir = Files.createTempDirectory("changelog").toString
    val env = Pipeline.envelope(spark, sf)
    ChangelogSink.append(env, dir)

    val back = ChangelogSink.read(spark, dir)
    assert(back.count() == env.count())
    // partition layout on disk: topic=events/date=...
    val topicDirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(topicDirs.contains("topic=events"))

    // append again: changelog append-only model; uid dedup restores one copy
    ChangelogSink.append(env, dir)
    val doubled = ChangelogSink.read(spark, dir)
    assert(doubled.count() == 2 * env.count())
    assert(doubled.dropDuplicates("uid").count() == env.count())

    // retention: drop everything before the max date -> only maxdate remains
    val maxDate = back.agg(max(to_date($"timestamp"))).as[java.sql.Date].head().toString
    val dropped = ChangelogSink.dropPartitionsBefore(spark, dir, maxDate)
    assert(dropped > 0)
    val kept = ChangelogSink.read(spark, dir)
    assert(kept.agg(min(to_date($"timestamp"))).as[java.sql.Date].head().toString == maxDate)
  }

  test("compaction: many small appended files collapse to the target " +
      "count, content identical, re-run is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("sink-compact").toString
    val env = Pipeline.envelope(spark, sf)
    // 5 appends = at least 5 files per (topic, date) partition
    (1 to 5).foreach(_ => ChangelogSink.append(env, dir))
    val before = ChangelogSink.read(spark, dir)
    val beforeRows = before.collect().toSet
    val date = before.agg(max(to_date($"timestamp")))
      .as[java.sql.Date].head().toString
    val partDir = new java.io.File(s"$dir/topic=events/date=$date")
    val filesBefore = partDir.listFiles().count(_.getName.endsWith(".parquet"))
    assert(filesBefore >= 5, s"expected >=5 small files, got $filesBefore")

    val n = ChangelogSink.compactPartition(spark, dir, "events", date)
    val filesAfter = partDir.listFiles().count(_.getName.endsWith(".parquet"))
    assert(filesAfter == n && filesAfter < filesBefore,
      s"files $filesBefore -> $filesAfter (n=$n)")
    // content is byte-for-row identical across the whole table
    assert(ChangelogSink.read(spark, dir).collect().toSet == beforeRows)
    // idempotent: a second run keeps the file count
    assert(ChangelogSink.compactPartition(spark, dir, "events", date) == filesAfter)
  }

  test("compaction failure mid-swap: checked renames abort, originals " +
      "restored, no data loss, retry succeeds") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.flaky.impl", classOf[FlakyRenameFs].getName)
    val dir = "flaky:" +
      java.nio.file.Files.createTempDirectory("sink-crash").toString
    val env = Pipeline.envelope(spark, sf)
    (1 to 3).foreach(_ => ChangelogSink.append(env, dir))
    val beforeRows = ChangelogSink.read(spark, dir).collect().toSet
    val date = ChangelogSink.read(spark, dir)
      .agg(max(to_date($"timestamp"))).as[java.sql.Date].head().toString

    FlakyRenameFs.failHides = true
    try {
      val e = intercept[IllegalStateException](
        ChangelogSink.compactPartition(spark, dir, "events", date))
      assert(e.getMessage.contains("hide-original"), e.getMessage)
    } finally FlakyRenameFs.failHides = false

    // the failed run must leave the partition fully readable (hidden
    // originals rolled back) and no dot-garbage among the data files
    assert(ChangelogSink.read(spark, dir).collect().toSet == beforeRows)
    val partDir = new java.io.File(
      s"${dir.stripPrefix("flaky:")}/topic=events/date=$date")
    assert(!partDir.listFiles().exists(_.getName.startsWith(".compacting-")))
    // staged output was left intact for inspection/retry
    assert(new java.io.File(dir.stripPrefix("flaky:")).listFiles()
      .exists(_.getName.startsWith(".compact-")))
    // a clean retry compacts normally with identical content
    val n = ChangelogSink.compactPartition(spark, dir, "events", date)
    assert(n >= 1 &&
      ChangelogSink.read(spark, dir).collect().toSet == beforeRows)
  }
}
