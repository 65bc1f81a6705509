package graft

import java.nio.file.Files

import org.apache.hadoop.fs.{Path => HPath, RawLocalFileSystem}
import org.apache.spark.sql.functions._

import graft.sink.ChangelogSink

/** A local filesystem whose renames can be made to FAIL (return false,
  * as HDFS does) in either of compaction's swap phases — hide-original,
  * or move-staged AFTER some moves already landed (the partial-swap
  * window where a bad rollback would leave duplicates). Instantiated by
  * Hadoop via reflection (`fs.flaky.impl`). */
class FlakyRenameFs extends RawLocalFileSystem {
  override def getScheme: String = "flaky"
  override def getUri: java.net.URI = java.net.URI.create("flaky:///")
  /** True only for the SWAP moves out of a committed staging dir — not
    * Spark's own committer renames, whose sources live under a
    * `_temporary` ancestor inside the same staging tree. */
  private def underStaging(p: HPath): Boolean = {
    var cur = p.getParent
    while (cur != null) {
      val n = cur.getName
      if (n == "_temporary") return false
      if (n.startsWith(".compact-") || n.startsWith(".forget-")) return true
      cur = cur.getParent
    }
    false
  }
  override def rename(src: HPath, dst: HPath): Boolean =
    if (FlakyRenameFs.onFirstHide != null &&
        dst.getName.startsWith(".forgetting-")) {
      // fire the concurrent-append injection ONCE, strictly between the
      // erasure's snapshot listing and its first swap rename, then let
      // the rename proceed normally
      val cb = FlakyRenameFs.onFirstHide
      FlakyRenameFs.onFirstHide = null
      cb(this, src)
      super.rename(src, dst)
    } else if (FlakyRenameFs.failHides &&
        (dst.getName.startsWith(".compacting-") ||
          dst.getName.startsWith(".forgetting-")))
      false
    else if (FlakyRenameFs.failMovesAfter >= 0 &&
        dst.getName.startsWith("part-") && underStaging(src) &&
        FlakyRenameFs.movesSeen.getAndIncrement() >=
          FlakyRenameFs.failMovesAfter)
      false
    else super.rename(src, dst)
}

/** OBJECT-STORE rename semantics (S3A/GCS connector model): rename is
  * copy-then-delete — O(bytes), non-atomic — and NEVER overwrites an
  * existing destination (returns false, like the connectors). Used to
  * prove the staged swaps' documented degradation on object stores
  * (ChangelogSink.CommitOps): converge where destination-exists implies
  * fully-copied, refuse loudly where finishing would require trusting an
  * unverifiable copy. */
class ObjectStoreFs extends RawLocalFileSystem {
  override def getScheme: String = "objstore"
  override def getUri: java.net.URI = java.net.URI.create("objstore:///")
  override def rename(src: HPath, dst: HPath): Boolean = {
    if (exists(dst)) return false
    org.apache.hadoop.fs.FileUtil.copy(this, src, this, dst,
      true /* delete source */, getConf)
  }
  /** A delete that fails SILENTLY (returns false, file stays — the
    * HDFS-contract failure mode) for one named file: exercises
    * CommitOps.renameOrFinish's loud-failure path. */
  override def delete(p: HPath, recursive: Boolean): Boolean =
    if (ObjectStoreFs.failDeleteOf != null &&
        p.getName == ObjectStoreFs.failDeleteOf) false
    else super.delete(p, recursive)
}

object ObjectStoreFs {
  @volatile var failDeleteOf: String = null
}

object FlakyRenameFs {
  @volatile var failHides = false
  @volatile var failMovesAfter = -1 // -1 = off; N = fail the (N+1)th move
  val movesSeen = new java.util.concurrent.atomic.AtomicInteger(0)
  /** Runs once, just before the first hide-original rename of an
    * erasure swap — the window where a concurrent append can land
    * between the snapshot listing and the swap. Receives (fs, src of
    * the hide rename). */
  @volatile var onFirstHide: (RawLocalFileSystem, HPath) => Unit = null
}

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

  test("partition pruning: a topic+date predicate reaches the scan as " +
      "partition filters and prunes to exactly the matching partitions") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = Files.createTempDirectory("changelog-prune").toString
    val env = Pipeline.envelope(spark, sf)
    ChangelogSink.append(env, dir)
    val dates = ChangelogSink.read(spark, dir)
      .select(date_format(to_date($"timestamp"), "yyyy-MM-dd"))
      .distinct().as[String].collect().sorted
    assert(dates.length > 1) // pruning must have something to prune
    val oneDate = dates.head
    val q = ChangelogSink.read(spark, dir)
      .where($"topic" === "events" && $"date" === oneDate)
    q.collect() // materialize the exact inspected plan
    def scanOf(p: org.apache.spark.sql.execution.SparkPlan)
        : FileSourceScanExec = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scanOf(a.executedPlan)
      case other =>
        other.collectFirst { case f: FileSourceScanExec => f }.get
    }
    val scan = scanOf(q.queryExecution.executedPlan)
    // the predicate became PARTITION filters (directory-level pruning),
    // not data filters evaluated per row
    assert(scan.partitionFilters.nonEmpty)
    // and only the ONE matching (topic, date) partition is scanned
    assert(scan.selectedPartitions.partitionCount == 1)
    val total = new java.io.File(dir, "topic=events").listFiles()
      .count(_.getName.startsWith("date="))
    assert(total == dates.length) // the unscanned partitions exist on disk
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("observed append: the write job itself reports the ingest audit " +
      "(rows, tombstones, event-time bounds) — no second scan") {
    val dir = Files.createTempDirectory("changelog-obs").toString
    val env = Pipeline.envelope(spark, sf)
    val metrics = ChangelogSink.appendObserved(env, dir)
    assert(metrics("n_rows") == env.count())
    assert(metrics("n_tombstones") ==
      env.where($"message.value_json" === "TOMBSTONE").count())
    val (lo, hi) = (metrics("min_ts").asInstanceOf[java.sql.Timestamp],
      metrics("max_ts").asInstanceOf[java.sql.Timestamp])
    assert(!lo.after(hi))
    // the write really landed, row-identical
    assert(ChangelogSink.read(spark, dir).count() == env.count())
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
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

  test("compaction failure MID move-staged: already-moved staged files " +
      "rolled back before originals restored — no duplicate rows, retry " +
      "does not bake in a partial copy") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.flaky.impl", classOf[FlakyRenameFs].getName)
    val dir = "flaky:" +
      java.nio.file.Files.createTempDirectory("sink-midswap").toString
    val env = Pipeline.envelope(spark, sf)
    (1 to 4).foreach(_ => ChangelogSink.append(env, dir))
    val before = ChangelogSink.read(spark, dir).collect()
    val date = ChangelogSink.read(spark, dir)
      .agg(max(to_date($"timestamp"))).as[java.sql.Date].head().toString
    // target sized so the rewrite stages TWO files (a single staged file
    // has no partial-swap window to inject into)
    val partBytes = new java.io.File(
      s"${dir.stripPrefix("flaky:")}/topic=events/date=$date")
      .listFiles().filter(_.getName.endsWith(".parquet")).map(_.length).sum
    val target = partBytes / 2 + 1

    // first staged move succeeds, second fails → the partial-swap window
    FlakyRenameFs.movesSeen.set(0)
    FlakyRenameFs.failMovesAfter = 1
    try {
      val e = intercept[IllegalStateException](
        ChangelogSink.compactPartition(spark, dir, "events", date, target))
      assert(e.getMessage.contains("move-staged"), e.getMessage)
    } finally FlakyRenameFs.failMovesAfter = -1

    // EXACT pre-swap state: same row multiset (a bad rollback that left
    // originals + a partial compacted copy would inflate the count)
    val after = ChangelogSink.read(spark, dir).collect()
    assert(after.length == before.length,
      s"rows ${before.length} -> ${after.length}: partial swap left behind")
    assert(after.toSet == before.toSet)
    val partDir = new java.io.File(
      s"${dir.stripPrefix("flaky:")}/topic=events/date=$date")
    assert(!partDir.listFiles().exists(_.getName.startsWith(".compacting-")))
    // retry snapshots only the restored originals → still identical rows
    val n = ChangelogSink.compactPartition(spark, dir, "events", date, target)
    val retried = ChangelogSink.read(spark, dir).collect()
    assert(n == 2 && retried.length == before.length &&
      retried.toSet == before.toSet)
  }

  test("rollIfNeeded: age condition drops old partitions, size condition " +
      "compacts fragmented ones, second sweep is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("sink-roll").toString
    val env = Pipeline.envelope(spark, sf)
    (1 to 4).foreach(_ => ChangelogSink.append(env, dir))
    val all = ChangelogSink.read(spark, dir)
    val maxDate = all.agg(max(to_date($"timestamp")))
      .as[java.sql.Date].head().toString
    val datesBefore = new java.io.File(s"$dir/topic=events").listFiles()
      .count(_.getName.startsWith("date="))
    assert(datesBefore > 1, "fixture should span multiple dates")

    val (dropped, compacted) = ChangelogSink.rollIfNeeded(spark, dir, maxDate)
    assert(dropped == datesBefore - 1, s"dropped $dropped of $datesBefore")
    assert(compacted == 1, s"compacted $compacted partitions")
    val partDir = new java.io.File(s"$dir/topic=events/date=$maxDate")
    assert(partDir.listFiles().count(_.getName.endsWith(".parquet")) == 1)
    // surviving rows = exactly the max-date slice, one copy per append
    val kept = ChangelogSink.read(spark, dir)
    assert(kept.agg(min(to_date($"timestamp")))
      .as[java.sql.Date].head().toString == maxDate)
    // idempotent: nothing left to drop or compact
    assert(ChangelogSink.rollIfNeeded(spark, dir, maxDate) == ((0, 0)))
  }

  test("forgetKey: the subject's rows vanish, everyone else's survive " +
      "exactly, untouched partitions keep their files, retry is a no-op") {
    val dir = Files.createTempDirectory("changelog-forget").toString
    val env = Pipeline.envelopeFlat(spark, sf)
    ChangelogSink.append(env, dir)
    val beforeByKey = ChangelogSink.read(spark, dir)
      .groupBy($"key").count().as[(String, Long)].collect().toMap
    // snapshot the files of a partition the key does NOT touch
    val root = new java.io.File(s"$dir/topic=events")
    val keyDates = ChangelogSink.read(spark, dir)
      .where($"key" === "13").select($"date".cast("string"))
      .distinct().as[String].collect().toSet
    val untouchedDir = root.listFiles().filter(_.isDirectory)
      .find(d => !keyDates.contains(d.getName.stripPrefix("date=")))
    val untouchedBefore = untouchedDir.map(
      _.listFiles().map(f => (f.getName, f.lastModified())).toSet)

    val audit = ChangelogSink.forgetKey(spark, dir, "13").collect()
    assert(audit.nonEmpty)
    assert(audit.forall(r => r.getAs[Long]("rows_after") ==
      r.getAs[Long]("rows_before") - r.getAs[Long]("rows_deleted")))
    val after = ChangelogSink.read(spark, dir)
    assert(after.where($"key" === "13").count() == 0)
    val afterByKey = after.groupBy($"key").count()
      .as[(String, Long)].collect().toMap
    assert(afterByKey == (beforeByKey - "13"))
    // non-hit partitions were never rewritten
    untouchedBefore.foreach { files =>
      assert(untouchedDir.get.listFiles()
        .map(f => (f.getName, f.lastModified())).toSet == files)
    }
    // retry: nothing contains the key anymore → empty audit, no change
    assert(ChangelogSink.forgetKey(spark, dir, "13").count() == 0)
    assert(ChangelogSink.read(spark, dir).count() == after.count())
  }

  test("forgetKey: constant Spark-job count regardless of hit-partition " +
      "count, and a fully-erased partition's directory is removed") {
    val dir = Files.createTempDirectory("changelog-forget-jobs").toString
    // subject 'S' spread over MANY partitions (8 topics x 4 dates = 32),
    // one partition holding ONLY the subject's rows
    val rows = for {
      t <- 0 until 8; d <- 1 to 4; i <- 0 until 3
      k = if (t == 0 && d == 1) "S" // topic0/day1 is 100% the subject
          else if (i == 0) "S" else s"other-$i"
    } yield (s"topic$t", s"k$i-u$t-$d-$i", k,
      java.sql.Timestamp.valueOf(f"2024-03-0$d 12:00:0$i"))
    val env = rows.toDF("topic", "uid", "key", "timestamp")
    ChangelogSink.append(env, dir)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    val audit = try {
      val a = ChangelogSink.forgetKey(spark, dir, "S").collect()
      // listener events are async: wait until the count is stable
      var last = -1
      var stableFor = 0
      while (stableFor < 4) { // 4 x 250ms with no new events
        Thread.sleep(250)
        if (jobs.get() == last) stableFor += 1
        else { last = jobs.get(); stableFor = 0 }
      }
      a
    } finally spark.sparkContext.removeSparkListener(listener)
    // 32 hit partitions, but erasure is discovery + before-count + one
    // staged write + the audit collect — NOT a job per partition (the
    // round-11 flag). AQE runs each shuffle stage as its own job, so the
    // two aggregating collects are 2 jobs each; bound at 10 (< 32) with
    // headroom, the point being CONSTANT in partition count.
    assert(jobs.get() <= 10, s"forgetKey ran ${jobs.get()} jobs for 32 " +
      "hit partitions — the per-partition driver loop is back")
    assert(audit.length == 32)
    // the all-subject partition is GONE (not an empty dir / stale files)
    assert(!new java.io.File(s"$dir/topic=topic0/date=2024-03-01").exists())
    val full = audit.find(r => r.getString(0) == "topic0" &&
      r.getString(1) == "2024-03-01").get
    assert(full.getAs[Long]("rows_after") == 0L)
    // everyone else intact, subject gone everywhere
    val after = ChangelogSink.read(spark, dir)
    assert(after.where($"key" === "S").count() == 0)
    assert(after.count() == rows.count(_._3 != "S"))
    // retry is a no-op even with the dropped directory
    assert(ChangelogSink.forgetKey(spark, dir, "S").count() == 0)
  }

  test("forgetKeys: a subject batch erases in one pass — per-subject " +
      "receipts, shared partitions rewritten once, null keys survive") {
    val dir = Files.createTempDirectory("changelog-forget-batch").toString
    val env = Pipeline.envelopeFlat(spark, sf)
    ChangelogSink.append(env, dir)
    val before = ChangelogSink.read(spark, dir)
    val beforeN = before.count()
    val subjects = Seq("7", "13", "21")
    val expectDel = before.where($"key".isin(subjects: _*)).count()
    val nullsBefore = before.where($"key".isNull).count()
    val receipts = ChangelogSink.forgetKeys(spark, dir, subjects).collect()
    // one receipt row per (subject, hit partition); per-partition totals
    // consistent on every row of that partition
    assert(receipts.map(_.getString(0)).toSet.subsetOf(subjects.toSet))
    assert(receipts.map(_.getAs[Long]("rows_deleted")).sum == expectDel)
    receipts.groupBy(r => (r.getString(1), r.getString(2))).foreach {
      case (_, rows) =>
        assert(rows.map(r => (r.getAs[Long]("part_rows_before"),
          r.getAs[Long]("part_rows_after"))).toSet.size == 1)
        val del = rows.map(_.getAs[Long]("rows_deleted")).sum
        assert(rows.head.getAs[Long]("part_rows_before") - del ==
          rows.head.getAs[Long]("part_rows_after"))
    }
    val after = ChangelogSink.read(spark, dir)
    assert(after.where($"key".isin(subjects: _*)).count() == 0)
    assert(after.count() == beforeN - expectDel)
    // NULL keys are never a subject (isin() is null for them)
    assert(after.where($"key".isNull).count() == nullsBefore)
    // retry: empty receipts, no change
    assert(ChangelogSink.forgetKeys(spark, dir, subjects).count() == 0)
  }

  test("erasure failure mid-swap: the failing partition rolls back " +
      "(no loss, no duplicates, per-partition atomicity), retry " +
      "finishes the erasure") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.flaky.impl", classOf[FlakyRenameFs].getName)
    val dir = "flaky:" +
      Files.createTempDirectory("forget-crash").toString
    val env = Pipeline.envelopeFlat(spark, sf)
    ChangelogSink.append(env, dir)
    val original = ChangelogSink.read(spark, dir)
      .drop("date").collect().toSet
    val subjectRows = original.filter(r => r.getAs[String]("key") == "13")
    assert(subjectRows.nonEmpty)

    // fail the SECOND staged move overall: some partitions commit, one
    // rolls back mid-move — the per-partition atomicity window
    FlakyRenameFs.movesSeen.set(0)
    FlakyRenameFs.failMovesAfter = 1
    try {
      val e = intercept[IllegalStateException](
        ChangelogSink.forgetKey(spark, dir, "13"))
      assert(e.getMessage.contains("move-staged"), e.getMessage)
    } finally FlakyRenameFs.failMovesAfter = -1

    val mid = ChangelogSink.read(spark, dir).drop("date").collect().toSeq
    // NO duplicates (a bad rollback would leave original + staged copy)
    assert(mid.size == mid.toSet.size)
    // every surviving row is an original row…
    assert(mid.toSet.subsetOf(original))
    // …and nothing non-subject was lost anywhere
    assert((original -- subjectRows).subsetOf(mid.toSet))
    // committed-then-failed is legal: only subject rows may be missing
    assert((original -- mid.toSet).subsetOf(subjectRows))

    // retry (clean fs) erases the remainder; receipts only for the
    // partitions that still held the subject
    val retryAudit = ChangelogSink.forgetKey(spark, dir, "13").collect()
    assert(retryAudit.nonEmpty)
    val fin = ChangelogSink.read(spark, dir).drop("date").collect().toSet
    assert(fin == original -- subjectRows)
  }

  test("erasure pins the file snapshot: a file appended to a hit " +
      "partition between snapshot and swap SURVIVES (visible " +
      "non-erasure, never silent loss), and a retry erases its rows") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.flaky.impl", classOf[FlakyRenameFs].getName)
    val dir = "flaky:" +
      Files.createTempDirectory("forget-append").toString
    val env = Pipeline.envelopeFlat(spark, sf)
    ChangelogSink.append(env, dir)
    val before = ChangelogSink.read(spark, dir)
    val beforeCount = before.count()
    val subj13 = before.where($"key" === "13").count()
    assert(subj13 > 0)

    // inject a concurrent append: just before the first hide rename,
    // copy the to-be-hidden file back in under a fresh part- name —
    // exactly a file that landed AFTER the erasure's snapshot listing
    @volatile var appended: HPath = null
    FlakyRenameFs.onFirstHide = (fs, src) => {
      val dst = new HPath(src.getParent, "part-post-append.parquet")
      org.apache.hadoop.fs.FileUtil.copy(fs, src, fs, dst, false,
        spark.sparkContext.hadoopConfiguration)
      appended = dst
    }
    try ChangelogSink.forgetKey(spark, dir, "13").collect()
    finally FlakyRenameFs.onFirstHide = null
    assert(appended != null, "hook never fired")

    // the appended file was neither read nor swapped: still on disk
    val fs = appended.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(appended), "post-snapshot append was LOST by the swap")
    val copy = spark.read.parquet(appended.toString)
    val copyCount = copy.count()
    val copy13 = copy.where($"key" === "13").count()
    assert(copy13 > 0) // the hit file held subject rows by construction

    // visible non-erasure: exactly the copy's subject rows remain
    val mid = ChangelogSink.read(spark, dir)
    assert(mid.where($"key" === "13").count() == copy13)
    assert(mid.count() == beforeCount - subj13 + copyCount)

    // retry re-discovers the surviving rows and finishes the job
    val retry = ChangelogSink.forgetKey(spark, dir, "13").collect()
    assert(retry.nonEmpty)
    val fin = ChangelogSink.read(spark, dir)
    assert(fin.where($"key" === "13").count() == 0)
    assert(fin.count() == beforeCount - subj13 + copyCount - copy13)
  }

  test("crash-leftover dot-hidden files are data to NEITHER erasure nor " +
      "compaction: never read (no silent drop / no duplicate rows), " +
      "never swapped, byte-identical after both ops") {
    val dir = Files.createTempDirectory("dotfile-leftover").toString
    val env = Pipeline.envelopeFlat(spark, sf)
    ChangelogSink.append(env, dir)
    ChangelogSink.append(env, dir) // second file per partition → compactable
    val before = ChangelogSink.read(spark, dir)
    val beforeCount = before.count()
    val subj = before.where($"key" === "13").count()
    assert(subj > 0)
    // plant what a mid-swap kill leaves: a dot-hidden copy of a real
    // data file in a partition the subject hits. If a listing fed it to
    // spark.read as an explicit path and the swap then hid/deleted it,
    // its rows would vanish without ever being rewritten.
    val hitDate = before.where($"key" === "13")
      .select($"date".cast("string")).orderBy($"date").as[String].head()
    val part = new java.io.File(s"$dir/topic=events/date=$hitDate")
    val dataFile = part.listFiles().filter(f => f.isFile &&
      f.getName.endsWith(".parquet") && !f.getName.startsWith(".")).head
    // the leftover's original is GONE (that's what a post-hide crash
    // leaves) — its name must not collide with any live file's hide
    // target, or the checked rename rightly refuses
    val ghost = new java.io.File(part,
      ".forgetting-part-r13-ghost.c000.snappy.parquet")
    java.nio.file.Files.copy(dataFile.toPath, ghost.toPath)
    val ghostLen = ghost.length()
    val ghostMod = ghost.lastModified()

    ChangelogSink.forgetKeys(spark, dir, Seq("13")).collect()
    assert(ghost.exists(), "erasure swallowed the crash leftover")
    assert(ghost.length() == ghostLen && ghost.lastModified() == ghostMod,
      "erasure rewrote the crash leftover")
    val after = ChangelogSink.read(spark, dir)
    assert(after.where($"key" === "13").count() == 0)
    assert(after.count() == beforeCount - subj,
      "ghost rows leaked into (or vanished from) the erased table")

    // compaction over the same partition: the ghost's rows must not
    // duplicate into the compacted output, and the ghost survives
    val visible = spark.read.parquet(part.toString).count()
    ChangelogSink.compactPartition(spark, dir, "events", hitDate)
    assert(ghost.exists() && ghost.length() == ghostLen &&
      ghost.lastModified() == ghostMod,
      "compaction touched the crash leftover")
    assert(spark.read.parquet(part.toString).count() == visible,
      "compaction duplicated the ghost's rows")
  }

  test("object-store rename (copy-then-delete, no overwrite): recovery " +
      "CONVERGES from a crash in the move-staged window (dst exists = " +
      "fully copied) and REFUSES LOUDLY from a crash in the hide window " +
      "(finishing would trust an unverifiable copy); repair converges") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.objstore.impl", classOf[ObjectStoreFs].getName)
    import spark.implicits._
    def mkTable(tag: String): (String, Set[org.apache.spark.sql.Row]) = {
      val dir = Files.createTempDirectory(s"objstore-$tag").toString
      for (b <- 0 until 3) // three appends -> three files, one partition
        ChangelogSink.append(Seq((s"T", s"u$b-1", s"k$b",
            java.sql.Timestamp.valueOf("2024-05-01 10:00:00")),
          (s"T", s"u$b-2", s"k$b",
            java.sql.Timestamp.valueOf("2024-05-01 11:00:00")))
          .toDF("topic", "uid", "key", "timestamp"), dir)
      (dir, ChangelogSink.read(spark, dir).drop("date").collect().toSet)
    }
    val rel = "topic=T/date=2024-05-01"
    def origFiles(dir: String) = new java.io.File(dir, rel).listFiles()
      .filter(f => f.getName.endsWith(".parquet") &&
        !f.getName.startsWith("."))
    // hand-build a committed compaction staging (flat layout + manifest)
    def mkStaging(dir: String, nOut: Int): (java.io.File, Seq[String]) = {
      val staging = new java.io.File(dir, s".compact-T-2024-05-01-7")
      val tmp = Files.createTempDirectory("objstore-stg").toString + "/o"
      spark.read.parquet(origFiles(dir).map(_.getPath).toIndexedSeq: _*)
        .repartition(nOut).write.parquet(tmp)
      staging.mkdirs()
      val staged = new java.io.File(tmp).listFiles()
        .filter(_.getName.startsWith("part-")).toSeq
        .map { f =>
          val t = new java.io.File(staging, f.getName)
          java.nio.file.Files.copy(f.toPath, t.toPath); f.getName
        }
      val m = new StringBuilder("L flat\n").append(s"P $rel\n")
      origFiles(dir).foreach(f => m.append(s"O $rel/${f.getName}\n"))
      staged.foreach(n => m.append(s"F $rel/$n\n"))
      java.nio.file.Files.writeString(
        new java.io.File(staging, "_MANIFEST").toPath, m.toString)
      (staging, staged)
    }

    // -- state A: crash in the MOVE-STAGED window -----------------------
    val (dirA, contentA) = mkTable("a")
    val (stagingA, stagedA) = mkStaging(dirA, 2)
    assert(stagedA.size == 2)
    origFiles(dirA).foreach { f => // hide phase completed
      assert(f.renameTo(new java.io.File(f.getParent,
        s".compacting-${f.getName}")))
    }
    // first staged file: copy landed in the partition, staging copy NOT
    // yet deleted (the non-atomic window); second never moved
    java.nio.file.Files.copy(
      new java.io.File(stagingA, stagedA.head).toPath,
      new java.io.File(s"$dirA/$rel", stagedA.head).toPath)
    val (fwd, disc) =
      ChangelogSink.recoverStaging(spark, "objstore:" + dirA)
    assert(fwd == 1 && disc == 0)
    // content assertions read via file: — the recovery ran entirely
    // through the objstore scheme above; parquet DATA reads through the
    // bare test FS are not checksum-coordinated and can be flaky, and
    // prod data reads never go through the swap's commit fs anyway
    val afterA = ChangelogSink.read(spark, dirA)
      .drop("date").collect().toSeq
    assert(afterA.size == afterA.toSet.size) // exactly once
    assert(afterA.toSet == contentA) // nothing lost
    assert(!stagingA.exists())
    assert(!new java.io.File(s"$dirA/$rel").listFiles()
      .exists(_.getName.startsWith(".compacting-")))

    // -- state B: crash in the HIDE window ------------------------------
    val (dirB, contentB) = mkTable("b")
    val (stagingB, _) = mkStaging(dirB, 1)
    val orig0 = origFiles(dirB).head
    java.nio.file.Files.copy(orig0.toPath, // dot-copy landed, original
      new java.io.File(orig0.getParent,    // not yet deleted
        s".compacting-${orig0.getName}").toPath)
    val origNames = origFiles(dirB).map(_.getName).toSet
    val e = intercept[IllegalStateException](
      ChangelogSink.recoverStaging(spark, "objstore:" + dirB))
    assert(e.getMessage.contains("hide-original"), e.getMessage)
    // refused with NO LOSS: recovery may have hidden some originals
    // before hitting the conflicting pair (hidden = dot-renamed, fully
    // recoverable), but every original file still exists under its
    // visible or hidden name, nothing was deleted, and the visible rows
    // are a subset of the table (no staged file moved in before a full
    // hide — hide-all strictly precedes move)
    val namesNow = new java.io.File(s"$dirB/$rel").listFiles()
      .map(_.getName).toSet
    assert(origNames.forall(n =>
      namesNow.contains(n) || namesNow.contains(s".compacting-$n")))
    assert(ChangelogSink.read(spark, dirB)
      .drop("date").collect().toSet.subsetOf(contentB))
    assert(stagingB.exists())
    // operator repair: drop the ambiguous dot-copy -> recovery converges
    assert(new java.io.File(orig0.getParent,
      s".compacting-${orig0.getName}").delete())
    assert(ChangelogSink.recoverStaging(spark, "objstore:" + dirB)
      == ((1, 0)))
    val afterB = ChangelogSink.read(spark, dirB)
      .drop("date").collect().toSeq
    assert(afterB.size == afterB.toSet.size && afterB.toSet == contentB)
    assert(!stagingB.exists())
  }

  test("conditional-put commit posture: the hide-window crash that the " +
      "default posture refuses CONVERGES (visible dst = complete object " +
      "by the store's PUT-if-absent contract); the move window still " +
      "converges; nothing lost, exactly once") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.objstore.impl", classOf[ObjectStoreFs].getName)
    import spark.implicits._
    def mkTable(tag: String): (String, Set[org.apache.spark.sql.Row]) = {
      val dir = Files.createTempDirectory(s"condput-$tag").toString
      for (b <- 0 until 3)
        ChangelogSink.append(Seq((s"T", s"u$b-1", s"k$b",
            java.sql.Timestamp.valueOf("2024-05-01 10:00:00")),
          (s"T", s"u$b-2", s"k$b",
            java.sql.Timestamp.valueOf("2024-05-01 11:00:00")))
          .toDF("topic", "uid", "key", "timestamp"), dir)
      (dir, ChangelogSink.read(spark, dir).drop("date").collect().toSet)
    }
    val rel = "topic=T/date=2024-05-01"
    def origFiles(dir: String) = new java.io.File(dir, rel).listFiles()
      .filter(f => f.getName.endsWith(".parquet") &&
        !f.getName.startsWith("."))
    def mkStaging(dir: String, nOut: Int): (java.io.File, Seq[String]) = {
      val staging = new java.io.File(dir, s".compact-T-2024-05-01-7")
      val tmp = Files.createTempDirectory("condput-stg").toString + "/o"
      spark.read.parquet(origFiles(dir).map(_.getPath).toIndexedSeq: _*)
        .repartition(nOut).write.parquet(tmp)
      staging.mkdirs()
      val staged = new java.io.File(tmp).listFiles()
        .filter(_.getName.startsWith("part-")).toSeq
        .map { f =>
          val t = new java.io.File(staging, f.getName)
          java.nio.file.Files.copy(f.toPath, t.toPath); f.getName
        }
      val m = new StringBuilder("L flat\n").append(s"P $rel\n")
      origFiles(dir).foreach(f => m.append(s"O $rel/${f.getName}\n"))
      staged.foreach(n => m.append(s"F $rel/$n\n"))
      java.nio.file.Files.writeString(
        new java.io.File(staging, "_MANIFEST").toPath, m.toString)
      (staging, staged)
    }

    // hide-window crash: ONE original has a complete dot-copy AND is
    // still visible — the exact pair the default posture refuses on
    val (dir, content) = mkTable("hide")
    val (staging, _) = mkStaging(dir, 1)
    val orig0 = origFiles(dir).head
    java.nio.file.Files.copy(orig0.toPath,
      new java.io.File(orig0.getParent,
        s".compacting-${orig0.getName}").toPath)
    // default posture still refuses (the contract did not silently move)
    val e = intercept[IllegalStateException](
      ChangelogSink.recoverStaging(spark, "objstore:" + dir))
    assert(e.getMessage.contains("hide-original"), e.getMessage)
    // conditional-put posture converges from the SAME state
    assert(ChangelogSink.recoverStaging(spark, "objstore:" + dir,
      conditionalPut = true) == ((1, 0)))
    val after = ChangelogSink.read(spark, dir).drop("date").collect().toSeq
    assert(after.size == after.toSet.size) // exactly once
    assert(after.toSet == content)         // nothing lost
    assert(!staging.exists())
    assert(!new java.io.File(s"$dir/$rel").listFiles()
      .exists(_.getName.startsWith(".compacting-")))

    // move-window crash converges under conditional-put too (same
    // outcome as the default posture's convergence case)
    val (dirM, contentM) = mkTable("move")
    val (stagingM, stagedM) = mkStaging(dirM, 2)
    origFiles(dirM).foreach { f =>
      assert(f.renameTo(new java.io.File(f.getParent,
        s".compacting-${f.getName}")))
    }
    java.nio.file.Files.copy(
      new java.io.File(stagingM, stagedM.head).toPath,
      new java.io.File(s"$dirM/$rel", stagedM.head).toPath)
    assert(ChangelogSink.recoverStaging(spark, "objstore:" + dirM,
      conditionalPut = true) == ((1, 0)))
    val afterM = ChangelogSink.read(spark, dirM).drop("date").collect().toSeq
    assert(afterM.size == afterM.toSet.size && afterM.toSet == contentM)
    assert(!stagingM.exists())

    // finish-delete failing SILENTLY (false, source stays visible) must
    // THROW, not proceed to land staged files beside the live original
    // (that would double the original's rows); the state is repairable —
    // once deletes work again, recovery converges exactly-once
    val (dirF, contentF) = mkTable("faildel")
    val (stagingF, _) = mkStaging(dirF, 1)
    val origF = origFiles(dirF).head
    java.nio.file.Files.copy(origF.toPath,
      new java.io.File(origF.getParent,
        s".compacting-${origF.getName}").toPath)
    ObjectStoreFs.failDeleteOf = origF.getName
    try {
      val eF = intercept[IllegalStateException](
        ChangelogSink.recoverStaging(spark, "objstore:" + dirF,
          conditionalPut = true))
      assert(eF.getMessage.contains("finish-delete failed"), eF.getMessage)
      assert(origF.exists(), "failed finish must leave the original alone")
      assert(stagingF.exists(), "staged files must NOT land after refusal")
    } finally ObjectStoreFs.failDeleteOf = null
    assert(ChangelogSink.recoverStaging(spark, "objstore:" + dirF,
      conditionalPut = true) == ((1, 0)))
    val afterF = ChangelogSink.read(spark, dirF).drop("date").collect().toSeq
    assert(afterF.size == afterF.toSet.size && afterF.toSet == contentF)
    assert(!stagingF.exists())
  }

  test("recoverStaging: HARD crash mid-swap (process kill, no rollback) " +
      "rolls forward from the manifest — hidden originals dropped, " +
      "staged rows landed, fully-erased partition removed; a " +
      "manifest-less staging dir is discarded") {
    val dir = Files.createTempDirectory("forget-hard-crash").toString
    // 3 topics x 2 dates; subject 'S' everywhere; topicF/day1 is ALL 'S'
    val rows = for {
      t <- Seq("topicA", "topicB", "topicF"); d <- 1 to 2; i <- 0 until 4
      k = if (t == "topicF" && d == 1) "S"
          else if (i == 0) "S" else s"u$i"
    } yield (t, s"$t-$d-$i", k,
      java.sql.Timestamp.valueOf(f"2024-04-0$d 08:00:0$i"))
    import spark.implicits._
    ChangelogSink.append(rows.toDF("topic", "uid", "key", "timestamp"), dir)
    val original = ChangelogSink.read(spark, dir)
      .drop("date").collect().toSet
    val expected = original.filter(_.getAs[String]("key") != "S")

    // ---- reproduce the protocol state at the instant of a kill ----
    // staged write of kept rows (hit partitions = all six), + manifest
    val staging = new java.io.File(dir, ".forget-424242")
    ChangelogSink.read(spark, dir).where($"key" =!= "S")
      .write.partitionBy("topic", "date").parquet(staging.toString)
    val partsRel = for (t <- Seq("topicA", "topicB", "topicF"); d <- 1 to 2)
      yield s"topic=$t/date=2024-04-0$d"
    val manifest = new StringBuilder("L nested\n")
    partsRel.foreach(p => manifest.append(s"P $p\n"))
    partsRel.foreach { p =>
      new java.io.File(dir, p).listFiles()
        .filter(f => f.getName.endsWith(".parquet") &&
          !f.getName.startsWith("."))
        .foreach(f => manifest.append(s"O $p/${f.getName}\n"))
    }
    val stagedFiles = partsRel.flatMap { p =>
      Option(new java.io.File(staging, p).listFiles()).toSeq.flatten
        .filter(f => f.getName.startsWith("part-"))
        .map(f => (p, f.getName))
    }
    stagedFiles.foreach { case (p, n) => manifest.append(s"F $p/$n\n") }
    java.nio.file.Files.writeString(
      new java.io.File(staging, "_MANIFEST").toPath, manifest.toString)
    def partDir(rel: String) = new java.io.File(dir, rel)
    def hideAll(rel: String): Unit =
      partDir(rel).listFiles().filter(_.getName.endsWith(".parquet"))
        .filterNot(_.getName.startsWith("."))
        .foreach(f => assert(f.renameTo(
          new java.io.File(f.getParent, s".forgetting-${f.getName}"))))
    // partition 1 (topicA/day1): killed MID-MOVE — all hidden, first
    // staged file moved in, the rest still in staging
    hideAll(partsRel.head)
    val (p1, f1) = stagedFiles.find(_._1 == partsRel.head).get
    assert(new java.io.File(staging, s"$p1/$f1")
      .renameTo(new java.io.File(partDir(p1), f1)))
    // partition 2 (topicA/day2): killed MID-HIDE — one original hidden
    val someOrig = partDir(partsRel(1)).listFiles()
      .filter(f => f.getName.endsWith(".parquet") &&
        !f.getName.startsWith(".")).head
    assert(someOrig.renameTo(new java.io.File(
      someOrig.getParent, s".forgetting-${someOrig.getName}")))
    // fully-erased partition (topicF/day1): killed after hide-all
    hideAll("topic=topicF/date=2024-04-01")
    // remaining partitions: swap never reached (originals untouched)
    // plus one DEAD staging dir whose write never finished (no manifest)
    val dead = new java.io.File(dir, ".forget-111")
    dead.mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(dead, "part-junk.parquet").toPath, "junk")

    val (forward, discardedN) = ChangelogSink.recoverStaging(spark, dir)
    assert(forward == 1 && discardedN == 1)
    // the table is exactly the erased table — no loss, no dupes, no S
    val after = ChangelogSink.read(spark, dir).drop("date").collect().toSeq
    assert(after.size == after.toSet.size)
    assert(after.toSet == expected)
    // fully-erased partition directory is gone; no debris anywhere
    assert(!partDir("topic=topicF/date=2024-04-01").exists())
    assert(!staging.exists() && !dead.exists())
    partsRel.filterNot(_ == "topic=topicF/date=2024-04-01").foreach { p =>
      assert(!partDir(p).listFiles().exists(_.getName.startsWith(".forgetting-")))
    }
    // idempotent: nothing left to recover
    assert(ChangelogSink.recoverStaging(spark, dir) == ((0, 0)))
  }

  test("forgetKeys property: for random tables (null keys, absent " +
      "subjects, subject-only partitions) the result is EXACTLY the " +
      "anti-filter and receipts are exactly the per-subject counts") {
    val rnd = new scala.util.Random(4242)
    for (round <- 1 to 6) {
      val dir = Files.createTempDirectory(s"forget-prop-$round").toString
      val keyPool = (0 until rnd.between(3, 9)).map(i => s"k$i")
      val rows = (0 until rnd.between(20, 120)).map { i =>
        val k = if (rnd.nextInt(10) == 0) null
                else keyPool(rnd.nextInt(keyPool.size))
        (s"t${rnd.nextInt(3)}", s"u$round-$i", k,
          java.sql.Timestamp.valueOf(
            f"2024-06-${1 + rnd.nextInt(3)}%02d 10:00:${rnd.nextInt(60)}%02d"))
      }
      import spark.implicits._
      ChangelogSink.append(
        rows.toDF("topic", "uid", "key", "timestamp"), dir)
      // subjects: random subset of the pool + one key that never occurs
      val subjects = rnd.shuffle(keyPool).take(rnd.between(1, 4)) :+ "ghost"
      val receipts = ChangelogSink.forgetKeys(spark, dir, subjects)
        .collect()
      val expectDel = rows.filter(r => r._3 != null &&
        subjects.contains(r._3))
      assert(receipts.map(_.getAs[Long]("rows_deleted")).sum ==
        expectDel.size, s"round $round: receipt sum mismatch")
      // per (key, topic, date) exact counts
      val got = receipts.map(r => ((r.getString(0), r.getString(1),
        r.getString(2)), r.getAs[Long]("rows_deleted"))).toMap
      val want = expectDel.groupBy(r =>
        (r._3, r._1, r._4.toLocalDateTime.toLocalDate.toString))
        .view.mapValues(_.size.toLong).toMap
      assert(got == want, s"round $round: receipts $got != $want")
      val after = ChangelogSink.read(spark, dir)
        .select($"uid").as[String].collect().toSet
      val wantAfter = rows.filterNot(r => r._3 != null &&
        subjects.contains(r._3)).map(_._2).toSet
      assert(after == wantAfter, s"round $round: surviving rows differ")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("recoverStaging: a compaction killed post-hide rolls forward, " +
      "and a file appended AFTER the snapshot survives recovery") {
    val dir = Files.createTempDirectory("compact-hard-crash").toString
    val base = (0 until 6).map(i => ("t1", s"c-$i", s"k$i",
      java.sql.Timestamp.valueOf(f"2024-05-01 09:00:0$i")))
    import spark.implicits._
    // three appends -> >= 3 small files in the partition
    (1 to 3).foreach { r =>
      ChangelogSink.append(base.map { case (t, u, k, ts) =>
        (t, s"$u-$r", k, ts) }.toDF("topic", "uid", "key", "timestamp"),
        dir)
    }
    val rel = "topic=t1/date=2024-05-01"
    val part = new java.io.File(dir, rel)
    val originals = part.listFiles()
      .filter(f => f.getName.endsWith(".parquet") &&
        !f.getName.startsWith(".")).map(_.getName)
    assert(originals.length >= 3)
    val snapshotRows = ChangelogSink.read(spark, dir)
      .drop("date").collect().toSet
    // staged compacted output + flat manifest, exactly as the protocol
    val staging = new java.io.File(dir, ".compact-t1-2024-05-01-77")
    ChangelogSink.read(spark, dir).drop("topic", "date").repartition(1)
      .write.parquet(staging.toString)
    val stagedNames = staging.listFiles()
      .filter(_.getName.startsWith("part-")).map(_.getName)
    val m = new StringBuilder("L flat\n").append(s"P $rel\n")
    originals.foreach(n => m.append(s"O $rel/$n\n"))
    stagedNames.foreach(n => m.append(s"F $rel/$n\n"))
    java.nio.file.Files.writeString(
      new java.io.File(staging, "_MANIFEST").toPath, m.toString)
    // kill point: ALL snapshot originals hidden, nothing moved yet
    originals.foreach { n =>
      assert(new java.io.File(part, n).renameTo(
        new java.io.File(part, s".compacting-$n")))
    }
    // a concurrent append lands AFTER the snapshot (and the crash)
    val extra = Seq(("t1", "late-1", "kX",
      java.sql.Timestamp.valueOf("2024-05-01 09:00:59")))
    ChangelogSink.append(
      extra.toDF("topic", "uid", "key", "timestamp"), dir)

    assert(ChangelogSink.recoverStaging(spark, dir) == ((1, 0)))
    val after = ChangelogSink.read(spark, dir).drop("date").collect().toSet
    // compaction is content-neutral; the late append survives intact
    assert(after.size == snapshotRows.size + 1)
    assert(snapshotRows.subsetOf(after))
    assert(after.exists(_.getAs[String]("uid") == "late-1"))
    // file layout: the compacted file(s) + the late append, no debris
    val names = part.listFiles().map(_.getName)
    assert(!names.exists(_.startsWith(".compacting-")))
    assert(stagedNames.forall(names.contains))
    assert(!staging.exists())
  }
}
