package graft

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, TimeMode}

import graft.streaming.StreamPipeline

/**
 * MEASURED state-size bounds (round-11 verdict item 6): every watermark
 * claim in the streaming entries argues bounded state from semantics;
 * this suite measures it. Each test replays time-ordered slices through
 * a MemoryStream, snapshots `lastProgress.stateOperators.numRowsTotal`
 * after every slice, and asserts the store PLATEAUS at the
 * watermark-derived expectation while the cumulative key/window count
 * keeps growing — i.e. state is O(rate x horizon), not O(history).
 * `numRowsRemoved` must also fire, proving the plateau is eviction, not
 * luck. Caps carry ~2-3x slack: the eviction for slice i's watermark can
 * land in the trailing no-data batch, so a snapshot may catch one slice
 * of not-yet-evicted rows — the assertion is sub-linearity, not an
 * exact row count.
 */
class StreamStateSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  case class Evt(user_id: Long, typ: String, ts: java.sql.Timestamp)

  private def at(hour: Int, minute: Int = 0): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(
      f"2024-01-${1 + hour / 24}%02d ${hour % 24}%02d:$minute%02d:00")

  /** (stateRowsTotal of the latest batch, rowsRemoved summed so far). */
  private def snap(q: StreamingQuery): (Long, Long) = {
    val total = Option(q.lastProgress)
      .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L)
    val removed = q.recentProgress
      .flatMap(_.stateOperators).map(_.numRowsRemoved).sum
    (total, removed)
  }

  /** Feed `slices` one at a time, snapshot state after each. */
  private def profile(in: MemoryStream[Evt], q: StreamingQuery,
      slices: Seq[Seq[Evt]]): Seq[(Long, Long)] =
    try slices.map { s =>
      in.addData(s: _*)
      q.processAllAvailable()
      snap(q)
    } finally q.stop()

  private def assertPlateau(snaps: Seq[(Long, Long)], cap: Long,
      cumulative: Long, what: String): Unit = {
    val maxTotal = snaps.map(_._1).max
    assert(maxTotal <= cap,
      s"$what: state peaked at $maxTotal rows (cap $cap) — " +
        s"watermark eviction is not holding; snapshots: $snaps")
    assert(cumulative > cap * 2,
      s"$what: test is vacuous — cumulative keys $cumulative must dwarf " +
        s"the cap $cap for the plateau to mean anything")
    assert(snaps.last._2 > 0,
      s"$what: numRowsRemoved never fired — the plateau is not eviction")
  }

  test("tumbling-window agg state plateaus at the watermark horizon " +
      "(kq44 family): windows x types in horizon, not all history") {
    val in = MemoryStream[Evt]
    val agg = in.toDF()
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "1 hour"), $"typ").count()
    val q = agg.writeStream.format("memory").queryName("ss_win")
      .outputMode(OutputMode.Append()).start()
    // 6 slices, 6h apart; each fills 3 hourly windows x 3 types
    val slices = (0 until 6).map { i =>
      for (h <- 0 until 3; t <- Seq("a", "b", "c"); r <- 0 until 2)
        yield Evt(r.toLong, t, at(i * 6 + h, r * 7))
    }
    val snaps = profile(in, q, slices)
    // horizon = delay(1h) + open hour: <= 2 windows x 3 types live, one
    // un-evicted slice of slack -> cap 18; cumulative 6x3x3 = 54 window rows
    assertPlateau(snaps, cap = 18, cumulative = 54, "tumbling windows")
  }

  test("dropDuplicatesWithinWatermark state plateaus (kq45 family): " +
      "keys within the delay, not every key ever seen") {
    val in = MemoryStream[Evt]
    val dedup = in.toDF()
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("user_id")
    val q = dedup.writeStream.format("memory").queryName("ss_dedup")
      .outputMode(OutputMode.Append()).start()
    // 6 slices, 6h apart, 50 FRESH keys each (plus an in-slice replay
    // that must dedup) -> 300 distinct keys over the run
    val slices = (0 until 6).map { i =>
      (0 until 50).flatMap { j =>
        val e = Evt(i * 1000L + j, "a", at(i * 6, j % 50))
        Seq(e, e) // replay collapses in-slice
      }
    }
    val snaps = profile(in, q, slices)
    assertPlateau(snaps, cap = 120, cumulative = 300, "watermarked dedup")
  }

  test("stream-stream interval-join state plateaus (kq46 family): both " +
      "sides hold rows only inside the join horizon") {
    val lIn = MemoryStream[Evt]
    val rIn = MemoryStream[Evt]
    val l = lIn.toDF().select($"user_id", $"ts".as("lt"))
      .withWatermark("lt", "1 hour")
    val r = rIn.toDF().select($"user_id".as("r_user"), $"ts".as("rt"))
      .withWatermark("rt", "1 hour")
    val joined = l.join(r, $"user_id" === $"r_user" &&
      $"rt".between($"lt" - expr("INTERVAL 1 HOUR"),
        $"lt" + expr("INTERVAL 1 HOUR")))
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode(OutputMode.Append()).start()
    val slices = (0 until 6).map { i =>
      (0 until 30).map(j => Evt(i * 1000L + j, "a", at(i * 6, j)))
    }
    try {
      val snaps = slices.map { s =>
        lIn.addData(s: _*)
        rIn.addData(s: _*)
        q.processAllAvailable()
        snap(q)
      }
      // horizon: 1h bound + 1h delay; 30 rows/side/slice -> cap 2 slices
      // x 2 sides x 30 = 120 + slack; cumulative 360 buffered rows
      assertPlateau(snaps, cap = 150, cumulative = 360,
        "stream-stream join")
    } finally q.stop()
  }

  test("session-window state plateaus (kq48 family): open sessions in " +
      "the horizon, closed sessions evicted") {
    val in = MemoryStream[Evt]
    val sess = in.toDF()
      .withWatermark("ts", "1 hour")
      .groupBy(session_window($"ts", "30 minutes"), $"user_id").count()
    val q = sess.writeStream.format("memory").queryName("ss_sess")
      .outputMode(OutputMode.Append()).start()
    // 6 slices, 6h apart: 20 users, each a 2-event session per slice
    val slices = (0 until 6).map { i =>
      (0 until 20).flatMap { u =>
        Seq(Evt(u.toLong, "a", at(i * 6, 0)),
          Evt(u.toLong, "a", at(i * 6, 10)))
      }
    }
    val snaps = profile(in, q, slices)
    // live sessions <= 20/slice; 3x slack for pre-eviction snapshots;
    // cumulative 120 sessions over the run
    assertPlateau(snaps, cap = 55, cumulative = 120, "session windows")
  }

  test("transformWithState LIST state plateaus (kq56 family): a user " +
      "who stops producing is purged by the churn timer, not leaked") {
    withSQLConf("spark.sql.streaming.stateStore.providerClass" ->
        ("org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")) {
      val in = MemoryStream[Evt]
      val alerts = in.toDF()
        .withWatermark("ts", "1 hour")
        .withColumn("us", unix_micros($"ts"))
        .select($"user_id", $"ts", $"us")
        .as[StreamPipeline.UserEvt]
        .groupByKey(_.user_id)
        .transformWithState(
          new StreamPipeline.PatternAlertProcessor(3600000000L, 3), // 1h
          TimeMode.EventTime(), OutputMode.Append())
      val q = alerts.toDF().writeStream.format("memory")
        .queryName("ss_list").outputMode(OutputMode.Append()).start()
      // 8 slices, 6h apart, 20 FRESH users x 3 clicks within 10 min —
      // every user alerts once, then never produces again: without the
      // churn timer their 3-entry lists leak forever (the round-12 bug)
      val slices = (0 until 8).map { i =>
        (0 until 20).flatMap { u =>
          (0 until 3).map(j => Evt(i * 1000L + u, "click", at(i * 6, j)))
        }
      }
      val snaps = profile(in, q, slices)
      // live lists <= 20 users (+ a pre-eviction slice + timer rows);
      // cumulative 160 user lists (480 entries) over the run
      assertPlateau(snaps, cap = 70, cumulative = 160, "list state")
      assert(spark.table("ss_list").count() == 8 * 20) // one alert each
    }
  }

  test("transformWithState MAP state plateaus (kq105 family): closed " +
      "buckets' HLL registers are evicted at bucket close, and the " +
      "emission fixpoint equals the batch register maxima") {
    withSQLConf("spark.sql.streaming.stateStore.providerClass" ->
        ("org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")) {
      val in = MemoryStream[Evt]
      val regs = in.toDF()
        .withWatermark("ts", "1 hour")
        .select(
          expr("(unix_micros(date_trunc('hour', ts)) div 1000)")
            .as("bucket_ms"),
          $"ts",
          ($"user_id" % 64).cast("int").as("j"),
          (lit(1) + ($"user_id" % 9)).cast("int").as("rho"))
        .as[StreamPipeline.RegEvt]
        .groupByKey(_.bucket_ms)
        .transformWithState(new StreamPipeline.SlidingRegProcessor,
          TimeMode.EventTime(), OutputMode.Update())
      val q = regs.toDF().writeStream.format("memory")
        .queryName("ss_map").outputMode(OutputMode.Update()).start()
      // 8 slices, 6h apart; each fills 2 hourly buckets x 64 registers
      // (two rho values per register — the second, larger one must emit
      // incrementally). Buckets close (wm >= end) long before the next
      // slice, so register maps must turn over completely.
      val slices = (0 until 8).map { i =>
        for (h <- 0 until 2; j <- 0 until 64; r <- 0 until 2)
          yield Evt(j.toLong + r * 64L, "a", at(i * 6 + h, r * 9))
      }
      // LOSSLESSNESS BOUNDARY, other side: after the watermark passed
      // hour 0's bucket end (state long evicted), a late row for that
      // bucket carrying a LARGER rho (user 512: j=0, rho=9 vs the
      // bucket's real max 2) must be framework-dropped BEFORE the
      // processor — if it reached a cleared map it would resurrect the
      // register at 9 and the fixpoint assert below would catch it
      val lateRow = Seq(Evt(512L, "a", at(0)))
      val snaps = profile(in, q, slices :+ lateRow)
      // live map entries <= 2 buckets x 64, + one un-evicted slice of
      // slack + timer rows -> cap 400; cumulative 8x2x64 = 1024 entries
      assertPlateau(snaps, cap = 400, cumulative = 1024, "map state")
      // fixpoint == batch maxima for every (bucket, register)
      val fix = spark.table("ss_map")
        .groupBy($"bucket_ms", $"j").agg(max($"m").as("m"))
        .as[(Long, Int, Int)].collect().toSet
      val batch = slices.flatten.groupBy(e =>
          ((e.ts.getTime / 3600000L) * 3600000L, (e.user_id % 64).toInt))
        .map { case ((b, j), es) =>
          (b, j, es.map(e => (1 + e.user_id % 9).toInt).max) }.toSet
      assert(fix == batch,
        s"fixpoint != batch registers: ${(fix -- batch).take(3)} vs " +
          s"${(batch -- fix).take(3)}")
    }
  }

  test("transformWithState timer state plateaus (kq49 family): the " +
      "store holds only users whose inactivity timer has not fired") {
    withSQLConf("spark.sql.streaming.stateStore.providerClass" ->
        ("org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")) {
      val in = MemoryStream[Evt]
      val watched = in.toDF()
        .withWatermark("ts", "1 hour")
        .withColumn("us", unix_micros($"ts"))
        .select($"user_id", $"ts", $"us")
        .as[StreamPipeline.UserEvt]
        .groupByKey(_.user_id)
        .transformWithState(
          new StreamPipeline.InactivityProcessor(7200000L), // 2h horizon
          TimeMode.EventTime(), OutputMode.Append())
      val q = watched.toDF().writeStream.format("memory")
        .queryName("ss_timer").outputMode(OutputMode.Append()).start()
      // 10 slices, 6h apart, 25 FRESH users each: every slice's timers
      // (last_seen + 2h) expire before the next slice's watermark, so
      // state + timers must turn over completely between slices
      val slices = (0 until 10).map { i =>
        (0 until 25).map(j => Evt(i * 1000L + j, "a", at(i * 6, j)))
      }
      val snaps = profile(in, q, slices)
      // live users <= 25/slice, + a pre-eviction slice of slack, + the
      // store's timer rows may count toward numRowsTotal -> cap 110;
      // cumulative 250 users over the run
      assertPlateau(snaps, cap = 110, cumulative = 250,
        "event-time timers")
      // the emissions themselves: one silence report per expired user
      val fired = spark.table("ss_timer").count()
      assert(fired >= 225, s"only $fired timer emissions — expected the " +
        "first 9 slices' 225 users to have fired")
    }
  }
}
