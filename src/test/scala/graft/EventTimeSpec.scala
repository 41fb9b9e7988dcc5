package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.{EventTimeOps, Sessionize, StreamFunnel}

/** Event-time extension operators: exact values in batch mode (the
  * window expression is engine-identical in both modes), watermark
  * behavior and custom state through MemoryStream micro-batches. */
class EventTimeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(minute * 60000L)

  private def eventsDf(rows: (Int, Long, String, Double)*) =
    rows.toSeq.map { case (m, u, t, v) => (ts(m), u, t, v) }
      .toDF("ts", "user_id", "event_type", "value")

  test("tumblingRollup: exact window boundaries and cent sums (batch)") {
    val df = eventsDf((1, 1, "a", 1.5), (59, 1, "a", 2.25), (61, 2, "a", 4.0),
      (61, 2, "b", -1.0))
    val out = EventTimeOps.tumblingRollup(df).collect()
      .map(r => (r.getTimestamp(0).getTime / 60000, r.getString(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(out == Set((0L, "a", 2L, 375L), (60L, "a", 1L, 400L),
      (60L, "b", 1L, -100L)))
  }

  test("sessionRollup: gap splits sessions per user (batch)") {
    val df = eventsDf((0, 7, "a", 0), (10, 7, "a", 0), (90, 7, "a", 0),
      (5, 8, "a", 0))
    val out = EventTimeOps.sessionRollup(df).collect()
      .map(r => (r.getLong(2), r.getTimestamp(0).getTime / 60000,
        r.getLong(3))).toSet
    // user 7: [0,10] session (2 events) then [90] session; user 8: [5]
    assert(out == Set((7L, 0L, 2L), (7L, 90L, 1L), (8L, 5L, 1L)))
  }

  test("expectationsRollup: per-window violation counters, streaming == batch") {
    import org.apache.spark.sql.functions.col
    val checks = Seq(
      "value_nonneg" -> (col("value") < 0),
      "type_domain" -> !col("event_type").isin("a", "b"))
    // batch form pins exact values: window [0,60) has one negative
    // value; window [60,120) has one domain violation
    val df = eventsDf((1, 1, "a", 1.5), (5, 1, "a", -2.0),
      (61, 2, "zzz", 4.0))
    val batch = EventTimeOps.expectationsRollup(df, checks).collect()
      .map(r => (r.getTimestamp(0).getTime / 60000,
        r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(batch == Set((0L, 2L, 1L, 0L), (60L, 1L, 0L, 1L)))
    // the SAME rows through MemoryStream micro-batches emit the same
    // windows once the watermark closes them
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String, Double)]
    val q = EventTimeOps.expectationsRollup(
        mem.toDF().toDF("ts", "user_id", "event_type", "value"), checks,
        "1 hour", "1 hour")
      .writeStream.format("memory").queryName("dq_rollup")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData((ts(1), 1L, "a", 1.5), (ts(5), 1L, "a", -2.0),
        (ts(61), 2L, "zzz", 4.0))
      q.processAllAvailable()
      mem.addData((ts(600), 1L, "a", 1.0)) // close all open windows
      q.processAllAvailable()
      val got = spark.table("dq_rollup").collect()
        .map(r => (r.getTimestamp(0).getTime / 60000,
          r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(batch.subsetOf(got))
    } finally q.stop()
  }

  test("tumblingRollup drops late data behind the watermark (streaming)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String, Double)]
    val df = mem.toDF().toDF("ts", "user_id", "event_type", "value")
    val q = EventTimeOps.tumblingRollup(df, "1 hour", "1 hour")
      .writeStream.format("memory").queryName("tumbling_wm")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: events at minute 10 and 200 -> watermark ~ 200-60=140
      mem.addData((ts(10), 1L, "a", 1.0), (ts(200), 1L, "a", 1.0))
      q.processAllAvailable()
      // batch 2: late event at minute 5 (window [0,60) is < watermark)
      // and on-time event at minute 210
      mem.addData((ts(5), 1L, "a", 99.0), (ts(210), 1L, "a", 1.0))
      q.processAllAvailable()
      // batch 3: advance watermark far so all open windows close
      mem.addData((ts(600), 1L, "a", 1.0))
      q.processAllAvailable()
      val rows = spark.table("tumbling_wm").collect()
        .map(r => (r.getTimestamp(0).getTime / 60000, r.getLong(3),
          r.getLong(4)))
      // window [0,60) emitted with ONLY the on-time event (n=1):
      // the minute-5 late arrival was dropped
      assert(rows.contains((0L, 1L, 100L)))
      assert(!rows.exists(t => t._1 == 0L && t._2 == 2L))
    } finally q.stop()
  }

  test("streaming dlqRateRollup emits exactly the batch rel_dlq_hourly rows (sf0.001)") {
    implicit val sqlCtx = spark.sqlContext
    // the batch gate query over the real corpus ...
    val batch = graft.relational.RelQueries
      .dlqHourly(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // ... and the SAME rows fed through MemoryStream micro-batches
    // (ts nanos -> micros truncation cannot cross an hour boundary:
    // boundaries are multiples of 1000 ns)
    val rows = graft.relational.Tables.events(spark, "/root/testdata/sf0.001")
      .select(timestamp_micros(expr("ts div 1000")).as("ts"), col("value"))
      .collect().map(r => (r.getTimestamp(0), r.getDouble(1)))
    val mem = MemoryStream[(Timestamp, Double)]
    val q = EventTimeOps.dlqRateRollup(mem.toDF().toDF("ts", "value"))
      .writeStream.format("memory").queryName("dlq_parity")
      .outputMode(OutputMode.Complete).start()
    try {
      // several micro-batches, unsorted arrival — windowed agg state
      // must still converge to the batch answer
      rows.grouped(3000).foreach { chunk =>
        mem.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      val got = spark.table("dlq_parity").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got.nonEmpty && got == batch)
    } finally q.stop()
  }

  test("streaming benfordRollup: digit histogram equals the batch " +
    "run across unsorted micro-batches; 9 counters max per window (r7)") {
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.relational.Tables.events(spark, "/root/testdata/sf0.001")
      .select(timestamp_micros(expr("ts div 1000")).as("ts"), col("value"))
    val batch = EventTimeOps.benfordRollup(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val rows = ev.collect().map(r => (r.getTimestamp(0), r.getDouble(1)))
    val mem = MemoryStream[(Timestamp, Double)]
    val q = EventTimeOps.benfordRollup(mem.toDF().toDF("ts", "value"))
      .writeStream.format("memory").queryName("benford_parity")
      .outputMode(OutputMode.Complete).start()
    try {
      rows.grouped(400).foreach { chunk =>
        mem.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      val got = spark.table("benford_parity").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got.nonEmpty && got == batch)
      got.groupBy(_._1).values.foreach { w =>
        assert(w.size <= 9)
        w.foreach { case (_, d, n) =>
          assert(d >= 1 && d <= 9 && n > 0)
        }
      }
    } finally q.stop()
  }

  test("streaming cmsRollup: cell table equals the batch run; state " +
    "bounded by d*w per window; probe law estimate >= exact") {
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.relational.Tables.events(spark, "/root/testdata/sf0.001")
      .select(timestamp_micros(expr("ts div 1000")).as("ts"), col("user_id"))
    // batch twin (window() is an ordinary grouping expr in batch)
    val batch = EventTimeOps.cmsRollup(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val rows = ev.collect().map(r => (r.getTimestamp(0), r.getLong(1)))
    val mem = MemoryStream[(Timestamp, Long)]
    val q = EventTimeOps.cmsRollup(mem.toDF().toDF("ts", "user_id"))
      .writeStream.format("memory").queryName("cms_parity")
      .outputMode(OutputMode.Complete).start()
    try {
      rows.grouped(2000).foreach { chunk =>
        mem.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      val got = spark.table("cms_parity").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got.nonEmpty && got == batch)
      // state bound: never more than d*w = 2048 cells per window
      got.groupBy(_._1).values.foreach(w => assert(w.size <= 2048))
      // CMS probe law in the busiest window: estimate >= exact for
      // the window's true top user
      val (topWin, topUser, exact) = rows
        .map(t => (t._1.toInstant.getEpochSecond / 3600 * 3600, t._2))
        .groupBy(identity).view.mapValues(_.size.toLong).toSeq
        .maxBy(_._2) match { case ((w, u), n) => (w, u, n) }
      def h31(s: String): Long = {
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8"))
        java.lang.Long.parseLong(
          d.map("%02x".format(_)).mkString.take(12), 16) % 2147483647L
      }
      val cells = got.filter(_._1 == topWin)
        .map(t => (t._2, t._3) -> t._4).toMap
      val est = (0 until 4).map(r =>
        cells.getOrElse((r.toLong, h31(s"$r#$topUser") % 512L), 0L)).min
      assert(est >= exact, s"CMS underestimated: $est < $exact")
    } finally q.stop()
  }

  test("streaming kmvRollup: window rows equal the batch run across " +
    "micro-batches; estimator exact below k (r7)") {
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.relational.Tables.events(spark, "/root/testdata/sf0.001")
      .select(timestamp_micros(expr("ts div 1000")).as("ts"), col("user_id"))
    val batch = EventTimeOps.kmvRollup(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val rows = ev.collect().map(r => (r.getTimestamp(0), r.getLong(1)))
    val mem = MemoryStream[(Timestamp, Long)]
    val q = EventTimeOps.kmvRollup(mem.toDF().toDF("ts", "user_id"))
      .writeStream.format("memory").queryName("kmv_parity")
      .outputMode(OutputMode.Complete).start()
    try {
      // unsorted multi-batch arrival: the sorted-union-truncate merge
      // across micro-batch partials must converge to the batch sketch
      rows.grouped(900).foreach { chunk =>
        mem.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      val got = spark.table("kmv_parity").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got.nonEmpty && got == batch)
      // estimator law per window: EXACT below the sketch size, a
      // bounded-error estimate at or above it
      val exact = rows.map(t =>
          (t._1.toInstant.getEpochSecond / 3600 * 3600, t._2))
        .distinct.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      got.foreach { case (w, nKept, _, est) =>
        if (nKept < 64)
          assert(exact(w) == est && nKept == est,
            s"window $w: est $est vs exact ${exact(w)}")
        else
          assert(est > exact(w) * 6 / 10 && est < exact(w) * 14 / 10,
            s"window $w: est $est far from exact ${exact(w)}")
      }
    } finally q.stop()
  }

  test("trendingTerms: MG sketch as streaming window state, exact within capacity") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val df = mem.toDF().toDF("ts", "text")
    val q = EventTimeOps.trendingTerms(df, "1 hour", "0 seconds",
      capacity = 16, k = 3)
      .writeStream.format("memory").queryName("trending")
      .outputMode(OutputMode.Append).start()
    try {
      // window [0,60): a×3 b×2 c×1 across TWO batches (state merges
      // the sketch buffers across micro-batches)
      mem.addData((ts(1), "a b a"), (ts(2), "b c"))
      q.processAllAvailable()
      mem.addData((ts(3), "a"))
      q.processAllAvailable()
      // advance the watermark so [0,60) closes and emits
      mem.addData((ts(600), "zz"))
      q.processAllAvailable()
      val rows = spark.table("trending").collect()
        .map(r => (r.getTimestamp(0).getTime / 60000, r.getString(1),
          r.getLong(2))).toSet
      assert(rows == Set((0L, "a", 3L), (0L, "b", 2L), (0L, "c", 1L)))
    } finally q.stop()
  }

  test("StreamFunnel.fold: strict ordering laws of the 3-slot machine") {
    import StreamFunnel.{Event => E, Hit}
    // click at the SAME ts as the view must NOT count (strict >);
    // purchase before the click must not; later duplicates ignored
    val (s, hits) = StreamFunnel.fold(1L, StreamFunnel.State(-1, -1, -1, Nil),
      Seq(E(1, "purchase", 5), E(1, "view", 10), E(1, "click", 10),
        E(1, "click", 20), E(1, "view", 30), E(1, "purchase", 25)))
    assert(hits.reverse == List(Hit(1, "1_view", 10), Hit(1, "2_click", 20),
      Hit(1, "3_purchase", 25)))
    assert((s.t_view, s.t_click, s.t_purchase) == ((10L, 20L, 25L)))
  }

  test("StreamFunnel.updateState buffers events above the watermark") {
    import StreamFunnel.{Event => E}
    val state = new TestGroupState[StreamFunnel.State] {
      override def getCurrentWatermarkMs(): Long = 15L
    }
    // view@10 is final (≤ wm) and emits; click@20 must wait
    val out1 = StreamFunnel.updateState(1L,
      Iterator(E(1, "click", 20), E(1, "view", 10)), state).toList
    assert(out1.map(h => (h.stage, h.ts_ms)) == List(("1_view", 10L)))
    assert(state.value.get.pending.map(_.ts_ms) == Seq(20L))
    // watermark passes 20 (timeout path: empty iterator) → click emits
    val state2 = new TestGroupState[StreamFunnel.State] {
      override def getCurrentWatermarkMs(): Long = 30L
    }
    state2.value = state.value
    val out2 = StreamFunnel.updateState(1L, Iterator.empty, state2).toList
    assert(out2.map(h => (h.stage, h.ts_ms)) == List(("2_click", 20L)))
    assert(state2.value.get.pending.isEmpty)
  }

  test("StreamFunnel == batch funnel under cross-batch disorder (MemoryStream)") {
    import StreamFunnel.{Event => E}
    implicit val sqlCtx = spark.sqlContext
    // u1 converts fully; u2's click ARRIVES before its view though the
    // view is event-time earlier (the disorder the buffer must absorb);
    // u3 purchases without clicking; u4's click ties its view's ts
    val b1 = Seq(E(1, "view", 1000), E(2, "click", 2500), E(3, "purchase", 1000))
    val b2 = Seq(E(2, "view", 2000), E(1, "click", 3000),
      E(4, "view", 4000), E(4, "click", 4000))
    val b3 = Seq(E(1, "purchase", 6000))
    val sentinel1 = Seq(E(99, "view", 500000))
    val sentinel2 = Seq(E(98, "view", 900000))
    val mem = MemoryStream[E]
    val withWm = mem.toDS()
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ts", "5 seconds")
      .as[E]
    val q = StreamFunnel(withWm)
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode(OutputMode.Append).start()
    try {
      Seq(b1, b2, b3, sentinel1, sentinel2).foreach { b =>
        mem.addData(b: _*); q.processAllAvailable()
      }
      // sentinels only advance the watermark (the LAST one's own view
      // stays buffered — nothing moves the watermark past it), so the
      // equivalence is over the real users
      val got = spark.table("funnel_out").as[StreamFunnel.Hit].collect()
        .filter(_.user_id < 90)
      // each stage emitted at most once per user
      assert(got.groupBy(h => (h.user_id, h.stage)).forall(_._2.length == 1))
      val streamCounts = got.groupBy(_.stage).view.mapValues(_.length.toLong).toMap
      val batch = graft.relational.RelQueries.funnelOf(
        (b1 ++ b2 ++ b3).map(e => (e.user_id, e.event_type, e.ts_ms))
          .toDF("user_id", "event_type", "ts")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // funnelOf counts users reaching ≥ stage; hits are per-stage
      // transitions, so membership sets must agree
      assert(streamCounts.getOrElse("1_view", 0L) == batch("1_view"))
      assert(streamCounts.getOrElse("2_click", 0L) == batch("2_click"))
      assert(streamCounts.getOrElse("3_purchase", 0L) == batch("3_purchase"))
    } finally q.stop()
  }

  test("Sessionize.updateState folds events into sessions with gap") {
    val evs = Seq(Sessionize.Event(1, 0L, 1.0), Sessionize.Event(1, 60000L, 2.0),
      Sessionize.Event(1, 10_000_000L, 5.0))
    // direct unit test of the state fold via the public function:
    // first two coalesce (gap 30 min), third opens a new session and
    // closes the first
    val state = new TestGroupState[Sessionize.SessionState]
    val out = Sessionize.updateState(Sessionize.DefaultGapMs)(1L,
      evs.iterator, state).toList
    assert(out == List(Sessionize.Session(1L, 0L, 60000L, 2L, 3.0)))
    assert(state.value.exists(s =>
      s.start_ms == 10_000_000L && s.n_events == 1L))
  }

  test("Sessionize end-to-end over MemoryStream micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Sessionize.Event]
    val withWm = mem.toDS()
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ts", "0 seconds")
      .as[Sessionize.Event]
    val q = Sessionize(withWm, gapMs = 60000L)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(Sessionize.Event(1, 1000L, 1.0),
        Sessionize.Event(1, 2000L, 2.0))
      q.processAllAvailable()
      // jump event-time far ahead: watermark passes 2000+gap, session
      // closes via timeout on the next batch
      mem.addData(Sessionize.Event(2, 500000L, 9.0))
      q.processAllAvailable()
      mem.addData(Sessionize.Event(2, 900000L, 1.0))
      q.processAllAvailable()
      val sessions = spark.table("sessions_out").as[Sessionize.Session]
        .collect().toSet
      assert(sessions.contains(Sessionize.Session(1L, 1000L, 2000L, 2L, 3.0)))
    } finally q.stop()
  }
}

/** Minimal GroupState stub for unit-testing update functions without
  * a streaming query. */
class TestGroupState[S] extends org.apache.spark.sql.streaming.GroupState[S] {
  var value: Option[S] = None
  private var timedOut = false
  override def exists: Boolean = value.isDefined
  override def get: S = value.get
  override def getOption: Option[S] = value
  override def update(newValue: S): Unit = value = Some(newValue)
  override def remove(): Unit = value = None
  override def hasTimedOut: Boolean = timedOut
  override def setTimeoutDuration(durationMs: Long): Unit = ()
  override def setTimeoutDuration(duration: String): Unit = ()
  override def setTimeoutTimestamp(timestampMs: Long): Unit = ()
  override def setTimeoutTimestamp(timestampMs: Long, additionalDuration: String): Unit = ()
  override def setTimeoutTimestamp(timestamp: java.sql.Date): Unit = ()
  override def setTimeoutTimestamp(timestamp: java.sql.Date, additionalDuration: String): Unit = ()
  override def getCurrentWatermarkMs(): Long = 0L
  override def getCurrentProcessingTimeMs(): Long = 0L
}
