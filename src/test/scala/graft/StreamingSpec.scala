package graft

import graft.streaming.StreamOps
import graft.streaming.StreamOps.{Event, Session}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Structured Streaming forms: same semantics as the batch event-time ops,
  * driven synchronously through MemoryStream + processAllAvailable.
  * (Default micro-batch trigger: AvailableNow would stop the query before
  * later addData calls could advance the watermark.)
  */
class StreamingSpec extends SparkSuite {
  import spark.implicits._

  private val Min = 60L * 1000000
  // base offset: an event at exactly epoch 0 sits on the initial watermark
  // and is dropped as late by the stateful operator — start one day in
  private val T0 = 86400L * 1000000

  test("streaming sessionize closes sessions on gap and matches batch semantics") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    val sessions = StreamOps.sessionize(src.toDS(), gapUs = 30 * Min)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess").start()
    try {
      // user 10: two events close together, then a 2h gap, then one more;
      // user 20: single event. A sentinel user's late events advance the
      // watermark so open sessions time out and flush.
      src.addData(
        Event(1, T0, 10, "a", 1.0), Event(2, T0 + 10 * Min, 10, "a", 1.0),
        Event(3, T0 + 130 * Min, 10, "b", 1.0), Event(4, T0 + 5 * Min, 20, "a", 1.0))
      q.processAllAvailable()
      src.addData(Event(99, T0 + 2000 * Min, 999, "z", 0.0))
      q.processAllAvailable()
      src.addData(Event(100, T0 + 4000 * Min, 999, "z", 0.0))
      q.processAllAvailable()
      val got = spark.table("sess").as[Session].collect()
        .map(s => (s.user_id, s.n_events, s.start_us, s.end_us)).toSet
      assert(got.contains((10L, 2L, T0, T0 + 10 * Min)))    // closed by gap
      assert(got.contains((10L, 1L, T0 + 130 * Min, T0 + 130 * Min))) // by timeout
      assert(got.contains((20L, 1L, T0 + 5 * Min, T0 + 5 * Min)))
    } finally q.stop()
  }

  test("streaming tumbling window with watermark emits finalized windows") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    val windowed = StreamOps.tumblingCounts(src.toDF(),
      window = "1 hour", watermark = "1 hour")
    val q = windowed.writeStream.outputMode("append")
      .format("memory").queryName("tumb").start()
    try {
      src.addData(
        Event(1, 5 * Min, 1, "a", 1.0), Event(2, 10 * Min, 2, "a", 2.0),
        Event(3, 65 * Min, 3, "b", 3.0))
      q.processAllAvailable()
      src.addData(Event(9, 600 * Min, 9, "z", 0.0)) // advance watermark
      q.processAllAvailable()
      val got = spark.table("tumb")
        .select(col("window.start").cast("long").as("w"), col("event_type"), col("n"))
        .as[(Long, String, Long)].collect().toSet
      assert(got.contains((0L, "a", 2L)))
      assert(got.contains((3600L, "b", 1L)))
    } finally q.stop()
  }

  test("streaming dedup: duplicate event ids within the watermark emit once") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    val deduped = StreamOps.dedupStream(src.toDF(), watermark = "1 hour")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup").start()
    try {
      src.addData(
        Event(1, T0, 10, "a", 1.0), Event(1, T0 + Min, 10, "a", 1.0),
        Event(2, T0 + 2 * Min, 20, "b", 1.0))
      q.processAllAvailable()
      // same id again in a later micro-batch, still inside the watermark
      src.addData(Event(1, T0 + 3 * Min, 10, "a", 1.0))
      q.processAllAvailable()
      val ids = spark.table("dedup").select("event_id").as[Long].collect().toSeq
      assert(ids.sorted === Seq(1L, 2L))
    } finally q.stop()
  }

  test("stream-stream interval join: purchases match prior views in-window only") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val joined = StreamOps.attributionJoin(
      views.toDF(), purchases.toDF(), windowSec = 3600)
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("attr").start()
    try {
      val Hour = 60 * Min
      views.addData(
        Event(1, T0, 10, "view", 0.0),            // in-window for purchase 100
        Event(2, T0 - 2 * Hour, 10, "view", 0.0), // too old
        Event(3, T0, 20, "view", 0.0))            // other user
      purchases.addData(Event(100, T0 + 30 * Min, 10, "purchase", 9.99))
      q.processAllAvailable()
      val got = spark.table("attr")
        .select("purchase_id", "view_id").as[(Long, Long)].collect().toSet
      assert(got === Set((100L, 1L)))
    } finally q.stop()
  }

  test("stream-stream interval join ≡ batch interval join on 300 random events") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(1717)
    val Hour = 60 * Min
    val evts = (1 to 300).map { i =>
      val kind = if (rnd.nextInt(3) == 0) "purchase" else "view"
      Event(i.toLong, T0 + rnd.nextInt(36) * 10 * Min, 1 + rnd.nextInt(6),
        kind, 0.0)
    }
    val vEvts = evts.filter(_.event_type == "view")
    val pEvts = evts.filter(_.event_type == "purchase")

    val batch = pEvts.toDF().as("p").join(vEvts.toDF().as("v"),
      col("p.user_id") === col("v.user_id") &&
        col("v.ts_us") <= col("p.ts_us") &&
        col("v.ts_us") >= col("p.ts_us") - lit(Hour))
      .select(col("p.event_id"), col("v.event_id"))
      .as[(Long, Long)].collect().toSet

    val views = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val q = StreamOps.attributionJoin(views.toDF(), purchases.toDF(),
      windowSec = 3600)
      .writeStream.outputMode("append").format("memory")
      .queryName("attr_eqv").start()
    try {
      views.addData(vEvts: _*)
      purchases.addData(pEvts: _*)
      q.processAllAvailable()
      val streamed = spark.table("attr_eqv")
        .select("purchase_id", "view_id").as[(Long, Long)].collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER join: organic purchases null-extend only " +
    "after the watermark closes their window") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val q = StreamOps.attributionJoinOuter(views.toDF(), purchases.toDF(),
      windowSec = 3600)
      .writeStream.outputMode("append").format("memory")
      .queryName("attr_outer").start()
    try {
      views.addData(Event(1, T0, 10, "view", 0.0))
      purchases.addData(
        Event(100, T0 + 30 * Min, 10, "purchase", 9.99), // matched
        Event(101, T0 + 30 * Min, 20, "purchase", 5.00)) // organic
      q.processAllAvailable()
      def got() = spark.table("attr_outer")
        .filter(col("user_id") =!= 999)
        .select("purchase_id", "view_id")
        .as[(Long, Option[Long])].collect().toSet
      // matched row emits immediately; the organic one is still held —
      // a view inside its window could arrive
      assert(got() === Set((100L, Some(1L))))
      // two watermark pushes on BOTH sides (watermark = min over sources):
      // first advances past 101's window end, second flushes the eviction
      for (t <- Seq(T0 + 5000 * Min, T0 + 9000 * Min)) {
        views.addData(Event(9001, t, 999, "view", 0.0))
        purchases.addData(Event(9002, t, 999, "purchase", 0.0))
        q.processAllAvailable()
      }
      assert(got().contains((101L, None)),
        s"organic purchase never null-extended: ${got()}")
    } finally q.stop()
  }

  test("streaming sessionize ≡ batch sessionize on the same 300 random events") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(4242)
    val evts = (1 to 300).map { i =>
      val user = 1 + rnd.nextInt(8)
      // gaps up to 50 min around a 30-min session gap → plenty of closures
      Event(i.toLong, T0 + i * Min + rnd.nextInt(50) * Min,
        user, "e", rnd.nextInt(100) / 10.0)
    }
    val maxTs = evts.map(_.ts_us).max

    val batch = graft.ext.Sessions.sessionize(
      evts.toDF().withColumn("ts", col("ts_us") * 1000L).drop("ts_us"),
      gapUs = 30 * Min)
      .select("user_id", "n_events", "start_us", "end_us")
      .as[(Long, Long, Long, Long)].collect().toSet

    val src = MemoryStream[Event]
    val q = StreamOps.sessionize(src.toDS(), gapUs = 30 * Min)
      .writeStream.outputMode("append").format("memory").queryName("eqv").start()
    try {
      src.addData(evts: _*)
      q.processAllAvailable()
      // two watermark pushes: first sets WM past every open session's
      // timeout, second triggers the timed-out flush
      src.addData(Event(9001, maxTs + 5000 * Min, 999, "z", 0.0))
      q.processAllAvailable()
      src.addData(Event(9002, maxTs + 9000 * Min, 999, "z", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("eqv").as[Session]
        .collect().filter(_.user_id != 999)
        .map(s => (s.user_id, s.n_events, s.start_us, s.end_us)).toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming tumbling ≡ batch tumbling buckets on the same events") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(77)
    val Hour = 60 * Min
    val evts = (1 to 200).map { i =>
      Event(i.toLong, T0 + rnd.nextInt(10 * 60) * Min,
        1 + rnd.nextInt(5), if (rnd.nextBoolean()) "a" else "b",
        rnd.nextInt(100) / 10.0)
    }
    val batch = graft.ext.Sessions.tumbling(
      evts.toDF().withColumn("ts", col("ts_us") * 1000L).drop("ts_us"),
      windowUs = Hour)
      .select("bucket", "event_type", "n")
      .as[(Long, String, Long)].collect().toSet

    val src = MemoryStream[Event]
    val q = StreamOps.tumblingCounts(src.toDF(),
      window = "1 hour", watermark = "1 hour")
      .writeStream.outputMode("append").format("memory").queryName("teqv").start()
    try {
      src.addData(evts: _*)
      q.processAllAvailable()
      src.addData(Event(9001, T0 + 100000 * Min, 999, "z", 0.0))
      q.processAllAvailable()
      // streaming window.start (epoch seconds) / 3600 == batch floor-div bucket
      val streamed = spark.table("teqv")
        .select((col("window.start").cast("long") / 3600).cast("long"),
          col("event_type"), col("n"))
        .as[(Long, String, Long)].collect()
        .filter(_._2 != "z").toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming hopping ≡ batch hopping windows on the same events") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(78)
    val evts = (1 to 200).map { i =>
      Event(i.toLong, T0 + rnd.nextInt(10 * 60) * Min,
        1 + rnd.nextInt(5), if (rnd.nextBoolean()) "a" else "b",
        rnd.nextInt(100) / 10.0)
    }
    val batch = graft.ext.Sessions.hopping(
      evts.toDF().withColumn("ts", col("ts_us") * 1000L).drop("ts_us"),
      windowUs = 3600L * 1000000, slideUs = 1800L * 1000000)
      .select("w_start", "event_type", "n")
      .as[(Long, String, Long)].collect().toSet

    val src = MemoryStream[Event]
    val q = StreamOps.hoppingCounts(src.toDF(),
      window = "1 hour", slide = "30 minutes", watermark = "1 hour")
      .writeStream.outputMode("append").format("memory").queryName("heqv").start()
    try {
      src.addData(evts: _*)
      q.processAllAvailable()
      src.addData(Event(9001, T0 + 100000 * Min, 999, "z", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("heqv")
        .select((col("window.start").cast("long") * 1000000L),
          col("event_type"), col("n"))
        .as[(Long, String, Long)].collect()
        .filter(_._2 != "z").toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("native session_window ≡ explicit-state sessionize aggregates") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(79)
    // whole-minute events + 30.5-min gap: never exactly gap apart, so the
    // native ≥-split and the batch >-split agree (see sessionWindowCounts)
    val gapUs = 1830L * 1000000
    val evts = (1 to 300).map { i =>
      Event(i.toLong, T0 + rnd.nextInt(12 * 60) * Min,
        1 + rnd.nextInt(4), "e", 0.0)
    }
    val batch = graft.ext.Sessions.sessionize(
      evts.toDF().withColumn("ts", col("ts_us") * 1000L).drop("ts_us"),
      gapUs = gapUs)
      .select(col("user_id"), col("start_us"), col("end_us"),
        col("n_events"))
      .as[(Long, Long, Long, Long)].collect().toSet

    val src = MemoryStream[Event]
    val q = StreamOps.sessionWindowCounts(src.toDF(), gapUs = gapUs,
        watermark = "1 hour")
      .writeStream.outputMode("append").format("memory").queryName("swin").start()
    try {
      src.addData(evts: _*)
      q.processAllAvailable()
      src.addData(Event(9001, T0 + 100000 * Min, 999, "z", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("swin")
        .as[(Long, Long, Long, Long)].collect()
        .filter(_._1 != 999L).toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming debounce ≡ batch run starts on the same events") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(81)
    val types = Array("a", "b", "c")
    val evts = (1 to 300).map { i =>
      Event(i.toLong, T0 + rnd.nextInt(5 * 60) * Min,
        1 + rnd.nextInt(5), types(rnd.nextInt(3)), 0.0)
    }
    val batch = graft.ext.Sessions.compactRuns(
      evts.toDF().withColumn("ts", col("ts_us") * 1000L).drop("ts_us"))
      .select(col("user_id"), col("start_us"), col("event_type"))
      .as[(Long, Long, String)].collect().toSet

    val src = MemoryStream[Event]
    // idle horizon far beyond the data so no state expires mid-test
    val q = StreamOps.debounceStream(src.toDS(),
        idleUs = 100L * 3600 * 1000000, watermark = "1 hour")
      .writeStream.outputMode("append").format("memory").queryName("deb").start()
    try {
      src.addData(evts: _*)
      q.processAllAvailable()
      val streamed = spark.table("deb")
        .select(col("user_id"), col("ts_us"), col("event_type"))
        .as[(Long, Long, String)].collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("stream-static enrichment joins the broadcast dim per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((10L, "gold"), (20L, "basic")).toDF("user_id", "tier")
    val src = MemoryStream[Event]
    val q = StreamOps.enrichStream(src.toDF(), dim)
      .writeStream.outputMode("append").format("memory").queryName("enr").start()
    try {
      src.addData(Event(1, T0, 10, "a", 1.0), Event(2, T0, 30, "b", 1.0))
      q.processAllAvailable()
      val got = spark.table("enr")
        .select(col("event_id"), col("tier"))
        .as[(Long, Option[String])].collect().toMap
      assert(got === Map(1L -> Some("gold"), 2L -> None))
    } finally q.stop()
  }

  test("streaming source chain: file-drop parquet → same schema as batch") {
    val stream = StreamOps.readEventStream(spark, sf)
    assert(stream.isStreaming)
    assert(stream.schema.fieldNames.contains("ts_us"))
  }

  test("streaming funnel ≡ batch funnel on the same 400 random events") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(1337)
    val types = Seq("view", "click", "purchase", "error")
    val W = 120 * Min // conversion window shorter than the event spread
    val evts = (1 to 400).map { i =>
      Event(i.toLong, T0 + rnd.nextInt(24 * 60) * Min,
        1 + rnd.nextInt(10), types(rnd.nextInt(types.length)),
        rnd.nextInt(100) / 10.0)
    }
    val maxTs = evts.map(_.ts_us).max

    val batch = graft.ext.Sessions.funnel(
      evts.toDF().withColumn("ts", col("ts_us") * 1000L).drop("ts_us"),
      Seq("view", "click", "purchase"), convWindowUs = W)
      .select(col("user_id"), col("t_view"), col("t_click"),
        col("t_purchase"), col("stage_reached"))
      .as[(Long, Option[Long], Option[Long], Option[Long], Long)]
      .collect().toSet

    val src = MemoryStream[Event]
    val q = StreamOps.funnelStream(src.toDS(), convWindowUs = W)
      .writeStream.outputMode("append").format("memory").queryName("feqv").start()
    try {
      // one batch: the operator sorts within a batch, so per-user event-time
      // order (the streaming funnel's delivery precondition) holds
      src.addData(evts: _*)
      q.processAllAvailable()
      src.addData(Event(9001, maxTs + 5000 * Min, 999, "view", 0.0))
      q.processAllAvailable()
      src.addData(Event(9002, maxTs + 9000 * Min, 999, "view", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("feqv").as[StreamOps.FunnelRow]
        .collect().filter(_.user_id != 999)
        .map(r => (r.user_id, r.t_view, r.t_click, r.t_purchase,
          r.stage_reached)).toSet
      assert(streamed === batch)
      assert(batch.exists(_._5 == 3L) && batch.exists(_._5 < 3L),
        "test data should exercise both completed and abandoned funnels")
    } finally q.stop()
  }

  test("streaming trailing distinct ≡ batch interval-explode on random events") {
    implicit val sqlCtx = spark.sqlContext
    val Day = 86400L * 1000000
    val rnd = new scala.util.Random(1331)
    // 12 users over 20 days, sparse — plenty of partial windows
    val evts = (1 to 250).map { i =>
      Event(i.toLong, T0 + rnd.nextInt(20).toLong * Day +
        rnd.nextInt(24 * 60) * Min, 1L + rnd.nextInt(12), "e", 0.0)
    }
    val maxTs = evts.map(_.ts_us).max

    // expected: every covered target day's distinct user count (the
    // streaming form has no active-day filter)
    val expected = evts.toDF()
      .withColumn("day", expr(s"ts_us div $Day"))
      .select(col("user_id"),
        explode(expr("sequence(day, day + 6)")).as("t_day"))
      .distinct()
      .groupBy("t_day").count()
      .as[(Long, Long)].collect().toSet

    val src = MemoryStream[Event]
    val q = StreamOps.trailingDistinctStream(src.toDS().toDF())
      .writeStream.outputMode("append").format("memory").queryName("tdeqv").start()
    try {
      src.addData(evts: _*)
      q.processAllAvailable()
      // push the watermark far past every open day window (twice: set, flush)
      src.addData(Event(9001, maxTs + 40 * Day, 999, "z", 0.0))
      q.processAllAvailable()
      src.addData(Event(9002, maxTs + 80 * Day, 999, "z", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("tdeqv")
        .as[(Long, Long)].collect()
        .filter { case (day, _) => day <= (maxTs / Day) + 6 } // drop flusher rows
        .toSet
      assert(streamed === expected)
    } finally q.stop()
  }

  test("chained stateful ops: streaming daily transition counts ≡ batch") {
    implicit val sqlCtx = spark.sqlContext
    val Day = 86400L * 1000000
    val rnd = new scala.util.Random(515)
    val types = Array("view", "click", "purchase")
    val evts = (1 to 300).map { i =>
      Event(i.toLong, T0 + rnd.nextInt(5).toLong * Day +
        rnd.nextInt(24 * 60) * Min, 1L + rnd.nextInt(8),
        types(rnd.nextInt(3)), 0.0)
    }
    val maxTs = evts.map(_.ts_us).max

    // batch expectation: lead over (user, ts, id), bucketed by the LATER
    // event's day
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val batch = evts.toDF()
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .withColumn("to_ts", lead(col("ts_us"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy((col("to_ts") / lit(Day)).cast("long").as("day"),
        col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("cnt"))
      .as[(Long, String, String, Long)].collect().toSet

    val src = MemoryStream[Event]
    val q = StreamOps.transitionCountsStream(src.toDS())
      .writeStream.outputMode("append").format("memory").queryName("mkvs")
      .start()
    try {
      src.addData(evts: _*)
      q.processAllAvailable()
      src.addData(Event(9001, maxTs + 5 * Day, 999, "flush", 0.0))
      q.processAllAvailable()
      src.addData(Event(9002, maxTs + 10 * Day, 999, "flush", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("mkvs")
        .as[(Long, String, String, Long)].collect()
        .filter(x => x._2 != "flush" && x._3 != "flush").toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming moving anomaly ≡ batch trailing z-score on the same events") {
    implicit val sqlCtx = spark.sqlContext
    val Day = 86400L * 1000000
    val rnd = new scala.util.Random(7177)
    val types = Array("view", "purchase")
    // values on a 0.25 grid: dyadic doubles sum exactly in ANY order, so
    // micro-batch accumulation matches the batch shuffle's sum bit-for-bit
    val evts = (1 to 400).map { i =>
      Event(i.toLong, T0 + rnd.nextInt(15).toLong * Day +
        rnd.nextInt(24 * 60) * Min, 1L, types(rnd.nextInt(2)),
        rnd.nextInt(4000) * 0.25)
    }
    val maxTs = evts.map(_.ts_us).max

    // batch output is ALREADY in AnomDayRow's fixed-point long units
    val batch = graft.ext.Sessions.movingAnomaly(
      evts.toDF().withColumn("ts", col("ts_us") * 1000L).drop("ts_us"))
      .as[(String, Long, Long, Long, Long, Long, Boolean)]
      .collect().toSet

    val src = MemoryStream[Event]
    val q = StreamOps.movingAnomalyStream(src.toDS())
      .writeStream.outputMode("append").format("memory").queryName("anomeqv")
      .start()
    try {
      src.addData(evts: _*)
      q.processAllAvailable()
      src.addData(Event(9001, maxTs + 10 * Day, 999, "flush", 0.0))
      q.processAllAvailable()
      src.addData(Event(9002, maxTs + 20 * Day, 999, "flush", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("anomeqv")
        .as[(String, Long, Long, Long, Long, Long, Boolean)]
        .collect().filter(_._1 != "flush").toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming moving anomaly rounds a .xx5 boundary sum like batch") {
    implicit val sqlCtx = spark.sqlContext
    val Day = 86400L * 1000000
    // 2.675's double sits just BELOW the tie (2.67499…975), but its
    // shortest repr is "2.675": BigDecimal.valueOf (the batch round()
    // path) gives 2.68 where new BigDecimal(double) would give 2.67
    val evts = Seq(
      Event(1, T0, 1L, "tie", 2.675),
      Event(2, T0 + Day, 1L, "tie", 1.0))
    val batch = graft.ext.Sessions.movingAnomaly(
      evts.toDF().withColumn("ts", col("ts_us") * 1000L).drop("ts_us"))
      .select(col("day"), col("revenue_cents"))
      .as[(Long, Long)].collect().toMap
    assert(batch(batch.keys.min) === 268L)

    val src = MemoryStream[Event]
    val q = StreamOps.movingAnomalyStream(src.toDS())
      .writeStream.outputMode("append").format("memory").queryName("anomtie")
      .start()
    try {
      src.addData(evts: _*)
      q.processAllAvailable()
      src.addData(Event(9001, T0 + 20 * Day, 999, "flush", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("anomtie")
        .as[StreamOps.AnomDayRow].collect().filter(_.event_type == "tie")
        .map(r => r.day -> r.revenue_cents).toMap
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming moving anomaly ≡ batch at cents² past the long bound") {
    implicit val sqlCtx = spark.sqlContext
    val Day = 86400L * 1000000
    // ~4.3e9 cents/day: a single day's cents² ≈ 1.85e19 exceeds
    // Long.MaxValue (9.22e18), yet the frame's variance numerator
    // n·Σc² − s1c² = (c1−c2)² = 10000 fits trivially. The old streaming
    // path multiplyExact'd the intermediates and KILLED the query here
    // while the batch DECIMAL(32,4) twin sailed through — inside-envelope
    // inputs must keep the twins identical, not diverge
    val evts = Seq(
      Event(1, T0, 1L, "big", 43000000.0),
      Event(2, T0 + Day, 1L, "big", 43000001.0))
    val batch = graft.ext.Sessions.movingAnomaly(
      evts.toDF().withColumn("ts", col("ts_us") * 1000L).drop("ts_us"))
      .as[(String, Long, Long, Long, Long, Long, Boolean)]
      .collect().toSet
    assert(batch.exists(r => r._3 == 4300000000L), batch.toString)
    assert(batch.exists(r => r._6 == 10000L), batch.toString)

    val src = MemoryStream[Event]
    val q = StreamOps.movingAnomalyStream(src.toDS())
      .writeStream.outputMode("append").format("memory").queryName("anombig")
      .start()
    try {
      src.addData(evts: _*)
      q.processAllAvailable()
      src.addData(Event(9001, T0 + 20 * Day, 999, "flush", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("anombig")
        .as[(String, Long, Long, Long, Long, Long, Boolean)]
        .collect().filter(_._1 != "flush").toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming dialogue audit ≡ batch turnAudit on the same 300 " +
    "random events") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(1555)
    val types = Seq("view", "click", "purchase", "signup", "error")
    // 10 users, ≤1 event per minute slot so (ts, event_id) order is stable
    val evts = (1 to 300).map { i =>
      Event(i.toLong, T0 + rnd.nextInt(12 * 60) * Min,
        1 + rnd.nextInt(10), types(rnd.nextInt(types.length)),
        rnd.nextInt(100).toDouble)
    }
    val maxTs = evts.map(_.ts_us).max
    val budget = 300L

    val batch = graft.ext.Dialogue.turnAudit(
      evts.toDF().withColumn("ts", col("ts_us")),
      col("value").cast("long") + 1L, budget = budget)
      .as[(Long, Long, Long, Boolean, Long, Long)].collect().toSet

    val src = MemoryStream[Event]
    val q = StreamOps.dialogueAuditStream(src.toDS(), budget = budget)
      .writeStream.outputMode("append").format("memory")
      .queryName("dlgeqv").start()
    try {
      src.addData(evts: _*)
      q.processAllAvailable()
      src.addData(Event(9001, maxTs + 5000 * Min, 999, "view", 0.0))
      q.processAllAvailable()
      src.addData(Event(9002, maxTs + 9000 * Min, 999, "view", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("dlgeqv")
        .as[(Long, Long, Long, Boolean, Long, Long)]
        .collect().filter(_._1 != 999L).toSet
      assert(streamed === batch)
      assert(batch.exists(_._3 > 0) && batch.exists(t => t._5 < t._2),
        "test data should exercise violations and truncation")
    } finally q.stop()
  }

  test("streaming tool-call audit ≡ batch toolCallAudit on the same 300 " +
    "random events") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(1666)
    val types = Seq("view", "cart", "purchase", "cart", "click")
    // 10 random users + one scripted clean episode (random balanced
    // conversations are rare at 30 events/user)
    val evts = (1 to 300).map { i =>
      Event(i.toLong, T0 + rnd.nextInt(12 * 60) * Min,
        1 + rnd.nextInt(10), types(rnd.nextInt(types.length)),
        rnd.nextInt(100).toDouble)
    } ++ Seq(
      Event(901L, T0 + 1 * Min, 11L, "cart", 0.0),
      Event(902L, T0 + 2 * Min, 11L, "purchase", 0.0))
    val maxTs = evts.map(_.ts_us).max

    val batch = graft.ext.Dialogue.toolCallAudit(
      evts.toDF().withColumn("ts", col("ts_us")))
      .as[(Long, Long, Long, Long, Long, Boolean)].collect().toSet

    val src = MemoryStream[Event]
    val q = StreamOps.toolCallAuditStream(src.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("tooleqv").start()
    try {
      src.addData(evts: _*)
      q.processAllAvailable()
      src.addData(Event(9001, maxTs + 5000 * Min, 999, "view", 0.0))
      q.processAllAvailable()
      src.addData(Event(9002, maxTs + 9000 * Min, 999, "view", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("tooleqv")
        .as[(Long, Long, Long, Long, Long, Boolean)]
        .collect().filter(_._1 != 999L).toSet
      assert(streamed === batch)
      assert(batch.exists(_._4 > 0) && batch.exists(_._5 > 0) &&
        batch.exists(_._6),
        "test data should exercise orphans, unclosed calls, and clean " +
          "episodes")
    } finally q.stop()
  }

  test("streaming twin survives the RocksDB state store — the " +
    "production state backend, not just the in-memory HDFS provider") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(1777)
    val types = Seq("view", "cart", "purchase", "cart", "click")
    val evts = (1 to 200).map { i =>
      Event(i.toLong, T0 + rnd.nextInt(12 * 60) * Min,
        1 + rnd.nextInt(8), types(rnd.nextInt(types.length)),
        rnd.nextInt(100).toDouble)
    }
    val maxTs = evts.map(_.ts_us).max
    val batch = graft.ext.Dialogue.toolCallAudit(
      evts.toDF().withColumn("ts", col("ts_us")))
      .as[(Long, Long, Long, Long, Long, Boolean)].collect().toSet

    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val src = MemoryStream[Event]
      val q = StreamOps.toolCallAuditStream(src.toDS())
        .writeStream.outputMode("append").format("memory")
        .queryName("rocksdbeqv").start()
      try {
        src.addData(evts: _*)
        q.processAllAvailable()
        src.addData(Event(9001, maxTs + 9000 * Min, 999, "view", 0.0))
        q.processAllAvailable()
        val streamed = spark.table("rocksdbeqv")
          .as[(Long, Long, Long, Long, Long, Boolean)]
          .collect().filter(_._1 != 999L).toSet
        assert(streamed === batch)
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("streaming preference pairs ≡ batch preferencePairs matrix on " +
    "the same 300 random events") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(1777)
    val types = Seq("view", "cart", "purchase", "click", "signup")
    val evts = (1 to 300).map { i =>
      Event(i.toLong, T0 + rnd.nextInt(12 * 60) * Min,
        1 + rnd.nextInt(10), types(rnd.nextInt(types.length)),
        rnd.nextInt(40000) / 100.0)
    } ++ Seq(
      // scripted: chosen-side value tie → smallest event_id must win
      Event(901L, T0 + 1 * Min, 21L, "cart", 350.00),
      Event(902L, T0 + 2 * Min, 21L, "view", 350.00),
      Event(903L, T0 + 3 * Min, 21L, "click", 10.00),
      // scripted: margin below the gate → no pair
      Event(911L, T0 + 1 * Min, 22L, "view", 100.00),
      Event(912L, T0 + 2 * Min, 22L, "cart", 150.00))
    val maxTs = evts.map(_.ts_us).max

    val batch = graft.ext.Dialogue.preferencePairs(evts.toDF())
      .as[(String, String, Long, Long, Long, Long)].collect().toSet

    val src = MemoryStream[Event]
    val q = StreamOps.preferencePairsStream(src.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("prefeqv").start()
    try {
      src.addData(evts: _*)
      q.processAllAvailable()
      src.addData(Event(9001, maxTs + 5000 * Min, 999, "view", 0.0))
      q.processAllAvailable()
      src.addData(Event(9002, maxTs + 9000 * Min, 999, "view", 0.0))
      q.processAllAvailable()
      // per-user pairs → the q216 type matrix
      val streamed = spark.table("prefeqv")
        .as[(Long, String, String, Long)].collect()
        .filter(_._1 != 999L)
        .groupBy(p => (p._2, p._3))
        .map { case ((c, r), ps) =>
          val ms = ps.map(_._4)
          (c, r, ps.size.toLong, ms.sum, ms.min, ms.max)
        }.toSet
      assert(streamed === batch)
      // tie user emitted with the smallest chosen id's type; gated user
      // absent
      val perUser = spark.table("prefeqv")
        .as[(Long, String, String, Long)].collect()
      assert(perUser.find(_._1 == 21L).map(p => (p._2, p._3, p._4))
        .contains(("cart", "click", 34000L)))
      assert(!perUser.exists(_._1 == 22L))
    } finally q.stop()
  }

  test("a straggler far below the watermark is dropped before the " +
    "stateful operator and cannot kill the query (the Spark 4 contract " +
    "the twins rely on; the clamped idle timeout guards residual paths)") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    val q = StreamOps.toolCallAuditStream(src.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("stragglereqv").start()
    try {
      // push the watermark far past T0
      src.addData(Event(1L, T0 + 10000 * Min, 1L, "view", 0.0))
      q.processAllAvailable()
      // straggler at T0 for a NEW group: its lastTs + idleTimeout sits
      // far below the watermark. Spark 4 drops late rows before every
      // stateful operator (the NOTES gotcha), so no state is created;
      // an unclamped setTimeoutTimestamp would throw and terminate the
      // query on any path that DOES deliver such a row — the clamped
      // setIdleTimeout covers those (allowMultiple=false deployments,
      // watermark advancing past a group's lastTs mid-stream)
      src.addData(Event(2L, T0, 42L, "cart", 0.0))
      q.processAllAvailable()
      assert(q.isActive, "query died on the straggler")
      src.addData(Event(3L, T0 + 20000 * Min, 1L, "view", 0.0))
      q.processAllAvailable()
      assert(q.isActive)
      val rows = spark.table("stragglereqv")
        .as[(Long, Long, Long, Long, Long, Boolean)].collect()
      // the dropped straggler never created a group — nothing may emit
      assert(!rows.exists(_._1 == 42L),
        s"dropped straggler grew state: ${rows.toSeq}")
    } finally q.stop()
  }

  test("streaming corpus digest ≡ batch corpusDigest, bit-for-bit, " +
    "across micro-batch boundaries") {
    implicit val sqlCtx = spark.sqlContext
    val docs = (0 until 40).map(i =>
      (i.toLong, s"s${i % 4}", s"document number $i body text"))
    val batch = graft.ext.Curation.corpusDigest(
      docs.toDF("doc_id", "source", "text"))
      .as[(String, Long, Long, Long)].collect().toSet

    val src = MemoryStream[(Long, String, String)]
    val q = StreamOps.corpusDigestStream(
      src.toDS().toDF("doc_id", "source", "text"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("digeqv").start()
    try {
      // the corpus arrives in TWO micro-batches — the commutative sum
      // makes the final stamp independent of the split
      src.addData(docs.take(17): _*)
      q.processAllAvailable()
      val mid = spark.table("digeqv")
        .as[(String, Long, Long, Long)].collect().toSet
      assert(mid == graft.ext.Curation.corpusDigest(
        docs.take(17).toDF("doc_id", "source", "text"))
        .as[(String, Long, Long, Long)].collect().toSet,
        "intermediate stamp must equal the batch digest of the prefix")
      src.addData(docs.drop(17): _*)
      q.processAllAvailable()
      val streamed = spark.table("digeqv")
        .as[(String, Long, Long, Long)].collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("token-bucket twin: per-event admissions aggregate to the batch op, whole and split") {
    implicit val sqlCtx = spark.sqlContext
    // user 7: the Round12OpsSpec trace (6 admitted / 1 rejected);
    // user 8: burst of 6 at one instant (5 admitted, 1 rejected)
    val evs = Seq(
      Event(1, T0, 7, "view", 0.0),
      Event(2, T0 + 100000L, 7, "view", 0.0),
      Event(3, T0 + 100000L, 7, "view", 0.0),
      Event(4, T0 + 100000L, 7, "view", 0.0),
      Event(5, T0 + 100000L, 7, "view", 0.0),
      Event(6, T0 + 100000L, 7, "view", 0.0),
      Event(7, T0 + 3100000L, 7, "view", 0.0)) ++
      (11 to 16).map(i => Event(i.toLong, T0 + 500000L, 8, "view", 0.0))
    val batchDf = evs.toDF()
      .select(col("event_id"), (col("ts_us") * 1000L).as("ts"),
        col("user_id"), col("event_type"), col("value"))
    val batch = graft.ext.Serving.tokenBucket(batchDf)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet

    def run(splits: Seq[Seq[Event]], name: String): Set[(Long, Long, Long, Long)] = {
      val src = MemoryStream[Event]
      val q = StreamOps.tokenBucketStream(src.toDS())
        .writeStream.outputMode("append").format("memory")
        .queryName(name).start()
      try {
        splits.foreach { s => src.addData(s: _*); q.processAllAvailable() }
        spark.table(name)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("admitted"), 1L).otherwise(0L)).as("adm"),
            max(struct(col("ts_us"), col("event_id"), col("level_micro")))
              .as("last"))
          .select(col("user_id"), col("n"), col("adm"),
            col("last.level_micro"))
          .as[(Long, Long, Long, Long)].collect().toSet
      } finally q.stop()
    }

    val expected = batch.map(b => (b._1, b._2, b._3, b._5))
    val whole = run(Seq(evs), "tbwhole")
    assert(whole == expected, "single micro-batch must equal batch op")
    // in-order split mid-stream for BOTH users: state carries the level
    val split = run(Seq(evs.take(4) ++ evs.slice(7, 10),
      evs.slice(4, 7) ++ evs.drop(10)), "tbsplit")
    assert(split == expected, "in-order split must be bit-equal to batch")
  }

  test("token-bucket twin: state expiry after full refill is bit-equal to batch") {
    implicit val sqlCtx = spark.sqlContext
    val Hour = 3600L * 1000000
    // user 7 drains the bucket at T0, goes silent for hours (state expires
    // once the watermark passes lastTs + full-refill = 2.5 s), then returns
    // at T0+3h; user 9's far-future event advances the watermark past the
    // timeout in between. Batch replay clamps the refill at capacity, so
    // expiry-and-reinit must produce the identical admission row.
    val early = (1 to 6).map(i => Event(i.toLong, T0, 7, "view", 0.0))
    val mover = Seq(Event(90, T0 + 2 * Hour, 9, "view", 0.0))
    val ret = Seq(Event(7, T0 + 3 * Hour, 7, "view", 0.0))
    val all = early ++ mover ++ ret
    val batchDf = all.toDF()
      .select(col("event_id"), (col("ts_us") * 1000L).as("ts"),
        col("user_id"), col("event_type"), col("value"))
    val batch = graft.ext.Serving.tokenBucket(batchDf)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
      .map((b: (Long, Long, Long, Long, Long, Long)) =>
        (b._1, b._2, b._3, b._5))

    val src = MemoryStream[Event]
    val q = StreamOps.tokenBucketStream(src.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("tbexpiry").start()
    try {
      src.addData(early: _*); q.processAllAvailable()
      src.addData(mover: _*); q.processAllAvailable()
      // an empty-progress cycle so the timeout fires on the new watermark
      q.processAllAvailable()
      src.addData(ret: _*); q.processAllAvailable()
      val streamed = spark.table("tbexpiry")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("admitted"), 1L).otherwise(0L)).as("adm"),
          max(struct(col("ts_us"), col("event_id"), col("level_micro")))
            .as("last"))
        .select(col("user_id"), col("n"), col("adm"),
          col("last.level_micro"))
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(streamed == batch,
        "expiry + re-init must be bit-equal to the batch replay")
    } finally q.stop()
  }

  test("dedup-gate twin: stream-static band join equals batch new-vs-corpus, whole and split") {
    implicit val sqlCtx = spark.sqlContext
    // the q169 fixture: corpus = docs 0..24, NEW batch = docs 25..49,
    // real testdata text (near-dups exist across the boundary)
    val all = Tables.documents(spark, sf).filter(col("doc_id") < 50)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().sortBy(_._1)
    val corpus = all.filter(_._1 < 25)
    val fresh = all.filter(_._1 >= 25)
    val corpusDf = corpus.toSeq.toDF("doc_id", "text")
    val batch = graft.ext.Dedup.minhashNewVsCorpus(
      fresh.toSeq.toDF("doc_id", "text"), corpusDf,
      k = 16, bands = 4, n = 3, minJaccard = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(batch.nonEmpty, "fixture must have cross-boundary near-dups")

    def run(splits: Seq[Seq[(Long, String)]], name: String) = {
      val src = MemoryStream[(Long, String)]
      val q = StreamOps.dedupGateStream(
        src.toDS().toDF("doc_id", "text"), corpusDf)
        .writeStream.outputMode("append").format("memory")
        .queryName(name).start()
      try {
        splits.foreach { s => src.addData(s: _*); q.processAllAvailable() }
        spark.table(name).as[(Long, Long, Double)].collect()
      } finally q.stop()
    }

    val whole = run(Seq(fresh.toSeq), "gatewhole")
    assert(whole.toSet == batch, "single micro-batch must equal batch op")
    assert(whole.length == whole.toSet.size,
      "band multi-match must not emit duplicate pairs")
    // doc-boundary split: the gate is stateless, so ANY split is bit-equal
    val split = run(Seq(fresh.take(8).toSeq, fresh.slice(8, 17).toSeq,
      fresh.drop(17).toSeq), "gatesplit")
    assert(split.toSet == batch, "split must be bit-equal to batch")
    assert(split.length == split.toSet.size)
  }

  test("dhash-gate twin: perceptual stream-static gate equals batch, whole and split") {
    implicit val sqlCtx = spark.sqlContext
    // planted raster fixture (the Round13OpsSpec texture): stream holds
    // an exact copy (hamming 0), a 1-char edit (≤2), and a row-mirror
    // (far) of a corpus doc
    val base = (0 until 72)
      .map(i => (33 + (i * 53 + (i * i) % 41) % 90).toChar).mkString
    def d(id: Long, t: String) = (id, t, t.length.toLong)
    val corpus = Seq(d(1, base), d(2, base.reverse + "padpadpad"))
      .toDF("doc_id", "text", "n_chars")
    val edited = base.updated(40, '!')
    val fresh = Seq(d(5, base), d(10, edited),
      d(15, base.grouped(9).map(_.reverse).mkString), d(20, "short"))
    val batch = graft.ext.Dedup.dhashNewVsCorpus(
      fresh.toDF("doc_id", "text", "n_chars"), corpus, maxDist = 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(batch.exists(_._3 == 0L), "exact copy must gate at hamming 0")

    def run(splits: Seq[Seq[(Long, String, Long)]], name: String) = {
      val src = MemoryStream[(Long, String, Long)]
      val q = StreamOps.dhashGateStream(
        src.toDS().toDF("doc_id", "text", "n_chars"), corpus, maxDist = 4)
        .writeStream.outputMode("append").format("memory")
        .queryName(name).start()
      try {
        splits.foreach { s => src.addData(s: _*); q.processAllAvailable() }
        spark.table(name).as[(Long, Long, Long)].collect()
      } finally q.stop()
    }
    val whole = run(Seq(fresh), "dgwhole")
    assert(whole.toSet == batch && whole.length == whole.toSet.size)
    val split = run(Seq(fresh.take(2), fresh.drop(2)), "dgsplit")
    assert(split.toSet == batch && split.length == split.toSet.size)
  }

  test("collapse gate twin: online exact-dedup admission equals batch withRep, whole and split") {
    implicit val sqlCtx = spark.sqlContext
    // real documents + PLANTED exact copies under higher ids, delivered in
    // doc_id order (the twin's in-order horizon contract): the running
    // group minimum then equals the batch window minimum on every row
    val base = Tables.documents(spark, sf).filter(col("doc_id") < 30)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().sortBy(_._1)
    val copies = base.filter(_._1 % 3 == 0)
      .flatMap { case (id, t) => Seq((id + 100L, t), (id + 200L, t)) }
    val all = (base ++ copies).sortBy(_._1)
    assert(copies.nonEmpty, "fixture must plant exact copies")

    // batch expectation straight from the operator the twin mirrors
    val batch = ext.ExactCollapse.withRep(
        all.toSeq.toDF("doc_id", "text"), "doc_id",
        Seq(xxhash64(col("text")), col("text")))
      .select(col("doc_id"), col("rep"),
        (col("doc_id") === col("rep")).as("is_first"))
      .as[(Long, Long, Boolean)].collect().toSet
    assert(batch.exists(t => !t._3), "fixture must have non-first copies")

    def run(splits: Seq[Seq[(Long, String)]], name: String) = {
      val src = MemoryStream[(Long, String)]
      val q = StreamOps.collapseGateStream(
        src.toDS().toDF("doc_id", "text"))
        .writeStream.outputMode("append").format("memory")
        .queryName(name).start()
      try {
        splits.foreach { s => src.addData(s: _*); q.processAllAvailable() }
        spark.table(name).as[(Long, Long, Boolean)].collect()
      } finally q.stop()
    }
    val whole = run(Seq(all.toSeq), "cgwhole")
    assert(whole.toSet == batch, "single micro-batch must equal batch withRep")
    assert(whole.length == all.length, "exactly one row per doc")
    // rep state must carry ACROSS micro-batch boundaries: a copy arriving
    // two batches after its original still maps to the standing rep
    val split = run(Seq(all.take(10).toSeq, all.slice(10, 35).toSeq,
      all.drop(35).toSeq), "cgsplit")
    assert(split.toSet == batch, "split must be bit-equal to batch")
    assert(split.length == all.length)
  }

  test("pack twin: online greedy packing equals batch packSequences, whole and split") {
    implicit val sqlCtx = spark.sqlContext
    // real documents fixture, tight budget so every source opens several
    // bins; delivery in doc_id order (the twin's in-order horizon contract)
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 40)
      .select(col("source"), col("doc_id"), col("text"))
      .as[(String, Long, String)].collect().sortBy(_._2)
    val batch = ext.Curation.packSequences(
      docs.toSeq.toDF("source", "doc_id", "text"), budget = 64)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(batch.map(_._4).max > 1, "fixture must open multiple bins")
    assert(batch.exists(_._3 > 64),
      "fixture must contain an oversize doc (own-bin branch)")

    def run(splits: Seq[Seq[(String, Long, String)]], name: String) = {
      val src = MemoryStream[(String, Long, String)]
      val q = StreamOps.packStream(
        src.toDS().toDF("source", "doc_id", "text"), budget = 64)
        .writeStream.outputMode("append").format("memory")
        .queryName(name).start()
      try {
        splits.foreach { s => src.addData(s: _*); q.processAllAvailable() }
        spark.table(name).as[(String, Long, Long, Long, Long)].collect()
      } finally q.stop()
    }
    val whole = run(Seq(docs.toSeq), "packwhole")
    assert(whole.toSet == batch, "single micro-batch must equal batch op")
    assert(whole.length == batch.size, "exactly one row per doc")
    // bin state must carry ACROSS micro-batch boundaries bit-equally
    val split = run(Seq(docs.take(13).toSeq, docs.slice(13, 27).toSeq,
      docs.drop(27).toSeq), "packsplit")
    assert(split.toSet == batch, "split must be bit-equal to batch")
    assert(split.length == batch.size)
  }

  test("kv-cache pager twin: per-turn pages aggregate to the batch op, whole and split") {
    implicit val sqlCtx = spark.sqlContext
    // two conversations with tied timestamps (event_id breaks the tie) and
    // values that exercise the HALF_UP cents rendering (12.345 → "1235")
    val evs = Seq(
      Event(1, T0, 7, "view", 12.345),
      Event(2, T0 + 50000L, 7, "click", 0.0),
      Event(3, T0 + 50000L, 7, "purchase", 199.999),
      Event(4, T0 + 90000L, 7, "view", 3.5),
      Event(11, T0 + 10000L, 8, "checkout_started", 1.005),
      Event(12, T0 + 20000L, 8, "view", 42.0))
    val batchDf = evs.toDF()
      .select(col("event_id"), (col("ts_us") * 1000L).as("ts"),
        col("user_id"), col("event_type"), col("value"))
    val batch = graft.ext.Serving.kvCachePager(batchDf)
      .select("user_id", "n_turns", "peak_ctx", "peak_pages",
        "page_turns", "frag_tokens")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet

    def run(splits: Seq[Seq[Event]], name: String) = {
      val src = MemoryStream[Event]
      val q = StreamOps.kvCachePagerStream(src.toDS())
        .writeStream.outputMode("append").format("memory")
        .queryName(name).start()
      try {
        splits.foreach { s => src.addData(s: _*); q.processAllAvailable() }
        spark.table(name)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_turns"),
            max(col("ctx")).as("peak_ctx"),
            max(col("pages")).as("peak_pages"),
            sum(col("pages")).as("page_turns"),
            sum(col("pages") * 16L - col("ctx")).as("frag_tokens"))
          .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
      } finally q.stop()
    }

    val whole = run(Seq(evs), "kvwhole")
    assert(whole == batch, "single micro-batch must equal the batch op")
    // in-order split mid-conversation for BOTH users: ctx carries across
    val split = run(Seq(evs.take(2) :+ evs(4), Seq(evs(2), evs(3), evs(5))),
      "kvsplit")
    assert(split == batch, "in-order split must be bit-equal to batch")
  }
}
