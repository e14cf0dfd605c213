package graft

import org.apache.spark.sql.functions._

/** Round-12 serving-capacity + monitoring + selection wave. Oracle hash
  * parity proves the engines agree; these specs pin INTENT on closed-form
  * fixtures (the fimSplit lesson: parity can't catch a bias both sides
  * replicate).
  */
class Round12OpsSpec extends SparkSuite {
  import spark.implicits._

  private def ev(rows: Seq[(Long, Long, Long, String, Double)]) =
    rows.map { case (id, us, u, t, v) => (id, us * 1000L, u, t, v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")

  // -------------------------------------------------------------- ECE

  test("eceCalibration: exact bin gaps, top-bin fold, packed worst argmax") {
    // bins: b0 (conf .05, neg) gap 50000; b1 (conf .15, pos) gap 850000;
    // b9 {conf .95 pos, conf 1.0 neg} gap |1e6 - 1950000| = 950000
    val rows = Seq(("g", 50000L, false), ("g", 150000L, true),
      ("g", 950000L, true), ("g", 1000000L, false))
      .toDF("grp", "conf", "pos")
    val r = ext.EvalMetrics.eceCalibration(rows, col("grp"), col("conf"),
      col("pos")).as[(String, Long, Long, Long, Double, Long, Long)]
      .collect()
    assert(r.toSeq == Seq(("g", 4L, 3L, 1850000L, 1850000.0 / 4000000.0,
      9L, 950000L)))
  }

  test("eceCalibration: perfectly calibrated bin contributes zero gap") {
    // bin 5: two rows conf 550000, one positive -> acc .5 = mean conf .55?
    // no: gap = |1*1e6 - 1100000| = 100000. True zero: conf 500000 twice,
    // one positive -> |1000000 - 1000000| = 0
    val rows = Seq(("g", 500000L, true), ("g", 500000L, false))
      .toDF("grp", "conf", "pos")
    val r = ext.EvalMetrics.eceCalibration(rows, col("grp"), col("conf"),
      col("pos")).as[(String, Long, Long, Long, Double, Long, Long)]
      .collect()
    assert(r.toSeq == Seq(("g", 2L, 1L, 0L, 0.0, 5L, 0L)))
  }

  // ------------------------------------------------------ KV-cache pager

  test("kvCachePager: ceil-div pages, fragmentation at every turn-hold") {
    // user 1: pieces 'view:150\n' (9 chars), 'click:225\n' (10) ->
    // ctx 9, 19; pages 1, 2; frag (16-9)+(32-19) = 20; page_turns 3
    val events = ev(Seq((10L, 1L, 1L, "view", 1.5),
      (11L, 2L, 1L, "click", 2.25)))
    val r = ext.Serving.kvCachePager(events)
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect()
    assert(r.toSeq == Seq((1L, 2L, 19L, 2L, 3L, 20L,
      20000000.0 / 48.0)))
  }

  test("kvCachePager: exact page boundary wastes nothing") {
    // 'ab:100\n' = 2+1+3+1 = 7... use event_type sized so ctx hits 16:
    // 'abcdefghijk:100\n' = 11+1+3+1 = 16 -> pages 1, frag 0
    val events = ev(Seq((1L, 1L, 7L, "abcdefghijk", 1.0)))
    val r = ext.Serving.kvCachePager(events)
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect()
    assert(r.toSeq == Seq((7L, 1L, 16L, 1L, 1L, 0L, 0.0)))
  }

  // ------------------------------------------------------------- CUSUM

  test("cusumDaily: closed form equals the sequential max-clamp replay; alarm fires on the shift") {
    // days 0..3, counts 2,2,2,8: N=4 T=14, a = 16x-70
    // P: -38,-76,-114,-56; S = P - min(0,minP): 0,0,0,58; h = 4T = 56
    val DayUs = 86400000000L
    val rows = Seq.tabulate(4) { d =>
      val n = if (d == 3) 8 else 2
      (1 to n).map(i => ((d * 10 + i).toLong, d * DayUs + i, 1L, "view", 0.0))
    }.flatten
    val r = ext.Sessions.cusumDaily(ev(rows))
      .orderBy("day")
      .as[(Long, Long, Long, Long, Long, Long, Boolean)].collect()
    assert(r.map(x => (x._1, x._2, x._6, x._7)).toSeq == Seq(
      (0L, 2L, 0L, false), (1L, 2L, 0L, false),
      (2L, 2L, 0L, false), (3L, 8L, 58L, true)))
    // sequential replay of S_d = max(0, S_{d-1} + a_d) on the same series
    val a = Seq(2L, 2L, 2L, 8L).map(x => 16 * x - 70)
    val s = a.scanLeft(0L)((acc, x) => math.max(0L, acc + x)).tail
    assert(r.map(_._6).toSeq == s)
  }

  // -------------------------------------------------------- readability

  test("readability: exact counts and both scores on a known sentence pair") {
    // "Hello world. It is." -> 2 sentences, 4 words, 5 vowel runs
    val docs = Seq(("s", "Hello world. It is.")).toDF("source", "text")
    val r = ext.TextStats.readability(docs, col("text"))
      .as[(String, Long, Long, Long, Long, Double, Double)].collect()
    val (_, nd, ns, nw, ny, fl, fk) = r(0)
    assert((nd, ns, nw, ny) == ((1L, 2L, 4L, 5L)))
    assert(math.abs(fl - (206.835 - 1.015 * 2.0 - 84.6 * 1.25)) < 1e-12)
    assert(math.abs(fk - (0.39 * 2.0 + 11.8 * 1.25 - 15.59)) < 1e-12)
  }

  test("readability: fragment with no terminator counts one sentence; blank text zero words -> NULL scores") {
    val docs = Seq(("a", "just a fragment"), ("b", "   "))
      .toDF("source", "text")
    val r = ext.TextStats.readability(docs, col("text"))
      .collect().map(x => x.getString(0) ->
        ((x.getLong(2), x.getLong(3), x.isNullAt(5)))).toMap
    assert(r("a") == ((1L, 3L, false)))
    assert(r("b") == ((1L, 0L, true)))
  }

  // ------------------------------------------------------- token bucket

  test("tokenBucket: replayed fold matches the hand-traced bucket") {
    // C=5, r=2/s, cost=1; one user at ts_us:
    //  t0: full 5 -> admit, 4.0
    //  t0+0.1s: +0.2 -> 4.2 admit -> 3.2
    //  same ts (dt 0): 3.2 admit -> 2.2 ; 2.2 -> 1.2 ; 1.2 -> 0.2
    //  dt 0: 0.2 < 1 -> REJECT (level keeps 0.2)
    //  +3s: +6 clamps to 5 -> admit -> 4.0
    val base = 1000000L
    val events = ev(Seq(
      (1L, base, 9L, "view", 0.0),
      (2L, base + 100000L, 9L, "view", 0.0),
      (3L, base + 100000L, 9L, "view", 0.0),
      (4L, base + 100000L, 9L, "view", 0.0),
      (5L, base + 100000L, 9L, "view", 0.0),
      (6L, base + 100000L, 9L, "view", 0.0),
      (7L, base + 3100000L, 9L, "view", 0.0)))
    val r = ext.Serving.tokenBucket(events)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(r.toSeq == Seq((9L, 7L, 6L, 1L, 4000000L, 857142L)))
  }

  test("tokenBucket: burst exhausts the bucket, refill readmits") {
    // 7 back-to-back events at one instant: first 5 admitted (C=5),
    // 2 rejected; then one event 1s later: +2 tokens -> admit
    val events = ev((1 to 7).map(i =>
      (i.toLong, 5000000L, 3L, "view", 0.0)) :+
      (8L, 6000000L, 3L, "view", 0.0))
    val r = ext.Serving.tokenBucket(events)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(r.toSeq == Seq((3L, 8L, 6L, 2L, 1000000L, 750000L)))
  }

  // --------------------------------------------------- freq-ratio score

  test("freqRatioScore: exact cross-rate evidence on a 2-doc vocabulary") {
    // target doc: x x y ; raw doc: x z
    // ct/cr: x 2/1, y 1/0, z 0/1 ; Nt=3 Nr=2
    // evidence: x = 2*2-1*3 = 1 ; y = 1*2 = 2 ; z = -3
    // doc scores: target 1+1+2 = 4 ; raw 1-3 = -2
    val docs = Seq((1L, "s", true, "x x y"), (2L, "s", false, "x z"))
      .toDF("doc_id", "source", "t", "text")
    val r = ext.TextStats.freqRatioScore(docs, col("text"), col("t"))
      .as[(String, Long, Long, Long, Long, Double)].collect()
    assert(r.toSeq == Seq(("s", 2L, 1L, 1L, 2L, 1.0)))
  }

  test("freqRatioScore: a shared-vocabulary corpus scores target-exclusive tokens positive") {
    val docs = Seq((1L, "s", true, "common rare"), (2L, "s", false, "common"))
      .toDF("doc_id", "source", "t", "text")
    // ct/cr: common 1/1, rare 1/0; Nt=2 Nr=1
    // evidence: common = 1*1-1*2 = -1 ; rare = 1*1-0 = 1
    // target doc: -1+1 = 0 (not > 0) ; raw doc: -1
    val r = ext.TextStats.freqRatioScore(docs, col("text"), col("t"))
      .as[(String, Long, Long, Long, Long, Double)].collect()
    assert(r.toSeq == Seq(("s", 2L, 1L, 0L, -1L, -0.5)))
  }
}
