package graft

import org.apache.spark.sql.functions._

/** Round-11 eval-metrics + systems-audit wave. Oracle hash parity proves
  * the two engines agree; these specs pin INTENT on hand-built fixtures
  * with known closed-form answers (the fimSplit lesson: parity can never
  * catch a bias both sides replicate).
  */
class Round11OpsSpec extends SparkSuite {
  import spark.implicits._

  // ---------------------------------------------------------- group AUC

  test("groupAuc: known rank-sum value incl. the tie branch") {
    // scores 3,2,2,1 with labels +,+,-,-: pairs (3>2),(3>1),(2>1) win,
    // (2=2) ties -> U = 3.5, AUC = 3.5/4 = 0.875, u2 = 7
    val df = Seq(("g", 3L, true), ("g", 2L, true), ("g", 2L, false),
      ("g", 1L, false)).toDF("grp", "s", "l")
    val r = ext.EvalMetrics.groupAuc(df, col("grp"), col("s"), col("l"))
      .as[(String, Long, Long, Long, Double)].collect()
    assert(r.toSeq == Seq(("g", 2L, 2L, 7L, 0.875)))
  }

  test("groupAuc: perfect separation, reversal, and single-class guard") {
    val df = Seq(
      ("perfect", 2L, true), ("perfect", 1L, false),
      ("reversed", 1L, true), ("reversed", 2L, false),
      ("onlypos", 1L, true), ("onlypos", 2L, true))
      .toDF("grp", "s", "l")
    val r = ext.EvalMetrics.groupAuc(df, col("grp"), col("s"), col("l"))
      .as[(String, Long, Long, Long, Double)].collect()
      .map(x => x._1 -> x._5).toMap
    assert(r("perfect") == 1.0)
    assert(r("reversed") == 0.0)
    assert(r("onlypos") == -1.0) // n_neg = 0: AUC undefined
  }

  // --------------------------------------------------- average precision

  test("averagePrecision: closed-form AP with deterministic tie-break") {
    // ranked by score desc, id asc: rel pattern 1,0,1 and n_pos=2
    // AP = (1/1 + 2/3) / 2 = 5/6; ap_num = 1*2520 + 2*840 = 4200
    val df = Seq(("g", 30L, true, 1L), ("g", 20L, false, 2L),
      ("g", 10L, true, 3L)).toDF("grp", "s", "l", "id")
    val r = ext.EvalMetrics.averagePrecision(df, col("grp"), col("s"),
      col("l"), col("id")).as[(String, Long, Long, Long, Double)].collect()
    assert(r.toSeq == Seq(("g", 2L, 2L, 4200L, 4200.0 / 5040.0)))
    assert(math.abs(r(0)._5 - 5.0 / 6.0) < 1e-15)
  }

  test("averagePrecision: tie order is (score desc, tieBreak asc), cutoff at k") {
    // equal scores: id order decides rel pattern 0,1 — the positive
    // lands at rank 2, so ap_num = cum_rel(2)·(2520/2) = 1260 and
    // AP = (1/2)/1 = 0.5 (a rank-1 positive would give 2520/2520 = 1)
    val tied = Seq(("t", 5L, false, 1L), ("t", 5L, true, 2L))
      .toDF("grp", "s", "l", "id")
    val rt = ext.EvalMetrics.averagePrecision(tied, col("grp"), col("s"),
      col("l"), col("id")).as[(String, Long, Long, Long, Double)].collect()
    assert(rt.toSeq == Seq(("t", 1L, 1L, 1260L, 0.5)))
    // positive at rank 11 is outside the cutoff; n_pos still counts it
    // and caps the denominator at min(n_pos, 10)
    val deep = ((1 to 10).map(i => ("d", 100L - i, false, i.toLong)) :+
      (("d", 1L, true, 11L))).toDF("grp", "s", "l", "id")
    val rd = ext.EvalMetrics.averagePrecision(deep, col("grp"), col("s"),
      col("l"), col("id")).as[(String, Long, Long, Long, Double)].collect()
    assert(rd.toSeq == Seq(("d", 1L, 0L, 0L, 0.0)))
  }

  // ------------------------------------------------------- join fanout

  test("fanoutAudit: counts matched/orphan/max/avg on a known graph") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(1L, 1L, 1L, 2L, 4L).toDF("fk")
    val r = ops.Relational.fanoutAudit(parent, col("pk"), child, col("fk"),
      "t").as[(String, Long, Long, Long, Long, Long, Double)].collect()
    assert(r.toSeq == Seq(("t", 3L, 5L, 2L, 1L, 3L, 2.0)))
  }

  test("fanoutAudit: zero-match relationship guards the division") {
    val parent = Seq(1L, 2L).toDF("pk")
    val child = Seq(9L).toDF("fk")
    val r = ops.Relational.fanoutAudit(parent, col("pk"), child, col("fk"),
      "t").as[(String, Long, Long, Long, Long, Long, Double)].collect()
    assert(r.toSeq == Seq(("t", 2L, 1L, 0L, 1L, 0L, -1.0)))
  }

  // ------------------------------------------------------ chat template

  /** Driver-side replay of the q15 position-weighted fingerprint. */
  private def fpOf(s: String): Long = {
    var acc = 0L
    for (i <- 1 to s.length)
      acc += s.charAt(i - 1).toLong * ((i.toLong * 2654435761L) % 1000003L)
    acc % 2147483648L
  }

  test("chatTemplate: exact render in (ts, event_id) order, fp position-sensitive") {
    val ev = Seq((1L, 2L, 11L, "view", 1.5), (1L, 1L, 10L, "click", 2.25))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val expected = "<|sys|>chat\n<|user|>click:225\n<|assistant|>view:150\n"
    val r = ext.Dialogue.chatTemplate(ev)
      .as[(Long, Long, Long, Long)].collect()
    assert(r.toSeq == Seq((1L, 2L, expected.length.toLong, fpOf(expected))))
    // swapping the two turn VALUES permutes rendered bytes — the
    // position weights must see it (the q222 additive-digest lesson)
    val swapped = Seq((1L, 2L, 11L, "click", 2.25), (1L, 1L, 10L, "view", 1.5))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val r2 = ext.Dialogue.chatTemplate(swapped)
      .as[(Long, Long, Long, Long)].collect()
    assert(r2(0)._4 != r(0)._4)
  }

  // ------------------------------------------------------- prefix cache

  test("prefixCacheAudit: full reuse while history fits, zero once the window slides or resets") {
    // M = 3; one user, 4 plain turns then a reset and 1 more:
    //  rk1 shared 0 | rk2 shares 1 piece | rk3 shares 2 | rk4 SLIDES -> 0
    //  reset starts segment 2: its first request shares 0
    val ev = Seq(
      (7L, 1L, 1L, "view", 0.0), (7L, 2L, 2L, "view", 0.0),
      (7L, 3L, 3L, "error", 0.0), (7L, 4L, 4L, "view", 0.0),
      (7L, 5L, 5L, "signup", 0.0))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    // pieces: view:1(6) view:2(6) error:3(7) view:4(6) | signup:5(8)
    // prompt_chars per request: 6, 12, 19, 19(slid [p2,p3,p4]), 8 = 64
    // shared_chars: 0, 6, 12, 0, 0 = 18
    val r = ext.Dialogue.prefixCacheAudit(ev, contextPieces = 3)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    val (uid, nReq, nSeg, sp, pp, sc, pc, ppm) = r(0)
    assert((uid, nReq, nSeg) == ((7L, 5L, 2L)))
    assert(sp == 3L) // 0 + 1 + 2 + 0(slide) + 0(new segment)
    assert(pp == 1L + 2L + 3L + 3L + 1L)
    assert(sc == 18L)
    assert(pc == 64L)
    assert(ppm == 18L * 1000000L / 64L)
  }

  // ----------------------------------------------------- markdown audit

  test("markdownAudit: construct counts on handwritten markdown") {
    val docs = Seq(
      ("s", "# h\n## hh\nplain\n```\nx\n```\n- a\n- b\n[l](u) and [m](v)"),
      // near-misses: 7 hashes is not a heading, '-item' is not a list
      // item, a lone fence never closes (floors to 0 blocks), [] keeps
      // matching with empty text
      ("t", "####### deep\n-item\n```\n[](u)"))
      .toDF("source", "md")
    val r = ext.Html.markdownAudit(docs, col("md"))
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1)
    // (source, n_docs, md_chars, n_lines, headings, fences, items, links)
    assert(r(0) == (("s", 1L, 51L, 9L, 2L, 1L, 2L, 2L)))
    assert(r(1) == (("t", 1L, 28L, 4L, 0L, 0L, 0L, 1L)))
  }
}
