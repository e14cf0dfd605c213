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

  // -------------------------------------------------- watermark detect

  /** Driver-side mix40 replay (constants pinned in functions.Hashing). */
  private def mix40Of(x: Long): Long = {
    val h1 = java.lang.Math.floorMod(x * 2654435761L + 1013904223L, 1L << 40)
    val h2 = h1 ^ (h1 >> 20)
    val h3 = java.lang.Math.floorMod((h2 % (1L << 32)) * 1540483477L + 99991L,
      1L << 40)
    h3 ^ (h3 >> 17)
  }

  test("watermarkDetect: bigram green counts match the driver replay; planted run fires z>4") {
    val wm = ("wm " * 20).trim // 19 all-green (wm,wm) pairs
    val docs = Seq((1L, "key agg row scan"), (2L, wm), (3L, "solo"))
      .toDF("doc_id", "text")
    val r = ext.TextStats.watermarkDetect(docs, col("text"))
      .as[(Long, Long, Long, Double, Boolean)].collect().sortBy(_._1)
    val expGreen1 = Seq("key|agg", "agg|row", "row|scan")
      .count(p => mix40Of(fpOf(p)) % 2 == 0).toLong
    assert(r(0)._2 == 3L && r(0)._3 == expGreen1 && !r(0)._5)
    // all 19 pairs green: z = (38-19)/sqrt(19) = sqrt(19) > 4
    assert(r(1) == ((2L, 19L, 19L, 19.0 / math.sqrt(19.0), true)))
    // single-token doc: zero pairs, z defined as 0, not detected
    assert(r(2) == ((3L, 0L, 0L, 0.0, false)))
  }

  // --------------------------------------------- speculative acceptance

  test("speculativeAcceptance: mismatch at p accepts p-1; past-the-end accepts all") {
    val docs = Seq((1L, "s", "a b c"), (2L, "s", "a b c"))
      .toDF("doc_id", "source", "text")
    // doc 1 -> p=2 (accept 1), doc 2 -> p=5 > T=3 (accept 3, full)
    val p = when(col("doc_id") === 1L, 2L).otherwise(5L)
    val r = ext.EvalMetrics.speculativeAcceptance(docs, col("text"), p)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(r.toSeq == Seq(("s", 2L, 6L, 4L, 1L, 4L * 1000000L / 6L)))
  }

  // ------------------------------------------------- Krippendorff alpha

  test("krippendorffAlpha: closed-form 4/9 case, unit drop, degenerate guards") {
    // u1 [1,1], u2 [2,2], u3 [1,2]: D_o = 1/3, D_e = 3/5, alpha = 4/9
    // u4 has ONE vote -> dropped entirely (not in n_units/n_votes)
    val votes = Seq((1L, "x", 1L), (1L, "y", 1L), (2L, "x", 2L),
      (2L, "y", 2L), (3L, "x", 1L), (3L, "y", 2L), (4L, "x", 3L))
      .toDF("item_id", "annotator", "label")
    val r = ext.Labeling.krippendorffAlpha(votes)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(r(0)._1 == 3L && r(0)._2 == 6L)
    assert(math.abs(r(0)._5 - 4.0 / 9.0) < 1e-15)
    // one observed category: D_e = 0, alpha undefined -> -1.0
    val same = Seq((1L, "x", 1L), (1L, "y", 1L))
      .toDF("item_id", "annotator", "label")
    assert(ext.Labeling.krippendorffAlpha(same)
      .as[(Long, Long, Long, Long, Double)].collect()(0)._5 == -1.0)
    // a panel wider than 9 nulls the lcm factor -> NULL alpha, loud
    val wide = (1 to 10).map(i => (1L, s"a$i", (i % 2).toLong)) ++
      Seq((2L, "a1", 0L), (2L, "a2", 1L))
    val rw = ext.Labeling.krippendorffAlpha(
      wide.toDF("item_id", "annotator", "label"))
      .select(col("alpha")).collect()
    assert(rw(0).isNullAt(0))
  }

  // ---------------------------------------------------- group advantage

  test("groupAdvantage: exact z extremes and the degenerate zero-variance flag") {
    // g1 rewards 0,0,1,1: mean 1/2, varN = 4*2-4 = 4,
    //   z(1) = (4-2)/2 = 1, z(0) = (0*4-2)/2 = -1
    // g2 rewards 1,1: degenerate -> advantages pinned 0
    val df = Seq(("g1", 0L), ("g1", 0L), ("g1", 1L), ("g1", 1L),
      ("g2", 1L), ("g2", 1L)).toDF("grp", "r")
    val r = ext.EvalMetrics.groupAdvantage(df, Seq("grp"), col("r"))
      .as[(String, Long, Long, Long, Boolean, Double, Double)]
      .collect().sortBy(_._1)
    assert(r(0) == (("g1", 4L, 2L, 4L, false, 1.0, -1.0)))
    assert(r(1) == (("g2", 2L, 2L, 0L, true, 0.0, 0.0)))
  }

  // ------------------------------------------------- near-dup clusters

  test("nearDupClusters: histogram covers the whole slice incl. singletons") {
    // 0-1-2 chain into one 3-cluster (0~1, 1~2 near-dup; 0~2 only
    // transitively), 3 is an exact dup pair with 4, 5 is a singleton
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (0L, base + " aaaa"), (1L, base + " aaab"), (2L, base + " aabb"),
      (3L, "completely different text body here xyz"),
      (4L, "completely different text body here xyz"),
      (5L, "nothing like anything else whatsoever qqq"))
      .toDF("doc_id", "text")
    val r = ext.Dedup.nearDupClusters(docs, k = 16, bands = 4, n = 3,
      minJaccard = 0.5)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // sizes: one 1-cluster, one 2-cluster, one 3-cluster
    assert(r.toSeq == Seq((1L, 1L, 1L, 0L), (2L, 1L, 2L, 1L),
      (3L, 1L, 3L, 2L)))
    assert(r.map(_._3).sum == 6L) // Σ n_docs = whole input
  }
}
