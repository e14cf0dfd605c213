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
}
