package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking-quality metrics for model evaluation over scored item sets:
  * per-group AUC from the exact rank-sum form and average precision at a
  * fixed cutoff. These are the offline metrics a quality-classifier or
  * retrieval pipeline reports before its scores gate training data
  * (reference tie-in: `Test/accuracy.ipynb` grades one prediction source
  * against ground truth; AUC/AP are the threshold-free versions of that
  * grading for a score-emitting model).
  *
  * Parity discipline (the kappa/q176 exact-fraction form): every
  * sufficient statistic is an exact integer — the Mann–Whitney
  * tie-corrected doubled U statistic for AUC, an lcm(1..K)-cleared
  * integer numerator for AP — and the metric itself is ONE raw IEEE
  * division of those integers (the div1 audit class), bit-identical on
  * any engine. No ranks are materialized for AUC: the rank-sum collapses
  * to counts per distinct score value, so ties need no averaging pass.
  *
  * Scale shape: AUC is a hash aggregation at (group, score) grain, a
  * window over the per-group DISTINCT-score frame (bounded by the score
  * domain, not the row count), and a group-grain rollup. AP is one
  * per-group window sort with an early rank cutoff. Long envelope: the
  * doubled U is ≤ 2·n_pos·n_neg, exact through ~3e9 rows per group —
  * beyond that, compute per-stratum and pool, or lift u2 to DECIMAL(38,0).
  */
object EvalMetrics {

  /** Per-group AUC via the tie-corrected rank-sum identity.
    *
    * AUC = [#{(p,n): s_p > s_n} + ½·#{s_p = s_n}] / (n_pos·n_neg).
    * Grouping rows by distinct score value (pc/nc = positive/negative
    * counts at that score, below_neg = negatives at strictly lower
    * scores) gives the doubled numerator exactly:
    * `u2 = Σ_scores pc·(2·below_neg + nc)`.
    *
    * Output: group, n_pos, n_neg, u2 (exact doubled numerator), auc —
    * the one IEEE division u2 / (2·n_pos·n_neg), or -1.0 when the group
    * is single-class (AUC undefined).
    */
  def groupAuc(items: DataFrame, group: Column, score: Column,
               positive: Column): DataFrame = {
    val base = items.select(group.as("grp"), score.cast("long").as("score"),
      when(positive, lit(1L)).otherwise(lit(0L)).as("pos"))
    val byScore = base.groupBy(col("grp"), col("score"))
      .agg(sum(col("pos")).as("pc"), sum(lit(1L) - col("pos")).as("nc"))
    val below = Window.partitionBy(col("grp")).orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, -1)
    byScore
      .withColumn("below_neg", coalesce(sum(col("nc")).over(below), lit(0L)))
      .groupBy(col("grp"))
      .agg(sum(col("pc")).as("n_pos"), sum(col("nc")).as("n_neg"),
        sum(col("pc") * (col("below_neg") * 2 + col("nc"))).as("u2"))
      .select(col("grp"), col("n_pos"), col("n_neg"), col("u2"),
        when(col("n_pos") === 0 || col("n_neg") === 0, lit(-1.0))
          .otherwise(col("u2").cast("double") /
            (col("n_pos") * col("n_neg") * 2).cast("double")).as("auc"))
  }

  /** Per-group average precision at cutoff `k` (k ≤ 10 so that
    * lcm(1..10) = 2520 clears every per-rank denominator to an integer —
    * the q204 lcm discipline).
    *
    * Ranking is score DESC with `tieBreak` ASC (deterministic; no engine
    * ordering leaks). With cum_rel(r) the running count of relevant items
    * through rank r, `ap_num = Σ_{r≤k, rel(r)} cum_rel(r)·(2520/r)` is an
    * exact integer and AP@k = ap_num / (2520·min(n_pos, k)) is one IEEE
    * division. Emits -1.0 when the group has no positives at all.
    *
    * Output: group, n_pos (whole group), pos_at_k, ap_num, ap.
    */
  def averagePrecision(items: DataFrame, group: Column, score: Column,
                       positive: Column, tieBreak: Column,
                       k: Int = 10): DataFrame = {
    require(k >= 1 && k <= 10, s"k must be in [1,10] for exact lcm clearing, got $k")
    val base = items.select(group.as("grp"), score.cast("long").as("score"),
      when(positive, lit(1L)).otherwise(lit(0L)).as("rel"),
      tieBreak.as("tb"))
    val order = Window.partitionBy(col("grp"))
      .orderBy(col("score").desc, col("tb"))
    val run = order.rowsBetween(Window.unboundedPreceding, 0)
    val whole = Window.partitionBy(col("grp"))
    val ranked = base
      .withColumn("r", row_number().over(order).cast("long"))
      .withColumn("cum_rel", sum(col("rel")).over(run))
      .withColumn("n_pos", sum(col("rel")).over(whole))
    ranked.filter(col("r") <= k)
      .groupBy(col("grp"))
      .agg(max(col("n_pos")).as("n_pos"),
        sum(col("rel")).as("pos_at_k"),
        sum(when(col("rel") === 1L,
          col("cum_rel") * expr("2520 div r"))
          .otherwise(lit(0L))).as("ap_num"))
      .select(col("grp"), col("n_pos"), col("pos_at_k"), col("ap_num"),
        when(col("n_pos") === 0, lit(-1.0))
          .otherwise(col("ap_num").cast("double") /
            (least(col("n_pos"), lit(k.toLong)) * 2520L).cast("double"))
          .as("ap"))
  }

  /** Speculative-decoding acceptance audit: given per-document target
    * token sequences and a draft that diverges at `corruptAt` (1-based;
    * past-the-end means the draft matches fully), the accepted length is
    * the shared prefix — the number of draft tokens a verifier keeps per
    * round, the single statistic that decides whether speculative
    * decoding pays. The prefix scan is GENERIC (zip_with null-safe
    * equality, first mismatch); the oracle derives the expected value
    * analytically (`least(p − 1, T)`), so the sides prove each other by
    * different methods (the q239 discipline).
    *
    * Scale shape: pure per-row array work (draft synthesis + prefix
    * scan are O(T) lambdas) then one source-grain hash aggregation.
    *
    * @return source, n_docs, target_toks, accept_toks,
    *         full_accept_docs, accept_ppm
    */
  def speculativeAcceptance(docs: DataFrame, text: Column,
                            corruptAt: Column): DataFrame = {
    val mismatch =
      expr("array_position(zip_with(draft, target, (x, y) -> x <=> y), false)")
    docs
      .select(col("doc_id"), col("source"), split(text, " ").as("target"),
        corruptAt.cast("long").as("p"))
      .withColumn("draft",
        expr("transform(target, (t, i) -> CASE WHEN i + 1 = p THEN 'X' ELSE t END)"))
      .withColumn("accept_len",
        when(mismatch === 0, size(col("target")).cast("long"))
          .otherwise(mismatch - 1))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(col("target")).cast("long")).as("target_toks"),
        sum(col("accept_len")).as("accept_toks"),
        sum(when(col("accept_len") === size(col("target")).cast("long"),
          1L).otherwise(0L)).as("full_accept_docs"))
      .withColumn("accept_ppm",
        expr("accept_toks * 1000000 div target_toks"))
  }

  /** Group-relative advantage readout (the GRPO/RLVR normalization): per
    * prompt group, rewards are centered and scaled by the group's own
    * mean and (population) standard deviation — the advantage signal a
    * group-relative policy update consumes. The audit a training run
    * needs BEFORE consuming it: per-group reward mass, the exact
    * variance numerator, the extreme standardized advantages, and the
    * degenerate flag (zero variance — all rewards equal, e.g. a binary
    * verifier that never disagrees within the group — contributes zero
    * gradient and should be resampled, not trained on).
    *
    * Exactness: with integer rewards r, z(r) = (r−μ)/σ =
    * (n·r − Σr)/√(n·Σr² − (Σr)²) — exact integer numerator and variance
    * numerator, one IEEE sqrt + one division (chain class). Long
    * envelope: n·Σr² ≤ 9.2e18 ⇒ |r| ≤ ~1e6 at 1e6-row groups.
    *
    * Scale shape: one hash aggregation at group grain with partial
    * aggregation; output cardinality = |groups|.
    *
    * @return groupCols…, n, sum_r, var_num, degenerate, max_adv, min_adv
    */
  /** [[groupAdvantage]] instantiated on the events fixture: prompt
    * groups are (user, day-of-week) units (the q230 battle grain),
    * reward is the binary verifier `cents > 1000` — the RLVR shape
    * where the degenerate all-same-reward branch is demonstrably live
    * (198 of 1049 groups at sf0.01, measured at design time).
    */
  def grpoAudit(events: DataFrame): DataFrame = {
    val DayUs = 86400000000L
    val cents = (round(col("value"), 2).cast("decimal(18,2)") * 100)
      .cast("long")
    val base = Sessions.withTsUs(events)
      .withColumn("dow", pmod(Sessions.floorDiv(col("ts_us"), DayUs),
        lit(7L)))
      .withColumn("reward", when(cents > 1000L, 1L).otherwise(0L))
    groupAdvantage(base, Seq("user_id", "dow"), col("reward"))
  }

  /** Expected calibration error over equal-width confidence deciles —
    * the reliability audit a classifier gets before its scores gate
    * anything (Naeini et al. 2015's binned ECE, public literature).
    * `confMicro` is a confidence in micro-units [0, 1e6]; rows land in
    * bins of width 100000 (confidence 1.0 folds into the top bin).
    *
    * Exactness: per (group, bin) the sufficient statistics are exact
    * integers (n, positives, Σconf_micro); the per-bin gap
    * |acc_b − conf̄_b| clears denominators as
    * `gap_num_b = |pos_b·10⁶ − Σconf_b|` (micro·count units), so
    * `ece_num = Σ_b gap_num_b` is an exact integer and
    * ECE = ece_num / (N·10⁶) is ONE IEEE division (div1 class). The
    * worst bin is reported the same way. Long envelope: Σconf ≤ n·10⁶ —
    * exact through ~9e12 rows per group.
    *
    * Scale shape: two hash aggregations ((group, bin) then group) with
    * map-side partials; output cardinality = |groups|. No window, no
    * sort — the plan is scan-shaped.
    *
    * The worst bin is the largest UNNORMALIZED gap (mass-weighted —
    * the bin contributing most to ECE), argmax'd engine-neutrally by
    * packing `gap_num·16 + bin` into one BIGINT max (ties break to the
    * higher bin on both engines; envelope N ≤ ~5e11 rows per group).
    *
    * @return group, n, n_bins, ece_num, ece, worst_bin, worst_gap_num
    */
  def eceCalibration(rows: DataFrame, group: Column, confMicro: Column,
                     positive: Column): DataFrame = {
    // clamp to the documented [0, 1e6] domain INSIDE the operator: a
    // negative conf would otherwise produce a negative bin (Spark's % keeps
    // the sign) and silently corrupt the gap_num*16+bin packed argmax —
    // clamping makes out-of-domain inputs saturate instead of corrupting;
    // in-domain inputs (every current caller pre-clamps) are unchanged.
    // NULL-guarded: greatest/least SKIP nulls, so a bare clamp would turn
    // a missing confidence into full confidence 1e6 — NULL must stay NULL
    // (excluded from the sums) exactly as before the clamp
    val confL = confMicro.cast("long")
    val base = rows.select(group.as("grp"),
      when(confL.isNotNull,
        greatest(lit(0L), least(lit(1000000L), confL))).as("conf"),
      when(positive, lit(1L)).otherwise(lit(0L)).as("pos"))
    val binned = base
      .withColumn("bin", least(expr("conf div 100000"), lit(9L)))
      .groupBy(col("grp"), col("bin"))
      .agg(count(lit(1)).as("nb"), sum(col("pos")).as("pb"),
        sum(col("conf")).as("sc"))
      .withColumn("gap_num", abs(col("pb") * 1000000L - col("sc")))
    binned.groupBy(col("grp"))
      .agg(sum(col("nb")).as("n"), count(lit(1)).as("n_bins"),
        sum(col("gap_num")).as("ece_num"),
        max(col("gap_num") * 16L + col("bin")).as("worst_pack"))
      .select(col("grp"), col("n"), col("n_bins"), col("ece_num"),
        (col("ece_num").cast("double") /
          (col("n") * 1000000L).cast("double")).as("ece"),
        (col("worst_pack") % 16L).as("worst_bin"),
        expr("worst_pack div 16").as("worst_gap_num"))
  }

  def groupAdvantage(rewards: DataFrame, groupCols: Seq[String],
                     reward: Column): DataFrame = {
    val agg = rewards.withColumn("__r", reward.cast("long"))
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col("__r")).as("sum_r"),
        sum(col("__r") * col("__r")).as("s2"),
        max(col("__r")).as("rmax"), min(col("__r")).as("rmin"))
      .withColumn("var_num",
        col("n") * col("s2") - col("sum_r") * col("sum_r"))
      .withColumn("degenerate", col("var_num") === 0)
    agg.select(groupCols.map(col) ++ Seq(col("n"), col("sum_r"),
      col("var_num"), col("degenerate"),
      when(col("degenerate"), lit(0.0))
        .otherwise((col("n") * col("rmax") - col("sum_r")).cast("double") /
          sqrt(col("var_num").cast("double"))).as("max_adv"),
      when(col("degenerate"), lit(0.0))
        .otherwise((col("n") * col("rmin") - col("sum_r")).cast("double") /
          sqrt(col("var_num").cast("double"))).as("min_adv")): _*)
  }
}
