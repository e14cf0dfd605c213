package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Conversation / chat-transcript operators — the validation a dialogue
  * fine-tuning pipeline runs before transcripts become training examples
  * (round 10; joins the curation family):
  *
  *  - role-alternation audit: chat templates require user/assistant turns
  *    to alternate and the first turn to be a user turn; violations
  *    (double-sends, assistant-first logs) are the rows a template
  *    renderer either repairs or drops.
  *  - context-window truncation: a transcript is kept only up to the
  *    token budget; because per-message token counts are positive, the
  *    kept set is the maximal PREFIX whose cumulative count fits — the
  *    same prefix rule a tokenizer-side packer applies.
  *
  * Scale shape: one shuffle on the conversation key, then lag / running
  * sum / row_number share the single per-conversation sort; the result is
  * conversation-grain. No self-joins, no driver-side state. At 100 TB the
  * conversation key is the partition key end to end, so the audit
  * pipelines with any other per-conversation pass for free.
  */
object Dialogue {

  /** Per-conversation audit over an event log viewed as a message stream:
    * conversation = `user_id`, message order = (ts, event_id), role from
    * the event type (`userTypes` → "user", everything else "assistant"),
    * token proxy = `toks`.
    *
    * @return one row per conversation: user_id, n_msgs,
    *         n_role_violations (adjacent same-role pairs),
    *         starts_with_user, kept_msgs / kept_toks (maximal prefix with
    *         cumulative toks ≤ budget)
    */
  def turnAudit(events: DataFrame, toks: Column, budget: Long,
                userTypes: Seq[String] = Seq("click", "purchase", "signup"))
      : DataFrame = {
    val role = when(col("event_type").isin(userTypes.map(x => x: Any): _*),
      "user").otherwise("assistant")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"),
        role.as("role"), toks.cast("long").as("toks"))
      .withColumn("prev_role", lag(col("role"), 1).over(w))
      .withColumn("cum_toks", sum(col("toks"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("rn", row_number().over(w).cast("long"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_msgs"),
        sum(when(col("prev_role") === col("role"), 1L).otherwise(0L))
          .as("n_role_violations"),
        min(when(col("rn") === 1L, col("role"))).as("__first_role"),
        sum(when(col("cum_toks") <= budget, 1L).otherwise(0L))
          .as("kept_msgs"),
        coalesce(max(when(col("cum_toks") <= budget, col("cum_toks"))),
          lit(0L)).as("kept_toks"))
      .select(col("user_id"), col("n_msgs"), col("n_role_violations"),
        (col("__first_role") === "user").as("starts_with_user"),
        col("kept_msgs"), col("kept_toks"))
  }

  /** Entry-path mining: the distribution of each conversation's FIRST
    * `k` event types as ordered path strings ("view>click>view") — the
    * onboarding/funnel-entry readout (how do sessions begin, and which
    * openings dominate), and with scripted clients the repeated-path
    * spike IS the bot signature. Conversations shorter than `k`
    * contribute their full (shorter) path.
    *
    * Scale shape: one conversation-key window trimmed to k rows per
    * conversation, per-conversation path assembly on ≤ k elements, then
    * a path-grain rollup (cardinality ≤ |event types|^k).
    *
    * @return path, n_users
    */
  def entryPaths(events: DataFrame, k: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy(col("user_id"))
      .agg(concat_ws(">",
        transform(
          sort_array(collect_list(struct(col("rn"), col("event_type")))),
          x => x.getField("event_type"))).as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** SFT pair extraction: the (user turn → immediately-following assistant
    * turn) pairs a fine-tuning pipeline mines from transcripts, rolled up
    * per conversation — pair count, total response latency, and total
    * response token mass. A user turn answered by another user turn (or
    * ending the transcript) forms no pair; that is exactly the alternation
    * discipline [[turnAudit]] audits.
    *
    * Latency is exact integer µs: `ts` is the epoch-ns long contract, so
    * `(next_ts − ts) div 1000` equals the µs difference bit-for-bit (both
    * stamps are µs·1000).
    *
    * Scale shape: the same single conversation-key window as the audit
    * (lead ×3 share one sort), then a conversation-grain rollup.
    * Conversations with zero pairs are absent (the rollup is over pairs).
    *
    * @return user_id, n_pairs, total_latency_us, response_toks
    */
  def turnPairs(events: DataFrame, toks: Column,
                userTypes: Seq[String] = Seq("click", "purchase", "signup"))
      : DataFrame = {
    val role = when(col("event_type").isin(userTypes.map(x => x: Any): _*),
      "user").otherwise("assistant")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"),
        role.as("role"), toks.cast("long").as("toks"))
      .withColumn("next_role", lead(col("role"), 1).over(w))
      .withColumn("next_ts", lead(col("ts"), 1).over(w))
      .withColumn("next_toks", lead(col("toks"), 1).over(w))
      .filter(col("role") === "user" && col("next_role") === "assistant")
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(expr("(next_ts - ts) div 1000")).as("total_latency_us"),
        sum(col("next_toks")).as("response_toks"))
  }

  /** SFT loss-mask geometry: where, in token space, the trainable spans
    * of each rendered conversation sit. Supervised fine-tuning computes
    * loss only on assistant tokens; the collator needs, per conversation,
    * the token offsets of the assistant runs (a run of consecutive
    * assistant messages is ONE span — the mask has no interior boundary
    * at a message edge). This is the mask a packer materializes as
    * per-example `(start, end)` ranges.
    *
    * Exact integer token arithmetic: a message's span is
    * `[cum − toks, cum)` with `cum` the running token sum in message
    * order, so span starts/ends are bit-determined by the same window
    * sort the audit uses.
    *
    * Scale shape: one conversation-key shuffle shared by lag + running
    * sum, then a conversation-grain rollup — identical partitioning to
    * [[turnAudit]]/[[turnPairs]], so the three audits co-schedule on one
    * exchange at 100 TB.
    *
    * @return user_id, total_toks, trainable_toks, n_spans,
    *         first_trainable_off (−1 when the conversation has no
    *         assistant turn)
    */
  def lossMask(events: DataFrame, toks: Column,
               userTypes: Seq[String] = Seq("click", "purchase", "signup"))
      : DataFrame = {
    val role = when(col("event_type").isin(userTypes.map(x => x: Any): _*),
      "user").otherwise("assistant")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"),
        role.as("role"), toks.cast("long").as("toks"))
      .withColumn("prev_role", lag(col("role"), 1).over(w))
      .withColumn("cum_toks", sum(col("toks"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"))
      .agg(
        sum(col("toks")).as("total_toks"),
        sum(when(col("role") === "assistant", col("toks")).otherwise(0L))
          .as("trainable_toks"),
        sum(when(col("role") === "assistant" &&
            (col("prev_role").isNull || col("prev_role") === "user"), 1L)
          .otherwise(0L)).as("n_spans"),
        coalesce(min(when(col("role") === "assistant",
          col("cum_toks") - col("toks"))), lit(-1L))
          .as("first_trainable_off"))
  }

  /** Tool-call bracket audit for agentic transcripts: in a tool-use
    * trace, every tool RESULT must answer a pending tool CALL — the
    * balanced-brackets invariant a function-calling fine-tune requires
    * of its training episodes (an orphan result teaches the model to
    * hallucinate tool output; an unclosed call truncates the loop).
    * Checked per conversation as a running balance over message order:
    * calls +1, results −1; a dip below zero is an orphan result, the
    * final balance counts unclosed calls.
    *
    * Exactness: the minimum of the running balance and the final
    * balance are integer window/rollup facts — orphans = −min(0,
    * min running balance), unclosed = final + orphans (re-basing the
    * balance after its deepest dip).
    *
    * Scale shape: one conversation-key shuffle; the running sum shares
    * the sort with everything else in this family; conversation-grain
    * output. The streaming twin ([[graft.streaming.StreamOps]]) keeps
    * the same O(1) (balance, min-balance) state per conversation.
    *
    * @return user_id, n_calls, n_results, n_orphan_results,
    *         n_unclosed_calls, ok
    */
  def toolCallAudit(events: DataFrame,
                    callTypes: Seq[String] = Seq("cart"),
                    resultTypes: Seq[String] = Seq("purchase"))
      : DataFrame = {
    val delta = when(col("event_type")
        .isin(callTypes.map(x => x: Any): _*), 1L)
      .when(col("event_type").isin(resultTypes.map(x => x: Any): _*), -1L)
      .otherwise(0L)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"),
        delta.as("d"))
      .withColumn("bal", sum(col("d")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("d") === 1L, 1L).otherwise(0L)).as("n_calls"),
        sum(when(col("d") === -1L, 1L).otherwise(0L)).as("n_results"),
        greatest(lit(0L), -min(col("bal"))).as("n_orphan_results"))
      .select(col("user_id"), col("n_calls"), col("n_results"),
        col("n_orphan_results"),
        // final balance = calls − results; re-based by the deepest dip
        (col("n_calls") - col("n_results") + col("n_orphan_results"))
          .as("n_unclosed_calls"),
        (col("n_orphan_results") === 0L &&
          col("n_calls") === col("n_results")).as("ok"))
  }

  /** SFT dataset build manifest (the dialogue family's composition
    * capstone, the q199/q200 discipline): transcripts flow through the
    * template gate ([[turnAudit]]'s alternation + user-first rule) and
    * the usability gate (≥1 user→assistant pair, [[turnPairs]]'s
    * extraction condition), with per-stage survival — conversation,
    * pair, and token mass — in ONE DAG. The three stages a fine-tuning
    * run reports before training starts: what arrived, what renders
    * under the chat template, what actually yields examples.
    *
    * Scale shape: lag + lead + the rollup share ONE conversation-key
    * window sort (the reason to compose rather than union three
    * operators); stage membership is monotone (each stage filters the
    * previous), so the three stage rows aggregate one conversation-grain
    * frame — corpus touched once.
    *
    * @return stage ('all'|'clean'|'paired'), n_convs, n_pairs,
    *         total_toks, trainable_toks
    */
  def sftManifest(events: DataFrame, toks: Column,
                  userTypes: Seq[String] = Seq("click", "purchase",
                    "signup")): DataFrame = {
    val role = when(col("event_type").isin(userTypes.map(x => x: Any): _*),
      "user").otherwise("assistant")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val conv = events
      .select(col("user_id"), col("ts"), col("event_id"),
        role.as("role"), toks.cast("long").as("toks"))
      .withColumn("prev_role", lag(col("role"), 1).over(w))
      .withColumn("next_role", lead(col("role"), 1).over(w))
      .withColumn("rn", row_number().over(w).cast("long"))
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("prev_role") === col("role"), 1L).otherwise(0L))
          .as("viol"),
        min(when(col("rn") === 1L, col("role"))).as("first_role"),
        sum(when(col("role") === "user" &&
          col("next_role") === "assistant", 1L).otherwise(0L))
          .as("n_pairs"),
        sum(col("toks")).as("total_toks"),
        sum(when(col("role") === "assistant", col("toks")).otherwise(0L))
          .as("trainable_toks"))
    val clean = col("viol") === 0L && col("first_role") === "user"
    val paired = clean && col("n_pairs") >= 1L
    // ONE pass over the conversation frame: conditional sums per stage,
    // reshaped to stage rows (three filtered aggregates would re-run the
    // window pipeline three times — review catch; this is the q199
    // conditional-survival discipline)
    val gated = (pred: Column, c: Column) =>
      sum(when(pred, c).otherwise(0L))
    val one = conv.agg(
      count(lit(1)).as("c_all"),
      coalesce(sum(col("n_pairs")), lit(0L)).as("p_all"),
      coalesce(sum(col("total_toks")), lit(0L)).as("t_all"),
      coalesce(sum(col("trainable_toks")), lit(0L)).as("tr_all"),
      gated(clean, lit(1L)).as("c_clean"),
      gated(clean, col("n_pairs")).as("p_clean"),
      gated(clean, col("total_toks")).as("t_clean"),
      gated(clean, col("trainable_toks")).as("tr_clean"),
      gated(paired, lit(1L)).as("c_paired"),
      gated(paired, col("n_pairs")).as("p_paired"),
      gated(paired, col("total_toks")).as("t_paired"),
      gated(paired, col("trainable_toks")).as("tr_paired"))
    one.select(explode(array(
        struct(lit("all").as("stage"), col("c_all").as("n_convs"),
          col("p_all").as("n_pairs"), col("t_all").as("total_toks"),
          col("tr_all").as("trainable_toks")),
        struct(lit("clean").as("stage"), col("c_clean").as("n_convs"),
          col("p_clean").as("n_pairs"), col("t_clean").as("total_toks"),
          col("tr_clean").as("trainable_toks")),
        struct(lit("paired").as("stage"), col("c_paired").as("n_convs"),
          col("p_paired").as("n_pairs"), col("t_paired").as("total_toks"),
          col("tr_paired").as("trainable_toks")))).as("s"))
      .select(col("s.stage"), col("s.n_convs"), col("s.n_pairs"),
        col("s.total_toks"), col("s.trainable_toks"))
  }

  /** Preference-pair builder (the DPO/RLHF data shape — Rafailov et al.
    * 2023, "Direct Preference Optimization", public literature): each
    * prompt group (here: user) contributes at most one (chosen, rejected)
    * pair — its highest- and lowest-reward responses — and the pair is
    * kept only when the reward margin clears `minMarginCents` (pairs the
    * annotator barely separated teach the model noise, so DPO corpora
    * gate on margin). Rewards are exact cents (the q120 DECIMAL(18,2)
    * route); argmax/argmin tie-break on event_id so the pair is
    * deterministic under re-runs.
    *
    * The readout is the corpus-level preference MATRIX: for every
    * (chosen_type, rejected_type) cell, pair count and the exact margin
    * mass/extrema — the table a preference-data review reads to spot a
    * degenerate axis (one response family always winning says the reward
    * model collapsed onto a format feature, not quality).
    *
    * Scale shape: one shuffle on the prompt key with map-side combine
    * (max/min of a struct — O(1) state per group, never a per-group
    * sort), then a type-pair-grain rollup (≤ |types|² rows). At 100 TB
    * the prompt key is the natural partition key; nothing global.
    *
    * @return chosen_type, rejected_type, n_pairs, sum_margin_cents,
    *         min_margin_cents, max_margin_cents
    */
  def preferencePairs(events: DataFrame,
                      minMarginCents: Long = 20000L): DataFrame = {
    val cents = (round(col("value"), 2).cast("decimal(18,2)") * 100)
      .cast("long")
    val picked = events
      .select(col("user_id"), col("event_id"), col("event_type"),
        cents.as("cents"))
      .groupBy(col("user_id"))
      .agg(
        // struct order: cents first, then the event_id tie-break
        // (negated for the max so ties resolve to the SMALLEST id on
        // both sides — deterministic, oracle-replayable)
        max(struct(col("cents"), (-col("event_id")).as("nid"),
          col("event_type"))).as("ch"),
        min(struct(col("cents"), col("event_id"),
          col("event_type"))).as("rj"))
      .select(
        col("ch.event_type").as("chosen_type"),
        col("rj.event_type").as("rejected_type"),
        (col("ch.cents") - col("rj.cents")).as("margin_cents"),
        (-col("ch.nid")).as("chosen_id"), col("rj.event_id").as("rej_id"))
      .filter(col("chosen_id") =!= col("rej_id") &&
        col("margin_cents") >= minMarginCents)
    picked
      .groupBy(col("chosen_type"), col("rejected_type"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("margin_cents")).as("sum_margin_cents"),
        min(col("margin_cents")).as("min_margin_cents"),
        max(col("margin_cents")).as("max_margin_cents"))
  }

  /** Chat-template rendering: flatten each conversation into the single
    * prompt string a serving stack would feed the model — a fixed system
    * header, then `<|role|>body\n` per turn in (ts, event_id) order —
    * and emit its exact length plus the engine-neutral position-weighted
    * fingerprint (q15's kernel), so template drift anywhere in the
    * corpus is one digest compare away.
    *
    * Role mapping is the dialogue-family convention ([[turnAudit]]):
    * `userTypes` → user, everything else → assistant. Turn bodies are
    * `event_type:cents` with the exact DECIMAL(18,2)·100 cents route, so
    * the rendered bytes are bit-determined.
    *
    * Scale shape: one conversation-key shuffle (the same partitioning as
    * every dialogue audit), ordered array assembly per group, per-row
    * render + fingerprint — no second exchange. The rendered string
    * lives only inside the projection; the output is lengths + digests,
    * so nothing conversation-sized is shuffled or collected.
    *
    * @return user_id, n_turns, render_len, fp
    */
  def chatTemplate(events: DataFrame,
                   userTypes: Seq[String] = Seq("click", "purchase", "signup"))
      : DataFrame = {
    val role = when(col("event_type").isin(userTypes.map(x => x: Any): _*),
      lit("user")).otherwise(lit("assistant"))
    val cents = (round(col("value"), 2).cast("decimal(18,2)") * 100)
      .cast("long")
    val piece = concat(lit("<|"), role, lit("|>"), col("event_type"),
      lit(":"), cents.cast("string"), lit("\n"))
    events
      .select(col("user_id"), col("ts"), col("event_id"), piece.as("piece"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_turns"),
        array_sort(collect_list(struct(col("ts"), col("event_id"),
          col("piece")))).as("turns"))
      .select(col("user_id"), col("n_turns"),
        concat(lit("<|sys|>chat\n"),
          array_join(expr("transform(turns, t -> t.piece)"), ""))
          .as("rendered"))
      .select(col("user_id"), col("n_turns"),
        length(col("rendered")).cast("long").as("render_len"),
        TextStats.fingerprint(col("rendered")).as("fp"))
  }

  /** KV/prefix-cache reuse audit under a sliding context window: per
    * request, how many leading pieces (and how much char mass) of the
    * prompt were already the prefix of the PREVIOUS request — the
    * fraction a prefix cache serves for free. Each request's prompt is
    * the last `contextPieces` turns of the conversation segment
    * (segments restart at `resetTypes` events — a new thread), which is
    * exactly the serving-stack shape where reuse is high while the
    * history still fits and collapses to zero once the window starts
    * sliding (the front piece drops, so nothing aligns).
    *
    * The shared-prefix computation is GENERIC — `zip_with` null-safe
    * equality, first mismatch position — not an analytic shortcut; the
    * oracle independently derives the expected value from the
    * append-only + unique-piece model, so the two sides prove each
    * other by different methods.
    *
    * Scale shape: one conversation-key window sort shared by the
    * segment running-sum, the bounded-frame `collect_list` and the lag;
    * every per-row array is ≤ contextPieces elements, so per-row work
    * is O(M) and totals are linear in events. reuse_ppm is exact
    * integer arithmetic.
    *
    * @return user_id, n_requests, n_segments, shared_pieces,
    *         prompt_pieces, shared_chars, prompt_chars, reuse_ppm
    */
  def prefixCacheAudit(events: DataFrame, contextPieces: Int = 8,
                       resetTypes: Seq[String] = Seq("signup")): DataFrame = {
    require(contextPieces >= 1, "contextPieces must be positive")
    val isReset = col("event_type").isin(resetTypes.map(x => x: Any): _*)
    val piece = concat(col("event_type"), lit(":"),
      col("event_id").cast("string"))
    val wAll = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val base = events.select(col("user_id"), col("ts"), col("event_id"),
        piece.as("piece"), when(isReset, 1L).otherwise(0L).as("rst"))
      .withColumn("seg",
        sum(col("rst")).over(wAll.rowsBetween(Window.unboundedPreceding, 0)))
    val wSeg = Window.partitionBy(col("user_id"), col("seg"))
      .orderBy(col("ts"), col("event_id"))
    val mismatch =
      expr("array_position(zip_with(prompt, prev, (x, y) -> x <=> y), false)")
    val prompts = base
      .withColumn("prompt", collect_list(col("piece"))
        .over(wSeg.rowsBetween(-(contextPieces - 1), 0)))
      .withColumn("prev", lag(col("prompt"), 1).over(wSeg))
      .withColumn("shared", when(col("prev").isNull, lit(0L))
        .otherwise(when(mismatch === 0,
          least(size(col("prompt")), size(col("prev"))).cast("long"))
          .otherwise(mismatch - 1)))
      .withColumn("shared_chars",
        expr("aggregate(slice(prompt, 1, int(shared)), 0L, (a, x) -> a + length(x))"))
      .withColumn("prompt_chars",
        expr("aggregate(prompt, 0L, (a, x) -> a + length(x))"))
    prompts.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_requests"),
        countDistinct(col("seg")).as("n_segments"),
        sum(col("shared")).as("shared_pieces"),
        sum(size(col("prompt")).cast("long")).as("prompt_pieces"),
        sum(col("shared_chars")).as("shared_chars"),
        sum(col("prompt_chars")).as("prompt_chars"))
      .withColumn("reuse_ppm",
        expr("shared_chars * 1000000 div prompt_chars"))
  }
}
