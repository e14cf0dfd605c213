package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Serving-stack capacity operators: paged KV-cache accounting and
  * token-bucket admission control — the two resource models an inference
  * fleet is provisioned against (reference tie-in: `Tools/server.py`
  * serves per-request inference; these are the audits that size and
  * protect such a service when conversations, not single images, are the
  * payload).
  *
  * Parity discipline: every statistic is an exact integer (char counts,
  * 16-slot page math, micro-token bucket levels); the only doubles are
  * final one-division ppm readouts built from those integers. The
  * token-bucket fold packs its (accepted, level) state into ONE BIGINT so
  * the identical lambda runs as Spark `aggregate` and DuckDB
  * `list_reduce` — no engine-private state shape.
  *
  * Scale shape: both operators are one conversation-key window pass plus
  * a hash aggregation at user grain — linear in events, no global sort,
  * nothing conversation-sized shuffled beyond the per-user event rows a
  * groupBy already co-locates.
  */
object Serving {

  /** Paged KV-cache accounting (the vLLM block model from Kwon et al.
    * 2023, SOSP — public literature): context grows monotonically over a
    * conversation's turns; pages of `blockTokens` positions are allocated
    * on demand, so turn t holds `ceil(ctx_t / blockTokens)` pages of
    * which the last is partially filled. Internal fragmentation is the
    * gap between allocated page capacity and live context, summed over
    * turn-holds — the number a capacity planner provisions HBM against.
    *
    * Context model: each event renders to the SIMPLIFIED piece
    * `event_type:cents\n`, one "token" per char (the tokenizer-free
    * deterministic envelope); ctx_t is the running char sum over the
    * conversation in (ts, event_id) order. This is deliberately NOT the
    * full q237 chat template (which wraps each piece in `<|role|>…` and
    * prepends a `<|sys|>chat\n` header) — the pager audits page math, not
    * template rendering, and both engine and oracle count the same model,
    * so parity holds; absolute peak_ctx/peak_pages would shift by the
    * wrapper chars if the full template were the contract.
    *
    * @return per user: user_id, n_turns, peak_ctx, peak_pages,
    *         page_turns (Σ_t pages_t), frag_tokens
    *         (Σ_t pages_t·blockTokens − ctx_t), frag_ppm (exact-int
    *         numerator, one IEEE division)
    */
  def kvCachePager(events: DataFrame, blockTokens: Int = 16): DataFrame = {
    require(blockTokens >= 1, "blockTokens must be positive")
    val cents = (round(col("value"), 2).cast("decimal(18,2)") * 100)
      .cast("long")
    val pieceLen = (length(col("event_type")) + 1 +
      length(cents.cast("string")) + 1).cast("long")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val b = lit(blockTokens.toLong)
    val turns = Sessions.withTsUs(events)
      .select(col("user_id"), col("ts_us"), col("event_id"),
        pieceLen.as("piece_len"))
      .withColumn("ctx", sum(col("piece_len")).over(w))
      .withColumn("pages",
        expr(s"(ctx + ${blockTokens.toLong - 1}) div ${blockTokens.toLong}"))
    turns.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_turns"),
        max(col("ctx")).as("peak_ctx"),
        max(col("pages")).as("peak_pages"),
        sum(col("pages")).as("page_turns"),
        sum(col("pages") * b - col("ctx")).as("frag_tokens"))
      .withColumn("frag_ppm",
        (col("frag_tokens") * 1000000L).cast("double") /
          (col("page_turns") * b).cast("double"))
  }

  /** Token-bucket admission control replayed exactly over each user's
    * event history: capacity `capacity` tokens, continuous refill
    * `refillPerSec` tokens/s, every event attempts to spend `cost`
    * tokens; an event is admitted iff the refilled level covers the
    * cost, and only admitted events drain the bucket. The classic
    * traffic-shaping primitive (RFC 2697-style single-rate policing) —
    * what a serving front-end runs per API key.
    *
    * The per-user replay is a left fold that is NOT window-expressible
    * (the min-clamp at capacity breaks prefix-sum associativity), so it
    * runs as ONE `aggregate` lambda over the (ts, event_id)-sorted
    * inter-arrival list with the state packed into a single BIGINT:
    * `acc = admitted · PACK + level_micro`, `PACK = 10⁷ > capacity
    * micro-tokens`. Micro-token units make every step exact integer
    * arithmetic: refill = Δt_µs · refillPerSec (µtok), clamp, compare,
    * spend. The first event sees a FULL bucket (Δt = 0, level = C).
    *
    * Long envelope: acc ≤ n_events·10⁷ + 10⁷ — exact through ~9·10¹¹
    * events per user; Δt_µs·refillPerSec ≤ ~9·10¹⁸/refillPerSec.
    *
    * Scale shape: one per-user sorted `collect_list` (conversation
    * grain — the same envelope every Dialogue operator documents: a
    * user's history fits in one task) and a linear fold; output is user
    * grain.
    *
    * @return user_id, n_events, n_admitted, n_rejected,
    *         final_level_micro, admit_ppm
    */
  def tokenBucket(events: DataFrame, capacity: Int = 5,
                  refillPerSec: Int = 2, cost: Int = 1): DataFrame = {
    require(capacity >= 1 && refillPerSec >= 1 && cost >= 1,
      "capacity, refillPerSec and cost must be positive")
    require(capacity <= 9, s"capacity must stay below PACK=1e7 µtok, got $capacity")
    require(cost <= capacity, "cost must not exceed capacity")
    val cMicro = capacity * 1000000L
    val costMicro = cost * 1000000L
    val pack = 10000000L
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val fold =
      s"""aggregate(
         |  transform(array_sort(arr), t -> t.dt),
         |  CAST($cMicro AS BIGINT),
         |  (a, x) -> CASE
         |    WHEN least(CAST($cMicro AS BIGINT),
         |               a % CAST($pack AS BIGINT) + x * $refillPerSec)
         |         >= CAST($costMicro AS BIGINT)
         |    THEN (a div $pack + 1) * CAST($pack AS BIGINT)
         |         + least(CAST($cMicro AS BIGINT),
         |                 a % CAST($pack AS BIGINT) + x * $refillPerSec)
         |         - CAST($costMicro AS BIGINT)
         |    ELSE (a div $pack) * CAST($pack AS BIGINT)
         |         + least(CAST($cMicro AS BIGINT),
         |                 a % CAST($pack AS BIGINT) + x * $refillPerSec)
         |  END)""".stripMargin
    Sessions.withTsUs(events)
      .select(col("user_id"), col("ts_us"), col("event_id"))
      .withColumn("dt",
        coalesce(col("ts_us") - lag(col("ts_us"), 1).over(w), lit(0L)))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        collect_list(struct(col("ts_us"), col("event_id"), col("dt")))
          .as("arr"))
      .withColumn("acc", expr(fold))
      .withColumn("n_admitted", expr(s"acc div $pack"))
      .select(col("user_id"), col("n_events"), col("n_admitted"),
        (col("n_events") - col("n_admitted")).as("n_rejected"),
        (col("acc") % pack).as("final_level_micro"),
        expr(s"(acc div $pack) * 1000000 div n_events").as("admit_ppm"))
  }
}
