package graft.ext

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time operators over the `events` table: gap-based sessionization and
  * tumbling windows. The batch forms are the oracle-checked contract; the
  * streaming forms (same semantics) live in `graft.streaming`.
  *
  * All event-time arithmetic is integer microseconds: [[graft.Tables.events]]
  * normalizes `ts` to epoch-ns longs whatever the parquet encoding
  * (TIMESTAMP(NANOS), TIMESTAMP(MICROS), or a directory mixing both), and
  * the DuckDB oracle reads the same column as `epoch_us(ts)` — exact,
  * timezone-free parity on both sides.
  *
  * Scale notes: sessionization is one shuffle on `user_id` (the window
  * partition key); tumbling windows are one hash aggregation keyed by
  * (bucket, type) — both partition-parallel with no skew beyond the key
  * distribution itself. For a heavy-hitter user at 100 TB the session window
  * would be salted by day first (sessions cannot span a gap, so day
  * boundaries that fall inside a gap are safe split points).
  */
object Sessions {

  /** Floor division on longs (`floorDiv(a, b)` for b > 0): Spark's `div`
    * truncates toward zero while DuckDB's `//` floors, so the two diverge on
    * negative operands. `(a - pmod(a, b)) div b` floors for any sign of `a`
    * because pmod is the non-negative remainder.
    *
    * Must be INTEGRAL division (Catalyst `IntegralDivide` via GraftBridge):
    * `Column./` is double division, and ns-epoch longs (~1.7e18) exceed
    * double's 2^53 exact range — true division here would silently lose the
    * low microsecond digit.
    */
  private[ext] def floorDiv(a: Column, b: Long): Column = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.{IntegralDivide, Literal}
    val exact = GraftBridge.expression(a - pmod(a, lit(b)))
    GraftBridge.column(IntegralDivide(exact, Literal(b), evalMode = org.apache.spark.sql.catalyst.expressions.EvalMode.LEGACY))
  }

  /** ts (ns long) → µs long.
    *
    * Precondition ts >= 0 (holds for all epoch timestamps in this corpus):
    * the oracle side is DuckDB's read-time ns→µs conversion of the same
    * parquet column, whose negative-value behavior is DuckDB's own and not
    * something this engine can mirror with either floor or truncate. For
    * non-negative ts, floor ≡ truncate ≡ DuckDB's conversion.
    */
  def withTsUs(events: DataFrame): DataFrame =
    events.withColumn("ts_us", floorDiv(col("ts"), 1000L))

  /** Gap-based sessionization: a new session starts when the gap to the
    * previous event of the same user exceeds `gapUs`. Deterministic ordering:
    * (ts_us, event_id) — never partition order.
    *
    * @return one row per session: user_id, session_id (1-based per user),
    *         n_events, start_us, end_us, dur_us
    */
  def sessionize(events: DataFrame, gapUs: Long = 30L * 60 * 1000000): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    withTsUs(events)
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(
        Window.partitionBy("user_id").orderBy("ts_us", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"))
      .withColumn("dur_us", col("end_us") - col("start_us"))
  }

  /** Tumbling event-time window aggregation (streaming-analog batch form):
    * bucket = floor(ts_us / windowUs) — true floor division, so pre-1970
    * buckets match DuckDB's `//` — per (bucket, event_type) counts and
    * value sums.
    */
  def tumbling(events: DataFrame, windowUs: Long = 3600L * 1000000): DataFrame =
    withTsUs(events)
      .withColumn("bucket", floorDiv(col("ts_us"), windowUs))
      .groupBy(col("bucket"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("value")), 2).as("sum_value"),
        count_distinct(col("user_id")).as("n_users"))

  /** Hopping (sliding) event-time windows — the overlapping generalization
    * of [[tumbling]]: window length `windowUs`, hop `slideUs`
    * (`windowUs % slideUs == 0`), so every event belongs to
    * `windowUs / slideUs` windows. Implemented exactly as Spark's streaming
    * `window(ts, len, slide)` does it: explode each event into its covering
    * window starts, then one hash aggregation — the expansion factor is the
    * constant `len/slide`, so the shuffle stays O(rows · k) with map-side
    * partial aggregation, never a self-join.
    *
    * Parity: window start = floor(ts/slide)·slide − i·slide in exact µs
    * integer arithmetic (true floor, so pre-1970 events would bucket the
    * same as DuckDB's `//`).
    */
  def hopping(events: DataFrame, windowUs: Long = 3600L * 1000000,
              slideUs: Long = 1800L * 1000000): DataFrame = {
    require(windowUs % slideUs == 0, "window must be a multiple of the slide")
    val k = (windowUs / slideUs).toInt
    withTsUs(events)
      .withColumn("w_start",
        explode(array((0 until k).map(i =>
          (floorDiv(col("ts_us"), slideUs) - i) * slideUs): _*)))
      .groupBy(col("w_start"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("value")), 2).as("sum_value"))
  }

  /** Session OCCUPANCY (concurrency analysis): how many sessions — and
    * distinct users — are ACTIVE in each time bucket. Sessions come from
    * [[sessionize]]; each session explodes into the buckets its
    * [start, end] interval touches (expansion bounded by duration/bucket,
    * the same constant-factor-explode argument as hopping windows), then
    * one hash aggregation. The interval→occupancy reduction behind
    * concurrent-users, room-occupancy and license-peak reports.
    */
  def occupancy(events: DataFrame,
                bucketUs: Long = 3600L * 1000000): DataFrame =
    sessionize(events)
      .select(col("user_id"),
        explode(sequence(
          floorDiv(col("start_us"), bucketUs),
          floorDiv(col("end_us"), bucketUs))).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_sessions"),
        count_distinct(col("user_id")).as("n_users"))

  /** SCD2 (validity-interval) point-in-time join — the feature-store
    * correctness primitive: build a slowly-changing dimension from each
    * user's signup events (every signup opens a new version, closed by the
    * next one), then join every purchase to the version VALID AT ITS EVENT
    * TIME — never a later one (no training-time leakage).
    *
    * Shape: the dimension build is one window (lead) over the signup
    * slice; the join is an equi-join on user with the validity range as a
    * residual predicate — one shuffle, and per-user candidates are bounded
    * by that user's version count (the q45 interval-join argument). An
    * as-of join (q29) answers "latest before"; SCD2 adds explicit validity
    * intervals, so deletes/expirations are representable.
    *
    * @return (user_id, purchase_id, purchase_us, version, valid_from_us,
    *         valid_to_us) — purchases before a user's first version are
    *         absent (inner join; the left form would carry NULL versions)
    */
  def scd2Join(events: DataFrame): DataFrame = {
    val e = withTsUs(events)
    val wDim = Window.partitionBy(col("user_id"))
      .orderBy(col("valid_from_us"), col("event_id"))
    val dim = e.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts_us").as("valid_from_us"),
        col("event_id"))
      .withColumn("version", row_number().over(wDim).cast("long"))
      .withColumn("valid_to_us",
        coalesce(lead(col("valid_from_us"), 1).over(wDim),
          lit(Long.MaxValue)))
      .drop("event_id")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts_us").as("purchase_us"))
    purchases.join(dim, Seq("user_id"))
      .filter(col("purchase_us") >= col("valid_from_us") &&
        col("purchase_us") < col("valid_to_us"))
      .select(col("user_id"), col("purchase_id"), col("purchase_us"),
        col("version"), col("valid_from_us"), col("valid_to_us"))
  }

  /** Run-length compaction (debounce): collapse each user's CONSECUTIVE
    * same-type events into one row — the stream-compaction / event-dedup
    * shape that turns sensor chatter into state changes. A run breaks when
    * the event type changes in (ts_us, event_id) order; runs are numbered
    * per user by a running sum over change flags (the sessionize trick with
    * type-change instead of time-gap as the boundary).
    *
    * One shuffle on user_id serves the lag, the running sum AND the final
    * per-run aggregation (all partition on the same key).
    *
    * @return (user_id, run_id, event_type, min_event, start_us, run_len) —
    *         min_event is the smallest event id in the run (deterministic;
    *         "the first event's id" would need an argmin tie-broken on the
    *         same sort key, which min already is whenever ids follow time)
    */
  def compactRuns(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val prev = lag(col("event_type"), 1).over(byUser)
    withTsUs(events)
      .withColumn("__chg",
        when(prev.isNull || prev =!= col("event_type"), 1L).otherwise(0L))
      .withColumn("run_id", sum(col("__chg")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("run_id"))
      .agg(
        // constant within a run — min is just the deterministic pick
        min(col("event_type")).as("event_type"),
        min(col("event_id")).as("min_event"),
        min(col("ts_us")).as("start_us"),
        count(lit(1)).as("run_len"))
  }

  /** Trailing-window anomaly detection on a daily series: per event type,
    * each day's total value is scored against the mean/variance of the
    * trailing `frameDays` days (inclusive); |z| > `zThr` flagged. The
    * monitoring shape behind data-drift and pipeline-health checks.
    *
    * Shape: one (day, type) hash aggregation over the scan, then one window
    * over the tiny daily frame — at 100 TB the window input is O(days ·
    * types), thousands of rows, regardless of event volume.
    *
    * Parity: every emitted value is EXACT — no raw derived doubles, which
    * two rounds of driver evidence showed are NOT bit-stable across engines
    * (an expression like `s2/n − (s1/n)·(s1/n)` is exactly the
    * multiply-subtract shape a compiler may contract into an FMA, and
    * neither engine promises an evaluation order). Daily totals are rounded
    * to exact 2-dp decimals first, so the frame sums s1 (scale 2) and s2
    * (scale 4) are exact decimals; then
    *   - `mu_e6` = s1/n rounded HALF_UP to 6 dp in e-6 units, built in pure
    *     integer arithmetic ((|s1c|·1e4·2 + n) div 2n, sign reapplied) —
    *     decimal division is NOT used because DuckDB's `/` on decimals
    *     returns DOUBLE;
    *   - `var_num_e4` = (n·s2 − s1²)·1e4 = n²·σ²_pop in e-4 units
    *     (σ = sqrt(var_num_e4·1e-4)/n for the consumer);
    *   - `anomaly` ⟺ |z| > zThr ⟺ (n·x − s1)² > zThr²·(n·s2 − s1²), a pure
    *     decimal inequality (zThr² as an exact decimal literal of the
    *     double product).
    * Decimal casts only ever SHRINK PRECISION on exact values, never reduce
    * scale (DuckDB's decimal downcast does not round like Spark's HALF_UP).
    * n = 1 gives var_num_e4 = 0 and a calm flag, replacing the old σ=0
    * guard. The HASHED OUTPUT carries only BIGINT fixed-point columns
    * (`revenue_cents`, `mu_e6`, `var_num_e4`) — the streaming twin's
    * [[graft.streaming.StreamOps.AnomDayRow]] units: round 6 showed the
    * driver's hasher normalizes DECIMAL values differently across
    * duckdb/pyarrow versions, so DECIMAL never reaches an oracled output.
    */
  def movingAnomaly(events: DataFrame, frameDays: Int = 7,
                    zThr: Double = 2.0): DataFrame = {
    val DayUs = 86400000000L
    val daily = withTsUs(events)
      .withColumn("day", floorDiv(col("ts_us"), DayUs))
      .groupBy(col("event_type"), col("day"))
      .agg(round(sum(col("value")), 2).cast("decimal(18,2)").as("revenue"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-(frameDays - 1), Window.currentRow)
    val n = count(lit(1)).over(w)
    val s1 = sum(col("revenue")).over(w).cast("decimal(18,2)")
    val s2 = sum((col("revenue") * col("revenue")).cast("decimal(28,4)"))
      .over(w).cast("decimal(28,4)")
    val nDec = n.cast("decimal(3,0)")
    val varNum = (nDec * s2 - (s1 * s1).cast("decimal(30,4)"))
      .cast("decimal(32,4)")
    val s1c = (s1 * 100).cast("long") // exact cents
    val d = (nDec * col("revenue") - s1).cast("decimal(18,2)")
    val zSq = lit(java.math.BigDecimal.valueOf(zThr * zThr))
    val anomaly = (d * d).cast("decimal(30,4)") > (varNum * zSq)
    // Hashed output is pure fixed-point BIGINT (revenue_cents, mu_e6,
    // var_num_e4) — the streaming twin's AnomDayRow units, and no DECIMAL
    // ever reaches the driver hasher (decimal repr normalization differs
    // across duckdb/pyarrow versions; round-6 lesson). μ_e6 = half-up
    // |s1c·1e4| / n via (2a + n) div 2n in EXACT integer arithmetic
    // (`div`), no double quotient anywhere. Envelope guards fail loudly
    // (raise_error) instead of silently wrapping: |s1c| must stay under
    // (2^63−8)/20000 ≈ 4.6e14 cents per frame, var_num under 2^63/1e4.
    val muGuard = lit((Long.MaxValue - frameDays.toLong - 1L) / 20000L)
    val varGuard = lit(new java.math.BigDecimal(Long.MaxValue)
      .movePointLeft(4))
    daily.select(col("event_type"), col("day"), col("revenue"),
        n.as("n_frame"), s1c.as("s1c"), varNum.as("var_num_dec"),
        anomaly.as("anomaly"))
      .withColumn("mu_e6",
        when(abs(col("s1c")) > muGuard,
          raise_error(lit("movingAnomaly: |s1c| outside exact mu_e6 envelope"))
            .cast("long"))
        .otherwise(expr(
          """CASE WHEN s1c < 0
            |  THEN -((abs(s1c) * 20000 + n_frame) DIV (n_frame * 2))
            |  ELSE (abs(s1c) * 20000 + n_frame) DIV (n_frame * 2)
            |END""".stripMargin)))
      .withColumn("var_num_e4",
        when(col("var_num_dec") > varGuard,
          raise_error(lit("movingAnomaly: var_num outside e-4 long envelope"))
            .cast("long"))
        .otherwise((col("var_num_dec") * 10000).cast("long")))
      .select(col("event_type"), col("day"),
        (col("revenue") * 100).cast("long").as("revenue_cents"),
        col("n_frame"), col("mu_e6"), col("var_num_e4"), col("anomaly"))
  }

  /** Exponential moving average over the per-type daily revenue series —
    * the classic sequential smoother: ema_1 = x_1, ema_t = round(α·x_t +
    * (1−α)·ema_{t−1}, 9). A true recurrence (no window frame expresses it),
    * implemented as an ordered per-group array fold.
    *
    * Scale shape: the daily aggregation is the only pass over the event
    * stream; the fold input is O(days) per group — thousands of elements
    * at most, independent of event volume (same argument as
    * [[movingAnomaly]]).
    *
    * Parity: the ENTIRE recurrence runs in exact DECIMAL arithmetic with a
    * per-step HALF_UP round back to scale 9 — both engines' decimal round
    * is exact HALF_UP, so every carried value is bit-equal. A double
    * formulation with per-step round(9) is NOT safe here (measured at
    * sf0.1): α = 0.25 makes the pre-round values dyadic, which lands them
    * exactly on 10th-digit rounding ties, where Spark (exact decimal view
    * of the double) and DuckDB (fp multiply-then-round) disagree. The
    * PageRank per-step-round trick survives only because its values are
    * non-dyadic; ties there have measure zero.
    *
    * @return (event_type, day, rev, ema) — one row per observed day
    */
  def emaDaily(events: DataFrame): DataFrame = {
    val DayUs = 86400000000L
    val alpha = lit(new java.math.BigDecimal("0.25"))
    val beta = lit(new java.math.BigDecimal("0.75"))
    val daily = withTsUs(events)
      .withColumn("day", floorDiv(col("ts_us"), DayUs))
      .groupBy(col("event_type"), col("day"))
      .agg(round(sum(col("value")), 2).cast("decimal(18,2)").as("rev"))
    val folded = daily
      .groupBy(col("event_type"))
      .agg(array_sort(collect_list(struct(col("day"), col("rev"))))
        .as("__vals"))
      .select(col("event_type"), aggregate(
        col("__vals"),
        array().cast("array<struct<day:bigint,rev:decimal(18,2),ema:decimal(28,9)>>"),
        (acc, x) => concat(acc, array(struct(
          x.getField("day").as("day"),
          x.getField("rev").as("rev"),
          when(size(acc) === 0, x.getField("rev").cast("decimal(28,9)"))
            .otherwise(round(alpha * x.getField("rev") +
              beta * element_at(acc, -1).getField("ema"), 9)
              .cast("decimal(28,9)"))
            .as("ema"))))).as("__series"))
    folded
      .select(col("event_type"), explode(col("__series")).as("s"))
      .select(col("event_type"), col("s.day").as("day"),
        col("s.rev").cast("double").as("rev"),
        col("s.ema").cast("double").as("ema"))
  }

  /** Day-level gap-fill with last-observation-carried-forward (LOCF): for
    * every user, a dense daily spine from their first to last event day;
    * days with no events get n_events = 0 and carry the previous day's
    * purchase revenue forward.
    *
    * The missing-data shape every time-series feature pipeline needs; the
    * reference has no analog (its inputs are dense files), so this is a
    * north-star extension operator.
    *
    * Scale notes: the spine explode is O(users · span_days) — bounded and
    * tiny next to the event stream; the whole plan is one aggregation on
    * (user, day), one per-user sequence explode, one shuffle-free LOCF
    * window over the already-partitioned spine. No driver-side loops.
    *
    * Parity: day = floor(ts_us / 86.4e9) in exact integer arithmetic;
    * revenue is rounded to 2 dp BEFORE the LOCF copy so carried values are
    * bit-identical in both engines.
    *
    * @return (user_id, day, n_events, revenue, revenue_locf, filled)
    */
  def gapfillDaily(events: DataFrame): DataFrame = {
    val DayUs = 86400000000L
    val daily = withTsUs(events)
      .withColumn("day", floorDiv(col("ts_us"), DayUs))
      .groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(when(col("event_type") === "purchase", col("value"))), 2)
          .as("revenue"))
    val spine = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("__lo"), max(col("day")).as("__hi"))
      .select(col("user_id"),
        explode(sequence(col("__lo"), col("__hi"))).as("day"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("user_id", "day"), "left_outer")
      .select(col("user_id"), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("revenue"))
      .withColumn("revenue_locf",
        last(col("revenue"), ignoreNulls = true).over(w))
      .withColumn("filled", col("n_events") === 0L)
  }

  /** Linear-interpolation gap-fill — [[gapfillDaily]]'s sibling for
    * continuous signals, where LOCF's step function biases downstream
    * features: interior gap days get `v_prev + (v_next − v_prev)·(d −
    * d_prev)/(d_next − d_prev)` between the nearest observed neighbors;
    * edge gaps fall back to the one-sided neighbor. "Observed" means a
    * non-null daily revenue (a day with events but no purchases is a gap,
    * the same IGNORE NULLS contract as LOCF).
    *
    * Scale shape is gapfillDaily's: one (user, day) aggregation, one
    * bounded spine explode, then TWO frames over the same partitioning
    * (carry-forward and carry-backward) — still a single shuffle on user.
    * Parity: revenues are 2-dp-rounded before use; deltas are exact day
    * ints; the interpolation is one shared expression shape → identical
    * IEEE sequence both engines.
    *
    * @return (user_id, day, revenue_cents, interp, filled)
    */
  def interpolateDaily(events: DataFrame): DataFrame = {
    val DayUs = 86400000000L
    val daily = withTsUs(events)
      .withColumn("day", floorDiv(col("ts_us"), DayUs))
      .groupBy(col("user_id"), col("day"))
      .agg(round(sum(when(col("event_type") === "purchase", col("value"))), 2)
        .cast("decimal(18,2)").as("revenue"))
    val spine = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("__lo"), max(col("day")).as("__hi"))
      .select(col("user_id"),
        explode(sequence(col("__lo"), col("__hi"))).as("day"))
    val wPrev = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsDay = when(col("revenue").isNotNull, col("day"))
    // interior interpolation as (vp·(dn−day) + vn·(day−dp)) / (dn−dp):
    // the numerator is EXACT decimal·integer arithmetic, leaving ONE
    // double division — the textbook `vp + (vn−vp)·t` form is a double
    // multiply feeding an add, i.e. the FMA-contractible q77 shape
    spine.join(daily, Seq("user_id", "day"), "left_outer")
      .withColumn("vp", last(col("revenue"), ignoreNulls = true).over(wPrev))
      .withColumn("dp", last(obsDay, ignoreNulls = true).over(wPrev))
      .withColumn("vn", first(col("revenue"), ignoreNulls = true).over(wNext))
      .withColumn("dn", first(obsDay, ignoreNulls = true).over(wNext))
      .withColumn("interp",
        when(col("revenue").isNotNull, col("revenue").cast("double"))
          .when(col("vp").isNotNull && col("vn").isNotNull,
            (col("vp") * (col("dn") - col("day")) +
             col("vn") * (col("day") - col("dp"))).cast("decimal(38,2)")
              .cast("double") /
              (col("dn") - col("dp")).cast("double"))
          .otherwise(coalesce(col("vp"), col("vn")).cast("double")))
      // hashed output carries cents (BIGINT), never DECIMAL — the driver
      // hasher's decimal normalization is version-sensitive (round 6)
      .select(col("user_id"), col("day"),
        (col("revenue") * 100).cast("long").as("revenue_cents"),
        col("interp"), col("revenue").isNull.as("filled"))
  }

  /** First-order Markov transition matrix over each user's event-type
    * sequence: P(next_type | type) as exact count ratios, plus per-state
    * totals — the behavioral-model summary (and anomaly baseline) product
    * analytics derives from clickstreams. Sequences are per-user in
    * (ts_us, event_id) order; transitions never cross users.
    *
    * Scale shape: one window `lead` over the user-partitioned event sort
    * (the same single shuffle every sessionization here pays), then a
    * (from, to)-state aggregation whose cardinality is |types|² —
    * dashboard-sized at any corpus scale. Parity: counts exact; p is one
    * IEEE division of exact longs, raw.
    */
  def markovTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val pairs = withTsUs(events)
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"),
        col("next_type").as("to_type"))
      .agg(count(lit(1)).as("cnt"))
    val totals = pairs.groupBy(col("from_type"))
      .agg(sum(col("cnt")).as("total"))
    pairs.join(broadcast(totals), "from_type")
      .select(col("from_type"), col("to_type"), col("cnt"), col("total"),
        (col("cnt").cast("double") / col("total").cast("double")).as("p"))
  }

  /** Cohort LTV triangle: users grouped by first-activity week, revenue
    * accumulated by weeks-since-cohort — the lifetime-value artifact
    * (cohort × age matrix with cumulative revenue per cohort user) that
    * q97's retention counts feed but don't price. Periods are exact
    * 7-day integer buckets (the corpus spans ~a month, so calendar months
    * would collapse the triangle to one cell — the q104 degeneracy
    * lesson: pick period granularity from the data's span), revenue exact
    * cents; the running sum is a window over the O(cohorts · ages) frame
    * and the per-user LTV one division against the broadcast cohort size.
    */
  def ltvTriangle(events: DataFrame): DataFrame = {
    val DayUs = 86400000000L
    val withYm = withTsUs(events)
      .withColumn("ym", floorDiv(col("ts_us"), DayUs * 7))
    val perUserMonth = withYm
      .groupBy(col("user_id"), col("ym"))
      .agg(sum(when(col("event_type") === "purchase",
          (col("value"))).otherwise(lit(0.0))).as("rev_raw"))
      .withColumn("cents",
        (round(col("rev_raw"), 2).cast("decimal(18,2)") * 100).cast("long"))
    val cohorts = perUserMonth.groupBy(col("user_id"))
      .agg(min(col("ym")).as("cohort_ym"))
    val sized = cohorts.groupBy(col("cohort_ym"))
      .agg(count(lit(1)).as("cohort_users"))
    val cells = perUserMonth.join(cohorts, "user_id")
      .groupBy(col("cohort_ym"), (col("ym") - col("cohort_ym")).as("age"))
      .agg(sum(col("cents")).as("rev_cents"),
        count_distinct(col("user_id")).as("active_users"))
    val wCum = Window.partitionBy(col("cohort_ym")).orderBy(col("age"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells.join(broadcast(sized), "cohort_ym")
      .withColumn("cum_cents", sum(col("rev_cents")).over(wCum))
      .select(col("cohort_ym").cast("long").as("cohort_wk"),
        col("age").cast("long").as("age"), col("cohort_users"),
        col("active_users"), col("rev_cents"), col("cum_cents"),
        (col("cum_cents").cast("double") /
          col("cohort_users").cast("double")).as("ltv_per_user"))
  }

  /** Index of dispersion (Fano factor) of daily event counts per event
    * type: variance/mean — 1 for Poisson arrivals, >1 bursty, <1
    * regular; THE "is this traffic clumped" diagnostic. The whole
    * statistic reduces to (n·Σx² − (Σx)²) / (n·Σx) — exact integer
    * numerator and denominator, ONE division (no intermediate mean or
    * variance double). Days with zero events of a type count as x = 0
    * via a day-spine cross join (dropping them would bias the mean up);
    * zero-mean types → NULL.
    */
  def dispersionIndex(events: DataFrame): DataFrame = {
    val DayUs = 86400000000L
    val e = withTsUs(events)
      .withColumn("day", floorDiv(col("ts_us"), DayUs))
    val days = e.select(col("day")).distinct()
    val types = e.select(col("event_type")).distinct()
    val daily = days.crossJoin(broadcast(types))
      .join(e.groupBy(col("day"), col("event_type"))
          .agg(count(lit(1)).as("x")),
        Seq("day", "event_type"), "left_outer")
      .withColumn("x", coalesce(col("x"), lit(0L)))
    val num = col("n") * col("sxx") - col("sx") * col("sx")
    daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("event_type"), col("n"), col("sx"),
        when(col("sx") === 0, lit(null).cast("double"))
          .otherwise(num.cast("double") /
            (col("n") * col("sx")).cast("double"))
          .as("dispersion"))
  }

  /** Rolling correlation between two daily event series (clicks vs
    * purchases) over a trailing RANGE frame — "did engagement and buying
    * move together this week": all six frame moments (n, Σx, Σy, Σxy,
    * Σx², Σy²) are EXACT integer frame sums (the q62 range-frame shape),
    * and Pearson r is the fixed q74 expression over them — raw double,
    * no rounding, zero-variance frames → NULL (both engines would
    * otherwise disagree on inf/NaN). One shuffle to the O(days) frame;
    * the window is day-keyed RANGE so calendar gaps shrink the frame
    * instead of silently spanning them.
    */
  def rollingCorrelation(events: DataFrame, windowDays: Int = 7): DataFrame = {
    val DayUs = 86400000000L
    val daily = withTsUs(events)
      .withColumn("day", floorDiv(col("ts_us"), DayUs))
      .groupBy(col("day"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("x"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("y"))
    val w = Window.orderBy(col("day"))
      .rangeBetween(-(windowDays - 1).toLong, 0)
    val framed = daily.select(col("day"),
      count(lit(1)).over(w).as("n"),
      sum(col("x")).over(w).as("sx"), sum(col("y")).over(w).as("sy"),
      sum(col("x") * col("y")).over(w).as("sxy"),
      sum(col("x") * col("x")).over(w).as("sxx"),
      sum(col("y") * col("y")).over(w).as("syy"))
    val vx = col("n") * col("sxx") - col("sx") * col("sx")
    val vy = col("n") * col("syy") - col("sy") * col("sy")
    framed.select(col("day"), col("n"), col("sx"), col("sy"),
      when(vx === 0 || vy === 0, lit(null).cast("double"))
        .otherwise((col("n") * col("sxy") - col("sx") * col("sy"))
          .cast("double") /
          (sqrt(vx.cast("double")) * sqrt(vy.cast("double"))))
        .as("rolling_corr"))
  }

  /** Day-of-week seasonal baseline: each day's purchase revenue against
    * the mean of its weekday bucket — the seasonality-aware "is today
    * unusual" readout (a raw day-over-day comparison flags every weekend;
    * this doesn't). Weekday bucket is `day mod 7` (calendar labeling is
    * irrelevant to the comparison and engine-neutral this way); revenue
    * is exact cents; and the ratio to the weekday mean is computed as
    * cents·n_days / Σ_dow cents — ONE division of exact ints, no
    * intermediate mean double. One shuffle to the day frame (O(days)),
    * then a broadcast of the 7-row baseline.
    */
  def dowBaseline(events: DataFrame): DataFrame = {
    val DayUs = 86400000000L
    val daily = withTsUs(events)
      .filter(col("event_type") === "purchase")
      .withColumn("day", floorDiv(col("ts_us"), DayUs))
      .groupBy(col("day"))
      .agg((round(sum(col("value")), 2).cast("decimal(18,2)") * 100)
        .cast("long").as("cents"))
      .withColumn("dow", pmod(col("day"), lit(7L)))
    val base = daily.groupBy(col("dow"))
      .agg(sum(col("cents")).as("dow_cents"), count(lit(1)).as("dow_days"))
    daily.join(broadcast(base), "dow")
      .select(col("day"), col("dow"), col("cents"), col("dow_cents"),
        col("dow_days"),
        ((col("cents") * col("dow_days")).cast("double") /
          col("dow_cents").cast("double")).as("ratio_to_dow_mean"))
  }

  /** Peak concurrent sessions per day by sweep line over session
    * boundaries: +1 at each session start, −1 at each end, running sum in
    * (ts, delta) order — delta ascending so a session ending exactly when
    * another starts never inflates the peak — then max per boundary day.
    * Equal-timestamp same-sign boundaries commute, so the per-day max is
    * order-deterministic without a full tiebreak.
    *
    * The sweep is DAY-PARTITIONED (no single-task global sort): the
    * running sum restricted to one day equals the day's local prefix sum
    * plus a carry-in — the number of sessions open at the day's start,
    * i.e. sessions with start_day < d ≤ end_day. Each multi-day session
    * contributes carry-in to exactly the days `sequence(start_day+1,
    * end_day)`, so the carry counts come from one explode + hash
    * aggregation (linear in total session-days, fully distributed — no
    * range join, no prefix sum over days), broadcast back onto the
    * day-local sweep. Ties on (ts, delta) never cross days (same ts ⇒
    * same day), so every conc value is bit-identical to the global form.
    */
  def maxConcurrency(events: DataFrame,
                     gapUs: Long = 30L * 60 * 1000000): DataFrame = {
    val DayUs = 86400000000L
    val sess = sessionize(events, gapUs)
    val bounds = sess.select(col("start_us").as("ts"), lit(1L).as("delta"))
      .unionAll(sess.select(col("end_us").as("ts"), lit(-1L).as("delta")))
      .withColumn("day", floorDiv(col("ts"), DayUs))
    val wDay = Window.partitionBy(col("day")).orderBy(col("ts"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carry = sess
      .withColumn("sd", floorDiv(col("start_us"), DayUs))
      .withColumn("ed", floorDiv(col("end_us"), DayUs))
      .filter(col("ed") > col("sd"))
      .select(explode(sequence(col("sd") + 1, col("ed"))).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("carry_in"))
    bounds.withColumn("conc_local", sum(col("delta")).over(wDay))
      .join(broadcast(carry), Seq("day"), "left")
      .withColumn("conc",
        col("conc_local") + coalesce(col("carry_in"), lit(0L)))
      .groupBy(col("day"))
      .agg(max(col("conc")).as("peak_concurrency"),
        count(lit(1)).as("n_boundaries"))
  }

  /** Signup→purchase conversion latency percentiles by signup-week cohort:
    * per user, the first purchase strictly after the first signup; latency
    * is exact integer microseconds, and the p50/p90 cutpoints come from
    * [[graft.ops.Percentiles.sortPercentiles]] (window-sort rank pick —
    * latencies are near-unique, the q37 domain lesson). Two narrow
    * aggregations plus one percentile window; the funnel (q59) tells you
    * WHETHER users convert, this tells you HOW FAST.
    */
  def conversionLatency(events: DataFrame): DataFrame = {
    val WkUs = 7L * 86400000000L
    val e = withTsUs(events)
    val signup = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("signup_us"))
    val conv = e.filter(col("event_type") === "purchase")
      .join(signup, "user_id")
      .filter(col("ts_us") > col("signup_us"))
      .groupBy(col("user_id"), col("signup_us"))
      .agg(min(col("ts_us")).as("conv_us"))
    val lat = conv.select(
      floorDiv(col("signup_us"), WkUs).as("cohort_wk"),
      (col("conv_us") - col("signup_us")).as("latency_us"))
    graft.ops.Percentiles.sortPercentiles(lat, "cohort_wk", "latency_us",
      Seq(0.5, 0.9))
  }

  /** RFM segmentation: per purchasing user, Recency (days since last
    * purchase, against the corpus max day), Frequency (purchase count) and
    * Monetary (exact cents), each scored 1–5 by `ntile` with a `user_id`
    * tiebreak so bucket edges are deterministic, then rolled up per
    * (r,f,m) segment. The three global ntiles are single-partition windows
    * over the USER frame (not the event frame) — fine to ~10⁸ users; past
    * that, pass `distributed = true` (round 10 — previously only a
    * documented remedy): each ntile is replaced by [[gridRank]]'s bucketed
    * global rank plus [[ntileOfRank]]'s closed-form tile assignment,
    * BIT-IDENTICAL to the window form (same (key, user_id) total order,
    * same SQL tile sizes — Round10OpsSpec asserts equality in both modes)
    * with no single-task sort anywhere. The default stays the window plan:
    * optimal latency at oracle scale, and the driver-green q132 output is
    * frozen. Average spend is one division of exact ints (fp-safe on both
    * engines).
    */
  def rfmSegments(events: DataFrame,
                  distributed: Boolean = false): DataFrame = {
    val DayUs = 86400000000L
    val perUser = withTsUs(events)
      .filter(col("event_type") === "purchase")
      .withColumn("day", floorDiv(col("ts_us"), DayUs))
      .groupBy(col("user_id"))
      .agg(max(col("day")).as("last_day"),
        count(lit(1)).as("freq"),
        (round(sum(col("value")), 2).cast("decimal(18,2)") * 100)
          .cast("long").as("cents"))
    val maxDay = perUser.agg(max(col("last_day")).as("max_day"))
    val base = perUser.crossJoin(broadcast(maxDay))
      .withColumn("recency_days", col("max_day") - col("last_day"))
    val scored =
      if (!distributed)
        base
          .withColumn("r_score", ntile(5).over(
            Window.orderBy(col("recency_days"), col("user_id"))).cast("long"))
          .withColumn("f_score", ntile(5).over(
            Window.orderBy(col("freq").desc, col("user_id"))).cast("long"))
          .withColumn("m_score", ntile(5).over(
            Window.orderBy(col("cents").desc, col("user_id"))).cast("long"))
      else {
        // descending keys enter the rank as exact negations (long domain).
        // Each gridRank references its input THREE times (rows, extent
        // agg, bucket-offset agg) and the three are nested, so without
        // pinning the events-grain aggregation upstream recomputes ~3³
        // times — measured 17.8 s at sf0.1 (r12); pinning the user-grain
        // frame at entry and between passes makes each recompute a
        // memory-block read (the q64/CC Pin discipline), 17.8 → ~1.4 s.
        val withN = graft.Pin(base.crossJoin(broadcast(
          perUser.agg(count(lit(1)).as("__n")))))
        graft.Pin(gridRank(graft.Pin(gridRank(graft.Pin(gridRank(withN,
          col("recency_days"), "__rank_r")),
          -col("freq"), "__rank_f")),
          -col("cents"), "__rank_m"))
          .withColumn("r_score", ntileOfRank(col("__rank_r"), col("__n"), 5))
          .withColumn("f_score", ntileOfRank(col("__rank_f"), col("__n"), 5))
          .withColumn("m_score", ntileOfRank(col("__rank_m"), col("__n"), 5))
          .drop("__rank_r", "__rank_f", "__rank_m", "__n")
      }
    scored.groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("users"), sum(col("cents")).as("total_cents"))
      .withColumn("avg_cents",
        col("total_cents").cast("double") / col("users").cast("double"))
  }

  /** Exact integer `a div b` for non-negative column operands (the
    * column-divisor sibling of [[floorDiv]]): subtract the remainder, then
    * the division is an exact multiple.
    */
  private def colDiv(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    GraftBridge.column(IntegralDivide(
      GraftBridge.expression(a - pmod(a, b)),
      GraftBridge.expression(b),
      evalMode = org.apache.spark.sql.catalyst.expressions.EvalMode.LEGACY))
  }

  /** SQL `ntile(k)` of a 1-based global rank among `n` rows in CLOSED
    * FORM — the first `n mod k` tiles hold `ceil(n/k)` rows, the rest
    * `floor(n/k)`, exactly Spark's NTile — so tile assignment becomes
    * per-row arithmetic instead of a window. (The naive
    * `floor(k·(rank−1)/n)+1` is NOT SQL ntile: at n=7, k=5 it puts rank 4
    * in tile 3 where ntile's fat-tiles-first layout puts it in tile 2.)
    */
  private def ntileOfRank(rank: Column, n: Column, k: Int): Column = {
    val kL = lit(k.toLong)
    val q = colDiv(n, kL)
    val r = pmod(n, kL)
    val cut = r * (q + 1) // rows covered by the q+1-sized leading tiles
    when(rank <= cut, colDiv(rank - 1, q + 1) + 1)
      .otherwise(r + colDiv(rank - cut - 1, greatest(q, lit(1L))) + 1)
      .cast("long")
  }

  /** Global 1-based rank of every row under `(key asc, user_id asc)`
    * WITHOUT a single-task global sort — the
    * [[graft.ext.Curation.systematicSample]] bucketed-prefix discipline
    * on a COUNT line: rows bucket by a fixed integer grid over the key's
    * value range (monotone in the key, so ties never cross buckets), the
    * O(nBuckets) per-bucket counts prefix into each bucket's below-offset
    * (broadcast back), and below-offset + within-bucket `row_number` IS
    * the global rank, bit-identical to `row_number` over the global
    * order. One shuffle on the bucket id; every bucket sorts in parallel.
    * Envelope: key range · nBuckets must fit a long (enforced).
    */
  private def gridRank(df: DataFrame, key: Column, out: String,
                       nBuckets: Int = 1024): DataFrame = {
    val keyed = df.withColumn("__k", key.cast("long"))
    val ext = keyed.agg(min(col("__k")).as("__lo"), max(col("__k")).as("__hi"))
    val bucketed = keyed.crossJoin(broadcast(ext))
      .withColumn("__b",
        when(col("__hi") - col("__lo") <= Long.MaxValue / nBuckets,
          colDiv((col("__k") - col("__lo")) * nBuckets,
            col("__hi") - col("__lo") + 1))
          .otherwise(raise_error(format_string(
            "gridRank key range [%d, %d] overflows the %d-bucket grid; " +
              "rescale the key first",
            col("__lo"), col("__hi"), lit(nBuckets.toLong))).cast("long")))
    val boff = bucketed.groupBy(col("__b"))
      .agg(count(lit(1)).as("__bn"))
      .withColumn("__below", coalesce(
        sum(col("__bn")).over(Window.orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__b"), col("__below"))
    val wIn = Window.partitionBy(col("__b"))
      .orderBy(col("__k"), col("user_id"))
    bucketed
      .withColumn("__loc", row_number().over(wIn).cast("long"))
      .join(broadcast(boff), "__b")
      .withColumn(out, col("__below") + col("__loc"))
      .drop("__k", "__lo", "__hi", "__b", "__below", "__loc")
  }

  /** Behavioral diversity per user as Gini IMPURITY over event-type counts
    * — `1 − Σ(cᵢ/n)² = (n² − Σcᵢ²)/n²` — the entropy-shaped engagement
    * metric without the engine-unsafe logarithm: numerator and
    * denominator are exact integers, the impurity one IEEE division.
    * Two map-side-combined aggregations, no joins.
    */
  def eventDiversity(events: DataFrame): DataFrame =
    withTsUs(events)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("user_id"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("n_types"),
        sum(col("c") * col("c")).as("sum_sq"))
      .select(col("user_id"), col("n"), col("n_types"),
        ((col("n") * col("n") - col("sum_sq")).cast("double") /
          (col("n") * col("n")).cast("double")).as("gini_impurity"))

  /** Longest consecutive-day activity streak per user — the classic
    * gaps-and-islands closed form: on the distinct (user, day) frame,
    * `day − row_number()` is constant exactly within a consecutive run,
    * so runs fall out of one groupBy with no self-join and no fold.
    * Ties on length break to the EARLIEST streak.
    */
  def longestStreak(events: DataFrame): DataFrame = {
    val DayUs = 86400000000L
    val active = withTsUs(events)
      .select(col("user_id"), floorDiv(col("ts_us"), DayUs).as("day"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val runs = active
      .withColumn("g", col("day") - row_number().over(w))
      .groupBy(col("user_id"), col("g"))
      .agg(count(lit(1)).as("len"), min(col("day")).as("streak_start"))
    val pick = Window.partitionBy(col("user_id"))
      .orderBy(col("len").desc, col("streak_start"))
    runs.withColumn("rk", row_number().over(pick))
      .filter(col("rk") === 1)
      .select(col("user_id"), col("len").as("streak_len"),
        col("streak_start"))
  }

  /** Kaplan–Meier survival curve over user lifespans (days between first
    * and last activity), with users still active near the corpus edge
    * (last activity within `censorDays` of the global max day) treated as
    * RIGHT-CENSORED — the churn-analysis estimator that a naive "lifespan
    * ECDF" gets wrong by counting the still-alive as dead.
    *
    * At each distinct lifespan t: d = uncensored exits, c = censored
    * exits, n_risk = users with lifespan ≥ t (running-sum complement),
    * and S(t) = Π_{s ≤ t} (1 − d_s/n_s). The product is a sequential
    * recurrence folded in DOUBLES WITH NO ROUNDING: each factor is one
    * IEEE division of exact ints and each step one IEEE multiply, and
    * since the fold order is fixed (sorted by t) the whole chain is
    * bit-deterministic in any engine — the q86 trap was per-step ROUNDING
    * of doubles, not sequential multiplication.
    *
    * Scale shape: events collapse to per-user (first, last) in one
    * aggregation; everything after runs on the O(distinct lifespans)
    * frame.
    */
  def kaplanMeier(events: DataFrame, censorDays: Long = 3): DataFrame = {
    val DayUs = 86400000000L
    val users = withTsUs(events)
      .withColumn("day", floorDiv(col("ts_us"), DayUs))
      .groupBy(col("user_id"))
      .agg(min(col("day")).as("f"), max(col("day")).as("l"))
    val maxDay = users.agg(max(col("l")).as("maxd"))
    val spans = users.crossJoin(broadcast(maxDay))
      .select((col("l") - col("f")).as("t"),
        (col("l") >= col("maxd") - censorDays + 1).as("censored"))
    val byT = spans.groupBy(col("t"))
      .agg(sum(when(!col("censored"), 1L).otherwise(0L)).as("d"),
        sum(when(col("censored"), 1L).otherwise(0L)).as("c"))
    val wOrd = Window.orderBy(col("t"))
    val risk = byT
      .withColumn("total", sum(col("d") + col("c"))
        .over(Window.partitionBy()))
      .withColumn("exited_before", coalesce(sum(col("d") + col("c"))
        .over(wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n_risk", col("total") - col("exited_before"))
    // ordered double product fold: S_t = S_{t−1} · (n_t − d_t)/n_t
    risk
      .agg(array_sort(collect_list(struct(col("t"), col("d"), col("c"),
        col("n_risk")))).as("__vals"))
      .select(explode(expr(
        """aggregate(__vals,
          |  CAST(array() AS array<struct<t:bigint,d:bigint,c:bigint,
          |                              n_risk:bigint,s:double>>),
          |  (acc, x) -> concat(acc, array(struct(
          |    x.t AS t, x.d AS d, x.c AS c, x.n_risk AS n_risk,
          |    (CASE WHEN size(acc) = 0 THEN CAST(1 AS DOUBLE)
          |          ELSE element_at(acc, -1).s END) *
          |      (CAST(x.n_risk - x.d AS DOUBLE)
          |       / CAST(x.n_risk AS DOUBLE)) AS s))))""".stripMargin))
        .as("r"))
      .select(col("r.t").as("t"), col("r.d").as("d"), col("r.c").as("c"),
        col("r.n_risk").as("n_risk"), col("r.s").as("survival"))
  }

  /** Two-sample experiment readout (A/B shape): users split by a
    * deterministic variant hash (`user_id % 2`), the metric is per-USER
    * total purchase cents — the unit-of-analysis collapse that makes
    * per-event correlation harmless — and the output is one row with both
    * variants' exact moments, means/variances, and the Welch t statistic.
    *
    * Parity: per-user totals are exact cents (2-dp round of the one fp
    * sum, the protected class); group moments Σx, Σx² are exact longs;
    * mean/variance/t are a FIXED chain of IEEE ops over those exact ints
    * — bit-identical in any engine. Scale: two aggregations (events →
    * users → variants), both map-side combined; the final row is O(1).
    */
  def abTestReadout(events: DataFrame): DataFrame = {
    // cents via DECIMAL, never double·100→long: Spark's double→long cast
    // truncates while DuckDB's rounds, so 48.19·100 = 4818.999… would
    // diverge; the decimal route is exact on both sides
    val userCents = withTsUs(events)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg((round(sum(col("value")), 2).cast("decimal(18,2)") * 100)
        .cast("long").as("cents"))
    val v = userCents
      .groupBy((col("user_id") % 2).as("variant"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("s1"),
        sum(col("cents") * col("cents")).as("s2"))
    def stat(c: String)(x: Column): Column = max(when(col("variant") === lit(c.toLong), x))
    val wide = v.agg(
      stat("0")(col("n")).as("n0"), stat("1")(col("n")).as("n1"),
      stat("0")(col("s1")).as("s1_0"), stat("1")(col("s1")).as("s1_1"),
      stat("0")(col("s2")).as("s2_0"), stat("1")(col("s2")).as("s2_1"))
    def mean(s1: Column, n: Column): Column =
      s1.cast("double") / n.cast("double")
    def svar(n: Column, s1: Column, s2: Column): Column =
      (n * s2 - s1 * s1).cast("double") / (n * (n - 1)).cast("double")
    wide.select(col("n0"), col("n1"),
        mean(col("s1_0"), col("n0")).as("mean0"),
        mean(col("s1_1"), col("n1")).as("mean1"),
        svar(col("n0"), col("s1_0"), col("s2_0")).as("var0"),
        svar(col("n1"), col("s1_1"), col("s2_1")).as("var1"))
      .withColumn("t_welch",
        (col("mean1") - col("mean0")) /
          sqrt(col("var1") / col("n1").cast("double") +
            col("var0") / col("n0").cast("double")))
  }

  /** Sample-ratio-mismatch (SRM) check — the experiment-health gate that
    * runs BEFORE any A/B readout is believed: users are assigned to two
    * arms by the engine-neutral `spread` hash and the observed split is
    * tested against 50/50. The arm bit is a MIDDLE bit (bit 15) of the
    * hash — the low bit of an affine hash with an odd multiplier is just
    * the input's parity (consecutive ids would split exactly 50/50 and
    * the check could never fire), the standard multiplicative-hashing
    * bucketing caveat. For two equal-expected arms the chi-square
    * statistic collapses to the closed form (n_a − n_b)² / n — numerator
    * and denominator exact integers, one terminal IEEE division (a
    * chi2 ≳ 3.84 split is broken assignment, not noise).
    *
    * Scale: one distinct-user aggregation, O(1) output.
    */
  def srmCheck(events: DataFrame): DataFrame =
    events.select(col("user_id")).distinct()
      .select(pmod(colDiv(
        graft.functions.Hashing.spread(col("user_id"), 1L << 31),
        lit(1L << 15)), lit(2L)).as("arm"))
      .agg(
        count(lit(1)).as("n_users"),
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"))
      .select(col("n_users"), col("n_a"), col("n_b"),
        ((col("n_a") - col("n_b")) * (col("n_a") - col("n_b")))
          .as("chi2_num"),
        col("n_users").as("chi2_den"))
      .withColumn("chi2",
        col("chi2_num").cast("double") / col("chi2_den").cast("double"))

  /** CUPED variance-reduced A/B readout (Deng et al.'s controlled-pre-
    * experiment adjustment, the experimentation-platform standard): per
    * user, pre-period revenue x (days before the midpoint cut) and
    * post-period revenue y; θ = cov(x,y)/var(x) pooled over users;
    * per variant, mean_adj = mean(y) − θ·(mean(x) − mean_all(x)).
    *
    * Exactness discipline (the q74/q77 law): every sufficient statistic
    * and every CENTERED numerator stays exact integer/decimal — covN =
    * N·Σxy − Σx·Σy, varN = N·Σx² − (Σx)², and the adjusted mean is ONE
    * division of exact integers via
    *   mean_adj = (sy_v·varN·N − covN·(sx_v·N − SX·n_v)) / (n_v·varN·N),
    * so no multiply-into-add ever runs on doubles. Magnitude envelope:
    * the numerator crosses 38 digits around 10³× the sf0.1 corpus —
    * past that, scale cents to dollars first.
    *
    * Scale shape: one (user, period) aggregation over the scan, one
    * user-level aggregation to pooled moments (1-row broadcast) + variant
    * moments (2 rows). Everything after the two hash aggs is row-lattice
    * arithmetic.
    */
  def cupedReadout(events: DataFrame): DataFrame = {
    val DayUs = 86400000000L
    val p = withTsUs(events)
      .filter(col("event_type") === "purchase")
      .withColumn("day", floorDiv(col("ts_us"), DayUs))
    val span = p.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select((col("lo") + ((col("hi") - col("lo") + 1) / 2)
        .cast("long")).as("cut"))
    val userXY = p.crossJoin(broadcast(span))
      .groupBy(col("user_id"))
      .agg(
        (round(sum(when(col("day") < col("cut"), col("value"))
          .otherwise(0.0)), 2).cast("decimal(18,2)") * 100)
          .cast("long").as("x"),
        (round(sum(when(col("day") >= col("cut"), col("value"))
          .otherwise(0.0)), 2).cast("decimal(18,2)") * 100)
          .cast("long").as("y"))
    val pooled = userXY.agg(
      count(lit(1)).cast("decimal(20,0)").as("nn"),
      sum(col("x")).cast("decimal(38,0)").as("sx"),
      sum(col("y")).cast("decimal(38,0)").as("sy"),
      sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"),
      sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"))
    val moments = pooled.select(col("nn"), col("sx"),
      (col("nn") * col("sxy") - col("sx") * col("sy"))
        .cast("decimal(38,0)").as("covn"),
      (col("nn") * col("sxx") - col("sx") * col("sx"))
        .cast("decimal(38,0)").as("varn"))
    val variants = userXY
      .groupBy((col("user_id") % 2).as("variant"))
      .agg(count(lit(1)).as("n_v"),
        sum(col("x")).as("sx_v"), sum(col("y")).as("sy_v"))
    variants.crossJoin(broadcast(moments))
      .select(col("variant"), col("n_v"), col("sx_v"), col("sy_v"),
        (col("sy_v").cast("double") / col("n_v").cast("double"))
          .as("mean_post"),
        when(col("varn") > 0,
          col("covn").cast("double") / col("varn").cast("double"))
          .as("theta"),
        when(col("varn") > 0,
          (col("sy_v") * col("varn") * col("nn") -
            col("covn") * (col("sx_v") * col("nn") - col("sx") * col("n_v")))
            .cast("decimal(38,0)").cast("double") /
            (col("n_v") * col("varn") * col("nn")).cast("decimal(38,0)")
              .cast("double"))
          .as("mean_adj"))
  }

  /** Saturating running balance: per user, `bal_d = max(0, bal_{d-1} +
    * net_d)` over the ordered daily net flow (purchase credits minus
    * 'error' chargebacks) — the inventory/credit/token-bucket recurrence.
    * The floor makes the fold NON-ASSOCIATIVE (no window frame or prefix
    * sum expresses it), so like the EMA it runs as an ordered per-group
    * array fold in EXACT DECIMAL, per the recurrence parity law (NOTES:
    * round/clamp per step only in decimal, never in doubles).
    *
    * Scale shape: the event stream collapses to O(users · active-days)
    * daily rows in one aggregation; each user's fold input is their
    * day-series (thousands at most, independent of event volume). Output
    * doubles are casts of exact decimals.
    */
  def cappedRunningBalance(events: DataFrame): DataFrame = {
    val DayUs = 86400000000L
    val zero = lit(new java.math.BigDecimal("0.00")).cast("decimal(18,2)")
    val daily = withTsUs(events)
      .withColumn("day", floorDiv(col("ts_us"), DayUs))
      .groupBy(col("user_id"), col("day"))
      .agg((coalesce(round(sum(when(col("event_type") === "purchase",
            col("value"))), 2), lit(0.0)) -
          coalesce(round(sum(when(col("event_type") === "error",
            col("value"))), 2), lit(0.0)))
        .cast("decimal(18,2)").as("net"))
    val folded = daily.groupBy(col("user_id"))
      .agg(array_sort(collect_list(struct(col("day"), col("net"))))
        .as("__vals"))
      .select(col("user_id"), aggregate(
        col("__vals"),
        array().cast("array<struct<day:bigint,net:decimal(18,2),bal:decimal(18,2)>>"),
        (acc, x) => concat(acc, array(struct(
          x.getField("day").as("day"),
          x.getField("net").as("net"),
          // size guard, not try_element_at: ANSI element_at(acc, -1)
          // throws on the empty accumulator of the first step
          when(size(acc) === 0, greatest(zero, x.getField("net")))
            .otherwise(greatest(zero,
              (element_at(acc, -1).getField("bal") + x.getField("net"))
                .cast("decimal(18,2)")))
            .cast("decimal(18,2)").as("bal"))))).as("__series"))
    folded
      .select(col("user_id"), explode(col("__series")).as("s"))
      .select(col("user_id"), col("s.day").as("day"),
        col("s.net").cast("double").as("net"),
        col("s.bal").cast("double").as("bal"))
  }

  /** Growth accounting: every active day classified per user as NEW (first
    * day ever), RETAINED (also active the previous day), or RESURRECTED
    * (returning after ≥1 idle day); CHURNED users are attributed to the
    * day after their last consecutive active day (lead-based, so the
    * classification needs no self-join against tomorrow). The
    * new/retained/resurrected/churned ledger per day is the standard
    * product-growth decomposition (cf. the Social Capital "growth
    * accounting" framework).
    *
    * Scale shape: the event stream collapses to the (user, active-day)
    * frame in one aggregation; lag/lead run on the user-partitioned sort
    * of THAT frame (≪ events); the final day rollups are map-side-combined
    * counts. Churn is a second tiny aggregation of the same frame,
    * full-outer-merged onto the activity ledger — days with only churn
    * still appear.
    */
  def growthAccounting(events: DataFrame): DataFrame = {
    val DayUs = 86400000000L
    val active = withTsUs(events)
      .select(col("user_id"), floorDiv(col("ts_us"), DayUs).as("day"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val classified = active
      .withColumn("prev", lag(col("day"), 1).over(w))
      .withColumn("next", lead(col("day"), 1).over(w))
      .withColumn("status",
        when(col("prev").isNull, "new")
          .when(col("prev") === col("day") - 1, "retained")
          .otherwise("resurrected"))
    val ledger = classified.groupBy(col("day"))
      .agg(
        sum(when(col("status") === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when(col("status") === "retained", 1L).otherwise(0L))
          .as("n_retained"),
        sum(when(col("status") === "resurrected", 1L).otherwise(0L))
          .as("n_resurrected"))
    // a user churns the day after a run of activity ends (next absent or
    // non-adjacent); the last run of the corpus churns too — the batch
    // frame has no "still active" horizon
    val churn = classified
      .filter(col("next").isNull || col("next") > col("day") + 1)
      .groupBy((col("day") + 1).as("day"))
      .agg(count(lit(1)).as("n_churned"))
    ledger.join(churn, Seq("day"), "full_outer")
      .select(col("day"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"),
        coalesce(col("n_churned"), lit(0L)).as("n_churned"))
  }

  /** Multi-stage funnel analysis: for an ordered stage list (event types),
    * the first time each user completed stage i+1 STRICTLY AFTER their
    * stage-i completion and within `convWindowUs` of it. Classic product
    * analytics; the reference has no analog (extension operator).
    *
    * Shape: one aggregation per stage over the (pre-filtered) event scan,
    * chained by equi-joins on user_id — every step is partition-parallel on
    * the user key, and at 100 TB each stage's frame is one-row-per-user
    * (≪ the event stream), so the chain joins are cheap next to the scan.
    * An alternative single-window formulation (collect each user's events,
    * walk once) trades the joins for one big per-user state — this form
    * keeps memory flat per task.
    *
    * @return one row per user who completed stage 1: user_id, t_<stage>
    *         micros for each completed stage (null otherwise), stage_reached
    */
  def funnel(events: DataFrame, stages: Seq[String],
             convWindowUs: Long = 86400000000L): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct == stages,
      s"funnel stages must be distinct (t_<stage> column names collide): $stages")
    val e = withTsUs(events)
      .select(col("user_id"), col("event_type"), col("ts_us"))
    var cur = e.filter(col("event_type") === stages.head)
      .groupBy(col("user_id")).agg(min(col("ts_us")).as(s"t_${stages.head}"))
    var out = cur
    for ((st, i) <- stages.tail.zipWithIndex) {
      val prev = s"t_${stages(i)}"
      cur = e.filter(col("event_type") === st)
        .join(cur.select(col("user_id"), col(prev)), "user_id")
        .filter(col("ts_us") > col(prev) &&
          col("ts_us") <= col(prev) + convWindowUs)
        .groupBy(col("user_id")).agg(min(col("ts_us")).as(s"t_$st"))
      out = out.join(cur.select(col("user_id"), col(s"t_$st")),
        Seq("user_id"), "left_outer")
    }
    // stage_reached = highest non-null stage timestamp (stages nest: a
    // completed stage i+1 implies a completed stage i)
    val stageNo = stages.zipWithIndex.reverse
      .foldLeft(when(lit(false), lit(0L))) { case (acc, (st, i)) =>
        acc.when(col(s"t_$st").isNotNull, lit(i + 1L))
      }.otherwise(0L)
    out.withColumn("stage_reached", stageNo)
  }

  /** Rolling time-RANGE window (distinct from q38's row-count frames): per
    * user, count and value-sum of events in the trailing `windowUs`
    * microseconds of EVENT TIME — rows with equal timestamps share a frame,
    * so the result is order-independent under ties (row frames are not).
    * One shuffle on the partition key; frame bounds are exact integer µs.
    */
  def rollingRange(events: DataFrame, windowUs: Long = 86400000000L,
                   userPred: Column = lit(true)): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(-windowUs, Window.currentRow)
    withTsUs(events)
      .filter(userPred)
      .select(col("event_id"), col("user_id"), col("ts_us"),
        count(lit(1)).over(w).cast("long").as("n_24h"),
        round(sum(col("value")).over(w), 2).as("sum_24h"))
  }

  private val DayUsL = 86400000000L

  /** Cohort retention matrix: users are cohorted by their first active day;
    * each cohort's distinct-user count per week offset (plus the exact
    * retention ratio) is the classic product-analytics triangle.
    *
    * Scale shape: everything derives from the distinct (user, day) frame —
    * one dedup shuffle bounds all later work by active-user-days, not raw
    * events; the per-user min-day window shuffles that compressed frame
    * once more on user_id. Output is O(cohorts · weeks) — dashboard-sized
    * at any corpus scale. Parity: counts are exact; retention is one IEEE
    * division of exact ints (< 2^53) → bit-identical raw, no rounding.
    */
  def cohortRetention(events: DataFrame): DataFrame = {
    val ud = withTsUs(events)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), floorDiv(col("ts_us"), DayUsL).as("day"))
      .distinct()
    val withCohort = ud.withColumn("cohort_day",
      min(col("day")).over(Window.partitionBy(col("user_id"))))
    val mat = withCohort
      .groupBy(col("cohort_day"),
        expr("(day - cohort_day) div 7").as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
    val sizes = withCohort.filter(col("day") === col("cohort_day"))
      .groupBy(col("cohort_day"))
      .agg(countDistinct(col("user_id")).as("cohort_size"))
    mat.join(broadcast(sizes), "cohort_day")
      .select(col("cohort_day"), col("week_offset"), col("n_active"),
        col("cohort_size"),
        (col("n_active").cast("double") / col("cohort_size").cast("double"))
          .as("retention"))
  }

  /** Trailing 7-day distinct users per active day — the "weekly active
    * users" series, EXACT. `count(distinct)` cannot run over a sliding
    * window frame, and trailing distinct counts don't merge from daily
    * ones; the distributed-exact trick is to EXPLODE each (user, day) into
    * the ≤7 target days it can serve, then one distinct-count per target
    * day. Shuffle volume is 7× the deduped user-day frame (not 7× the raw
    * events) — the bounded-interval-explode pattern q94 uses for occupancy.
    * (At larger windows the sketch alternative is per-day HLL merges; this
    * operator is the exact form.)
    */
  def trailingDistinctUsers(events: DataFrame, windowDays: Int = 7): DataFrame = {
    val ud = withTsUs(events)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), floorDiv(col("ts_us"), DayUsL).as("day"))
      .distinct()
    val targets = ud
      .select(col("user_id"),
        explode(sequence(col("day"), col("day") + lit(windowDays - 1)))
          .as("t_day"))
      .distinct()
    val daily = ud.groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("n_users_1d"))
    val trailing = targets
      .join(broadcast(daily.select(col("day").as("t_day"))), "t_day")
      .groupBy(col("t_day"))
      .agg(countDistinct(col("user_id")).as("n_users_7d"))
    daily.join(broadcast(trailing.withColumnRenamed("t_day", "day")), "day")
      .select(col("day"), col("n_users_1d"), col("n_users_7d"))
  }

  /** Query entries. */
  def qSessionize(spark: SparkSession, sfDir: String): DataFrame =
    sessionize(Tables.events(spark, sfDir))

  def qTumbling(spark: SparkSession, sfDir: String): DataFrame =
    tumbling(Tables.events(spark, sfDir))

  def qGapfill(spark: SparkSession, sfDir: String): DataFrame =
    gapfillDaily(Tables.events(spark, sfDir))

  def qFunnel(spark: SparkSession, sfDir: String): DataFrame =
    funnel(Tables.events(spark, sfDir), Seq("view", "click", "purchase"))

  def qRollingRange(spark: SparkSession, sfDir: String): DataFrame =
    rollingRange(Tables.events(spark, sfDir), userPred = col("user_id") < 20)

  /** Upward CUSUM changepoint detector over the daily event-count
    * series (Page 1954, public literature): S_d = max(0, S_{d−1} +
    * (x_d − μ − k)) with allowance k = μ/4 and decision threshold
    * h = μ — the drift detector a data-volume monitor runs against
    * ingest rates (a sustained level shift fires long before a
    * per-day z-score would).
    *
    * The recursive max-clamp fold LOOKS path-dependent but has the
    * classic closed form `S_d = P_d − min(0, min_{j≤d} P_j)` with P the
    * prefix sum of the drift residuals — so it runs as TWO stacked
    * window passes (running sum, then running min) over the day-grain
    * frame, never a sequential replay. Exactness: residuals are scaled
    * by 4N (a_d = 4·N·x_d − 5·T, with N days and T total events), so
    * every S is an exact integer in quarter-count·N units; the alarm
    * predicate S > 4·T·scale is an exact integer comparison.
    *
    * Scale shape: one day-grain hash aggregation (events → N rows,
    * partial agg at the scan), then windows over the TINY day frame
    * (N = calendar days, thousands at most — the single-partition
    * window is over a bounded-cardinality series, the q66/q121 gated
    * envelope).
    *
    * @return per day: day, x, p_scaled, s_scaled, alarm, plus the
    *         constant n_days/total columns the alarm derives from
    */
  def cusumDaily(events: DataFrame): DataFrame = {
    val DayUs = 86400000000L
    val daily = withTsUs(events)
      .withColumn("day", floorDiv(col("ts_us"), DayUs))
      .groupBy(col("day")).agg(count(lit(1)).as("x"))
    val sized = daily
      .withColumn("n_days", count(lit(1)).over(Window.partitionBy()))
      .withColumn("total", sum(col("x")).over(Window.partitionBy()))
    val ordered = Window.partitionBy().orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    sized
      .withColumn("a", col("x") * 4L * col("n_days") - col("total") * 5L)
      .withColumn("p_scaled", sum(col("a")).over(ordered))
      .withColumn("s_scaled",
        col("p_scaled") - least(lit(0L), min(col("p_scaled")).over(ordered)))
      .select(col("day"), col("x"), col("n_days"), col("total"),
        col("p_scaled"), col("s_scaled"),
        (col("s_scaled") > col("total") * 4L).as("alarm"))
  }
}
