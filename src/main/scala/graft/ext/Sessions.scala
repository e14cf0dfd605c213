package graft.ext

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time operators over the `events` table: gap-based sessionization and
  * tumbling windows. The batch forms are the oracle-checked contract; the
  * streaming forms (same semantics) live in `graft.streaming`.
  *
  * All event-time arithmetic is integer microseconds (`ts` arrives as ns
  * longs, see [[graft.Tables.events]]; the DuckDB oracle's parquet reader
  * truncates the same column to µs) — exact, timezone-free parity.
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
  private def floorDiv(a: Column, b: Long): Column = {
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

  /** Query entries. */
  def qSessionize(spark: SparkSession, sfDir: String): DataFrame =
    sessionize(Tables.events(spark, sfDir))

  def qTumbling(spark: SparkSession, sfDir: String): DataFrame =
    tumbling(Tables.events(spark, sfDir))
}
