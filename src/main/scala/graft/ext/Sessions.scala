package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** ts (ns long) → µs long — integer truncation, parity with the oracle's
    * µs-truncated read of the same column.
    */
  def withTsUs(events: DataFrame): DataFrame =
    events.withColumn("ts_us", expr("ts div 1000"))

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
    * bucket = floor(ts_us / windowUs), per (bucket, event_type) counts and
    * value sums.
    */
  def tumbling(events: DataFrame, windowUs: Long = 3600L * 1000000): DataFrame =
    withTsUs(events)
      .withColumn("bucket", expr(s"ts_us div ${windowUs}L"))
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
