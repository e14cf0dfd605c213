package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for hot keys at scale.
  *
  * Spark's own mitigations come first: map-side partial aggregation makes
  * plain `groupBy().agg()` skew-tolerant for algebraic aggregates, and AQE
  * splits skewed shuffle-join partitions at runtime. These helpers cover the
  * remaining shapes: holistic aggregations where one hot key's whole group
  * would land on a single task, and shuffle joins whose hot side AQE can't
  * split (e.g. when the join is followed by a key-preserving aggregation).
  */
object Skew {

  /** Deterministic salt in [0, buckets) derived from a row-unique column —
    * reproducible across task retries (a `rand()` salt would not be).
    */
  def salt(rowId: Column, buckets: Int): Column =
    pmod(hash(rowId), lit(buckets))

  /** Count rows per key in two phases — (key, salt) partial, then key
    * final — bounding any task's share of a hot key to ~1/buckets.
    * Result-identical to `groupBy(key).count()` (counts are exact integers;
    * no accumulation-order sensitivity).
    */
  def saltedCount(df: DataFrame, key: String, rowId: String,
                  buckets: Int = 16): DataFrame =
    df.groupBy(col(key), salt(col(rowId), buckets).as("__salt"))
      .agg(count(lit(1)).as("__cnt"))
      .groupBy(col(key))
      .agg(sum(col("__cnt")).as("n"))

  /** Sum a column per key, two-phase (see [[saltedCount]]).
    *
    * Result-identical to `groupBy(key).sum(valueCol)` for exact types
    * (integral, decimal). For floating-point columns the two-phase plan
    * changes fp accumulation order, so results can differ in the last ulp —
    * same caveat as any Spark shuffle re-plan; round aggregated doubles
    * before comparing across plans (repo parity rule 2).
    */
  def saltedSum(df: DataFrame, key: String, valueCol: String, rowId: String,
                buckets: Int = 16): DataFrame =
    df.groupBy(col(key), salt(col(rowId), buckets).as("__salt"))
      .agg(sum(col(valueCol)).as("__s"))
      .groupBy(col(key))
      .agg(sum(col("__s")).as(s"sum_$valueCol"))

  /** Order-insensitive per-key collection (holistic — the case partial
    * aggregation can't help): collect per (key, salt), then flatten. The
    * result array is sorted to make the operator deterministic.
    */
  def saltedCollectSet(df: DataFrame, key: String, valueCol: String,
                       rowId: String, buckets: Int = 16): DataFrame =
    df.groupBy(col(key), salt(col(rowId), buckets).as("__salt"))
      .agg(collect_set(col(valueCol)).as("__part"))
      .groupBy(col(key))
      .agg(array_sort(array_distinct(flatten(collect_list(col("__part")))))
        .as(s"${valueCol}_set"))

  /** Skew join: salt the (hot) left side, replicate the right side across
    * all salt buckets, join on (key, salt). Row-identical to a plain inner
    * join on `key`; one hot key spreads over `buckets` tasks at the cost of
    * a `buckets`× blowup of the (small) right side.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 leftRowId: String, buckets: Int = 16): DataFrame = {
    val l = left.withColumn("__salt", salt(col(leftRowId), buckets))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /** The skew PLAYBOOK capstone (q233) — the measured form of the
    * engine's hot-key posture, not an asserted one: a deliberately skewed
    * fact (≈80% of event rows collapse onto hot_key 0; the rest spread
    * over the user_id%100 tail ending in 8/9) goes through the
    * [[saltedJoin]] pattern against a key-grain dim, and the OUTPUT
    * exposes the balance the salt bought. Per key: row count, salt-bucket
    * occupancy (used / max / min — the hot key must fill every bucket
    * with max ≈ min ≈ n/buckets, which is exactly the property that
    * bounds any one task's share at scale), and the dim-enriched exact
    * cents sum, which the oracle computes WITHOUT salting — proving the
    * salted join row-identical to the plain join, the contract
    * [[saltedJoin]] claims.
    *
    * The salt is the engine-neutral [[graft.functions.Hashing.mix40]] of
    * the row-unique event_id (a bare affine salt has the q136/q217
    * three-distance structure; Spark's Murmur3 `hash` would be faster but
    * not oracle-replayable). AQE's own skew-join split is the OTHER half
    * of the playbook — it needs no code, only
    * `spark.sql.adaptive.skewJoin.enabled` (default true) — and
    * SkewSpec demonstrates it splitting a skewed SMJ partition at
    * forced-small thresholds.
    *
    * Scale shape: two hash aggregations — (key, salt) grain then key
    * grain — and one broadcast-replicated dim join; no global window, no
    * single-partition stage; every per-task unit is ≤ ~n_hot/buckets.
    *
    * @return hot_key, n_rows, n_buckets_used, bucket_max, bucket_min,
    *         sum_weighted_cents
    */
  def skewPlaybook(events: DataFrame, buckets: Int = 16): DataFrame = {
    val fact = events.select(
      when(pmod(col("user_id"), lit(10L)) < 8, lit(0L))
        .otherwise(pmod(col("user_id"), lit(100L))).as("hot_key"),
      col("event_id"), col("value"))
    val salted = fact.withColumn("__salt",
      pmod(graft.functions.Hashing.mix40(col("event_id")),
        lit(buckets.toLong)))
    // key-grain dim with a derived weight; replicated across every salt
    // bucket (the saltedJoin replicate side — buckets× a BROADCAST-sized
    // frame)
    val dim = fact.select(col("hot_key")).distinct()
      .withColumn("weight", col("hot_key") + lit(1L))
    val dimX = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    val joined = salted.join(broadcast(dimX), Seq("hot_key", "__salt"))
    val perBucket = joined.groupBy(col("hot_key"), col("__salt"))
      .agg(count(lit(1)).as("bn"),
        sum((round(col("value"), 2).cast("decimal(18,2)") * 100)
          .cast("long") * col("weight")).as("wc"))
    perBucket.groupBy(col("hot_key"))
      .agg(sum(col("bn")).as("n_rows"),
        count(lit(1)).as("n_buckets_used"),
        max(col("bn")).as("bucket_max"),
        min(col("bn")).as("bucket_min"),
        sum(col("wc")).as("sum_weighted_cents"))
  }

  /** Rendezvous (highest-random-weight) shard assignment and the movement
    * matrix of a resize: shard(key) = argmax over shards of a per-(key,
    * shard) integer hash, so growing `nOld → nNew` shards moves ONLY the
    * keys whose argmax lands on a new shard (expected fraction
    * (nNew−nOld)/nNew) — the minimal-movement property `hash mod n` lacks
    * (mod reshuffles nearly everything). The movement matrix (old shard →
    * new shard → key count) is the rebalance plan and its audit.
    *
    * Per-row argmax is an `array_sort(transform(...))[0]` over the shard
    * list (no join, no shuffle for assignment — kmeansStep's collapse);
    * the matrix rollup is one ≤ nOld·nNew-group aggregation. Hashing is
    * the engine-neutral LCG mix, exact in longs.
    */
  def rendezvousMovement(keys: DataFrame, keyCol: String,
                         nOld: Int = 8, nNew: Int = 9): DataFrame = {
    def shardOf(n: Int): Column = expr(
      s"""array_sort(transform(sequence(0, ${n - 1}, 1),
         |  s -> struct(
         |    -pmod(($keyCol * 31 + s) * 2654435761 + 1013904223,
         |          2147483648) AS neg,
         |    s AS shard)))[0].shard""".stripMargin).cast("long")
    keys
      .withColumn("shard_old", shardOf(nOld))
      .withColumn("shard_new", shardOf(nNew))
      .groupBy(col("shard_old"), col("shard_new"))
      .agg(count(lit(1)).as("n"))
      .withColumn("moved", col("shard_old") =!= col("shard_new"))
  }
}
