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
