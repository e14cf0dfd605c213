package graft.ops

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MERGE INTO semantics (the lakehouse upsert): reconcile a change batch
  * against a target table in one pass —
  * WHEN MATCHED AND <cond> THEN DELETE / WHEN MATCHED THEN UPDATE /
  * WHEN NOT MATCHED THEN INSERT, plus untouched target rows pass through.
  *
  * Implementation is the shuffle-join core every table format's MERGE runs:
  * one full-outer join on the key, then a per-row CASE over the three match
  * states. No driver-side logic, one shuffle (or zero with bucketed/
  * co-partitioned inputs).
  *
  * Scale notes: at 100 TB the join is the easy part — the real cost in a
  * lakehouse MERGE is rewriting target FILES, which is why the standard
  * optimization prunes target files to those that can contain source keys
  * (bloom filter / manifest min-max, both demonstrated in this repo:
  * RuntimeFilterSpec, Sinks.filesOverlapping) before the join. The CASE
  * semantics below are unchanged by that pruning.
  */
object Merge {

  /** Generic single-key MERGE.
    *
    * @param updateSet   (column → new value) applied to matched rows
    *                    (evaluated over the joined row: target cols + source
    *                    cols both visible)
    * @param insertRow   value per target column for source-only rows
    * @param deleteWhen  matched rows satisfying this are dropped
    * @return target-schema rows + `action` column (keep/update/insert;
    *         deletes are absent)
    */
  def mergeInto(target: DataFrame, source: DataFrame, key: String,
                updateSet: Seq[(String, Column)],
                insertRow: Seq[(String, Column)],
                deleteWhen: Column = lit(false)): DataFrame = {
    val tCols = target.columns.toSeq
    val joined = target.as("t")
      .join(source.as("s"), col(s"t.$key") === col(s"s.$key"), "full_outer")
    val matched = col(s"t.$key").isNotNull && col(s"s.$key").isNotNull
    val sourceOnly = col(s"t.$key").isNull
    val updateMap = updateSet.toMap
    val insertMap = insertRow.toMap
    val out = tCols.map { c =>
      when(sourceOnly, insertMap(c))
        .when(matched && !deleteWhen,
          updateMap.getOrElse(c, col(s"t.$c")))
        .otherwise(col(s"t.$c"))
        .as(c)
    }
    val action =
      when(sourceOnly, lit("insert"))
        .when(matched && deleteWhen, lit("delete"))
        .when(matched, lit("update"))
        .otherwise(lit("keep"))
        .as("action")
    joined.select(out :+ action: _*)
      .filter(col("action") =!= "delete")
  }

  /** Driver query: customer dimension merged with an order-derived change
    * batch — matched customers get their 1997+ revenue folded into acctbal
    * (exact decimal cents), heavy negative balances with no recent orders
    * are deleted, and synthetic out-of-range keys insert as new customers.
    */
  def q103MergeUpsert(spark: SparkSession, d: String): DataFrame = {
    val cust = customer(spark, d)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("c_acctbal").cast("decimal(18,2)").as("c_acctbal"))
    val maxKey = cust.agg(max(col("c_custkey")).as("mk"))
    // change batch: per-customer 1997+ order revenue (exact decimal), with
    // every 100th key shifted past the key space → an INSERT
    val src = orders(spark, d)
      .filter(year(col("o_orderdate")) >= 1997)
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("delta"),
        count(lit(1)).as("n_orders"))
      .crossJoin(broadcast(maxKey))
      .select(
        when(col("o_custkey") % 100 === 0, col("o_custkey") + col("mk"))
          .otherwise(col("o_custkey")).as("c_custkey"),
        col("delta"), col("n_orders"))
    mergeInto(
      cust, src, "c_custkey",
      updateSet = Seq(
        "c_acctbal" -> (col("t.c_acctbal") + col("s.delta"))
          .cast("decimal(18,2)")),
      insertRow = Seq(
        "c_custkey" -> col("s.c_custkey"),
        "c_name" -> concat(lit("Customer#new#"), col("s.c_custkey")),
        "c_mktsegment" -> lit("MERGED"),
        "c_acctbal" -> col("s.delta").cast("decimal(18,2)")),
      deleteWhen = col("t.c_acctbal") < -900)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("c_acctbal").cast("double").as("c_acctbal"), col("action"))
  }

  /** Snapshot diff ledger — the readout side of CDC/lakehouse versioning
    * (q103 APPLIES changes; this MEASURES them): per group, how many keys
    * were added / removed / changed / unchanged between two table
    * versions, plus churn = changed-or-moved rows over the union (one
    * integer division). One full-outer join on the key computes all four
    * classes in a single pass — never one scan per class.
    *
    * The two versions are deterministic slices of `orders` (v1 drops keys
    * ≡0 mod 10, v2 drops ≡9 and shifts every ≡0-mod-7 price by +1.00) —
    * the same simulated-change technique as q103's synthetic inserts.
    */
  def q159SnapshotDiff(spark: SparkSession, d: String): DataFrame = {
    val base = orders(spark, d).select(col("o_orderkey"),
      col("o_orderstatus"),
      (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
        .as("cents"))
    val v1 = base.filter(col("o_orderkey") % 10 =!= 0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("cents").as("cents1"))
    val v2 = base.filter(col("o_orderkey") % 10 =!= 9)
      .select(col("o_orderkey"), col("o_orderstatus").as("status2"),
        (col("cents") + when(col("o_orderkey") % 7 === 0, 100L)
          .otherwise(0L)).as("cents2"))
    v1.join(v2, Seq("o_orderkey"), "full_outer")
      .select(coalesce(col("o_orderstatus"), col("status2")).as("status"),
        when(col("cents1").isNull, "added")
          .when(col("cents2").isNull, "removed")
          .when(col("cents1") =!= col("cents2"), "changed")
          .otherwise("unchanged").as("cls"))
      .groupBy(col("status"))
      .agg(
        sum(when(col("cls") === "added", 1L).otherwise(0L)).as("n_added"),
        sum(when(col("cls") === "removed", 1L).otherwise(0L))
          .as("n_removed"),
        sum(when(col("cls") === "changed", 1L).otherwise(0L))
          .as("n_changed"),
        sum(when(col("cls") === "unchanged", 1L).otherwise(0L))
          .as("n_unchanged"))
      .withColumn("churn",
        (col("n_added") + col("n_removed") + col("n_changed"))
          .cast("double") /
          (col("n_added") + col("n_removed") + col("n_changed") +
            col("n_unchanged")).cast("double"))
  }
}
