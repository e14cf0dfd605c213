package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

import graft.plans.RuntimeFilters

/** The two standard runtime scale levers, demonstrated and measured:
  *
  *  - bloom-filter join pruning: the injected `bloom_filter_might_contain`
  *    must appear on the fact side, and the fact side's shuffle must write
  *    measurably fewer records than the unpruned plan — the point of the
  *    technique is shuffle-volume reduction, so that is what's asserted;
  *  - AQE skew-join split: `skew=true` on the shuffle join under a hot key,
  *    with rows identical to both the plain join and the manual
  *    [[graft.ext.Skew.saltedJoin]] alternative.
  */
class RuntimeFilterSpec extends SparkSuite {

  /** Records written by all shuffles in the executed plan (AQE-aware). */
  private def shuffleRecords(plan: SparkPlan): Long = {
    val concrete = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    concrete.collect {
      case s: ShuffleExchangeLike =>
        s.metrics.get("shuffleRecordsWritten").map(_.value).getOrElse(0L)
    }.sum
  }

  test("bloom-filter pruning: filter injected on fact side, shuffle records drop") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val dim = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))

    // unpruned baseline: same shuffle join, bloom injection off
    val off = RuntimeFilters.withConfs(spark,
      RuntimeFilters.bloomPruneConfs() :+
        ("spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false")) {
      val j = RuntimeFilters.bloomPrunedJoin(li, dim, "l_orderkey")
      val rows = j.collect()
      (rows.length, shuffleRecords(j.queryExecution.executedPlan))
    }

    val (onCount, onRecords, planStr) = RuntimeFilters.withConfs(spark,
      RuntimeFilters.bloomPruneConfs()) {
      val j = RuntimeFilters.bloomPrunedJoin(li, dim, "l_orderkey")
      val rows = j.collect()
      (rows.length, shuffleRecords(j.queryExecution.executedPlan),
        j.queryExecution.executedPlan.toString)
    }

    assert(planStr.contains("might_contain") &&
        planStr.contains("bloom_filter_agg"),
      s"no runtime bloom filter injected in:\n$planStr")
    assert(onCount === off._1, "pruning must not change results")
    assert(onRecords < off._2,
      s"bloom pruning wrote $onRecords shuffle records, unpruned ${off._2} — " +
        "expected a reduction")
    info(s"shuffle records: unpruned=${off._2} pruned=$onRecords " +
      f"(${100.0 * (off._2 - onRecords) / off._2}%.1f%% reduction)")
  }

  test("AQE skew join: hot key splits (skew=true), rows match salted join") {
    import spark.implicits._
    // one hot key carrying ~100k rows vs 1k singleton keys
    val hot = spark.range(0, 100000).select(lit(0L).as("key"), $"id".as("row_id"))
    val tail = spark.range(1, 1001).select($"id".as("key"), ($"id" + 1000000).as("row_id"))
    val left = hot.unionAll(tail)
    val right = spark.range(0, 1001).select($"id".as("key"), ($"id" % 7).as("grp"))

    val (rowsAqe, planStr) = RuntimeFilters.withConfs(spark,
      RuntimeFilters.skewJoinConfs()) {
      val j = left.join(right, Seq("key"))
      val rows = j.collect()
      (rows.map(_.toSeq).toSet, j.queryExecution.executedPlan.toString)
    }
    assert(planStr.contains("skew=true"),
      s"AQE did not mark the join skewed:\n$planStr")

    val rowsSalted = graft.ext.Skew
      .saltedJoin(left, right, "key", leftRowId = "row_id", buckets = 16)
      .select("key", "row_id", "grp")
      .collect().map(_.toSeq).toSet
    val rowsPlain = left.join(right, Seq("key"))
      .collect().map(_.toSeq).toSet
    assert(rowsAqe === rowsPlain, "AQE skew split changed results")
    assert(rowsSalted === rowsPlain, "salted join changed results")
  }
}
