package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Runtime-filtering scale levers: bloom-filter join pruning and AQE skew
  * splitting, exposed as documented conf bundles plus a scoped applier.
  *
  * These are SESSION confs, not plan properties — Spark's
  * `InjectRuntimeFilter` rule and `OptimizeSkewedJoin` AQE rule read them at
  * optimization time. The engine therefore ships them as explicit bundles a
  * caller applies around a query (scoped, with restore) rather than
  * mutating shared session state behind concurrent users' backs (same
  * policy as `Tables.events`' nanos flag).
  *
  * == Bloom-filter join pruning ==
  *
  * For a shuffle join `fact ⋈ dim` where `dim` carries a selective filter,
  * Spark builds a bloom filter over `dim`'s join keys and injects
  * `bloom_filter_might_contain(key)` into `fact`'s side BEFORE its shuffle —
  * at 100 TB this is the difference between shuffling the full fact table
  * and shuffling only the ~matching fraction (plus false positives). The
  * production defaults (creation side ≤ 10 MB scan / application side ≥
  * 10 GB scan) are sized for real clusters and mean the rule never fires at
  * bench scale, so [[bloomPruneConfs]] lowers the application-side gate for
  * demonstration/spec purposes; at target scale the DEFAULTS are already
  * right — the lever to tune there is `creationSideThreshold` vs dimension
  * cardinality. RuntimeFilterSpec asserts the injected filter in the plan
  * and measures the shuffle-record reduction.
  *
  * == AQE skew-join splitting ==
  *
  * AQE splits a skewed shuffle-join partition into subpartitions at runtime
  * (`skew=true` on the SortMergeJoin node) using the actual map-output
  * sizes. The thresholds (256 MB partition, 5× median) again target real
  * clusters; [[skewJoinConfs]] scales them down so the behavior is
  * spec-visible. This is Spark's own alternative to the manual salting in
  * [[graft.ext.Skew.saltedJoin]] — AQE needs no code change but only fires
  * on shuffle joins whose downstream doesn't require the join keys'
  * partitioning; the salted form covers the rest. RuntimeFilterSpec proves
  * the two produce identical rows.
  */
object RuntimeFilters {

  /** Apply session confs for the duration of `f`, restoring previous values
    * (or unsetting) afterwards. Not thread-safe across concurrent queries
    * on the same session — scope it around a single query's build+execute.
    */
  def withConfs[T](spark: SparkSession, confs: Seq[(String, String)])
                  (f: => T): T = {
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** Confs that let `InjectRuntimeFilter` fire at test/bench data sizes.
    * `appSideThresholdBytes = 0` removes the 10 GB application-side gate;
    * broadcast is disabled because a broadcast join already prunes at the
    * build side and Spark (correctly) refuses to double-filter it.
    */
  def bloomPruneConfs(appSideThresholdBytes: Long = 0L): Seq[(String, String)] =
    Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        -> appSideThresholdBytes.toString,
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      // a concrete (non-adaptive) final plan so specs can read metrics off
      // the executed plan directly; the injection rule itself is not AQE's
      "spark.sql.adaptive.enabled" -> "false")

  /** Confs that make AQE's skew-join split observable on small data:
    * partition-size thresholds scaled from the 256 MB/64 MB production
    * defaults down to tens of KB.
    */
  def skewJoinConfs(thresholdBytes: Long = 32 * 1024,
                    advisoryBytes: Long = 16 * 1024): Seq[(String, String)] =
    Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
        -> thresholdBytes.toString,
      "spark.sql.adaptive.advisoryPartitionSizeInBytes"
        -> advisoryBytes.toString,
      // keep the demo join a shuffle join (skew split targets SMJ/SHJ)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")

  /** The canonical bloom-prune shape: fact ⋈ selectively-filtered dim on
    * `key`. Nothing special in the plan declaration — the value is in the
    * confs + the assertion that injection happened (see RuntimeFilterSpec);
    * results are independent of whether the filter fires.
    */
  def bloomPrunedJoin(fact: DataFrame, dim: DataFrame,
                      key: String): DataFrame =
    fact.join(dim, Seq(key))
}
