package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact percentiles per group, with an adaptive execution strategy.
  *
  * `percentile()` (Spark) / `quantile_cont()` (DuckDB) are HOLISTIC
  * aggregates: every value of a group is buffered on one reducer. That is
  * optimal at bench scale (one pass, one shuffle) and fatal for a 100 TB
  * group. So, AQE-broadcast-threshold style, the operator picks its plan:
  *
  *  - input ≤ `holisticMaxTotalRows` (a parquet-footer-cheap count, no scan):
  *    the built-in holistic aggregate — one pass, minimal latency;
  *  - larger inputs: HISTOGRAM PRUNING — exact order statistics without any
  *    per-group buffer:
  *      1. per-group count/min/max                    (partial agg, 1 shuffle)
  *      2. fixed-width histogram over nBuckets        (partial agg, 1 shuffle)
  *      3. locate each target rank's bucket from the cumulative histogram
  *         (histogram is O(groups · nBuckets) — tiny, broadcast back)
  *      4. re-scan ONLY the located buckets (~1/nBuckets of the data), rank
  *         within each by value, pick the order statistics, interpolate.
  *
  * Buckets partition the value range, so within-bucket rank + cumulative
  * count below the bucket IS the global rank: no global sort. One hot key
  * costs O(n_group/nBuckets) at the rank-resolution sort instead of
  * O(n_group); duplicate-heavy columns degrade gracefully.
  *
  * Both paths use the same interpolation, Spark's `Percentile` formula
  * `(hi − pos)·v_lo + (pos − lo)·v_hi` with `pos = p·(n−1)` — which also
  * bit-matches DuckDB's `quantile_cont` on doubles (oracle-verified);
  * AnalyticsSpec asserts the two paths are bit-identical on real data.
  */
object Percentiles {

  /** Exact percentiles of `valueCol` per `groupCol`.
    *
    * @param ps percentile fractions in [0, 1]
    * @param rowCountHint caller-supplied row count of `df` used for the plan
    *        decision. Pass it when the count is already known (or when
    *        calling repeatedly on the same input, as q37 does) — otherwise
    *        the operator runs `df.count()` itself, which is footer-cheap for
    *        a bare parquet scan but a real job for a derived/cached frame.
    * @return (groupCol, p, value) — one row per group × percentile; groups
    *         with only null values are absent (as with the aggregate form)
    */
  def exactPercentiles(df: DataFrame, groupCol: String, valueCol: String,
                       ps: Seq[Double], nBuckets: Int = 1024,
                       holisticMaxTotalRows: Long = 8000000L,
                       rowCountHint: Option[Long] = None): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"percentile fractions must be in [0,1]: $ps")
    val rows = df
      .filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("__g"), col(valueCol).cast("double").as("__v"))
    // count before the null filter upper-bounds every group size
    val total = rowCountHint.getOrElse(df.count())
    if (total <= holisticMaxTotalRows) holistic(rows, groupCol, ps)
    else distributed(rows, groupCol, ps, nBuckets)
  }

  /** Small-input plan: the built-in holistic aggregate, exploded to the
    * operator's (group, p, value) long format.
    */
  private def holistic(rows: DataFrame, groupCol: String,
                       ps: Seq[Double]): DataFrame = {
    val psSql = ps.map(p => s"${p}D").mkString("array(", ", ", ")")
    val pArr = array(ps.map(lit): _*)
    rows.groupBy(col("__g"))
      .agg(expr(s"percentile(__v, $psSql)").as("__vals"))
      .select(col("__g").as(groupCol),
        posexplode(col("__vals")).as(Seq("__i", "value")))
      .select(col(groupCol), element_at(pArr, col("__i") + 1).as("p"),
        col("value"))
  }

  /** Third strategy: VALUE-COUNT COMPRESSION — exact percentiles for
    * bounded value domains (2-dp prices, integral quantities, codes, day
    * buckets). Pre-aggregate to (group, value, count) with map-side combine,
    * then every order statistic is a weighted-rank lookup over the D
    * distinct values instead of a holistic buffer over N rows: shuffle
    * volume drops N→D and the reducer work parallelizes over (group, value)
    * hash partitions rather than one task per group — the counting-sort
    * answer to what histogram pruning solves for continuous domains. At
    * 100 TB a price column has D ≈ 10⁵–10⁷ ≪ N, so the compressed frame is
    * dashboard-sized regardless of fact-table growth.
    *
    * Bit-identical to the holistic form: same `(hi−pos)·v_lo + (pos−lo)·v_hi`
    * interpolation on the same doubles (AnalyticsSpec asserts equality).
    */
  def valueCountPercentiles(df: DataFrame, groupCol: String, valueCol: String,
                            ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"percentile fractions must be in [0,1]: $ps")
    val vc = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("__cnt"))
    weightedPercentiles(vc, groupCol, valueCol, "__cnt", ps)
  }

  /** Fourth strategy: WINDOW-SORT — exact percentiles for near-unique
    * continuous domains (prices, measurements) at small-to-moderate group
    * cardinality: rank raw rows by one per-group window sort and pick the
    * order statistics directly. No holistic buffer (the sort spills instead
    * of OOMing, and the shuffle is columnar), no pre-aggregation (which is
    * pure overhead when D ≈ N — measured on l_extendedprice, 99% unique).
    * A group still sorts in one task, so for truly huge single groups
    * [[exactPercentiles]]' histogram pruning remains the scale path; this
    * is the low-latency exact plan between the two.
    */
  def sortPercentiles(df: DataFrame, groupCol: String, valueCol: String,
                      ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"percentile fractions must be in [0,1]: $ps")
    val rows = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("__g"), col(valueCol).cast("double").as("__v"))
    val wOrd = Window.partitionBy(col("__g")).orderBy(col("__v"))
    val wAll = Window.partitionBy(col("__g"))
    // row_number (not a running sum) so duplicate values get distinct ranks
    // — every target rank then matches exactly one row; which duplicate wins
    // a tie is irrelevant because their __v is equal
    val ranked = rows
      .withColumn("__idx", row_number().over(wOrd).cast("long") - 1)
      .withColumn("__n", count(lit(1)).over(wAll))
    // a row matters only as the floor- or ceil-rank of SOME target
    // percentile — prune before the |ps|× fan-out (measured: the fan-out
    // over every raw row dominated, not the rank sort it rides on)
    val isTarget = ps.map { p =>
      val pos = lit(p) * (col("__n") - 1).cast("double")
      col("__idx") === floor(pos).cast("long") ||
        col("__idx") === ceil(pos).cast("long")
    }.reduce(_ || _)
    val withP = ranked.filter(isTarget)
      .select(col("__g"), col("__v"), col("__idx"), col("__n"),
        explode(array(ps.map(lit): _*)).as("__p"))
      .withColumn("__pos", col("__p") * (col("__n") - 1).cast("double"))
      .withColumn("__klo", floor(col("__pos")).cast("long"))
      .withColumn("__khi", ceil(col("__pos")).cast("long"))
    withP.groupBy(col("__g"), col("__p"))
      .agg(
        max(when(col("__idx") === col("__klo"), col("__v"))).as("__vlo"),
        max(when(col("__idx") === col("__khi"), col("__v"))).as("__vhi"),
        max(col("__pos")).as("__posx"),
        max(col("__klo")).as("__klox"),
        max(col("__khi")).as("__khix"))
      .select(col("__g").as(groupCol), col("__p").as("p"),
        when(col("__klox") === col("__khix"), col("__vlo"))
          .otherwise((col("__khix") - col("__posx")) * col("__vlo") +
            (col("__posx") - col("__klox")) * col("__vhi"))
          .as("value"))
  }

  /** Exact percentiles over pre-aggregated (group, value, weight) rows —
    * the rank-resolution core of [[valueCountPercentiles]], public because
    * callers that already maintain a value-count frame reuse it directly on
    * derived distributions. REQUIRES values distinct per group (what a
    * value-count frame guarantees): the running-sum rank interval assumes
    * one row per value; use [[sortPercentiles]] for raw rows.
    */
  def weightedPercentiles(vc: DataFrame, groupCol: String, valueCol: String,
                          weightCol: String, ps: Seq[Double]): DataFrame = {
    val rows = vc.select(col(groupCol).as("__g"),
      col(valueCol).cast("double").as("__v"),
      col(weightCol).cast("long").as("__w"))
    val wOrd = Window.partitionBy(col("__g")).orderBy(col("__v"))
    val wAll = Window.partitionBy(col("__g"))
    // cumulative weight ranks each distinct value: [__below, __cum) is the
    // half-open global-rank interval its copies occupy
    val cum = rows
      .withColumn("__cum", sum(col("__w")).over(wOrd))
      .withColumn("__n", sum(col("__w")).over(wAll))
      .withColumn("__below", col("__cum") - col("__w"))
    val withP = cum
      .select(col("__g"), col("__v"), col("__cum"), col("__below"), col("__n"),
        explode(array(ps.map(lit): _*)).as("__p"))
      .withColumn("__pos", col("__p") * (col("__n") - 1).cast("double"))
      .withColumn("__klo", floor(col("__pos")).cast("long"))
      .withColumn("__khi", ceil(col("__pos")).cast("long"))
    // each target rank lands in exactly one value's interval → conditional
    // aggregation collapses the distinct-value frame to one row per (g, p)
    withP.groupBy(col("__g"), col("__p"))
      .agg(
        max(when(col("__below") <= col("__klo") && col("__klo") < col("__cum"),
          col("__v"))).as("__vlo"),
        max(when(col("__below") <= col("__khi") && col("__khi") < col("__cum"),
          col("__v"))).as("__vhi"),
        max(col("__pos")).as("__posx"),
        max(col("__klo")).as("__klox"),
        max(col("__khi")).as("__khix"))
      .select(col("__g").as(groupCol), col("__p").as("p"),
        when(col("__klox") === col("__khix"), col("__vlo"))
          .otherwise((col("__khix") - col("__posx")) * col("__vlo") +
            (col("__posx") - col("__klox")) * col("__vhi"))
          .as("value"))
  }

  /** Scale plan: histogram pruning (see object doc). */
  private def distributed(rows: DataFrame, groupCol: String, ps: Seq[Double],
                          nBuckets: Int): DataFrame = {
    // 1. per-group extent — the histogram's coordinate system
    val stats = rows.groupBy(col("__g"))
      .agg(count(lit(1)).as("__n"), min(col("__v")).as("__lo"),
        max(col("__v")).as("__hi"))

    // 2. fixed-width bucket id; degenerate range (all values equal) → bucket 0
    def bucketOf(value: Column, lo: Column, hi: Column): Column =
      when(hi > lo,
        least(floor((value - lo) / ((hi - lo) / nBuckets)).cast("long"),
          lit(nBuckets - 1L)))
        .otherwise(0L)
    val bucketed = rows.join(broadcast(stats), "__g")
      .select(col("__g"), col("__v"),
        bucketOf(col("__v"), col("__lo"), col("__hi")).as("__b"))
    val hist = bucketed.groupBy(col("__g"), col("__b"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__below", coalesce(
        sum(col("__cnt")).over(Window.partitionBy(col("__g")).orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))

    // 3. target global ranks (0-based): floor and ceil of p·(n−1), located in
    // their buckets via the cumulative histogram. All histogram-small frames.
    val targets = stats
      .select(col("__g"), col("__n"),
        explode(array(ps.map(lit): _*)).as("__p"))
      .withColumn("__pos", col("__p") * (col("__n") - 1).cast("double"))
      .withColumn("__klo", floor(col("__pos")).cast("long"))
      .withColumn("__khi", ceil(col("__pos")).cast("long"))
    val neededRanks = targets
      .select(col("__g"), explode(array(col("__klo"), col("__khi"))).as("__r"))
      .distinct()
    val located = neededRanks.join(hist, Seq("__g"))
      .filter(col("__r") >= col("__below") &&
        col("__r") < col("__below") + col("__cnt"))
      .select(col("__g"), col("__r"), col("__b"), col("__below"))

    // 4. rank resolution: only rows of located buckets are sorted, each
    // bucket in parallel. Within-bucket rank + __below = global rank because
    // buckets are value ranges.
    val neededBuckets = located.select(col("__g"), col("__b")).distinct()
    val wB = Window.partitionBy(col("__g"), col("__b")).orderBy(col("__v"))
    val rankValues = bucketed
      .join(broadcast(neededBuckets), Seq("__g", "__b"))
      .withColumn("__idx", row_number().over(wB).cast("long") - 1)
      .join(broadcast(located.withColumn("__idx", col("__r") - col("__below"))),
        Seq("__g", "__b", "__idx"))
      .select(col("__g"), col("__r"), col("__v"))

    // interpolate between the two order statistics (Spark Percentile formula)
    targets
      .join(rankValues.withColumnRenamed("__r", "__klo")
        .withColumnRenamed("__v", "__vlo"), Seq("__g", "__klo"))
      .join(rankValues.withColumnRenamed("__r", "__khi")
        .withColumnRenamed("__v", "__vhi"), Seq("__g", "__khi"))
      .select(col("__g").as(groupCol), col("__p").as("p"),
        when(col("__klo") === col("__khi"), col("__vlo"))
          .otherwise((col("__khi") - col("__pos")) * col("__vlo") +
            (col("__pos") - col("__klo")) * col("__vhi"))
          .as("value"))
  }

  /** Equi-depth histogram: `bins` buckets per group holding (approximately)
    * equal row counts — the optimizer-statistics / drift-monitoring shape,
    * where equi-WIDTH histograms collapse under skew. Cutpoints are the
    * exact interior percentiles (i/bins), so the operator inherits whichever
    * percentile strategy fits the input; rows then bin by how many cutpoints
    * they exceed and collapse to per-(group, bin) count/min/max.
    *
    * Scale shape: cutpoints are O(groups·bins) — a broadcast — so binning
    * is one map-side array expression over the fact scan and the final
    * rollup is an ordinary hash agg with map-side combine. Two fact scans
    * total (one inside the percentile pass, one to bin); no sort, no
    * holistic buffer on the scale path. Parity: cutpoints are the already-
    * oracle-verified interpolation doubles; bin assignment is exact double
    * comparison; min/max/count are order-free.
    */
  def equiDepthHistogram(df: DataFrame, groupCol: String, valueCol: String,
                         bins: Int = 8,
                         rowCountHint: Option[Long] = None,
                         cutpointFn: (DataFrame, String, String, Seq[Double])
                           => DataFrame = null): DataFrame = {
    require(bins >= 2, s"need at least 2 bins: $bins")
    val ps = (1 until bins).map(_.toDouble / bins)
    // every strategy emits the same bit-identical interpolation (asserted
    // in AnalyticsSpec), so callers pick by value-domain shape alone —
    // e.g. sortPercentiles for near-unique domains skips both the plan-
    // decision count() and the holistic buffer
    val cutRows =
      if (cutpointFn != null) cutpointFn(df, groupCol, valueCol, ps)
      else exactPercentiles(df, groupCol, valueCol, ps,
        rowCountHint = rowCountHint)
    val cuts = cutRows
      .groupBy(col(groupCol))
      .agg(sort_array(collect_list(col("value"))).as("__cuts"))
    df.filter(col(valueCol).isNotNull)
      .join(broadcast(cuts), groupCol)
      .withColumn("bin", size(filter(col("__cuts"),
        c => col(valueCol).cast("double") > c)).cast("long"))
      .groupBy(col(groupCol), col("bin"))
      .agg(count(lit(1)).as("n"),
        min(col(valueCol).cast("double")).as("min_v"),
        max(col(valueCol).cast("double")).as("max_v"))
  }
}
