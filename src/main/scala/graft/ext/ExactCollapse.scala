package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-duplicate pre-collapse for pair-producing near-dup joins.
  *
  * The one 100 TB scale-killer inside an otherwise bucket-bounded near-dup
  * architecture is exact multiplicity: m byte-identical copies of one
  * document/image/embedding carry identical signatures, land in the same
  * LSH bucket, and produce m²/2 candidate pairs BEFORE any verify step can
  * cut them (a million copies of a popular image → 5·10¹¹ candidates in
  * one bucket). The fix is standard: group identical items to ONE
  * representative before the band/bucket join, run the pair machinery on
  * representatives only, and re-expand members afterwards. Every derived
  * quantity (Hamming distance, Jaccard, cosine, edit distance) is
  * group-constant — identical inputs give identical signatures and
  * distances — so the expansion is a pure equi-join that reproduces the
  * uncollapsed output bit-for-bit, while the quadratic work runs on the
  * DISTINCT item count.
  *
  * Consumers that only need CONNECTIVITY (cluster histograms, keeper
  * mappings) skip pair expansion entirely: an identical-group is one
  * distance-0 cluster by definition, so m−1 star edges (member → rep)
  * replace its m²/2 within pairs with the same connected components.
  *
  * At 100 TB the collapse key for text is shuffled as (digest, body) with
  * the 8-byte digest leading the sort key — same byte volume as one body
  * shuffle, which the signature explode already paid. Fixed-width keys
  * (dHash bands, quantized vectors) group directly.
  */
private[graft] object ExactCollapse {

  /** `df` + a `repCol` column: the minimum `idCol` over rows whose `keys`
    * tuple is identical — one exchange on the key, the aggregation that
    * must precede every band join (PlanSpec's "exact-collapse rep window"
    * test pins this shape in the registered near-dup plans).
    *
    * Fails fast when `repCol` already exists — a silent overwrite of a
    * caller column would corrupt the expansion joins downstream.
    */
  def withRep(df: DataFrame, idCol: String, keys: Seq[Column],
              repCol: String = "rep"): DataFrame = {
    require(!df.columns.contains(repCol),
      s"withRep: input already has a '$repCol' column — pass a free name")
    df.withColumn(repCol, min(col(idCol)).over(Window.partitionBy(keys: _*)))
  }

  /** [[withRep]] materialized ONCE per query ([[graft.Pin]]).
    *
    * Every collapse consumer branches off the keyed frame several times —
    * members for the two expansion joins, reps for the band/bucket join
    * and its size/signature frames — and each branch is its own plan
    * subtree that re-derives the window AND re-scans the input (column
    * pruning gives the branches different scan schemas, so Spark's
    * ReuseExchange cannot dedup them). Round 15 measured that cost:
    * q84 5.1×, q64 2.45×, q78 1.82× sf0.1 wall vs the pre-collapse round.
    * Pinning truncates lineage at the collapsed frame, so the window and
    * the corpus scan run exactly once regardless of consumer fan-out —
    * the q231/q257 Pin discipline. On a real cluster the pin is a
    * reliable checkpoint (see [[graft.Pin]]); either way the values are
    * bit-identical to the unpinned form.
    */
  def withRepPinned(df: DataFrame, idCol: String, keys: Seq[Column],
                    repCol: String = "rep"): DataFrame = {
    val keyed = withRep(df, idCol, keys, repCol)
    record(keyed)
    // The pin's MATERIALIZED LAYOUT is one partition per core (round 17):
    // the rep window's exchange carries few BYTES (text compresses), so
    // AQE coalesces it — and the pin then freezes that layout, handing
    // every consumer a 1-partition scan. Consumers are CPU-dense per byte
    // (5-gram shingling, k minhashes, band assembly), so the frozen
    // 1-partition layout serialized them: StageAudit measured q264's four
    // rep-side stages at 1 task / 4.7–11.6 s CPU EACH on 32 cores. The
    // explicit count (user repartitions with a count are exempt from AQE
    // coalescing) costs one re-shuffle of the collapsed frame at pin time
    // — paid once, before the one materialization — and parallelizes
    // every downstream branch. Partitioning by the id keeps the layout
    // key-local for the expansion joins.
    val dp = df.sparkSession.sparkContext.defaultParallelism
    graft.Pin(keyed.repartition(dp, col(idCol)))
  }

  /** Test hook (PlanSpec): the most recent pre-pin keyed frames. The pin
    * replaces the collapse subtree with a materialized scan in the final
    * plan, so the "rep window before the band join" guard inspects the
    * frames recorded here instead of the consumer plan. Bounded (last 8)
    * and OFF by default — recording retains DataFrames (plans + session
    * references) for the life of the JVM, which production Verify/Bench
    * runs must not pay; PlanSpec flips [[recordKeyed]] on around its
    * assertions.
    */
  private[graft] val recentKeyed =
    new java.util.concurrent.atomic.AtomicReference[List[DataFrame]](Nil)
  @volatile private[graft] var recordKeyed: Boolean = false
  private def record(df: DataFrame): Unit =
    if (recordKeyed) {
      recentKeyed.updateAndGet(l => (df :: l).take(8))
      ()
    }

  /** Rep-grain UNORDERED pairs → member-grain pairs normalized to
    * `outA` < `outB`. `repPairs` holds rep ids in columns `outA`/`outB`
    * plus group-constant `payload` columns that ride along unchanged;
    * `members` is a two-column (rep, member_id) frame. Each member pair
    * appears exactly once (groups partition the id space).
    */
  def expandUnordered(repPairs: DataFrame, members: DataFrame,
                      outA: String, outB: String,
                      payload: Seq[String]): DataFrame = {
    val ma = members.toDF("__ra", "__ida")
    val mb = members.toDF("__rb", "__idb")
    repPairs
      // defensive: a degenerate self-pair (same rep on both sides) would
      // expand into duplicate and (a,a) member pairs after least/greatest
      // normalization — within-group pairs must come from withinPairs/
      // starEdges, never through here
      .filter(col(outA) =!= col(outB))
      .join(ma, col(outA) === col("__ra"))
      .join(mb, col(outB) === col("__rb"))
      .select(least(col("__ida"), col("__idb")).as(outA) +:
        greatest(col("__ida"), col("__idb")).as(outB) +:
        payload.map(col): _*)
  }

  /** Rep-grain ORDERED pairs → member-grain (left member, right member)
    * pairs — the new-vs-corpus gate shape, where the two sides are
    * disjoint frames and no normalization applies.
    */
  def expandOrdered(repPairs: DataFrame, leftMembers: DataFrame,
                    rightMembers: DataFrame, outL: String, outR: String,
                    payload: Seq[String]): DataFrame = {
    val ml = leftMembers.toDF("__rl", "__idl")
    val mr = rightMembers.toDF("__rr", "__idr")
    repPairs
      .join(ml, col(outL) === col("__rl"))
      .join(mr, col(outR) === col("__rr"))
      .select(col("__idl").as(outL) +: col("__idr").as(outR) +:
        payload.map(col): _*)
  }

  /** All within-group member pairs (a < b) — for pair-list outputs whose
    * contract enumerates the distance-0 pairs (the output is inherently
    * quadratic in multiplicity; the JOIN that produces it is a linear
    * equi-join on the rep key). `members` is (rep, member_id) plus
    * optional group-constant payload columns, which ride along from the
    * left side.
    */
  def withinPairs(members: DataFrame, outA: String, outB: String,
                  payload: Seq[String]): DataFrame = {
    val cols = members.columns
    val ma = members.toDF(cols.map(c => s"__l_$c"): _*)
    val mb = members.select(cols.take(2).map(col): _*)
      .toDF("__r_rep", "__r_id")
    val Seq(repC, idC) = cols.take(2).toSeq
    ma.join(mb, col(s"__l_$repC") === col("__r_rep") &&
        col(s"__l_$idC") < col("__r_id"))
      .select(col(s"__l_$idC").as(outA) +: col("__r_id").as(outB) +:
        payload.map(c => col(s"__l_$c").as(c)): _*)
  }

  /** Connectivity-equivalent star edges: (rep, member) for every non-rep
    * member — m−1 edges replacing a group's m²/2 within pairs with the
    * same connected components.
    */
  def starEdges(members: DataFrame, outA: String, outB: String): DataFrame = {
    val Seq(repC, idC) = members.columns.take(2).toSeq
    members.filter(col(idC) =!= col(repC))
      .select(col(repC).as(outA), col(idC).as(outB))
  }
}
