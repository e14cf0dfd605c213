package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Frequency sketches with engine-neutral hashing (joining KMV distinct
  * counting in [[Dedup.kmvDistinctTokens]]): sublinear-state summaries whose
  * every step is explicit modular arithmetic, so even the approximation is
  * oracle-checkable by an external engine.
  */
object Sketches {

  /** Count-Min sketch build + probe in one plan: a `depth`×`width` counter
    * grid where row j counts keys by hash_j(key) = ((key + j·40503)·
    * 2654435761) mod width, probed as estimate(k) = min_j grid[j][hash_j(k)].
    * The classic one-sided frequency sketch: estimates NEVER undercount
    * (only collisions inflate), which the spec asserts and the probe output
    * makes visible as `overcount`.
    *
    * Scale shape: the build is one hash aggregation over an explode by the
    * constant `depth` — O(rows·depth) map-side-combined into O(depth·width)
    * cells, the whole grid a few KB — then the probe side joins against the
    * BROADCAST grid. At 100 TB the grid is identical (state is independent
    * of input size — the entire point of a sketch); only the build scan
    * grows.
    *
    * @param keys     input rows
    * @param keyCol   integral key column to sketch
    * @param probePred which keys to probe (evaluated on the same input)
    * @return (key, n_exact, n_est, overcount) for every distinct probed key
    */
  /** HyperLogLog-shaped distinct-count sketch with every step exact and
    * engine-neutral, so the APPROXIMATION itself is oracle-checkable (the
    * same discipline as [[countMin]] and KMV): affine hash into a 2⁴⁰
    * space, bucket = low 5 bits (m = 32 registers), register = max over
    * `rho` = trailing-zero count of the 35-bit suffix + 1 (a geometric
    * observable that a PURELY AFFINE hash cannot feed — linear maps keep
    * consecutive keys' trailing-zero patterns correlated (+75% bias
    * measured on 1..200) — so two xorshift rounds break the linearity;
    * xor/shift are engine-neutral (`^`/`xor()`), and the middle multiply
    * folds to 32 bits first so ANSI-mode 64-bit overflow is impossible
    * observable, extracted with pure integer ops — `bit_count((w & −w) − 1)`
    * — no floating point, no engine hash). The harmonic estimator's
    * indicator sum Σ2^(−M_b) is a sum of EXACT dyadic doubles (every
    * partial sum fits 53 bits), so it is association-free and bit-identical
    * across engines; the final α·m²/Z is one fixed multiply-divide chain.
    * Bias corrections are intentionally omitted — they need ln/pow, which
    * are engine-unsafe (libm last-ulp drift), and the raw estimator is the
    * oracle-checkable contract; `n_exact`/`rel_err` sit alongside so the
    * approximation quality is visible.
    *
    * Scale shape: one hash aggregation to O(groups·m) register cells, then
    * O(groups) — state independent of input size, the point of a sketch.
    */
  def hllDistinct(rows: DataFrame, groupCol: String,
                  keyCol: String): DataFrame = {
    val m = 32
    val logM = 5
    val maxRho = 36 // empty 35-bit suffix: all 35 positions + 1
    val h1 = pmod(col(keyCol) * lit(2654435761L) + lit(1013904223L),
      lit(1L << 40))
    val h2 = h1.bitwiseXOR(shiftright(h1, 20))
    val h3 = pmod(pmod(h2, lit(1L << 32)) * lit(1540483477L) + lit(99991L),
      lit(1L << 40))
    val hv = h3.bitwiseXOR(shiftright(h3, 17))
    val w = shiftright(hv, logM)
    val rho = when(w === 0, lit(maxRho))
      .otherwise(bit_count(w.bitwiseAND(-w) - 1) + 1)
    val reg = rows
      .select(col(groupCol).as("grp"), pmod(hv, lit(m.toLong)).as("bucket"),
        rho.as("rho"))
      .groupBy(col("grp"), col("bucket"))
      .agg(max(col("rho")).as("rho_max"))
    val z = reg.groupBy(col("grp"))
      .agg((sum(lit(1.0) /
          expr("shiftleft(CAST(1 AS BIGINT), rho_max)").cast("double"))
        + (lit(m) - count(lit(1))).cast("double")).as("zsum"),
        count(lit(1)).as("filled"))
    val exact = rows.groupBy(col(groupCol).as("grp"))
      .agg(count_distinct(col(keyCol)).as("n_exact"))
    exact.join(z, "grp")
      .select(col("grp").as(groupCol), col("n_exact"), col("filled"),
        (lit(0.697) * m * m / col("zsum")).as("hll_est"),
        ((lit(0.697) * m * m / col("zsum") - col("n_exact").cast("double"))
          / col("n_exact").cast("double")).as("rel_err"))
  }

  def countMin(keys: DataFrame, keyCol: String, probePred: Column,
               depth: Int = 3, width: Int = 64): DataFrame = {
    def bucket(j: Int, k: Column): Column =
      graft.functions.Hashing.knuthMod(k, width, offset = j * 40503L)
    val grid = keys
      .select(posexplode(array((0 until depth).map(j =>
        bucket(j, col(keyCol))): _*)).as(Seq("j", "bucket")))
      .groupBy(col("j"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val probes = keys.filter(probePred)
      .groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n_exact"))
    probes
      .select(col("key"), col("n_exact"),
        posexplode(array((0 until depth).map(j =>
          bucket(j, col("key"))): _*)).as(Seq("j", "bucket")))
      .join(broadcast(grid), Seq("j", "bucket"))
      .groupBy(col("key"), col("n_exact"))
      .agg(min(col("cnt")).as("n_est"))
      .withColumn("overcount", col("n_est") - col("n_exact"))
  }
}
