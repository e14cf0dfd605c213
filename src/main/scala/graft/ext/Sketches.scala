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
