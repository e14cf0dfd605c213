package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative connected components over a near-duplicate pair list — the
  * closure step that turns pairwise similarity hits into dedup GROUPS
  * (pairs alone under-merge: a~b and b~c must collapse a, b, c together).
  *
  * Algorithm: minimum-label propagation. Every node starts labeled with its
  * own id; each round, every node takes the min label among itself and its
  * neighbors; stop at fixpoint (or `maxIter`). Rounds needed = graph
  * diameter, which for near-dup clusters is tiny. Each round is one join +
  * one aggregation — the standard Spark iterative shape: the driver loops
  * over ACTIONS, the data never leaves the cluster, and `localCheckpoint`
  * truncates the lineage so plans don't grow with iterations.
  */
object Components {

  /** @param edges two-column DataFrame of undirected pairs
    * @return (node, component) — component = min node id reachable
    * @throws IllegalStateException when `maxIter` rounds pass without a
    *         fixpoint — an under-merged result returned silently would
    *         corrupt downstream dedup; raise maxIter for high-diameter
    *         graphs (rounds needed ≈ component diameter)
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val Seq(aCol, bCol) = edges.columns.toSeq.take(2)
    val sym = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .localCheckpoint()

    var checkpointed = sym.select(col("src").as("node")).distinct()
      .withColumn("component", col("node"))
      .localCheckpoint()
    var labels = checkpointed

    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val nbrMin = sym.join(labels, col("dst") === col("node"))
        .groupBy(col("src"))
        .agg(min(col("component")).as("nbr_min"))
      // one propagation step + one pointer jump (shortcutting): after taking
      // the min over neighbors, also adopt the CURRENT label of that label —
      // labels are monotonically ≤ their node id, so the jump only tightens.
      // Shortcutting turns O(diameter) rounds into O(log diameter), the
      // standard acceleration for distributed CC.
      val tentative = labels.join(nbrMin, col("node") === col("src"), "left_outer")
        .select(col("node"), col("component").as("prev"),
          least(col("component"), coalesce(col("nbr_min"), col("component")))
            .as("tent"))
      val jumpTo = labels
        .select(col("node").as("jnode"), col("component").as("jcomp"))
      // localCheckpoint truncates lineage; the superseded round's cached
      // blocks are explicitly dropped below, keeping peak storage at two
      // copies instead of maxIter. The PREVIOUS label rides along in the
      // checkpointed frame so the convergence check is a filter over already-
      // materialized blocks — not a labels⋈next join re-executed per round.
      val stepped = tentative
        .join(jumpTo, col("tent") === col("jnode"), "left_outer")
        .select(col("node"), col("prev"),
          least(col("tent"), coalesce(col("jcomp"), col("tent")))
            .as("component"))
        .localCheckpoint()
      converged = stepped.filter(col("component") =!= col("prev")).isEmpty
      checkpointed.unpersist(blocking = false)
      checkpointed = stepped
      labels = stepped.select("node", "component")
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — " +
          "component diameter exceeds maxIter; raise it")
    labels
  }

  /** Dedup groups from near-dup pairs: every member mapped to its group's
    * canonical (minimum) id. Nodes not in any pair are their own group and
    * are absent here — union with the full id set at the call site if a
    * total mapping is needed.
    */
  def dedupGroups(pairs: DataFrame): DataFrame =
    connectedComponents(pairs)
      .withColumnRenamed("component", "canonical_id")
}
