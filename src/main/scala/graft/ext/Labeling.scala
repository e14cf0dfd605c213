package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Weak-supervision label operators: fuse votes from multiple annotators
  * (or labeling functions, the Snorkel framing) into one label per item,
  * and grade each annotator against the fused consensus — the audit a
  * labeling pipeline runs before its labels are trusted for training.
  *
  * Reference tie-in: the reference's eval stage compares one prediction
  * source against one ground truth (`Test/accuracy.ipynb`); a production
  * annotation pipeline has MANY imperfect label sources first, and this is
  * the step that reconciles them.
  *
  * Parity discipline: majority fusion is pure integer counting with a
  * deterministic tie-break (most votes, then LOWEST label — no engine
  * ordering leaks); Cohen's kappa is emitted as its exact integer
  * numerator/denominator `(n·n_agree − Σₗ n_ann,ₗ·n_fused,ₗ,
  * n² − Σₗ n_ann,ₗ·n_fused,ₗ)` plus the one raw IEEE division — the q111
  * exact-fraction discipline, bit-identical on any engine.
  *
  * Scale shape: one hash aggregation per grain — (item, label) counts,
  * a per-item window argmax over the label-cardinality frame (partitioned
  * by item, never global), then annotator-grain rollups whose result
  * cardinality is |annotators|. Vote marginals × fused marginals join on
  * label (|labels| rows, broadcast). No data-path collects, no |items|²
  * anywhere. Kappa magnitude: n·n_agree and the marginal products are
  * ≤ n², long-safe through ~3e9 items per annotator.
  */
object Labeling {

  /** Majority-vote fusion: one row per item — the label with the most
    * votes, ties to the lowest label; n_votes = votes for the winner,
    * n_voters = total votes cast on the item.
    */
  def majorityVote(votes: DataFrame): DataFrame = {
    val cnt = votes.groupBy(col("item_id"), col("label"))
      .agg(count(lit(1)).as("n_votes"))
    val w = Window.partitionBy(col("item_id"))
      .orderBy(col("n_votes").desc, col("label"))
    val tot = votes.groupBy(col("item_id"))
      .agg(count(lit(1)).as("n_voters"))
    cnt.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .join(tot, Seq("item_id"))
      .select(col("item_id"), col("label").as("fused"),
        col("n_votes"), col("n_voters"))
  }

  /** Per-annotator report vs the majority consensus: items voted, votes
    * agreeing with the fused label, and Cohen's kappa vs the consensus as
    * exact integer numerator/denominator plus the raw double — the
    * chance-corrected agreement that separates a lazy constant annotator
    * (high raw agreement on a skewed label set, kappa ≈ 0) from a real
    * one. kappa is null when the denominator is 0 (annotator and
    * consensus both constant on the same label — chance agreement is 1
    * and kappa is undefined). Assumes the complete-panel design (every
    * annotator votes on every item); an incomplete panel would restrict
    * the consensus marginal to each annotator's own item set before the
    * product.
    */
  def annotatorReport(votes: DataFrame): DataFrame = {
    val fused = majorityVote(votes)
      .select(col("item_id"), col("fused"))
    val joined = votes.join(fused, Seq("item_id"))
    val perAnn = joined.groupBy(col("annotator"))
      .agg(count(lit(1)).as("n_items"),
        sum(when(col("label") === col("fused"), 1L).otherwise(0L))
          .as("n_agree"))
    // chance-agreement numerator Σₗ n_ann,ₗ·n_fused,ₗ via the |labels|-row
    // marginal join (broadcast-sized by construction)
    val annMarg = votes.groupBy(col("annotator"), col("label"))
      .agg(count(lit(1)).as("n_a"))
    val fusedMarg = fused.groupBy(col("fused").as("label"))
      .agg(count(lit(1)).as("n_f"))
    val pe = annMarg.join(broadcast(fusedMarg), Seq("label"))
      .groupBy(col("annotator"))
      .agg(sum(col("n_a") * col("n_f")).as("pe_num"))
    perAnn.join(pe, Seq("annotator"))
      .select(col("annotator"), col("n_items"), col("n_agree"),
        (col("n_items") * col("n_agree") - col("pe_num")).as("kappa_num"),
        (col("n_items") * col("n_items") - col("pe_num")).as("kappa_den"))
      .withColumn("kappa",
        when(col("kappa_den") =!= 0L,
          col("kappa_num").cast("double") / col("kappa_den").cast("double")))
  }
}
