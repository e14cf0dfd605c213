package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-example transforms — the per-row rewrites that turn curated
  * documents into model-ready examples (round 10; sits between curation
  * and the packer):
  *
  *  - fill-in-the-middle (FIM): split a document into (prefix, middle,
  *    suffix) at two deterministic cut points and render the
  *    prefix–suffix–middle form `<PRE>p<SUF>s<MID>m` (Bavarian et al.
  *    2022, "Efficient Training of Language Models to Fill in the
  *    Middle", public literature). Infilling-capable code models train on
  *    a ~50% FIM / 50% autoregressive mix; the transform must be
  *    deterministic per document so re-runs of the pipeline produce the
  *    same corpus.
  *
  * Scale shape: pure per-row expressions — zero shuffles, whole-stage
  * codegen end to end; the readout keeps the document grain so the
  * transform pipelines with any downstream per-doc pass for free. At
  * 100 TB this is scan-bound, which is exactly the shape a rewrite this
  * simple should have.
  */
object Transforms {

  /** Deterministic FIM split. Documents with `doc_id % 2 == 0` are
    * transformed; the rest stay autoregressive (rate 1/2, the published
    * mix). Cut points are affine hashes of `doc_id` reduced mod
    * `n + 1` so every split (including empty prefix/middle/suffix) is
    * reachable; `a = min, b = max` of the two draws.
    *
    * Per-doc readout: the three segment char masses, a structural
    * reassembly check (`prefix ⧺ middle ⧺ suffix == text` — the
    * invariant a FIM rewrite must never break), and the engine-neutral
    * fingerprint of the RENDERED example (sentinels + reordered
    * segments), which pins the byte-level output, not just the lengths.
    *
    * Engine parity: text is ASCII so char == codepoint == byte on both
    * sides; the hash stays within long for doc_id ≤ ~3.4e9 (scaladoc'd
    * envelope, same discipline as the bloom hashes).
    *
    * @return doc_id, is_fim, p_chars, m_chars, s_chars, reassembly_ok,
    *         out_fp
    */
  def fimSplit(docs: DataFrame): DataFrame = {
    val n = length(col("text")).cast("long")
    // ONE mod by (n+1): a fixed intermediate modulus would cap the cut
    // points at that constant, so long documents would never split in
    // their tail (review catch — the oracle replicates the arithmetic,
    // so the parity harness is structurally blind to such a bias)
    val h1 = pmod(col("doc_id") * lit(2654435761L), n + 1L)
    val h2 = pmod(col("doc_id") * lit(1779033703L) + 7L, n + 1L)
    val a = least(h1, h2)
    val b = greatest(h1, h2)
    val isFim = col("doc_id") % 2 === 0
    val prefix = expr("substring(text, 1, int(__a))")
    val middle = expr("substring(text, int(__a) + 1, int(__b - __a))")
    val suffix = expr("substring(text, int(__b) + 1)")
    val rendered = concat(lit("<PRE>"), prefix, lit("<SUF>"), suffix,
      lit("<MID>"), middle)
    docs
      .withColumn("__n", n)
      .withColumn("__a", when(isFim, a).otherwise(n))
      .withColumn("__b", when(isFim, b).otherwise(n))
      .select(
        col("doc_id"),
        isFim.as("is_fim"),
        col("__a").as("p_chars"),
        (col("__b") - col("__a")).as("m_chars"),
        (col("__n") - col("__b")).as("s_chars"),
        (concat(prefix, middle, suffix) === col("text")).as("reassembly_ok"),
        when(isFim, TextStats.fingerprint(rendered))
          .otherwise(TextStats.fingerprint(col("text")))
          .as("out_fp"))
  }
}
