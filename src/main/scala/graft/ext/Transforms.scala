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

  // span-corruption draws need the NON-affine mix for the same reason
  // shuffleQuality does: an affine draw makes every 13th token a span
  // start — a rigid lattice instead of a corruption pattern
  private def mix40(x: Column): Column = graft.functions.Hashing.mix40(x)

  /** T5-style span-corruption example accounting (Raffel et al. 2020,
    * "Exploring the Limits of Transfer Learning…", §3.1.4, public
    * literature): deterministic pseudo-random spans of 1–3 tokens are
    * masked at a ~1/13 start rate (≈15% token mass at mean span 2, the
    * published corruption rate), overlapping draws merge to maximal
    * spans (the q215 interval-union discipline), and each span becomes
    * one sentinel in the input and one in the target. The per-doc
    * readout is the packer's accounting contract: n_toks, merged span
    * count, corrupted token mass, `input_len = n_toks − corrupted +
    * n_spans`, `target_len = corrupted + n_spans`, and the engine-neutral
    * fingerprint of the ordered "s:e" span list — the exact MASK is
    * pinned, not just its mass.
    *
    * Determinism: the draw at (doc, position) is `mix40` of the doc hash
    * re-reduced with a position stride — reproducible across runs and
    * engines, the property a re-runnable pipeline needs (same reason
    * fimSplit's cuts are hashes, not RNG).
    *
    * Scale shape: token explode → per-row integer draw → the span merge
    * runs per-doc windows (doc-bounded partitions, the q206/q215 shape)
    * → one doc-grain rollup. Nothing global, no joins except the
    * doc-grain left join back for empty/uncorrupted docs.
    *
    * @return doc_id, n_toks, n_spans, corrupted_toks, input_len,
    *         target_len, mask_fp (0 when no span)
    */
  def spanCorruption(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      TextStats.tokens(col("text")).as("t"))
      .withColumn("n_toks", size(col("t")).cast("long"))
    val pos = toks
      // sequence(1, 0) steps BACKWARD in Spark — guard the empty doc out
      .filter(col("n_toks") >= 1L)
      .select(col("doc_id"), col("n_toks"),
        explode(sequence(lit(1L), col("n_toks"))).as("i"))
      .withColumn("__hd", mix40(col("doc_id")))
      .withColumn("__hv",
        mix40(pmod(col("__hd") + col("i") * lit(7919L), lit(1L << 31))))
      .filter(pmod(col("__hv"), lit(13L)) === 0L)
      .select(col("doc_id"), col("i").as("s"),
        least(col("i") + pmod(shiftright(col("__hv"), 7), lit(3L)),
          col("n_toks")).as("e"))
    // the shared q206/q215 interval-union sweep (Dedup.mergedSpanFrame)
    val spans = Dedup.mergedSpanFrame(
        pos.select(col("doc_id"), col("s").as("pos"), col("e").as("end")))
      .select(col("doc_id"), col("s").as("ms"), col("e").as("me"))
    val perDoc = spans
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("me") - col("ms") + 1L).as("corrupted_toks"),
        TextStats.fingerprint(array_join(transform(
          sort_array(collect_list(struct(col("ms"), col("me")))),
          p => concat(p.getField("ms").cast("string"), lit(":"),
            p.getField("me").cast("string"))), ",")).as("mask_fp"))
    toks.select(col("doc_id"), col("n_toks"))
      .join(perDoc, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_toks"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("corrupted_toks"), lit(0L)).as("corrupted_toks"),
        (col("n_toks") - coalesce(col("corrupted_toks"), lit(0L)) +
          coalesce(col("n_spans"), lit(0L))).as("input_len"),
        (coalesce(col("corrupted_toks"), lit(0L)) +
          coalesce(col("n_spans"), lit(0L))).as("target_len"),
        coalesce(col("mask_fp"), lit(0L)).as("mask_fp"))
  }
}
