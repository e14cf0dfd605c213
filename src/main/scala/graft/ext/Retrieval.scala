package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse retrieval: top-k similar documents per query through an
  * INVERTED-INDEX join — the blocked form of "score every (query, doc)
  * pair" that makes lexical search feasible at corpus scale (and the
  * candidate-generation stage in a RAG pipeline, before any dense rerank).
  *
  * Pipeline: build posting lists (term → docs) over distinct tokens, drop
  * high-document-frequency terms (the classic stop-list — they add
  * candidates, not signal), join query tokens against postings so only
  * documents sharing ≥1 indexed term are scored, then exact token-set
  * Jaccard and a per-query top-k window.
  *
  * The df cap is RELATIVE (`df·100 ≤ maxDfPct·N`, integer-exact): an
  * absolute cap either goes degenerate (prunes everything on a small
  * shared-vocabulary corpus) or inactive (prunes nothing) as the corpus
  * scales; the stop-band is a corpus fraction, not a constant. N is a
  * 1-row aggregate broadcast into the filter — no driver-side collect.
  *
  * Scale shape: the cap bounds candidates per query to |q|·maxDfPct%·N
  * postings from the stop-band's absence; the postings join shuffles on
  * term once and the tiny query-token frame broadcasts over it. Parity:
  * overlap/lengths are exact ints; the Jaccard is one IEEE division → raw
  * double.
  *
  * The fixture derives queries as a corpus FRACTION (`queryEvery`) so the
  * driver oracle has a closed input; a production query set is an external
  * bounded table — when it outgrows the broadcast threshold, drop the hint
  * and the same plan shuffle-joins on term (postings side stays put).
  */
object Retrieval {

  def topKByTokenOverlap(docs: DataFrame, k: Int = 5, maxDfPct: Long = 79,
                         queryEvery: Long = 97, queryLen: Int = 5): DataFrame = {
    val base = docs.select(col("doc_id"), TextStats.tokens(col("text")).as("t"))
    val dTok = base.select(col("doc_id"),
      explode(array_distinct(col("t"))).as("term"))
    // per-doc distinct-token length: per-row expression, no extra shuffle
    val dLen = base.select(col("doc_id"),
      size(array_distinct(col("t"))).cast("long").as("d_len"))
    // non-blank corpus size: 1-row broadcast (blank docs carry no tokens,
    // matching the oracle's length(trim(text)) > 0 base)
    val nDocs = base.filter(size(col("t")) > 0).agg(count(lit(1)).as("n"))
    val dfq = dTok.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val kept = dfq.crossJoin(broadcast(nDocs))
      .filter(col("df") * 100 <= lit(maxDfPct) * col("n"))
      .select(col("term"))
    val postings = dTok.join(kept, "term")
      .select(col("term"), col("doc_id"))
    val queries = base.filter(col("doc_id") % queryEvery === 3)
      .select(col("doc_id").as("query_id"),
        array_distinct(slice(col("t"), 1, queryLen)).as("qt"))
    val qTok = queries.select(col("query_id"), explode(col("qt")).as("term"))
    val qLen = queries.select(col("query_id"),
      size(col("qt")).cast("long").as("q_len"))
    val overlap = postings.join(broadcast(qTok), "term")
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("overlap"))
    val scored = overlap
      .join(broadcast(qLen), "query_id")
      .join(dLen, "doc_id")
      .withColumn("score", col("overlap").cast("double") /
        (col("q_len") + col("d_len") - col("overlap")).cast("double"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("overlap"),
        col("q_len"), col("d_len"), col("score"))
  }

  /** Hybrid retrieval with reciprocal-rank fusion — the standard RAG
    * candidate-fusion stage: the sparse (token-Jaccard) and dense
    * (quantized-cosine) top-k lists for the same query set, full-outer
    * merged per (query, doc) and re-ranked by `Σ 1/(rrfK + rank)`
    * (Cormack et al.'s RRF; rank-based, so the two scorers' incomparable
    * score scales never matter).
    *
    * Scale shape: both inputs are already top-k-bounded per query — the
    * fusion join and re-rank run on O(queries·k) rows regardless of corpus
    * size; each branch keeps its own scale path (df-capped postings /
    * LSH-IVF swap-in). Parity: ranks are exact ints; each RRF term is one
    * IEEE division and the sum is a FIXED two-term expression, not an
    * aggregation — no association order to drift.
    */
  def hybridRRF(docs: DataFrame, emb: DataFrame, k: Int = 5,
                rrfK: Long = 60, queryEvery: Long = 97): DataFrame = {
    val sparse = topKByTokenOverlap(docs, k = k, queryEvery = queryEvery)
      .select(col("query_id"), col("doc_id"),
        col("rank").as("sparse_rank"))
    val dense = Similarity
      .cosineTopK(emb, col("vec_id") % queryEvery === 3, k = k)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("rnk").as("dense_rank"))
    val fused = sparse.join(dense, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(rrfK) + col("sparse_rank")).cast("double"),
          lit(0.0)) +
        coalesce(lit(1.0) / (lit(rrfK) + col("dense_rank")).cast("double"),
          lit(0.0)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("doc_id"))
    fused.withColumn("final_rank", row_number().over(w).cast("long"))
      .select(col("query_id"), col("final_rank"), col("doc_id"),
        col("sparse_rank"), col("dense_rank"), col("rrf"))
  }
}
