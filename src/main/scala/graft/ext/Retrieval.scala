package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
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
  * The fixture derives queries from the corpus (`queryEvery`) so the
  * driver oracle has a closed input, but CAPS the derived set at a
  * CONSTANT (`queryCap` ids: doc_id < queryEvery·queryCap) — round 10's
  * scale readout showed the uncapped fraction makes total cost corpus²
  * (|Q| ∝ N times N-proportional postings). With the cap the measured
  * plan is |Q|·posting-lengths — linear in the corpus, the same shape as
  * a production external query table ([[topKForQueries]]); when that
  * table outgrows the broadcast threshold, drop the hint and the same
  * plan shuffle-joins on term (postings side stays put).
  */
object Retrieval {

  def topKByTokenOverlap(docs: DataFrame, k: Int = 5, maxDfPct: Long = 79,
                         queryEvery: Long = 97, queryLen: Int = 5,
                         queryCap: Long = 21): DataFrame = {
    val base = docs.select(col("doc_id"), TextStats.tokens(col("text")).as("t"))
    val queries = base.filter(col("doc_id") % queryEvery === 3 &&
        col("doc_id") < queryEvery * queryCap)
      .select(col("doc_id").as("query_id"),
        array_distinct(slice(col("t"), 1, queryLen)).as("qt"))
    topKCore(base, queries, k, maxDfPct)
  }

  /** Top-k for an EXTERNAL bounded query table `(query_id, q_text)` — the
    * production call shape (round 10; the r10 scale readout's point): the
    * fixture form above derives its query set as a corpus FRACTION so the
    * driver oracle has a closed input, which makes its total cost scale
    * with corpus² when the corpus is what grows; a deployment's query set
    * is an external table whose size is independent of the corpus, making
    * this call |queries| · posting-lengths — linear in each. Query text is
    * tokenized with the corpus tokenizer; same output schema as the
    * fixture form (Round10OpsSpec asserts equality when fed the fixture's
    * own derivation, and that non-corpus query ids score cleanly).
    */
  def topKForQueries(docs: DataFrame, queries: DataFrame, k: Int = 5,
                     maxDfPct: Long = 79): DataFrame = {
    val base = docs.select(col("doc_id"), TextStats.tokens(col("text")).as("t"))
    val q = queries.select(col("query_id"),
      array_distinct(TextStats.tokens(col("q_text"))).as("qt"))
    topKCore(base, q, k, maxDfPct)
  }

  /** Shared scoring core: df-capped postings from `base` (doc_id, tokens),
    * joined against the prepared `queries` (query_id, qt) frame.
    */
  private def topKCore(base: DataFrame, queries: DataFrame, k: Int,
                       maxDfPct: Long): DataFrame = {
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
                rrfK: Long = 60, queryEvery: Long = 97,
                queryCap: Long = 21): DataFrame = {
    val sparse = topKByTokenOverlap(docs, k = k, queryEvery = queryEvery,
        queryCap = queryCap)
      .select(col("query_id"), col("doc_id"),
        col("rank").as("sparse_rank"))
    val dense = Similarity
      .cosineTopK(emb, col("vec_id") % queryEvery === 3 &&
        col("vec_id") < lit(queryEvery * queryCap), k = k)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("rnk").as("dense_rank"))
    rrfFuse(sparse, dense, rrfK)
  }

  /** The RRF fusion stage alone (round 10), for composing an external
    * retrieval stack — e.g. [[topKForQueries]] fused with
    * [[Similarity.cosineTopKForQueries]] over the same external query
    * table. Inputs: `sparse` (query_id, doc_id, sparse_rank) and `dense`
    * (query_id, doc_id, dense_rank), both already top-k-bounded per
    * query; a doc missing from one list contributes 0 to the sum, per
    * RRF. Same cost/parity shape as [[hybridRRF]], which now delegates
    * here (q117's output is unchanged by construction).
    */
  def rrfFuse(sparse: DataFrame, dense: DataFrame,
              rrfK: Long = 60): DataFrame = {
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

  /** Position-discount weights for NDCG@k: w(p) = 1/log2(p+1) FROZEN to
    * 9-dp decimals driver-side, with exact decimal prefix sums. Both the
    * operator and its generated oracle SQL embed these literals, so no
    * engine's libm log — which IEEE 754 does NOT require to be correctly
    * rounded, unlike /, sqrt — ever runs in the hashed data path.
    */
  private[graft] def ndcgWeights(k: Int)
      : Seq[(Int, java.math.BigDecimal, java.math.BigDecimal)] = {
    var cum = java.math.BigDecimal.ZERO.setScale(9)
    (1 to k).map { p =>
      val w = java.math.BigDecimal.valueOf(
        Math.round(1e9 / (Math.log(p + 1.0) / Math.log(2.0))), 9)
      cum = cum.add(w)
      (p, w, cum)
    }
  }

  /** Mean-reciprocal-rank inputs per query: the first rank whose doc is
    * relevant (same lang as the query doc), and rr = 1/rank — the other
    * standard retrieval-eval readout next to [[ndcgAtK]]. Queries whose
    * top-k has no relevant doc emit a NULL rank and rr = 0 (the MRR
    * convention). rr is one division of exact integers.
    */
  def mrrAtK(docs: DataFrame, k: Int = 10): DataFrame = {
    val meta = docs.select(col("doc_id"), col("lang"))
    val qMeta = meta.select(col("doc_id").as("query_id"),
      col("lang").as("q_lang"))
    val firstRel = topKByTokenOverlap(docs, k = k)
      .join(broadcast(qMeta), "query_id")
      .join(meta, "doc_id")
      .groupBy(col("query_id"))
      .agg(min(when(col("lang") === col("q_lang"), col("rank")))
        .as("first_rel_rank"))
    // anchor on the QUERY SET (same selector AND cap as
    // topKByTokenOverlap), so a query whose entire top-k is empty still
    // emits rr = 0 — dropping it would silently inflate the mean of the
    // reciprocal ranks
    docs.filter(col("doc_id") % 97 === 3 && col("doc_id") < 97L * 21 &&
        length(trim(col("text"))) > 0)
      .select(col("doc_id").as("query_id"))
      .join(firstRel, Seq("query_id"), "left")
      .select(col("query_id"), col("first_rel_rank"),
        coalesce(lit(1.0) / col("first_rel_rank").cast("double"), lit(0.0))
          .as("rr"))
  }

  /** NDCG@k of the sparse retrieval ranking ([[topKByTokenOverlap]])
    * against metadata-graded relevance — the standard ranking-quality
    * readout of a retrieval stack. Relevance: same (lang, source) as the
    * query doc = 2, same lang = 1, else 0; gain = 2^rel − 1.
    *
    * The ideal DCG needs no per-query pool scan: rel depends only on
    * (lang, source), so the pool's relevant-count n2 = |same lang+source|
    * − 1 and n1 = |same lang| − |same lang+source| come from two
    * broadcastable metadata aggregates, and IDCG = 2·cumw(a) + cumw(a+b)
    * (a = min(n2, k) twos, then b = min(n1, k−a) ones) reads the frozen
    * prefix-sum table. Everything is exact int/decimal; the only fp op is
    * the final DCG/IDCG division.
    */
  def ndcgAtK(docs: DataFrame, k: Int = 10): DataFrame = {
    val spark = docs.sparkSession
    val wts = ndcgWeights(k)
    val weights = spark.range(1).select(explode(array(wts.map {
      case (p, w, _) => struct(lit(p.toLong).as("pos"), lit(w).as("w"))
    }: _*)).as("s")).select(col("s.pos").as("pos"), col("s.w").as("w"))
    val zero = java.math.BigDecimal.ZERO.setScale(9)
    val cumw = spark.range(1).select(explode(array(
      ((0, zero) +: wts.map(t => (t._1, t._3))).map { case (m, c) =>
        struct(lit(m.toLong).as("m"), lit(c).as("cw"))
      }: _*)).as("s")).select(col("s.m").as("m"), col("s.cw").as("cw"))

    val meta = docs.select(col("doc_id"), col("lang"), col("source"))
    val qMeta = meta.select(col("doc_id").as("query_id"),
      col("lang").as("q_lang"), col("source").as("q_source"))
    val rel = topKByTokenOverlap(docs, k = k)
      .join(broadcast(qMeta), "query_id")
      .join(meta, "doc_id")
      .withColumn("rel",
        when(col("lang") === col("q_lang") &&
          col("source") === col("q_source"), 2L)
          .when(col("lang") === col("q_lang"), 1L).otherwise(0L))
      .withColumn("gain", when(col("rel") === 2, 3L)
        .when(col("rel") === 1, 1L).otherwise(0L))
    val dcg = rel.join(broadcast(weights), col("rank") === col("pos"))
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_retrieved"),
        sum(col("gain") * col("w")).cast("decimal(20,9)").as("dcg"))
    val byLS = meta.groupBy(col("lang").as("l1"), col("source").as("s1"))
      .agg(count(lit(1)).as("c_ls"))
    val byL = meta.groupBy(col("lang").as("l2"))
      .agg(count(lit(1)).as("c_l"))
    val pool = qMeta
      .join(broadcast(byLS),
        col("q_lang") === col("l1") && col("q_source") === col("s1"))
      .join(broadcast(byL), col("q_lang") === col("l2"))
      .select(col("query_id"), (col("c_ls") - 1).as("n2"),
        (col("c_l") - col("c_ls")).as("n1"))
      .withColumn("a", least(col("n2"), lit(k.toLong)))
      .withColumn("b", least(col("n1"), lit(k.toLong) - col("a")))
    val idcg = pool
      .join(broadcast(cumw.select(col("m"), col("cw").as("cwa"))),
        col("a") === col("m")).drop("m")
      .join(broadcast(cumw.select(col("m"), col("cw").as("cwab"))),
        col("a") + col("b") === col("m")).drop("m")
      .select(col("query_id"), col("n2"), col("n1"),
        (col("cwa") * 2 + col("cwab")).cast("decimal(20,9)").as("idcg"))
    dcg.join(idcg, "query_id")
      // dcg/idcg stay exact decimals internally; the hashed OUTPUT is the
      // e-9 fixed-point BIGINT (driver decimal-normalization lesson, r6)
      .select(col("query_id"), col("n_retrieved"), col("n2"), col("n1"),
        (col("dcg") * 1000000000L).cast("long").as("dcg_e9"),
        (col("idcg") * 1000000000L).cast("long").as("idcg_e9"),
        when(col("idcg") > 0,
          col("dcg").cast("double") / col("idcg").cast("double"))
          .as("ndcg"))
  }

  /** Hard-negative mining for retrieval training (the contrastive-data
    * prep step, cf. DPR / sentence-transformers practice — public
    * literature): each query's top-`k` retrieved NON-positive documents
    * become its hard negatives, with the safety check that separates a
    * useful hard negative from a FALSE negative — a candidate too similar
    * to the positive is probably an unlabeled duplicate answer, and
    * training against it teaches the model to reject correct evidence.
    * Here the positive is the query's own source document and the query
    * is its first-`qTokens` token prefix (the q104 fixture discipline —
    * and a hard SCALE rule: a full-document query against a shared
    * vocabulary makes the postings⋈queries overlap join quadratic with a
    * huge constant, measured as a runaway at the 10× point; short
    * queries bound the join to O(queries · qTokens · df)); retrieval is
    * the shared df-capped token-overlap core ([[topKForQueries]] already
    * excludes the positive itself), and safety is exact integer Jaccard
    * vs the FULL positive document: safe ⟺ 2·|neg ∩ pos| < |neg ∪ pos|.
    *
    * Scale shape: mining inherits the bounded top-k core (postings
    * df-capped, per-query window on O(queries·k) rows); the safety check
    * joins the O(queries·k) negative set back to distinct-token frames —
    * two joins on doc-grain keys, never corpus×corpus.
    *
    * @return query_id, rank, neg_id, pos_overlap, pos_union, is_safe
    */
  def hardNegatives(docs: DataFrame, queryPred: Column, k: Int = 3,
                    maxDfPct: Long = 79, qTokens: Int = 5): DataFrame = {
    val queries = docs.filter(queryPred)
      .select(col("doc_id").as("query_id"),
        concat_ws(" ", slice(TextStats.tokens(col("text")), 1, qTokens))
          .as("q_text"))
    val negs = topKForQueries(docs, queries, k, maxDfPct)
      .select(col("query_id"), col("rank"), col("doc_id").as("neg_id"))
    val dTok = docs.select(col("doc_id"),
      explode(array_distinct(TextStats.tokens(col("text")))).as("term"))
    val dLen = docs.select(col("doc_id"),
      size(array_distinct(TextStats.tokens(col("text"))))
        .cast("long").as("d_len"))
    // |neg ∩ pos|: expand mined pairs by the positive's terms, then keep
    // the terms the negative also carries — never corpus×corpus
    val inter = negs
      .join(dTok.withColumnRenamed("doc_id", "query_id"), "query_id")
      .join(dTok.select(col("doc_id").as("neg_id"), col("term")),
        Seq("neg_id", "term"))
      .groupBy(col("query_id"), col("rank"), col("neg_id"))
      .agg(count(lit(1)).as("pos_overlap"))
    negs
      .join(inter, Seq("query_id", "rank", "neg_id"), "left")
      .join(dLen.withColumnRenamed("doc_id", "query_id")
        .withColumnRenamed("d_len", "pos_len"), "query_id")
      .join(dLen.withColumnRenamed("doc_id", "neg_id")
        .withColumnRenamed("d_len", "neg_len"), "neg_id")
      .select(col("query_id"), col("rank"), col("neg_id"),
        coalesce(col("pos_overlap"), lit(0L)).as("pos_overlap"),
        (col("pos_len") + col("neg_len") -
          coalesce(col("pos_overlap"), lit(0L))).as("pos_union"),
        (coalesce(col("pos_overlap"), lit(0L)) * 2 <
          col("pos_len") + col("neg_len") -
            coalesce(col("pos_overlap"), lit(0L))).as("is_safe"))
  }

  /** Best-of-n sampling value readout (the rejection-sampling/BoN
    * selection stage of an RLHF pipeline — Stiennon et al. 2020 appendix;
    * Nakano et al. 2021 WebGPT, public literature): if a generator's
    * reward distribution per group equals the EMPIRICAL distribution of
    * `value`, the expected reward of keeping the best of `nDraws` iid
    * samples is  E[max] = Σ_v v · (F(v)ⁿ − F(v⁻)ⁿ) / Nⁿ  — the order-
    * statistic identity on the empirical CDF. Everything is exact integer
    * arithmetic: F and N are counts, the powers and the ×10⁶ scaling run
    * in DECIMAL(38,0) (DuckDB HUGEINT), and the output is fixed-point
    * BIGINT — no pow(), no doubles (the standing transcendental ban).
    *
    * The readout per group: the distribution mean, the best-of-n expected
    * value, and the uplift — the table that says how much reward headroom
    * sampling n candidates buys per source before any model change.
    *
    * Scale shape: the corpus collapses to (group, value) counts in one
    * map-side-combined shuffle; the CDF window runs over per-group
    * DISTINCT values (the value-count percentile discipline — right when
    * the domain is bounded; a near-unique 10⁸-value domain wants the
    * grid-rank form first). Envelope: Nⁿ·vmax·10⁶ must fit DECIMAL(38) —
    * n=4 holds to N ≈ 10⁷ rows/group at vmax 10³; ANSI decimal overflow
    * fails loudly beyond it. Values must be NON-NEGATIVE: the ×10⁶
    * readouts use integral division, and Spark `div` truncates where
    * DuckDB `//` floors (the q123 parity rule) — they agree only on
    * non-negative operands.
    *
    * @return source, n_docs, mean_e6, best_of_n_e6, uplift_e6
    */
  def bestOfN(docs: DataFrame, value: Column, nDraws: Int = 4): DataFrame = {
    def pow(x: Column): Column = {
      val d = x.cast("decimal(38,0)")
      (1 until nDraws).foldLeft(d)((acc, _) => acc * d)
    }
    val counts = docs.select(col("source"), value.cast("long").as("v"))
      .groupBy(col("source"), col("v")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("source")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .withColumn("f", sum(col("c")).over(w))
      .groupBy(col("source"))
      .agg(sum(col("c")).as("n_docs"),
        sum(col("v") * col("c")).as("sv"),
        sum(col("v").cast("decimal(38,0)") *
          (pow(col("f")) - pow(col("f") - col("c")))).as("num"))
      .select(col("source"), col("n_docs"),
        expr("CAST(CAST(sv AS DECIMAL(38,0)) * 1000000 " +
          "div CAST(n_docs AS DECIMAL(38,0)) AS BIGINT)").as("mean_e6"),
        expr(s"CAST(num * 1000000 div ${
          Seq.fill(nDraws)("CAST(n_docs AS DECIMAL(38,0))").mkString("(", " * ", ")")
        } AS BIGINT)").as("best_of_n_e6"))
      .withColumn("uplift_e6", col("best_of_n_e6") - col("mean_e6"))
  }
}
