package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large text corpora, over the `documents`
  * table: exact, n-gram Jaccard, MinHash+LSH, and SimHash.
  *
  * Scale design:
  *  - exact: one hash aggregation on the key — the canonical map-side-combine
  *    shape; at 100 TB, dedup on a digest column (`xxhash64(text)`) so the
  *    shuffle carries 8-byte keys, not document bodies.
  *  - n-gram Jaccard: shingle-join produces |pairs sharing ≥1 shingle| — at
  *    scale this is pre-filtered by MinHash LSH below so the join only sees
  *    candidate buckets, never the full cross product.
  *  - MinHash+LSH: signatures are computed per document in one pass
  *    (explode → min-hash aggregation), then banded; only same-band pairs are
  *    verified. Band count/width trade recall vs candidate volume.
  *  - SimHash: single aggregation per doc; near-dup = small Hamming distance.
  *
  * Hash functions are explicit modular arithmetic (not engine-native hashes)
  * so results are engine-independent and oracle-checkable.
  *
  * Round 15: every pair-producing operator here rides the EXACT-DUPLICATE
  * pre-collapse ([[graft.ext.ExactCollapse]]) — identical items group to
  * one representative before any band/bucket/block join, expansions
  * reproduce the uncollapsed output bit-for-bit (ExactCollapseSpec), and
  * connectivity consumers take star-edge lists instead of expanded pairs.
  * m exact copies of a popular document cost m expansion rows, never m²/2
  * in-bucket candidates — the difference between a dedup pass that
  * survives a re-crawled 100 TB corpus and one that drowns in it.
  */
object Dedup {

  /** A10-style exact dedup: keep the highest `keepCol` per duplicate group
    * (the reference's dict-overwrite ⇒ last wins).
    */
  def exactKeepMax(df: DataFrame, keyCol: String, keepCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(keepCol).desc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Character 3-gram shingle codes, exact integer encoding (engine-neutral):
    * code(i) = ascii(c_i)·65536 + ascii(c_{i+1})·256 + ascii(c_{i+2}).
    * Distinct per document.
    */
  def shingleCodes(text: Column, n: Int = 3): Column =
    // codegen'd kernel ([[graft.functions.ShingleCodes]]) — bit-identical
    // (values + first-occurrence order) to the previous HOF formulation
    // `array_distinct(transform(sequence(1, len−n+1), i → Σ ascii·256^k))`
    // incl. the len < n empty-array guard, but one primitive loop per row
    // instead of a per-character interpreter round-trip
    graft.functions.ShingleCodes.shingleCodesCol(text, n)

  /** Document → exploded distinct shingle rows (doc_id, shingle). */
  def docShingles(docs: DataFrame, n: Int = 3): DataFrame =
    docs.select(col("doc_id"), explode(shingleCodes(col("text"), n)).as("shingle"))

  /** Pairwise n-gram Jaccard similarity for pairs sharing at least one
    * shingle: |A∩B| via shingle join, |A|,|B| via per-doc counts.
    * Emits (doc_a, doc_b, inter, size_a, size_b, jaccard) with doc_a < doc_b.
    *
    * Exact-collapse (round 15, completing the family): identical texts
    * ride one representative through the shingle self-join. inter/jaccard
    * are SYMMETRIC payloads and expand directly; size_a/size_b are
    * orientation-SENSITIVE under the expansion's least/greatest id
    * normalization (a member pair can flip relative to its rep pair when
    * groups' id ranges interleave), so sizes re-attach per normalized id
    * from the rep-grain size frame through the membership — group-constant
    * values, bit-identical output (ExactCollapseSpec).
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 3, minJaccard: Double = 0.5): DataFrame = {
    val (members, reps) = textCollapsed(docs, n)
    val repPairs = ngramJaccardPairsDistinct(reps, n, minJaccard)
    val repSizes = docShingles(reps, n).groupBy("doc_id")
      .agg(count(lit(1)).as("sz"))
    val sizeByDoc = members
      .join(repSizes.withColumnRenamed("doc_id", "rep"), Seq("rep"))
      .select(col("doc_id"), col("sz"))
    val cross = ExactCollapse.expandUnordered(
      repPairs.select(col("doc_a"), col("doc_b"), col("inter"),
        col("jaccard")),
      members, "doc_a", "doc_b", Seq("inter", "jaccard"))
      .join(sizeByDoc.toDF("doc_a", "size_a"), "doc_a")
      .join(sizeByDoc.toDF("doc_b", "size_b"), "doc_b")
    // identical shingle sets: inter = |A| = |B|, jaccard = sz/sz = 1.0
    // exactly (IEEE x/x) — the uncollapsed path's bits
    val within = ExactCollapse.withinPairs(
      members.join(repSizes.withColumnRenamed("doc_id", "rep"), Seq("rep")),
      "doc_a", "doc_b", Seq("sz"))
      .select(col("doc_a"), col("doc_b"), col("sz").as("inter"),
        col("sz").as("size_a"), col("sz").as("size_b"),
        lit(1.0).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
    cross.select("doc_a", "doc_b", "inter", "size_a", "size_b", "jaccard")
      .unionByName(within)
  }

  /** The uncollapsed shingle self-join body (the spec's bit-equality
    * reference; [[ngramJaccardPairs]] runs it on representatives).
    */
  private[graft] def ngramJaccardPairsDistinct(docs: DataFrame, n: Int,
                                               minJaccard: Double)
      : DataFrame = {
    val sh = docShingles(docs, n)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "size_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "size_b"), "doc_b")
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("size_a") + col("size_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "inter", "size_a", "size_b", "jaccard")
  }

  /** Asymmetric shingle CONTAINMENT — C(A⊂B) = |A∩B| / |A| — the
    * sub-document duplicate detector Jaccard misses: a short doc fully
    * embedded in a long one has high containment but low Jaccard (the
    * union is dominated by the long doc). Emits ORDERED pairs (inner,
    * outer), inner ≠ outer, with containment ≥ `minContain`.
    *
    * Same scale posture as [[ngramJaccardPairs]]: the shingle self-join is
    * the exact small-corpus form; at 100 TB the candidate set comes from
    * LSH first (asymmetric variants hash only the smaller side's shingles).
    */
  def containmentPairs(docs: DataFrame, n: Int = 3,
                       minContain: Double = 0.8): DataFrame = {
    // exact-collapse: the ORDERED expansion preserves sides, so every
    // payload (incl. the orientation-sensitive sizes) rides through
    // directly; within-group ordered pairs are the containment-1.0
    // clique in both directions (inter = size_inner = size_outer = sz,
    // containment = sz/sz = 1.0 exactly — the uncollapsed bits)
    val (members, reps) = textCollapsed(docs, n)
    val repPairs = containmentPairsDistinct(reps, n, minContain)
    // both member sides are the same frame, but rep pairs always span two
    // DISTINCT groups (the =!= in the rep body), so no self or duplicate
    // rows can arise from the ordered expansion
    val cross = ExactCollapse.expandOrdered(repPairs, members, members,
      "inner_doc", "outer_doc",
      Seq("inter", "size_inner", "size_outer", "containment"))
    val sized = members.join(
      docShingles(reps, n).groupBy("doc_id").agg(count(lit(1)).as("sz"))
        .withColumnRenamed("doc_id", "rep"), Seq("rep"))
    val w0 = ExactCollapse.withinPairs(sized, "inner_doc", "outer_doc",
      Seq("sz"))
    val within = w0
      .unionByName(w0.select(col("outer_doc").as("inner_doc"),
        col("inner_doc").as("outer_doc"), col("sz")))
      .select(col("inner_doc"), col("outer_doc"), col("sz").as("inter"),
        col("sz").as("size_inner"), col("sz").as("size_outer"),
        lit(1.0).as("containment"))
      .filter(col("containment") >= minContain)
    cross.unionByName(within)
  }

  /** The uncollapsed containment self-join body (the spec's bit-equality
    * reference; [[containmentPairs]] runs it on representatives).
    */
  private[graft] def containmentPairsDistinct(docs: DataFrame, n: Int,
                                              minContain: Double)
      : DataFrame = {
    val sh = docShingles(docs, n)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .groupBy(col("a.doc_id").as("inner_doc"), col("b.doc_id").as("outer_doc"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.withColumnRenamed("doc_id", "inner_doc")
        .withColumnRenamed("sz", "size_inner"), "inner_doc")
      .join(sizes.withColumnRenamed("doc_id", "outer_doc")
        .withColumnRenamed("sz", "size_outer"), "outer_doc")
      .withColumn("containment",
        col("inter").cast("double") / col("size_inner").cast("double"))
      .filter(col("containment") >= minContain)
      .select("inner_doc", "outer_doc", "inter", "size_inner", "size_outer",
        "containment")
  }

  /** MinHash parameters: h_j(x) = (a_j·x + b_j) mod P, j = 0..k-1.
    * P is a Mersenne prime; a_j, b_j are fixed odd/even linear-congruential
    * streams — deterministic and engine-neutral.
    */
  val MinhashP = 2147483647L
  def minhashA(j: Int): Long = 2L * j + 1
  def minhashB(j: Int): Long = 97L + 31L * j

  /** Per-document MinHash signature as `k` columns — array_min over the
    * transformed code array, one per-row projection (round 16: this
    * replaced an explode → groupBy(doc_id) → k-way min aggregation, which
    * paid a full exchange of the exploded shingle rows in EVERY minhash
    * pipeline; the per-row form needs no shuffle at all and is the same
    * arithmetic the streaming gate and the band index use — values
    * bit-identical, proven by StreamingSpec's whole-vs-batch equality
    * and the unchanged oracle hashes). Docs with no shingle (< n chars)
    * are absent, matching the grouped form's semantics.
    */
  def minhashSignatures(docs: DataFrame, k: Int = 16, n: Int = 3): DataFrame = {
    val sigCols = (0 until k).map { j =>
      array_min(transform(col("codes"), s =>
        pmod(lit(minhashA(j)) * s + lit(minhashB(j)), lit(MinhashP))))
        .as(s"mh_$j")
    }
    docs.select(col("doc_id"), shingleCodes(col("text"), n).as("codes"))
      .filter(size(col("codes")) > 0)
      .select(col("doc_id") +: sigCols: _*)
  }

  /** LSH banding: signatures → (band, band-signature string) rows; documents
    * sharing any band signature are candidate near-duplicates. Candidates are
    * then verified with exact Jaccard (`ngramJaccardPairs` restricted to the
    * candidate set in a real pipeline; here re-verified directly).
    *
    * @return candidate pairs (doc_a < doc_b), distinct.
    */
  def minhashLshCandidates(docs: DataFrame, k: Int = 16, bands: Int = 4,
                           n: Int = 3): DataFrame = {
    require(k % bands == 0, "band width must divide signature length")
    // one-pass codegen'd band signatures (round 19): the per-column
    // formulation (16 × array_min(transform(shingle_codes))) was inlined
    // by CollapseProject/InferFiltersFromGenerate into every consumer AND
    // into a pushed scan filter — ~50 shingle_codes evaluations per row
    // (see [[graft.functions.MinhashBandSigs]]; bit-parity spec'd there).
    // The kernel's empty array for sub-n docs makes posexplode drop them,
    // exactly like the previous size(codes) > 0 filter.
    val banded = docs.select(
      col("doc_id"),
      posexplode(graft.functions.MinhashBandSigs
        .bandSigsCol(col("text"), n, k, bands)).as(Seq("band", "band_sig")))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.band_sig") === col("y.band_sig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
  }

  /** Exact-duplicate pre-collapse for the MinHash family
    * ([[graft.ext.ExactCollapse]]): byte-identical texts carry identical
    * shingle sets, signatures and bands, so m copies of one document would
    * flood their LSH bucket with m²/2 candidate pairs before any verify
    * step could cut them. Group on the text body (an engine-hash digest
    * leads the shuffle key so the sort compares 8 bytes before bodies —
    * the digest never reaches the output, so engine-neutrality is
    * untouched), run the pair machinery on one representative per group,
    * and re-expand — bit-identical output, quadratic work on DISTINCT
    * texts only. Docs shorter than one shingle have no signature and never
    * pair (the uncollapsed semantics), so their groups are excluded here.
    *
    * @return (members (rep, doc_id), reps — one full row per distinct text)
    */
  private def textCollapsed(docs: DataFrame, n: Int): (DataFrame, DataFrame) = {
    val eligible = docs.filter(length(col("text")) >= n)
    // pinned: members + reps + their signature/size frames all branch off
    // this one materialization (round-16 fix for the per-branch rescan)
    val keyed = ExactCollapse.withRepPinned(eligible, "doc_id",
      Seq(xxhash64(col("text")), col("text")))
    (keyed.select(col("rep"), col("doc_id")),
      keyed.filter(col("doc_id") === col("rep")).drop("rep"))
  }

  /** MinHash-LSH near-dup pipeline with exact-Jaccard verification of the
    * candidates only (the 100 TB shape: LSH prunes the quadratic join),
    * over the exact-collapse representatives: identical texts ride ONE rep
    * through the band join and expand back afterwards — every derived
    * quantity (bands, Jaccard) is group-constant, so the output is
    * bit-identical to the uncollapsed form (ExactCollapseSpec proves it)
    * while m exact copies cost m expansion rows, not m²/2 candidates.
    */
  def minhashNearDups(docs: DataFrame, k: Int = 16, bands: Int = 4,
                      n: Int = 3, minJaccard: Double = 0.5): DataFrame = {
    val (members, reps) = textCollapsed(docs, n)
    val repPairs = minhashNearDupsDistinct(reps, k, bands, n, minJaccard)
    val cross = ExactCollapse.expandUnordered(repPairs, members,
      "doc_a", "doc_b", Seq("jaccard"))
    // identical shingle sets: inter = size = sz, so the uncollapsed path
    // computes sz/(sz+sz−sz) = 1.0 exactly (IEEE x/x) — lit(1.0) is the
    // same bits; the threshold filter still applies (degenerate > 1.0)
    val within = ExactCollapse.withinPairs(members, "doc_a", "doc_b", Nil)
      .withColumn("jaccard", lit(1.0))
      .filter(col("jaccard") >= minJaccard)
    cross.unionByName(within)
  }

  /** Connectivity-equivalent near-dup EDGE list for cluster/keeper
    * consumers ([[nearDupClusters]], q36/q78): rep-grain verified pairs
    * plus m−1 star edges per identical-text group — the same connected
    * components as the m²/2 expanded pairs with linear edge mass
    * ([[graft.ext.ExactCollapse.starEdges]]).
    */
  def minhashNearDupEdges(docs: DataFrame, k: Int = 16, bands: Int = 4,
                          n: Int = 3, minJaccard: Double = 0.5): DataFrame = {
    val (members, reps) = textCollapsed(docs, n)
    minhashNearDupsDistinct(reps, k, bands, n, minJaccard)
      .select(col("doc_a"), col("doc_b"))
      .unionByName(ExactCollapse.starEdges(members, "doc_a", "doc_b")
        // an identical-text group is one jaccard-1.0 clique; its edges
        // exist exactly when the within pairs would pass the threshold
        .filter(lit(1.0 >= minJaccard)))
  }

  /** The uncollapsed pipeline body — candidate banding + exact-Jaccard
    * verify over the given docs as-is. [[minhashNearDups]] runs this on
    * exact-collapse representatives; the spec runs it on the full frame
    * as the bit-equality reference.
    */
  private[graft] def minhashNearDupsDistinct(docs: DataFrame, k: Int,
                                             bands: Int, n: Int,
                                             minJaccard: Double): DataFrame = {
    // Verify = the array_intersect kernel on the per-doc DISTINCT code
    // arrays (round 17 — the [[minhashNewVsIndex]] shape, one kernel for
    // both verifiers): ONE row per candidate pair instead of the exploded
    // shingle equi-join, whose |A∩B|-rows-per-pair intermediate amplified
    // ~|shingles|× INSIDE its stage — invisible to AQE's byte heuristic,
    // which coalesced the few-MB candidate exchange to 2 partitions and
    // left 27 s of verify CPU on 2 of 32 cores (StageAudit, q264 at
    // sf0.1). Integer-identical: the arrays are distinct, so
    // size(array_intersect) IS the shingle-join match count and the
    // jaccard division is the same IEEE op — every oracle hash unchanged.
    // The explicit-count repartition pins the per-pair intersect's stage
    // width (user repartitions are AQE-coalesce-exempt, the q206/IVF
    // amplification discipline).
    val dp = docs.sparkSession.sparkContext.defaultParallelism
    // length(text) ≥ n ⟺ size(codes) > 0 (round 19): the size() form was
    // pushed down WITH the whole shingle_codes tree inlined, re-running
    // the kernel 3× per row (scan filter + FilterExec + project)
    val codes = docs.filter(length(col("text")) >= n)
      .select(col("doc_id"), shingleCodes(col("text"), n).as("codes"))
    minhashLshCandidates(docs, k, bands, n)
      .repartition(dp, col("doc_a"))
      .join(codes.select(col("doc_id").as("doc_a"),
        col("codes").as("codes_a")), "doc_a")
      .join(codes.select(col("doc_id").as("doc_b"),
        col("codes").as("codes_b")), "doc_b")
      .withColumn("inter",
        size(array_intersect(col("codes_a"), col("codes_b"))).cast("long"))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (size(col("codes_a")) + size(col("codes_b")) - col("inter"))
            .cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Incremental near-dup pass (round 10): which NEW-batch docs are
    * near-dups of an EXISTING corpus — the dedup-against-prior-crawl gate
    * every refreshed training set runs before admitting a batch. Same
    * banded-LSH prune + exact-Jaccard-on-candidates shape as
    * [[minhashNearDups]], but the band join is NEW × CORPUS only:
    * within-batch and within-corpus pairs never form. At 100 TB the
    * corpus side's signatures and shingles are exactly the standing
    * artifacts an incremental pipeline keeps materialized between
    * batches — the per-batch cost is the new side's hashing plus one
    * band join against a static table, independent of how many batches
    * came before.
    *
    * @return (new_id, corpus_id, jaccard) for candidate pairs whose exact
    *         shingle Jaccard ≥ `minJaccard`
    */
  /** Near-duplicate CLUSTER readout: the [[minhashNearDups]] pair list
    * closed into connected components (transitive near-duplication — if
    * A≈B and B≈C, keeping both A and C still trains on the same content
    * twice), then rolled up as a cluster-size histogram with the
    * keep-one-per-cluster removal mass. This is the number a dedup run
    * reports: how much of the corpus a canonical-representative pass
    * deletes, and whether duplication is many small pairs or a few
    * giant blobs (the remediation differs).
    *
    * Docs in no pair are size-1 clusters — the histogram covers the
    * WHOLE input, so Σ n_docs equals the corpus slice unconditionally.
    *
    * Scale shape: LSH-banded pair generation (never all-pairs), the
    * q36/CC pointer-jumping closure with its Pin discipline, then two
    * tiny hash aggregations (component grain, then size grain). A
    * connectivity consumer needs no pair expansion at all — it rides
    * [[minhashNearDupEdges]] (rep pairs + star edges), so exact-copy
    * multiplicity costs m−1 edges instead of m²/2 pairs.
    */
  def nearDupClusters(docs: DataFrame, k: Int = 16, bands: Int = 4,
                      n: Int = 3, minJaccard: Double = 0.5): DataFrame =
    Components.clusterSizeHistogram(
      docs.select(col("doc_id")),
      minhashNearDupEdges(docs, k, bands, n, minJaccard),
      "n_docs", "docs_removed")

  def minhashNewVsCorpus(newDocs: DataFrame, corpus: DataFrame,
                         k: Int = 16, bands: Int = 4, n: Int = 3,
                         minJaccard: Double = 0.5): DataFrame = {
    // exact-collapse BOTH sides (a crawl refresh re-fetches popular pages
    // many times over): the band join runs rep × rep, then the ordered
    // expansion re-attaches every (new member, corpus member) combination
    // with the group-constant jaccard — bit-identical to the uncollapsed
    // gate. Within-group pairs cannot exist here (the sides are disjoint
    // frames), so no within path applies.
    val (mNew, rNew) = textCollapsed(newDocs, n)
    val (mCor, rCor) = textCollapsed(corpus, n)
    val repPairs = minhashNewVsCorpusDistinct(rNew, rCor, k, bands, n,
      minJaccard)
    ExactCollapse.expandOrdered(repPairs, mNew, mCor,
      "new_id", "corpus_id", Seq("jaccard"))
  }

  /** Uncollapsed gate body (see [[minhashNearDupsDistinct]]'s contract). */
  private[graft] def minhashNewVsCorpusDistinct(
      newDocs: DataFrame, corpus: DataFrame, k: Int, bands: Int, n: Int,
      minJaccard: Double): DataFrame = {
    require(k % bands == 0, "band width must divide signature length")
    // one-pass codegen'd band signatures (round 19, the
    // minhashLshCandidates rewrite — see [[graft.functions.MinhashBandSigs]])
    def banded(docs: DataFrame): DataFrame =
      docs.select(
        col("doc_id"),
        posexplode(graft.functions.MinhashBandSigs
          .bandSigsCol(col("text"), n, k, bands))
          .as(Seq("band", "band_sig")))
    val cands = banded(newDocs).as("x").join(banded(corpus).as("y"),
        col("x.band") === col("y.band") &&
          col("x.band_sig") === col("y.band_sig"))
      .select(col("x.doc_id").as("new_id"), col("y.doc_id").as("corpus_id"))
      .distinct()
      // explicit-count repartition before the per-pair verify — the
      // minhashNearDupsDistinct AQE-blind-spot fix, same reasoning
      .repartition(newDocs.sparkSession.sparkContext.defaultParallelism,
        col("new_id"))
    // verify = the array_intersect kernel on distinct code arrays (the
    // one verify shape shared with minhashNearDupsDistinct and
    // minhashNewVsIndex) — integer-identical to the shingle equi-join
    def codesOf(docs: DataFrame): DataFrame = docs
      // length form for the same reason as minhashNearDupsDistinct's
      // codes frame (kernel would otherwise inline into the pushed filter)
      .filter(length(col("text")) >= n)
      .select(col("doc_id"), shingleCodes(col("text"), n).as("codes"))
    cands
      .join(codesOf(newDocs).select(col("doc_id").as("new_id"),
        col("codes").as("codes_n")), "new_id")
      .join(codesOf(corpus).select(col("doc_id").as("corpus_id"),
        col("codes").as("codes_c")), "corpus_id")
      .withColumn("inter",
        size(array_intersect(col("codes_n"), col("codes_c"))).cast("long"))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (size(col("codes_n")) + size(col("codes_c")) - col("inter"))
            .cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select("new_id", "corpus_id", "jaccard")
  }

  /** The standing MinHash band INDEX of a corpus — the 100 TB asset shape.
    * Signatures and shingle sets are computed ONCE when a corpus lands and
    * PERSISTED (one parquet row per doc); every later admission batch
    * ([[minhashNewVsIndex]]) reads the index back instead of re-scanning
    * and re-hashing the full corpus text — at scale the index is a few %
    * of the text bytes and the gate becomes index-read-bound.
    *
    * One row per doc with ≥ 1 shingle:
    * (doc_id, codes: array<long> — the DISTINCT shingle codes, which the
    * verify step needs for exact Jaccard; band_sigs: array<string>, one
    * per band). Longs + strings round-trip parquet losslessly
    * (Round16OpsSpec writes/reads one and proves the gate unchanged).
    * Same per-hash arithmetic as [[minhashSignatures]] (array_min over
    * the transformed code array — the dedupGateStream formulation, parity
    * proven by StreamingSpec and the q263 oracle).
    */
  def buildBandIndex(corpus: DataFrame, k: Int = 16, bands: Int = 4,
                     n: Int = 3): DataFrame = {
    require(k % bands == 0, "band width must divide signature length")
    // the index GEOMETRY (k/bands/n) rides as column metadata — Spark
    // persists field metadata through parquet (the row.metadata footer),
    // so [[minhashNewVsIndex]] can fail loudly when probed with
    // mismatched parameters instead of silently matching zero bands
    val geom = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("k", k).putLong("bands", bands).putLong("n", n).build()
    // round 19: band_sigs via the one-pass codegen kernel (bit-parity
    // spec'd in MinhashKernelSpec), and the shingle-presence filter as a
    // cheap length() predicate — length(text) ≥ n ⟺ size(codes) > 0 (the
    // kernel and ShingleCodes count the same code points; null → null →
    // dropped either way). The previous size(codes) > 0 form was pushed
    // into the parquet scan WITH the whole shingle_codes tree inlined,
    // re-evaluating it per row per consumer.
    corpus
      .filter(length(col("text")) >= n)
      .select(col("doc_id"), shingleCodes(col("text"), n).as("codes"),
        graft.functions.MinhashBandSigs.bandSigsCol(col("text"), n, k, bands)
          .as("band_sigs", geom))
  }

  /** The admission gate against a PERSISTED [[buildBandIndex]] frame —
    * [[minhashNewVsCorpus]]'s exact output contract without touching
    * corpus text. Candidates come from the stream-static-shaped band
    * join; exact Jaccard comes from the STORED shingle sets
    * (array_intersect on distinct code arrays ≡ the shingle-join
    * count — integer-identical, so the division is the same IEEE op).
    * The NEW side still exact-collapses (a crawl refresh re-fetches
    * popular pages m× — reps ride the band join, members expand after);
    * the corpus side needs no collapse here because new×index candidate
    * mass is linear in index copies, not quadratic.
    */
  def minhashNewVsIndex(newDocs: DataFrame, index: DataFrame, k: Int = 16,
                        bands: Int = 4, n: Int = 3,
                        minJaccard: Double = 0.5): DataFrame = {
    // geometry cross-check against the metadata [[buildBandIndex]] wrote
    // (survives the parquet round-trip): probing a k=16/bands=4/n=3 index
    // with bands=8 would silently match zero band positions and drop
    // every near-dup — the derive-vs-stored divergence class the IVF
    // index's is_centroid flag guards against
    val meta = index.schema("band_sigs").metadata
    for ((name, want) <- Seq("k" -> k, "bands" -> bands, "n" -> n)) {
      // absent metadata fails too (round-17 hardening): a frame whose
      // column metadata was stripped (select/union transforms, non-Spark
      // parquet writers) would otherwise SKIP the check — and a
      // mis-parameterized probe against it silently matches zero bands,
      // the exact failure this guard exists to prevent
      require(meta.contains(name),
        s"index has no '$name' geometry metadata — rebuild it with " +
          "buildBandIndex (or re-attach the band_sigs metadata); probing " +
          "an unlabeled index cannot be validated")
      require(meta.getLong(name) == want,
        s"index was built with $name=${meta.getLong(name)}, probed " +
          s"with $name=$want — rebuild the index or match the caller")
    }
    val (mNew, rNew) = textCollapsed(newDocs, n)
    val newIdx = buildBandIndex(rNew, k, bands, n)
    // the band join carries ONLY (id, band, band_sig) — round 17: the
    // previous shape rode the full per-doc code array through the bands×
    // explode and its shuffle (bands× duplication of kilobyte arrays; at
    // the 10× sweep point that was gigabytes of shuffle for q270). Codes
    // re-attach per SIDE per PAIR below, after multi-band dedup — parquet
    // column pruning means the second index scan reads just (doc_id,
    // codes), the columnar layout's whole point.
    def bandsOnly(df: DataFrame, idAs: String): DataFrame =
      df.select(col("doc_id").as(idAs),
        posexplode(col("band_sigs")).as(Seq("band", "band_sig")))
    val repPairs = bandsOnly(newIdx, "new_id")
      .join(bandsOnly(index, "corpus_id"), Seq("band", "band_sig"))
      .select(col("new_id"), col("corpus_id"))
      // multi-band matches collapse here; codes are per-id constants so
      // the pair key alone decides distinctness
      .dropDuplicates("new_id", "corpus_id")
      // explicit-count repartition before the per-pair verify (the
      // minhashNearDupsDistinct AQE-blind-spot discipline)
      .repartition(newDocs.sparkSession.sparkContext.defaultParallelism,
        col("new_id"))
      .join(newIdx.select(col("doc_id").as("new_id"),
        col("codes").as("codes_new")), "new_id")
      .join(index.select(col("doc_id").as("corpus_id"),
        col("codes").as("codes_cor")), "corpus_id")
      .withColumn("inter",
        size(array_intersect(col("codes_new"), col("codes_cor")))
          .cast("long"))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (size(col("codes_new")) + size(col("codes_cor")) - col("inter"))
            .cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("new_id"), col("corpus_id"), col("jaccard"))
    ExactCollapse.expandOrdered(repPairs, mNew,
      index.select(col("doc_id"), col("doc_id")),
      "new_id", "corpus_id", Seq("jaccard"))
  }

  /** [[buildBandIndex]] stamped with the corpus's q222 content digest
    * (round 18): the versioned form [[Assets.ensure]] persists once per
    * (corpus digest, geometry) and serves to every later probe. Eager on
    * the digest (one scan-bound aggregation) — build time, not probe time.
    */
  def buildBandIndexVersioned(corpus: DataFrame, k: Int = 16,
                              bands: Int = 4, n: Int = 3): DataFrame =
    Assets.stamp(buildBandIndex(corpus, k, bands, n), "band_sigs",
      Assets.textDigest(corpus))

  /** Loud id-disjointness guard shared by the advance builders: an
    * admission delta re-containing an already-indexed id would leave TWO
    * index rows for one doc after the union — a from-scratch build has
    * one, so the advanced asset would silently fork from the rebuild
    * (double-counted candidates, duplicate gate pairs). One broadcast
    * anti-join probe over the asset's id column — index-grain, never
    * corpus text; the advance publish rewrites the index anyway, so the
    * check does not change the cost class.
    */
  private def requireDisjointIds(asset: DataFrame, delta: DataFrame,
                                 what: String): Unit = {
    val overlap = asset.select(col("doc_id"))
      .join(broadcast(delta.select(col("doc_id")).distinct()), "doc_id")
      .limit(1).collect()
    require(overlap.isEmpty,
      s"$what advance: delta re-contains indexed doc_id " +
        s"${overlap.headOption.map(_.getLong(0)).getOrElse(-1L)} — a " +
        "delta must be NEW docs only; rebuild the asset for a corpus " +
        "rewrite")
  }

  /** Incremental maintenance of a standing [[buildBandIndex]] asset —
    * the [[Assets.advance]] step for the MinHash family. The index is
    * per-doc independent (signatures and shingle codes are pure
    * functions of one doc's text), so the new corpus version's index is
    * EXACTLY the old rows plus the delta's rows: value-identical to
    * `buildBandIndex(corpus ∪ delta)`, at delta-shingling cost instead
    * of a full corpus re-scan (Round19OpsSpec proves row-set equality
    * through a real parquet round-trip; q276's oracle holds the probe to
    * the from-scratch hashes). Geometry metadata rides from the old
    * index through the union; a geometry-mismatched advance fails loudly
    * below instead of unioning incomparable signatures.
    */
  def advanceBandIndex(index: DataFrame, delta: DataFrame, k: Int = 16,
                       bands: Int = 4, n: Int = 3): DataFrame = {
    val meta = index.schema("band_sigs").metadata
    for ((name, want) <- Seq("k" -> k, "bands" -> bands, "n" -> n)) {
      require(meta.contains(name) && meta.getLong(name) == want,
        s"band index advance: index geometry '$name' is " +
          s"${if (meta.contains(name)) meta.getLong(name).toString
             else "absent"}, advancing with $name=$want would union " +
          "incomparable signatures — match the index or rebuild")
    }
    requireDisjointIds(index, delta, "band index")
    index.unionByName(buildBandIndex(delta, k, bands, n))
  }

  /** [[minhashNewVsIndex]] behind the freshness gate: `digest` is the
    * admitting corpus's CURRENT digest (catalog-served at scale, see
    * [[Assets]]); a stale or unstamped index fails loudly BEFORE any band
    * join runs — a gate probing last week's index silently admits every
    * duplicate of a doc that landed since.
    */
  def minhashNewVsIndexFresh(newDocs: DataFrame, index: DataFrame,
                             digest: Long, k: Int = 16, bands: Int = 4,
                             n: Int = 3, minJaccard: Double = 0.5)
      : DataFrame =
    minhashNewVsIndex(newDocs,
      Assets.requireFresh(index, "band_sigs", digest),
      k, bands, n, minJaccard)

  /** Greedy MAX-COVERAGE data selection (the submodular facility-location
    * family — pick the k documents that jointly cover the most distinct
    * content; the classic (1−1/e)-greedy, public literature): round t
    * selects the not-yet-selected doc covering the most still-uncovered
    * shingles (exact integer gain, ties to the smallest doc_id), adds its
    * shingles to the covered set, and stops early when no remaining doc
    * adds anything. The coverage curve (gain + cumulative covered per
    * round) is the diminishing-returns readout a data-selection budget is
    * set against.
    *
    * Deterministic end to end: gains are exact set cardinalities of the
    * engine-neutral shingle codes, so the selection ORDER is
    * oracle-checkable (DuckDB replays the rounds as unrolled CTEs — the
    * q231 fixed-iteration discipline).
    *
    * Scale shape: per round one anti-join (uncovered shingles) + one
    * hash-agg + a 1-row argmax (`orderBy.limit(1)` = TakeOrdered, never a
    * global sort); the winner row and the running covered-count are the
    * only driver-side state (O(k) rows total). The covered-shingle frame
    * is Pin'd each round — without it the union lineage doubles per round
    * (the q231 plan-growth lesson). k is a fixed small parameter; at
    * 100 TB the same loop runs with the covered set as a standing table.
    *
    * @return one row per selected doc: (round, doc_id, gain, covered_cum),
    *         round 1-based, covered_cum = |covered shingles| after the pick
    */
  def greedyCoverage(docs: DataFrame, k: Int = 6, n: Int = 3): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val spark = docs.sparkSession
    import spark.implicits._
    val sh = graft.Pin(docShingles(docs, n))
    var covered: DataFrame = sh.select(col("shingle")).limit(0)
    var selectedIds = Set.empty[Long]
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    var round = 1
    var done = false
    while (round <= k && !done) {
      val gains = sh
        .filter(!col("doc_id").isInCollection(
          if (selectedIds.isEmpty) Seq(-1L) else selectedIds.toSeq))
        .join(covered, Seq("shingle"), "left_anti")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("gain"))
        .orderBy(col("gain").desc, col("doc_id"))
        .limit(1)
        .as[(Long, Long)].collect()
      gains.headOption match {
        case Some((winner, gain)) if gain > 0 =>
          // distinct: different docs share shingles, and covered_cum is
          // the SET size (the left_anti prune is dup-insensitive, the
          // count is not)
          covered = graft.Pin(covered.union(
            sh.filter(col("doc_id") === winner).select(col("shingle")))
            .distinct())
          selectedIds += winner
          val cum = covered.count()
          out += ((round.toLong, winner, gain, cum))
          round += 1
        case _ => done = true // nothing left to cover: stop early
      }
    }
    out.toSeq.toDF("round", "doc_id", "gain", "covered_cum")
  }

  /** Sketch-based distinct counting (the HLL-style extension from SURVEY
    * §2.10): approximate distinct shingles per document — fixed-size HLL
    * registers travel through the shuffle instead of every distinct value
    * (accuracy-vs-exactness comparison lives in ComponentsSpec, not here).
    */
  def approxDistinctShingles(docs: DataFrame, n: Int = 3,
                             rsd: Double = 0.05): DataFrame =
    docShingles(docs, n)
      .groupBy(col("doc_id"))
      .agg(approx_count_distinct(col("shingle"), rsd)
        .as("approx_distinct_shingles"))

  /** KMV (k-minimum-values) distinct-count sketch per language over the
    * token stream: with n distinct uniform hashes in [0, M), the k-th
    * smallest sits near k·M/n, so n̂ = (k−1)·M / h₍ₖ₎.
    *
    * Unlike HLL ([[approxDistinctShingles]]), every step here is
    * deterministic modular arithmetic over an engine-neutral hash
    * ([[graft.ext.TextStats.fingerprint]]) — the APPROXIMATE estimator is
    * itself oracle-checkable. The sketch state (the k smallest hashes) is
    * tiny and mergeable, which is what lets a 100 TB distinct-count ship
    * k values per partition through the shuffle instead of every distinct
    * token. Groups with fewer than k distinct hashes fall back to the exact
    * count (the sketch is exact below its capacity).
    */
  def kmvDistinctTokens(docs: DataFrame, k: Int = 16): DataFrame = {
    val M = 2147483648L // hash space: [0, 2^31)
    // distinct FIRST: both branches derive from the per-lang vocabulary, so
    // hashing is O(vocab) not O(corpus occurrences) and the token stream is
    // exploded/shuffled once, not twice (the oracle's `tok` CTE shape)
    val vocab = docs.select(col("lang"),
      explode(TextStats.tokens(col("text"))).as("term"))
      .distinct()
    val exact = vocab.groupBy("lang").agg(count(lit(1)).as("n_exact"))
    // fingerprint() of a short token is bounded by ~len·127·1000003 ≪ 2^31,
    // so it alone is NOT uniform on the hash space and would bias the
    // estimator high; the wrapping multiplicative step (a bijection on
    // [0, 2^31): odd multiplier mod 2^31) spreads it across the full range
    val hashes = vocab
      .select(col("lang"),
        graft.functions.Hashing.spread(TextStats.fingerprint(col("term")), M)
          .as("h"))
      .distinct()
    val w = Window.partitionBy("lang").orderBy("h")
    val kth = hashes.withColumn("rk", row_number().over(w))
      .filter(col("rk") === k)
      .select(col("lang"), col("h").as("kth_hash"))
    exact.join(kth, Seq("lang"), "left_outer")
      .select(col("lang"), col("n_exact"), col("kth_hash"),
        when(col("kth_hash").isNotNull && col("kth_hash") > 0,
          lit((k - 1).toDouble * M) / col("kth_hash"))
          .otherwise(col("n_exact").cast("double")).as("kmv_estimate"))
  }

  /** SimHash (16-bit, engine-neutral): per shingle, bit_j = 1 if
    * ((a_j·shingle + b_j) mod P) > P/2; per document, bit_j of the simhash is
    * 1 if the majority of shingles set it. Near-dups have small Hamming
    * distance between simhashes.
    */
  def simhash(docs: DataFrame, bits: Int = 16, n: Int = 3): DataFrame = {
    val sh = docShingles(docs, n)
    val bitCols = (0 until bits).map { j =>
      sum(when(pmod(lit(minhashA(j + 101)) * col("shingle") + lit(minhashB(j + 101)),
        lit(MinhashP)) > lit(MinhashP / 2), 1L).otherwise(0L)).as(s"c_$j")
    }
    val agg = sh.groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"), bitCols: _*)
    val hash = (0 until bits).map { j =>
      when(col(s"c_$j") * 2 > col("n_shingles"), lit(1L << j)).otherwise(0L)
    }.reduce(_ + _)
    agg.select(col("doc_id"), col("n_shingles"), hash.as("simhash"))
  }

  // ---- perceptual (image) difference-hash near-dup -----------------------

  /** dHash raster geometry: a 9-wide × 8-tall luma grid gives 8 horizontal
    * gradient comparisons per row = 64 bits (Krawetz's difference hash,
    * public literature). The 64 bits are kept as FOUR 16-bit band values
    * (rows 2b,2b+1 → band b): bands are simultaneously the LSH join key
    * (pigeonhole: two hashes within Hamming 3 share at least one of 4
    * bands verbatim) and sign-safe BIGINTs on both engines — a single
    * 64-bit scalar would put bit 63 in the sign and make div/mod banding
    * engine-dependent.
    */
  private val DhashW = 9
  private val DhashH = 8
  val DhashBands = 4

  /** Per-document dHash bands over the DETERMINISTIC text raster: the
    * first 72 chars of `text` read as a 9×8 luma grid (row-major, one
    * char per cell — the same text-bytes-as-media envelope as
    * q27/q232), bit (r,c) = 1 iff luma(r,c) < luma(r,c+1). Docs shorter
    * than one full raster are excluded (a real image always has a full
    * raster; a short doc's zero-padded tail rows would all collide on
    * band value 0 and quadratically flood the band join with junk
    * candidates). ASCII envelope as q27: `ascii` reads codepoints, the
    * engine-side bytes are UTF-8 — identical only for ASCII text, which
    * the fixture is.
    *
    * The REAL-image sibling is [[Multimodal.imageDHash]] (ImageIO decode,
    * area-averaged grid — not oracle-expressible, spec-covered); this
    * text-raster form makes the exact SAME banding/join/cluster pipeline
    * DuckDB-checkable end to end.
    *
    * @return doc_id, b0..b3 (each a 16-bit value in a BIGINT)
    */
  def dhashTextBands(docs: DataFrame): DataFrame = {
    def px(i: Int): Column = ascii(substring(col("text"), i, 1)).cast("long")
    val bandCols = (0 until DhashBands).map { b =>
      (for (r <- Seq(2 * b, 2 * b + 1); c <- 0 until DhashW - 1) yield
        when(px(r * DhashW + c + 1) < px(r * DhashW + c + 2),
          lit(1L << ((r % 2) * (DhashW - 1) + c))).otherwise(lit(0L))
      ).reduce(_ + _).as(s"b$b")
    }
    docs.filter(col("n_chars") >= DhashW * DhashH)
      .select(col("doc_id") +: bandCols: _*)
  }

  /** Perceptual near-dup pairs by dHash: band-equality LSH join (never
    * all-pairs — the same banding discipline as [[minhashLshCandidates]])
    * prunes to candidates, then the exact 64-bit Hamming distance over
    * the four bands keeps candidate pairs ≤ `maxDist`. Exact duplicates
    * land at distance 0; near-duplicates (small edits, crops of the
    * raster prefix) land low; unrelated docs that collide on one band
    * are cut by the exact verify — the canonical LSH prune → exact
    * verify shape.
    *
    * RECALL CONTRACT (the LSH trade, stated precisely): the 4-band
    * pigeonhole GUARANTEES every pair within Hamming 3; pairs at
    * distance 4..maxDist are found only if their differing bits spare at
    * least one band (a pair whose ≥4 flipped bits touch all four bands is
    * missed). This is deliberate — the complete alternative is the
    * all-pairs product the banding exists to avoid — and engine and
    * oracle share the same candidate set, so parity holds exactly over
    * the banded semantics.
    *
    * Scale: the join keys on (band, 16-bit value); hot values (e.g. a
    * constant-gradient band) bound candidates per bucket, and AQE
    * skew-split applies because it is a plain equi-join. Hamming is 4
    * codegen'd XOR+popcount ops per candidate.
    *
    * @return (doc_a < doc_b, hamming) for pairs with hamming ≤ maxDist
    */
  def dhashNearDups(docs: DataFrame, maxDist: Int = 16): DataFrame =
    dhashNearDupsFromBands(dhashTextBands(docs), maxDist)

  /** The collapse + band-join + expand pipeline over ANY (doc_id, b0..b3)
    * band frame — shared by the text-raster front ([[dhashNearDups]]) and
    * the real-image front ([[graft.ext.Multimodal.imageNearDups]]).
    *
    * Exact-collapse on the full 4-band hash ([[graft.ext.ExactCollapse]]):
    * m docs with one identical hash are one distance-0 clique and would
    * cost the band join m²/2 candidates; collapsed they cost ONE rep row,
    * plus m²/2 distance-0 OUTPUT rows the pair-list contract demands —
    * produced by a linear equi-join, never by candidate scoring. Hamming
    * is group-constant, so the expansion is bit-identical to the
    * uncollapsed form (ExactCollapseSpec).
    */
  private[ext] def dhashNearDupsFromBands(hash: DataFrame,
                                          maxDist: Int): DataFrame = {
    val (members, reps) = dhashCollapsedFromBands(hash)
    val cross = ExactCollapse.expandUnordered(
      dhashPairsFromBands(reps, maxDist), members,
      "doc_a", "doc_b", Seq("hamming"))
    val within = ExactCollapse.withinPairs(members, "doc_a", "doc_b", Nil)
      .withColumn("hamming", lit(0L))
      .filter(col("hamming") <= maxDist)
    cross.unionByName(within)
  }

  /** Connectivity-equivalent dHash EDGE list for the cluster/keeper
    * consumers ([[dhashClusters]], q255): rep-grain verified pairs plus
    * m−1 star edges per identical-hash group — same connected components
    * as the expanded pair list, linear edge mass.
    */
  def dhashNearDupEdges(docs: DataFrame, maxDist: Int = 16): DataFrame = {
    val (members, reps) = dhashCollapsed(docs)
    dhashPairsFromBands(reps, maxDist).select(col("doc_a"), col("doc_b"))
      .unionByName(ExactCollapse.starEdges(members, "doc_a", "doc_b")
        .filter(lit(0 <= maxDist))) // distance-0 clique passes iff the gate does
  }

  /** (members (rep, doc_id), reps — one hash row per distinct 4-band
    * value) — the exact-collapse frames shared by the dHash operators.
    */
  private def dhashCollapsed(docs: DataFrame): (DataFrame, DataFrame) =
    dhashCollapsedFromBands(dhashTextBands(docs))

  private def dhashCollapsedFromBands(hash: DataFrame)
      : (DataFrame, DataFrame) = {
    val keyed = ExactCollapse.withRepPinned(hash, "doc_id",
      (0 until DhashBands).map(b => col(s"b$b")))
    (keyed.select(col("rep"), col("doc_id")),
      keyed.filter(col("doc_id") === col("rep")).drop("rep"))
  }

  /** Uncollapsed band-join + exact-Hamming body over a (doc_id, b0..b3)
    * hash frame as-is; [[dhashNearDups]] runs it on exact-collapse reps,
    * the spec on the full frame as the bit-equality reference.
    */
  private[graft] def dhashNearDupsDistinct(docs: DataFrame,
                                           maxDist: Int): DataFrame =
    dhashPairsFromBands(dhashTextBands(docs), maxDist)

  private def dhashPairsFromBands(hash: DataFrame, maxDist: Int): DataFrame = {
    val banded = hash.select(col("doc_id"),
      posexplode(array((0 until DhashBands).map(b => col(s"b$b")): _*))
        .as(Seq("band", "v")))
    val cands = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.v") === col("y.v") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val ha = hash.toDF("doc_a" +: (0 until DhashBands).map(b => s"a$b"): _*)
    val hb = hash.toDF("doc_b" +: (0 until DhashBands).map(b => s"c$b"): _*)
    cands.join(ha, "doc_a").join(hb, "doc_b")
      .withColumn("hamming",
        (0 until DhashBands)
          .map(b => bit_count(col(s"a$b").bitwiseXOR(col(s"c$b"))))
          .reduce(_ + _).cast("long"))
      .filter(col("hamming") <= maxDist)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** Incremental PERCEPTUAL gate: which NEW-batch docs are dHash
    * near-dups of an EXISTING corpus — [[minhashNewVsCorpus]]'s
    * dedup-against-prior-crawl shape on the image raster. The band join
    * is NEW × CORPUS only (within-batch and within-corpus pairs never
    * form); candidates verify with the exact 4-band Hamming distance.
    * Same banded recall contract as [[dhashNearDups]]; at 100 TB the
    * corpus band table is the standing artifact between batches.
    *
    * @return (new_id, corpus_id, hamming) for pairs ≤ maxDist
    */
  def dhashNewVsCorpus(newDocs: DataFrame, corpus: DataFrame,
                       maxDist: Int = 16): DataFrame = {
    // exact-collapse both sides (the minhashNewVsCorpus discipline): the
    // band join runs rep × rep, the ordered expansion re-attaches every
    // (new member, corpus member) combination with the group-constant
    // Hamming distance — bit-identical to the uncollapsed gate
    val (mNew, rNew) = dhashCollapsed(newDocs)
    val (mCor, rCor) = dhashCollapsed(corpus)
    ExactCollapse.expandOrdered(
      dhashGateFromBands(rNew, rCor, maxDist), mNew, mCor,
      "new_id", "corpus_id", Seq("hamming"))
  }

  /** Uncollapsed gate body over two (doc_id, b0..b3) hash frames (see
    * [[dhashNearDupsDistinct]]'s contract).
    */
  private[graft] def dhashNewVsCorpusDistinct(newDocs: DataFrame,
                                              corpus: DataFrame,
                                              maxDist: Int): DataFrame =
    dhashGateFromBands(dhashTextBands(newDocs), dhashTextBands(corpus),
      maxDist)

  /** Standing PERCEPTUAL band index — the dHash twin of
    * [[buildBandIndex]]: one row per rasterizable doc (doc_id, b0..b3),
    * computed once when a corpus lands and persisted (4×16 bits per doc
    * against the text's kilobytes); [[dhashNewVsIndex]] gates admission
    * batches against it without re-rasterizing corpus text. Raster
    * geometry (w/h/bands) rides as column metadata (the buildBandIndex
    * discipline) so a probe from an engine with a different raster
    * contract fails loudly instead of joining incomparable band values.
    */
  def buildDhashIndex(corpus: DataFrame): DataFrame = {
    val geom = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("w", DhashW).putLong("h", DhashH)
      .putLong("bands", DhashBands).build()
    dhashTextBands(corpus).withColumn("b0", col("b0").as("b0", geom))
  }

  /** The perceptual admission gate against a PERSISTED [[buildDhashIndex]]
    * frame — [[dhashNewVsCorpus]]'s exact output contract without
    * touching corpus text. The NEW side still exact-collapses (the
    * minhashNewVsIndex rationale); the corpus side needs no collapse —
    * new×index candidate mass is linear in index copies — so index rows
    * enter the band join directly and members expand on the new side
    * only (bit-equal either way: Hamming is group-constant).
    */
  def dhashNewVsIndex(newDocs: DataFrame, index: DataFrame,
                      maxDist: Int = 16): DataFrame = {
    val meta = index.schema("b0").metadata
    for ((name, want) <- Seq("w" -> DhashW, "h" -> DhashH,
        "bands" -> DhashBands)) {
      require(meta.contains(name),
        s"dhash index has no '$name' raster-geometry metadata — rebuild " +
          "it with buildDhashIndex; probing an unlabeled index cannot be " +
          "validated")
      require(meta.getLong(name) == want,
        s"dhash index was built with $name=${meta.getLong(name)}, this " +
          s"engine rasters $name=$want — rebuild the index")
    }
    val (mNew, rNew) = dhashCollapsed(newDocs)
    ExactCollapse.expandOrdered(
      dhashGateFromBands(rNew, index, maxDist), mNew,
      index.select(col("doc_id"), col("doc_id")),
      "new_id", "corpus_id", Seq("hamming"))
  }

  /** [[buildDhashIndex]] stamped with the corpus's q222 content digest —
    * see [[buildBandIndexVersioned]].
    */
  def buildDhashIndexVersioned(corpus: DataFrame): DataFrame =
    Assets.stamp(buildDhashIndex(corpus), "b0", Assets.textDigest(corpus))

  /** Incremental maintenance of a standing [[buildDhashIndex]] asset —
    * the [[Assets.advance]] step for the perceptual family. Like the
    * band index, dhash rows are per-doc independent (4×16 raster bits
    * from one doc's bytes), so advance = old rows ∪ delta rows, value-
    * identical to `buildDhashIndex(corpus ∪ delta)` at delta-raster cost
    * (q279's oracle holds the probe to the from-scratch hashes).
    */
  def advanceDhashIndex(index: DataFrame, delta: DataFrame): DataFrame = {
    val meta = index.schema("b0").metadata
    for ((name, want) <- Seq("w" -> DhashW, "h" -> DhashH,
        "bands" -> DhashBands)) {
      require(meta.contains(name) && meta.getLong(name) == want,
        s"dhash index advance: index raster geometry '$name' is " +
          s"${if (meta.contains(name)) meta.getLong(name).toString
             else "absent"}, this engine rasters $name=$want — rebuild")
    }
    requireDisjointIds(index, delta, "dhash index")
    index.unionByName(buildDhashIndex(delta))
  }

  /** [[dhashNewVsIndex]] behind the [[Assets]] freshness gate. */
  def dhashNewVsIndexFresh(newDocs: DataFrame, index: DataFrame,
                           digest: Long, maxDist: Int = 16): DataFrame =
    dhashNewVsIndex(newDocs, Assets.requireFresh(index, "b0", digest),
      maxDist)

  private def dhashGateFromBands(newHash: DataFrame, corpusHash: DataFrame,
                                 maxDist: Int): DataFrame = {
    def banded(hash: DataFrame, idName: String): DataFrame = {
      val cols = (0 until DhashBands).map(b => s"${idName}_b$b")
      hash.toDF(idName +: cols: _*)
        .select(col(idName) +: cols.map(col) :+
          posexplode(array(cols.map(col): _*)).as(Seq("band", "v")): _*)
    }
    banded(newHash, "new_id").as("x")
      .join(banded(corpusHash, "corpus_id").as("y"),
        col("x.band") === col("y.band") && col("x.v") === col("y.v"))
      .select(Seq(col("new_id"), col("corpus_id")) ++
        (0 until DhashBands).flatMap(b =>
          Seq(col(s"new_id_b$b"), col(s"corpus_id_b$b"))): _*)
      .distinct()
      .withColumn("hamming",
        (0 until DhashBands)
          .map(b => bit_count(col(s"new_id_b$b")
            .bitwiseXOR(col(s"corpus_id_b$b"))))
          .reduce(_ + _).cast("long"))
      .filter(col("hamming") <= maxDist)
      .select(col("new_id"), col("corpus_id"), col("hamming"))
  }

  /** Perceptual near-dup CLUSTER readout: [[dhashNearDups]] pairs closed
    * into connected components, rolled up as a cluster-size histogram
    * with keep-one removal mass — the image-corpus twin of
    * [[nearDupClusters]] (same CC closure, same histogram contract:
    * Σ n_docs = all docs with a full raster). Rides the star-edge list —
    * connectivity needs no pair expansion.
    */
  def dhashClusters(docs: DataFrame, maxDist: Int = 16): DataFrame =
    Components.clusterSizeHistogram(
      docs.filter(col("n_chars") >= DhashW * DhashH).select(col("doc_id")),
      dhashNearDupEdges(docs, maxDist),
      "n_docs", "docs_removed")

  /** The dedup END PRODUCT: a doc → keeper mapping over the near-dup graph.
    * Connected components group transitive near-dups; within each group the
    * KEEPER is the highest-quality member (here: longest text, ties to the
    * smallest doc_id) — the "keep the best copy" policy real curation
    * pipelines use instead of min-id.
    *
    * Shape on top of [[graft.ext.Components.connectedComponents]]: one join
    * of the component assignment back to the doc metadata (component count ≪
    * corpus, but the join key is doc_id so it rides the existing
    * partitioning) and one window over each component — components are
    * near-dup groups, typically tiny, so the window partition is never hot.
    *
    * @return one row per doc that has at least one near-dup: (doc_id, comp,
    *         n_chars, group_size, keep_doc, is_kept); comp is the group's
    *         min doc_id
    */
  def canonicalMapping(pairs: DataFrame, docs: DataFrame): DataFrame = {
    val comp = Components.connectedComponents(pairs)
      .select(col("node").as("doc_id"), col("component").as("comp"))
    val w = Window.partitionBy(col("comp"))
    val wOrd = w.orderBy(col("n_chars").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    comp.join(docs.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
      .select(col("doc_id"), col("comp"), col("n_chars"),
        count(lit(1)).over(w).as("group_size"),
        first(col("doc_id")).over(wOrd).as("keep_doc"))
      .withColumn("is_kept", col("doc_id") === col("keep_doc"))
  }

  /** CROSS-MODAL dedup capstone — the dedup sibling of q254's training
    * capstone, and the pass a real curation pipeline runs: the three
    * near-dup graphs (MinHash text / dHash image raster / embedding
    * cosine, vec_id ≡ doc_id in the synthetic star schema) unioned into
    * ONE connected-components closure with ONE keeper policy per
    * document (q78: longest text, min-id ties). A doc that survives each
    * single-modality pass can still be a duplicate through a chain that
    * crosses modalities — e.g. text A ≈ text B, image B ≈ image C — and
    * only the unioned closure catches A~C.
    *
    * `modality_mask` records which graphs put the doc in the closure
    * (1 = text, 2 = image, 4 = embedding; sums are exact because the
    * tags are distinct powers of two) — the "why is this a dup" readout
    * that decides remediation (re-crawl policy vs thumbnail dedup vs
    * embedding-space collapse).
    *
    * Scale shape: all three edge lists are the exact-collapse star-edge
    * paths (never expanded pairs), the closure is the pinned CC, and the
    * keeper window partitions by near-dup components (tiny). The mask is
    * one distinct + one sum over the edge endpoints.
    *
    * The text leg defaults to 5-GRAM shingles here (vs the docs50
    * queries' 3-grams): on the full templated corpus the 3-gram MinHash
    * minima are dominated by ubiquitous template trigrams — 3,780 of
    * 5,000 sf0.1 docs share an IDENTICAL 16-hash signature, flooding the
    * band join with ~30M degenerate candidates (measured; the q136/
    * simhash degenerate-fixture class). 5-grams are discriminative on
    * the same corpus (max band bucket 158, ~126k candidates) — the
    * signature-length/shingle-width knob a real pipeline tunes per
    * corpus before trusting an LSH index (q158's readout).
    *
    * @return one row per doc in any graph: (doc_id, comp, n_chars,
    *         group_size, keep_doc, is_kept, modality_mask)
    */
  def crossModalKeeper(docs: DataFrame, emb: DataFrame,
                       k: Int = 16, bands: Int = 4, n: Int = 5,
                       minJaccard: Double = 0.55, maxDist: Int = 16,
                       dim: Int = 64, bits: Int = 8,
                       minCos: Double = 0.15): DataFrame = {
    // pinned: the three legs are the expensive subtrees (full-corpus
    // minhash, dHash and LSH band joins); both consumers below — the
    // modality mask and the CC closure inside canonicalMapping — would
    // otherwise each re-derive all three (the mask copy runs inside a
    // broadcast build, where StageAudit measured it as the single largest
    // stage of q260). Round 19: the legs are INDEPENDENT pipelines, so
    // they construct and pin CONCURRENTLY (guide §2.6 — each leg's stage
    // tail back-fills cores the others freed; sequential eager pins left
    // the suite's q260 wall at the SUM of the legs). The union of the
    // three pinned legs needs no fourth pin: consumers re-read
    // materialized blocks.
    val Seq(text, image, embed) = graft.Pin.parallel(Seq(
      () => minhashNearDupEdges(docs, k, bands, n, minJaccard)
        .select(col("doc_a"), col("doc_b"), lit(1L).as("m")),
      () => dhashNearDupEdges(docs, maxDist)
        .select(col("doc_a"), col("doc_b"), lit(2L).as("m")),
      () => Similarity.lshNearPairEdges(emb, dim, bits, minCos)
        .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"),
          lit(4L).as("m"))))
    val edges = text.unionByName(image).unionByName(embed)
    val mask = edges
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"),
        col("m"))
      .distinct()
      .groupBy(col("doc_id"))
      .agg(sum(col("m")).as("modality_mask"))
    canonicalMapping(edges.select(col("doc_a"), col("doc_b")), docs)
      .join(mask, Seq("doc_id"))
  }

  /** Leakage-safe train/val/test split (round 16): assign WHOLE near-dup
    * clusters to one split, so no near-duplicate pair ever straddles a
    * split boundary — the contamination control a naive per-doc hash
    * split ([[graft.ops.Convert.hashSplit]], q26) cannot give (two 99%-
    * identical docs hash independently and land in train AND test ~32%
    * of the time at 80/10/10). Used before any eval/holdout carve-out on
    * a deduplicated-but-not-collapsed corpus.
    *
    * Pipeline: [[nearDupComponents]] (5-gram default — the q260
    * full-corpus lesson: 3-gram signatures are degenerate on templated
    * text; CC on collapsed rep pairs, members inherit) → cluster id =
    * component (singletons: own doc_id) → split = engine-neutral
    * multiplicative hash of the CLUSTER id into 10 buckets (8/1/1).
    * Hashing the cluster id — not the doc id — is the whole point: every
    * member inherits the same bucket, so disjointness is structural, not
    * probabilistic.
    *
    * Scale shape: CC sees only the rep-grain pair graph (replica-
    * invariant under exact-copy growth), member inheritance is one
    * equi-join, and the split hash is a map stage.
    *
    * @return one row per doc: (doc_id, cluster_id, split)
    */
  def leakageSafeSplit(docs: DataFrame, k: Int = 16, bands: Int = 4,
                       n: Int = 5, minJaccard: Double = 0.5): DataFrame =
    leakageSafeSplitIndexed(buildClusterMap(docs, k, bands, n, minJaccard))

  /** The standing CLUSTER MAP asset (round 17) — the split family's
    * sibling of [[buildBandIndex]]: near-dup connectivity is computed
    * ONCE when a corpus lands (the full 5-gram shingle/minhash/band/CC
    * machinery — the 7–14 s sf0.1 constant every split-family query was
    * paying per call) and PERSISTED as one row per doc. Every later
    * split, audit, or admission decision reads the map back instead of
    * re-clustering the corpus; at scale the map is 16 bytes/doc against
    * the text's kilobytes and those consumers become index-read-bound.
    *
    * One row per doc: (doc_id, cluster_id) — cluster_id = the doc's
    * near-dup component (min reachable doc_id), own id for singletons
    * and sub-n-char docs. The clustering GEOMETRY (k/bands/n/minJaccard)
    * rides as column metadata through parquet, so indexed consumers fail
    * loudly on a mis-parameterized probe (the [[buildBandIndex]]
    * discipline) instead of silently inheriting foreign clusters.
    */
  def buildClusterMap(corpus: DataFrame, k: Int = 16, bands: Int = 4,
                      n: Int = 5, minJaccard: Double = 0.5): DataFrame = {
    val comp = nearDupComponents(corpus, k, bands, n, minJaccard)
    val geom = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("k", k).putLong("bands", bands).putLong("n", n)
      .putDouble("minJaccard", minJaccard).build()
    corpus.select(col("doc_id"))
      .join(comp, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("cluster_id", geom))
  }

  /** [[buildClusterMap]] stamped with the corpus's q222 content digest —
    * see [[buildBandIndexVersioned]]; the two assets are built from the
    * SAME corpus version, so one digest validates both.
    */
  def buildClusterMapVersioned(corpus: DataFrame, k: Int = 16,
                               bands: Int = 4, n: Int = 5,
                               minJaccard: Double = 0.5): DataFrame =
    Assets.stamp(buildClusterMap(corpus, k, bands, n, minJaccard),
      "cluster_id", Assets.textDigest(corpus))

  /** Incremental maintenance of a standing [[buildClusterMap]] asset —
    * the [[Assets.advance]] step for the split family, and the one
    * advance that is NOT a per-doc union: near-dup connectivity is
    * global, so a delta doc can bridge two standing clusters. The merge
    * runs connected components over a SUPER-NODE graph — old clusters
    * enter as single nodes labeled by their cluster_id — so advance cost
    * is linear in the delta's edge mass, never a corpus re-cluster:
    *
    *   - delta ↔ corpus edges come from [[minhashNewVsIndex]] against
    *     the standing BAND INDEX (no corpus text is touched), each pair
    *     mapped to its corpus doc's standing cluster_id;
    *   - delta ↔ delta edges are [[minhashNearDupEdges]] on the delta;
    *   - CC over those edges yields `component = min reachable node id`.
    *
    * VALUE-IDENTITY to `buildClusterMap(corpus ∪ delta)` is structural,
    * not approximate: corpus-internal edges cannot change when docs are
    * appended (near-duplication is pairwise), a standing cluster_id IS
    * the min doc_id of its members (rep = min id, component = min rep),
    * and edge EXISTENCE between any two docs is the same pure function
    * of their texts on both paths (band candidacy + stored-code exact
    * Jaccard, integer-identical to the full pipeline's kernel). So
    * min-over-supernodes = min-over-members, bridged old clusters merge
    * to exactly the id the from-scratch CC gives them, and untouched
    * rows keep their ids (Round19OpsSpec proves map equality through a
    * parquet round-trip; q277's oracle is the from-scratch split's SQL
    * verbatim).
    *
    * @param oldMap   standing [[buildClusterMap]] asset (doc_id,
    *                 cluster_id + geometry metadata)
    * @param oldIndex standing [[buildBandIndex]] asset of the SAME
    *                 corpus version at the map's geometry
    * @param delta    newly admitted docs (ids disjoint from the corpus)
    */
  def advanceClusterMap(oldMap: DataFrame, oldIndex: DataFrame,
                        delta: DataFrame, k: Int = 16, bands: Int = 4,
                        n: Int = 5, minJaccard: Double = 0.5): DataFrame = {
    val meta = oldMap.schema("cluster_id").metadata
    for ((name, want) <- Seq("k" -> k.toLong, "bands" -> bands.toLong,
        "n" -> n.toLong)) {
      require(meta.contains(name) && meta.getLong(name) == want,
        s"cluster map advance: map geometry '$name' is " +
          s"${if (meta.contains(name)) meta.getLong(name).toString
             else "absent"}, advancing with $name=$want would mix " +
          "clusterings — match the map or rebuild")
    }
    require(meta.contains("minJaccard") &&
        meta.getDouble("minJaccard") == minJaccard,
      "cluster map advance: map minJaccard is " +
        s"${if (meta.contains("minJaccard")) meta.getDouble("minJaccard").toString
           else "absent"}, advancing with $minJaccard would mix " +
        "clusterings — match the map or rebuild")
    requireDisjointIds(oldMap, delta, "cluster map")
    // delta ↔ standing-cluster edges: the admission gate's pairs (member
    // grain on the delta side, corpus doc grain on the index side),
    // lifted to the corpus side's SUPER-NODE = standing cluster_id
    val bridge = minhashNewVsIndex(delta, oldIndex, k, bands, n, minJaccard)
      .select(col("new_id"), col("corpus_id").as("doc_id"))
      .join(oldMap.select(col("doc_id"), col("cluster_id")), "doc_id")
      .select(col("new_id").as("a"), col("cluster_id").as("b"))
    // delta ↔ delta edges: rep pairs + exact-copy star edges — the
    // connectivity-equivalent edge list the full build's CC consumes
    val within = minhashNearDupEdges(delta, k, bands, n, minJaccard)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    val comp = Components.connectedComponents(bridge.unionByName(within))
    val geom = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("k", k).putLong("bands", bands).putLong("n", n)
      .putDouble("minJaccard", minJaccard).build()
    // standing rows: remap any cluster merged by a bridge (component of
    // its super-node), everything untouched keeps its id; delta rows:
    // component when connected, else a fresh singleton = own id — the
    // buildClusterMap coalesce rule
    val remapped = oldMap.select(col("doc_id"), col("cluster_id"))
      .join(comp.withColumnRenamed("node", "cluster_id"),
        Seq("cluster_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("cluster_id")).as("cluster_id"))
    val admitted = delta.select(col("doc_id"))
      .join(comp.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("cluster_id"))
    remapped.unionByName(admitted)
      .select(col("doc_id"), col("cluster_id").as("cluster_id", geom))
  }

  /** [[leakageSafeSplit]] from a (persisted) [[buildClusterMap]] frame:
    * the split is a pure map stage over the stored cluster ids — no text
    * is touched. Bit-equal to the recompute form when the map was built
    * on the same corpus (Round17OpsSpec proves it through a real parquet
    * round-trip).
    */
  def leakageSafeSplitIndexed(clusterMap: DataFrame): DataFrame =
    clusterMap
      .select(col("doc_id"), col("cluster_id"),
        clusterSplit(col("cluster_id")).as("split"))

  /** The q264 cluster → split bucket rule: Knuth multiplicative hash into
    * 10 buckets (8/1/1) — the q168 engine-neutral fingerprint discipline;
    * Spark's murmur `hash()` has no DuckDB twin. The id is reduced mod
    * 1000003 BEFORE the multiplication (round 17): (id·K) mod p ≡
    * ((id mod p)·K) mod p, and the reduced product tops out at
    * ~1000002·2654435761 ≈ 2^51.2, so the rule is overflow-proof over the
    * FULL nonnegative BIGINT id domain — the unreduced form silently
    * wraps in Spark (and errors in DuckDB) past id ≈ 3.47e9, i.e. at real
    * corpus scale. Same buckets wherever the old form didn't overflow.
    */
  private def clusterSplit(clusterId: Column): Column = {
    val b = pmod(pmod(pmod(clusterId, lit(1000003L)) * lit(2654435761L),
      lit(1000003L)), lit(10L))
    when(b < 8, lit("train")).when(b === 8, lit("val")).otherwise(lit("test"))
  }

  /** Incremental leakage-safe split (round 16): assign each NEW-batch doc
    * a split CONSISTENT with the corpus's cluster-grain assignment — the
    * admission rule a refreshed training set runs so a re-crawl of a
    * test-split page can never land in train. A new doc near-dup'd to
    * the corpus inherits the split of the matched corpus CLUSTER (the
    * minimum matched cluster id when a new doc bridges several —
    * deterministic; a bridge would merge those clusters on the next full
    * [[leakageSafeSplit]] rebuild, and min-id is exactly the id that
    * merged cluster will carry). An unmatched doc opens its own
    * singleton cluster and buckets by its own id — q264's rule verbatim,
    * so gate + rebuild agree on every non-bridged doc.
    *
    * Scale shape: [[minhashNewVsCorpus]]'s rep×rep band join for the
    * gate pairs (never new×corpus all-pairs), corpus components at the
    * rep grain (replica-invariant), one min-aggregate at the new-doc
    * grain, two equi-joins.
    *
    * @return one row per new doc: (doc_id, cluster_id, split, inherited)
    */
  /** [[incrementalSplit]] from PERSISTED standing assets — the admission
    * gate a production corpus actually runs: the band index
    * ([[buildBandIndex]], corpus signatures computed once) supplies the
    * gate pairs without touching corpus text, the cluster map
    * ([[buildClusterMap]]) supplies the matched cluster ids without
    * re-running CC. Per batch the cost is the NEW side's hashing plus
    * two index-read joins — index-read-bound, vs the one-shot form's
    * full-corpus recompute. Output is bit-equal to [[incrementalSplit]]
    * on the same (newDocs, corpus) (Round17OpsSpec, through real parquet
    * round-trips of both assets).
    *
    * Both assets must carry matching geometry: the band index's k/bands/n
    * is checked inside [[minhashNewVsIndex]]; the cluster map's
    * k/bands/n/minJaccard is checked here. A map clustered at a different
    * threshold would silently hand out clusters a future
    * [[leakageSafeSplit]] rebuild at THIS threshold would never form.
    */
  def incrementalSplitIndexed(newDocs: DataFrame, bandIndex: DataFrame,
                              clusterMap: DataFrame, k: Int = 16,
                              bands: Int = 4, n: Int = 5,
                              minJaccard: Double = 0.5): DataFrame = {
    require(minJaccard <= 1.0,
      s"minJaccard $minJaccard > 1 would break exact-group inheritance")
    requireClusterGeometry(clusterMap, k, bands, n, minJaccard)
    val gate = minhashNewVsIndex(newDocs, bandIndex, k, bands, n, minJaccard)
    val inherited = gate
      .join(clusterMap.select(col("doc_id").as("corpus_id"),
        col("cluster_id").as("corpus_cluster")), Seq("corpus_id"))
      .groupBy(col("new_id").as("doc_id"))
      .agg(min(col("corpus_cluster")).as("inherited_cluster"))
    newDocs.select(col("doc_id"))
      .join(inherited, Seq("doc_id"), "left")
      .withColumn("cluster_id",
        coalesce(col("inherited_cluster"), col("doc_id")))
      .select(col("doc_id"), col("cluster_id"),
        clusterSplit(col("cluster_id")).as("split"),
        col("inherited_cluster").isNotNull.as("inherited"))
  }

  /** [[incrementalSplitIndexed]] behind the [[Assets]] freshness gate:
    * both standing assets must have been built from the corpus version
    * `digest` names — a stale CLUSTER MAP is the nastier failure (a new
    * doc inherits a cluster id a full rebuild would never form, and the
    * train/test boundary silently drifts), so both gates fail loudly
    * before any plan runs.
    */
  def incrementalSplitFresh(newDocs: DataFrame, bandIndex: DataFrame,
                            clusterMap: DataFrame, digest: Long,
                            k: Int = 16, bands: Int = 4, n: Int = 5,
                            minJaccard: Double = 0.5): DataFrame =
    incrementalSplitIndexed(newDocs,
      Assets.requireFresh(bandIndex, "band_sigs", digest),
      Assets.requireFresh(clusterMap, "cluster_id", digest),
      k, bands, n, minJaccard)

  /** Fails loudly unless `clusterMap` carries [[buildClusterMap]]'s
    * geometry metadata AND it matches the caller's parameters — absent
    * metadata (stripped by select/union transforms or a non-Spark parquet
    * writer) is an error too, the [[minhashNewVsIndex]] discipline.
    */
  private def requireClusterGeometry(clusterMap: DataFrame, k: Int,
                                     bands: Int, n: Int,
                                     minJaccard: Double): Unit = {
    val meta = clusterMap.schema("cluster_id").metadata
    for ((name, want) <- Seq("k" -> k, "bands" -> bands, "n" -> n)) {
      require(meta.contains(name),
        s"cluster map has no '$name' geometry metadata — rebuild it with " +
          "buildClusterMap; probing an unlabeled map cannot be validated")
      require(meta.getLong(name) == want,
        s"cluster map was built with $name=${meta.getLong(name)}, probed " +
          s"with $name=$want — rebuild the map or match the caller")
    }
    require(meta.contains("minJaccard"),
      "cluster map has no 'minJaccard' geometry metadata — rebuild it " +
        "with buildClusterMap")
    require(meta.getDouble("minJaccard") == minJaccard,
      s"cluster map was clustered at minJaccard=" +
        s"${meta.getDouble("minJaccard")}, probed with " +
        s"minJaccard=$minJaccard — rebuild the map or match the caller")
  }

  def incrementalSplit(newDocs: DataFrame, corpus: DataFrame, k: Int = 16,
                       bands: Int = 4, n: Int = 5,
                       minJaccard: Double = 0.5): DataFrame = {
    require(minJaccard <= 1.0,
      s"minJaccard $minJaccard > 1 would break exact-group inheritance")
    // ONE corpus collapse shared by both consumers (cluster map + gate
    // pairs) — routing through nearDupComponents AND minhashNewVsCorpus
    // would textCollapse (and Pin-materialize) the corpus twice
    val (mCor, rCor) = textCollapsed(corpus, n)
    val (mNew, rNew) = textCollapsed(newDocs, n)
    val repComp = Components.connectedComponents(
      minhashNearDupsDistinct(rCor, k, bands, n, minJaccard)
        .select(col("doc_a"), col("doc_b")))
      .withColumnRenamed("node", "rep")
    // short corpus docs (< n chars) are absent here — they have no
    // shingles, so no gate pair can reference them
    val corpusCluster = mCor.join(repComp, Seq("rep"), "left")
      .select(col("doc_id").as("corpus_id"),
        coalesce(col("component"), col("rep")).as("corpus_cluster"))
    val gate = ExactCollapse.expandOrdered(
      minhashNewVsCorpusDistinct(rNew, rCor, k, bands, n, minJaccard),
      mNew, mCor, "new_id", "corpus_id", Seq("jaccard"))
    val inherited = gate
      .join(corpusCluster, Seq("corpus_id"))
      .groupBy(col("new_id").as("doc_id"))
      .agg(min(col("corpus_cluster")).as("inherited_cluster"))
    newDocs.select(col("doc_id"))
      .join(inherited, Seq("doc_id"), "left")
      .withColumn("cluster_id",
        coalesce(col("inherited_cluster"), col("doc_id")))
      .select(col("doc_id"), col("cluster_id"),
        clusterSplit(col("cluster_id")).as("split"),
        col("inherited_cluster").isNotNull.as("inherited"))
  }

  /** Near-dup components at the REP grain, inherited by members — the
    * q264/q265 connectivity core. CC runs on the collapsed rep PAIRS only
    * (no star edges): exact-copy groups merge by INHERITANCE (each member
    * takes its rep's component through the member→rep map), which is the
    * same clusters as CC over pairs+star-edges — rep = min id of its
    * group, so min-reachable-rep = min-reachable-doc — at a fraction of
    * the edge mass. Measured at sf0.1: the pairs+star-edges form fed the
    * distributed CC loop ~50k star edges and cost q264 14.7 s; the rep
    * graph sits under the driver union-find threshold. At 10× replicas
    * the rep graph is IDENTICAL (replicas are exact copies), so the CC
    * cost is replica-invariant by construction, not just measured so.
    *
    * @return (doc_id, component) for every doc with ≥ n chars; shorter
    *         docs never shingle and stay singletons at the caller's
    *         coalesce
    */
  private def nearDupComponents(docs: DataFrame, k: Int, bands: Int,
                                n: Int, minJaccard: Double): DataFrame = {
    require(minJaccard <= 1.0,
      s"minJaccard $minJaccard > 1 would break exact-group inheritance")
    val (members, reps) = textCollapsed(docs, n)
    val repComp = Components.connectedComponents(
      minhashNearDupsDistinct(reps, k, bands, n, minJaccard)
        .select(col("doc_a"), col("doc_b")))
      .withColumnRenamed("node", "rep")
    members.join(repComp, Seq("rep"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("rep")).as("component"))
  }

  /** Split-leakage AUDIT (round 16): given an EXISTING per-doc split
    * assignment, how contaminated is it by near-duplication? A doc is
    * leaked when its near-dup cluster spans more than one split — its
    * eval-set copy trains the model on (a 99%-twin of) the test item.
    * This is the diagnostic run against a legacy split before deciding
    * whether to re-split with [[leakageSafeSplit]]; on a clean
    * cluster-grain split it reports all zeros by construction.
    *
    * The metric is CONNECTIVITY-grain (cluster spans >1 split), not
    * edge-pair counts: edge mass depends on the representation (star vs
    * clique — m copies carry m−1 star edges, not m²/2 pairs), while
    * "this doc shares a cluster with another split" does not.
    *
    * @param splitOf per-doc split expression, evaluated against `docs`
    * @return one row per split: (split, n_docs, n_leaked_docs,
    *         n_leaked_clusters), ordered by split
    */
  def splitLeakageAudit(docs: DataFrame, splitOf: Column, k: Int = 16,
                        bands: Int = 4, n: Int = 5,
                        minJaccard: Double = 0.5): DataFrame =
    splitLeakageAuditIndexed(docs, splitOf,
      buildClusterMap(docs, k, bands, n, minJaccard))

  /** [[splitLeakageAudit]] from a (persisted) [[buildClusterMap]] frame:
    * the audit is two joins and two aggregates over stored cluster ids —
    * no shingle/minhash recompute. The map IS the clustering under audit,
    * so no geometry parameters apply here; a doc absent from the map
    * (landed after the map was built) audits as a singleton — rebuild the
    * map to fold new arrivals into connectivity.
    */
  def splitLeakageAuditIndexed(docs: DataFrame, splitOf: Column,
                               clusterMap: DataFrame): DataFrame = {
    val assigned = docs.select(col("doc_id"), splitOf.as("split"))
      .join(clusterMap.select(col("doc_id"),
        col("cluster_id").as("map_cluster")), Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("map_cluster"), col("doc_id")))
    // a cluster is leaked iff it spans >1 distinct split — computed once
    // per cluster, then joined back to the doc grain for per-split sums
    val clusterSpan = assigned.groupBy(col("cluster_id"))
      .agg(countDistinct(col("split")).as("n_splits"))
    assigned.join(clusterSpan, Seq("cluster_id"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("n_splits") > 1, lit(1))).as("n_leaked_docs"),
        countDistinct(when(col("n_splits") > 1, col("cluster_id")))
          .as("n_leaked_clusters"))
      .orderBy(col("split"))
  }

  /** Index-quality readout for the banded-LSH near-dup index: recall and
    * precision of [[minhashNearDups]] against the exact
    * [[ngramJaccardPairs]] ground truth at the same threshold — the
    * measurement a pipeline publishes before trusting an approximate
    * dedup index (banding trades recall for candidate volume; this makes
    * the trade visible). Precision is structurally 1 here (candidates are
    * verified with exact Jaccard before thresholding) — emitted anyway so
    * the readout stays honest if the verifier is ever relaxed.
    *
    * Scale shape: both sides are the existing bounded operators; the
    * comparison is a full-outer join on the pair key + one 1-row rollup.
    */
  def lshQuality(docs: DataFrame, k: Int = 16, bands: Int = 4, n: Int = 3,
                 minJaccard: Double = 0.5): DataFrame = {
    val truth = ngramJaccardPairs(docs, n, minJaccard)
      .select(col("doc_a"), col("doc_b"), lit(1L).as("t"))
    val found = minhashNearDups(docs, k, bands, n, minJaccard)
      .select(col("doc_a"), col("doc_b"), lit(1L).as("f"))
    truth.join(found, Seq("doc_a", "doc_b"), "full_outer")
      .agg(count(col("t")).as("n_truth"), count(col("f")).as("n_found"),
        count(when(col("t").isNotNull && col("f").isNotNull, lit(1)))
          .as("n_both"))
      .select(col("n_truth"), col("n_found"), col("n_both"),
        (col("n_truth") - col("n_both")).as("n_missed"),
        (col("n_both").cast("double") / col("n_truth").cast("double"))
          .as("recall"),
        (col("n_both").cast("double") / col("n_found").cast("double"))
          .as("precision"))
  }

  /** Edit-distance near-duplicates with BLOCKING — the character-level
    * complement to the token-level MinHash family (catches small in-word
    * edits and reorderings shingles miss; the classic record-linkage /
    * OCR-noise dedup).
    *
    * Candidate generation is a block self-join, never all-pairs: docs
    * sharing (⌊len/lenBucket⌋, first `prefixChars` chars) are compared.
    * Two docs within edit distance d differ in length by ≤ d, so with
    * `lenBucket` > 2·maxDist a true pair sits in the same or an adjacent
    * bucket — one side probes {lb−1, lb, lb+1} (the sorted-neighborhood
    * guarantee for same-prefix pairs; duplicate matches collapse in the
    * final distinct). The scorer is Spark's codegen `levenshtein` with
    * the THRESHOLD argument: the banded DP costs O(maxDist·len) per pair,
    * not O(len²) — the 100 TB knob that makes the scorer linear in the
    * candidate list.
    *
    * In-block pairs are still quadratic in the BLOCK size, so a skewed
    * block (boilerplate openings, exact-duplicate floods) re-creates the
    * all-pairs cost inside one key — the round-10 scale readout measured
    * 71× wall at 10× data from exactly this. Two bounds apply, in order:
    *
    *  1. EXACT-COLLAPSE (round 15, [[graft.ext.ExactCollapse]]): identical
    *     texts group to one representative BEFORE blocking — the block
    *     join and the cap operate on DISTINCT texts, exact-copy pairs
    *     (distance 0) come from a linear expansion, and — the semantic
    *     upgrade — exact duplicates can never be LOST to the cap, nor can
    *     a flood of copies evict genuinely distinct near-dup candidates
    *     from their block. This is how a real pipeline orders the passes:
    *     exact dedup first, fuzzy dedup on the survivors.
    *  2. `blockCap` bounds the remaining distinct-text quadratic: only
    *     the first `blockCap` DISTINCT texts (by representative doc_id —
    *     deterministic) of each HOME (lb, pfx) block participate; the
    *     `truncated` output column flags every surviving pair whose
    *     either member's home block exceeded the cap, so the cut is
    *     audited, never silent.
    *
    * @return (doc_a, doc_b, dist, truncated) for pairs with distance ≤
    *         `maxDist`; within-group pairs carry dist 0 and their home
    *         block's `truncated` flag
    */
  def editNearDups(docs: DataFrame, maxDist: Int = 12, prefixChars: Int = 6,
                   lenBucket: Int = 32, blockCap: Int = 64): DataFrame = {
    val collapsed = ExactCollapse.withRepPinned(
      docs.select(col("doc_id"), col("text")), "doc_id",
      Seq(xxhash64(col("text")), col("text")))
    val members = collapsed.select(col("rep"), col("doc_id"))
    val (repPairs, flagged) = editNearDupsBlocked(
      collapsed.filter(col("doc_id") === col("rep"))
        .select(col("doc_id"), col("text")),
      maxDist, prefixChars, lenBucket, blockCap)
    val cross = ExactCollapse.expandUnordered(repPairs, members,
      "doc_a", "doc_b", Seq("dist", "truncated"))
    // every identical-text group is a distance-0 clique regardless of the
    // cap (exact duplicates are found by the collapse, not the block join);
    // the flag is the group's home-block overflow, group-constant
    val within = ExactCollapse.withinPairs(
      members.join(flagged.select(col("doc_id").as("rep"), col("ovf")
        .as("truncated")), Seq("rep")),
      "doc_a", "doc_b", Seq("truncated"))
      .withColumn("dist", lit(0))
      .select(col("doc_a"), col("doc_b"), col("dist"), col("truncated"))
    cross.unionByName(within)
  }

  /** The blocked candidate join + banded-DP verify over a distinct-text
    * frame: (pairs (doc_a, doc_b, dist, truncated), flagged — every input
    * row with its home-block `ovf` flag). [[editNearDups]] runs it on
    * exact-collapse representatives; the spec runs the pair half on a
    * full frame as the pre-collapse reference.
    */
  private[graft] def editNearDupsBlocked(docs: DataFrame, maxDist: Int,
                                         prefixChars: Int, lenBucket: Int,
                                         blockCap: Int)
      : (DataFrame, DataFrame) = {
    require(lenBucket > 2 * maxDist,
      s"lenBucket $lenBucket must exceed 2*maxDist for the adjacent-bucket guarantee")
    require(blockCap >= 2, s"blockCap $blockCap admits no pairs")
    val keyed0 = docs.select(col("doc_id"), col("text"),
      (length(col("text")) / lenBucket).cast("long").as("lb"),
      substring(col("text"), 1, prefixChars).as("pfx"))
    // rank + block size share ONE (lb, pfx) exchange/sort
    val wOrd = Window.partitionBy(col("lb"), col("pfx")).orderBy(col("doc_id"))
    val wAll = Window.partitionBy(col("lb"), col("pfx"))
    val flagged = keyed0
      .withColumn("rnk", row_number().over(wOrd))
      .withColumn("ovf", count(lit(1)).over(wAll) > blockCap)
    val keyed = flagged
      .filter(col("rnk") <= blockCap)
      .drop("rnk")
    // the scorer runs where the streamed side's partitions are: a
    // single-file corpus would put every levenshtein on one core (the
    // cosineTopK lesson) — spread the probe side explicitly
    val probes = keyed.select(col("doc_id"), col("text"), col("pfx"),
      col("ovf"),
      explode(array(col("lb") - 1, col("lb"), col("lb") + 1)).as("lb"))
      .repartition(docs.sparkSession.sparkContext.defaultParallelism,
        col("lb"), col("pfx"))
    val pairs = probes.as("a").join(keyed.as("b"),
        col("a.lb") === col("b.lb") && col("a.pfx") === col("b.pfx") &&
          col("a.doc_id") < col("b.doc_id") &&
          // necessary condition for dist ≤ maxDist, at length-compare cost:
          // prunes candidates BEFORE any DP runs
          abs(length(col("a.text")) - length(col("b.text"))) <= maxDist)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (col("a.ovf") || col("b.ovf")).as("truncated"),
        // Generate barrier: a plain aliased dist + filter gets PUSHED INTO
        // the join condition, where Catalyst evaluates the banded DP three
        // times per candidate (twice in the condition, once in the
        // projection — measured 23 s vs 2 s at the 10x point). A filter on
        // a generator output cannot be pushed below the Generate, so the
        // scorer runs exactly once per candidate here.
        explode(array(levenshtein(col("a.text"), col("b.text"), maxDist)))
          .as("dist"))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
      .select(col("doc_a"), col("doc_b"), col("dist"), col("truncated"))
      .distinct() // a pair can match in both its own and the probe bucket
    (pairs, flagged.select(col("doc_id"), col("ovf")))
  }

  /** Substring-level duplicate SPAN masking (the ExactSubstr shape of Lee
    * et al. 2022, "Deduplicating Training Data Makes Language Models
    * Better" — public literature): a char position is duplicated when the
    * length-`l` substring starting there occurs ≥2 times in the corpus;
    * per document, duplicated positions merge into maximal spans — the
    * ranges a span-dedup pass masks out of the loss (dropping whole
    * near-dup DOCS misses the boilerplate that repeats INSIDE otherwise
    * unique pages; this operator is the doc-level dedup family's
    * complement at the span grain).
    *
    * The published implementation builds a corpus suffix array; the
    * distributed shape here is the standard shuffle equivalent: every
    * position ships its `l`-gram (exact substring key, no hash
    * collisions), repeated grams come back as a position set, and the
    * per-doc interval union is two windows (running max of span end →
    * group-open flag → running group id). Cost is the deliberate trade:
    * the gram shuffle carries ~`l`× the corpus bytes, the price of exact
    * substring evidence without a global suffix array; `l` (default 20,
    * the paper's 50-token threshold scaled to this corpus's short docs)
    * bounds it.
    *
    * Scale shape: one gram-grain shuffle with map-side combine collapses
    * the corpus to repeated grams; the per-doc sweep shares one doc-key
    * sort; the readout is doc-grain. No self-joins, no all-pairs.
    *
    * @return doc_id, n_dup_positions, n_spans, dup_chars (0s for clean
    *         or short docs)
    */
  def repeatedSpans(docs: DataFrame, l: Int = 20): DataFrame = {
    require(l >= 2, "repeatedSpans: gram length must be ≥ 2")
    val grams = docs
      .select(col("doc_id"), col("text"))
      .filter(length(col("text")) >= l)
      // spread BEFORE the l× gram amplification (the cosineTopK/editNearDups
      // lesson, found by StageAudit at the 10× point): a few-MB corpus file
      // is ONE input split, so without this the explode AND its ~l×-corpus
      // shuffle write run on a single core (measured 21.6 s of a 32 s wall
      // serialized in one task). Shuffling bodies here costs 1/l of the
      // gram bytes the next exchange already pays.
      .repartition(docs.sparkSession.sparkContext.defaultParallelism,
        col("doc_id"))
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(1, length(text) - ${l - 1}),
           |  i -> substring(text, i, $l))""".stripMargin))
        .as(Seq("pos0", "gram")))
      .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"),
        col("gram"))
    // corpus-wide occurrence count as a WINDOW over the gram key (the
    // q166/q181 discipline: one gram shuffle, no join-back — an agg +
    // self-join would ship the full gram frame through a second
    // exchange); only positions of repeated grams survive to the sweep
    val dupPos = grams
      .withColumn("n_occ",
        count(lit(1)).over(Window.partitionBy(col("gram"))))
      .filter(col("n_occ") >= 2)
      .select(col("doc_id"), col("pos"),
        (col("pos") + (l - 1)).cast("long").as("end"))
    val spans = mergeSpans(dupPos)
    docs.select(col("doc_id")).join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_dup_positions"), lit(0L)).as("n_dup_positions"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_chars"), lit(0L)).as("dup_chars"))
  }

  /** Per-doc interval union over flagged positions — the sweep shared by
    * [[repeatedSpans]] and the eval-set decontamination
    * ([[graft.ext.Curation.decontamSpans]]): running max of span end →
    * group-open flag → running group id, then span- and doc-grain
    * rollups. Input: (doc_id, pos, end) with `pos` unique per doc (a
    * position index), spans inclusive `[pos, end]`; overlapping OR
    * abutting spans merge.
    *
    * @return doc_id, n_dup_positions, n_spans, dup_chars (docs with no
    *         input rows are absent — callers left-join zeros)
    */
  private[ext] def mergeSpans(dupPos: DataFrame): DataFrame =
    mergedSpanFrame(dupPos)
      .groupBy(col("doc_id"))
      .agg(sum(col("n_pos")).as("n_dup_positions"),
        count(lit(1)).as("n_spans"),
        sum(col("e") - col("s") + 1).as("dup_chars"))

  /** The span-grain half of [[mergeSpans]]: maximal merged spans per doc
    * as (doc_id, s, e, n_pos) rows — for callers that need the spans
    * themselves (q219 pins the exact mask fingerprint), not just the
    * doc-grain masses.
    */
  private[ext] def mergedSpanFrame(dupPos: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    dupPos
      .withColumn("max_end_before",
        max(col("end")).over(wOrd.rowsBetween(
          Window.unboundedPreceding, -1)))
      .withColumn("opens", when(col("max_end_before").isNull ||
        col("pos") > col("max_end_before") + 1, 1L).otherwise(0L))
      .withColumn("grp", sum(col("opens")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).as("s"), max(col("end")).as("e"),
        count(lit(1)).as("n_pos"))
  }
}
