package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate/exact nearest-neighbor search over an embedding column
  * (`array<float>`), for the `embeddings` table.
  *
  * Two paths, per the standard scale playbook:
  *  - brute-force cosine top-k — the correctness baseline. Quadratic in rows;
  *    fine for rerank stages and small query sets (the query side here is a
  *    filtered subset, so the join is |Q|×|N|, not |N|²).
  *  - LSH-bucketed top-k — random-hyperplane signatures; only same-bucket
  *    pairs are scored. Hyperplanes are deterministic arithmetic (engine-
  *    neutral, reproducible across runs and cluster layouts).
  *
  * At 100 TB the brute path becomes a block-partitioned matrix multiply
  * (group vectors into blocks, broadcast the query block) and the LSH path's
  * bucket join shuffles only (bucket_id, vec_id, vec) — both shapes are
  * already what the code below declares; Catalyst/AQE pick the physical
  * strategy per size.
  *
  * Parity (round-5 hardening): all similarity queries run on FIXED-POINT
  * QUANTIZED vectors — each float element is mapped once per vector to the
  * exact integer floor(x·10⁶ + 0.5) (deterministic IEEE multiply + explicit
  * half-up, no engine round-mode in the path). Dot products and squared
  * norms are then EXACT integer sums ([[graft.functions.LongVecDot]]):
  * association-free, so any engine / order / plan produces identical bits,
  * and the cosine double derived from them (one division, two sqrts — all
  * IEEE-correctly-rounded) is emitted RAW. The previous design rounded
  * float-fold cosines at 6 dp; the round-margin audit showed sf0.1 values
  * within 3e-7 of a 6-dp tie, i.e. inside the territory where DuckDB's
  * version-dependent fp round can drift — quantization removes the entire
  * class (no round anywhere). The ~1e-6 relative quantization error is far
  * below any meaningful similarity-threshold sensitivity.
  */
object Similarity {

  /** Fixed-point quantization scale: 6 decimal digits. At |x| ≤ ~1 and ≤
    * 4096 dims the integer moments stay ≤ ~1e15 ≪ 2⁶³.
    */
  val QScale = 1e6

  /** `array<float>` → exact `array<long>` fixed-point image. */
  def quantize(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * QScale + 0.5).cast("long"))

  /** Exact integer Σ aᵢ·bᵢ of two quantized vectors. */
  def qdot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.vecDotLong(a, b)

  /** Σ aᵢ·bᵢ as an ordered fold — exact same operation order in any engine.
    * Backed by the codegen'd [[graft.functions.FloatVecDot]] kernel (identical
    * arithmetic to the zip_with/aggregate formulation, ~10× faster on the
    * pairwise hot path).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.vecDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: for each query vector (`queryPred` selects the
    * query subset), the k nearest neighbors among all other vectors.
    * Deterministic: ties broken by neighbor id.
    *
    * Norms are computed once per vector BEFORE the pair join (the join would
    * otherwise recompute each norm |other side| times); the resulting cosine
    * bits are identical either way.
    */
  def cosineTopK(emb: DataFrame, queryPred: Column, k: Int = 5): DataFrame = {
    // zero-norm vectors are dropped on BOTH sides: cosine is undefined for
    // them, and under ANSI mode the division would throw (DuckDB: NULL) —
    // oracles carry the same n2 > 0 filter (exact integer compare).
    // The pair join is a broadcast nested loop whose parallelism equals the
    // STREAMED side's partition count — a single-file query set would run the
    // whole |Q|×|N| loop on one core, so spread it explicitly (AQE never
    // coalesces a user-requested repartition).
    val q = emb.withColumn("q", quantize(col("embedding")))
      .withColumn("n2", qdot(col("q"), col("q")))
      .filter(col("n2") > 0L)
    val queries = q.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("q").as("qv"),
        sqrt(col("n2").cast("double")).as("qn"))
      .repartition(emb.sparkSession.sparkContext.defaultParallelism)
    val cands = q.select(col("vec_id").as("neighbor_id"), col("q").as("nv"),
      sqrt(col("n2").cast("double")).as("nn"))
    val scored = queries.join(cands, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        qdot(col("qv"), col("nv")).cast("double") / (col("qn") * col("nn")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("query_id", "neighbor_id", "rnk", "cos")
  }

  /** IVF index-quality readout (the [[graft.ext.Dedup.lshQuality]]
    * sibling for the dense path): the approximate [[ivfTopK]] lists
    * against the exact [[cosineTopK]] truth at the same k — recall is
    * what nprobe buys, and this is the eval that justifies an nprobe
    * setting BEFORE a 100 TB index is built. Both lists are exact sets
    * of (query, neighbor) ids; the comparison is one full-outer join
    * and a 1-row rollup (recall/precision each one terminal IEEE
    * division).
    */
  def ivfQuality(emb: DataFrame, queryPred: Column, k: Int = 5,
                 nCentroids: Int = 0, nprobe: Int = 4): DataFrame = {
    val truth = cosineTopK(emb, queryPred, k)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("t"))
    val found = ivfTopK(emb, queryPred, k, nCentroids, nprobe)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("f"))
    truth.join(found, Seq("query_id", "neighbor_id"), "full_outer")
      .agg(
        count_distinct(col("query_id")).as("n_queries"),
        count(col("t")).as("n_truth"), count(col("f")).as("n_found"),
        count(when(col("t").isNotNull && col("f").isNotNull, lit(1)))
          .as("n_both"))
      .select(col("n_queries"), col("n_truth"), col("n_found"),
        col("n_both"),
        (col("n_both").cast("double") / col("n_truth").cast("double"))
          .as("recall"),
        (col("n_both").cast("double") / col("n_found").cast("double"))
          .as("precision"))
  }

  /** Brute-force top-k for an EXTERNAL query-vector table
    * `(query_id, embedding)` (round 10, the [[graft.ext.Retrieval
    * .topKForQueries]] sibling): every query vector scores against the
    * whole corpus — the baseline an ANN path (LSH buckets / IVF probes)
    * is measured against, and the production shape when the query set is
    * a bounded external table rather than a corpus fraction. External ids
    * are their own namespace, so NOTHING self-excludes — a query equal to
    * a corpus vector returns it at rank 1 with cos 1. Same quantized
    * scoring discipline as [[cosineTopK]]; same output schema.
    */
  def cosineTopKForQueries(emb: DataFrame, queries: DataFrame,
                           k: Int = 5): DataFrame = {
    val cands = emb.withColumn("q", quantize(col("embedding")))
      .withColumn("n2", qdot(col("q"), col("q")))
      .filter(col("n2") > 0L)
      .select(col("vec_id").as("neighbor_id"), col("q").as("nv"),
        sqrt(col("n2").cast("double")).as("nn"))
    val qs = queries.withColumn("q", quantize(col("embedding")))
      .withColumn("n2", qdot(col("q"), col("q")))
      .filter(col("n2") > 0L)
      .select(col("query_id"), col("q").as("qv"),
        sqrt(col("n2").cast("double")).as("qn"))
      .repartition(emb.sparkSession.sparkContext.defaultParallelism)
    val scored = qs.crossJoin(cands)
      .withColumn("cos",
        qdot(col("qv"), col("nv")).cast("double") / (col("qn") * col("nn")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("query_id", "neighbor_id", "rnk", "cos")
  }

  /** Deterministic pseudo-random hyperplane component for (plane j, dim i):
    * an LCG-scrambled value mapped to [-0.5, 0.5). Engine-neutral integer
    * arithmetic — computed DRIVER-side (the planes are constants), identical
    * bits to the SQL form `((j·1103515245+12345)·(i+1) + j·2654435761)
    * mod 1000003 / 1000003.0 − 0.5` the oracle evaluates.
    */
  private def planeComponent(j: Int, i: Int): Double =
    Math.floorMod((j * 1103515245L + 12345L) * (i + 1L) + j * 2654435761L,
      1000003L).toDouble / 1000003.0 - 0.5

  /** Random-hyperplane LSH bucket id: `bits` sign bits of vec·plane_j.
    * Each projection is the codegen'd constant-weights dot kernel
    * ([[graft.functions.FloatVecDotConst]]) — the planes are baked into
    * generated code, not rebuilt per row as literal arrays or interpreted
    * through higher-order-function lambdas. Fold order matches the SQL
    * ordered sum, so cross-engine bits are unchanged.
    */
  def lshBucket(vec: Column, dim: Int, bits: Int = 8): Column =
    (0 until bits).map { j =>
      val plane = Array.tabulate(dim)(i => planeComponent(j, i))
      val proj = graft.functions.VectorFunctions.vecDotConst(vec, plane)
      when(proj > 0.0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** LSH-bucketed near-neighbor pairs: only same-bucket pairs are scored —
    * the scale path that replaces the quadratic join. Recall is tuned with
    * `bits` (fewer bits → bigger buckets → higher recall, more work).
    *
    * Exact-collapse discipline ([[graft.ext.ExactCollapse]]): m identical
    * (bucket, quantized-vector) rows — re-ingested embeddings of one
    * popular item — would put m²/2 candidate pairs in their bucket; the
    * bucket join runs on one representative per group instead, and the
    * equi-join expansion re-attaches members with the group-constant
    * cosine. Bit-identical to the uncollapsed form (ExactCollapseSpec):
    * within-group pairs carry selfCos = qdot(q,q)/(nv·nv) — the exact
    * expression the uncollapsed join evaluates for an identical pair.
    */
  def lshNearPairs(emb: DataFrame, dim: Int, bits: Int = 8,
                   minCos: Double = 0.9): DataFrame = {
    val (members, reps) = lshCollapsed(emb, dim, bits)
    val cross = ExactCollapse.expandUnordered(
      lshPairsFromBucketed(reps, minCos),
      members.select(col("rep"), col("vec_id")),
      "vec_a", "vec_b", Seq("cos"))
    val within = ExactCollapse.withinPairs(members, "vec_a", "vec_b",
      Seq("cos"))
      .filter(col("cos") >= minCos)
    cross.unionByName(within)
  }

  /** Connectivity-equivalent near-pair EDGE list for the cluster consumer
    * ([[embedDedupClusters]]): rep-grain verified pairs plus m−1 star
    * edges per identical-(bucket, q) group, gated on the same selfCos the
    * within pairs carry — same connected components as the expanded pair
    * list, linear edge mass.
    *
    * ENVELOPE: requires `minCos` < 1.0. selfCos = n2/(√n2·√n2) is only
    * ~1.0 within a few ulp; at minCos = 1.0 a group member whose selfCos
    * rounds below could lose its star edge while its group-constant CROSS
    * pairs (emitted at rep grain only) still connect the rep — the edge
    * list's components would silently diverge from the pair list's. Below
    * 1.0 the gate and the within-pair filter evaluate the same expression
    * on the same value, so equivalence is exact. Fail loudly instead.
    */
  def lshNearPairEdges(emb: DataFrame, dim: Int, bits: Int = 8,
                       minCos: Double = 0.9): DataFrame = {
    require(minCos < 1.0,
      s"lshNearPairEdges: minCos=$minCos outside the < 1.0 envelope — " +
        "selfCos of an identical group is 1.0 only up to ulp rounding; " +
        "use lshNearPairs (expanded pairs) for an exact-1.0 threshold")
    val (members, reps) = lshCollapsed(emb, dim, bits)
    lshPairsFromBucketed(reps, minCos).select(col("vec_a"), col("vec_b"))
      .unionByName(ExactCollapse.starEdges(
        members.filter(col("cos") >= minCos)
          .select(col("rep"), col("vec_id")),
        "vec_a", "vec_b"))
  }

  /** (members (rep, vec_id, selfCos), reps — one bucketed row per distinct
    * (bucket, quantized vector)). The collapse key includes the bucket:
    * the bucket derives from the RAW floats, so two vectors may share a
    * quantized image but not a bucket — such rows never pair in the
    * uncollapsed semantics and must not land in one group.
    */
  private def lshCollapsed(emb: DataFrame, dim: Int,
                           bits: Int): (DataFrame, DataFrame) = {
    val bucketed = emb
      .withColumn("q", quantize(col("embedding")))
      .withColumn("n2", qdot(col("q"), col("q")))
      .filter(col("n2") > 0L)
      .select(col("vec_id"), col("q"),
        sqrt(col("n2").cast("double")).as("nv"),
        lshBucket(col("embedding"), dim, bits).as("bucket"))
    val keyed = ExactCollapse.withRepPinned(bucketed, "vec_id",
      Seq(col("bucket"), col("q")))
    (keyed.select(col("rep"), col("vec_id"),
      (qdot(col("q"), col("q")).cast("double") / (col("nv") * col("nv")))
        .as("cos")),
      keyed.filter(col("vec_id") === col("rep")).drop("rep"))
  }

  /** Uncollapsed bucket-join body over a (vec_id, q, nv, bucket) frame
    * as-is; [[lshNearPairs]] runs it on exact-collapse reps, the spec on
    * the full frame as the bit-equality reference.
    */
  private def lshPairsFromBucketed(bucketed: DataFrame,
                                   minCos: Double): DataFrame =
    bucketed.as("a").join(bucketed.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos",
        qdot(col("a.q"), col("b.q")).cast("double") / (col("a.nv") * col("b.nv")))
      .filter(col("cos") >= minCos)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"), col("cos"))

  /** The uncollapsed pipeline applied to the full frame — the spec's
    * bit-equality reference for [[lshNearPairs]].
    */
  private[graft] def lshNearPairsDistinct(emb: DataFrame, dim: Int,
                                          bits: Int,
                                          minCos: Double): DataFrame =
    lshPairsFromBucketed(emb
      .withColumn("q", quantize(col("embedding")))
      .withColumn("n2", qdot(col("q"), col("q")))
      .filter(col("n2") > 0L)
      .select(col("vec_id"), col("q"),
        sqrt(col("n2").cast("double")).as("nv"),
        lshBucket(col("embedding"), dim, bits).as("bucket")), minCos)

  /** SemDeDup-shaped SEMANTIC dedup cluster readout (Abbas et al. 2023,
    * public literature — near-duplicate semantics live in embedding space,
    * not in shared n-grams): [[lshNearPairs]]' bucket-pruned cosine pairs
    * at `minCos`, closed into connected components, rolled up as the
    * cluster-size histogram with keep-one removal mass — the embedding
    * member of the dedup-family triple (MinHash text / dHash image /
    * cosine embedding), all three sharing the q245 histogram contract:
    * Σ n_vecs = every embedding row (zero-norm vectors, which can be
    * near-dup to nothing, are singletons by construction).
    *
    * Scale shape: the pair join is bucket-pruned (never all-pairs), CC is
    * the pinned pointer-jumping closure, the histogram two tiny hash
    * aggregations — the q245/q253 shape on the embeddings table.
    */
  def embedDedupClusters(emb: DataFrame, dim: Int, bits: Int = 8,
                         minCos: Double = 0.9): DataFrame =
    Components.clusterSizeHistogram(
      emb.select(col("vec_id")),
      lshNearPairEdges(emb, dim, bits, minCos),
      "n_vecs", "vecs_removed")

  /** IVF (inverted-file) approximate top-k — the other standard ANN scale
    * path next to LSH:
    *
    *  1. coarse quantizer: the `nCentroids` corpus vectors with the lowest
    *     `xxhash64(vec_id)` act as centroids — a deterministic pseudo-random
    *     sample computed as a TakeOrdered (no full count/extra scan),
    *     broadcast (tiny);
    *  2. build: every vector is assigned to its nearest centroid (exact
    *     quantized cosine, raw double) — one broadcast join + argmax, no
    *     shuffle of the vectors;
    *  3. probe: each query scores only vectors in its `nprobe` closest
    *     centroid cells — the candidate set shrinks ≈ nCentroids/nprobe ×.
    *
    * At 100 TB the inverted lists are what you'd bucket/partition the table
    * by, so a probe touches only those partitions (partition pruning on
    * `centroid_id`). Recall is tuned with nprobe; exactness is recovered by
    * reranking the survivors with the exact kernel (done here).
    *
    * SIZING (round 16, the [[graft.ext.Sketches]] bloom discipline):
    * `nCentroids` ≤ 0 (the default) derives nCentroids = ⌈√N⌉ from one
    * cheap count of the corpus — a PLANNING action, same role as the
    * runtime stats behind AQE. A fixed centroid count is the classic IVF
    * scale defect: cells grow linearly with the corpus while the centroid
    * count stands still, so probe cost per query grows ∝ N instead of
    * ∝ √N (round 15 measured exactly that: 9.8× wall at 10× data under
    * the fixed demo default). ⌈√N⌉ keeps build cost (N·√N assignment
    * dots) and probe cost (nprobe·√N candidates) balanced — the standard
    * IVF heuristic. An explicit positive value remains as the override
    * (and is how the recall specs pin their geometry).
    */
  def ivfTopK(emb: DataFrame, queryPred: Column, k: Int = 5,
              nCentroids: Int = 0, nprobe: Int = 4): DataFrame = {
    // ONE code path with the persisted-index route: build + probe in a
    // single plan — bit-equality between the two APIs is structural, not
    // a parallel implementation kept in sync by tests alone. The
    // centroid row passes DIRECTLY (not re-derived from the index's
    // is_centroid flag) so the one-plan form never re-walks the vector
    // frame for it; the probe branch prunes the assignment expression
    // away via column pruning, leaving exactly one N·√N assignment in
    // the plan. Pinning the built index was measured SLOWER here: the
    // localCheckpoint write of the N-row array frame costs more than
    // the pruned branches it would save (two-point runs, both SFs).
    val (index, centroids) = ivfParts(emb, nCentroids)
    ivfProbe(index, centRowOf(centroids), queryPred, k, nprobe)
  }

  /** The standing IVF INDEX of an embedding corpus — the ANN sibling of
    * [[graft.ext.Dedup.buildBandIndex]]'s 100 TB asset shape: assignment
    * (the N·√N build cost) runs ONCE when the corpus lands and is
    * PERSISTED; every later query batch probes the stored cells
    * ([[ivfTopKIndexed]]) instead of rebuilding. One parquet row per
    * nonzero vector: (vec_id, q: array<long> — the e-6 quantized vector,
    * vn: double — its norm (IEEE doubles round-trip parquet bit-exactly),
    * centroid_id: the assigned cell, is_centroid: member of the sampled
    * centroid set). `is_centroid` is stored, NOT re-derived as
    * vec_id == centroid_id: under fp ties an exact-copy centroid's own
    * row can be assigned to its lower-id twin, which would silently drop
    * it from a derived centroid set and change probe geometry.
    */
  def buildIvfIndex(emb: DataFrame, nCentroids: Int = 0): DataFrame =
    ivfParts(emb, nCentroids)._1

  /** The index frame plus its centroid table (centroid_id, cv, cn) —
    * [[ivfTopK]] consumes both so the one-plan form derives the centroid
    * row once, directly.
    */
  private def ivfParts(emb: DataFrame,
                       nCentroids: Int): (DataFrame, DataFrame) = {
    val nc = if (nCentroids > 0) nCentroids
      else math.max(1, math.ceil(math.sqrt(emb.count().toDouble)).toInt)
    // centroid choice: the nCentroids lowest-hash vectors — a
    // deterministic pseudo-random sample via TakeOrdered. The hash is
    // engine-neutral integer arithmetic (not Murmur3/xxhash), so an
    // external oracle can reproduce the exact centroid set.
    val quantized = emb
      .withColumn("q", quantize(col("embedding")))
      .withColumn("n2", qdot(col("q"), col("q")))
      .filter(col("n2") > 0L)
    val centroids = broadcast(
      quantized.select(col("vec_id").as("centroid_id"), col("q").as("cv"),
          sqrt(col("n2").cast("double")).as("cn"))
        .orderBy(graft.functions.Hashing.knuthMod(col("centroid_id"),
          1000003L, offset = 17L), col("centroid_id"))
        .limit(nc))
    // repartition BEFORE the nc×-amplifying assignment transform (the
    // q206 gram-explode lesson): the corpus parquet arrives in a handful
    // of input splits, and without this the N·nc·dim assignment flops
    // serialize on them (StageAudit at the 10× point: 3.6 s in 2 tasks)
    val vectors = quantized.select(col("vec_id"), col("q"),
        sqrt(col("n2").cast("double")).as("vn"))
      .repartition(col("vec_id"))
    val index = assignCells(centRowOf(centroids), vectors, 1)
      .join(broadcast(centroids.select(col("centroid_id").as("vec_id"),
        lit(true).as("is_centroid"))), Seq("vec_id"), "left")
      .na.fill(false, Seq("is_centroid"))
    (index, centroids)
  }

  /** ONE broadcast row carrying the whole centroid table as an array:
    * assignment becomes a per-vector transform + array_sort + slice — no
    * N×nc row blowup, no exchange, no window sort. The round-15 window
    * form shuffled N·nc rows through a per-vector row_number (89.6M rows
    * at the 10× point — THE super-linear term in q31's 9× ratio); this
    * shape keeps the same flops inside one codegen'd projection.
    */
  private def centRowOf(centroids: DataFrame): DataFrame =
    broadcast(centroids
      .agg(collect_list(struct(col("centroid_id"), col("cv"), col("cn")))
        .as("cents")))

  /** Top-`top` nearest centroids per vector row of `df(…, q, vn)`.
    * Assignment cosines are the SAME raw-double chain (qdot cast /
    * (vn·cn)) with the same (ccos desc, centroid_id) tie-break as the
    * round-15 window form, so every assignment — and the q31/q189 oracle
    * hashes — is bit-identical to it.
    */
  private def assignCells(centRow: DataFrame, df: DataFrame,
                          top: Int): DataFrame =
    df.crossJoin(centRow)
      .withColumn("scored", transform(col("cents"), c =>
        struct((qdot(col("q"), c("cv")).cast("double") /
          (col("vn") * c("cn"))).as("ccos"),
          c("centroid_id").as("centroid_id"))))
      .withColumn("cpick", slice(array_sort(col("scored"), (a, b) =>
        when(a("ccos") > b("ccos"), -1).when(a("ccos") < b("ccos"), 1)
          .when(a("centroid_id") < b("centroid_id"), -1)
          .when(a("centroid_id") > b("centroid_id"), 1)
          .otherwise(0)), 1, top))
      .withColumn("centroid_id",
        explode(transform(col("cpick"), t => t("centroid_id"))))
      .drop("cents", "scored", "cpick")

  /** IVF probe against a PERSISTED [[buildIvfIndex]] frame: queries are
    * assigned to their `nprobe` nearest stored centroids and score only
    * the vectors in those cells — none of the corpus-side build work
    * re-runs. [[ivfTopK]] is exactly build + this in one plan.
    */
  def ivfTopKIndexed(index: DataFrame, queryPred: Column, k: Int = 5,
                     nprobe: Int = 4): DataFrame =
    ivfProbe(index,
      centRowOf(index.filter(col("is_centroid"))
        .select(col("vec_id").as("centroid_id"), col("q").as("cv"),
          col("vn").as("cn"))),
      queryPred, k, nprobe)

  /** LINEAR-build IVF (round 19) — the scale path past the exact build's
    * N·√N assignment, the scale story's only above-linear term (q268:
    * 115.6× wall at 100× data, ^1.47 measured). The classic mini-batch
    * k-means shape from the public literature (Sculley, WWW'10; k-means‖
    * Bahmani et al., VLDB'12): fit centroids on a BOUNDED deterministic
    * sample of the corpus, then ONE assignment pass —
    *
    *   1. sample  = the `sampleSize` lowest-hash vectors (the engine-
    *      neutral knuth order the exact build already samples with — a
    *      deterministic reservoir, one TakeOrdered, bounded);
    *   2. init    = the `nCentroids` lowest-hash of those (the exact
    *      build's rule, capped instead of √N);
    *   3. refine  = one Lloyd step ON THE SAMPLE ONLY: assign the sample
    *      to init (same ccos/tie-break chain as the exact build), then
    *      per-cell element-wise integer mean — floor(Σqᵢ/|cell|), exact
    *      long sums, one IEEE division, so an external oracle replays it
    *      bit-for-bit. An empty cell (its seed captured by an identical
    *      lower-id twin) and a degenerate all-zero mean keep their seed
    *      vector — cn > 0 stays structural, never a NaN ordering hazard;
    *   4. assign  = ONE pass of all N vectors against the nc refined
    *      centroids.
    *
    * Cost: fit is O(sampleSize·nc) — CONSTANT in N; assignment is
    * O(N·nc) with nc a bounded knob, not √N — so the whole build is
    * ~linear in the corpus (the q280 30×/100× record), while probe cost
    * per query stays nprobe/nc of the corpus. The exact √N build remains
    * alongside as the measured oracle twin, exactly how q19's brute
    * force backs q24/q31.
    *
    * Centroids are REFINED MEANS, not corpus vectors, so they live in
    * their own frame (no is_centroid rows); [[ivfTopKSampled]] is the
    * build+probe one-plan form, oracled independently (q280) since cell
    * geometry legitimately differs from the exact build's.
    */
  private def sampledParts(emb: DataFrame, nCentroids: Int,
                           sampleSize: Int): (DataFrame, DataFrame) = {
    require(nCentroids > 0 && sampleSize >= nCentroids,
      s"sampled IVF needs 0 < nCentroids ($nCentroids) <= sampleSize " +
        s"($sampleSize)")
    val quantized = emb
      .withColumn("q", quantize(col("embedding")))
      .withColumn("n2", qdot(col("q"), col("q")))
      .filter(col("n2") > 0L)
    val ordered = quantized
      .select(col("vec_id"), col("q"),
        sqrt(col("n2").cast("double")).as("vn"))
      .orderBy(graft.functions.Hashing.knuthMod(col("vec_id"),
        1000003L, offset = 17L), col("vec_id"))
    val sample = ordered.limit(sampleSize)
    val init = ordered.limit(nCentroids)
      .select(col("vec_id").as("centroid_id"), col("q").as("cv"),
        col("vn").as("cn"))
    // one Lloyd step on the sample: per-cell element-wise integer mean.
    // The explode is bounded (sampleSize·dim rows) — fit cost never
    // scales with the corpus
    val assigned = assignCells(centRowOf(init), sample, 1)
    val means = assigned
      .select(col("centroid_id"), posexplode(col("q")).as(Seq("pos", "v")))
      .groupBy(col("centroid_id"), col("pos"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("cnt"))
      .withColumn("m",
        floor(col("s").cast("double") / col("cnt").cast("double"))
          .cast("long"))
      .groupBy(col("centroid_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("m")))),
        t => t("m")).as("mv"))
      .withColumn("mn2", qdot(col("mv"), col("mv")))
    val centroids = broadcast(init
      .join(means, Seq("centroid_id"), "left")
      .select(col("centroid_id"),
        when(col("mn2") > 0L, col("mv")).otherwise(col("cv")).as("cv"),
        when(col("mn2") > 0L, sqrt(col("mn2").cast("double")))
          .otherwise(col("cn")).as("cn")))
    // repartition before the nc×-amplifying assignment (the ivfParts
    // discipline); ONE linear pass over the corpus
    val vectors = quantized.select(col("vec_id"), col("q"),
        sqrt(col("n2").cast("double")).as("vn"))
      .repartition(col("vec_id"))
    (assignCells(centRowOf(centroids), vectors, 1), centroids)
  }

  /** Sampled-build ANN in one plan: [[sampledParts]] + the shared probe
    * kernel. The LINEAR-build counterpart of [[ivfTopK]].
    */
  def ivfTopKSampled(emb: DataFrame, queryPred: Column, k: Int = 5,
                     nCentroids: Int = 128, sampleSize: Int = 4096,
                     nprobe: Int = 4): DataFrame = {
    val (index, centroids) = sampledParts(emb, nCentroids, sampleSize)
    ivfProbe(index, centRowOf(centroids), queryPred, k, nprobe)
  }

  /** Order-invariant content digest of an embeddings corpus — the q222
    * lineage discipline on vectors: each row's term mixes its quantized
    * self-moment (q·q, the SAME engine-neutral integer arithmetic the
    * index scores with) with its spread vec_id BEFORE the commutative
    * sum (a linear fold is blind to pairing swaps — see
    * [[Curation.corpusDigest]]), mod 2³¹ throughout. One scan-bound
    * aggregation; a catalog serves it at scale.
    */
  def embeddingDigest(emb: DataFrame): Long = {
    val q = quantize(col("embedding"))
    // POSITION-SENSITIVE moment (round 19, the ADVICE fix): the self-
    // moment q·q alone is invariant under component permutations and
    // sign flips, so a norm-preserving per-vector edit passed the
    // freshness gate silently. Σ qᵢ·(2i+1) breaks both symmetries (odd
    // weights, one per position) while staying engine-neutral integer
    // arithmetic; |qᵢ| ≤ 1e6 and dims are small, so the fold cannot
    // overflow a long before the mod.
    val posdot = aggregate(
      transform(q, (x, i) => x * (lit(2L) * i + lit(1L))),
      lit(0L), (acc, v) => acc + v)
    emb.select(pmod(graft.functions.Hashing.mix40(
        pmod(qdot(quantize(col("embedding")), quantize(col("embedding"))) +
          pmod(posdot, lit(1L << 31)) +
          graft.functions.Hashing.spread(col("vec_id"), 1L << 31),
          lit(1L << 31))), lit(1L << 31)).as("term"))
      .agg(coalesce(pmod(sum(col("term")), lit(1L << 31)), lit(0L)))
      .head().getLong(0)
  }

  /** Incremental maintenance of a standing [[buildIvfIndex]] asset — the
    * [[Assets.advance]] step for the ANN family, and the advance that
    * makes the seam's economics visible: a from-scratch build re-pays
    * the N·√N assignment (the scale story's only above-linear term —
    * 122.5 s at the 100× point) for ANY corpus change, while advance
    * assigns only the DELTA against the STORED centroid row:
    * |delta|·√N flops, corpus text and standing vectors untouched.
    *
    * Unlike the band/dhash/cluster advances this is NOT value-identical
    * to the from-scratch build on the grown corpus — a rebuild would
    * RESAMPLE √N′ centroids over all vectors and move every cell
    * boundary. Advance deliberately keeps the standing geometry (the
    * probe-side contract: cells mean what they meant), under a loud
    * DRIFT GUARD: once the un-sampled delta mass passes `maxDeltaFrac`
    * of the indexed corpus, the centroid sample is no longer
    * representative of the distribution it partitions (cells bloat,
    * recall decays) and the caller must rebuild. q278 oracles the
    * advanced probe independently (assign-to-standing-centroids
    * replayed in SQL), the q31/q24 discipline for approximate geometry.
    */
  def advanceIvfIndex(index: DataFrame, deltaEmb: DataFrame,
                      maxDeltaFrac: Double = 0.5): DataFrame = {
    val quantized = deltaEmb
      .withColumn("q", quantize(col("embedding")))
      .withColumn("n2", qdot(col("q"), col("q")))
      .filter(col("n2") > 0L)
    val nOld = index.count()
    val nDelta = quantized.count()
    require(nDelta <= maxDeltaFrac * nOld,
      s"IVF advance: delta carries $nDelta vectors against $nOld " +
        s"indexed (> ${maxDeltaFrac} drift guard) — the standing " +
        "centroid sample no longer represents the corpus; rebuild with " +
        "buildIvfIndex")
    val overlap = index.select(col("vec_id"))
      .join(broadcast(quantized.select(col("vec_id")).distinct()),
        "vec_id").limit(1).collect()
    require(overlap.isEmpty,
      "IVF advance: delta re-contains indexed vec_id " +
        s"${overlap.headOption.map(_.getLong(0)).getOrElse(-1L)} — a " +
        "delta must be NEW vectors only; rebuild for a corpus rewrite")
    val centroids = index.filter(col("is_centroid"))
      .select(col("vec_id").as("centroid_id"), col("q").as("cv"),
        col("vn").as("cn"))
    // same repartition-before-amplification discipline as ivfParts: the
    // delta arrives in a handful of input splits and the nc× assignment
    // transform would serialize on them
    val vectors = quantized.select(col("vec_id"), col("q"),
        sqrt(col("n2").cast("double")).as("vn"))
      .repartition(col("vec_id"))
    index.unionByName(
      assignCells(centRowOf(centroids), vectors, 1)
        .withColumn("is_centroid", lit(false))
        .select(index.columns.map(col): _*))
  }

  /** [[buildIvfIndex]] stamped with [[embeddingDigest]] — the versioned
    * form [[graft.ext.Assets.ensure]] persists once per (corpus digest,
    * centroid geometry) and serves to every later probe.
    */
  def buildIvfIndexVersioned(emb: DataFrame, nCentroids: Int = 0): DataFrame =
    graft.ext.Assets.stamp(buildIvfIndex(emb, nCentroids), "centroid_id",
      embeddingDigest(emb))

  /** [[ivfTopKIndexed]] behind the freshness gate: a stale index answers
    * top-k from a corpus that no longer exists (missing new vectors,
    * ranking deleted ones) — loud failure before any probe runs.
    */
  def ivfTopKIndexedFresh(index: DataFrame, digest: Long, queryPred: Column,
                          k: Int = 5, nprobe: Int = 4): DataFrame =
    ivfTopKIndexed(
      graft.ext.Assets.requireFresh(index, "centroid_id", digest),
      queryPred, k, nprobe)

  private def ivfProbe(index: DataFrame, centRow: DataFrame,
                       queryPred: Column, k: Int, nprobe: Int): DataFrame = {
    val indexed = index
      .select(col("vec_id").as("neighbor_id"), col("q").as("nv"),
        col("vn").as("nn"), col("centroid_id"))
    val probes = assignCells(centRow,
      index.filter(queryPred).select(col("vec_id"), col("q"), col("vn")),
      nprobe)
      .select(col("vec_id").as("query_id"), col("q").as("qv"),
        col("vn").as("qn"), col("centroid_id"))

    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    probes.join(indexed, Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        qdot(col("qv"), col("nv")).cast("double") / (col("qn") * col("nn")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("query_id", "neighbor_id", "rnk", "cos")
  }

  /** Maximal Marginal Relevance: k results that balance query relevance
    * against redundancy — pick₁ = argmax rel, then each round takes
    * argmax λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s). THE diversified-
    * retrieval rerank (a RAG context set of near-duplicate top hits wastes
    * its token budget; MMR is the standard fix). All cosines come from
    * exact quantized moments rounded to 6 dp BEFORE any ranking (the q31
    * argmax discipline), λ·rel − (1−λ)·sim is a fixed two-multiply chain,
    * and every argmax ties on vec_id — so the greedy trajectory is
    * bit-reproducible and the driver oracle replays it as k unrolled CTE
    * rounds. MMR is by definition a RERANK over a candidate pool: the
    * pool is the top `candN` by relevance (a TakeOrdered, never a global
    * rank window), the sim matrix is candN² — both independent of corpus
    * size; the corpus-wide work is only the relevance scan. Rounds are
    * tiny argmax jobs over checkpointed frames (the BFS-frontier pinning
    * lesson).
    */
  /** 6-dp cosine from exact quantized moments (the q31 argmax
    * discipline): one division, two sqrts over association-free integers.
    */
  private def cos6(qa: Column, qb: Column, n2a: Column, n2b: Column): Column =
    round(qdot(qa, qb).cast("double") /
      (sqrt(n2a.cast("double")) * sqrt(n2b.cast("double"))), 6)

  /** The MMR candidate pool: top `candN` by query relevance via
    * `orderBy().limit()` → TakeOrderedAndProject (per-partition heaps +
    * driver merge, the q72 lesson) — NOT a global rank window, which
    * would sort the whole corpus through one task. Exposed for the plan
    * assertion; [[mmrSelect]] checkpoints it.
    */
  private[graft] def mmrPool(emb: DataFrame, queryId: Long,
                             candN: Int): DataFrame = {
    val vecs = emb.select(col("vec_id"), quantize(col("embedding")).as("q"))
      .withColumn("n2", qdot(col("q"), col("q")))
      .filter(col("n2") > 0)
    val qv = vecs.filter(col("vec_id") === queryId)
      .select(col("q").as("qq"), col("n2").as("qn2"))
    vecs.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(qv))
      .withColumn("rel", cos6(col("q"), col("qq"), col("n2"), col("qn2")))
      .orderBy(col("rel").desc, col("vec_id")).limit(candN)
      .select(col("vec_id"), col("q"), col("n2"), col("rel"))
  }

  def mmrSelect(emb: DataFrame, queryId: Long = 0L, k: Int = 5,
                candN: Int = 40, lambdaTenths: Int = 7): DataFrame = {
    // λ·rel − (1−λ)·sim is EXACT DECIMAL arithmetic: rel/sim are 6-dp
    // rounds, so casting them to DECIMAL(9,6) recovers the grid value
    // identically in both engines, and the two-multiply-minus chain — the
    // FMA-contractible shape when run on doubles (q77 class) — becomes
    // association-free fixed-point. Scores order and hash exactly.
    val lam = lit(java.math.BigDecimal.valueOf(lambdaTenths.toLong, 1))
    val lamC = lit(java.math.BigDecimal.valueOf(10L - lambdaTenths, 1))
    val cands = mmrPool(emb, queryId, candN).transform(graft.Pin.apply)
    val sims = cands.as("a")
      .join(cands.as("b"), col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
        cos6(col("a.q"), col("b.q"), col("a.n2"), col("b.n2")).as("sim"))
      .transform(graft.Pin.apply)
    var selected = cands
      .orderBy(col("rel").desc, col("vec_id")).limit(1)
      .select(col("vec_id"), col("rel"), lit(1L).as("pick_order"),
        col("rel").cast("decimal(13,7)").as("mmr_score"))
      .transform(graft.Pin.apply)
    for (i <- 2 to k) {
      val pick = cands.as("c")
        .join(broadcast(selected.select(col("vec_id").as("sel_id"))),
          col("c.vec_id") === col("sel_id"), "left_anti")
        .join(sims, col("c.vec_id") === col("va"))
        .join(broadcast(selected.select(col("vec_id").as("sel_id"))),
          col("vb") === col("sel_id"))
        .groupBy(col("c.vec_id").as("vec_id"), col("c.rel").as("rel"))
        .agg(max(col("sim")).as("max_sim"))
        .select(col("vec_id"), col("rel"),
          (lam * col("rel").cast("decimal(9,6)") -
            lamC * col("max_sim").cast("decimal(9,6)"))
            .cast("decimal(13,7)").as("mmr_score"))
        .orderBy(col("mmr_score").desc, col("vec_id")).limit(1)
        .select(col("vec_id"), col("rel"), lit(i.toLong).as("pick_order"),
          col("mmr_score"))
      selected = selected.union(pick).transform(graft.Pin.apply)
    }
    // the greedy trajectory runs on exact DECIMAL(13,7) scores; the hashed
    // OUTPUT is the e-7 fixed-point BIGINT (driver decimal-normalization
    // lesson, round 6)
    selected.select(col("vec_id"), col("rel"), col("pick_order"),
      (col("mmr_score") * 10000000L).cast("long").as("mmr_score_e7"))
  }

  /** Embedding-cosine near-duplicate groups: pairs above `minCos`, then keep
    * the lowest vec_id as the canonical representative (connected-component
    * approximation by min-id, one pass — full CC would iterate).
    */
  def cosineNearDups(emb: DataFrame, minCos: Double = 0.95): DataFrame = {
    // exact-collapse on the quantized vector: the deliberate all-pairs
    // baseline scores distinct(q)²/2 candidates instead of n²/2 — with m
    // exact copies of a vector, that is the difference between a baseline
    // that survives a re-ingested corpus and one that quadratically
    // drowns. Cosine is group-constant, so expansion is bit-identical
    // (ExactCollapseSpec); within-group pairs carry the same
    // qdot(q,q)/(nv·nv) expression the uncollapsed join evaluates.
    val q = emb.withColumn("q", quantize(col("embedding")))
      .withColumn("n2", qdot(col("q"), col("q")))
      .filter(col("n2") > 0L)
      .select(col("vec_id"), col("q"),
        sqrt(col("n2").cast("double")).as("nv"))
    val keyed = ExactCollapse.withRepPinned(q, "vec_id", Seq(col("q")))
    val members = keyed.select(col("rep"), col("vec_id"),
      (qdot(col("q"), col("q")).cast("double") / (col("nv") * col("nv")))
        .as("cos"))
    val reps = keyed.filter(col("vec_id") === col("rep")).drop("rep")
    // streamed side spread across cores — see cosineTopK; at 100 TB this
    // becomes a block-partitioned matrix multiply, same declared shape
    val a = reps.select(col("vec_id").as("vec_a"), col("q").as("va"),
      col("nv").as("na"))
      .repartition(emb.sparkSession.sparkContext.defaultParallelism)
    val b = reps.select(col("vec_id").as("vec_b"), col("q").as("vb"),
      col("nv").as("nb"))
    val repPairs = a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cos",
        qdot(col("va"), col("vb")).cast("double") / (col("na") * col("nb")))
      .filter(col("cos") >= minCos)
      .select("vec_a", "vec_b", "cos")
    ExactCollapse.expandUnordered(repPairs,
        members.select(col("rep"), col("vec_id")),
        "vec_a", "vec_b", Seq("cos"))
      .unionByName(ExactCollapse.withinPairs(members, "vec_a", "vec_b",
        Seq("cos")).filter(col("cos") >= minCos))
  }

  /** Connectivity-equivalent EDGE list for the brute cosine baseline —
    * [[cosineNearDups]]' answer to the round-15 verdict's q20 residual:
    * the PAIR-list contract materializes every within-group distance-0
    * pair, so m exact copies of a popular vector emit m²/2 OUTPUT rows
    * (10× copies ⇒ ~100× rows — produced by a linear equi-join, but the
    * output mass itself scales quadratically). A connectivity consumer
    * (clusters, keepers, CC) needs only the components, so this form
    * emits rep-grain verified pairs plus m−1 star edges per
    * identical-vector group: same connected components, output mass
    * LINEAR in multiplicity. Same < 1.0 envelope as
    * [[lshNearPairEdges]], same loud failure.
    */
  def cosineNearDupEdges(emb: DataFrame,
                         minCos: Double = 0.95): DataFrame = {
    require(minCos < 1.0,
      s"cosineNearDupEdges: minCos=$minCos outside the < 1.0 envelope — " +
        "selfCos of an identical group is 1.0 only up to ulp rounding; " +
        "use cosineNearDups (expanded pairs) for an exact-1.0 threshold")
    val q = emb.withColumn("q", quantize(col("embedding")))
      .withColumn("n2", qdot(col("q"), col("q")))
      .filter(col("n2") > 0L)
      .select(col("vec_id"), col("q"),
        sqrt(col("n2").cast("double")).as("nv"))
    val keyed = ExactCollapse.withRepPinned(q, "vec_id", Seq(col("q")))
    val members = keyed.select(col("rep"), col("vec_id"),
      (qdot(col("q"), col("q")).cast("double") / (col("nv") * col("nv")))
        .as("cos"))
    val reps = keyed.filter(col("vec_id") === col("rep")).drop("rep")
    val a = reps.select(col("vec_id").as("vec_a"), col("q").as("va"),
      col("nv").as("na"))
      .repartition(emb.sparkSession.sparkContext.defaultParallelism)
    val b = reps.select(col("vec_id").as("vec_b"), col("q").as("vb"),
      col("nv").as("nb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .filter(qdot(col("va"), col("vb")).cast("double") /
        (col("na") * col("nb")) >= minCos)
      .select(col("vec_a"), col("vec_b"))
      .unionByName(ExactCollapse.starEdges(
        members.filter(col("cos") >= minCos)
          .select(col("rep"), col("vec_id")),
        "vec_a", "vec_b"))
  }

  /** The uncollapsed all-pairs baseline applied to the full frame — the
    * spec's bit-equality reference for [[cosineNearDups]].
    */
  private[graft] def cosineNearDupsDistinct(emb: DataFrame,
                                            minCos: Double): DataFrame = {
    val q = emb.withColumn("q", quantize(col("embedding")))
      .withColumn("n2", qdot(col("q"), col("q")))
      .filter(col("n2") > 0L)
    val a = q.select(col("vec_id").as("vec_a"), col("q").as("va"),
      sqrt(col("n2").cast("double")).as("na"))
      .repartition(emb.sparkSession.sparkContext.defaultParallelism)
    val b = q.select(col("vec_id").as("vec_b"), col("q").as("vb"),
      sqrt(col("n2").cast("double")).as("nb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cos",
        qdot(col("va"), col("vb")).cast("double") / (col("na") * col("nb")))
      .filter(col("cos") >= minCos)
      .select("vec_a", "vec_b", "cos")
  }

  /** Symmetric int8 scalar quantization of the embedding column — the
    * storage-side operator that makes a 100 TB vector corpus tractable
    * (4 bytes/dim → 1 byte/dim before any indexing): per-vector scale =
    * max(|x|)/127, q_i = round-half-up(x_i/scale) ∈ [−127, 127].
    *
    * Pure per-row expressions, zero shuffles. Every step is engine-neutral:
    * elements are widened float→double (exact) before any arithmetic, and
    * rounding is an explicit `floor(x + 0.5)` so no engine's round-mode
    * choice is in the path. Zero vectors quantize to all-zero (scale 0
    * guard — ANSI division would throw).
    *
    * @return (vec_id, n_dims, scale, q_min, q_max, q_l1, checksum) — the
    *         quantized vector itself is summarized (l1 mass + position-
    *         weighted checksum) so the result is hash-comparable without
    *         array-column compare support.
    */
  def quantizeInt8(emb: DataFrame): DataFrame = {
    val v = transform(col("embedding"), x => x.cast("double"))
    val scale = array_max(transform(v, x => abs(x))) / 127.0
    val q = transform(v, x =>
      when(col("scale") > 0.0,
        floor(x / col("scale") + 0.5).cast("long")).otherwise(0L))
    emb
      .select(col("vec_id"), size(col("embedding")).cast("long").as("n_dims"),
        scale.as("scale"), col("embedding"))
      .withColumn("q", q)
      .select(col("vec_id"), col("n_dims"), col("scale"),
        array_min(col("q")).as("q_min"),
        array_max(col("q")).as("q_max"),
        aggregate(col("q"), lit(0L), (acc, x) => acc + abs(x)).as("q_l1"),
        aggregate(zip_with(col("q"),
            sequence(lit(1), size(col("q"))).cast("array<long>"),
            (x, i) => x * pmod(i, lit(97L))),
          lit(0L), (acc, x) => acc + x).as("checksum"))
  }

  /** Per-DIMENSION standardization (feature scaling) of the embedding
    * corpus: z = (x − μ_d) / σ_d per dimension d — the normalize step
    * before clustering/ANN when dimensions have unequal scales.
    *
    * Parity/scale design: values are fixed-point quantized ([[quantize]]),
    * so the per-dimension moments Σx and Σx² are EXACT integer sums —
    * association-free in any engine or plan — and μ/σ/z derive from them
    * by IEEE ops (÷, √) that are bit-identical everywhere. Bounds: with
    * |x| ≤ 1 the integer moments stay < 2⁵³ up to ~10⁷ rows/dim; past
    * that, sum into DECIMAL(38,0) (same trick as the decimal-cents
    * aggregates) before deriving.
    *
    * One explode + one hash agg on dim (64 groups, map-side combined);
    * the per-dim stat frame broadcasts back over the slice being scored.
    */
  def standardizeDims(emb: DataFrame, outPred: Column): DataFrame = {
    val flat = emb.select(col("vec_id"),
      posexplode(quantize(col("embedding"))).as(Seq("dim", "qv")))
    val stats = flat.groupBy(col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("qv")).as("s1"),
        sum(col("qv") * col("qv")).as("s2"))
      .select(col("dim"),
        (col("s1").cast("double") / col("n").cast("double")).as("mu"),
        sqrt((col("n") * col("s2") - col("s1") * col("s1")).cast("double") /
          (col("n") * col("n")).cast("double")).as("sigma"))
    flat.filter(outPred)
      .join(broadcast(stats), "dim")
      .select(col("vec_id"), col("dim").cast("long").as("dim"), col("qv"),
        when(col("sigma") > 0,
          (col("qv").cast("double") - col("mu")) / col("sigma")).as("z"))
  }

  /** Per-class embedding statistics: for every (label, dimension), the
    * exact quantized moments and the derived mean/population variance —
    * the class-centroid + within-class-scatter diagnostic behind LDA-style
    * separability checks and embedding-drift monitoring.
    *
    * Scale shape: one posexplode + one hash agg on (label, dim) —
    * |labels|·dims groups, map-side combined; no joins. Parity: moments
    * are exact longs; mean/var are divisions of exact ints (n·s2 − s1²
    * stays within long for |q| ≤ 1e6 through ~10⁶-row classes; widen to
    * decimal beyond).
    */
  def classScatter(emb: DataFrame): DataFrame =
    emb.select(col("label").cast("long").as("label"),
        posexplode(quantize(col("embedding"))).as(Seq("dim", "qv")))
      .groupBy(col("label"), col("dim").cast("long").as("dim"))
      .agg(count(lit(1)).as("n"), sum(col("qv")).as("s1"),
        sum(col("qv") * col("qv")).as("s2"))
      .select(col("label"), col("dim"), col("n"), col("s1"), col("s2"),
        (col("s1").cast("double") / col("n").cast("double")).as("mean"),
        ((col("n") * col("s2") - col("s1") * col("s1")).cast("double") /
          (col("n") * col("n")).cast("double")).as("var_pop"))

  /** Two exact power-iteration steps toward the corpus Gram matrix's
    * dominant eigenvector (the PCA direction estimate) — WITHOUT ever
    * materializing the dims² Gram matrix: XᵀXv is computed as Xᵀ(Xv), two
    * corpus-linear passes of per-row dots + weighted column sums. The Gram
    * form would be a dims²-cell aggregation (fine at 64 dims, ruinous at
    * 4k) — the factored form is THE scale lesson for spectral methods on
    * data-parallel engines.
    *
    * Starting vector = all-ones. Every quantity is exact integer
    * arithmetic: v1 fits a long (|q|·Σ|q|·rows ≲ 1e17 here), v2 runs in
    * decimal(38,0) (≲ 2e33; both engines' 128-bit integers hold it — one
    * more iteration would overflow, so `iters` stays 2 and a production
    * loop would rescale between iterations). The doubles in the output are
    * casts/divisions of those exact values — bit-identical anywhere.
    *
    * @return (dim, v1, v2, v2_scaled): raw first step (long), second step
    *         (double view of the exact decimal), and v2/max(v2)
    */
  def gramPowerIteration(emb: DataFrame): DataFrame = {
    val q = emb.select(quantize(col("embedding")).as("q"))
    val withS = q.withColumn("s",
      aggregate(col("q"), lit(0L), (a, x) => a + x))
    val v1 = withS
      .select(col("s"), posexplode(col("q")).as(Seq("dim", "qv")))
      .groupBy(col("dim")).agg(sum(col("qv") * col("s")).as("v1"))
    // dims-sized vector → ONE broadcast row, ordered by dim (same collapse
    // as kmeansStep's centroids)
    val v1row = v1
      .agg(sort_array(collect_list(struct(col("dim"), col("v1")))).as("a"))
      .select(transform(col("a"), e => e("v1")).as("v1arr"))
    val withT = withS.crossJoin(broadcast(v1row))
      .withColumn("t", expr(
        """aggregate(zip_with(q, v1arr,
          |            (a, b) -> CAST(a AS DECIMAL(38,0)) * CAST(b AS DECIMAL(38,0))),
          |          CAST(0 AS DECIMAL(38,0)), (acc, x) -> acc + x)"""
          .stripMargin))
    val v2 = withT
      .select(col("t"), posexplode(col("q")).as(Seq("dim", "qv")))
      .groupBy(col("dim"))
      .agg(sum(col("qv").cast("decimal(38,0)") * col("t")).as("v2dec"))
    val vmax = v2.agg(max(col("v2dec")).as("vmax"))
    v2.join(broadcast(v1), "dim")
      .crossJoin(broadcast(vmax))
      .select(col("dim").cast("long").as("dim"), col("v1"),
        col("v2dec").cast("double").as("v2"),
        (col("v2dec").cast("double") / col("vmax").cast("double"))
          .as("v2_scaled"))
  }

  /** One k-means Lloyd iteration over quantized embeddings: assign every
    * vector to its nearest centroid (exact integer squared-L2, ties to the
    * lowest centroid id), then emit the update state — per-(centroid, dim)
    * assignment counts, exact coordinate sums, and the new mean coordinate.
    * Seeds are the first `k` vectors by id (deterministic; swap for k-means∥
    * at scale — the iteration body is identical).
    *
    * Scale shape: the k seed vectors collapse to ONE broadcast row of
    * structs, so assignment is a pure map-side expression over the corpus —
    * `array_sort` of (dist, centroid_id) pairs IS the argmin, no per-vector
    * shuffle, no |N|×k expansion through an exchange. The only shuffle is
    * the update's hash agg on (centroid_id, dim): k·dims groups, map-side
    * combined. Parity: distances and sums are association-free integer
    * arithmetic; the mean is one IEEE division of exact ints, emitted raw.
    *
    * Magnitude guard: |q| ≤ 1e6·|x|, so per-dim dist terms ≤ 4e12·dims and
    * coordinate sums ≤ 1e6·n — both in long range through petabyte corpora;
    * the update sum would be the first to need a decimal widen.
    */
  def kmeansStep(emb: DataFrame, k: Int = 8): DataFrame = {
    val q = emb.select(col("vec_id"), quantize(col("embedding")).as("q"))
    val centsRow = q.filter(col("vec_id") < k)
      .select(struct(col("vec_id").as("centroid_id"), col("q").as("cq")).as("c"))
      .agg(sort_array(collect_list(col("c"))).as("cents"))
    val assigned = q.crossJoin(broadcast(centsRow))
      .withColumn("m", expr(
        """array_sort(transform(cents, c -> struct(
          |  aggregate(zip_with(q, c.cq, (a, b) -> (a - b) * (a - b)),
          |            0L, (acc, x) -> acc + x) AS dist,
          |  c.centroid_id AS centroid_id)))[0]""".stripMargin))
      .select(col("m.centroid_id").as("centroid_id"), col("q"))
    assigned
      .select(col("centroid_id"), posexplode(col("q")).as(Seq("dim", "qv")))
      .groupBy(col("centroid_id"), col("dim").cast("long").as("dim"))
      .agg(count(lit(1)).as("n_assigned"), sum(col("qv")).as("s_dim"))
      .withColumn("new_c",
        col("s_dim").cast("double") / col("n_assigned").cast("double"))
  }

  /** Embedding health audit — the gate a pipeline runs on a vector column
    * BEFORE indexing or training on it: per label-class counts of
    * wrong-dimension vectors, non-finite (NaN/±Inf) vectors, and all-zero
    * vectors (each of which silently poisons ANN indexes and contrastive
    * losses), plus the exact fixed-point norm² envelope (min / max /
    * total) that catches un-normalized or scale-drifted batches.
    *
    * Parity: norm² runs on the [[quantize]] image — per-coordinate
    * ⌊x·10⁶ + 0.5⌋ longs, squared and summed in exact integer arithmetic
    * — so the envelope is engine-exact with no fp association anywhere
    * (the q111 discipline). Non-finite vectors are EXCLUDED from the
    * envelope (null norm²) before quantization touches them: the audit
    * must report a NaN vector, not die on the ANSI NaN→long cast it
    * would trigger. Inf detection is exact-equality against ±Float.Inf
    * (DuckDB `isinf` parity; a magnitude threshold would not agree).
    * Magnitude: |x| ≤ ~1, 64 dims ⇒ norm² ≤ ~6e13 per vector, corpus
    * totals within long through billions of vectors.
    *
    * Scale shape: pure per-row expressions + one map-side-combined hash
    * aggregation to the label-cardinality frame. Zero joins, zero windows.
    *
    * @return one row per label: label, n_vecs, n_bad_dim, n_nonfinite,
    *         n_zero, min_norm2_q, max_norm2_q, sum_norm2_q (envelope
    *         null for labels whose every vector is non-finite)
    */
  def embeddingAudit(emb: DataFrame, dim: Int = 64): DataFrame = {
    val nonFinite = exists(col("embedding"), x =>
      isnan(x) || x === lit(Float.PositiveInfinity) ||
        x === lit(Float.NegativeInfinity))
    val q = quantize(col("embedding"))
    emb
      .select(col("label").cast("long").as("label"),
        (size(col("embedding")) =!= dim).as("bad_dim"),
        nonFinite.as("non_finite"),
        forall(col("embedding"), x => x.cast("double") === 0.0).as("all_zero"),
        when(nonFinite, lit(null).cast("long"))
          .otherwise(qdot(q, q)).as("n2"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(when(col("bad_dim"), 1L).otherwise(0L)).as("n_bad_dim"),
        sum(when(col("non_finite"), 1L).otherwise(0L)).as("n_nonfinite"),
        sum(when(col("all_zero"), 1L).otherwise(0L)).as("n_zero"),
        min(col("n2")).as("min_norm2_q"),
        max(col("n2")).as("max_norm2_q"),
        sum(col("n2")).as("sum_norm2_q"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023, "SemDeDup:
    * Data-efficient learning at web-scale through semantic deduplication"):
    * cluster the embedding space, then compare cosines ONLY within a
    * cluster and keep one representative per near-duplicate neighborhood
    * (the lowest-id member). This is the documented scale path for
    * embedding near-dup: the brute pair scan ([[cosineTopK]]'s shape) is
    * |N|² and the round-10 scale readout measured it ~20× super-linear on
    * a 10× corpus, while cluster bucketing bounds the quadratic work to
    * Σ|cluster|² — with |cluster| ≈ N/k and k grown with the corpus
    * (SemDeDup runs k ≈ √N), per-cluster work stays constant.
    *
    * Determinism/parity (the q31 discipline): centroids are the first `k`
    * nonzero vectors by id (swap for trained/k-means∥ centroids at scale —
    * the comparison body is identical); assignment is exact integer
    * squared-L2 on the quantized image, ties to the lowest centroid id;
    * the duplicate decision `cos ≥ num/den` is the exact integer
    * inequality `dot ≥ 0 ∧ den²·dot² ≥ num²·n2a·n2b` in decimal(38,0) —
    * no floating point anywhere in any decision. Magnitude: |q| ≤ 1e6, so
    * at 4096 dims dot ≤ 4e15, den²·dot² ≤ 1.7e35 < 10³⁸ for den ≤ 100.
    *
    * Scale shape: the k centroids collapse to ONE broadcast row (map-side
    * assignment, no shuffle); the pair join shuffles both sides once on
    * centroid_id. Parallelism equals k — at the fixture's k=8 that is
    * demo-scale, at a production k ≈ √N it is ample; cluster-size skew is
    * the operator's real scale knob (cap cluster sizes upstream or split
    * hot clusters by a salt on the SAME centroid, dedup within salt).
    *
    * @return one row per nonzero vector: (vec_id, centroid_id, is_dup,
    *         dup_of) — dup_of = lowest-id same-cluster neighbor above the
    *         threshold, null for kept representatives
    */
  def semanticDedup(emb: DataFrame, k: Int = 8,
                    thrNum: Int = 3, thrDen: Int = 10): DataFrame = {
    require(thrNum >= 0 && thrDen > 0 && thrDen <= 100,
      s"cosine threshold $thrNum/$thrDen outside the exact-decimal envelope")
    // exact-collapse on the quantized vector (the [[lshNearPairs]]
    // discipline): identical q rows share a centroid (assignment is a
    // deterministic function of q) and are mutually similar whenever
    // thr ≤ 1, so the in-cell quadratic join runs on one representative
    // per group. dup_of is reconstructible at member grain without pair
    // expansion: the lowest similar id visible to member v is
    // min(rep's similar-group minimum, v's own rep when v is not it) —
    // every group's minimum id IS its rep. Bit-identical to the
    // uncollapsed form (ExactCollapseSpec).
    val assigned = assignExactL2(emb, k)
    val keyed = ExactCollapse.withRepPinned(assigned, "vec_id", Seq(col("q")))
    val members = keyed.select(col("rep"), col("vec_id"), col("centroid_id"))
    val reps = keyed.filter(col("vec_id") === col("rep")).drop("rep")
    val simPairs = cellSimilarPairs(reps, thrNum, thrDen)
    val nbrMin = simPairs.select(col("vec_id").as("r"), col("b_vec_id").as("nbr"))
      .union(simPairs.select(col("b_vec_id").as("r"), col("vec_id").as("nbr")))
      .groupBy(col("r")).agg(min(col("nbr")).as("nbr_min"))
    // within-group similarity holds iff the threshold admits cos = 1
    // (dot = n2: den²·n2² ≥ num²·n2² ⇔ den ≥ num) — Scala-level gate
    val selfSimilar = thrDen >= thrNum
    members.join(nbrMin, col("rep") === col("r"), "left_outer")
      .select(col("vec_id"), col("centroid_id"),
        when(col("vec_id") =!= col("rep") && lit(selfSimilar),
          least(col("nbr_min"), col("rep")))
          .otherwise(when(col("nbr_min") < col("vec_id"), col("nbr_min")))
          .as("dup_of"))
      .select(col("vec_id"), col("centroid_id"),
        col("dup_of").isNotNull.as("is_dup"), col("dup_of"))
  }

  /** Undirected similar rep pairs within a centroid cell (b_vec_id <
    * vec_id), the exact-integer threshold inequality of [[semanticDedup]].
    */
  private def cellSimilarPairs(assigned: DataFrame, thrNum: Int,
                               thrDen: Int): DataFrame = {
    val b = assigned.select(col("centroid_id").as("b_cid"),
      col("vec_id").as("b_vec_id"), col("q").as("bq"), col("n2").as("b_n2"))
    val dec = "decimal(38,0)"
    assigned
      .join(b, col("centroid_id") === col("b_cid") &&
        col("b_vec_id") < col("vec_id"))
      .withColumn("dot", qdot(col("q"), col("bq")))
      .filter(col("dot") >= 0L &&
        lit(thrDen.toLong * thrDen).cast(dec) *
          col("dot").cast(dec) * col("dot").cast(dec) >=
        lit(thrNum.toLong * thrNum).cast(dec) *
          col("n2").cast(dec) * col("b_n2").cast(dec))
      .select(col("vec_id"), col("b_vec_id"))
  }

  /** The uncollapsed form applied to the full frame — the spec's
    * bit-equality reference for [[semanticDedup]].
    */
  private[graft] def semanticDedupDistinct(emb: DataFrame, k: Int,
                                           thrNum: Int,
                                           thrDen: Int): DataFrame = {
    val assigned = assignExactL2(emb, k)
    val pairs = cellSimilarPairs(assigned, thrNum, thrDen)
      .groupBy(col("vec_id")).agg(min(col("b_vec_id")).as("dup_of"))
    assigned.join(pairs, Seq("vec_id"), "left_outer")
      .select(col("vec_id"), col("centroid_id"),
        col("dup_of").isNotNull.as("is_dup"), col("dup_of"))
  }

  /** Embedding snapshot drift per label: compares the per-dimension
    * floor-mean of the quantized vectors between two corpus halves (the
    * stand-ins for two ingestion snapshots; `halfPred` marks snapshot A)
    * — the monitor that catches a re-embedding, a model swap, or an
    * upstream preprocessing change before a drifted space poisons
    * similarity search and semantic dedup.
    *
    * Exactness: per-dim means use FLOOR division of shifted-non-negative
    * sums — quantized values are shifted by +10⁶ (the quantization bound)
    * so every sum is ≥ 0, where Spark's truncating `div` and DuckDB's
    * flooring `//` agree (the q123 rule); the shift cancels exactly in
    * the mean difference (n·10⁶ / n is integral). drift² = Σ_d m_d² and
    * max |m_d| stay well inside longs (|m| ≤ 2·10⁶, 64 dims). Labels
    * with an empty half are excluded (mean undefined — documented, the
    * readout would otherwise divide by zero).
    *
    * Scale shape: one posexplode to (label, dim) sums (map-side
    * combined), one label-cardinality count frame joined broadcast,
    * label-grain output. The corpus is touched once.
    *
    * @return label, n_a, n_b, drift_sq, max_dim_shift
    */
  def snapshotDrift(emb: DataFrame, halfPred: Column,
                    dim: Int = 64): DataFrame = {
    val q = emb.select(col("vec_id"), col("label").cast("long").as("label"),
      transform(quantize(col("embedding")), v => v + lit(1000000L)).as("q"),
      halfPred.as("in_a"))
    val cnt = q.groupBy(col("label"))
      .agg(sum(when(col("in_a"), 1L).otherwise(0L)).as("na"),
        sum(when(!col("in_a"), 1L).otherwise(0L)).as("nb"))
      .filter(col("na") > 0 && col("nb") > 0)
    val sums = q
      .select(col("label"), col("in_a"),
        posexplode(col("q")).as(Seq("d", "v")))
      .groupBy(col("label"), col("d"))
      .agg(sum(when(col("in_a"), col("v")).otherwise(0L)).as("sa"),
        sum(when(!col("in_a"), col("v")).otherwise(0L)).as("sb"))
    sums.join(broadcast(cnt), "label")
      .withColumn("m", expr("(sa div na) - (sb div nb)"))
      .groupBy(col("label"))
      .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
        sum(col("m") * col("m")).as("drift_sq"),
        max(abs(col("m"))).as("max_dim_shift"))
  }

  /** Shared exact-integer centroid assignment (the [[semanticDedup]]
    * contract): centroids are the `k` lowest-id nonzero vectors, argmin
    * by exact L2² with ties to the lowest centroid_id, evaluated map-side
    * against ONE broadcast centroid row.
    *
    * @return (vec_id, q, n2, centroid_id) per nonzero vector
    */
  private def assignExactL2(emb: DataFrame, k: Int): DataFrame = {
    val q = emb.select(col("vec_id"), quantize(col("embedding")).as("q"))
      .withColumn("n2", qdot(col("q"), col("q")))
      .filter(col("n2") > 0L)
    val centsRow = q.filter(col("vec_id") < k)
      .select(struct(col("vec_id").as("centroid_id"), col("q").as("cq")).as("c"))
      .agg(sort_array(collect_list(col("c"))).as("cents"))
    // argmin by exact integer L2² — array_sort on (dist, centroid_id)
    // structs IS the tie-broken argmin, evaluated map-side per vector
    q.crossJoin(broadcast(centsRow))
      .withColumn("m", expr(
        """array_sort(transform(cents, c -> struct(
          |  aggregate(zip_with(q, c.cq, (a, b) -> (a - b) * (a - b)),
          |            0L, (acc, x) -> acc + x) AS dist,
          |  c.centroid_id AS centroid_id)))[0]""".stripMargin))
      .select(col("vec_id"), col("q"), col("n2"),
        col("m.centroid_id").as("centroid_id"))
  }

  /** Embedding-space cluster purity: assign every vector to its nearest
    * centroid (the [[semanticDedup]] exact-L2² contract) and measure how
    * well clusters align with the LABEL column — majority label and its
    * exact integer share, plus Gini impurity (n² − Σc²)/n² (q128's
    * log-free entropy stand-in). Low purity means the embedding space
    * does not separate the labels — the health check before trusting
    * embedding clusters for semantic dedup, sampling, or retrieval
    * bucketing.
    *
    * Scale shape: map-side assignment (one broadcast centroid row), one
    * (centroid, label) aggregation, label-grain window argmax per
    * centroid — output is centroid-cardinality.
    *
    * @return centroid_id, n_vecs, majority_label, majority_n,
    *         majority_pct, impurity
    */
  def clusterPurity(emb: DataFrame, labelCol: Column,
                    k: Int = 8): DataFrame = {
    val labels = emb.select(col("vec_id"),
      labelCol.cast("long").as("label"))
    val cl = assignExactL2(emb, k)
      .join(labels, "vec_id")
      .groupBy(col("centroid_id"), col("label"))
      .agg(count(lit(1)).as("c"))
    val wTop = Window.partitionBy(col("centroid_id"))
      .orderBy(col("c").desc, col("label"))
    cl.withColumn("rk", row_number().over(wTop))
      .groupBy(col("centroid_id"))
      .agg(sum(col("c")).as("n_vecs"),
        min(when(col("rk") === 1, col("label"))).as("majority_label"),
        min(when(col("rk") === 1, col("c"))).as("majority_n"),
        sum(col("c") * col("c")).as("sum_sq"))
      .select(col("centroid_id"), col("n_vecs"), col("majority_label"),
        col("majority_n"),
        expr("majority_n * 100 div n_vecs").as("majority_pct"),
        ((col("n_vecs") * col("n_vecs") - col("sum_sq")).cast("double") /
          (col("n_vecs") * col("n_vecs")).cast("double")).as("impurity"))
  }
}
