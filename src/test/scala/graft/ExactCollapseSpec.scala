package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact-collapse integration proof (the round-14 verdict's #1): every
  * collapsed near-dup operator must reproduce its uncollapsed form
  * BIT-FOR-BIT on a multiplicity-heavy fixture — collapsing identical
  * items to one representative before the band/bucket join is a pure
  * performance rewrite, never a semantics change. Connectivity consumers
  * (clusters, keepers, dedup groups) ride the star-edge list instead of
  * expanded pairs; those must yield the same connected components.
  */
class ExactCollapseSpec extends SparkSuite {
  import spark.implicits._

  // ---- fixtures: heavy exact multiplicity on every modality ------------

  private val baseText: String =
    (0 until 72).map(i => (33 + (i * 53 + (i * i) % 41) % 90).toChar).mkString
  private val editedText: String = baseText.updated(40, '~')
  private val mirrorText: String = baseText.grouped(9).map(_.reverse).mkString

  /** 4 copies of base, 3 of edited, 2 of mirror, 1 unique, 2 short copies:
    * within-group, cross-group near, cross-group far and below-raster
    * branches all live at once.
    */
  private def dupDocs: DataFrame =
    (Seq(1L, 2L, 3L, 4L).map(i => (i, baseText)) ++
      Seq(5L, 6L, 7L).map(i => (i, editedText)) ++
      Seq(8L, 9L).map(i => (i, mirrorText)) ++
      Seq((10L, baseText.reverse)) ++
      Seq(11L, 12L).map(i => (i, "ab")))
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  private def assertBitEqual(collapsed: DataFrame, reference: DataFrame,
                             what: String): Unit = {
    assert(collapsed.columns.toSeq == reference.columns.toSeq,
      s"$what: schema drift")
    val (c, r) = (rows(collapsed), rows(reference))
    assert(c == r, s"$what: collapsed≠uncollapsed\n only collapsed: " +
      s"${(c -- r).take(5)}\n only reference: ${(r -- c).take(5)}")
    // multisets, not just sets: neither path may duplicate a pair
    assert(collapsed.count() == reference.count(), s"$what: row-count drift")
  }

  private def components(edges: DataFrame): Set[(Long, Long)] =
    ext.Components.connectedComponents(edges)
      .as[(Long, Long)].collect().toSet

  // ---- dHash ------------------------------------------------------------

  test("dhashNearDups: collapsed output is bit-identical to uncollapsed") {
    assertBitEqual(
      ext.Dedup.dhashNearDups(dupDocs, maxDist = 4),
      ext.Dedup.dhashNearDupsDistinct(dupDocs, maxDist = 4),
      "dhashNearDups")
  }

  test("dhashNearDupEdges: same components as the expanded pair list") {
    val viaEdges = components(ext.Dedup.dhashNearDupEdges(dupDocs, 4))
    val viaPairs = components(
      ext.Dedup.dhashNearDups(dupDocs, 4).select("doc_a", "doc_b"))
    assert(viaEdges == viaPairs)
    // and the keeper mapping built on edges equals the pair-built one
    assertBitEqual(
      ext.Dedup.canonicalMapping(
        ext.Dedup.dhashNearDupEdges(dupDocs, 4), dupDocs),
      ext.Dedup.canonicalMapping(
        ext.Dedup.dhashNearDups(dupDocs, 4).select("doc_a", "doc_b"),
        dupDocs),
      "dhash keeper")
  }

  test("dhashNewVsCorpus: collapsed gate bit-identical to uncollapsed") {
    val newDocs = dupDocs.filter(col("doc_id") % 3 === 0)
    val corpus = dupDocs.filter(col("doc_id") % 3 =!= 0)
    assertBitEqual(
      ext.Dedup.dhashNewVsCorpus(newDocs, corpus, maxDist = 4),
      ext.Dedup.dhashNewVsCorpusDistinct(newDocs, corpus, maxDist = 4),
      "dhashNewVsCorpus")
  }

  // ---- MinHash ----------------------------------------------------------

  test("minhashNearDups: collapsed output is bit-identical to uncollapsed") {
    assertBitEqual(
      ext.Dedup.minhashNearDups(dupDocs, 16, 4, 3, 0.5),
      ext.Dedup.minhashNearDupsDistinct(dupDocs, 16, 4, 3, 0.5),
      "minhashNearDups")
  }

  test("minhashNearDupEdges: same components; short docs never edge") {
    val viaEdges = components(
      ext.Dedup.minhashNearDupEdges(dupDocs, 16, 4, 3, 0.5))
    val viaPairs = components(
      ext.Dedup.minhashNearDups(dupDocs, 16, 4, 3, 0.5)
        .select("doc_a", "doc_b"))
    assert(viaEdges == viaPairs)
    val nodes = viaEdges.map(_._1)
    assert(!nodes.contains(11L) && !nodes.contains(12L),
      "sub-shingle docs have no signature and must not edge, even as copies")
  }

  test("minhashNewVsCorpus: collapsed gate bit-identical to uncollapsed") {
    val newDocs = dupDocs.filter(col("doc_id") % 3 === 0)
    val corpus = dupDocs.filter(col("doc_id") % 3 =!= 0)
    assertBitEqual(
      ext.Dedup.minhashNewVsCorpus(newDocs, corpus, 16, 4, 3, 0.5),
      ext.Dedup.minhashNewVsCorpusDistinct(newDocs, corpus, 16, 4, 3, 0.5),
      "minhashNewVsCorpus")
  }

  test("ngramJaccardPairs: collapsed output is bit-identical to uncollapsed (orientation-sensitive sizes)") {
    // interleaved group id ranges force the least/greatest normalization
    // to FLIP some member pairs relative to their rep pair — the case
    // where naively expanded size_a/size_b would attach to the wrong side
    val t1 = "the quick brown fox jumps over the lazy dog"
    val t2 = "the quick brown fox jumps over the lazy cat pack"
    val docs = Seq((1L, t1), (100L, t1), (2L, t2), (3L, t2), (50L, "zq"))
      .toDF("doc_id", "text")
    assertBitEqual(
      ext.Dedup.ngramJaccardPairs(docs, 3, 0.3),
      ext.Dedup.ngramJaccardPairsDistinct(docs, 3, 0.3),
      "ngramJaccardPairs")
  }

  test("containmentPairs: collapsed output is bit-identical to uncollapsed (ordered, both directions)") {
    val short = "abcdefghij"
    val long = "XX" + short * 3 + "YY" // short's shingles fully contained
    val docs = Seq((1L, short), (100L, short), (2L, long), (3L, long),
      (50L, "zq")).toDF("doc_id", "text")
    assertBitEqual(
      ext.Dedup.containmentPairs(docs, 3, 0.8),
      ext.Dedup.containmentPairsDistinct(docs, 3, 0.8),
      "containmentPairs")
    // both orientations of the within-group clique are present
    val r = ext.Dedup.containmentPairs(docs, 3, 0.8)
      .select("inner_doc", "outer_doc")
      .as[(Long, Long)].collect().toSet
    assert(r.contains((1L, 100L)) && r.contains((100L, 1L)))
  }

  test("editNearDups: equals the pre-collapse pipeline on a duplicate-free corpus") {
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 40)
    // precondition: the slice has no exact-duplicate texts
    assert(docs.groupBy("text").count().filter(col("count") > 1).isEmpty)
    assertBitEqual(
      ext.Dedup.editNearDups(docs),
      ext.Dedup.editNearDupsBlocked(docs.select(col("doc_id"), col("text")),
        12, 6, 32, 64)._1,
      "editNearDups (distinct corpus)")
  }

  test("editNearDups: exact copies pair at 0 and no longer evict distinct candidates from the cap") {
    val t = "the quick brown fox jumps over the lazy dog again and again"
    val u = t.dropRight(3) + "cat" // distance 3, same length bucket + prefix
    val docs = ((1L to 6L).map(i => (i, t)) :+ (9L, u))
      .toDF("doc_id", "text")
    val r = ext.Dedup.editNearDups(docs, maxDist = 12, prefixChars = 6,
      lenBucket = 32, blockCap = 4)
      .as[(Long, Long, Int, Boolean)].collect()
      .map(p => (p._1, p._2) -> ((p._3, p._4))).toMap
    // all 15 within pairs at distance 0
    for (a <- 1L to 6L; b <- (a + 1) to 6L)
      assert(r.get((a, b)).contains((0, false)), s"missing copy pair $a-$b")
    // the block holds 2 DISTINCT texts (under the cap of 4): u pairs with
    // EVERY copy — the uncollapsed pipeline would have capped copies 5, 6
    // out of the block and flagged the rest truncated
    for (a <- 1L to 6L)
      assert(r.get((a, 9L)).contains((3, false)), s"missing cross pair $a-9")
    assert(r.size == 21)
    // and the pre-collapse reference really does lose pairs on this input
    // (documents the upgrade, pins that the fixture exercises it)
    val old = ext.Dedup.editNearDupsBlocked(docs, 12, 6, 32, 4)._1
      .as[(Long, Long, Int, Boolean)].collect()
    assert(old.length < 21 && old.forall(_._4),
      s"pre-collapse pipeline should cap + flag here, got ${old.toSeq}")
  }

  // ---- embeddings ---------------------------------------------------------

  /** 3 copies of v, 2 of a perturbed near-neighbor, 1 far (negated), 1
    * zero-norm (must stay excluded on both paths).
    */
  private def dupEmb: DataFrame = {
    val v = Array.tabulate(64)(i => 0.3f + 0.01f * (i % 7))
    val near = v.clone(); near(0) = near(0) + 0.02f
    (Seq(1L, 2L, 3L).map(i => (i, v)) ++
      Seq(4L, 5L).map(i => (i, near)) ++
      Seq((6L, v.map(-_)), (7L, Array.fill(64)(0f))))
      .toDF("vec_id", "embedding")
  }

  test("lshNearPairs: collapsed output is bit-identical to uncollapsed") {
    assertBitEqual(
      ext.Similarity.lshNearPairs(dupEmb, dim = 64, bits = 8, minCos = 0.9),
      ext.Similarity.lshNearPairsDistinct(dupEmb, 64, 8, 0.9),
      "lshNearPairs")
  }

  test("lshNearPairEdges: same components as the expanded pair list") {
    val viaEdges = components(
      ext.Similarity.lshNearPairEdges(dupEmb, 64, 8, 0.9))
    val viaPairs = components(
      ext.Similarity.lshNearPairs(dupEmb, 64, 8, 0.9)
        .select("vec_a", "vec_b"))
    assert(viaEdges == viaPairs)
    assert(!viaEdges.map(_._1).contains(7L), "zero-norm vector never pairs")
  }

  test("cosineNearDups: collapsed output is bit-identical to uncollapsed") {
    assertBitEqual(
      ext.Similarity.cosineNearDups(dupEmb, minCos = 0.5),
      ext.Similarity.cosineNearDupsDistinct(dupEmb, minCos = 0.5),
      "cosineNearDups")
  }

  test("semanticDedup: collapsed output is bit-identical to uncollapsed") {
    // ids ≥ k so duplicates never shift the centroid sample; 3 copies of
    // one vector + 2 of a near one + 1 far + 1 zero-norm (excluded)
    val v = Array.tabulate(64)(i => 0.3f + 0.01f * (i % 7))
    val near = v.clone(); near(0) = near(0) + 0.02f
    val base = (0 until 8).map(i =>
      (i.toLong, Array.tabulate(64)(j => if (j == i) 1f else 0.1f)))
    val emb = (base ++ Seq(10L, 11L, 12L).map(i => (i, v)) ++
      Seq(13L, 14L).map(i => (i, near)) ++
      Seq((15L, v.map(-_)), (16L, Array.fill(64)(0f))))
      .toDF("vec_id", "embedding")
    assertBitEqual(
      ext.Similarity.semanticDedup(emb, k = 8, thrNum = 3, thrDen = 10),
      ext.Similarity.semanticDedupDistinct(emb, 8, 3, 10),
      "semanticDedup")
    // group members see one dup_of (the global min similar id, ≤ their
    // rep 10 — here a base vector also clears the 0.3 threshold)
    val r = ext.Similarity.semanticDedup(emb, 8, 3, 10)
      .filter(col("vec_id").isin(11L, 12L))
      .select("dup_of").as[Long].collect().toSet
    assert(r.size == 1 && r.head <= 10L,
      s"group members must share a dup_of ≤ their rep, got $r")
  }

  test("embedDedupClusters histogram unchanged by the edge-list rewrite") {
    val hist = ext.Similarity.embedDedupClusters(dupEmb, dim = 64,
      bits = 8, minCos = 0.9)
      .as[(Long, Long, Long, Long)].collect().toSet
    // {1,2,3,4,5} one cluster (v≈near), {6} and {7} singletons
    assert(hist == Set((5L, 1L, 5L, 4L), (1L, 2L, 2L, 0L)), s"got $hist")
  }

  // ---- helper-level contracts -------------------------------------------

  test("withRep fails fast when the rep column already exists") {
    val df = Seq((1L, "a")).toDF("id", "rep")
    val e = intercept[IllegalArgumentException](
      ext.ExactCollapse.withRep(df, "id", Seq(col("rep"))))
    assert(e.getMessage.contains("rep"))
  }

  test("expandUnordered drops degenerate self-pairs instead of fabricating (a,a)") {
    val members = Seq((1L, 1L), (1L, 2L)).toDF("rep", "id")
    val selfPair = Seq((1L, 1L, 0L)).toDF("a", "b", "payload")
    assert(ext.ExactCollapse.expandUnordered(
      selfPair, members, "a", "b", Seq("payload")).isEmpty,
      "a rep self-pair must expand to nothing (within pairs own that path)")
  }
}
