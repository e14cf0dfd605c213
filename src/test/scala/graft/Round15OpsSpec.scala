package graft

import org.apache.spark.sql.functions._

/** Round-15 wave: the cross-modal dedup capstone (q260) and the
  * driver-oracled real-image dHash front (q261). Expected values are
  * recomputed by independent in-test loops, never by trusting the
  * operator (the fimSplit lesson).
  */
class Round15OpsSpec extends SparkSuite {
  import spark.implicits._

  private val rasterP: String =
    (0 until 72).map(i => (33 + (i * 53 + (i * i) % 41) % 90).toChar).mkString
  private val rasterQ: String = rasterP.grouped(9).map(_.reverse).mkString

  // ---- q260 cross-modal capstone ------------------------------------------

  test("crossModalKeeper: a chain crossing modalities merges into one component with exact masks") {
    // 0 ~ 1 by TEXT (identical bodies → also identical rasters: mask text+image)
    // 1 ~ 2 by IMAGE only (shared 72-char raster, disjoint long tails kill jaccard)
    // 2 ~ 3 by EMBEDDING only (identical vectors; raster disjoint)
    val tailA = (0 until 100).map(i => ('a' + i % 26).toChar).mkString
    val tailB = (0 until 100).map(i => ('A' + (i * 7) % 26).toChar).mkString
    val docs = Seq(
      (0L, rasterP + tailA), (1L, rasterP + tailA),
      (2L, rasterP + tailB + tailB), // longest → the component keeper
      (3L, rasterQ + tailB))
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    def basis(i: Int): Array[Float] =
      Array.tabulate(64)(j => if (j == i) 1f else 0f)
    val emb = Seq((0L, basis(0)), (1L, basis(1)), (2L, basis(2)),
      (3L, basis(2))).toDF("vec_id", "embedding")

    // preconditions, asserted so the fixture can't silently degrade
    // (n = 5, the capstone's shingle width):
    val tj = ext.Dedup.minhashNearDups(docs, 16, 4, 5, 0.55)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    assert(tj == Set((0L, 1L)), s"text graph must be exactly 0-1, got $tj")
    val ij = ext.Dedup.dhashNearDups(docs, 16)
      .as[(Long, Long, Long)].collect().map(p => (p._1, p._2)).toSet
    assert(ij == Set((0L, 1L), (0L, 2L), (1L, 2L)),
      s"image graph must be the shared-raster triangle, got $ij")
    val ej = ext.Similarity.lshNearPairs(emb, 64, 8, 0.15)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    assert(ej == Set((2L, 3L)), s"embedding graph must be exactly 2-3, got $ej")

    val r = ext.Dedup.crossModalKeeper(docs, emb, minJaccard = 0.55)
      .select("doc_id", "comp", "group_size", "keep_doc", "is_kept",
        "modality_mask")
      .as[(Long, Long, Long, Long, Boolean, Long)].collect()
      .map(t => t._1 -> t).toMap
    assert(r.keySet == Set(0L, 1L, 2L, 3L))
    assert(r.values.forall(t => t._2 == 0L && t._3 == 4L),
      s"all four docs must close into ONE component: $r")
    assert(r.values.forall(_._4 == 2L), "keeper must be the longest text")
    assert(r(2L)._5 && !r(0L)._5)
    // masks: 0,1 in text(1)+image(2); 2 in image(2)+embedding(4); 3 embedding
    assert(r(0L)._6 == 3L && r(1L)._6 == 3L, s"got ${r(0L)._6}/${r(1L)._6}")
    assert(r(2L)._6 == 6L && r(3L)._6 == 4L, s"got ${r(2L)._6}/${r(3L)._6}")
  }

  test("crossModalKeeper: no cross-modal chain → plain per-modality groups survive unchanged") {
    val docs = Seq((0L, rasterP + "x"), (1L, rasterP + "x"), (2L, rasterQ))
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val emb = Seq((0L, Array.tabulate(64)(j => if (j == 0) 1f else 0f)),
      (1L, Array.tabulate(64)(j => if (j == 1) 1f else 0f)),
      (2L, Array.tabulate(64)(j => if (j == 2) 1f else 0f)))
      .toDF("vec_id", "embedding")
    val r = ext.Dedup.crossModalKeeper(docs, emb, minJaccard = 0.55)
      .select("doc_id", "comp", "modality_mask")
      .as[(Long, Long, Long)].collect().map(t => t._1 -> t).toMap
    assert(r.keySet == Set(0L, 1L), "doc 2 is in no graph and must be absent")
    assert(r(0L)._2 == 0L && r(1L)._2 == 0L)
    assert(r(0L)._3 == 3L && r(1L)._3 == 3L,
      "identical text implies both the text and image graphs")
  }

  // ---- q261 real-image dHash front ----------------------------------------

  /** Independent reference: band values from the 2×2-block codepoint sums
    * the PNG pixel rule guarantees (cell (r,c) of the 18×16 image sums
    * chars (2r)·18+2c, +1, (2r+1)·18+2c, +1, all mod 72).
    */
  private def refImageBands(text: String): Seq[Long] = {
    def cell(r: Int, c: Int): Long =
      Seq((2 * r) * 18 + 2 * c, (2 * r) * 18 + 2 * c + 1,
        (2 * r + 1) * 18 + 2 * c, (2 * r + 1) * 18 + 2 * c + 1)
        .map(i => text.charAt(i % 72).toLong).sum
    (0 until 4).map { b =>
      (for (rr <- 0 until 2; c <- 0 until 8) yield {
        val r = 2 * b + rr
        if (cell(r, c) < cell(r, c + 1)) 1L << (rr * 8 + c) else 0L
      }).sum
    }
  }

  test("textPngs → imageDHash: decoded-raster bands equal the 2x2-block prediction") {
    val docs = Seq((1L, rasterP), (2L, rasterQ), (3L, "too short"))
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val bands = ext.Multimodal.imageDHash(ext.Multimodal.textPngs(docs))
      .as[(Long, Boolean, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> t).toMap
    assert(bands.keySet == Set(1L, 2L), "sub-raster docs never get a PNG")
    assert(bands.values.forall(_._2), "engine-written PNGs must decode ok")
    assert(Seq(bands(1L)._3, bands(1L)._4, bands(1L)._5, bands(1L)._6)
      == refImageBands(rasterP))
    assert(Seq(bands(2L)._3, bands(2L)._4, bands(2L)._5, bands(2L)._6)
      == refImageBands(rasterQ))
  }

  test("textPngs: a raster-prefix codepoint above 0xff fails loudly " +
    "(single-byte envelope, never a silently masked pixel)") {
    val bad = ("Δ" + rasterP.drop(1)) // Δ in the 72-char raster prefix
    val docs = Seq((1L, bad, "en", "web", bad.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val e = intercept[org.apache.spark.SparkException] {
      ext.Multimodal.textPngs(docs).collect()
    }
    assert(e.getMessage.contains("0xff") ||
      Option(e.getCause).exists(_.getMessage.contains("0xff")),
      s"expected the envelope failure, got: ${e.getMessage}")
    // and a >0xff char BEYOND the raster prefix is irrelevant (only the
    // first 72 chars are rasterized)
    val okTail = rasterP + "Δ"
    val fine = Seq((2L, okTail, "en", "web", okTail.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(ext.Multimodal.textPngs(fine).count() == 1)
  }

  test("imageNearDups end-to-end: exact copy at 0, distinct rasters gated") {
    val docs = Seq((1L, rasterP), (2L, rasterP), (3L, rasterQ))
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val pairs = ext.Multimodal.imageNearDups(
      ext.Multimodal.textPngs(docs), maxDist = 4)
      .as[(Long, Long, Long)].collect().map(p => (p._1, p._2) -> p._3).toMap
    assert(pairs.get((1L, 2L)).contains(0L), "exact copy must be hamming 0")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)),
      "row-mirrored raster must not pass the gate")
  }

  test("q260/q261 plans: closure edges and image band join stay products-free") {
    import org.apache.spark.sql.execution.ExplainMode
    def explain(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    // q260's CC runs driver-side union-find on tiny graphs, so check the
    // EDGE construction instead (the registered pair producers)
    ext.ExactCollapse.recordKeyed = true
    ext.ExactCollapse.recentKeyed.set(Nil)
    // try/finally (the PlanSpec pattern): a throw inside the recorded
    // section must not leave the JVM-global hook enabled
    val (p, keyedPlans) =
      try {
        val p0 =
          explain(SparkEntry.queries("q261_image_dhash_neardup")(spark, sf))
        // the collapse is PINNED since round 16 (per-branch rescan fix):
        // the rep window lives in the recorded pre-pin frame, the consumer
        // plan reads the materialized scan (the PlanSpec near-dup guard)
        (p0, ext.ExactCollapse.recentKeyed.get().map(explain))
      } finally {
        ext.ExactCollapse.recordKeyed = false
        ext.ExactCollapse.recentKeyed.set(Nil)
      }
    assert(!p.contains("CartesianProduct"),
      s"image band join degenerated to all-pairs:\n$p")
    assert(keyedPlans.exists(kp =>
        """\(\d+\) Window""".r.findAllIn(kp).nonEmpty &&
          kp.contains("min(doc_id")), // imageNearDups renames media_id→doc_id
      s"image front lost the exact-collapse rep window:\n${keyedPlans.mkString("\n---\n")}")
    assert(p.contains("Scan ExistingRDD") || p.contains("LogicalRDD"),
      s"image band join does not consume the pinned collapsed frame:\n$p")
  }
}
