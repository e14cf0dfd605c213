package graft

import org.apache.spark.sql.functions._

/** Round-13 perceptual-dedup wave: dHash over the deterministic text
  * raster (oracle-checkable twin of the real-image path in
  * MultimodalSpec). Fixtures are closed-form — expected band values are
  * recomputed by an independent in-test loop, not by trusting the
  * operator (the fimSplit lesson).
  */
class Round13OpsSpec extends SparkSuite {
  import spark.implicits._

  /** Independent reference dHash over the first-72-chars text raster. */
  private def refBands(text: String): Seq[Long] = {
    def px(i: Int): Long = text.charAt(i).toLong // 0-indexed
    (0 until 4).map { b =>
      (for (rr <- 0 until 2; c <- 0 until 8) yield {
        val r = 2 * b + rr
        if (px(r * 9 + c) < px(r * 9 + c + 1)) 1L << (rr * 8 + c) else 0L
      }).sum
    }
  }

  private def doc(id: Long, text: String) =
    (id, text, "en", "web", text.length.toLong)

  // a 72-char texture with every adjacent comparison decided
  private val baseText: String =
    (0 until 72).map(i => (33 + (i * 53 + (i * i) % 41) % 90).toChar).mkString

  test("dhashTextBands matches an independent per-char recompute; short docs excluded") {
    val mono = "z" * 72 // flat raster: no strict gradient anywhere → bands 0
    val docs = Seq(doc(1, baseText), doc(2, mono), doc(3, "short"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = ext.Dedup.dhashTextBands(docs)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> Seq(t._2, t._3, t._4, t._5)).toMap
    assert(r.keySet == Set(1L, 2L), "docs under one full raster are excluded")
    assert(r(1L) == refBands(baseText))
    assert(r(2L) == Seq(0L, 0L, 0L, 0L))
    assert(r(1L).forall(b => b >= 0 && b <= 0xffffL), "bands are 16-bit")
  }

  private def refHam(a: String, b: String): Long =
    refBands(a).zip(refBands(b))
      .map { case (x, y) => java.lang.Long.bitCount(x ^ y).toLong }.sum

  test("dhashNearDups: exact copy at 0, one-char edit near, mirror absent") {
    // one char changed mid-raster: only the two comparisons adjacent to
    // that cell can flip → hamming ≤ 2; the replacement char is chosen
    // (by the independent reference hash) to actually break a decided
    // comparison, so the near branch is provably live
    val edited = (33 to 122).map(c => baseText.updated(40, c.toChar))
      .find(t => refHam(baseText, t) >= 1 && refHam(baseText, t) <= 2).get
    val mirrored = baseText.grouped(9).map(_.reverse).mkString
    val docs = Seq(doc(1, baseText), doc(2, baseText), doc(3, edited),
      doc(4, mirrored))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val pairs = ext.Dedup.dhashNearDups(docs, maxDist = 4)
      .as[(Long, Long, Long)].collect()
      .map(p => (p._1, p._2) -> p._3).toMap
    assert(pairs((1L, 2L)) == 0L, "exact copy must be hamming 0")
    assert(pairs((1L, 3L)) >= 1L && pairs((1L, 3L)) <= 2L,
      s"one-char edit must be 1-2 bits, got ${pairs((1L, 3L))}")
    assert(!pairs.contains((1L, 4L)) && !pairs.contains((4L, 1L)),
      "row-mirrored raster must not pass the distance gate")
    // the candidate set itself is banded, never all-pairs: doc 4 flips
    // every decided bit, so it can only appear via a chance band collision
  }

  test("dhashClusters histogram covers every full-raster doc exactly once") {
    val edited = baseText.updated(40, '~')
    val far = baseText.grouped(9).map(_.reverse).mkString
    val docs = Seq(doc(1, baseText), doc(2, baseText), doc(3, edited),
      doc(4, far), doc(5, "tiny"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val hist = ext.Dedup.dhashClusters(docs, maxDist = 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    // {1,2,3} one cluster of 3; {4} singleton; 5 excluded (short)
    assert(hist == Set((3L, 1L, 3L, 2L), (1L, 1L, 1L, 0L)))
    assert(hist.toSeq.map(_._3).sum == 4L, "Σ n_docs = full-raster docs")
  }

  // ---------------------------------------------- train-run capstone

  private def corpus(rows: (Long, String, String)*) =
    rows.map { case (id, s, t) => (id, t, "en", s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("trainRunPrep: n_rows equals the quota exactly (apportionment identity)") {
    val docs = corpus(
      (1, "a", "w1 w2 w3"), (2, "a", "w1 w2"), (3, "a", "x y z w"),
      (4, "b", "lone doc"), (10, "b", "two tokens"),
      (20, "c", (1 to 40).map(i => s"t$i").mkString(" ")))
    val r = ext.Curation.trainRunPrep(docs, budgetNum = 3L, budgetDen = 1L,
      packBudget = 16)
      .select("source", "quota", "n_rows", "n_bins", "packed_tokens")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> t).toMap
    // Σ quota = 3 × corpus (budget identity); per source n_rows = quota
    assert(r.values.map(_._2).sum == 18)
    r.values.foreach(t => assert(t._2 == t._3,
      s"${t._1}: n_rows ${t._3} != quota ${t._2}"))
    // source c: one 40-token doc repeated; every pass overflows the
    // 16-token budget → one bin per pass
    assert(r("c")._4 == r("c")._2, "oversize docs pack one per bin")
    // token mass = Σ exposures·n_tokens: source b = 2 docs × (2+2 tokens),
    // quota decides the split; mass must equal n_rows-weighted sum
    val byDoc = Map("a" -> Seq(3L, 2L, 4L), "b" -> Seq(2L, 2L),
      "c" -> Seq(40L))
    r.foreach { case (s, t) =>
      val min = t._2 / byDoc(s).size * byDoc(s).sum
      assert(t._5 >= min, s"$s packed_tokens ${t._5} below full-pass mass")
    }
  }

  test("trainRunPrep: a quota-0 source still appears in the manifest with zeros") {
    // tiny budget (1/50 of corpus = 2 docs) against a 99-vs-1 split: the
    // largest remainder gives both quota slots to the big source, so the
    // small one gets quota 0 — the manifest must say so, not omit the row
    val docs = ((1L to 99L).map(i => doc(i, s"doc $i words here")) :+
      doc(1000L, "the lone doc"))
      .map { case (id, t, l, s0, n) =>
        (id, t, l, if (id == 1000L) "small" else "big", n) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = ext.Curation.trainRunPrep(docs, budgetNum = 1L, budgetDen = 50L)
      .select("source", "quota", "n_rows", "n_bins", "packed_tokens",
        "digest")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> t).toMap
    assert(r.keySet == Set("big", "small"), s"manifest must be total: $r")
    assert(r("small")._2 == 0L && r("small")._3 == 0L &&
      r("small")._4 == 0L && r("small")._5 == 0L && r("small")._6 == 0L,
      s"quota-0 source must read all-zeros: ${r("small")}")
    assert(r("big")._2 == 2L && r("big")._3 == 2L)
  }

  test("eceCalibration: NULL confidence stays NULL — never saturates to full confidence") {
    import org.apache.spark.sql.functions.{col, lit}
    val base = Seq(("g", java.lang.Long.valueOf(500000L), true),
      ("g", java.lang.Long.valueOf(50000L), false))
    val withNull = base :+ (("g", null.asInstanceOf[java.lang.Long], false))
    def run(rows: Seq[(String, java.lang.Long, Boolean)]) =
      ext.EvalMetrics.eceCalibration(rows.toDF("grp", "conf", "pos"),
        col("grp"), col("conf"), col("pos"))
        .select("ece_num", "worst_bin")
        .as[(Long, Long)].collect().head
    val (num0, wb0) = run(base)
    val (num1, wb1) = run(withNull)
    // the NULL row contributes nothing to the gap numerator and never
    // lands in the top bin (a bare greatest/least clamp would map NULL →
    // 1e6 → bin 9 with a 1e6 gap)
    assert(num1 == num0, s"NULL conf inflated ece_num: $num0 -> $num1")
    assert(wb1 == wb0 && wb1 != 9L)
  }

  test("trainRunPrep digest: swapping a pass between docs changes the manifest") {
    // the q222 pairing-swap lesson, extended to passes: the digest mixes
    // (doc identity, pass) NON-linearly per term, so giving doc A's extra
    // pass to doc B (same row count, same token mass) must change it.
    // budget 2× over 2 equal docs → both get exactly 2 passes; compare
    // against a corpus where the texts swap doc_ids (same multiset of
    // texts, different (doc,pass) pairing)
    val a = corpus((1, "s", "alpha beta"), (2, "s", "gamma delta"))
    val b = corpus((1, "s", "gamma delta"), (2, "s", "alpha beta"))
    def digest(df: org.apache.spark.sql.DataFrame): Long =
      ext.Curation.trainRunPrep(df, budgetNum = 2L, budgetDen = 1L)
        .select("digest").as[Long].head()
    assert(digest(a) != digest(b),
      "text↔doc_id swap must change the manifest digest")
    assert(digest(a) == digest(a), "digest is deterministic")
  }

  test("greedyCoverage: exact greedy order, min-id ties, early stop at zero gain") {
    // hand-computed 3-gram universe: A covers 6, C 4 disjoint, D/E 3 each
    // disjoint (equal gain → min doc_id first), B ⊂ A (gain 0 → never
    // picked, loop stops before exhausting k)
    val docs = Seq(
      (1L, "abcdefgh"), // abc bcd cde def efg fgh
      (2L, "xyzuvw"),   // xyz yzu zuv uvw
      (3L, "mnopq"),    // mno nop opq
      (4L, "rstuv"),    // rst stu tuv
      (5L, "abcde"))    // abc bcd cde — fully inside doc 1
      .toDF("doc_id", "text")
    val r = ext.Dedup.greedyCoverage(docs, k = 6, n = 3)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(r == Seq(
      (1L, 1L, 6L, 6L),   // A first (largest gain)
      (2L, 2L, 4L, 10L),  // C next
      (3L, 3L, 3L, 13L),  // D beats E on the min-id tie
      (4L, 4L, 3L, 16L)), // E
      s"greedy trace was $r") // B never appears; rounds 5-6 unused
  }

  test("chi2Drift: hand-computed per-bin terms; appearing/vanishing bins live") {
    import org.apache.spark.sql.functions.col
    // A: X×3, Y×1 (n1=4); B: X×1, Y×2, Z×1 (n2=4; Z appears, nothing
    // vanishes — c1=0 branch exercised via Z)
    val a = Seq("X", "X", "X", "Y").toDF("bin0")
    val b = Seq("X", "Y", "Y", "Z").toDF("bin0")
    val r = ext.Curation.chi2Drift(a, b, col("bin0"))
      .as[(String, Long, Long, Long, Long, Double)].collect()
      .map(t => t._1 -> t).toMap
    // X: (4·3−4·1)²=64, den 4·4·4=64 → 1.0
    assert(r("X") == (("X", 3L, 1L, 64L, 64L, 1.0)))
    // Y: (4·1−4·2)²=16, den 4·4·3=48 → 1/3
    assert(r("Y")._4 == 16L && r("Y")._5 == 48L &&
      r("Y")._6 == 16.0 / 48.0)
    // Z: c1=0 → (0−4·1)²=16, den 4·4·1=16 → 1.0
    assert(r("Z") == (("Z", 0L, 1L, 16L, 16L, 1.0)))
    // identical snapshots → every term exactly 0
    val zero = ext.Curation.chi2Drift(a, a, col("bin0"))
      .as[(String, Long, Long, Long, Long, Double)].collect()
    assert(zero.forall(t => t._4 == 0L && t._6 == 0.0))
  }

  test("q252 plan: band join is an equi-join, never a product") {
    import org.apache.spark.sql.execution.ExplainMode
    val p = SparkEntry.queries("q252_dhash_neardup")(spark, sf)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"dHash candidates must come from the band equi-join:\n$p")
  }

  test("dhash keeper mapping keeps the longest text (q78 policy on the dHash graph)") {
    val edited = baseText.updated(40, '~')
    val docs = Seq(
      doc(1, baseText), doc(2, baseText + " longer tail"), doc(3, edited),
      doc(4, baseText.grouped(9).map(_.reverse).mkString))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = ext.Dedup.canonicalMapping(
      ext.Dedup.dhashNearDups(docs, maxDist = 4).select("doc_a", "doc_b"),
      docs)
      .select("doc_id", "keep_doc", "is_kept", "group_size")
      .as[(Long, Long, Boolean, Long)].collect()
      .map(t => t._1 -> t).toMap
    // {1,2,3} cluster; keeper = 2 (longest text); 4 not in any pair
    assert(r.keySet == Set(1L, 2L, 3L))
    assert(r.values.forall(_._2 == 2L), "keeper must be the longest text")
    assert(r(2L)._3 && !r(1L)._3 && !r(3L)._3)
    assert(r.values.forall(_._4 == 3L))
  }

  test("embedDedupClusters histogram covers every embedding row exactly once") {
    // 4 vectors: two identical (cos 1), one opposite (cos -1, never a
    // pair), one zero-norm (can pair with nothing — singleton by
    // construction, not dropped)
    val v = Array.fill(64)(0.5f)
    val docs = Seq(
      (1L, v, "a"), (2L, v, "a"),
      (3L, v.map(-_), "b"), (4L, Array.fill(64)(0f), "z"))
      .toDF("vec_id", "embedding", "label")
    val hist = ext.Similarity.embedDedupClusters(docs, dim = 64,
      minCos = 0.9)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(hist == Set((2L, 1L, 2L, 1L), (1L, 2L, 2L, 0L)),
      s"got $hist")
    assert(hist.toSeq.map(_._3).sum == 4L, "Σ n_vecs = all embedding rows")
  }

  test("q256/q259 plans: bucket/band joins stay equi-joins, never products") {
    import org.apache.spark.sql.execution.ExplainMode
    Seq("q256_embed_dedup_clusters", "q259_dhash_gate").foreach { q =>
      val p = SparkEntry.queries(q)(spark, sf)
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(!p.contains("CartesianProduct"),
        s"$q degenerated to all-pairs:\n$p")
    }
  }

  test("q254 plan: quota frame broadcasts back; no product; packing stays mapPartitions") {
    import org.apache.spark.sql.execution.ExplainMode
    val df = SparkEntry.queries("q254_train_run_prep")(spark, sf)
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct"), s"capstone grew a product:\n$p")
    assert(p.contains("BroadcastExchange"),
      s"source-grain quota frame must broadcast, never shuffle the corpus " +
        s"against it:\n$p")
    assert(p.contains("MapPartitions") || p.contains("mapPartitions") ||
      p.contains("SerializeFromObject"),
      s"greedy packing must run as the typed per-partition scan:\n$p")
  }
}
