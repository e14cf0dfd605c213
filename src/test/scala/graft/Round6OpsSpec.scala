package graft

import org.apache.spark.sql.functions._

/** Round-6 operator wave: edit-distance near-dup (q151), NDCG@k (q152),
  * boilerplate prefixes (q153), KMV set algebra (q154), split leakage
  * (q155).
  */
class Round6OpsSpec extends SparkSuite {
  import spark.implicits._

  test("editNearDups: near pair found, far pair dropped, cross-bucket pair survives") {
    val base = "the quick brown fox jumps over the lazy dog " * 3 // 132 chars
    val docs = Seq(
      (1L, base),
      (2L, base.dropRight(4) + "cat "),           // few edits from 1
      (3L, "the quick " + ("x " * 80)),           // same prefix, far away
      (4L, base + "tail of twenty chars"),        // +20 chars: next len bucket
      (5L, "completely different opening text here")).toDF("doc_id", "text")
    val rows = ext.Dedup.editNearDups(docs, maxDist = 25, prefixChars = 6,
        lenBucket = 64)
      .as[(Long, Long, Int, Boolean)].collect()
    val r = rows.map(x => (x._1, x._2) -> x._3).toMap
    assert(r.contains((1L, 2L)) && r((1L, 2L)) <= 4, r.toString)
    // the cross-bucket pair (1,4): length differs by 20 → adjacent bucket
    assert(r.contains((1L, 4L)) && r((1L, 4L)) === 20, r.toString)
    assert(!r.keySet.exists(p => p._1 == 3L || p._2 == 3L), r.toString)
    // no block here is anywhere near the cap → nothing flags truncated
    assert(rows.forall(!_._4), rows.mkString(","))
  }

  test("editNearDups: blockCap bounds in-block pairs and AUDITS the cut " +
    "(truncated column), small blocks stay unflagged") {
    // one skewed block: 5 same-length same-prefix docs; cap 3 keeps docs
    // 1..3 → C(3,2)=3 pairs, every one flagged. A clean 2-doc block
    // (docs 10,11) is untouched and unflagged.
    val fat = (1L to 5L).map(i => (i, "aaaaaa block body text " + i))
    val thin = Seq((10L, "zzzzzz other body text x"),
      (11L, "zzzzzz other body text y"))
    val docs = (fat ++ thin).toDF("doc_id", "text")
    val rows = ext.Dedup.editNearDups(docs, maxDist = 12, prefixChars = 6,
        lenBucket = 32, blockCap = 3)
      .as[(Long, Long, Int, Boolean)].collect()
    val fatPairs = rows.filter(_._1 <= 5L)
    assert(fatPairs.map(x => (x._1, x._2)).toSet ===
      Set((1L, 2L), (1L, 3L), (2L, 3L)), rows.mkString(","))
    assert(fatPairs.forall(_._4), "over-cap block pairs must flag truncated")
    val thinPairs = rows.filter(_._1 == 10L)
    assert(thinPairs.map(x => (x._1, x._2)).toSeq === Seq((10L, 11L)))
    assert(thinPairs.forall(!_._4), "clean block must not flag truncated")
  }

  test("ndcgAtK: all-relevant retrieval scores exactly 1; weight table is frozen decimals") {
    // doc 3 is the query (3 % 97 == 3); all docs share lang+source → every
    // retrieved doc has rel 2, so DCG = IDCG exactly (decimal arithmetic)
    val docs = Seq(
      (3L, "alpha beta gamma delta epsilon", "en", "srcA"),
      (10L, "alpha beta zeta", "en", "srcA"),
      (11L, "gamma delta eta", "en", "srcA"),
      (12L, "epsilon alpha theta", "en", "srcA"))
      .toDF("doc_id", "text", "lang", "source")
    val r = ext.Retrieval.ndcgAtK(docs, k = 10)
      .as[(Long, Long, Long, Long, Long, Long, Double)]
      .collect()
    assert(r.length === 1 && r.head._1 === 3L)
    val (_, nRet, n2, _, dcgE9, idcgE9, ndcg) = r.head
    assert(n2 === 3L && nRet === 3L)
    assert(dcgE9 === idcgE9 && ndcg === 1.0, r.head.toString)
    // the discount table really is the frozen 9-dp literal set
    val w = ext.Retrieval.ndcgWeights(3)
    assert(w.head._2 === java.math.BigDecimal.valueOf(1000000000L, 9))
    assert(w(1)._2 === java.math.BigDecimal.valueOf(630929754L, 9)) // 1/log2(3)
  }

  test("ndcgAtK: a low-relevance doc outranked by relevant ones still caps ndcg below 1") {
    // doc 3 queries; doc 20 (bigger overlap, wrong lang → rel 0) outranks
    // doc 21 (smaller overlap, rel 2) → 0 < ndcg < 1. Tokens are chosen so
    // nothing hits the 79% df cap (no term is in all three docs).
    val docs = Seq(
      (3L, "alpha beta gamma delta epsilon", "en", "srcA"),
      (20L, "beta gamma delta zeta omega", "fr", "srcB"),
      (21L, "epsilon alpha theta iota", "en", "srcA"))
      .toDF("doc_id", "text", "lang", "source")
    val r = ext.Retrieval.ndcgAtK(docs, k = 10)
      .as[(Long, Long, Long, Long, Long, Long, Double)]
      .collect()
    assert(r.length === 1)
    assert(r.head._7 > 0.0 && r.head._7 < 1.0, r.head.toString)
  }

  test("boilerplatePrefixes: families need minDocs; multi-source chrome is visible") {
    val docs = Seq(
      (1L, "terms of service apply here", "srcA"),
      (2L, "terms of service for this site", "srcB"),
      (3L, "terms of service again", "srcA"),
      (4L, "unique document body", "srcA"),
      (5L, "", "srcB")).toDF("doc_id", "text", "source")
    val r = ext.Curation.boilerplatePrefixes(docs)
      .as[(String, Long, Long, Long)].collect()
    assert(r.toSeq === Seq(("terms of service", 3L, 2L, 1L)))
  }

  test("kmvSetAlgebra: exact fields, disjoint pair has zero shared, identical pair estimates agree") {
    val evts = (
      (1 to 40).map(u => (u.toLong, "a")) ++          // a: users 1..40
      (1 to 40).map(u => (u.toLong, "b")) ++          // b: identical to a
      (101 to 140).map(u => (u.toLong, "c"))          // c: disjoint
    ).zipWithIndex.map { case ((u, t), i) =>
      (i.toLong, 1000L * i, u, t, 0.0) }
      .toDF("event_id", "ts_us", "user_id", "event_type", "value")
      .withColumn("ts", col("ts_us") * 1000L).drop("ts_us")
    val r = ext.Sketches.kmvSetAlgebra(evts, k = 16)
      .collect().map(x => (x.getString(0), x.getString(1)) -> x).toMap
    val ab = r(("a", "b"))
    assert(ab.getLong(2) === 40L && ab.getLong(3) === 40L) // n_a, n_b
    assert(ab.getLong(4) === 40L && ab.getLong(5) === 40L) // exact u, i
    // identical sets: every merged-sketch hash is in both → shared = k
    assert(ab.getLong(6) === 16L && ab.getLong(8) === 16L) // k_used, shared
    assert(ab.getDouble(9) === ab.getDouble(10) * 16 / 16) // union = inter
    val ac = r(("a", "c"))
    assert(ac.getLong(5) === 0L && ac.getLong(8) === 0L)
    assert(ac.getDouble(10) === 0.0) // inter_est exactly 0
  }

  test("cupedReadout: zero pre-post covariance keeps means; perfect correlation removes pre-imbalance") {
    val Day = 86400L * 1000000
    // span days 0..3 → cut = 2. x = pre cents, y = post cents per user.
    // Users 1..4: (x, y) = (100, 300), (200, 400), (100, 300), (200, 400):
    // y = x + 200 exactly → θ = 1, and mean_adj removes ALL pre-period
    // imbalance: both variants' mean_adj = mean_all(x) + 20000 cents = 350.
    val rows = Seq(
      (1L, 0L, 1.0), (1L, 2L, 3.0),
      (2L, 0L, 2.0), (2L, 2L, 4.0),
      (3L, 1L, 1.0), (3L, 3L, 3.0),
      (4L, 1L, 2.0), (4L, 3L, 4.0))
    val events = rows.zipWithIndex.map { case ((u, d, v), i) =>
      (i.toLong, u, d * Day, "purchase", v) }
      .toDF("event_id", "user_id", "ts_us", "event_type", "value")
      .withColumn("ts", col("ts_us") * 1000L).drop("ts_us")
    val r = ext.Sessions.cupedReadout(events)
      .as[(Long, Long, Long, Long, Double, Option[Double], Option[Double])]
      .collect().map(x => x._1 -> x).toMap
    // variant 0 = users 2,4 (x̄=200); variant 1 = users 1,3 (x̄=100)
    assert(r(0L)._5 === 4.0 * 100)               // mean_post variant 0
    assert(r(1L)._5 === 3.0 * 100)
    assert(r(0L)._6 === Some(1.0))               // θ = cov/var = 1
    assert(r(0L)._7 === Some(350.0) && r(1L)._7 === Some(350.0),
      s"CUPED must equalize the pre-balanced metric: $r")
  }

  test("mrrAtK: first relevant rank reciprocal; no-relevant query emits rr 0") {
    val docs = Seq(
      (3L, "alpha beta gamma delta epsilon", "en", "srcA"),
      (20L, "beta gamma delta zeta omega", "fr", "srcB"),   // rank 1, rel 0
      (21L, "epsilon alpha theta iota", "en", "srcA"))      // rank 2, rel 1
      .toDF("doc_id", "text", "lang", "source")
    val r = ext.Retrieval.mrrAtK(docs).as[(Long, Option[Long], Double)]
      .collect()
    assert(r.toSeq === Seq((3L, Some(2L), 0.5)))
    // all-foreign pool → no relevant doc in the top-k → rr = 0
    val docs2 = Seq(
      (3L, "alpha beta gamma", "en", "srcA"),
      (30L, "alpha beta zeta", "fr", "srcB"))
      .toDF("doc_id", "text", "lang", "source")
    val r2 = ext.Retrieval.mrrAtK(docs2).as[(Long, Option[Long], Double)]
      .collect()
    assert(r2.toSeq === Seq((3L, None, 0.0)))
  }

  test("lshQuality: found pairs are a verified subset of truth — precision 1, recall bounded") {
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 50)
    val Array(r) = ext.Dedup.lshQuality(docs)
      .as[(Long, Long, Long, Long, Double, Double)].collect()
    val (nTruth, nFound, nBoth, nMissed, recall, precision) = r
    assert(nTruth > 0, "corpus should contain near-dup pairs")
    assert(nBoth === nFound && precision === 1.0,
      s"verified candidates can never be false positives: $r")
    assert(nMissed === nTruth - nBoth && recall === nBoth.toDouble / nTruth)
    assert(recall > 0.5, s"banding should catch most 0.5+ pairs: $r")
  }

  test("snapshot diff: class counts reconcile with the simulated slices") {
    val orders = Tables.orders(spark, sf)
    val r = ops.Merge.q159SnapshotDiff(spark, sf)
      .as[(String, Long, Long, Long, Long, Double)].collect()
    val added = orders.filter(col("o_orderkey") % 10 === 0).count()
    val removed = orders.filter(col("o_orderkey") % 10 === 9).count()
    val changed = orders.filter(col("o_orderkey") % 7 === 0 &&
      col("o_orderkey") % 10 =!= 0 && col("o_orderkey") % 10 =!= 9).count()
    assert(r.map(_._2).sum === added)
    assert(r.map(_._3).sum === removed)
    assert(r.map(_._4).sum === changed)
    assert(r.map(x => x._2 + x._3 + x._4 + x._5).sum ===
      orders.select("o_orderkey").distinct().count())
    r.foreach { x =>
      assert(x._6 === (x._2 + x._3 + x._4).toDouble /
        (x._2 + x._3 + x._4 + x._5), x.toString) }
  }

  test("calibration: ten deciles cover all predictions; per-bin stats are exact ratios") {
    val part = Tables.part(spark, sf)
    val r = ops.SyntheticBoxes.calibration(part)
      .as[(Long, Long, Long, Long, Double, Double)].collect()
      .map(x => x._1 -> x).toMap
    assert(r.keySet === (0L to 9L).toSet)
    assert(r.values.map(_._2).sum === part.count())
    r.values.foreach { case (bin, n, sumPct, m, meanConf, acc) =>
      assert(m <= n && acc === m.toDouble / n)
      assert(meanConf === sumPct.toDouble / (n * 100))
      // decile b holds conf_pct in [10b, 10b+9]
      assert(sumPct >= 10 * bin * n && sumPct <= (10 * bin + 9) * n)
    }
  }

  test("vocabCoverage: exact Zipf-mass cutpoints on a hand corpus") {
    val docs = Seq((1L, "a a a b"), (2L, "b c")).toDF("doc_id", "text")
    val r = ext.TextStats.vocabCoverage(docs, ks = Seq(1, 2, 5))
      .as[(Long, Long, Long, Long, Long, Double)].collect()
      .map(x => x._1 -> x).toMap
    // counts: a=3, b=2, c=1; total 6, vocab 3
    assert(r(1L) === ((1L, 1L, 3L, 6L, 3L, 0.5)))
    assert(r(2L) === ((2L, 2L, 3L, 6L, 5L, 5.0 / 6)))
    assert(r(5L) === ((5L, 3L, 3L, 6L, 6L, 1.0))) // k beyond vocab clamps
  }

  test("histogramQuantileSketch: located bucket brackets the exact quantile; masses reconcile") {
    val r = ext.Sketches.histogramQuantileSketch(
      Tables.events(spark, sf)).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (n, below, cnt) = (row.getAs[Long]("n"),
        row.getAs[Long]("below"), row.getAs[Long]("bucket_cnt"))
      val p = row.getAs[Double]("p")
      val rk = math.floor(p * (n - 1)).toLong
      assert(below <= rk && rk < below + cnt, row.toString)
      assert(row.getAs[Boolean]("contained"), row.toString)
      assert(row.getAs[Double]("bucket_lo") <= row.getAs[Double]("exact") &&
        row.getAs[Double]("exact") <= row.getAs[Double]("bucket_hi"))
    }
    // degenerate group: constant values collapse to bucket 0, contained
    import spark.implicits._
    val const = Seq((1L, 0L, "e", 5.0), (2L, 1000000L, "e", 5.0))
      .toDF("event_id", "ts_us", "event_type", "value")
      .withColumn("ts", col("ts_us") * 1000L).drop("ts_us")
    val Array(d) = ext.Sketches.histogramQuantileSketch(const,
      ps = Seq(0.5)).collect()
    assert(d.getAs[Long]("bucket") === 0L &&
      d.getAs[Boolean]("contained"), d.toString)
  }

  test("round-6 operators survive empty inputs (no crash, empty or guarded output)") {
    val noDocs = Seq.empty[(Long, String, String, String)]
      .toDF("doc_id", "text", "lang", "source")
    val noEvents = Seq.empty[(Long, Long, Long, String, Double)]
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(ext.Dedup.editNearDups(noDocs).count() === 0)
    assert(ext.Curation.boilerplatePrefixes(noDocs).count() === 0)
    assert(ext.Curation.splitLeakage(noDocs).count() === 0)
    assert(ext.TextStats.vocabCoverage(noDocs).count() === 0)
    assert(ext.Retrieval.ndcgAtK(noDocs).count() === 0)
    assert(ext.Retrieval.mrrAtK(noDocs).count() === 0)
    assert(ext.Sketches.kmvSetAlgebra(noEvents).count() === 0)
    assert(ext.Sketches.histogramQuantileSketch(noEvents).count() === 0)
    assert(ext.Sessions.cupedReadout(noEvents).count() === 0)
    assert(ext.Dedup.lshQuality(noDocs).count() === 1) // 1-row rollup of 0s
  }

  test("splitLeakage: shared shingles counted per split pair, containment exact") {
    // choose doc ids landing in different splits under knuthMod(id, 100)
    def splitOf(id: Long): String = {
      val h = java.lang.Math.floorMod(id * 2654435761L, 100L)
      if (h < 80) "train" else if (h < 90) "val" else "test"
    }
    val ids = (1L to 200L)
    val train = ids.find(splitOf(_) == "train").get
    val vl = ids.find(splitOf(_) == "val").get
    val docs = Seq(
      (train, "abcdef"), // shingles: abc bcd cde def
      (vl, "abcxyz"))    // shingles: abc bcx cxy xyz → shares only "abc"
      .toDF("doc_id", "text")
    val r = ext.Curation.splitLeakage(docs)
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(r.toSeq === Seq(("train", "val", 4L, 4L, 1L, 0.25)))
  }
}
