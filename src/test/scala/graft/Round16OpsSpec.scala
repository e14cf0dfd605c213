package graft

import org.apache.spark.sql.functions._

/** Round-16 wave: the leakage-safe cluster split (q264) and the
  * split-leakage audit (q265). Expected values are recomputed by
  * independent in-test logic, never by trusting the operator (the
  * fimSplit lesson).
  */
class Round16OpsSpec extends SparkSuite {
  import spark.implicits._

  // Fixture: three near-dup groups + singletons. Long random-ish bodies
  // so 5-gram Jaccard separates groups cleanly; group B carries an exact
  // triplicate (exercises the star-edge leg of the connectivity form).
  private def body(seed: Int): String =
    (0 until 160).map(i => ('a' + (i * (seed * 2 + 3) + i * i % 37) % 26)
      .toChar).mkString
  private def docsFixture = {
    val a = body(1); val b = body(2); val c = body(3)
    Seq(
      (0L, a), (1L, a + "x"),                    // group A: near pair
      (10L, b), (11L, b), (12L, b), (13L, b.drop(1) + "zz"), // group B
      (20L, c),                                   // singleton
      (21L, body(4)), (22L, body(5)))             // singletons
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  private def naiveSplit(id: Long): String = {
    val bkt = ((id * 2654435761L) % 1000003L) % 10L
    if (bkt < 8) "train" else if (bkt == 8) "val" else "test"
  }

  test("leakageSafeSplit: whole clusters share one split; near-dup pairs " +
    "never straddle; singletons bucket by their own id") {
    val docs = docsFixture
    val r = ext.Dedup.leakageSafeSplit(docs)
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(r.map(_._1).toSeq == Seq(0L, 1L, 10L, 11L, 12L, 13L, 20L, 21L, 22L),
      "one row per input doc")
    val byDoc = r.map(t => t._1 -> (t._2, t._3)).toMap
    // cluster structure recomputed independently: A = {0,1} (min id 0),
    // B = {10,11,12,13} (min id 10), singletons own ids
    assert(byDoc(0L)._1 == 0L && byDoc(1L)._1 == 0L, s"group A: $byDoc")
    assert(Seq(10L, 11L, 12L, 13L).forall(byDoc(_)._1 == 10L),
      s"group B must be one cluster incl. the exact triplicate: $byDoc")
    assert(byDoc(20L)._1 == 20L && byDoc(21L)._1 == 21L && byDoc(22L)._1 == 22L)
    // every member inherits the CLUSTER id's bucket — recomputed here
    r.foreach { case (_, cluster, split) =>
      assert(split == naiveSplit(cluster),
        s"split must hash the cluster id: $cluster -> $split")
    }
    // structural disjointness: no cluster spans two splits
    assert(r.groupBy(_._2).forall(_._2.map(_._3).distinct.length == 1))
  }

  test("splitLeakageAudit: a straddling cluster marks ALL its docs leaked; " +
    "the cluster-grain split audits clean") {
    val docs = docsFixture
    // force a leak: assign by doc-id PARITY, so group B (10,11,12,13 all
    // even/odd mix) straddles and group A (0 even, 1 odd) straddles too
    val paritySplit = when(pmod(col("doc_id"), lit(2L)) === 0, lit("train"))
      .otherwise(lit("test"))
    val audit = ext.Dedup.splitLeakageAudit(docs, paritySplit)
      .as[(String, Long, Long, Long)].collect().map(t => t._1 -> t).toMap
    // independent expectation: clusters A={0,1}, B={10..13} both span
    // train(even)/test(odd); singletons 20,22 train / 21 test are clean.
    // train: docs 0,10,12,20,22 → leaked 0,10,12 (clusters A,B)
    // test: docs 1,11,13,21 → leaked 1,11,13 (clusters A,B)
    assert(audit("train") == ("train", 5L, 3L, 2L), audit.toString)
    assert(audit("test") == ("test", 4L, 3L, 2L), audit.toString)
    // the leakage-safe assignment audits clean by construction: replay
    // its per-doc assignment as a Column over docs (the audit's input
    // shape) and expect zero leaked docs/clusters
    val safeMap = ext.Dedup.leakageSafeSplit(docs)
      .as[(Long, Long, String)].collect()
      .map(t => t._1 -> t._3).toMap
    val safeExpr = safeMap.foldLeft(lit("train")) { case (acc, (id, s)) =>
      when(col("doc_id") === id, lit(s)).otherwise(acc)
    }
    val clean = ext.Dedup.splitLeakageAudit(docs, safeExpr)
      .as[(String, Long, Long, Long)].collect()
    assert(clean.forall(t => t._3 == 0L && t._4 == 0L),
      s"cluster-grain split must audit zero-leak: ${clean.toSeq}")
    assert(clean.map(_._2).sum == 9L, "audit must cover every doc")
  }

  test("incrementalSplit: exact copy and near-dup inherit the corpus " +
    "cluster; a bridge takes the MIN cluster; unmatched opens its own") {
    // corpus: a (prefix-edit of core) and b (suffix-edit of core) — near
    // dups of core but NOT of each other (jaccard isn't transitive), so
    // they sit in separate singleton clusters
    val core = (0 until 300).map(i => ('a' + (i * 7 + i * i % 31) % 26)
      .toChar).mkString
    val a = ("Z" * 90) + core.drop(90)
    val b = core.take(210) + ("Q" * 90)
    val mkDocs = (rows: Seq[(Long, String)]) => rows
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val corpus = mkDocs(Seq((0L, a), (10L, b)))
    // new batch: 100 = exact copy of a; 101 = the bridge (core: near-dup
    // of BOTH a and b); 102 = unrelated
    val stranger = (0 until 200).map(i => ('a' + (i * 11 + 5) % 26)
      .toChar).mkString
    val fresh = mkDocs(Seq((100L, a), (101L, core), (102L, stranger)))

    // fixture preconditions recomputed independently (5-gram jaccard):
    def grams(s: String) = s.sliding(5).toSet
    def jac(x: String, y: String) =
      grams(x).intersect(grams(y)).size.toDouble /
        grams(x).union(grams(y)).size
    assert(jac(a, b) < 0.5, s"corpus sides must NOT pair: ${jac(a, b)}")
    assert(jac(core, a) >= 0.5 && jac(core, b) >= 0.5,
      s"bridge must pair with both: ${jac(core, a)}, ${jac(core, b)}")

    // bands=8 (width 2): candidate recall at jaccard ~0.6 is near-certain;
    // the exact-jaccard verify still rejects the sub-threshold a-b pair
    val r = ext.Dedup.incrementalSplit(fresh, corpus, k = 16, bands = 8)
      .as[(Long, Long, String, Boolean)].collect()
      .map(t => t._1 -> t).toMap
    def splitOf(cluster: Long): String = {
      val bkt = ((cluster * 2654435761L) % 1000003L) % 10L
      if (bkt < 8) "train" else if (bkt == 8) "val" else "test"
    }
    assert(r(100L) == ((100L, 0L, splitOf(0L), true)),
      s"exact copy must inherit cluster 0: ${r(100L)}")
    assert(r(101L) == ((101L, 0L, splitOf(0L), true)),
      s"bridge must take the MIN matched cluster (0 < 10): ${r(101L)}")
    assert(r(102L) == ((102L, 102L, splitOf(102L), false)),
      s"unmatched doc opens its own singleton cluster: ${r(102L)}")
  }

  test("buildBandIndex + minhashNewVsIndex: the persisted-index gate is " +
    "bit-equal to the text gate, through a real parquet round-trip") {
    val a = body(1); val b = body(2)
    val mk = (rows: Seq[(Long, String)]) => rows
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // corpus with exact TRIPLICATE mass; new batch with its own duplicate
    // pair (both collapse legs exercised) + a near-edit + a stranger
    val corpus = mk(Seq((0L, a), (1L, a), (2L, a), (10L, b), (20L, body(3))))
    // near-edit by APPEND (keeps b's gram set, adds two new grams) so the
    // banding deterministically collides; a prefix-drop on this cyclic
    // fixture text shifted enough minima to miss all four bands
    val fresh = mk(Seq((100L, a), (101L, a), (110L, b + "zz"),
      (120L, body(9))))

    val viaText = ext.Dedup.minhashNewVsCorpus(fresh, corpus)
      .as[(Long, Long, Double)].collect().toSet
    assert(viaText.nonEmpty && viaText.exists(_._3 == 1.0),
      s"fixture must gate exact copies: $viaText")
    assert(viaText.exists(t => t._3 < 1.0),
      s"fixture must gate a near-edit too: $viaText")

    // the standing-asset path: build the index, PERSIST it, read it back
    val dir = java.nio.file.Files.createTempDirectory("bandidx").toString
    ext.Dedup.buildBandIndex(corpus).write.mode("overwrite")
      .parquet(s"$dir/index.parquet")
    val index = spark.read.parquet(s"$dir/index.parquet")
    val viaIndex = ext.Dedup.minhashNewVsIndex(fresh, index)
      .as[(Long, Long, Double)].collect()
    assert(viaIndex.toSet == viaText,
      s"index gate must be bit-equal to the text gate:\n" +
        s"  text : ${viaText.toSeq.sorted}\n" +
        s"  index: ${viaIndex.toSeq.sorted}")
    assert(viaIndex.length == viaIndex.toSet.size,
      "multi-band matches must collapse to one row per pair")
  }

  test("buildIvfIndex + ivfTopKIndexed: probing the persisted index is " +
    "bit-equal to ivfTopK, through a real parquet round-trip") {
    val emb = Tables.embeddings(spark, sf)
    val pred = col("vec_id") < 20
    val direct = ext.Similarity.ivfTopK(emb, pred, k = 5, nprobe = 4)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(direct.nonEmpty, "fixture must produce neighbors")

    val dir = java.nio.file.Files.createTempDirectory("ivfidx").toString
    ext.Similarity.buildIvfIndex(emb).write.mode("overwrite")
      .parquet(s"$dir/ivf.parquet")
    val index = spark.read.parquet(s"$dir/ivf.parquet")
    // the stored centroid set survives the round-trip intact (is_centroid
    // is persisted, not re-derived — the fp-tie trap in the scaladoc).
    // nc derives from the TOTAL row count (the cheap pre-quantize count
    // the operator takes), capped by how many nonzero vectors exist to
    // sample from
    val ncStored = index.filter(col("is_centroid")).count()
    val nNonzero = index.count()
    assert(ncStored ==
      math.ceil(math.sqrt(emb.count().toDouble)).toLong.min(nNonzero),
      s"centroid count must be ceil(sqrt(total)) capped at nonzero: " +
        s"$ncStored of $nNonzero")
    val viaIndex = ext.Similarity.ivfTopKIndexed(index, pred, k = 5,
      nprobe = 4).as[(Long, Long, Long, Double)].collect()
    assert(viaIndex.toSet == direct,
      "index probe must be bit-equal to the one-plan form")
    assert(viaIndex.length == direct.size, "exactly one row per (query, rank)")
  }
}
