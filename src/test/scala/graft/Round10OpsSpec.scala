package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 hardening: production-shaped PII patterns, cardinality-derived
  * bloom sizing (FP rate stays bounded when the key universe grows 10×),
  * the enforced bloom hash envelope, and bit-equivalence of the
  * day-partitioned max-concurrency sweep to its global-window form on
  * boundary-spanning sessions.
  */
class Round10OpsSpec extends SparkSuite {
  import spark.implicits._

  // ---------------------------------------------------------------- PII

  test("piiScan matches real-world PII shapes the round-9 patterns missed") {
    val docs = Seq(
      // mixed-case gmail with dot + plus local part, non-.com TLD
      (1L, "Reach John.Doe+spam@Gmail.COM or ops@sub-domain.example.org"),
      // NANP writings: parenthesized area code, dot separators, bare 3-3-4
      (2L, "call (555) 123-4567 or 555.987.6543 or 555-111-2222"),
      // arbitrary dotted quads, not just the synthetic 10.x.0.y family
      (3L, "hosts 192.168.1.1 and 172.16.254.3"),
      // near-misses stay clean: 7-digit phone, trailing-dot non-TLD,
      // 3-part dotted number
      (4L, "ring 555-0042 at v1.2.3 about user@host"))
      .toDF("doc_id", "text")
    val r = ext.Safety.piiScan(docs, col("text"))
      .select("doc_id", "n_emails", "n_phones", "n_ips", "redacted")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1)
    assert(r(0) == ((1L, 2L, 0L, 0L, "Reach <EMAIL> or <EMAIL>")))
    assert(r(1) == ((2L, 0L, 3L, 0L, "call <PHONE> or <PHONE> or <PHONE>")))
    assert(r(2) == ((3L, 0L, 0L, 2L, "hosts <IP> and <IP>")))
    assert(r(3) == ((4L, 0L, 0L, 0L, "ring 555-0042 at v1.2.3 about user@host")))
  }

  // ------------------------------------------------------- bloom sizing

  test("bloomBitsFor: ~10 bits/key rounded to a word, floored and capped") {
    assert(ext.Sketches.bloomBitsFor(0L) == 64)
    assert(ext.Sketches.bloomBitsFor(6L) == 64)
    assert(ext.Sketches.bloomBitsFor(1000L) == 10048) // ceil(10000/64)·64
    assert(ext.Sketches.bloomBitsFor(1000000L) == ext.Sketches.BloomMaxBits)
  }

  test("auto-sized bloom keeps the FP rate bounded at a 10× key universe") {
    // 3000 build keys inside a 30000-key probe universe; spread both with
    // multiplicative hashes so the readout reflects the filter, not an
    // arithmetic-progression artifact of sequential ids
    val build = spark.range(0, 30000).filter(col("id") % 10 === 0)
      .select(pmod(col("id") * 2654435761L, lit(1000003L)).as("k"))
    val probe = spark.range(0, 30000)
      .select(pmod(col("id") * 2654435761L, lit(1000003L)).as("k"))
    val r = ext.Sketches.bloomSemiJoin(build, col("k"), probe, col("k"))
      .as[(Long, Long, Long, Long, Long)].head()
    val (nProbed, nCand, nMembers, nFalsePos, bitsSet) = r
    assert(nProbed == 30000L)
    assert(nCand >= nMembers, "false negative: a member failed the k-bit test")
    val nonMembers = nProbed - nMembers
    val fpRate = nFalsePos.toDouble / nonMembers.toDouble
    assert(fpRate < 0.05,
      s"auto-sized bloom FP rate $fpRate (≥5%) — sizing regressed " +
        s"(bits_set=$bitsSet, members=$nMembers)")
    // and the derived mask is actually ~10 bits/key, not the old fixed 8192
    assert(bitsSet < ext.Sketches.bloomBitsFor(nMembers))
  }

  test("bloom keys outside the hash envelope fail loudly") {
    val build = Seq(1L, 2L).toDF("k")
    val probe = Seq(1L, ext.Sketches.BloomKeyEnvelope + 1L).toDF("k")
    val e = intercept[Exception] {
      ext.Sketches.bloomSemiJoin(build, col("k"), probe, col("k"), bits = 64)
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("envelope")), e.toString)
  }

  // ------------------------------------------ external retrieval API

  test("topKForQueries: external query table ≡ fixture derivation; " +
    "non-corpus query ids score cleanly") {
    val docs = Tables.documents(spark, sf)
    // replicate the fixture's query derivation as an external table: the
    // first-5-token prefix re-joined on single spaces tokenizes back to
    // the identical distinct token set
    val extQ = docs.filter(col("doc_id") % 97 === 3)
      .select(col("doc_id").as("query_id"),
        array_join(slice(ext.TextStats.tokens(col("text")), 1, 5), " ")
          .as("q_text"))
    val a = ext.Retrieval.topKByTokenOverlap(docs)
      .collect().map(_.toString).sorted.toSeq
    val b = ext.Retrieval.topKForQueries(docs, extQ)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
    // a query id that is NOT a corpus doc: nothing self-excludes, results
    // still rank corpus docs by overlap
    val someText = docs.orderBy(col("doc_id")).select(col("text"))
      .head().getString(0)
    val novel = Seq((-1L, someText)).toDF("query_id", "q_text")
    val r = ext.Retrieval.topKForQueries(docs, novel)
    assert(r.count() > 0)
    assert(r.filter(col("doc_id") === -1L).count() == 0)
  }

  test("minhashNewVsCorpus: only NEW×CORPUS pairs form; exact Jaccard " +
    "verifies the LSH candidates") {
    val body = "the quick brown fox jumps over the lazy dog again and again"
    val corpus = Seq(
      (1L, body),
      (2L, "completely different text with no shared content at all here"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, body),                                   // exact dup of corpus 1
      (11L, body),                                   // within-batch dup of 10
      (12L, "nothing in common with anything else xyzzy plugh frobozz"))
      .toDF("doc_id", "text")
    val r = ext.Dedup.minhashNewVsCorpus(batch, corpus)
      .as[(Long, Long, Double)].collect().sortBy(p => (p._1, p._2))
    // both identical batch docs pair with corpus doc 1 at jaccard 1.0;
    // the within-batch (10, 11) pair must NOT appear, nor corpus-corpus
    assert(r.map(p => (p._1, p._2)).toSeq == Seq((10L, 1L), (11L, 1L)),
      r.toSeq.toString)
    assert(r.forall(_._3 == 1.0))
  }

  test("rrfFuse: one-list-only docs score their single term; ties break " +
    "by doc_id") {
    val sparse = Seq((1L, 10L, 1L), (1L, 11L, 2L))
      .toDF("query_id", "doc_id", "sparse_rank")
    val dense = Seq((1L, 11L, 1L), (1L, 12L, 2L))
      .toDF("query_id", "doc_id", "dense_rank")
    val r = ext.Retrieval.rrfFuse(sparse, dense, rrfK = 60)
      .as[(Long, Long, Long, Option[Long], Option[Long], Double)]
      .collect().sortBy(_._2)
    // doc 11 in both lists: 1/62 + 1/61; doc 10 sparse-only: 1/61;
    // doc 12 dense-only: 1/62 — so 11, 10, 12
    assert(r.map(_._3).toSeq == Seq(11L, 10L, 12L), r.toSeq.toString)
    assert(math.abs(r(0)._6 - (1.0 / 62 + 1.0 / 61)) < 1e-12)
    assert(r(1)._5.isEmpty && r(2)._4.isEmpty) // absent-list ranks are NULL
  }

  test("cosineTopKForQueries: external query vectors rank the corpus, " +
    "no self-exclusion") {
    val corpus = Seq(
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f, 0f)),
      (3L, Array(0.9f, 0.1f, 0f, 0f)),
      (4L, Array(0f, 0f, 1f, 0f)))
      .toDF("vec_id", "embedding")
    val queries = Seq((100L, Array(1f, 0f, 0f, 0f)))
      .toDF("query_id", "embedding")
    val r = ext.Similarity.cosineTopKForQueries(corpus, queries, k = 3)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._3)
    // exact match first (cos 1 — external ids never self-exclude), then
    // the near vector, then the cos-0 tie broken by neighbor_id
    assert(r.map(_._2).toSeq == Seq(1L, 3L, 2L), r.toSeq.toString)
    assert(r(0)._4 > 0.999 && r(1)._4 > 0.98 && math.abs(r(2)._4) < 1e-9)
  }

  // ------------------------------------------- RFM fence equivalence

  test("rfmSegments distributed grid-rank ≡ the global-ntile windows") {
    // crafted purchase history with heavy TIES on freq and cents (the
    // case where a value-fence approximation would diverge from ntile's
    // fat-tiles-first split — the grid rank must reproduce the exact
    // (key, user_id) total order) across an awkward n (37 users, 37 =
    // 5·7+2 → two 8-row tiles then three 7-row tiles)
    val DayNs = 86400000000L * 1000L
    val events = (1 to 37).flatMap { u =>
      val freq = 1 + u % 4           // many users share each freq
      (0 until freq).map { i =>
        (u.toLong * 100 + i, (u % 11).toLong * DayNs + i * 1000000000L,
          u.toLong, "purchase", (u % 5) * 7.5 + 1.0, "{}")
      }
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val window = ext.Sessions.rfmSegments(events)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    val grid = ext.Sessions.rfmSegments(events, distributed = true)
    val gridRows = grid
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    assert(window == gridRows,
      s"grid-rank RFM diverged:\n window=$window\n grid=$gridRows")
    // the distributed plan must carry NO ntile window anywhere
    assert(!grid.queryExecution.executedPlan.toString.contains("ntile"))
    // and the same equivalence on the real events table
    val w2 = ext.Sessions.rfmSegments(Tables.events(spark, sf))
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    val g2 = ext.Sessions.rfmSegments(Tables.events(spark, sf),
      distributed = true)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    assert(w2 == g2)
  }

  // ------------------------------------- max-concurrency equivalence

  /** The single-sort global-window form of [[ext.Sessions.maxConcurrency]]
    * — the reference semantics the day-partitioned sweep must reproduce
    * bit-for-bit (it funnels every boundary through one task, which is why
    * the production plan replaces it with day-local sweeps + carry-in).
    */
  private def maxConcurrencyGlobal(events: DataFrame,
                                   gapUs: Long = 30L * 60 * 1000000): DataFrame = {
    val DayUs = 86400000000L
    val sess = ext.Sessions.sessionize(events, gapUs)
    val bounds = sess.select(col("start_us").as("ts"), lit(1L).as("delta"))
      .unionAll(sess.select(col("end_us").as("ts"), lit(-1L).as("delta")))
    val wGlobal = Window.orderBy(col("ts"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bounds.withColumn("conc", sum(col("delta")).over(wGlobal))
      .withColumn("day", floor(col("ts") / DayUs).cast("long"))
      .groupBy(col("day"))
      .agg(max(col("conc")).as("peak_concurrency"),
        count(lit(1)).as("n_boundaries"))
  }

  test("maxConcurrency day-partitioned sweep ≡ global window on " +
    "boundary-spanning sessions") {
    val DayUs = 86400000000L
    val MinUs = 60000000L
    // user 1: one session crossing midnight (day0 23:30 → day1 00:30)
    val u1 = (0 to 6).map(i =>
      (100L + i, (DayUs - 30 * MinUs + i * 10 * MinUs) * 1000L, 1L))
    // user 2: a 3-day session (events every 25 min for 50 h from day0 20:00)
    val u2 = (0 to 120).map(i =>
      (200L + i, (20L * 60 * MinUs + i * 25 * MinUs) * 1000L, 2L))
    // users 3/4: overlapping intra-day sessions on day1 (10:00–10:50 and
    // 10:30–11:20) — with user 2's running session the day-1 peak is 3
    def at(day: Long, min: Long): Long = (day * DayUs + min * MinUs) * 1000L
    val u3 = Seq((400L, at(1, 600), 3L), (401L, at(1, 625), 3L),
      (402L, at(1, 650), 3L))
    val u4 = Seq((500L, at(1, 630), 4L), (501L, at(1, 655), 4L),
      (502L, at(1, 680), 4L))
    // user 5 starts exactly when user 4's session ends (11:20) — the
    // ends-before-starts tie the sweep's delta ordering resolves
    val u5 = Seq((600L, at(1, 680), 5L), (601L, at(1, 705), 5L))
    val events = (u1 ++ u2 ++ u3 ++ u4 ++ u5)
      .toDF("event_id", "ts", "user_id")
    val fast = ext.Sessions.maxConcurrency(events)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val slow = maxConcurrencyGlobal(events)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(fast == slow,
      s"day-partitioned sweep diverged:\n fast=$fast\n slow=$slow")
    // the fixture really spans days: sessions exist on days 0..2 and the
    // multi-day sessions contribute carry-in (day1 opens with 2 sessions
    // already running)
    assert(fast.map(_._1).toSet == Set(0L, 1L, 2L))
    assert(fast.exists { case (d, peak, _) => d == 1L && peak >= 3L })
  }

  // -------------------------------------------- temperature mixture (q170)

  test("temperatureMixture: √n quotas via exact apportionment, budget " +
    "exhausted, small sources up-weighted") {
    // sources 16 / 4 / 1 docs → weights 4e6 / 2e6 / 1e6, budget 21/2 = 10;
    // hand-derived largest-remainder quotas: A 6, B 3, C 1
    val docs = ((0 until 16).map(i => (i.toLong, "A", 10L)) ++
      (0 until 4).map(i => (100L + i, "B", 10L)) ++
      Seq((200L, "C", 10L)))
      .toDF("doc_id", "source", "n_chars")
    val r = ext.Curation.temperatureMixture(docs)
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(r.map(x => (x._1, x._2, x._3)).toSeq ==
      Seq(("A", 16L, 6L), ("B", 4L, 3L), ("C", 1L, 1L)))
    // selection fills every quota here (quota ≤ n_docs for all three)
    assert(r.forall { case (_, n, q, sel, _) => sel == math.min(q, n) })
    assert(r.map(_._4).sum == 10L)
    // the whole point of the temperature: C keeps 100%, A keeps 6/16
    assert(r.find(_._1 == "C").get._4 == 1L)
    assert(r.find(_._1 == "A").get._4 < 16L / 2)
  }

  test("temperatureMixture caps quota at n_docs (without replacement)") {
    // 100 vs 1 docs: √-weights 10e6/1e6, budget 50 → C's remainder share
    // can round its quota above its 1 available doc
    val docs = ((0 until 100).map(i => (i.toLong, "A", 1L)) ++
      Seq((500L, "C", 1L))).toDF("doc_id", "source", "n_chars")
    val r = ext.Curation.temperatureMixture(docs)
      .as[(String, Long, Long, Long, Long)].collect()
    r.foreach { case (_, n, _, sel, _) => assert(sel <= n) }
  }

  // ------------------------------------------------ shuffle shards (q171)

  test("shuffleShards ≡ single global window; shard key ranges disjoint") {
    val docs = (0 until 100).map(i => (i.toLong, s"s${i % 7}", 10L + i))
      .toDF("doc_id", "source", "n_chars")
    val r = ext.Curation.shuffleShards(docs, nShards = 8)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    // reference: the oracle's single-window form
    val ref = docs.select(col("doc_id"), col("n_chars").cast("long").as("nc"),
      graft.functions.Hashing.spread(col("doc_id"), 1L << 31).as("key"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("key"), col("doc_id"))).cast("long"))
      .withColumn("shard", expr("(rank - 1) div 13")) // ceil(100/8)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n"), sum(col("nc")).as("tc"),
        min(col("key")).as("mn"), max(col("key")).as("mx"))
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(r.toSeq == ref.toSeq)
    // fixed-size shards: 13 docs each, 9 in the last
    assert(r.map(_._2).toSeq == Seq.fill(7)(13L) :+ 9L)
    // contiguous rank cut ⇒ strictly increasing, non-overlapping key ranges
    r.sliding(2).foreach { case Array(a, b) =>
      assert(a._5 <= b._4, s"shard ${a._1} max_key > shard ${b._1} min_key")
    case _ => ()
    }
  }

  // ------------------------------------------- source overlap matrix (q172)

  test("sourceOverlapMatrix: shared grams + containment, zero-overlap " +
    "pairs absent") {
    val docs = Seq(
      (1L, "A", "a b c d"), (2L, "B", "a b c e"), (3L, "C", "x y z w"))
      .toDF("doc_id", "source", "text")
    val r = ext.Curation.sourceOverlapMatrix(docs, n = 3)
      .as[(String, String, Long, Double)].collect()
    // A={abc,bcd}, B={abc,bce} share exactly "a b c"; C shares nothing
    assert(r.toSeq == Seq(("A", "B", 1L, 0.5)))
  }

  // --------------------------------------------- embedding audit (q173)

  test("embeddingAudit counts bad-dim/non-finite/zero vectors and keeps " +
    "the exact norm² envelope — without dying on NaN/Inf") {
    val vecs = Seq(
      (0L, Seq(0.5f, -0.5f), 0),            // clean: norm²_q = 5e11
      (1L, Seq(0.25f, 0.0f), 0),            // clean: 62500e6
      (2L, Seq(Float.NaN, 1.0f), 0),        // NaN — excluded from envelope
      (3L, Seq(Float.PositiveInfinity, 0f), 1), // Inf — ditto
      (4L, Seq(0.0f, 0.0f), 1),             // all-zero
      (5L, Seq(1.0f, 2.0f, 3.0f), 1))       // wrong dim (still finite)
      .toDF("vec_id", "embedding", "label")
    val r = ext.Similarity.embeddingAudit(vecs, dim = 2)
      .as[(Long, Long, Long, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().sortBy(_._1)
    val l0 = r(0); val l1 = r(1)
    assert(l0 == ((0L, 3L, 0L, 1L, 0L, Some(62500000000L),
      Some(500000000000L), Some(562500000000L))))
    // label 1: Inf + zero + bad-dim; envelope over the two finite vectors
    // (zero vec contributes 0, 3-dim vec 1e12+4e12+9e12)
    assert(l1 == ((1L, 3L, 1L, 1L, 1L, Some(0L),
      Some(14000000000000L), Some(14000000000000L))))
  }

  // ------------------------------------------------- plan shapes (scale)

  private def planOf(df: DataFrame): String = {
    df.collect() // AQE finalizes the plan only on execution
    df.queryExecution.executedPlan.toString
  }

  test("q170/q171 plans: quota and shard-offset dims are broadcast; the " +
    "corpus-sized window is always key-partitioned") {
    val p170 = planOf(SparkEntry.queries("q170_temperature_mixture")(spark, sf))
    assert(p170.contains("BroadcastHashJoin"), s"quota dim not broadcast:\n$p170")
    val p171 = planOf(SparkEntry.queries("q171_shuffle_shards")(spark, sf))
    assert(p171.contains("BroadcastHashJoin"), s"offsets not broadcast:\n$p171")
    assert(!p171.contains("SortMergeJoin"), s"shuffle join crept in:\n$p171")
    // the corpus-sized row_number must be partitioned by the grid bucket —
    // an unpartitioned window over the corpus is the single-partition trap
    // (the 64-row offsets frame keeps its allowed global window)
    assert(p171.contains("windowspecdefinition(bucket#"),
      s"grid-rank window lost its bucket partitioning:\n$p171")
  }

  test("canonicalizeUrl: case, default ports, utm params, fragments, " +
    "and non-defaults kept") {
    val cases = Seq(
      // scheme+host lowercase; PATH case kept
      ("HTTPS://WWW.EXample.COM/Path/Page", "https://www.example.com/Path/Page"),
      // default ports strip per scheme
      ("http://a.com:80/x", "http://a.com/x"),
      ("https://a.com:443/x", "https://a.com/x"),
      // non-default and cross-scheme ports kept
      ("http://a.com:8080/x", "http://a.com:8080/x"),
      ("http://a.com:443/x", "http://a.com:443/x"),
      // fragment dropped
      ("https://a.com/p#frag", "https://a.com/p"),
      // utm params removed, order of the rest kept, all-utm drops the '?'
      ("https://a.com/p?utm_source=x&id=5&utm_medium=y&z=1",
        "https://a.com/p?id=5&z=1"),
      ("https://a.com/p?utm_source=x&utm_medium=y", "https://a.com/p"),
      // bare host, no path/query
      ("http://a.com", "http://a.com"),
      // already canonical stays byte-identical
      ("https://cdn.b.net/img/large.png", "https://cdn.b.net/img/large.png"))
    val got = cases.map(_._1).toDF("url")
      .select(ext.Urls.canonicalizeUrl(col("url"))).as[String].collect()
    assert(got.toSeq == cases.map(_._2))
  }

  // ------------------------------------------------- semantic dedup

  test("semanticDedup: kept set is an independent set under the exact " +
    "cosine threshold within every cluster; dup_of is a valid lower-id " +
    "same-cluster neighbor above it") {
    val emb = Tables.embeddings(spark, sf)
    val r = ext.Similarity.semanticDedup(emb, k = 8, thrNum = 3, thrDen = 10)
      .as[(Long, Long, Boolean, Option[Long])].collect()
    val cluster = r.map(x => x._1 -> x._2).toMap
    // quantized vectors + norms, exactly as the operator computes them
    val qv = emb
      .select(col("vec_id"), ext.Similarity.quantize(col("embedding")).as("q"))
      .as[(Long, Array[Long])].collect().toMap
    def n2(v: Long): BigInt =
      qv(v).map(x => BigInt(x) * x).sum
    def above(a: Long, b: Long): Boolean = {
      val dot = qv(a).zip(qv(b)).map { case (x, y) => BigInt(x) * y }.sum
      dot >= 0 && dot * dot * 100 >= n2(a) * n2(b) * 9
    }
    assert(r.length == 500 && r.map(_._1).distinct.length == 500)
    for ((v, _, isDup, dupOf) <- r) {
      assert(isDup == dupOf.isDefined)
      dupOf.foreach { d =>
        assert(d < v && cluster(d) == cluster(v) && above(v, d),
          s"dup_of $d is not a valid duplicate witness for $v")
      }
    }
    val kept = r.filter(!_._3).map(_._1)
    val keptByCluster = kept.groupBy(cluster)
    for ((_, vs) <- keptByCluster; i <- vs.indices; j <- 0 until i)
      assert(!above(vs(i), vs(j)),
        s"kept vectors ${vs(i)} and ${vs(j)} are near-duplicates")
    // and the dedup is not vacuous on this fixture
    assert(r.count(_._3) > 0, "fixture produced zero duplicates")
  }

  test("q175 plan: centroid assignment is a broadcast; the pair join " +
    "shuffles on the cluster key, never all-pairs") {
    // the exact-collapse frame is PINNED since round 16, so the centroid
    // assignment (upstream of the collapse) lives in the recorded pre-pin
    // plan; the cell pair join consumes the pinned reps in the final plan
    ext.ExactCollapse.recordKeyed = true
    ext.ExactCollapse.recentKeyed.set(Nil)
    // try/finally (the PlanSpec pattern): a throw inside the recorded
    // section must not leave the JVM-global hook enabled — it would
    // retain DataFrames and pollute every later suite in the same JVM
    val (p, keyedPlans) =
      try {
        val df = SparkEntry.queries("q175_semantic_dedup")(spark, sf)
        (planOf(df), ext.ExactCollapse.recentKeyed.get().map(planOf))
      } finally {
        ext.ExactCollapse.recordKeyed = false
        ext.ExactCollapse.recentKeyed.set(Nil)
      }
    assert(keyedPlans.exists(_.contains("BroadcastNestedLoopJoin")),
      s"centroid row not broadcast:\n${keyedPlans.mkString("\n---\n")}")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
        p.contains("BroadcastHashJoin"),
      s"pair join lost its cluster-key equi-join:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"cell pair join degenerated to all-pairs:\n$p")
  }

  // ---------------------------------------------------- label fusion

  test("majorityVote: most votes wins, ties break to the LOWEST label") {
    val votes = Seq(
      (1L, "a0", 2L), (1L, "a1", 0L), (1L, "a2", 1L), // 3-way tie → 0
      (2L, "a0", 1L), (2L, "a1", 1L), (2L, "a2", 0L), // majority 1
      (3L, "a0", 2L), (3L, "a1", 2L), (3L, "a2", 2L)) // unanimous 2
      .toDF("item_id", "annotator", "label")
    val f = ext.Labeling.majorityVote(votes)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(f.toSeq == Seq((1L, 0L, 1L, 3L), (2L, 1L, 2L, 3L),
      (3L, 2L, 3L, 3L)))
  }

  test("annotatorReport: perfect annotator kappa = 1, constant annotator " +
    "kappa = 0 EXACTLY (integer numerator), degenerate panel null") {
    // truth skewed 70/30 over labels 0/1; a0+a1 vote truth (consensus =
    // truth), a2 always votes 0 — raw agreement 0.7 but chance-corrected 0
    val votes = spark.range(0, 100).select(col("id").as("item_id"))
      .withColumn("t", when(col("item_id") % 10 < 7, 0L).otherwise(1L))
      .select(col("item_id"), explode(array(
        struct(lit("a0").as("annotator"), col("t").as("label")),
        struct(lit("a1").as("annotator"), col("t").as("label")),
        struct(lit("a2").as("annotator"), lit(0L).as("label")))).as("v"))
      .select(col("item_id"), col("v.annotator"), col("v.label"))
    val r = ext.Labeling.annotatorReport(votes)
      .as[(String, Long, Long, Long, Long, Option[Double])]
      .collect().map(x => x._1 -> x).toMap
    assert(r("a0")._6.contains(1.0) && r("a1")._6.contains(1.0))
    assert(r("a2")._4 == 0L, "constant annotator kappa numerator must be 0")
    assert(r("a2")._6.contains(0.0))
    // all-constant panel: chance agreement 1 → kappa undefined (null)
    val degenerate = spark.range(0, 10).select(col("id").as("item_id"))
      .select(col("item_id"), explode(array(
        struct(lit("a0").as("annotator"), lit(5L).as("label")),
        struct(lit("a1").as("annotator"), lit(5L).as("label")))).as("v"))
      .select(col("item_id"), col("v.annotator"), col("v.label"))
    val d = ext.Labeling.annotatorReport(degenerate)
      .as[(String, Long, Long, Long, Long, Option[Double])].collect()
    assert(d.length == 2 && d.forall(x => x._5 == 0L && x._6.isEmpty))
  }

  // ----------------------------------------------------- k-anonymity

  test("kAnonymize: every released group ≥ k, record counts preserved, " +
    "generalization and suppression branches both fire") {
    // quasi1=1: (A,12) released, (B,3) small → nation total 3 < k →
    //   suppressed; quasi1=2: (A,4)+(B,5)+(C,3)=12 small → generalized;
    //   quasi1=3: (A,2) small → suppressed (with q1=1's 3: total 5 rows)
    val rows = Seq.fill(12)((1L, "A")) ++ Seq.fill(3)((1L, "B")) ++
      Seq.fill(4)((2L, "A")) ++ Seq.fill(5)((2L, "B")) ++
      Seq.fill(3)((2L, "C")) ++ Seq.fill(2)((3L, "A"))
    val df = rows.zipWithIndex
      .map { case ((n, s), i) => (n, s, i.toLong % 7) }
      .toDF("nat", "seg", "bal")
    val r = ext.Safety.kAnonymize(df, col("nat"), col("seg"), col("bal"),
        k = 10)
      .as[(Option[Long], String, Long, Long, Long)].collect()
    assert(r.map(_._3).sum == rows.length, "records lost or duplicated")
    assert(r.filter(_._5 <= 1L).forall(_._3 >= 10L),
      "a released group is below k")
    assert(r.count(_._5 == 0L) == 1 && r.count(_._5 == 1L) == 1)
    val supp = r.filter(_._5 == 2L)
    assert(supp.length == 1 && supp.head._3 == 5L &&
      supp.head._1.isEmpty && supp.head._2 == "*")
    // k above everything: the whole table collapses to the census row
    val all = ext.Safety.kAnonymize(df, col("nat"), col("seg"), col("bal"),
        k = 1000)
      .as[(Option[Long], String, Long, Long, Long)].collect()
    assert(all.length == 1 && all.head._3 == rows.length &&
      all.head._5 == 2L)
    // nothing suppressed at k=1: no census row, all groups level 0
    val none = ext.Safety.kAnonymize(df, col("nat"), col("seg"), col("bal"),
        k = 1)
      .as[(Option[Long], String, Long, Long, Long)].collect()
    assert(none.forall(_._5 == 0L) && none.map(_._3).sum == rows.length)
  }

  test("q177 plan: group-size tags join as broadcasts (the stat frames " +
    "are quasi-identifier-sized), no shuffle join") {
    val df = SparkEntry.queries("q177_k_anonymity")(spark, sf)
    val p = planOf(df)
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2,
      s"group-size tag joins not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"shuffle join crept in:\n$p")
  }

  // ------------------------------------------------ Luhn PAN detection

  test("panScan: Luhn separates valid PANs from digit runs; 15-digit " +
    "runs never match; a 17-digit run matches its first 16") {
    val docs = Seq(
      // classic valid test PAN + its corrupted check digit
      (1L, "pay 4111111111111111 or 4111111111111112 ref 123456789012345"),
      // 17-digit run: both engines match the first 16 (invalid under Luhn)
      (2L, "order 12345678901234567 logged"),
      (3L, "no digits at all"))
      .toDF("doc_id", "text")
    val r = ext.Safety.panScan(docs, col("text"))
      .select("doc_id", "n_pans", "n_valid")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(r(0) == ((1L, 2L, 1L)))
    assert(r(1) == ((2L, 1L, 0L)))
    assert(r(2) == ((3L, 0L, 0L)))
  }

  test("panScan Luhn agrees with a reference fold on 300 pseudo-random " +
    "digit runs") {
    def refLuhn(s: String): Boolean = {
      val sum = s.zipWithIndex.map { case (ch, i0) =>
        val d = ch - '0'
        if ((i0 + 1) % 2 == 1) { val t = d * 2; if (t > 9) t - 9 else t }
        else d
      }.sum
      sum % 10 == 0
    }
    val rnd = new scala.util.Random(4242)
    val rows = (1 to 300).map { i =>
      (i.toLong, "x " + (1 to 16).map(_ => rnd.nextInt(10)).mkString + " y")
    }
    val got = ext.Safety.panScan(rows.toDF("doc_id", "text"), col("text"))
      .select("doc_id", "n_valid").as[(Long, Long)].collect().toMap
    rows.foreach { case (id, t) =>
      val expected = if (refLuhn(t.split(" ")(1))) 1L else 0L
      assert(got(id) == expected, s"doc $id pan ${t.split(" ")(1)}")
    }
  }

  // ---------------------------------------------------- per-domain cap

  test("domainCap keeps the top-k by char mass per host, doc_id ties") {
    val docs = Seq(
      (1L, "a.com", 100L), (2L, "a.com", 300L), (3L, "a.com", 200L),
      (4L, "a.com", 300L), // ties with doc 2 → doc 2 first (lower id)
      (5L, "b.com", 50L))
      .toDF("doc_id", "host", "n_chars")
    val r = ext.Curation.domainCap(docs, col("host"), col("n_chars"), k = 2)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(x => x._1 -> x).toMap
    assert(r("a.com") == (("a.com", 4L, 2L, 900L, 600L))) // docs 2 + 4
    assert(r("b.com") == (("b.com", 1L, 1L, 50L, 50L)))
  }

  test("domainCapDistributed ≡ window domainCap on a tie-heavy corpus " +
    "(and on the real documents fixture)") {
    import scala.util.Random
    val rnd = new Random(1717)
    // heavy ties (chars from a 6-value domain) force boundary-bucket
    // tie-breaks; one "mega" host dwarfs the rest
    val docs = (1 to 500).map { i =>
      (i.toLong, if (i <= 350) "mega.com" else s"h${i % 9}.com",
        Seq(10L, 10L, 20L, 20L, 20L, 30L)(rnd.nextInt(6)))
    }.toDF("doc_id", "host", "n_chars")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(
      norm(ext.Curation.domainCapDistributed(docs, col("host"),
        col("n_chars"), k = 7, nBuckets = 4)) ===
        norm(ext.Curation.domainCap(docs, col("host"), col("n_chars"),
          k = 7)))
    val real = Tables.documents(spark, sf).withColumn("host",
      concat(lit("site"), pmod(col("doc_id"), lit(7L)).cast("string"),
        lit(".com")))
    assert(
      norm(ext.Curation.domainCapDistributed(real, col("host"),
        col("n_chars"), k = 5)) ===
        norm(ext.Curation.domainCap(real, col("host"), col("n_chars"),
          k = 5)))
  }

  test("ivfQuality: probing every cell recovers the exact truth " +
    "(recall = precision = 1), and fewer probes only lose recall") {
    val emb = Tables.embeddings(spark, sf)
    val pred = col("vec_id") % 10 === 0
    val full = ext.Similarity.ivfQuality(emb, pred, k = 5,
      nCentroids = 8, nprobe = 8)
      .as[(Long, Long, Long, Long, Double, Double)].head()
    assert(full._5 == 1.0 && full._6 == 1.0,
      s"nprobe = nCentroids must be exhaustive: $full")
    val part = ext.Similarity.ivfQuality(emb, pred, k = 5,
      nCentroids = 8, nprobe = 2)
      .as[(Long, Long, Long, Long, Double, Double)].head()
    assert(part._5 <= 1.0 && part._2 == full._2,
      "truth side must not depend on nprobe")
  }

  test("entryPaths: ordered first-k paths; short conversations keep " +
    "their full shorter path; identical openings aggregate") {
    val events = Seq(
      (1L, 1L, 11L, "view"), (1L, 2L, 12L, "click"),
      (2L, 1L, 21L, "click"), (2L, 2L, 22L, "view"),
      (2L, 3L, 23L, "view"), (2L, 4L, 24L, "click"),
      (3L, 5L, 31L, "click"), (3L, 6L, 32L, "view"), (3L, 7L, 33L, "view"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val r = ext.Dialogue.entryPaths(events, k = 3)
      .as[(String, Long)].collect().toMap
    assert(r == Map("view>click" -> 1L, "click>view>view" -> 2L))
  }

  test("clusterPurity: exact assignment, majority share, Gini impurity") {
    val ones = Seq.fill(64)(1.0f)
    val negs = Seq.fill(64)(-1.0f)
    val emb = Seq(
      (0L, ones, 1), (2L, ones, 1), (3L, ones, 1), (4L, ones, 2),
      (1L, negs, 5), (5L, negs, 5), (6L, negs, 5), (7L, negs, 5))
      .toDF("vec_id", "embedding", "label")
    val r = ext.Similarity.clusterPurity(emb, col("label"), k = 2)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
      .map(x => x._1 -> x).toMap
    assert(r(0L) == ((0L, 4L, 1L, 3L, 75L, 0.375)))
    assert(r(1L) == ((1L, 4L, 5L, 4L, 100L, 0.0)))
  }

  test("linearQualityGate: logit-domain gate is exact — hand-computed " +
    "features decide keep/drop at z > 0") {
    val docs = Seq(
      // nt=4, sh=2 (the, a), nd=4 → z = -10 + 4 + 4 + 4 = 2 > 0: kept
      (1L, "the a cat sat", "A"),
      // nt=2, sh=0, nd=1 → z = -10 + 2 + 0 + 1 = -7: dropped
      (2L, "cat cat", "A"))
      .toDF("doc_id", "text", "source")
    val r = ext.TextStats.linearQualityGate(docs, bias = -10L,
      wTokens = 1L, wStop = 2L, wDistinct = 1L)
      .as[(String, Long, Long, Long, Double)].head()
    assert(r == (("A", 2L, 1L, -5L, -2.5)))
  }

  test("oovRate: frozen top-k vocab splits occurrences per source; " +
    "frequency ties freeze to the lexicographically first term") {
    val docs = Seq(
      (1L, "aa aa bb", "A"),   // aa:2  bb:1
      (2L, "aa cc cc", "B"))   // cc:2 ties aa? no: aa:3 total, cc:2, bb:1
      .toDF("doc_id", "text", "source")
    // vocabK=2 → vocab {aa, cc}; A: 3 tokens 1 oov (bb); B: 0 oov
    val r = ext.TextStats.oovRate(docs, vocabK = 2)
      .as[(String, Long, Long, Double)].collect().map(x => x._1 -> x).toMap
    assert(r("A") == (("A", 3L, 1L, 1.0 / 3.0)))
    assert(r("B") == (("B", 3L, 0L, 0.0)))
  }

  test("srmCheck: arms partition the distinct users; chi² is the exact " +
    "closed form") {
    val r = ext.Sessions.srmCheck(Tables.events(spark, sf))
      .as[(Long, Long, Long, Long, Long, Double)].head()
    val (n, na, nb, num, den, chi2) = r
    assert(na + nb == n && den == n)
    assert(num == (na - nb) * (na - nb))
    assert(chi2 == num.toDouble / den.toDouble)
  }

  test("sourceDriftMatrix: identical distributions → 0, disjoint → 1, " +
    "missing-bucket mass via the closed form") {
    val docs = Seq(
      (1L, "A", 10L), (2L, "A", 10L), (3L, "A", 70L), (4L, "A", 70L),
      (5L, "B", 10L), (6L, "B", 70L), // same shape as A at half the mass
      (7L, "C", 200L))                // disjoint bucket
      .toDF("doc_id", "source", "n_chars")
    val r = ext.Curation.sourceDriftMatrix(docs, col("n_chars"),
      bucketWidth = 64L)
      .as[(String, String, Long, Long, Double)].collect()
      .map(x => (x._1, x._2) -> x).toMap
    assert(r(("A", "B")) == (("A", "B", 0L, 16L, 0.0)))
    assert(r(("A", "C")) == (("A", "C", 8L, 8L, 1.0)))
    assert(r(("B", "C")) == (("B", "C", 4L, 4L, 1.0)))
  }

  // ------------------------------------------------- dialogue audit

  test("turnAudit: alternation violations counted, assistant-first " +
    "flagged, truncation keeps the maximal prefix under budget") {
    val events = Seq(
      // user 1: user/assistant/user, budget 500 cuts after msg 2
      (1L, 1L, 101L, "click", 200L),
      (1L, 2L, 102L, "view", 200L),
      (1L, 3L, 103L, "purchase", 200L),
      // user 2: assistant-first double-send
      (2L, 1L, 104L, "view", 100L),
      (2L, 2L, 105L, "view", 100L))
      .toDF("user_id", "ts", "event_id", "event_type", "toks")
    val r = ext.Dialogue.turnAudit(events, col("toks"), budget = 500L)
      .as[(Long, Long, Long, Boolean, Long, Long)].collect()
      .map(x => x._1 -> x).toMap
    assert(r(1L) == ((1L, 3L, 0L, true, 2L, 400L)))
    assert(r(2L) == ((2L, 2L, 1L, false, 2L, 200L)))
  }

  // --------------------------------------------- duplication mass

  test("duplicationMass: occurrences of cross-doc grams counted per " +
    "doc; empty docs report zero") {
    val docs = Seq(
      (1L, "a b c a b c"), // grams: "a b c"×2, "b c a", "c a b"
      (2L, "a b c"),
      (3L, "   "))
      .toDF("doc_id", "text")
    val r = ext.Curation.duplicationMass(docs, n = 3)
      .as[(Long, Long, Long)].collect().map(x => x._1 -> x).toMap
    assert(r(1L) == ((1L, 4L, 2L))) // both "a b c" occurrences are shared
    assert(r(2L) == ((2L, 1L, 1L)))
    assert(r(3L) == ((3L, 0L, 0L)))
  }

  test("q180/q181 plans: the dialogue audit shuffles once on the " +
    "conversation key; duplication mass never joins back to the corpus " +
    "text") {
    val dlg = SparkEntry.queries("q180_dialogue_audit")(spark, sf)
    dlg.collect()
    val pd = dlg.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("Exchange".r.findAllIn(pd).length <= 1,
      s"dialogue audit should shuffle once (user key):\n$pd")
    val dm = SparkEntry.queries("q181_dup_mass")(spark, sf)
    val pm = planOf(dm)
    // one scan feeds the gram pipeline, one the doc_id spine — the gram
    // side re-aggregates collapsed counts, never re-reading text
    assert("Scan parquet".r.findAllIn(pm).length <= 4, // 2 logical scans
      s"unexpected extra corpus scans:\n$pm")
  }

  // ----------------------------------------------- code-switch audit

  test("codeSwitchAudit: halves language-ID'd independently; no-signal " +
    "halves never flag; empty docs stay unknown") {
    val docs = Seq(
      // 6 en tokens then 6 fr tokens → halves disagree
      (1L, "en", "the and of is with the le la et les des le"),
      (2L, "en", "the and of is with the and of is with"),
      // first half markerless → unknown, not mixed
      (3L, "fr", "xxx yyy zzz qqq ppp le la et les des"),
      (4L, "en", ""))
      .toDF("doc_id", "lang", "text")
    val r = ext.TextStats.codeSwitchAudit(docs, col("text"))
      .as[(Long, String, String, String, Boolean)].collect()
      .map(x => x._1 -> x).toMap
    assert(r(1L) == ((1L, "en", "en", "fr", true)))
    assert(r(2L) == ((2L, "en", "en", "en", false)))
    assert(r(3L) == ((3L, "fr", "unknown", "fr", false)))
    assert(r(4L) == ((4L, "en", "unknown", "unknown", false)))
  }

  // ------------------------------------------ quantile normalization

  test("quantileNormalize maps per-source midpoint ranks onto pooled " +
    "nearest-rank values (distributed pool rank ≡ global order)") {
    val docs = Seq(
      (1L, "A", 1L), (2L, "A", 2L), (3L, "A", 3L), (4L, "A", 4L),
      (5L, "B", 10L), (6L, "B", 20L))
      .toDF("doc_id", "source", "n_chars")
    val r = ext.Curation.quantileNormalize(docs, col("n_chars"),
      col("source"))
      .as[(Long, String, Long, Long)].collect().map(x => x._1 -> x._4).toMap
    // pool sorted: 1 2 3 4 10 20; A(n=4): idx 1,3,4,6; B(n=2): idx 2,5
    assert(r == Map(1L -> 1L, 2L -> 3L, 3L -> 4L, 4L -> 20L,
      5L -> 2L, 6L -> 10L))
  }

  test("turnPairs: only user→assistant adjacencies pair; latency is " +
    "exact µs from the ns contract; pairless conversations are absent") {
    val events = Seq(
      (1L, 1000L, 1L, "click", 10L),    // user — pairs with the next view
      (1L, 2000L, 2L, "view", 20L),     // assistant
      (1L, 3000L, 3L, "click", 5L),     // user — next is user: no pair
      (1L, 4000L, 4L, "click", 7L),     // user — pairs with the next view
      (1L, 5000L, 5L, "view", 30L),     // assistant
      (2L, 1000L, 6L, "view", 9L))      // assistant-only conv: no pairs
      .toDF("user_id", "ts", "event_id", "event_type", "toks")
    val r = ext.Dialogue.turnPairs(events, col("toks"))
      .as[(Long, Long, Long, Long)].collect()
    assert(r.toSet == Set((1L, 2L, 2L, 50L)))
  }

  test("sourceDataCard: mass, prefix dups, blocklist drops, majority " +
    "lang with exact share (ties to alphabetical lang)") {
    val docs = Seq(
      (1L, "the big cat", "en", "A", 11L),
      (2L, "the big cat", "en", "A", 11L),  // exact prefix dup of doc 1
      (3L, "fast row", "fr", "A", 8L),
      (4L, "slow slow slow slow", "en", "B", 19L),
      (5L, "clean text here", "fr", "B", 15L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = ext.Curation.sourceDataCard(docs,
      blockWords = Seq("slow", "big", "the"), maxPct = 10)
      .as[(String, Long, Long, Long, Long, Long, String, Long)]
      .collect().map(x => x._1 -> x).toMap
    assert(r("A") == (("A", 3L, 30L, 8L, 2L, 2L, "en", 66L)))
    assert(r("B") == (("B", 2L, 34L, 7L, 0L, 1L, "en", 50L)))
  }

  test("bpeApplyFertility: learned merges collapse merged words to fewer " +
    "symbols; untouched words keep one symbol per char") {
    // merges learned: (a,b) → (ab,c) → (abc,d); "abcd" collapses to one
    // symbol, "xy" (below every argmax) stays two
    val docs = Seq(
      (1L, "abcd abcd xy", "en", "A"),
      (2L, "abcd abcd xy", "en", "B"))
      .toDF("doc_id", "text", "lang", "source")
    val r = ext.TextStats.bpeApplyFertility(docs, nMerges = 3)
      .as[(String, Long, Long, Long, Double)].collect()
      .map(x => x._1 -> x).toMap
    assert(r("A") == (("A", 3L, 10L, 4L, 4.0 / 3.0)))
    assert(r("B") == (("B", 3L, 10L, 4L, 4.0 / 3.0)))
  }

  test("fetchRateAudit: per-host bucket peaks and over-limit counts") {
    val ns = 1000000000L
    val events = Seq(
      // host A: 3 fetches in bucket 0, 1 in bucket 1 → peak 3, 1 over-2
      ("a.com", 1L * ns), ("a.com", 2L * ns), ("a.com", 3L * ns),
      ("a.com", 3600L * ns + ns),
      // host B: 1 fetch → peak 1, none over
      ("b.com", 5L * ns))
      .toDF("host", "ts")
    val r = ext.Urls.fetchRateAudit(events, col("host"),
      bucketNs = 3600L * ns, limit = 2)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(x => x._1 -> x).toMap
    assert(r("a.com") == (("a.com", 4L, 2L, 3L, 1L)))
    assert(r("b.com") == (("b.com", 1L, 1L, 1L, 0L)))
  }

  test("semanticDedup scale contract: growing k with the corpus shrinks " +
    "the pair-scan bound Σ|cluster|²") {
    // 400 spread-out vectors; the pair join's work is bounded by
    // Σ|cluster|², which k ≈ √N keeps ~N·√N instead of N²/k for tiny k —
    // the attribution behind q175's 10×-replica ratio (k pinned at 8
    // there as a demo parameter)
    val emb = spark.range(0, 400).select(col("id").as("vec_id"),
      expr("""transform(sequence(1, 64), j ->
             |  cast(pmod(id * j * 2654435761, 97) as float) / 97.0)"""
        .stripMargin).as("embedding"))
    def mass(k: Int): Long =
      ext.Similarity.semanticDedup(emb, k = k, thrNum = 3, thrDen = 10)
        .groupBy(col("centroid_id")).count()
        .agg(sum(col("count") * col("count"))).as[Long].head()
    val m4 = mass(4)
    val m20 = mass(20)
    assert(m20 * 3 < m4,
      s"sum-of-squared-cluster-sizes should drop ≥3× from k=4 ($m4) " +
        s"to k=20 ($m20)")
  }

  test("htmlToText: script/style/comment contents die, tag contents " +
    "live, entities decode single-pass (&amp;lt; stays literal)") {
    val rows = Seq(
      (1L, "<html><script>var a = 1;</script><p>Hello <b>world</b></p>" +
        "</html>", "Hello world"),
      (2L, "<style>p { color: red }</style>before<!-- gone -->after",
        "before after"),
      (3L, "A &amp; B &lt;tag&gt; &quot;q&quot; &#39;s", "A & B <tag> \"q\" 's"),
      // single-pass rule: &amp;lt; → literal "&lt;", never "<"
      (4L, "x &amp;lt; y", "x &lt; y"),
      (5L, "<p  class=\"a\">spaced   out</p>", "spaced out"))
      .toDF("doc_id", "html", "expected")
    val r = rows.select(col("doc_id"),
      ext.Html.htmlToText(col("html")).as("got"), col("expected"))
      .as[(Long, String, String)].collect()
    r.foreach { case (id, got, exp) =>
      assert(got == exp, s"doc $id: '$got' != '$exp'")
    }
  }

  test("robotsFilter: literal path prefixes block per canonical host; " +
    "query strings are not part of the path; one URL blocks once") {
    val urls = Seq(
      (1L, "http://a.com/search?q=1"),      // blocked (path /search)
      (2L, "http://a.com/searchable/page"), // blocked (prefix match)
      (3L, "http://a.com/other"),           // clean
      (4L, "http://b.com/search"),          // no rule for b.com
      (5L, "HTTP://A.COM:80/search"))       // canonicalizes to a.com
      .toDF("doc_id", "url")
    val r = ext.Urls.robotsFilter(urls, col("doc_id"), col("url"),
      rules = Seq("a.com" -> "/search", "a.com" -> "/never"))
      .as[(String, Long, Long)].collect().map(x => x._1 -> x).toMap
    assert(r("a.com") == (("a.com", 4L, 3L)))
    assert(r("b.com") == (("b.com", 1L, 0L)))
    // RFC 9309 §2.2.2: an EMPTY Disallow value means allow-all — it must
    // not block (startsWith("") would have inverted it to block-all)
    val r2 = ext.Urls.robotsFilter(urls, col("doc_id"), col("url"),
      rules = Seq("a.com" -> "", "b.com" -> "/search"))
      .as[(String, Long, Long)].collect().map(x => x._1 -> x).toMap
    assert(r2("a.com") == (("a.com", 4L, 0L)),
      s"empty Disallow must allow-all: ${r2("a.com")}")
    assert(r2("b.com") == (("b.com", 1L, 1L)))
  }

  test("snapshotDrift: exact floor-mean deltas; labels with an empty " +
    "half are excluded") {
    val half = Seq.fill(64)(0.5f)
    val quarter = Seq.fill(64)(0.25f)
    val emb = Seq(
      (0L, half, 1), (2L, half, 1),    // label 1, snapshot A
      (1L, quarter, 1),                // label 1, snapshot B
      (4L, half, 2))                   // label 2: B half empty → excluded
      .toDF("vec_id", "embedding", "label")
    val r = ext.Similarity.snapshotDrift(emb, col("vec_id") % 2 === 0)
      .as[(Long, Long, Long, Long, Long)].collect()
    // per-dim means 500000 vs 250000 → m = 250000 on all 64 dims
    assert(r.toSeq == Seq((1L, 2L, 1L, 64L * 250000L * 250000L, 250000L)))
  }

  test("paddingEfficiency: waste is n·max−Σlen per batch; length " +
    "sorting never pads more than the shuffle order") {
    val docs = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 10L))
      .toDF("doc_id", "tok")
    val r = ext.Curation.paddingEfficiency(docs, col("tok"), batchSize = 2)
      .as[(Long, Long, Long, Long)].head()
    // sorted: (1,1) waste 0 + (1,10) waste 2·10−11 = 9
    assert(r._1 == 4L && r._2 == 13L && r._3 == 9L)
    assert(r._3 <= r._4, s"sorted ${r._3} > shuffled ${r._4}")
    val real = ext.Curation.paddingEfficiency(
      Tables.documents(spark, sf), expr("(n_chars div 4) + 1"), 32)
      .as[(Long, Long, Long, Long)].head()
    assert(real._3 <= real._4)
  }

  test("curationFunnel: every stage decides — blocklist drop, quality " +
    "drop, prefix-dup collapse — and counts monotonically shrink") {
    val docs = Seq(
      (1L, "A", "the a cat sat"),       // passes everything
      (2L, "A", "the a cat sat"),       // exact dup → doc 1 survives
      (3L, "B", "bad bad bad cat sat xx"), // 3/6 blocked > 10% → dropped
      (4L, "B", "cat cat"))             // z = −7 → quality drop
      .toDF("doc_id", "source", "text")
    val r = ext.Curation.curationFunnel(docs, col("text"),
      blockWords = Seq("bad"), maxPct = 10,
      bias = -10L, wTokens = 1L, wStop = 2L, wDistinct = 1L)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(x => x._1 -> x).toMap
    assert(r("A") == (("A", 2L, 2L, 2L, 1L, 13L)))
    assert(r("B") == (("B", 2L, 1L, 0L, 0L, 0L)))
  }

  // ------------------------------------------- MarkerHits rewrite rule

  test("MarkerHitsRule rewrites the HOF marker count to the kernel, " +
    "bit-identical incl. null arrays and null elements") {
    // arrays must be data-dependent — fully-literal ones constant-fold
    // before the rule can fire (and that folding is itself semantics-safe)
    val df = spark.range(1).select(
      expr("array('the', 'x', 'the', CAST(NULL AS STRING), " +
        "CAST(id AS STRING))").as("a"),
      expr("array('zz', CAST(id AS STRING))").as("b"),
      expr("IF(id < 0, array('x'), CAST(NULL AS ARRAY<STRING>))").as("c"),
      expr("slice(array(CAST(id AS STRING)), 1, 0)").as("d"))
    def score(colName: String) = {
      val arr = array(lit("the"), lit("a"))
      size(filter(col(colName), x => array_contains(arr, x)))
        .as(s"s_$colName")
    }
    val q = df.select(score("a"), score("b"), score("c"), score("d"))
    // the rewrite fired
    assert(q.queryExecution.optimizedPlan.toString.contains("marker_hits"),
      q.queryExecution.optimizedPlan.toString)
    val got = q.collect()(0)
    // reference: same expressions with the rule excluded
    val conf = "spark.sql.optimizer.excludedRules"
    spark.conf.set(conf, "graft.plans.MarkerHitsRule")
    val ref =
      try {
        val rq = df.select(score("a"), score("b"), score("c"), score("d"))
        assert(!rq.queryExecution.optimizedPlan.toString
          .contains("marker_hits"), "exclusion did not take")
        rq.collect()(0)
      } finally spark.conf.unset(conf)
    assert(got == ref, s"$got vs $ref")
    assert(got.getInt(0) == 2 && got.getInt(1) == 0 && got.isNullAt(2)
      && got.getInt(3) == 0)
    // and it fires on the real language-ID query (5 marker sets × docs)
    val q14 = SparkEntry.queries("q14_langid")(spark, sf)
    assert("marker_hits".r
      .findAllIn(q14.queryExecution.optimizedPlan.toString).length >= 5,
      q14.queryExecution.optimizedPlan.toString.take(2000))
  }

  test("q182 plan: pure per-row audit — zero exchanges") {
    val df = SparkEntry.queries("q182_code_switch")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!p.contains("Exchange"),
      s"code-switch audit should not shuffle:\n$p")
  }

  test("q185/q190/q192 plans: data-card joins broadcast; entry paths " +
    "shuffle at most twice; OOV vocab is a TakeOrdered broadcast") {
    val p1 = planOf(SparkEntry.queries("q185_source_datacard")(spark, sf))
    assert(p1.contains("BroadcastHashJoin"), s"majority join:\n$p1")
    assert(!p1.contains("SortMergeJoin"), s"shuffle join crept in:\n$p1")
    val ep = SparkEntry.queries("q190_entry_paths")(spark, sf)
    ep.collect()
    val p2 = ep.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("Exchange".r.findAllIn(p2).length <= 2,
      s"entry paths should shuffle at most twice:\n$p2")
    val p3 = planOf(SparkEntry.queries("q192_oov_rate")(spark, sf))
    assert(p3.contains("TakeOrderedAndProject"),
      s"frozen vocab must be a TakeOrdered, not a global sort:\n$p3")
    assert(p3.contains("BroadcastHashJoin") && !p3.contains("SortMergeJoin"),
      s"vocab probe must broadcast:\n$p3")
  }

  test("fimSplit: segments partition the doc, the rendered PSM string is " +
      "fingerprint-pinned, autoregressive docs pass through") {
    val docs = Seq(
      (2L, "abcdefghij"),   // FIM'd (even id)
      (3L, "0123456789"),   // autoregressive (odd id)
      (4L, ""))             // empty doc: all cuts collapse to 0
      .toDF("doc_id", "text")
    val r = ext.Transforms.fimSplit(docs)
      .as[(Long, Boolean, Long, Long, Long, Boolean, Long)]
      .collect().sortBy(_._1).toList
    // replicate the cut arithmetic for doc 2 and pin the rendered bytes
    val n = 10L
    val h1 = (2L * 2654435761L) % (n + 1)
    val h2 = (2L * 1779033703L + 7L) % (n + 1)
    val (a, b) = (math.min(h1, h2), math.max(h1, h2))
    val t = "abcdefghij"
    val rendered = "<PRE>" + t.substring(0, a.toInt) + "<SUF>" +
      t.substring(b.toInt) + "<MID>" + t.substring(a.toInt, b.toInt)
    val fp = graft.functions.StringFingerprint.fingerprint(
      org.apache.spark.unsafe.types.UTF8String.fromString(rendered))
    assert(r(0) == ((2L, true, a, b - a, n - b, true, fp)))
    // segment masses partition the doc
    assert(r(0)._3 + r(0)._4 + r(0)._5 == n)
    // odd id: untouched, fingerprint of the raw text
    val fpRaw = graft.functions.StringFingerprint.fingerprint(
      org.apache.spark.unsafe.types.UTF8String.fromString("0123456789"))
    assert(r(1) == ((3L, false, 10L, 0L, 0L, true, fpRaw)))
    // empty doc renders sentinels only
    val fpEmpty = graft.functions.StringFingerprint.fingerprint(
      org.apache.spark.unsafe.types.UTF8String.fromString(
        "<PRE><SUF><MID>"))
    assert(r(2) == ((4L, true, 0L, 0L, 0L, true, fpEmpty)))
  }

  test("q201 plan: per-row transform — zero exchanges") {
    val df = SparkEntry.queries("q201_fim_transform")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!p.contains("Exchange"), s"FIM transform should not shuffle:\n$p")
  }

  test("lossMask: assistant runs collapse to one span; offsets are exact " +
      "token positions; no-assistant conversations report -1") {
    val base = 1722470400L * 1000000000L
    // u1: user(3) asst(5) asst(7) user(2) asst(4) → spans {5,7} and {4}
    // u2: asst(6) user(1) → assistant-first opens a span at offset 0
    // u3: user(9) user(1) → nothing trainable
    val events = Seq(
      (1L, base + 1L, 1L, "click", 2L),      // toks = k+1
      (2L, base + 2L, 1L, "view", 4L),
      (3L, base + 3L, 1L, "view", 6L),
      (4L, base + 4L, 1L, "purchase", 1L),
      (5L, base + 5L, 1L, "view", 3L),
      (6L, base + 1L, 2L, "view", 5L),
      (7L, base + 2L, 2L, "signup", 0L),
      (8L, base + 1L, 3L, "click", 8L),
      (9L, base + 2L, 3L, "click", 0L))
      .toDF("event_id", "ts", "user_id", "event_type", "k")
    val r = ext.Dialogue.lossMask(events, col("k") + 1L)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toList
    assert(r(0) == ((1L, 21L, 16L, 2L, 3L)))
    assert(r(1) == ((2L, 7L, 6L, 1L, 0L)))
    assert(r(2) == ((3L, 10L, 0L, 0L, -1L)))
  }

  test("lmScore: known-bigram mass is occurrence-weighted integer " +
      "sufficient statistics; unseen pairs count as unknown; short docs " +
      "report zeros") {
    val docs = Seq(
      (0L, "a b a c"),   // reference (even id): pairs {a b, b a, a c}
      (1L, "a b x y"),   // held out: only "a b" is known
      (3L, "a"),         // single token: no bigrams
      (5L, ""))          // empty
      .toDF("doc_id", "text")
    val r = ext.TextStats.lmScore(docs, col("doc_id") % 2 === 0)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toList
    // doc0: all three pairs known (counts 1 each); ctx masses a→2, b→1
    assert(r(0) == ((0L, 3L, 3L, 3L, 5L)))
    // doc1: "a b" known (num 1, den = ctx(a) = 2); "b x","x y" unknown
    assert(r(1) == ((1L, 3L, 1L, 1L, 2L)))
    assert(r(2) == ((3L, 0L, 0L, 0L, 0L)))
    assert(r(3) == ((5L, 0L, 0L, 0L, 0L)))
  }

  test("aspectBuckets: exact nearest-ratio assignment, ties to the " +
      "smaller ladder index, global row prices the unbucketed baseline") {
    val imgs = Seq(
      (1024L, 1024L),  // exactly 1:1
      (1280L, 960L),   // exactly 4:3
      (960L, 1280L),   // exactly 3:4
      (1920L, 1080L),  // exactly 16:9
      (7L, 6L))        // equidistant 1:1 vs 4:3 → tie → 1:1
      .toDF("w", "h")
    val r = ext.Multimodal.aspectBuckets(imgs, col("w"), col("h"))
      .as[(String, Long, Long, Long, Long, Long, Long)]
      .collect().map(x => x._1 -> x).toMap
    assert(r("1:1")._2 == 2L)                      // the square + the tie
    assert(r("4:3") == (("4:3", 1L, 1280L * 960L, 1280L, 960L,
      1280L * 960L, 0L)))                          // lone image: no waste
    assert(r("3:4")._2 == 1L && r("16:9")._2 == 1L)
    assert(!r.contains("9:16"))                    // empty buckets absent
    // global: pad everything to (1920, 1280)
    val nat = 1024L*1024 + 1280L*960 + 960L*1280 + 1920L*1080 + 7L*6
    assert(r("global") == (("global", 5L, nat, 1920L, 1280L,
      5L * 1920L * 1280L, 5L * 1920L * 1280L - nat)))
    // 1:1 bucket pads the 7×6 tie image up to 1024×1024
    assert(r("1:1")._6 == 2L * 1024L * 1024L)
  }

  test("pseudonymize: one surrogate per entity, mentions and docs " +
      "rolled up across documents, no spurious collisions on the fixture") {
    val docs = Seq(
      (1L, "write a@x.com then a@x.com again"),
      (2L, "also a@x.com and b@y.org"),
      (3L, "only b@y.org here"))
      .toDF("doc_id", "text")
    val r = ext.Safety.pseudonymize(docs, col("text"))
      .as[(String, Long, Long, Long)].collect().toList
    assert(r.size == 2, s"expected 2 surrogates, got $r")
    assert(r.forall(_._4 == 1L), s"fingerprint collision on 2 entities: $r")
    val byMentions = r.sortBy(_._2)
    assert(byMentions(0)._2 == 2L && byMentions(0)._3 == 2L) // b@y.org
    assert(byMentions(1)._2 == 3L && byMentions(1)._3 == 2L) // a@x.com
    // surrogate is the fingerprint mod 10^6 — deterministic across runs
    val fpA = graft.functions.StringFingerprint.fingerprint(
      org.apache.spark.unsafe.types.UTF8String.fromString("a@x.com"))
    assert(r.exists(_._1 == s"user_${fpA % 1000000L}"))
  }

  test("q203/q204/q205 plans: LM score joins on the bigram key with " +
      "broadcast model; bucketing assigns per-row (no join)") {
    val lm = SparkEntry.queries("q203_lm_score")(spark, sf)
    lm.collect()
    val pLm = lm.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(pLm.contains("BroadcastHashJoin"),
      s"vocab-bounded model side should broadcast under AQE:\n$pLm")
    val ab = SparkEntry.queries("q204_aspect_buckets")(spark, sf)
    ab.collect()
    val pAb = ab.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!pAb.contains("Join"),
      s"bucket assignment must be per-row, not a ladder join:\n$pAb")
    // q205: per-row extraction, then entity + surrogate rollups — ≤3
    // exchanges (count_distinct(doc_id) is a two-phase aggregate, so the
    // entity rollup costs two), no joins, map-side partials throughout
    val ps = SparkEntry.queries("q205_pseudonymize")(spark, sf)
    ps.collect()
    val pPs = ps.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!pPs.contains("Join"),
      s"pseudonymize should never join:\n$pPs")
    assert("Exchange".r.findAllIn(pPs).length <= 3,
      s"pseudonymize should shuffle ≤3× (entity distinct ×2, " +
        s"surrogate):\n$pPs")
    assert(pPs.contains("partial_"), s"no map-side partials:\n$pPs")
  }

  test("repeatedSpans: overlapping dup positions merge to maximal spans, " +
      "intra-doc repeats count, clean and short docs report zeros") {
    // l = 4. Docs 1/2 share "ABCDE" → positions 1,2 in each (grams ABCD,
    // BCDE) merge to one span of 5 chars. Doc 3 repeats "XYZW" twice
    // INSIDE itself (pos 1 and 9, non-adjacent) → two 4-char spans.
    // Doc 4 is clean; doc 5 is shorter than l.
    val docs = Seq(
      (1L, "ABCDEfgh"),
      (2L, "quABCDEz"),
      (3L, "XYZWabcdXYZWefgh"),
      (4L, "nothing-shared!!"),
      (5L, "abc"))
      .toDF("doc_id", "text")
    val r = ext.Dedup.repeatedSpans(docs, l = 4)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toList
    assert(r(0) == ((1L, 2L, 1L, 5L)))
    assert(r(1) == ((2L, 2L, 1L, 5L)))   // span sits at offset 3, same mass
    assert(r(2) == ((3L, 2L, 2L, 8L)))
    assert(r(3) == ((4L, 0L, 0L, 0L)))
    assert(r(4) == ((5L, 0L, 0L, 0L)))
  }

  test("contextWindows: stream offsets are exact prefix sums with " +
      "separators; fragmentation histogram counts docs per window; " +
      "empty docs shift the stream but touch no window") {
    // c=5. Stream: d1 [0,4)+sep, d2 [5,7)+sep, d3 [8,14)+sep, d4 empty
    // (sep only). Windows: w0 {d1}, w1 {d2,d3}, w2 {d3} → hist 1→2, 2→1.
    val docs = Seq(
      (1L, "aaaa"), (2L, "bb"), (3L, "cccccc"), (4L, ""))
      .toDF("doc_id", "text")
    val r = ext.Curation.contextWindows(docs, c = 5L)
      .as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 2L, 2L -> 1L))
  }

  test("hardNegatives: non-positive top-k with the false-negative " +
      "safety check — a near-duplicate of the positive is flagged unsafe") {
    val docs = Seq(
      (0L, "p q r"),
      (1L, "a b z"),       // shares {a,b} with the positive → UNSAFE
      (2L, "a y x w"),     // shares {a} → safe
      (3L, "a b c"))       // the query/positive (3 % 97 = 3... pred below)
      .toDF("doc_id", "text")
    val r = ext.Retrieval.hardNegatives(docs, col("doc_id") === 3, k = 3)
      .as[(Long, Long, Long, Long, Long, Boolean)]
      .collect().sortBy(_._2).toList
    // doc1 scores 2/4, doc2 scores 1/6; doc0 has no overlap → absent
    assert(r == List(
      (3L, 1L, 1L, 2L, 4L, false),   // 2·2 < 4 fails → unsafe
      (3L, 2L, 2L, 1L, 6L, true)))
  }

  test("sftManifest: monotone stages — template gate then usability " +
      "gate — with conversation/pair/token survival") {
    val base = 1722470400L * 1000000000L
    val events = Seq(
      // u1 clean + paired: user(2) asst(5)
      (1L, base + 1L, 1L, "click", 1L), (2L, base + 2L, 1L, "view", 4L),
      // u2 violating: user(1) user(2) asst(3)
      (3L, base + 1L, 2L, "click", 0L), (4L, base + 2L, 2L, "signup", 1L),
      (5L, base + 3L, 2L, "view", 2L),
      // u3 clean, unpaired: lone user(7)
      (6L, base + 1L, 3L, "purchase", 6L))
      .toDF("event_id", "ts", "user_id", "event_type", "k")
    val r = ext.Dialogue.sftManifest(events, col("k") + 1L)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(x => x._1 -> x).toMap
    assert(r("all") == (("all", 3L, 2L, 20L, 8L)))
    assert(r("clean") == (("clean", 2L, 1L, 14L, 5L)))
    assert(r("paired") == (("paired", 1L, 1L, 7L, 5L)))
  }

  test("shardBalance: snake assignment off the descending rank balances " +
      "a linear length spread perfectly") {
    // lengths 16..1 over 16 docs, 4 workers: blocks {0,1,2,3},{3,2,1,0},…
    // every worker gets one doc per block → identical 34-char loads
    val docs = (1 to 16).map(i => (i.toLong, "x" * (17 - i)))
      .toDF("doc_id", "text")
    val r = ext.Curation.shardBalance(docs, length(col("text")),
      nWorkers = 4)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toList
    assert(r == List((0L, 4L, 34L), (1L, 4L, 34L), (2L, 4L, 34L),
      (3L, 4L, 34L)))
  }

  test("gateAgreement: independent gates cross-tabulate; disagreement " +
      "cells carry the docs the gates dispute") {
    val docs = Seq(
      (0L, "a b a b"),     // ref; all three gates pass
      (1L, "x y"),         // ref; model gate fails (nt ≤ 3)
      (2L, "a b a b c"),   // held out; "a b"/"b a" known → lm passes
      (3L, "bad q"))       // blocklisted, short, unknown bigram → all fail
      .toDF("doc_id", "text")
    val r = ext.Curation.gateAgreement(docs, blockWords = Seq("bad"),
      maxPct = 0, bias = -3L, wTokens = 1L, wStop = 0L, wDistinct = 0L,
      refPred = col("doc_id") < 2)
      .as[(Boolean, Boolean, Boolean, Long, Long)].collect()
      .map(x => (x._1, x._2, x._3) -> (x._4, x._5)).toMap
    assert(r == Map(
      (true, true, true) -> ((2L, 16L)),
      (true, false, true) -> ((1L, 3L)),
      (false, false, false) -> ((1L, 5L))))
  }

  test("toolCallAudit: orphan results are the deepest dip, unclosed " +
      "calls the re-based final balance; text turns don't move the " +
      "balance") {
    val base = 1722470400L * 1000000000L
    val events = Seq(
      // u1 ok: call result text call result
      (1L, base + 1, 1L, "cart"), (2L, base + 2, 1L, "purchase"),
      (3L, base + 3, 1L, "view"), (4L, base + 4, 1L, "cart"),
      (5L, base + 5, 1L, "purchase"),
      // u2 orphan then unclosed: result call  (calls==results but broken)
      (6L, base + 1, 2L, "purchase"), (7L, base + 2, 2L, "cart"),
      // u3 unclosed only: call call result
      (8L, base + 1, 3L, "cart"), (9L, base + 2, 3L, "cart"),
      (10L, base + 3, 3L, "purchase"),
      // u4 no tool traffic at all
      (11L, base + 1, 4L, "view"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val r = ext.Dialogue.toolCallAudit(events)
      .as[(Long, Long, Long, Long, Long, Boolean)]
      .collect().sortBy(_._1).toList
    assert(r == List(
      (1L, 2L, 2L, 0L, 0L, true),
      (2L, 1L, 1L, 1L, 1L, false),
      (3L, 2L, 1L, 0L, 1L, false),
      (4L, 0L, 0L, 0L, 0L, true)))
  }

  test("forgetAudit: documents mentioning any deleted entity are " +
      "tombstoned; mentions counted; clean sources report zeros") {
    val docs = Seq(
      (1L, "s1", "mail a@x.com twice a@x.com"),
      (2L, "s1", "only b@y.org here"),
      (3L, "s2", "none at all"))
      .toDF("doc_id", "source", "text")
    val deletes = Seq("a@x.com", "unused@z.io").toDF("email")
    val r = ext.Safety.forgetAudit(docs, col("text"), deletes)
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1).toList
    assert(r(0) == (("s1", 2L, 1L, 26L, 2L)))
    assert(r(1) == (("s2", 1L, 0L, 0L, 0L)))
  }

  test("mixtureEpochs: 3× budget over √-temperature quotas upsamples " +
      "small sources hardest; quotas sum to the budget") {
    // sources of 100 vs 4 docs: √-weights 10:2, budget 312 →
    // quotas 260/52 → epochs 2.6× vs 13× — the small source gets
    // flagged at the 4× ceiling
    val docs = ((1 to 100).map(i => (i.toLong, "big")) ++
      (101 to 104).map(i => (i.toLong, "small")))
      .toDF("doc_id", "source")
    val r = ext.Curation.mixtureEpochs(docs, budgetNum = 3, budgetDen = 1)
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map(x => x._1 -> x).toMap
    assert(r("big")._2 == 100L && r("small")._2 == 4L)
    assert(r("big")._3 + r("small")._3 == 312L, s"quotas must sum: $r")
    assert(!r("big")._5 && r("small")._5,
      s"only the small source should oversample: $r")
    assert(r("small")._4 > 4000L && r("big")._4 < 4000L)
  }

  test("decontamSpans: eval-gram hits merge to removal spans at the " +
      "token grain; non-abutting hits stay separate spans; eval docs " +
      "are absent from the plan") {
    val docs = Seq(
      (0L, "a b c d e"),          // eval (0 % 20 == 0)
      (1L, "x a b c d y"),        // hits at pos 2,3 → one merged span
      (2L, "a b c z c d e"),      // hits at pos 1,5 → two spans
      (3L, "nothing here at all"))
      .toDF("doc_id", "text")
    val r = ext.Curation.decontamSpans(docs, col("doc_id") % 20 === 0,
      n = 3)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toList
    assert(r == List(
      (1L, 2L, 1L, 4L),
      (2L, 2L, 2L, 6L),
      (3L, 0L, 0L, 0L)))
  }

  test("q173 plan: pure per-row audit — zero joins, one exchange") {
    val df = SparkEntry.queries("q173_embedding_audit")(spark, sf)
    df.collect()
    // the adaptive plan string prints Final AND Initial — count the final
    val full = df.queryExecution.executedPlan.toString
    val p = full.split("== Initial Plan ==")(0)
    assert(!p.contains("Join"), s"unexpected join in the audit:\n$p")
    assert("Exchange".r.findAllIn(p).length <= 1,
      s"audit should shuffle once (label rollup):\n$p")
    assert(p.contains("partial_sum"), s"no map-side partials:\n$p")
  }

  // ----------------------------------------- preference pairs (q216)

  test("preferencePairs: argmax/argmin per user, deterministic ties, " +
    "margin gate, degenerate users excluded") {
    val events = Seq(
      // user 1: clear margin 80.00 → (view chosen, click rejected)
      (1L, 1L, "click", 10.00), (1L, 2L, "view", 90.00),
      (1L, 3L, "error", 50.00),
      // user 2: all values tie → chosen == rejected row → excluded
      (2L, 4L, "a", 20.00), (2L, 5L, "b", 20.00),
      // user 3: margin 20.00 below the 30.00 gate → excluded
      (3L, 6L, "c", 10.00), (3L, 7L, "d", 30.00),
      // user 4: singleton → excluded
      (4L, 8L, "e", 10.00),
      // user 5: chosen-side value tie → smallest event_id ("x") wins
      (5L, 9L, "x", 50.00), (5L, 10L, "y", 50.00), (5L, 11L, "z", 10.00))
      .toDF("user_id", "event_id", "event_type", "value")
    val r = ext.Dialogue.preferencePairs(events, minMarginCents = 3000L)
      .as[(String, String, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(r.toSeq == Seq(
      ("view", "click", 1L, 8000L, 8000L, 8000L),
      ("x", "z", 1L, 4000L, 4000L, 4000L)))
  }

  test("q216 plan: one prompt-key aggregation, no per-group sort window") {
    val p = planOf(SparkEntry.queries("q216_preference_pairs")(spark, sf))
    assert(!p.contains("Window"), s"argmax should be max(struct), " +
      s"not a rank window:\n$p")
    assert(p.contains("partial_max") || p.contains("partial_min"),
      s"no map-side combine on the prompt key:\n$p")
  }

  // ------------------------------------------- shuffle quality (q217)

  test("shuffleQuality: one-source corpus is all same-source runs; " +
    "all-distinct corpus interleaves perfectly") {
    val one = (0 until 10).map(i => (i.toLong, "A"))
      .toDF("doc_id", "source")
    val r1 = ext.Curation.shuffleQuality(one, nEpochs = 2)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(r1.toSeq == Seq(
      (0L, 9L, 9L, 1L, 1000000L, 1000000L, 9L),
      (1L, 9L, 9L, 1L, 1000000L, 1000000L, 9L)))
    val dis = (0 until 10).map(i => (i.toLong, s"s$i"))
      .toDF("doc_id", "source")
    val r2 = ext.Curation.shuffleQuality(dis, nEpochs = 2)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(r2.toSeq == Seq(
      (0L, 9L, 0L, 10L, 0L, 0L, 0L),
      (1L, 9L, 0L, 10L, 0L, 0L, 0L)))
  }

  test("shuffleQuality epochs are distinct permutations and the readout " +
    "is alive (a bare affine key measured exactly 0 same-source pairs)") {
    // modular source layout — the exact shape that zeroed the affine key
    val docs = (0 until 200).map(i => (i.toLong, s"s${i % 5}"))
      .toDF("doc_id", "source")
    val r = ext.Curation.shuffleQuality(docs, nEpochs = 3)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(r.length == 3)
    // expectation: 5 sources × 40·39 ×1e6 div (200·199) = 195979 ppm
    assert(r.forall(_._6 == 195979L))
    // alive on every epoch (not degenerate-0, not sorted-order 195) and
    // within 3× of the random expectation either way
    r.foreach { e =>
      assert(e._3 > 0L && e._3 < 60L, s"degenerate adjacency: $e")
    }
    // different epochs produce different adjacency sets (distinct
    // permutations) — identical counts in all 3 would be suspicious
    assert(r.map(_._3).distinct.length >= 2, r.toSeq.toString)
  }

  test("q217 plan: corpus rank is grid-bucket-partitioned — the epoch " +
    "permutation never sorts the corpus in one partition") {
    val p = planOf(SparkEntry.queries("q217_shuffle_quality")(spark, sf))
    assert(p.contains("windowspecdefinition(b#"),
      s"grid-rank window lost its bucket partitioning:\n$p")
    assert(!p.contains("rangepartitioning"),
      s"global corpus sort leaked into the epoch rank:\n$p")
  }

  // ----------------------------------------------- best-of-n (q218)

  test("bestOfN: hand-computed order statistic, degenerate distribution " +
    "has zero uplift") {
    val docs = Seq(
      (1L, "A", 1L), (2L, "A", 1L), (3L, "A", 2L),
      (4L, "B", 5L), (5L, "B", 5L))
      .toDF("doc_id", "source", "v")
    val r = ext.Retrieval.bestOfN(docs, col("v"), nDraws = 2)
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1)
    // A: E[max2] = (1·(2²−0) + 2·(3²−2²)) / 3² = 14/9 → 1555555 (floor)
    assert(r(0) == (("A", 3L, 1333333L, 1555555L, 222222L)))
    // B: single value — best-of-n buys nothing
    assert(r(1) == (("B", 2L, 5000000L, 5000000L, 0L)))
  }

  test("bestOfN uplift is non-negative and bounded by the max value") {
    val docs = (0 until 300).map(i =>
      (i.toLong, s"s${i % 3}", 50L + (i * 37) % 200))
      .toDF("doc_id", "source", "v")
    val r = ext.Retrieval.bestOfN(docs, col("v"))
      .as[(String, Long, Long, Long, Long)].collect()
    assert(r.length == 3)
    r.foreach { case (_, _, mean, best, uplift) =>
      assert(uplift >= 0L && best - mean == uplift)
      assert(best <= 249L * 1000000L)
      assert(best >= mean)
    }
  }

  // ----------------------------------------- span corruption (q219)

  test("spanCorruption: accounting identities, ~15% mass, determinism, " +
    "empty docs kept as zeros") {
    val docs = ((0 until 50).map(i =>
      (i.toLong, (0 until 200).map(j => s"w$j").mkString(" "))) :+
      (99L, "   "))
      .toDF("doc_id", "text")
    val r = ext.Transforms.spanCorruption(docs)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(r.length == 51)
    val empty = r.find(_._1 == 99L).get
    assert(empty == ((99L, 0L, 0L, 0L, 0L, 0L, 0L)))
    r.filter(_._1 != 99L).foreach {
      case (_, nToks, nSpans, corrupted, inLen, tgtLen, fp) =>
        assert(nToks == 200L)
        assert(nSpans >= 1L && corrupted >= nSpans && corrupted <= nToks)
        // sentinel accounting: input keeps survivors + one sentinel per
        // span; target is the masked mass + one sentinel per span
        assert(inLen == nToks - corrupted + nSpans)
        assert(tgtLen == corrupted + nSpans)
        assert(inLen + tgtLen == nToks + 2 * nSpans)
        assert(fp != 0L)
    }
    val mass = r.map(_._4).sum.toDouble / r.map(_._2).sum
    assert(mass > 0.10 && mass < 0.20, s"corruption mass $mass")
    // deterministic: a re-run is bit-identical
    val r2 = ext.Transforms.spanCorruption(docs)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(r.sortBy(_._1).toSeq == r2.sortBy(_._1).toSeq)
  }

  test("q219 plan: per-doc windows only — no corpus-global sort or " +
    "single-partition window on the position path") {
    val p = planOf(SparkEntry.queries("q219_span_corruption")(spark, sf))
    assert(p.contains("windowspecdefinition(doc_id#"),
      s"span merge lost its per-doc partitioning:\n$p")
    assert(!p.contains("rangepartitioning"),
      s"global sort leaked into the span merge:\n$p")
  }

  // -------------------------------------------- dedup impact (q220)

  test("dedupImpact: uneven dedup shifts shares; exact ppm arithmetic") {
    val docs = Seq(
      (1L, "A", "same prefix text here"), (2L, "A", "same prefix text here"),
      (3L, "B", "unique one"), (4L, "B", "unique two"))
      .toDF("doc_id", "source", "text")
    val r = ext.Curation.dedupImpact(docs)
      .as[(String, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    // A loses its duplicate: 2→1 kept of 4→3 total
    assert(r(0) == (("A", 2L, 1L, 500000L, 333333L, -166667L)))
    assert(r(1) == (("B", 2L, 2L, 500000L, 666666L, 166666L)))
  }

  // ----------------------------------------- train preflight (q221)

  test("q221 trainPreflight: 4 checks, both branches alive, pass is the " +
    "threshold inequality") {
    val r = SparkEntry.queries("q221_train_preflight")(spark, sf)
      .as[(String, Long, Long, Boolean)].collect()
    assert(r.length == 4)
    assert(r.map(_._1).toSet == Set("eval_contam_ppm",
      "shard_imbalance_ppm", "max_epochs_x1000", "blocked_rate_ppm"))
    r.foreach { case (_, v, t, p) => assert(p == (v <= t)) }
    // both branches demonstrably fire on the fixture
    assert(r.exists(_._4) && r.exists(!_._4),
      s"preflight checks all on one side: ${r.toSeq}")
    // the oversampling check is the designed failure (14.5 epochs max)
    assert(r.find(_._1 == "max_epochs_x1000").exists(!_._4))
  }

  // --------------------------------------------- corpus digest (q222)

  test("corpusDigest: order-invariant, content- and identity-sensitive") {
    val docs = Seq((1L, "A", "alpha"), (2L, "A", "beta"), (3L, "B", "g"))
      .toDF("doc_id", "source", "text")
    val base = ext.Curation.corpusDigest(docs)
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    // row order cannot change the digest (sum commutes)
    val shuffled = ext.Curation.corpusDigest(
      docs.orderBy(col("text").desc).repartition(7))
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(base.toSeq == shuffled.toSeq)
    assert(base(0)._2 == 2L && base(0)._3 == 9L)
    // swapping texts BETWEEN ids keeps the text multiset but must change
    // the digest (identity is folded in)
    val swapped = ext.Curation.corpusDigest(
      Seq((1L, "A", "beta"), (2L, "A", "alpha"), (3L, "B", "g"))
        .toDF("doc_id", "source", "text"))
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(swapped(0)._4 != base(0)._4)
    assert(swapped(1)._4 == base(1)._4) // untouched source unchanged
    // one-char edit changes the digest
    val edited = ext.Curation.corpusDigest(
      Seq((1L, "A", "alphb"), (2L, "A", "beta"), (3L, "B", "g"))
        .toDF("doc_id", "source", "text"))
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(edited(0)._4 != base(0)._4)
  }

  // ------------------------------------------ truncation audit (q223)

  test("truncationAudit: exact per-context doc and token-loss accounting") {
    val docs = Seq((1L, "a b c"), (2L, "a b c d e"), (3L, "a"))
      .toDF("doc_id", "text")
    val r = ext.Curation.truncationAudit(docs, contexts = Seq(2L, 4L))
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .sortBy(_._1)
    // c=2: docs 1 (3 toks, loses 1) and 2 (5 toks, loses 3) truncate
    assert(r(0) == ((2L, 3L, 2L, 666666L, 9L, 4L, 444444L)))
    // c=4: only doc 2 truncates, loses 1
    assert(r(1) == ((4L, 3L, 1L, 333333L, 9L, 1L, 111111L)))
  }

  // ---------------------------------------- generation loops (q224)

  test("generationLoops: smallest period wins, tail-window semantics, " +
    "clean and empty docs are period 0") {
    val stutter = (1 to 30).map(_ => "x").mkString(" ")   // period 1
    val cycle = (1 to 15).map(_ => "u v").mkString(" ")   // period 2
    val four = (1 to 8).map(_ => "a b c d").mkString(" ") // period 4
    // head differs, but the LAST 24 tokens are pure stutter
    val tailOnly = "h1 h2 h3 h4 h5 h6 " +
      (1 to 24).map(_ => "z").mkString(" ")
    val docs = Seq(
      (1L, "S", stutter), (2L, "S", cycle), (3L, "S", four),
      (4L, "S", tailOnly), (5L, "S", "the quick brown fox"),
      (6L, "S", "   "))
      .toDF("doc_id", "source", "text")
    val r = ext.TextStats.generationLoops(docs, col("text"))
      .as[(String, Long, Long)].collect()
      .map { case (_, p, n) => p -> n }.toMap
    // stutter + tailOnly → period 1; cycle → 2; four → 4; clean + empty → 0
    assert(r == Map(1L -> 2L, 2L -> 1L, 4L -> 1L, 0L -> 2L))
  }

  // --------------------------------------------- epoch exposure (q225)

  test("epochExposure: hand-computed largest-remainder quotas split " +
    "into base and base+1 exposure cells that sum back to the quota") {
    val docs = ((1 to 4).map(i => (i.toLong, "A")) :+ (9L, "B"))
      .toDF("doc_id", "source")
    val r = ext.Curation.epochExposure(docs, budgetNum = 2L)
      .as[(String, Long, Long)].collect().sortBy(t => (t._1, t._2))
    // budget 10; w = (2e6, 1e6) → quotas A=7, B=3 (A takes the leftover)
    // A: 7 = 1·4 + 3 extras → {1:1, 2:3}; B: 3 = 3·1 → {3:1}
    assert(r.toSeq == Seq(("A", 1L, 1L), ("A", 2L, 3L), ("B", 3L, 1L)))
    // Σ exposures·docs == quota, per group
    assert(r.filter(_._1 == "A").map(t => t._2 * t._3).sum == 7L)
    // deterministic extras: a re-run is identical
    val r2 = ext.Curation.epochExposure(docs, budgetNum = 2L)
      .as[(String, Long, Long)].collect().sortBy(t => (t._1, t._2))
    assert(r.toSeq == r2.toSeq)
  }

  // ------------------------------------------- batch collisions (q226)

  test("batchCollisions: nested batch sizes give monotone collision " +
    "mass, full-corpus batch captures every dup pair") {
    // 12 docs: two dup triples (same text) + 6 unique
    val docs = (0 until 12).map { i =>
      val t = if (i < 3) "dup one text" else if (i < 6) "dup two text"
              else s"unique text number $i"
      (i.toLong, t)
    }.toDF("doc_id", "text")
    val r = ext.Curation.batchCollisions(docs, batchSizes = Seq(3L, 12L))
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    // two triples → 3+3 = 6 dup pairs corpus-wide
    assert(r.forall(_._3 == 6L))
    val by = r.map(t => t._1 -> t).toMap
    assert(by(12L)._2 == 1L && by(12L)._4 == 6L && by(12L)._5 == 1L)
    // batches of 3 nest inside the single batch of 12 → monotone
    assert(by(3L)._2 == 4L && by(3L)._4 <= 6L)
  }

  // ----------------------------------------------- digest delta (q227)

  test("digestDelta: modified, added, and removed sources all flag; " +
    "identical sources stay clean") {
    val a = Seq((1L, "A", "alpha"), (2L, "B", "beta"), (3L, "C", "gamma"))
      .toDF("doc_id", "source", "text")
    val b = Seq((1L, "A", "alpha"), (2L, "B", "beta CHANGED"),
      (4L, "D", "brand new"))
      .toDF("doc_id", "source", "text")
    val r = ext.Curation.digestDelta(a, b)
      .select(col("source"), col("changed")).as[(String, Boolean)]
      .collect().toMap
    assert(r == Map("A" -> false, "B" -> true, "C" -> true, "D" -> true))
  }

  test("q218/q220/q222 plans: value-count window stays source-" +
    "partitioned, dedup totals broadcast, digest is one exchange with " +
    "no join") {
    val p218 = planOf(SparkEntry.queries("q218_best_of_n")(spark, sf))
    assert(p218.contains("windowspecdefinition(source#"),
      s"best-of-n CDF window lost its source partitioning:\n$p218")
    val p220 = planOf(SparkEntry.queries("q220_dedup_impact")(spark, sf))
    assert(p220.contains("windowspecdefinition(fp#"),
      s"keeper window lost its fingerprint partitioning:\n$p220")
    assert(p220.contains("BroadcastNestedLoopJoin") ||
      p220.contains("BroadcastExchange"),
      s"share totals not broadcast:\n$p220")
    val df222 = SparkEntry.queries("q222_corpus_digest")(spark, sf)
    df222.collect()
    val p222 = df222.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!p222.contains("Join"), s"unexpected join in the digest:\n$p222")
    assert("Exchange".r.findAllIn(p222).length <= 1,
      s"digest should shuffle once (source rollup):\n$p222")
  }

  // ------------------------------------------- annealing recipe (q228)

  test("annealingRecipe: hand-computed two-phase quotas conserve the " +
    "budget; gate-less sources get no anneal; empty gate leaves the " +
    "tranche visibly unallocated") {
    val docs = ((1 to 4).map(i => (i.toLong, "A", 400L)) ++
      (5 to 8).map(i => (i.toLong, "B", 100L)))
      .toDF("doc_id", "source", "n_chars")
    val r = ext.Curation.annealingRecipe(docs, col("n_chars") >= 300L,
      budget = 100L, annealPermille = 200L)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .sortBy(_._1)
    // p1 = 80 uniform (40/40); p2 = 20, all to A (B passes nothing)
    assert(r.toSeq == Seq(
      ("A", 4L, 4L, 40L, 20L, 60L, 100000L),
      ("B", 4L, 0L, 40L, 0L, 40L, -100000L)))
    assert(r.map(_._6).sum == 100L)
    // nothing passes → anneal tranche unallocated, not silently uniform
    val none = ext.Curation.annealingRecipe(docs, lit(false),
      budget = 100L, annealPermille = 200L)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(none.map(_._6).sum == 80L)
    assert(none.forall(_._5 == 0L))
  }

  test("q226 plan: batch rank is grid-bucket-partitioned, dup anchor " +
    "broadcast") {
    val p = planOf(SparkEntry.queries("q226_batch_collisions")(spark, sf))
    assert(p.contains("windowspecdefinition(b#"),
      s"batch rank lost its bucket partitioning:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"),
      s"global dup anchor not broadcast:\n$p")
  }
}
