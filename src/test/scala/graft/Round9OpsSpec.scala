package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Round-9 operators: PII scan/redaction, blocklist filtering, bloom-filter
  * semi-join, n-gram novelty — value semantics on crafted inputs plus the
  * plan shapes the scale story depends on.
  */
class Round9OpsSpec extends SparkSuite {
  import spark.implicits._

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  /** Exchange nodes in the plan TREE (formatted explain repeats every node
    * name in the detail section, so a bare substring count double-counts).
    */
  private def exchanges(p: String): Int =
    "Exchange \\(\\d+\\)".r.findAllIn(p).length

  test("piiScan: counts each PII kind and redacts with typed placeholders") {
    val docs = Seq(
      (1L, "hello bob12@mail3.com call +1-555-123-4567 from 10.5.0.35 done"),
      (2L, "no pii here at all"),
      (3L, "two mails a@b.com c@d.com and 10.0.0.1 10.255.0.255"))
      .toDF("doc_id", "text")
    val r = ext.Safety.piiScan(docs, col("text"))
      .select("doc_id", "n_emails", "n_phones", "n_ips", "redacted")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1)
    assert(r(0) == ((1L, 1L, 1L, 1L,
      "hello <EMAIL> call <PHONE> from <IP> done")))
    assert(r(1) == ((2L, 0L, 0L, 0L, "no pii here at all")))
    assert(r(2) == ((3L, 2L, 0L, 2L,
      "two mails <EMAIL> <EMAIL> and <IP> <IP>")))
  }

  test("blocklistScan: keep decision is exact at the integer boundary") {
    val ten = (1 to 9).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, s"bad $ten"),        // 1 blocked of 10 → 100 <= 100, kept
      (2L, s"bad bad $ten w10 w11"), // 2 of 13 → 200 > 130, dropped
      (3L, ""),                  // empty → kept, zero tokens
      (4L, "bad"))               // 1 of 1 → 100 > 10, dropped
      .toDF("doc_id", "text")
    val r = ext.Safety.blocklistScan(docs, col("text"), Seq("bad"), maxPct = 10)
      .select("doc_id", "n_tokens", "n_blocked", "kept")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(r.toSeq == Seq(
      (1L, 10L, 1L, true), (2L, 13L, 2L, false),
      (3L, 0L, 0L, true), (4L, 1L, 1L, false)))
  }

  test("bloomSemiJoin: zero false negatives; FP tail is deterministic") {
    val build = (1L to 50L).toDF("k")
    val probe = (1L to 400L).toDF("k")
    val r = ext.Sketches.bloomSemiJoin(build, col("k"), probe, col("k"),
      bits = 256)
      .as[(Long, Long, Long, Long, Long)].head()
    val (probed, cand, members, fp, bitsSet) = r
    assert(probed == 400L && members == 50L)
    // the defining one-sided guarantee: every member IS a candidate
    assert(cand - fp == members, s"false negatives: $r")
    assert(bitsSet <= 150L && bitsSet > 0L)
    // deterministic: same inputs, same sketch, same FP count
    val again = ext.Sketches.bloomSemiJoin(build, col("k"), probe, col("k"),
      bits = 256).as[(Long, Long, Long, Long, Long)].head()
    assert(again == r)
  }

  test("bloomSemiJoin: negative keys keep the no-false-negative guarantee") {
    // sign-preserving % would emit negative positions (dropped from the
    // mask, null-probed) — pmod keeps hash-derived signed ids safe
    val build = Seq(-5L, -1000000007L, 17L).toDF("k")
    val probe = Seq(-5L, -1000000007L, 17L, -99L, 42L).toDF("k")
    val r = ext.Sketches.bloomSemiJoin(build, col("k"), probe, col("k"),
      bits = 256).as[(Long, Long, Long, Long, Long)].head()
    val (_, cand, members, fp, _) = r
    assert(members == 3L)
    assert(cand - fp == members, s"false negatives on negative keys: $r")
  }

  test("blocklistScan: empty blocklist keeps everything") {
    val docs = Seq((1L, "a b c"), (2L, "")).toDF("doc_id", "text")
    val r = ext.Safety.blocklistScan(docs, col("text"), Seq.empty, maxPct = 0)
      .select("doc_id", "n_blocked", "kept")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(r.toSeq == Seq((1L, 0L, true), (2L, 0L, true)))
  }

  test("bloomPrunedJoin ≡ plain join (pruning is semantics-preserving)") {
    val fact = (1L to 300L).map(i => (i, i % 40)).toDF("o_id", "k")
    val dim = Seq((3L, "a"), (17L, "b"), (39L, "c")).toDF("dk", "name")
    val pruned = ext.Sketches.bloomPrunedJoin(fact, col("k"), dim, col("dk"),
      bits = 256)
      .select("o_id", "k", "name").as[(Long, Long, String)].collect().toSet
    val plain = fact.join(dim, col("k") === col("dk"))
      .select("o_id", "k", "name").as[(Long, Long, String)].collect().toSet
    assert(pruned == plain)
    assert(plain.size == 23) // keys 3,17 hit 8x each, 39 hits 7x in 1..300
  }

  test("groupSplit: every group lands in exactly one split, deterministically") {
    val docs = Seq(
      (1L, "src0", 10L), (2L, "src0", 20L), (3L, "src1", 5L),
      (4L, "src2", 7L), (5L, "src1", 9L))
      .toDF("doc_id", "source", "n_chars")
    // disjointness: per-split group counts sum to the global group count
    val r = ext.Curation.groupSplit(docs, col("source"), col("n_chars"))
      .as[(String, Long, Long, Long)].collect()
    assert(r.map(_._2).sum == 3L, r.toSeq.toString)
    assert(r.map(_._3).sum == 5L && r.map(_._4).sum == 51L)
    // determinism: same inputs → identical assignment
    val again = ext.Curation.groupSplit(docs, col("source"), col("n_chars"))
      .as[(String, Long, Long, Long)].collect()
    assert(r.toSet == again.toSet)
  }

  test("groupSplit: a null group key buckets to train, matching the oracle") {
    val docs = Seq((1L, Option("src0"), 10L), (2L, Option.empty[String], 4L))
      .toDF("doc_id", "source", "n_chars")
    val r = ext.Curation.groupSplit(docs, col("source"), col("n_chars"))
      .as[(String, Long, Long, Long)].collect()
      .map { case (s, g, d, c) => s -> ((g, d, c)) }.toMap
    // src0 fingerprints to train; the null-source doc must land there too
    // (oracle convention: coalesce(fingerprint, 0) → bucket 0), counted in
    // n_docs/total_chars but not in n_groups (count_distinct skips nulls)
    assert(r("train") == ((1L, 2L, 14L)), r.toString)
  }

  test("bloomPrunedJoin fails loudly when fact columns collide with internals") {
    val fact = Seq((1L, 2L)).toDF("k", "__graft_bloom_mask")
    val dim = Seq(1L).toDF("dk")
    val e = intercept[IllegalArgumentException](
      ext.Sketches.bloomPrunedJoin(fact, col("k"), dim, col("dk"), bits = 64))
    assert(e.getMessage.contains("collide"), e.getMessage)
  }

  test("q167 plan: bloom prune filters the fact side BEFORE the shuffle join") {
    val df = SparkEntry.queries("q167_bloom_pruned_join")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the 1-row mask broadcast (BNLJ) must sit UNDER the equi-join: prune
    // first, join the survivors
    val joinAt = p.indexOf("HashJoin")
    val bnljAt = p.indexOf("BroadcastNestedLoopJoin")
    assert(joinAt >= 0 && bnljAt > joinAt,
      s"bloom prune not below the equi-join:\n$p")
  }

  test("ngramNovelty: first occurrence wins; short docs report (0,0)") {
    val docs = Seq(
      (0L, "a b c d"),   // "a b c", "b c d" — both novel
      (1L, "a b c x"),   // "a b c" seen in doc 0, "b c x" novel
      (2L, "q r"))       // shorter than n → no grams
      .toDF("doc_id", "text")
    val r = ext.Curation.ngramNovelty(docs, n = 3)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(r.toSeq == Seq((0L, 2L, 2L), (1L, 2L, 1L), (2L, 0L, 0L)))
  }

  test("property: bloom no-false-negatives over 20 random key universes") {
    // hand-rolled seeded generator (scalatestplus bridge not in the
    // offline cache); covers negative keys, duplicates, empty overlap
    val rnd = new scala.util.Random(90817)
    for (trial <- 1 to 20) {
      val nBuild = 1 + rnd.nextInt(60)
      val build = Seq.fill(nBuild)(rnd.nextLong() % 2000000000L)
      val probe = build.take(rnd.nextInt(nBuild)) ++
        Seq.fill(rnd.nextInt(80))(rnd.nextLong() % 2000000000L)
      val bits = 64 << rnd.nextInt(3)
      val r = ext.Sketches.bloomSemiJoin(
        build.toDF("k"), col("k"), probe.toDF("k"), col("k"), bits = bits)
        .as[(Long, Long, Long, Long, Long)].head()
      val (probed, cand, members, fp, bitsSet) = r
      val truth = build.toSet
      assert(probed == probe.size.toLong, s"trial $trial: $r")
      assert(members == probe.count(truth), s"trial $trial: $r")
      assert(cand - fp == members,
        s"trial $trial (bits=$bits, n=$nBuild): false negatives in $r")
      assert(bitsSet <= math.min(bits.toLong, 3L * nBuild))
    }
  }

  test("property: groupSplit partitions any random group universe") {
    val rnd = new scala.util.Random(41117)
    for (trial <- 1 to 10) {
      val groups = (0 until 1 + rnd.nextInt(30)).map(i => s"g${rnd.nextInt(1000)}_$i")
      val docs = (1 to 120).map { i =>
        (i.toLong, groups(rnd.nextInt(groups.size)), rnd.nextInt(500).toLong)
      }.toDF("doc_id", "source", "n_chars")
      val r = ext.Curation.groupSplit(docs, col("source"), col("n_chars"))
        .as[(String, Long, Long, Long)].collect()
      val distinctGroups = docs.select("source").distinct().count()
      assert(r.map(_._2).sum == distinctGroups, s"trial $trial: group leak")
      assert(r.map(_._3).sum == 120L, s"trial $trial: doc count drift")
    }
  }

  test("q163/q164 plans: pure per-row pipelines — no join, one exchange") {
    // q163 carries the round-19 Spread.ifNarrow input repair (one extra
    // hash exchange on a 1-split local scan; a no-op at lake parallelism)
    // — the OPERATOR contract stays a per-row pipeline into one rollup
    // aggregation exchange
    for ((name, maxEx) <- Seq("q163_pii_redact" -> 2,
        "q164_blocklist" -> 1)) {
      val p = plan(SparkEntry.queries(name)(spark, sf))
      assert(!p.contains("Join"), s"$name has a join:\n$p")
      assert(exchanges(p) <= maxEx,
        s"$name shuffle budget exceeded (rollup + input spread):\n$p")
    }
  }

  test("q165 plan: bitset reaches the probe as a 1-row broadcast, not a shuffle") {
    val p = plan(SparkEntry.queries("q165_bloom_semijoin")(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q166 plan: gram window + per-doc re-agg, bounded shuffle count") {
    val p = plan(SparkEntry.queries("q166_ngram_novelty")(spark, sf))
    assert(p.contains("Window"), p)
    assert(exchanges(p) <= 4, s"q166 shuffle count grew:\n$p")
  }
}
