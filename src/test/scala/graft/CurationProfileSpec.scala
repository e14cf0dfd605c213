package graft

import graft.ext.{Curation, Sessions, Similarity}
import graft.ops.Profile
import org.apache.spark.sql.functions._

/** Round-4 extensions: contamination check, repetition signals, chunk-level
  * dedup, gap-fill + LOCF, histogram/profile, weighted sampling, int8
  * quantization.
  */
class CurationProfileSpec extends SparkSuite {
  import spark.implicits._

  test("contamination: verbatim eval copy flags 1.0, disjoint doc 0.0, short doc safe") {
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon"),      // eval (id % 2 == 0)
      (1L, "alpha beta gamma delta epsilon"),      // full copy of eval → 1.0
      (3L, "zeta eta theta iota kappa"),           // disjoint → 0.0
      (5L, "one two"),                             // < 3 tokens → no 3-grams
      (7L, "alpha beta gamma nu xi omicron pi")    // shares 1 of 5 grams
    ).toDF("doc_id", "text")
    val r = Curation.contamination(docs, col("doc_id") % 2 === 0, n = 3, flagAt = 0.5)
      .as[(Long, Long, Long, Double, Boolean)].collect()
      .map(t => t._1 -> t).toMap
    assert(r.keySet === Set(1L, 3L, 5L, 7L))
    assert(r(1L) === ((1L, 3L, 3L, 1.0, true)))
    assert(r(3L) === ((3L, 3L, 0L, 0.0, false)))
    assert(r(5L) === ((5L, 0L, 0L, 0.0, false)))
    assert(r(7L)._2 === 5L && r(7L)._3 === 1L && !r(7L)._5)
  }

  test("repetition signals: alternating text shows high dup and top share") {
    val docs = Seq((1L, "a b a b a b"), (2L, "w x y z"), (3L, ""))
      .toDF("doc_id", "text")
    val r = Curation.repetitionSignals(docs)
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(t => t._1 -> t).toMap
    // "a b a b a b": 2-grams [ab, ba, ab, ba, ab] → 5 total, 2 distinct
    assert(r(1L)._2 === 5L)
    assert(math.abs(r(1L)._3 - 0.6) < 1e-12)        // dup_2gram_frac
    assert(math.abs(r(1L)._5 - 0.6) < 1e-12)        // top share = 3/5
    assert(r(2L)._3 === 0.0)                        // all distinct
    assert(math.abs(r(2L)._5 - 1.0 / 3) < 1e-12)    // top share = 1/3
    assert(r(3L) === ((3L, 0L, 0.0, 0.0, 0.0)))     // blank doc guarded
  }

  test("chunk dedup: repeated 8-token chunk is kept only at first occurrence") {
    val eight = "t1 t2 t3 t4 t5 t6 t7 t8"
    val docs = Seq(
      (1L, s"$eight u1 u2"),     // chunks: [eight, "u1 u2"] — both kept
      (2L, s"$eight v1"),        // chunk "eight" removed, "v1" kept
      (3L, "w1 w2 w3")           // single short chunk, kept
    ).toDF("doc_id", "text")
    val r = Curation.chunkDedup(docs, chunkTokens = 8)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(t => t._1 -> t).toMap
    assert(r(1L) === ((1L, 2L, 2L, 0L, 1.0)))
    assert(r(2L) === ((2L, 2L, 1L, 1L, 0.5)))
    assert(r(3L) === ((3L, 1L, 1L, 0L, 1.0)))
  }

  test("gapfill: dense daily spine, zero-filled days, LOCF carries revenue") {
    val day0 = 19700L * 86400000000L // an arbitrary day, in µs
    val events = Seq(
      // user 1: purchases on day 0 and day 3, a view on day 1, nothing day 2
      (1L, day0 + 1000L, 1L, "purchase", 10.0),
      (2L, day0 + 86400000000L, 1L, "view", 1.0),
      (3L, day0 + 3 * 86400000000L, 1L, "purchase", 5.0)
    ).map { case (id, us, u, t, v) => (id, us * 1000L, u, t, v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Sessions.gapfillDaily(events)
      .orderBy("day")
      .as[(Long, Long, Long, Option[Double], Option[Double], Boolean)]
      .collect()
    assert(r.length === 4) // days 0..3 dense
    assert(r.map(_._3).toSeq === Seq(1L, 1L, 0L, 1L))     // n_events
    assert(r.map(_._6).toSeq === Seq(false, false, true, false))
    assert(r.map(_._5).toSeq ===
      Seq(Some(10.0), Some(10.0), Some(10.0), Some(5.0))) // LOCF
    assert(r(1)._4.isEmpty && r(2)._4.isEmpty)            // raw revenue null
  }

  test("histogram: buckets partition the extent; counts total the input") {
    val df = Seq(("a", 0.0), ("a", 1.0), ("a", 15.9), ("b", 16.0), ("b", 8.0))
      .toDF("g", "v")
    val h = Profile.histogram(df, "g", "v", nBuckets = 16)
      .as[(String, Long, Double, Double, Long)].collect()
    assert(h.map(_._5).sum === 5)
    // extent [0, 16], width 1: value 16.0 clamps into bucket 15
    assert(h.filter(_._1 == "b").map(r => (r._2, r._5)).toSet ===
      Set((15L, 1L), (8L, 1L)))
    // degenerate extent: all values equal → single bucket 0
    val one = Profile.histogram(Seq(("x", 3.0), ("y", 3.0)).toDF("g", "v"), "g", "v")
    assert(one.select("bucket").distinct().as[Long].collect().toSeq === Seq(0L))
  }

  test("column profile: one row per column with null/distinct/minmax") {
    val df = Seq((Some(1L), Some("x")), (Some(2L), None), (None, Some("a")))
      .toDF("k", "s")
    val p = Profile.columnProfile(df, Seq("k"), Seq("s"))
      .as[(String, Long, Long, Long, Option[Double], Option[Double],
        Option[String], Option[String])].collect()
      .map(r => r._1 -> r).toMap
    assert(p("k") === (("k", 3L, 1L, 2L, Some(1.0), Some(2.0), None, None)))
    assert(p("s") === (("s", 3L, 1L, 2L, None, None, Some("a"), Some("x"))))
  }

  test("expectations: null-aware rules and exact uniqueness in one pass") {
    val df = Seq(
      (Some(1L), Some(10.0)), (Some(1L), Some(-5.0)), // dup key, range hit
      (None, None), (Some(2L), Some(99.0))            // null key/value
    ).toDF("k", "v")
    val r = Profile.expectations(df,
        rules = Seq(
          "k_not_null" -> col("k").isNull,
          "v_range" -> (col("v") < 0.0 || col("v") > 50.0 || col("v").isNull)),
        uniqueCols = Seq("k"))
      .as[(String, Long, Long)].collect().map(t => t._1 -> t._2).toMap
    assert(r === Map("k_not_null" -> 1L, "v_range" -> 3L, "unique_k" -> 2L))
  }

  test("weighted sample: deterministic, k per class, keys ascending") {
    val r1 = ops.Relational.q56WeightedSample(spark, sf)
    val r2 = ops.Relational.q56WeightedSample(spark, sf)
    assert(r1.collect().toSet === r2.collect().toSet) // reproducible
    val grouped = r1.as[(String, Long, Long, Double, Double)].collect()
      .groupBy(_._1)
    grouped.values.foreach { rows =>
      assert(rows.length <= 8)
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._5).toSeq === sorted.map(_._5).sorted.toSeq)
    }
  }

  test("funnel: strict order and conversion window gate each hop") {
    def ev(id: Long, us: Long, u: Long, t: String) = (id, us * 1000L, u, t, 0.0)
    val H = 3600000000L
    val events = Seq(
      // user 1: full funnel inside the window
      ev(1, 0, 1, "view"), ev(2, H, 1, "click"), ev(3, 2 * H, 1, "purchase"),
      // user 2: click BEFORE the first view — rejected (strictly after)
      ev(4, H, 2, "click"), ev(5, 2 * H, 2, "view"),
      // user 3: click arrives after the conversion window
      ev(6, 0, 3, "view"), ev(7, 30 * H, 3, "click"),
      // user 4: never views — absent from the funnel
      ev(8, 0, 4, "purchase")
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = ext.Sessions.funnel(events, Seq("view", "click", "purchase"),
        convWindowUs = 24 * H)
      .as[(Long, Option[Long], Option[Long], Option[Long], Long)].collect()
      .map(t => t._1 -> t).toMap
    assert(r.keySet === Set(1L, 2L, 3L))
    assert(r(1L) === ((1L, Some(0L), Some(H), Some(2 * H), 3L)))
    assert(r(2L)._5 === 1L && r(2L)._3.isEmpty)
    assert(r(3L)._5 === 1L)
  }

  test("json rollup: missing/NULL props yield NULL k, counted but not summed") {
    val events = Seq(
      (1L, 1000000L, 1L, "view", 0.0, """{"k": 7}"""),
      (2L, 2000000L, 1L, "view", 0.0, """{"x": 1}"""), // no k field
      (3L, 3000000L, 1L, "view", 0.0, null)
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    events.createOrReplaceTempView("__jr")
    val k = get_json_object(col("props"), "$.k").cast("long")
    val r = events.select(col("event_type"), k.as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), count(col("k")).as("n_with_k"),
        sum(col("k")).as("sum_k"))
      .as[(String, Long, Long, Option[Long])].head()
    assert(r === (("view", 3L, 1L, Some(7L))))
  }

  test("corpus invariants: chunk conservation, contamination bounds, quantize range") {
    val docs = Tables.documents(spark, sf)
    // chunk dedup conserves mass: Σ n_kept = |distinct chunks|, and
    // n_kept + n_removed = n_chunks per doc
    val cd = Curation.chunkDedup(docs, chunkTokens = 8)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(cd.forall(r => r._3 + r._4 == r._2))
    val distinctChunks = docs
      .select(col("doc_id"), ext.TextStats.tokens(col("text")).as("__toks"))
      .filter(size(col("__toks")) > 0)
      .select(explode(org.apache.spark.sql.functions.transform(
        sequence(lit(0),
          ceil(size(col("__toks")).cast("double") / 8).cast("int") - 1),
        c => concat_ws(" ", slice(col("__toks"), c * 8 + 1, lit(8))))).as("c"))
      .distinct().count()
    assert(cd.map(_._3).sum === distinctChunks)

    // contamination: overlap bounded by gram count; eval docs excluded
    val cont = Curation.contamination(docs, col("doc_id") % 20 === 0)
      .as[(Long, Long, Long, Double, Boolean)].collect()
    assert(cont.forall(r => r._3 <= r._2))
    assert(cont.forall(r => r._1 % 20 != 0))
    assert(cont.forall(r => r._4 >= 0.0 && r._4 <= 1.0))

    // int8 quantization stays in range corpus-wide, scale non-negative
    val qz = ext.Similarity.quantizeInt8(Tables.embeddings(spark, sf))
      .as[(Long, Long, Option[Double], Long, Long, Long, Long)].collect()
    assert(qz.forall(r => r._4 >= -127L && r._5 <= 127L))
    assert(qz.forall(r => r._3.forall(_ >= 0.0)))
  }

  test("fuzzy match: finds within-distance pairs; blocking loses nothing") {
    val docs = Seq((1L, "cat bat cart dog dig zebra")).toDF("doc_id", "text")
    val pairs = ext.Curation.fuzzyVocabPairs(docs, maxDist = 2)
      .as[(String, String, Long)].collect().toSet
    assert(pairs.contains(("bat", "cat", 1L)))
    assert(pairs.contains(("cart", "cat", 1L)))
    assert(pairs.contains(("dig", "dog", 1L)))
    assert(pairs.contains(("bat", "cart", 2L)))
    assert(!pairs.exists(p => p._1 == "zebra" || p._2 == "zebra"))
    // blocking is exact: every pair within maxDist also satisfies the band,
    // so an unblocked join finds the same set
    val vocab = Seq("cat", "bat", "cart", "dog", "dig", "zebra")
    val brute = for {
      a <- vocab; b <- vocab if a < b
      d = levenshteinRef(a, b) if d <= 2
    } yield (a, b, d.toLong)
    assert(pairs === brute.toSet)
  }

  private def levenshteinRef(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  test("IQR outliers: fences replay the exact percentile interpolation") {
    val rows = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_extendedprice"))
      .as[(String, Double)].collect()
    val expected = rows.groupBy(_._1).map { case (flag, vs) =>
      val sorted = vs.map(_._2).sorted
      def pct(p: Double): Double = {
        val pos = p * (sorted.length - 1)
        val (lo, hi) = (math.floor(pos).toInt, math.ceil(pos).toInt)
        if (lo == hi) sorted(lo)
        else (hi - pos) * sorted(lo) + (pos - lo) * sorted(hi)
      }
      val (p25, p75) = (pct(0.25), pct(0.75))
      val iqr = p75 - p25
      flag -> (sorted.count(_ > p75 + 0.5 * iqr).toLong,
        sorted.count(_ < p25 - 0.5 * iqr).toLong)
    }
    val got = ops.Relational.q61IqrOutliers(spark, sf)
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap
    assert(got === expected)
  }

  test("rolling range frame: trailing window counts; ties share a frame") {
    val events = Seq(
      (1L, 1000L, 1L, "e", 1.0),
      (2L, 2000L, 1L, "e", 2.0),   // same window as 1 (range 1500 µs)
      (3L, 2000L, 1L, "e", 4.0),   // TIED ts with 2 — shares its frame
      (4L, 9000L, 1L, "e", 8.0)    // outside the trailing range
    ).map { case (id, us, u, t, v) => (id, us * 1000L, u, t, v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = ext.Sessions.rollingRange(events, windowUs = 1500L)
      .orderBy("event_id")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(r.map(_._4).toSeq === Seq(1L, 3L, 3L, 1L)) // tied rows both see 3
    assert(r.map(_._5).toSeq === Seq(1.0, 7.0, 7.0, 8.0))
  }

  test("quantize: max-magnitude dim hits ±127, zero vector all-zero") {
    val emb = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f)),
      (2L, Array(0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val q = Similarity.quantizeInt8(emb)
      .as[(Long, Long, Option[Double], Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // scale = 1/127; q = round(x·127): [64, -127, 32]
    assert(q(1L)._4 === -127L && q(1L)._5 === 64L)
    assert(q(1L)._6 === (64L + 127L + 32L))
    assert(q(2L)._3 === Some(0.0) && q(2L)._6 === 0L && q(2L)._7 === 0L)
  }

  test("sliding chunks: stride starts, overlap, tail clamp, full token coverage") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")),
      (2L, ""),
      (3L, "solo")
    ).toDF("doc_id", "text")
    val r = Curation.slidingChunks(docs, chunkTokens = 4, stride = 3)
      .as[(Long, Long, Long, Long, String)].collect()
    val d1 = r.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.map(x => (x._2, x._3, x._4)).toSeq ===
      Seq((0L, 1L, 4L), (1L, 4L, 4L), (2L, 7L, 4L), (3L, 10L, 1L)))
    assert(d1.head._5 === "w1 w2 w3 w4")
    assert(d1.last._5 === "w10")
    // consecutive chunks overlap by chunkTokens - stride = 1 token
    assert(d1(0)._5.split(" ").last === d1(1)._5.split(" ").head)
    // every token index is covered by at least one chunk
    val covered = d1.flatMap(x => x._3 until (x._3 + x._4)).toSet
    assert(covered === (1L to 10L).toSet)
    assert(!r.exists(_._1 == 2L), "blank doc must produce no chunks")
    assert(r.filter(_._1 == 3L).map(x => (x._3, x._4, x._5)).toSeq
      === Seq((1L, 1L, "solo")))
  }

  test("sequence packing: greedy bins respect the budget, oversized docs stand alone") {
    val docs = Seq(
      (1L, "w w w"), (2L, "w w w"), (3L, "w w w w"),
      (4L, "w w w w w w"), (5L, "w w")
    ).map { case (id, t) => (id, "s0", t) }.toDF("doc_id", "source", "text")
    val r = Curation.packSequences(docs, budget = 5)
      .orderBy("doc_id")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(r.map(x => (x._2, x._3, x._4, x._5)) === Seq(
      (1L, 3L, 1L, 3L),   // opens bin 1
      (2L, 3L, 2L, 3L),   // 3+3 > 5 → bin 2
      (3L, 4L, 3L, 4L),   // 3+4 > 5 → bin 3
      (4L, 6L, 4L, 6L),   // longer than budget → own bin
      (5L, 2L, 5L, 2L)))  // 6+2 > 5 → bin 5
    // invariant: a bin only exceeds the budget when it holds a single doc
    val byBin = r.groupBy(_._4).view.mapValues(_.map(_._3)).toMap
    byBin.foreach { case (bin, szs) =>
      assert(szs.sum <= 5 || szs.length == 1, s"bin $bin overfull: $szs")
    }
  }

  test("stratified split: fractions sum to 1 per lang, weights on train only") {
    val r = Curation.stratifiedSplit(Tables.documents(spark, sf))
      .as[(String, String, Long, Long, Double, Option[Double])].collect()
    assert(r.map(_._3).sum === Tables.documents(spark, sf).count())
    r.groupBy(_._1).foreach { case (lang, rows) =>
      assert(rows.map(_._3).sum === rows.head._4, s"$lang n_lang mismatch")
      assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-5, s"$lang fracs")
    }
    assert(r.forall(x => x._6.isDefined == (x._2 == "train")))
    // inverse-frequency: bigger train strata get smaller weights
    val ws = r.filter(_._2 == "train").sortBy(_._3).map(_._6.get).toSeq
    assert(ws === ws.sorted.reverse, s"weights not inverse to size: $ws")
  }

  test("language rebalance: every language exactly at the min-language size") {
    val docs = Tables.documents(spark, sf)
    val perLang = docs.groupBy(col("lang")).count()
      .as[(String, Long)].collect().toMap
    val target = perLang.values.min
    val r = Curation.languageRebalance(docs)
      .as[(Long, String, Long, Long)].collect()
    assert(r.forall(_._4 === target))
    assert(r.forall(x => x._3 >= 1 && x._3 <= target))
    val kept = r.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    assert(kept === perLang.keySet.map(_ -> target).toMap,
      s"kept $kept, expected all at $target")
    // deterministic: a second run keeps the identical doc set
    val r2 = Curation.languageRebalance(docs)
      .as[(Long, String, Long, Long)].collect()
    assert(r.map(_._1).sorted.toSeq === r2.map(_._1).sorted.toSeq)
  }
}
