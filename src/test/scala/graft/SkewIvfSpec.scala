package graft

import graft.ext.{Similarity, Skew}
import org.apache.spark.sql.functions._

/** Skew utilities (result-equivalence with the plain forms) and the IVF
  * approximate top-k (recall vs brute force).
  */
class SkewIvfSpec extends SparkSuite {
  import spark.implicits._

  private lazy val li = Tables.lineitem(spark, sf)

  test("saltedCount ≡ groupBy().count() on a skewed key") {
    val plain = li.groupBy("l_returnflag").count()
      .as[(String, Long)].collect().toMap
    val salted = Skew.saltedCount(li, "l_returnflag", "l_orderkey")
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
  }

  test("saltedSum ≡ groupBy().sum() (exact for integral doubles)") {
    val plain = li.groupBy("l_returnflag").agg(sum("l_quantity"))
      .as[(String, Double)].collect().toMap
    val salted = Skew.saltedSum(li, "l_returnflag", "l_quantity", "l_orderkey")
      .as[(String, Double)].collect().toMap
    assert(salted == plain)
  }

  test("saltedCollectSet ≡ sorted distinct values per key") {
    val plain = li.groupBy("l_returnflag")
      .agg(array_sort(collect_set(col("l_linestatus"))).as("s"))
      .as[(String, Seq[String])].collect().toMap
    val salted = Skew.saltedCollectSet(li, "l_returnflag", "l_linestatus", "l_orderkey")
      .as[(String, Seq[String])].collect().toMap
    assert(salted == plain)
  }

  test("saltedJoin ≡ plain inner join") {
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_orderstatus")
    val plain = li.select("l_orderkey", "l_linenumber")
      .join(orders, col("l_orderkey") === col("o_orderkey")).count()
    val salted = Skew.saltedJoin(
      li.select(col("l_orderkey").as("k"), col("l_linenumber")),
      orders.select(col("o_orderkey").as("k"), col("o_orderstatus")),
      "k", "l_linenumber").count()
    assert(salted == plain)
  }

  test("skewPlaybook: salted join row-identical to join-free replay; " +
    "hot key fills every salt bucket near-evenly") {
    val events = Tables.events(spark, sf)
    val r = Skew.skewPlaybook(events)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(x => x._1 -> x).toMap
    // join-free replay of the enriched cents (the oracle's shape, here
    // in-Spark): weight = hot_key + 1 applied directly, no dim, no salt
    val replay = events.select(
        when(pmod(col("user_id"), lit(10L)) < 8, lit(0L))
          .otherwise(pmod(col("user_id"), lit(100L))).as("hot_key"),
        ((round(col("value"), 2).cast("decimal(18,2)") * 100).cast("long")
          * (when(pmod(col("user_id"), lit(10L)) < 8, lit(0L))
            .otherwise(pmod(col("user_id"), lit(100L))) + 1)).as("wc"))
      .groupBy("hot_key")
      .agg(count(lit(1)).as("n"), sum(col("wc")).as("swc"))
      .as[(Long, Long, Long)].collect().map(x => x._1 -> x).toMap
    assert(r.keySet == replay.keySet && r.nonEmpty)
    for ((k, (_, n, swc)) <- replay) {
      assert(r(k)._2 == n, s"key $k row count")
      assert(r(k)._6 == swc, s"key $k enriched cents drift — salted join " +
        "is not row-identical to the plain semantics")
    }
    // the hot key (~80% of rows) must spread: all 16 buckets used, no
    // bucket holding a skewed share (3x the even split would mean the
    // salt failed — mix40 keeps this far tighter in practice)
    val hot = r(0L)
    assert(hot._2 > replay.values.map(_._2).sum / 2, "key 0 must be hot")
    assert(hot._3 == 16L, s"hot key used ${hot._3} of 16 buckets")
    assert(hot._4 <= 3 * (hot._2 / 16 + 1),
      s"hot-key bucket_max ${hot._4} vs even share ${hot._2 / 16}")
  }

  test("AQE skew-join splits the hot partition of a skewed SMJ " +
    "(the zero-code half of the skew playbook)") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      // force a shuffle join and make the skew detector's thresholds
      // reachable at test scale: hot partition ~4 MB vs ~20 KB siblings
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // thresholds compare COMPRESSED shuffle bytes — keep them small
      // enough that the hot partition clears them after lz4
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "16384")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8192")
      val pay = "x" * 100
      val left = spark.range(40000)
        .select(lit(0L).as("k"), concat(lit(pay), col("id")).as("v"))
        .unionAll(spark.range(1800)
          .select((pmod(col("id"), lit(9L)) + 1).as("k"),
            concat(lit(pay), col("id")).as("v")))
      val right = spark.range(10).select(col("id").as("k"),
        col("id").cast("string").as("name"))
      val j = left.join(right, "k")
      // execute THIS QueryExecution (count() would build its own, leaving
      // j's adaptive plan unfinalized — the NOTES AQE-assert trap)
      assert(j.collect().length == 41800)
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"AQE did not split the skewed join partition:\n${p.take(4000)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("IVF top-k: high recall vs brute force at nprobe=4/16 centroids") {
    val emb = Tables.embeddings(spark, sf)
    val pred = col("vec_id") % 25 === 0
    val brute = Similarity.cosineTopK(emb, pred, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(emb, pred, k = 5, nCentroids = 16, nprobe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall $recall too low")
    // and IVF scored far fewer pairs than brute force by construction:
    // nprobe/nCentroids = 1/4 of the corpus per query on average
  }

  test("IVF results are exact cosines (reranked), k per query, deterministic") {
    val emb = Tables.embeddings(spark, sf)
    val r1 = Similarity.ivfTopK(emb, col("vec_id") === 0, k = 3).collect()
    val r2 = Similarity.ivfTopK(emb, col("vec_id") === 0, k = 3).collect()
    assert(r1.map(_.toString).toSeq == r2.map(_.toString).toSeq)
    assert(r1.length == 3)
  }

  test("mmrSelect: diversity beats a redundant higher-relevance candidate") {
    // query (1,0); v1/v2 duplicate it (rel 1), v3 orthogonal (rel 0).
    // λ=0.3: pick1 v1 (rel tie → id), pick2 v3 (v2's redundancy penalty
    // 0.3−0.7 < 0), pick3 v2 — and the scores are the exact fixed chain
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(1.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f)), (3L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val r = Similarity.mmrSelect(emb, queryId = 0L, k = 3, candN = 10,
        lambdaTenths = 3)
      .as[(Long, Double, Long, Long)].collect().sortBy(_._3)
    assert(r.map(_._1).toSeq === Seq(1L, 3L, 2L))
    assert(r(0)._2 === 1.0 && r(0)._4 === 10000000L)
    assert(r(1)._4 === 0L)          // 0.3·0 − 0.7·0, exact e-7
    assert(r(2)._4 === -4000000L)   // 0.3·1 − 0.7·1, exact e-7
  }
}
