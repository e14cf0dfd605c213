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
