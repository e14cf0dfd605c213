package graft

import org.apache.spark.sql.functions._

/** Pins the engine-edge semantics the parity rules depend on. */
class AnsiEdgeSpec extends SparkSuite {
  import spark.implicits._

  test("double division by zero THROWS under ANSI (DuckDB yields NULL) — guards required") {
    // the asymmetry the zero-guards in TextStats/Similarity close:
    // DuckDB: x/0.0 → NULL; Spark 4 ANSI: DIVIDE_BY_ZERO even for doubles
    val ex = intercept[Exception] {
      Seq((1.0, 0.0)).toDF("x", "y").select(col("x") / col("y")).collect()
    }
    assert(ex.getMessage.contains("DIVIDE_BY_ZERO"))
  }

  test("sequence(1, n) with n < 1 descends rather than being empty") {
    // the trap shingleCodes guards against
    val Array(s) = Seq(1).toDF("i")
      .select(sequence(lit(1), lit(-1))).as[Seq[Int]].collect()
    assert(s == Seq(1, 0, -1))
  }

  test("blank/short documents survive every text operator (no crash, 0-counts)") {
    val docs = Seq(
      (1L, "", "en", "s"), (2L, "   ", "en", "s"), (3L, "ab", "en", "s"),
      (4L, "the normal document body here", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val q = graft.ext.TextStats.qualityFeatures(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Double]("stopword_ratio")))).toMap
    assert(q(1L) == ((0L, 0.0)) && q(2L) == ((0L, 0.0)))
    assert(q(4L)._1 == 5L)
    // shingles: <3 chars → zero shingles, no phantom codes
    val sh = docs.select(col("doc_id"),
      size(graft.ext.Dedup.shingleCodes(col("text"))).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(sh(1L) == 0 && sh(2L) == 1 && sh(3L) == 0)
    // fingerprint + bpe tokens run on all rows
    assert(graft.ext.TextStats.tokenCounts(docs).count() == 4)
    assert(docs.select(graft.ext.TextStats.fingerprint(col("text"))).count() == 4)
  }

  test("zero-norm embeddings are excluded, not crashed on, by similarity ops") {
    val emb = Seq(
      (1L, Array(1f, 0f), 0), (2L, Array(0f, 1f), 0),
      (3L, Array(0f, 0f), 0), (4L, Array(1f, 1f), 0))
      .toDF("vec_id", "embedding", "label")
    val topk = graft.ext.Similarity.cosineTopK(emb, lit(true), k = 2).collect()
    assert(!topk.exists(r => r.getLong(0) == 3L || r.getLong(1) == 3L))
    val pairs = graft.ext.Similarity.cosineNearDups(emb, minCos = -1.0).collect()
    assert(pairs.length == 3)  // pairs among {1,2,4} only
  }

  test("FloatVecDot is strict: length mismatch and null elements yield NULL") {
    val df = Seq(
      (Array[java.lang.Float](1f, 2f), Array[java.lang.Float](3f)),
      (Array[java.lang.Float](1f, null), Array[java.lang.Float](1f, 1f)))
      .toDF("a", "b")
    val r = df.select(graft.functions.VectorFunctions.vecDot(col("a"), col("b"))).collect()
    assert(r(0).isNullAt(0) && r(1).isNullAt(0))
  }
}
