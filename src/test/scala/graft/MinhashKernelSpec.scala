package graft

import graft.ext.Dedup
import graft.functions.MinhashBandSigs
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Round 19: the one-pass [[graft.functions.MinhashBandSigs]] kernel must be
  * bit-identical to the column formulation it replaced —
  * `array(concat_ws("_", cast(array_min(transform(shingle_codes(text, n),
  * x → pmod(aⱼ·x + bⱼ, P))) as string), …), …)` — including the sub-n-chars
  * empty result and null propagation, on the real corpus and on adversarial
  * edge rows (duplicate-heavy text, multi-byte code points, exactly-n
  * strings). The min-over-all-windows == min-over-distinct-codes identity is
  * what makes skipping the LinkedHashSet legal; this spec is its proof.
  */
class MinhashKernelSpec extends SparkSuite {
  import spark.implicits._

  /** The legacy formulation, verbatim shape (empty-codes rows produce an
    * empty ARRAY here rather than being pre-filtered, to compare against
    * the kernel's empty-array contract directly).
    */
  private def legacy(text: Column, n: Int, k: Int, bands: Int): Column = {
    val rows = k / bands
    val sigs = (0 until k).map { j =>
      array_min(transform(Dedup.shingleCodes(text, n),
        s => pmod(lit(Dedup.minhashA(j)) * s + lit(Dedup.minhashB(j)),
          lit(Dedup.MinhashP))))
    }
    when(text.isNull, lit(null).cast("array<string>"))
      .when(size(Dedup.shingleCodes(text, n)) === 0,
        array().cast("array<string>"))
      .otherwise(array((0 until bands).map { b =>
        concat_ws("_",
          (0 until rows).map(r => sigs(b * rows + r).cast("string")): _*)
      }: _*))
  }

  private def assertParity(df: DataFrame, n: Int, k: Int, bands: Int): Unit = {
    val diff = df
      .select(MinhashBandSigs.bandSigsCol(col("text"), n, k, bands).as("fast"),
        legacy(col("text"), n, k, bands).as("slow"))
      .filter(!(col("fast") <=> col("slow")))
      .count()
    assert(diff == 0, s"kernel diverged from legacy at n=$n k=$k bands=$bands")
  }

  test("kernel == legacy formulation on the documents corpus (n=3 and n=5)") {
    val docs = Tables.documents(spark, sf)
    assertParity(docs, n = 3, k = 16, bands = 4)
    assertParity(docs, n = 5, k = 16, bands = 4)
  }

  test("kernel == legacy on edge rows: null, empty, sub-n, exact-n, dups, multibyte") {
    val df = Seq[Option[String]](
      None, Some(""), Some("ab"), Some("abc"), Some("aaaaaaa"),
      Some("abcabcabc"), Some("日本語テキスト例"), Some("aXbXcXaXbXc"),
      Some(""), Some("𝕊urrogate 𝕡air te𝕩t"))
      .toDF("text")
    assertParity(df, n = 3, k = 16, bands = 4)
    assertParity(df, n = 5, k = 16, bands = 4)
    assertParity(df, n = 3, k = 8, bands = 2)
  }

  test("rewired pipelines match the pre-kernel shapes bit-for-bit") {
    val docs = Tables.documents(spark, sf).limit(200)
    // candidates via the kernel vs via the legacy banded self-join
    val fast = Dedup.minhashLshCandidates(docs, k = 16, bands = 4, n = 3)
    val sig = Dedup.minhashSignatures(docs, k = 16, n = 3)
    val banded = sig.select(col("doc_id"),
      posexplode(array((0 until 4).map { b =>
        concat_ws("_", (0 until 4).map(r => col(s"mh_${b * 4 + r}")): _*)
      }: _*)).as(Seq("band", "band_sig")))
    val slow = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") &&
          col("x.band_sig") === col("y.band_sig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty)
    assert(fast.count() > 0)

    // band index rows: same (doc_id, codes, band_sigs) set, same geometry
    val idx = Dedup.buildBandIndex(docs, k = 16, bands = 4, n = 3)
    val meta = idx.schema("band_sigs").metadata
    assert(meta.getLong("k") == 16 && meta.getLong("bands") == 4 &&
      meta.getLong("n") == 3)
    val idxSlow = sig.join(
      docs.select(col("doc_id"), Dedup.shingleCodes(col("text"), 3).as("codes"))
        .filter(size(col("codes")) > 0), Seq("doc_id"))
      .select(col("doc_id"), col("codes"),
        array((0 until 4).map { b =>
          concat_ws("_", (0 until 4).map(r => col(s"mh_${b * 4 + r}")): _*)
        }: _*).as("band_sigs"))
    assert(idx.exceptAll(idxSlow).isEmpty && idxSlow.exceptAll(idx).isEmpty)
  }
}
