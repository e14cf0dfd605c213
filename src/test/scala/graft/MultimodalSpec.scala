package graft

import graft.ext.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal binary-column plumbing: schema, batch decode, determinism,
  * null/empty handling, frame sampling. (Decode itself is a documented stub.)
  */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private lazy val media =
    Multimodal.mediaFromDocuments(Tables.documents(spark, sf)).cache()

  test("media table carries binary content + typed metadata") {
    assert(media.schema("content").dataType.typeName == "binary")
    val r = media.select("media_id", "media_type", "meta.source").limit(1).collect()
    assert(r.nonEmpty)
  }

  test("decodeFeatures is deterministic and total over the corpus") {
    val f1 = Multimodal.decodeFeatures(media)
      .select("media_id", "checksum").as[(Long, Long)].collect().toMap
    val f2 = Multimodal.decodeFeatures(media)
      .select("media_id", "checksum").as[(Long, Long)].collect().toMap
    assert(f1 == f2)
    assert(f1.size == media.count())
  }

  test("decode output shape: n_bytes matches content, 8-dim feature") {
    val joined = Multimodal.decodeFeatures(media)
      .join(media.select(col("media_id"), length(col("content")).as("len")), "media_id")
    assert(joined.filter(col("n_bytes") =!= col("len")).count() == 0)
    val Array(featLen) = Multimodal.decodeFeatures(media.limit(1))
      .select(size(col("feature"))).as[Int].collect()
    assert(featLen == 8)
  }

  test("scoreFeatures: broadcast linear model through the seam matches a " +
    "driver-side computation, end to end on real decoded features") {
    // frozen model: arbitrary fixed weights over the 8 stub feature lanes
    val w = Array(0.5, -1.25, 2.0, 0.0, 0.75, -0.5, 1.0, -2.0)
    val b = -3.5
    val feats = Multimodal.decodeFeatures(media)
    val scored = Multimodal.scoreFeatures(feats, w, b)
      .as[(Long, String, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap
    // driver-side replay: identical index-order double accumulation
    val expect = feats.select("media_id", "feature")
      .as[(Long, Array[Float])].collect().map { case (id, f) =>
        var z = b
        for (i <- w.indices) z += w(i) * f(i)
        id -> z
      }.toMap
    assert(scored.size == expect.size && scored.nonEmpty)
    for ((id, z) <- expect) {
      assert(scored(id)._1 == z, s"media $id logit drift")
      assert(scored(id)._2 == (z > 0.0))
    }
    // both classes must be alive on the corpus or the demo demos nothing
    assert(scored.values.exists(_._2) && scored.values.exists(!_._2),
      "frozen model must split the corpus into both classes")
    // width mismatch fails loudly, not silently truncated
    val bad = intercept[org.apache.spark.SparkException] {
      Multimodal.scoreFeatures(feats, Array(1.0, 2.0), 0.0).collect()
    }
    assert(bad.getMessage.contains("model width") ||
      bad.getCause != null)
  }

  test("empty binary decodes without error") {
    val df = Seq((1L, "image/x", Array.emptyByteArray)).toDF("media_id", "media_type", "content")
    val r = Multimodal.decodeFeatures(df).collect()(0)
    assert(r.getAs[Long]("n_bytes") == 0)
    assert(r.getAs[Int]("width") == 16 && r.getAs[Int]("height") == 16)
  }

  // ---- real codec through the seam: JDK ImageIO PNG encode → decode ----

  private def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("imageIoDecode through the seam: real PNG pixels, exact dims + features") {
    // solid-color PNGs make the mean-channel features exact fractions
    val rows = Seq(
      (1L, "image/png", pngBytes(64, 32, 0xff0000)),   // pure red
      (2L, "image/png", pngBytes(16, 48, 0x00ff00)),   // pure green
      (3L, "image/png", pngBytes(8, 8, 0x102030)))
      .toDF("media_id", "media_type", "content")
    val decoded = Multimodal.decodeFeatures(rows, Multimodal.imageIoDecode)
      .select("media_id", "width", "height", "feature")
      .as[(Long, Int, Int, Seq[Float])].collect().sortBy(_._1)
    assert(decoded.map(d => (d._1, d._2, d._3)).toSeq ==
      Seq((1L, 64, 32), (2L, 16, 48), (3L, 8, 8)))
    val red = decoded(0)._4
    assert(red(0) == 1.0f && red(1) == 0.0f && red(2) == 0.0f && red(3) == 1.0f)
    // quadrant luma of solid red = 0.299 everywhere
    (4 to 7).foreach(i => assert(math.abs(red(i) - 0.299f) < 1e-6f))
    val green = decoded(1)._4
    assert(green(0) == 0.0f && green(1) == 1.0f && green(2) == 0.0f)
  }

  test("imageIoDecode dims agree with the IHDR probe on the same bytes") {
    val bytes = pngBytes(123, 45, 0x336699)
    val df = Seq((1L, "image/png", bytes)).toDF("media_id", "media_type", "content")
    val (w, h) = Multimodal.decodeFeatures(df, Multimodal.imageIoDecode)
      .select("width", "height").as[(Int, Int)].collect()(0)
    val probed = df.select(
      graft.io.ImageMeta.pngWidth(col("content")).as("w"),
      graft.io.ImageMeta.pngHeight(col("content")).as("h"))
      .as[(Int, Int)].collect()(0)
    assert((w, h) == ((123, 45)) && probed == ((123, 45)))
  }

  test("imageIoDecode marks undecodable bytes (-1,-1) instead of failing (F8)") {
    val df = Seq(
      (1L, "image/png", Array[Byte](1, 2, 3, 4)),
      (2L, "image/png", pngBytes(4, 4, 0))).toDF("media_id", "media_type", "content")
    val r = Multimodal.decodeFeatures(df, Multimodal.imageIoDecode)
      .select("media_id", "width").as[(Long, Int)].collect().toMap
    assert(r == Map(1L -> -1, 2L -> 4))
  }

  test("resizeImages: real decode→scale→re-encode, aspect kept, deterministic") {
    val rows = Seq(
      (1L, "image/png", pngBytes(64, 32, 0xff0000)),  // downscale 2:1 box
      (2L, "image/png", pngBytes(10, 8, 0x00ff00)),   // under maxDim → kept
      (3L, "image/png", Array[Byte](9, 9, 9)))        // undecodable
      .toDF("media_id", "media_type", "content")
    val r = Multimodal.resizeImages(rows, maxDim = 16).cache()
    val dims = r.select("media_id", "width", "height")
      .as[(Long, Int, Int)].collect().sortBy(_._1)
    assert(dims.toSeq == Seq((1L, 16, 8), (2L, 10, 8), (3L, -1, -1)))
    // outputs are real PNGs that probe + decode back at the new size,
    // and a solid-color input stays solid after resampling
    val back = Multimodal.decodeFeatures(
      r.filter(col("width") > 0).withColumn("media_type", lit("image/png")),
      Multimodal.imageIoDecode)
      .select("media_id", "width", "height", "feature")
      .as[(Long, Int, Int, Seq[Float])].collect().sortBy(_._1)
    assert(back.map(b => (b._1, b._2, b._3)).toSeq == Seq((1L, 16, 8), (2L, 10, 8)))
    assert(back(0)._4(0) == 1.0f && back(0)._4(1) == 0.0f)
    // determinism: byte-identical on a second run
    val h1 = r.select(col("media_id"), md5(col("content"))).collect().toSet
    val h2 = Multimodal.resizeImages(rows, maxDim = 16)
      .select(col("media_id"), md5(col("content"))).collect().toSet
    assert(h1 == h2)
  }

  test("sampleFrames explodes k deterministic offsets per row") {
    val df = Seq((1L, "video/x", Array.fill[Byte](100)(7))).toDF("media_id", "media_type", "content")
    val r = Multimodal.sampleFrames(df, k = 4)
      .select("frame_no", "byte_offset").as[(Int, Long)].collect().toSeq
    assert(r == Seq((0, 0L), (1, 25L), (2, 50L), (3, 75L)))
  }

  // ---- perceptual dHash over real decoded rasters ----

  /** Patterned PNG: pixel (x,y) colored by `f` — deterministic, no RNG. */
  private def pngPattern(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0; while (x < w) { img.setRGB(x, y, f(x, y)); x += 1 }; y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  // deterministic texture: enough luma variation that every gradient
  // comparison is decided, never flat-tied
  private def texel(x: Int, y: Int): Int = {
    val v = ((x * 73 + y * 151 + (x * y) % 37) * 0x9e3779b9).abs % 256
    (v << 16) | (v << 8) | v
  }

  test("imageDHash: resized copy hashes identically, perturbed copy is near") {
    val base = pngPattern(18, 16)(texel)
    // 3× nearest-neighbor upscale: the area-averaged 9×8 grid sees the
    // same cell means, so the perceptual hash must be IDENTICAL
    val scaled = pngPattern(54, 48)((x, y) => texel(x / 3, y / 3))
    // one pixel touched: at most the two comparisons adjacent to its
    // grid cell can flip → Hamming ≤ 2 by construction
    val tweaked = pngPattern(18, 16)((x, y) =>
      if (x == 9 && y == 7) 0xffffff else texel(x, y))
    // left-right mirror reverses every decided gradient sign → far away
    val mirrored = pngPattern(18, 16)((x, y) => texel(17 - x, y))
    val rows = Seq(
      (1L, base), (2L, scaled), (3L, tweaked), (4L, mirrored),
      (5L, pngBytes(4, 4, 0x102030)),          // raster smaller than grid
      (6L, Array[Byte](1, 2, 3)))              // undecodable
      .toDF("media_id", "content")
    val r = Multimodal.imageDHash(rows)
      .as[(Long, Boolean, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> t).toMap
    assert((1L to 4L).forall(r(_)._2), "real rasters must decode ok")
    assert(!r(5L)._2 && !r(6L)._2, "small/undecodable → ok=false")
    def bands(t: (Long, Boolean, Long, Long, Long, Long)) =
      Seq(t._3, t._4, t._5, t._6)
    def ham(a: Long, b: Long) =
      bands(r(a)).zip(bands(r(b)))
        .map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
    assert(ham(1L, 2L) == 0, "3x upscale must hash identically")
    assert(ham(1L, 3L) <= 2, "one-pixel edit flips at most 2 bits")
    assert(ham(1L, 4L) >= 32, "mirror must be far in Hamming space")
    // bands are 16-bit values
    assert(bands(r(1L)).forall(b => b >= 0 && b <= 0xffffL))
  }

  test("imageDHash bands feed the Dedup band join (exact copy pairs at 0)") {
    val a = pngPattern(27, 24)(texel)
    val rows = Seq((10L, a), (11L, a),
      (12L, pngPattern(27, 24)((x, y) => texel(x, y + 5))))
      .toDF("media_id", "content")
    val hash = Multimodal.imageDHash(rows).filter(col("ok"))
    val banded = hash.select(col("media_id"),
      posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
        .as(Seq("band", "v")))
    val cands = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.v") === col("y.v") &&
          col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id"), col("y.media_id")).distinct()
      .as[(Long, Long)].collect().toSet
    assert(cands.contains((10L, 11L)),
      "byte-identical images must band-join (hamming 0)")
  }
}
