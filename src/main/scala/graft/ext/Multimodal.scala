package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: media as opaque `binary` columns with typed
  * metadata, and batch-shaped decode/feature-extract operators.
  *
  * Design (the part that must be right at 100 TB):
  *  - media rows are (id, media_type, content binary, meta struct) — the
  *    binary travels with the row so a repartition colocates bytes with
  *    their metadata; no filesystem side-channel like the reference's
  *    name→path indexing (S2), which cannot shard;
  *  - decoding runs executor-side in `mapPartitions` batches (the Scala
  *    analog of Python's `mapInPandas` batch shape): one decoder init per
  *    partition, amortized over rows — mirroring the reference's lazy model
  *    singleton (Tools/server.py:16-29);
  *  - the decoder itself is pluggable. The container ships no image/audio
  *    codecs, so [[stubDecode]] is a clearly-marked deterministic fake with
  *    the same signature a real codec plugs into; PNG header parsing
  *    (io/ImageMeta) stays real.
  *
  * The Spark-side plumbing — schema, batching, partitioning, null handling —
  * is real and tested (MultimodalSpec).
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("media_type", StringType),      // image | audio | video
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("source", StringType),
      StructField("declared_w", IntegerType),
      StructField("declared_h", IntegerType))))))

  /** Feature row produced by the decode stage. */
  final case class MediaFeatures(media_id: Long, media_type: String,
                                 n_bytes: Long, width: Int, height: Int,
                                 checksum: Long, feature: Array[Float])

  /** STUB decoder — deterministic fake standing in for a real codec
    * (PIL/ffmpeg equivalents are unavailable in this container). Derives
    * "dimensions" and an 8-dim "feature vector" from the bytes themselves so
    * tests are exact. A real implementation replaces ONLY this function.
    */
  private[graft] def stubDecode(mediaType: String, bytes: Array[Byte]): (Int, Int, Array[Float]) = {
    val n = bytes.length
    val w = 16 + (if (n > 0) (bytes(0) & 0xff) else 0)
    val h = 16 + (if (n > 1) (bytes(1) & 0xff) else 0)
    val feat = new Array[Float](8)
    var i = 0
    while (i < n) { feat(i % 8) += (bytes(i) & 0xff) / 255.0f; i += 1 }
    (w, h, feat)
  }

  /** A decoder maps (media_type, bytes) → (width, height, feature vector).
    * Undecodable media returns (-1, -1, zeros) so callers can apply the
    * reference's unreadable-drop (F8) as a filter instead of a task failure.
    */
  type Decoder = (String, Array[Byte]) => (Int, Int, Array[Float])

  /** REAL image decoder using the JDK's built-in `javax.imageio` (PNG/GIF/
    * JPEG readers ship with the JVM — no external codec needed). Full pixel
    * decode: true raster dimensions plus an 8-dim feature = mean R,G,B,A over
    * the image and mean luma per quadrant. Bulk-raster access (`getRGB` row
    * batches) rather than per-pixel calls keeps the hot loop allocation-free.
    */
  def imageIoDecode(mediaType: String, bytes: Array[Byte]): (Int, Int, Array[Float]) = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: java.io.IOException => null }
    if (img == null) (-1, -1, new Array[Float](8))
    else {
      val w = img.getWidth; val h = img.getHeight
      val rgb = new Array[Int](w)            // one row batch, reused
      val chan = new Array[Double](4)        // ΣR, ΣG, ΣB, ΣA
      val quad = new Array[Double](4); val qn = new Array[Long](4)
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, rgb, 0, w)
        var x = 0
        while (x < w) {
          val p = rgb(x)
          val a = (p >>> 24) & 0xff; val r = (p >> 16) & 0xff
          val g = (p >> 8) & 0xff; val b = p & 0xff
          chan(0) += r; chan(1) += g; chan(2) += b; chan(3) += a
          val q = (if (y * 2 >= h) 2 else 0) + (if (x * 2 >= w) 1 else 0)
          quad(q) += (r * 299 + g * 587 + b * 114) / 1000.0
          qn(q) += 1
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      val feat = new Array[Float](8)
      var i = 0
      while (i < 4) { feat(i) = (chan(i) / (255.0 * n)).toFloat; i += 1 }
      i = 0
      while (i < 4) {
        feat(4 + i) = if (qn(i) == 0) 0f else (quad(i) / (255.0 * qn(i))).toFloat
        i += 1
      }
      (w, h, feat)
    }
  }

  /** Decode + feature-extract over binary media rows, batch-shaped: the
    * decoder context is initialized once per partition (not per row) — the
    * seam where a real codec/model library mounts. Defaults to [[stubDecode]]
    * (exact-arithmetic fake for the oracle); pass [[imageIoDecode]] for a
    * real pixel decode of PNG/JPEG/GIF via the JDK's ImageIO.
    */
  def decodeFeatures(media: DataFrame,
                     decoder: Decoder = stubDecode(_, _)): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "media_type", "content")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init happens here (real codec: load once);
        // ImageIO's disk cache is pointless for in-memory byte decodes
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, mt, bytes) =>
          val content = if (bytes == null) Array.emptyByteArray else bytes
          val (w, h, feat) = decoder(mt, content)
          val checksum = content.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) & 0x7fffffffL)
          MediaFeatures(id, mt, content.length.toLong, w, h, checksum, feat)
        }
      }
      .toDF()
  }

  /** In-engine model inference through the [[decodeFeatures]] seam — the
    * worked example of the reference's model boundary (Tools/server.py:88
    * `model.predict` behind the lazy-singleton weights S13): a FROZEN
    * linear model scores each decoded feature vector. The "model" is
    * initialized once per partition from the broadcast weights (where a
    * real runtime would mmap an ONNX session); the row loop then runs a
    * plain dot product. No out-of-JVM deps, and no transcendental in the
    * decision path: σ(z) > ½ ⟺ z > 0 (the q194 logit-domain discipline),
    * so the row is classified on the raw logit.
    *
    * Scale shape: weights are a broadcast scalar payload; scoring is
    * map-only over however `features` is partitioned — no shuffle, no
    * driver loop. Double accumulation in INDEX ORDER keeps the logit
    * bit-deterministic across retries/partitionings.
    *
    * @param weights one weight per feature lane (length must match the
    *                decoder's feature width)
    * @return media_id, media_type, logit (double), positive (z > 0)
    */
  def scoreFeatures(features: DataFrame, weights: Array[Double],
                    bias: Double): DataFrame = {
    val spark = features.sparkSession
    import spark.implicits._
    val bw = spark.sparkContext.broadcast((weights.clone(), bias))
    features.select("media_id", "media_type", "feature")
      .as[(Long, String, Array[Float])]
      .mapPartitions { it =>
        // per-partition model init: unpack the broadcast ONCE (a real
        // model runtime builds its session here, not per row)
        val (w, b) = bw.value
        it.map { case (id, mt, feat) =>
          require(feat.length == w.length,
            s"feature width ${feat.length} != model width ${w.length}")
          var z = b
          var i = 0
          while (i < w.length) { z += w(i) * feat(i); i += 1 }
          (id, mt, z, z > 0.0)
        }
      }
      .toDF("media_id", "media_type", "logit", "positive")
  }

  /** REAL image resize stage (decode → scale → re-encode PNG), batch-shaped
    * like [[decodeFeatures]]: one rendering context per partition, rows map
    * to (media_id, resized PNG bytes + new dims). Aspect ratio is preserved
    * against a `maxDim` bounding box — the thumbnail/normalize step of an
    * image training pipeline. Undecodable rows pass through with null bytes
    * and (-1,-1) dims (filterable, F8-style). Nearest-neighbor scaling: the
    * one java2d interpolation mode whose output is a pure pixel-index
    * function (bilinear may vary in the last bit across JVM pipelines),
    * keeping output bytes deterministic for tests and retries alike.
    */
  def resizeImages(media: DataFrame, maxDim: Int = 64): DataFrame = {
    require(maxDim > 0)
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "content")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          val src =
            try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(
                if (bytes == null) Array.emptyByteArray else bytes))
            catch { case _: java.io.IOException => null }
          if (src == null) (id, -1, -1, null: Array[Byte])
          else {
            val scale = math.min(
              1.0, maxDim.toDouble / math.max(src.getWidth, src.getHeight))
            val w = math.max(1, math.round(src.getWidth * scale).toInt)
            val h = math.max(1, math.round(src.getHeight * scale).toInt)
            val dst = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = dst.createGraphics()
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
            g.drawImage(src, 0, 0, w, h, null)
            g.dispose()
            val out = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(dst, "png", out)
            (id, w, h, out.toByteArray)
          }
        }
      }
      .toDF("media_id", "width", "height", "content")
  }

  /** Frame-sampling shape for video-like media: explode k deterministic
    * offsets per row (a real sampler reads frames at those offsets).
    */
  def sampleFrames(media: DataFrame, k: Int = 4): DataFrame = {
    val step = expr(s"length(content) div $k")   // integer division: exact offsets
    media.select(col("media_id"), col("media_type"),
      posexplode(transform(sequence(lit(0), lit(k - 1)),
        i => i.cast("long") * step)).as(Seq("frame_no", "byte_offset")))
  }

  /** Build a media table from the documents corpus (text bytes as stand-in
    * binaries) — exercises the full plumbing without real codecs.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      concat(lit("image/"), col("lang")).as("media_type"),
      encode(col("text"), "UTF-8").as("content"),
      struct(col("source"),
        lit(null).cast("int").as("declared_w"),
        lit(null).cast("int").as("declared_h")).as("meta"))

  /** Aspect-ratio bucketing for image batching (the SDXL/NovelAI-style
    * bucketed-batch layout, public literature): every image is assigned
    * to the ladder ratio nearest its own aspect, and each batch pads only
    * to its bucket's max dims — the 2-D analog of the length-sorted
    * text batching q198 measures. The readout prices the layout: per
    * bucket, native pixel mass vs padded mass when batching to the
    * bucket max, plus one `global` row giving the unbucketed baseline
    * (every image padded to the corpus-wide max dims).
    *
    * Nearest-ratio assignment is EXACT integer arithmetic: the distance
    * of `w/h` to ladder ratio `wb/hb` is `|w·hb − h·wb| / (h·hb)`; with
    * `h` common across candidates, cross-denominators clear by scaling
    * each distance by `L / hb` (`L` = lcm of ladder heights), so the
    * argmin is an integer key sort — no floats, no ties decided by
    * rounding (ties break to the smaller ladder index, pinned).
    *
    * Scale shape: assignment is per-row (zero shuffles, codegen'd
    * array_sort over a 5-element literal ladder); the readout is one
    * bucket-grain rollup plus a 1-row global aggregate unioned in — at
    * 100 TB this is scan-bound with a ≤6-row result.
    *
    * @return bucket ("w:h" or "global"), n_images, nat_pixels,
    *         max_w, max_h, padded_pixels, waste_pixels
    */
  def aspectBuckets(images: DataFrame, w: Column, h: Column,
                    ladder: Seq[(Int, Int)] =
                      Seq((1, 1), (4, 3), (3, 4), (16, 9), (9, 16)))
      : DataFrame = {
    require(ladder.nonEmpty && ladder.forall { case (a, b) => a > 0 && b > 0 },
      "aspectBuckets: ladder ratios must be positive")
    val lcmH = ladder.map(_._2.toLong).reduce((a, b) => a / gcd(a, b) * b)
    // candidates reference the ALIASED dims: the caller's w/h expressions
    // may depend on columns the projection below drops
    val cands = array(ladder.zipWithIndex.map { case ((wb, hb), i) =>
      struct(
        (abs(col("w") * lit(hb.toLong) - col("h") * lit(wb.toLong))
          * lit(lcmH / hb)).as("key"),
        lit(i.toLong).as("idx"),
        lit(s"$wb:$hb").as("name"))
    }: _*)
    val base = images.select(w.cast("long").as("w"), h.cast("long").as("h"))
      .withColumn("__best", element_at(array_sort(cands), 1))
      .select(col("w"), col("h"), col("__best.name").as("bucket"))
    val perBucket = base.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_images"),
        sum(col("w") * col("h")).as("nat_pixels"),
        max(col("w")).as("max_w"), max(col("h")).as("max_h"))
    val global = base.agg(count(lit(1)).as("n_images"),
        sum(col("w") * col("h")).as("nat_pixels"),
        max(col("w")).as("max_w"), max(col("h")).as("max_h"))
      .select(lit("global").as("bucket"), col("n_images"),
        col("nat_pixels"), col("max_w"), col("max_h"))
    perBucket.unionByName(global)
      .select(col("bucket"), col("n_images"), col("nat_pixels"),
        col("max_w"), col("max_h"),
        (col("n_images") * col("max_w") * col("max_h"))
          .as("padded_pixels"),
        (col("n_images") * col("max_w") * col("max_h") - col("nat_pixels"))
          .as("waste_pixels"))
  }

  private def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)

  /** Per-frame PCM energy from binary audio content: the content bytes are
    * read as 16-bit little-endian signed samples, grouped into fixed
    * `frameBytes` frames (tail partial frame dropped), each frame scoring
    * Σ|sample| — the exact-integer stand-in for RMS that every VAD-style
    * segmentation starts from. This is the audio arm of the multimodal
    * seam: like [[decodeFeatures]], the byte→samples decode runs
    * batch-shaped in `mapPartitions` (a real codec — MP3/Opus frames —
    * mounts at this seam; raw PCM is decoded for real here, no stub).
    *
    * Scale shape: decode is per-row with frame fan-out `n_bytes/frameBytes`
    * — linear in scanned bytes, zero shuffles; downstream grains group on
    * media_id and stay co-partitioned after one exchange.
    *
    * @return media_id, frame_no (0-based), energy (Σ|sample| over the
    *         frame's `frameBytes/2` samples)
    */
  def pcmFrameEnergies(media: DataFrame, frameBytes: Int = 32): DataFrame = {
    require(frameBytes >= 2 && frameBytes % 2 == 0,
      "pcmFrameEnergies: frameBytes must be a positive multiple of 2")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "content")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val b = if (bytes == null) Array.emptyByteArray else bytes
          val nf = b.length / frameBytes
          (0 until nf).iterator.map { f =>
            var e = 0L
            var i = f * frameBytes
            val end = i + frameBytes
            while (i < end) {
              // 16-bit LE signed: low byte unsigned, high byte carries sign
              val s = (b(i) & 0xff) | (b(i + 1).toInt << 8)
              e += math.abs(s)
              i += 2
            }
            (id, f.toLong, e)
          }
        }
      }
      .toDF("media_id", "frame_no", "energy")
  }

  /** VAD-style activity segmentation over [[pcmFrameEnergies]]: a frame is
    * ACTIVE when its energy exceeds the track's own mean frame energy
    * (exact-integer compare `energy·n_frames > total_energy` — the
    * self-normalizing threshold needs no corpus-wide calibration constant
    * and keeps both branches alive at any scale), runs of active frames
    * found by gaps-and-islands, per-track readout of activity mass and the
    * longest active burst. Tracks too short for one full frame — or with
    * no super-mean frame — report zeros.
    *
    * Scale shape: one exchange to media grain, then window + rollup stay
    * co-partitioned on media_id; result cardinality = |tracks|. The
    * left join back to the media table keeps frameless tracks in the
    * readout (broadcast-ineligible at scale → plain co-partitioned join).
    *
    * @return media_id, n_frames, total_energy, n_active, active_ppm
    *         (exact `n_active·10⁶ div n_frames`), longest_run
    */
  def audioActivity(media: DataFrame, frameBytes: Int = 32): DataFrame = {
    val frames = pcmFrameEnergies(media, frameBytes)
    val per = frames.groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_frames"), sum(col("energy")).as("total_energy"))
    val active = frames.join(per, Seq("media_id"))
      .filter(col("energy") * col("n_frames") > col("total_energy"))
    // gaps-and-islands: consecutive active frame_nos share one group key
    val wOrd = Window.partitionBy(col("media_id")).orderBy(col("frame_no"))
    val runs = active
      .withColumn("grp", col("frame_no") - row_number().over(wOrd))
      .groupBy(col("media_id"), col("grp"))
      .agg(count(lit(1)).as("run_len"))
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_runs"), max(col("run_len")).as("longest_run"),
        sum(col("run_len")).as("n_active"))
    media.select(col("media_id")).distinct()
      .join(per, Seq("media_id"), "left")
      .join(runs, Seq("media_id"), "left")
      .select(col("media_id"),
        coalesce(col("n_frames"), lit(0L)).as("n_frames"),
        coalesce(col("total_energy"), lit(0L)).as("total_energy"),
        coalesce(col("n_active"), lit(0L)).as("n_active"),
        coalesce(col("longest_run"), lit(0L)).as("longest_run"))
      .withColumn("active_ppm",
        expr("CAST(CASE WHEN n_frames = 0 THEN 0 " +
          "ELSE n_active * 1000000 div n_frames END AS BIGINT)"))
      .select(col("media_id"), col("n_frames"), col("total_energy"),
        col("n_active"), col("active_ppm"), col("longest_run"))
  }

  /** 64-bit difference hash (dHash, Krawetz — public literature) of a REAL
    * decoded raster: area-average the image onto a 9×8 luma grid, then bit
    * (r,c) = 1 iff cell(r,c) is darker than cell(r,c+1) — 8 gradient signs
    * per row × 8 rows. Robust to uniform rescaling by construction (the
    * grid averages whatever pixel mass falls in each cell), which is the
    * perceptual property: a resized copy hashes identically, a lightly
    * edited copy differs in a few bits (MultimodalSpec proves both).
    *
    * Exactness: luma is the integer 299/587/114 millesimal weighting (the
    * same kernel as [[imageIoDecode]]); cell means are never divided —
    * `mean(a) < mean(b)` compares as `sumA·cntB < sumB·cntA`, exact in
    * Long through ~500-megapixel cells (Σluma ≤ 255000·px; the cross
    * product stays under 2⁶³ while px·cnt ≤ 3.6e13 — any sane raster).
    *
    * Returned as FOUR 16-bit band values (rows 2b,2b+1 → band b) — the
    * Hamming-LSH join key shape shared with [[Dedup.dhashTextBands]]
    * (whose scaladoc explains the band representation choice).
    */
  def dhashBands(img: java.awt.image.BufferedImage): Array[Long] = {
    val gw = 9; val gh = 8
    val w = img.getWidth; val h = img.getHeight
    val sums = Array.ofDim[Long](gh, gw)
    val cnts = Array.ofDim[Long](gh, gw)
    val rgb = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, rgb, 0, w)
      val r = (y.toLong * gh / h).toInt
      var x = 0
      while (x < w) {
        val c = (x.toLong * gw / w).toInt
        val p = rgb(x)
        sums(r)(c) += ((p >> 16 & 0xff) * 299 + (p >> 8 & 0xff) * 587 +
          (p & 0xff) * 114).toLong
        cnts(r)(c) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(4) { b =>
      var v = 0L
      var rr = 0
      while (rr < 2) {
        val r = 2 * b + rr
        var c = 0
        while (c < gw - 1) {
          if (sums(r)(c) * cnts(r)(c + 1) < sums(r)(c + 1) * cnts(r)(c))
            v |= 1L << (rr * (gw - 1) + c)
          c += 1
        }
        rr += 1
      }
      v
    }
  }

  /** Perceptual hash over binary media rows: ImageIO decode (PNG/JPEG/GIF
    * via the JDK, same codec seam as [[imageIoDecode]]) → [[dhashBands]],
    * batch-shaped in `mapPartitions`. Rasters smaller than the 9×8 grid or
    * undecodable bytes return ok=false with zero bands (the F8
    * unreadable-drop filter shape, never a task failure). Feed the bands
    * into [[Dedup.dhashNearDups]]'s band join for image near-dup at scale;
    * the oracle-checkable twin over the text raster is
    * [[Dedup.dhashTextBands]].
    */
  def imageDHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          // NonFatal, not just IOException: JDK decoders throw Runtime-
          // Exceptions on crafted bytes (NegativeArraySize, CMMException on
          // broken ICC profiles) — the contract is ok=false, never a dead
          // task from one bad image in a 100 TB corpus
          val img =
            try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            catch { case scala.util.control.NonFatal(_) => null }
          if (img == null || img.getWidth < 9 || img.getHeight < 8)
            (id, false, 0L, 0L, 0L, 0L)
          else {
            val b = dhashBands(img)
            (id, true, b(0), b(1), b(2), b(3))
          }
        }
      }
      .toDF("media_id", "ok", "b0", "b1", "b2", "b3")
  }

  /** Deterministic engine-written PNGs from the documents raster prefix
    * (round 15, the q31/q44 make-the-approximate-path-oracle-checkable
    * technique applied to image bytes): an 18×16 grayscale PNG whose
    * pixel (x, y) carries the codepoint of text char (y·18 + x) mod 72.
    * Each 9×8 dHash grid cell covers EXACTLY a 2×2 pixel block, so the
    * area-averaged cell sums — and therefore every [[dhashBands]] bit —
    * are predictable from the text alone: luma of gray (v,v,v) is
    * v·(299+587+114) = 1000·v, cell counts are all 4, and the
    * never-divide cross-multiplied compare reduces to comparing raw
    * 4-char codepoint sums. That turns the REAL codec path (ImageIO
    * encode → decode → area-average → band join) into a DuckDB-checkable
    * pipeline (q261) instead of a spec-only one. Docs without a full
    * 72-char raster are excluded (the [[graft.ext.Dedup.dhashTextBands]]
    * contract).
    *
    * SINGLE-BYTE ENVELOPE, enforced loudly (round-16 ADVICE): the pixel
    * value is the codepoint, but [[graft.ext.Dedup.dhashTextBands]] and
    * the q261 oracle read the FULL `ascii()` codepoint — a raster-prefix
    * char above 0xff would silently diverge between the image-dHash
    * front and the text-dHash/oracle prediction if it were masked. Such
    * a doc throws instead (same failure class as MiniPdf's envelope
    * checks); the fixture corpus is ASCII, so the gate is free there.
    */
  def textPngs(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.filter(col("n_chars") >= 72)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val img = new java.awt.image.BufferedImage(
            18, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < 16) {
            var x = 0
            while (x < 18) {
              val v = text.charAt((y * 18 + x) % 72).toInt
              require(v <= 0xff,
                s"textPngs: doc $id raster prefix has codepoint $v > 0xff " +
                  "— outside the single-byte envelope the dHash oracle " +
                  "parity depends on (exclude or transliterate the doc)")
              img.setRGB(x, y, (v << 16) | (v << 8) | v)
              x += 1
            }
            y += 1
          }
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", out)
          (id, out.toByteArray)
        }
      }
      .toDF("media_id", "content")
  }

  /** Image near-dup pairs over REAL rasters: [[imageDHash]] bands (ImageIO
    * decode, area-averaged grid) fed into the SAME exact-collapse band
    * join + Hamming verify as the text-raster path
    * ([[graft.ext.Dedup.dhashNearDups]] — one pipeline, two hash fronts).
    * Undecodable / sub-grid media (ok = false) never pair.
    *
    * @return (media_a < media_b, hamming ≤ maxDist)
    */
  def imageNearDups(media: DataFrame, maxDist: Int = 16): DataFrame =
    Dedup.dhashNearDupsFromBands(
      imageDHash(media).filter(col("ok"))
        .select(col("media_id").as("doc_id"),
          col("b0"), col("b1"), col("b2"), col("b3")), maxDist)
      .select(col("doc_a").as("media_a"), col("doc_b").as("media_b"),
        col("hamming"))
}
