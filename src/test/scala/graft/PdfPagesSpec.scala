package graft

import graft.io.{MiniPdf, PdfPages}
import org.apache.spark.sql.functions._

class PdfPagesSpec extends SparkSuite {
  import spark.implicits._

  test("explodePages: one row per page with reference _page<N> naming (S7/G12)") {
    val pdfs = Seq(("report.pdf", 3), ("single.pdf", 1)).toDF("file_name", "n_pages")
    val r = PdfPages.explodePages(pdfs, col("n_pages"))
      .select("page_name").as[String].collect().sorted
    assert(r.toSeq == Seq("report_page1", "report_page2", "report_page3",
      "single_page1"))
  }

  test("renderPages seam: non-stub renderer emits real decodable PNGs per page") {
    val pdfs = Seq(
      ("report.pdf", 3, Array[Byte](1, 2, 3)),
      ("single.pdf", 1, Array[Byte](9)))
      .toDF("file_name", "n_pages", "content")
    val rendered = PdfPages.renderPages(pdfs, col("n_pages"),
      PdfPages.pngFixtureRenderer(width = 40, height = 30)).cache()
    assert(rendered.count() == 4)
    // every output is a real PNG: signature + IHDR dims probe correctly…
    val probed = rendered.select(
      col("page_name"),
      graft.io.ImageMeta.isPng(col("page_png")).as("is_png"),
      graft.io.ImageMeta.pngWidth(col("page_png")).as("w"),
      graft.io.ImageMeta.pngHeight(col("page_png")).as("h"))
      .as[(String, Boolean, Int, Int)].collect()
    assert(probed.forall(p => p._2 && p._3 == 40 && p._4 == 30), probed.mkString(","))
    // …and full-decodes back through the real ImageIO decoder
    val dims = graft.ext.Multimodal.decodeFeatures(
      rendered.select(col("page").cast("long").as("media_id"),
        lit("image/png").as("media_type"), col("page_png").as("content")),
      graft.ext.Multimodal.imageIoDecode)
      .select("width", "height").as[(Int, Int)].collect()
    assert(dims.forall(_ == ((40, 30))))
    // determinism: same inputs → byte-identical pages
    val h1 = rendered.select(col("page_name"), md5(col("page_png"))).collect().toSet
    val again = PdfPages.renderPages(pdfs, col("n_pages"),
      PdfPages.pngFixtureRenderer(width = 40, height = 30))
    val h2 = again.select(col("page_name"), md5(col("page_png"))).collect().toSet
    assert(h1 == h2)
  }

  test("MiniPdf backend: a REAL 2-page PDF renders through explode + probe + decode") {
    // a genuine PDF 1.4 file: page tree, per-page DCTDecode image XObjects,
    // xref, trailer — any conforming viewer opens it
    val red = MiniPdf.solidJpeg(0xff0000, 48, 32)
    val blue = MiniPdf.solidJpeg(0x0000ff, 48, 32)
    val pdf = MiniPdf.write(Seq((red, 48, 32), (blue, 48, 32)))
    assert(new String(pdf.take(8), "ASCII").startsWith("%PDF-1.4"))
    // the structural prober reads /Count via trailer → /Root → /Pages
    assert(MiniPdf.pageCount(pdf) == 2)

    val pdfs = Seq(("scan.pdf", MiniPdf.pageCount(pdf), pdf))
      .toDF("file_name", "n_pages", "content")
    val rendered = PdfPages.renderPages(pdfs, col("n_pages"),
      MiniPdf.pdfImageRenderer).cache()
    val names = rendered.select("page_name").as[String].collect().sorted
    assert(names.toSeq == Seq("scan_page1", "scan_page2"))
    // rendered pages are real PNGs with the page's MediaBox dimensions…
    val probed = rendered.select(col("page"),
      graft.io.ImageMeta.isPng(col("page_png")).as("is_png"),
      graft.io.ImageMeta.pngWidth(col("page_png")).as("w"),
      graft.io.ImageMeta.pngHeight(col("page_png")).as("h"))
      .as[(Int, Boolean, Int, Int)].collect()
    assert(probed.forall(p => p._2 && p._3 == 48 && p._4 == 32),
      probed.mkString(","))
    // …and the page CONTENT survives the render: page 1 is red, page 2
    // blue (JPEG is lossy → dominant-channel assertion, not exact bytes)
    val px = rendered.collect().map { r =>
      val png = r.getAs[Array[Byte]]("page_png")
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(png))
      val c = new java.awt.Color(img.getRGB(24, 16))
      r.getAs[Int]("page") -> c
    }.toMap
    assert(px(1).getRed > 200 && px(1).getBlue < 60, px(1).toString)
    assert(px(2).getBlue > 200 && px(2).getRed < 60, px(2).toString)
  }

  test("MiniPdf TextPage: a text-operator page writes, extracts, and " +
    "rasters deterministically next to image pages") {
    // mixed document: image page 1, TEXT page 2, image page 3 — the
    // vector-content notch of the S7 envelope, now a defined result
    val lines = Seq("Invoice 42 (final)", "total due: \\ 7.50")
    val pdf = MiniPdf.writePages(Seq(
      MiniPdf.DctPage(MiniPdf.solidJpeg(0xff0000, 40, 30), 40, 30),
      MiniPdf.TextPage(lines, w = 200, h = 120),
      MiniPdf.FlateGrayPage(Array.fill(40 * 30)(128.toByte), 40, 30)))
    assert(MiniPdf.pageCount(pdf) == 3)
    // extraction round-trips the exact lines, escapes undone
    assert(MiniPdf.extractPageText(pdf, 2) == lines)
    // and the whole document still renders through the Spark seam
    val pdfs = Seq(("doc.pdf", 3, pdf)).toDF("file_name", "n_pages", "content")
    val rendered = PdfPages.renderPages(pdfs, col("n_pages"),
      MiniPdf.pdfImageRenderer).cache()
    assert(rendered.count() == 3)
    val png2 = rendered.filter(col("page") === 2)
      .select("page_png").as[Array[Byte]].head()
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(png2))
    assert(img.getWidth == 200 && img.getHeight == 120)
    // ink where the glyph grid is (first line box rows 65..71, from x=72),
    // white margins outside it
    var ink = 0
    for (y <- 65 until 72; x <- 72 until (72 + 7 * lines.head.length))
      if ((img.getRGB(x, y) & 0xffffff) == 0) ink += 1
    assert(ink > 20, s"expected glyph ink in the first line box, got $ink")
    for (y <- 0 until 50; x <- 0 until 50)
      assert((img.getRGB(x, y) & 0xffffff) == 0xffffff,
        s"margin pixel ($x,$y) not white")
    // deterministic: same text rasters byte-identically; different text
    // rasters differently
    val again = MiniPdf.renderTextPage(lines, 200, 120)
    assert(java.util.Arrays.equals(again,
      MiniPdf.renderTextPage(lines, 200, 120)))
    assert(!java.util.Arrays.equals(again,
      MiniPdf.renderTextPage(Seq("Invoice 43 (final)", lines(1)), 200, 120)))
  }

  test("MiniPdf FlateDecode: a Flate-backed 2-page PDF renders losslessly through the same seam") {
    // the other public PDF 1.4 image encoding: zlib-deflated raw RGB —
    // lossless, so the render must reproduce EXACT pixel values
    val pdf = MiniPdf.writePages(Seq(
      MiniPdf.FlateRgbPage(MiniPdf.solidRgb(0x00ff00, 20, 12), 20, 12),
      MiniPdf.DctPage(MiniPdf.solidJpeg(0xff0000, 20, 12), 20, 12)))
    assert(MiniPdf.pageCount(pdf) == 2)

    val pdfs = Seq(("flate.pdf", 2, pdf)).toDF("file_name", "n_pages", "content")
    val rendered = PdfPages.renderPages(pdfs, col("n_pages"),
      MiniPdf.pdfImageRenderer).cache()
    val probed = rendered.select(col("page"),
      graft.io.ImageMeta.isPng(col("page_png")).as("is_png"),
      graft.io.ImageMeta.pngWidth(col("page_png")).as("w"),
      graft.io.ImageMeta.pngHeight(col("page_png")).as("h"))
      .as[(Int, Boolean, Int, Int)].collect()
    assert(probed.length == 2 &&
      probed.forall(p => p._2 && p._3 == 20 && p._4 == 12),
      probed.mkString(","))
    val px = rendered.collect().map { r =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("page_png")))
      r.getAs[Int]("page") -> new java.awt.Color(img.getRGB(10, 6))
    }.toMap
    // Flate page is bit-exact; the DCT page in the SAME document still
    // renders (mixed-filter documents exercise the dict-driven dispatch)
    assert(px(1).getRGB == new java.awt.Color(0, 255, 0).getRGB, px(1).toString)
    assert(px(2).getRed > 200 && px(2).getGreen < 60, px(2).toString)
  }

  test("MiniPdf DeviceGray: a grayscale Flate page renders bit-exact next to color pages") {
    // 8-bit DeviceGray (1 byte/pixel) is what grayscale scanners emit —
    // a 3-page document mixing gray, color and JPEG pages exercises the
    // per-page colorspace dispatch
    val grayRamp = Array.tabulate[Byte](16 * 4)(i => (i % 251).toByte)
    val pdf = MiniPdf.writePages(Seq(
      MiniPdf.FlateGrayPage(grayRamp, 16, 4),
      MiniPdf.FlateRgbPage(MiniPdf.solidRgb(0x0000ff, 16, 4), 16, 4),
      MiniPdf.DctPage(MiniPdf.solidJpeg(0xff0000, 16, 4), 16, 4)))
    assert(MiniPdf.pageCount(pdf) == 3)
    val pdfs = Seq(("scan.pdf", 3, pdf)).toDF("file_name", "n_pages", "content")
    val rendered = PdfPages.renderPages(pdfs, col("n_pages"),
      MiniPdf.pdfImageRenderer).cache()
    val pages = rendered.collect().map { r =>
      r.getAs[Int]("page") -> javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("page_png")))
    }.toMap
    assert(pages.size == 3)
    // gray page: every SAMPLE survives the PNG round-trip exactly (raster
    // samples, not getRGB — the gray color model would gamma-convert)
    for (y <- 0 until 4; x <- 0 until 16) {
      val g = grayRamp(y * 16 + x) & 0xff
      assert(pages(1).getRaster.getSample(x, y, 0) == g,
        s"gray mismatch at ($x,$y)")
    }
    assert((pages(2).getRGB(8, 2) & 0xffffff) == 0x0000ff)
    assert(new java.awt.Color(pages(3).getRGB(8, 2)).getRed > 200)
  }

  test("MiniPdf Indexed: a palette-backed page renders with exact lookup colors") {
    // 8-bit indexed color ([/Indexed /DeviceRGB hival <lookup>]) is the
    // PNG-PLTE-style encoding screenshots/plots carry into PDFs — the
    // remaining common image-PDF encoding after JPEG/RGB/gray. The index
    // plane cycles a 4-color palette; every pixel must come back as its
    // exact palette triple through write → extract → decode → PNG.
    val colors = Array(0x112233, 0x44ff66, 0xffffff, 0x000000)
    val palette = colors.flatMap(c => Array(
      ((c >> 16) & 0xff).toByte, ((c >> 8) & 0xff).toByte, (c & 0xff).toByte))
    val (w, h) = (16, 6)
    val indices = Array.tabulate[Byte](w * h)(i => (i % 4).toByte)
    val pdf = MiniPdf.writePages(Seq(
      MiniPdf.FlateIndexedPage(indices, palette, w, h),
      MiniPdf.FlateRgbPage(MiniPdf.solidRgb(0xff8800, w, h), w, h)))
    assert(MiniPdf.pageCount(pdf) == 2)
    val pdfs = Seq(("plot.pdf", 2, pdf)).toDF("file_name", "n_pages", "content")
    val rendered = PdfPages.renderPages(pdfs, col("n_pages"),
      MiniPdf.pdfImageRenderer).cache()
    val pages = rendered.collect().map { r =>
      r.getAs[Int]("page") -> javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("page_png")))
    }.toMap
    assert(pages.size == 2)
    for (y <- 0 until h; x <- 0 until w)
      assert((pages(1).getRGB(x, y) & 0xffffff) == colors((y * w + x) % 4),
        s"palette mismatch at ($x,$y)")
    assert((pages(2).getRGB(8, 3) & 0xffffff) == 0xff8800)
    // an out-of-range index (sample > hival) is a corrupt plane → loud
    val bad = MiniPdf.writePages(Seq(MiniPdf.FlateIndexedPage(
      Array[Byte](0, 1, 2, 5), palette.take(9), 2, 2)))
    val e = intercept[Exception](MiniPdf.pdfImageRenderer("f.pdf", 1, bad))
    assert(e.getMessage.contains("hival"), e.getMessage)
  }

  test("MiniPdf xref window scales with the entry count (no fixed-cap parse failure)") {
    // 700 pages → 2101 xref entries ≈ 42 KB of table: past the old fixed
    // 40000-byte window; header-sized windows parse it fine, and the
    // growable objDict window survives the ~6 KB /Kids array
    val page = MiniPdf.FlateRgbPage(MiniPdf.solidRgb(0x123456, 2, 2), 2, 2)
    val pdf = MiniPdf.writePages(Seq.fill(700)(page))
    assert(MiniPdf.pageCount(pdf) == 700)
    val png = MiniPdf.pdfImageRenderer("big.pdf", 700, pdf)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(png))
    assert(img.getWidth == 2 && img.getHeight == 2)
    assert((img.getRGB(1, 1) & 0xffffff) == 0x123456)
  }

  test("MiniPdf inflate: a truncated FlateDecode stream fails loudly, no hang") {
    // a valid deflate PREFIX makes Inflater consume all input and then
    // return 0 with needsInput() set but finished() false — the exact shape
    // that used to spin the decode loop forever on a corrupt PDF
    val raw = Array.tabulate[Byte](50000)(i => (i % 251).toByte)
    val full = {
      val d = new java.util.zip.Deflater()
      d.setInput(raw); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end(); out.toByteArray
    }
    assert(MiniPdf.inflate(full, raw.length).toSeq == raw.toSeq)
    val truncated = full.take(full.length / 2)
    val e = intercept[RuntimeException](MiniPdf.inflate(truncated, raw.length))
    assert(e.getMessage.contains("truncated"), e.getMessage)
  }

  test("MiniPdf parse side rejects hostile dims before allocating") {
    // a corrupt/hostile dict claiming /Height 715827884 makes w*h*3 wrap
    // to 8 in Int arithmetic — the renderer must refuse the dims loudly,
    // not index out of a tiny buffer later
    val pdf = MiniPdf.writePages(Seq(
      MiniPdf.FlateRgbPage(MiniPdf.solidRgb(0x112233, 2, 2), 2, 2)))
    val hostile = new String(pdf, java.nio.charset.StandardCharsets.ISO_8859_1)
      .replace("/Height 2 ", "/Height 715827884 ")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val e = intercept[Exception](MiniPdf.pdfImageRenderer("evil.pdf", 1, hostile))
    assert(e.getMessage.contains("unreasonable"), e.getMessage)
  }

  test("MiniPdf FlateRgbPage: size validation is Int-overflow-proof") {
    // 2 * 715827884 * 3 = 2^32 + 8 wraps to 8 in Int arithmetic — under the
    // old Int-typed require an 8-byte buffer claiming ~715M rows validated
    intercept[IllegalArgumentException](
      MiniPdf.FlateRgbPage(new Array[Byte](8), 2, 715827884))
    intercept[IllegalArgumentException](
      MiniPdf.FlateRgbPage(new Array[Byte](0), 0, 5))
    intercept[IllegalArgumentException](
      MiniPdf.FlateRgbPage(new Array[Byte](12), 2, -2))
  }

  test("MiniPdf xref entries are the spec-mandated fixed 20 bytes each") {
    // the PDF spec fixes every xref entry at exactly 20 bytes; a platform
    // line separator (%n on CRLF) would emit 21 and overrun the
    // size-derived parse window on large page trees
    val pdf = MiniPdf.writePages(Seq(
      MiniPdf.FlateRgbPage(MiniPdf.solidRgb(0xabcdef, 4, 4), 4, 4)))
    val text = new String(pdf, java.nio.charset.StandardCharsets.ISO_8859_1)
    // "\nxref\n" so the match can't land inside the trailing "startxref"
    val xrefAt = text.lastIndexOf("\nxref\n") + 1
    assert(xrefAt >= 1)
    val afterHeader = text.indexOf('\n', text.indexOf('\n', xrefAt) + 1) + 1
    val entries = text.substring(afterHeader, text.indexOf("trailer", afterHeader))
    assert(entries.length % 20 == 0, s"xref table ${entries.length}B not 20B-aligned")
    entries.grouped(20).foreach { e =>
      assert(e.matches("""\d{10} \d{5} [nf] \n"""), s"malformed entry ${e.trim}")
    }
  }

  test("MiniPdf PathPage: vector ops write, extract, and raster with exact pixel counts") {
    import MiniPdf._
    // red 20×10 rect at (30,40); blue right triangle (10,10)-(10,20)-(20,10)
    // filled nonzero; green stroked diagonal
    val ops = Seq(
      FillColor(0xff0000), Rect(30, 40, 20, 10), Fill,
      FillColor(0x0000ff), MoveTo(10, 10), LineTo(10, 20), LineTo(20, 10),
      ClosePath, Fill,
      StrokeColor(0x00ff00), MoveTo(60, 60), LineTo(69, 69), Stroke)
    val pdf = writePages(Seq(
      PathPage(ops, w = 100, h = 80),
      DctPage(solidJpeg(0x336699, 40, 30), 40, 30)))
    assert(pageCount(pdf) == 2)
    // the ops round-trip through the real content stream
    assert(extractPagePathOps(pdf, 1) == ops)
    // and the page renders through the same Spark seam as every other kind
    val pdfs = Seq(("vec.pdf", 2, pdf)).toDF("file_name", "n_pages", "content")
    val rendered = PdfPages.renderPages(pdfs, col("n_pages"),
      pdfImageRenderer).cache()
    assert(rendered.count() == 2)
    val png = rendered.filter(col("page") === 1)
      .select("page_png").as[Array[Byte]].head()
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth == 100 && img.getHeight == 80)
    def countColor(rgb: Int): Int =
      (for (y <- 0 until 80; x <- 0 until 100
            if (img.getRGB(x, y) & 0xffffff) == rgb) yield 1).sum
    // pixel-center sampling makes the filled rect EXACTLY w×h pixels
    assert(countColor(0xff0000) == 20 * 10, "rect must fill exactly 20x10")
    // right triangle with legs 10: sum of covered centers = 10+9+...  the
    // scanline at user y=k+0.5 spans x in [10, 20-(k+0.5)) → 9-k pixels
    // for k=0..9 → 45
    assert(countColor(0x0000ff) == 45, "triangle fill must cover 45 centers")
    // Bresenham 45° diagonal: exactly 10 pixels
    assert(countColor(0x00ff00) == 10, "diagonal stroke must be 10 px")
    // rect position: user (30,40)-(50,50) → image rows 80-50=30..39, x 30..49
    assert((img.getRGB(30, 30) & 0xffffff) == 0xff0000)
    assert((img.getRGB(49, 39) & 0xffffff) == 0xff0000)
    assert((img.getRGB(50, 39) & 0xffffff) == 0xffffff)
    // deterministic: byte-identical re-render
    assert(java.util.Arrays.equals(renderPathPage(ops, 100, 80),
      renderPathPage(ops, 100, 80)))
  }

  test("MiniPdf PathPage: winding rules disagree exactly on the overlap") {
    import MiniPdf._
    // two same-direction overlapping rects in ONE path: nonzero fills the
    // union; even-odd leaves the 5×5 intersection unpainted
    val path = Seq(Rect(10, 10, 10, 10), Rect(15, 15, 10, 10))
    val nz = renderPathPage(FillColor(0x000000) +: path :+ Fill, 40, 40)
    val eo = renderPathPage(FillColor(0x000000) +: path :+ FillEvenOdd, 40, 40)
    def blacks(png: Array[Byte]): Int = {
      val i = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      (for (y <- 0 until 40; x <- 0 until 40
            if (i.getRGB(x, y) & 0xffffff) == 0) yield 1).sum
    }
    assert(blacks(nz) == 175, "nonzero fills the union: 200 - 25 overlap")
    assert(blacks(eo) == 150, "even-odd leaves the 25-px overlap white")
  }

  test("MiniPdf PathPage: segment after h starts a new subpath at the closed start (PDF §8.5.2.1)") {
    import MiniPdf._
    // triangle closed with h, then l directly after: the second subpath
    // begins at the triangle's start point — legal PDF this writer emits,
    // so the renderer must paint it, not crash
    val ops = Seq(StrokeColor(0xff0000),
      MoveTo(10, 10), LineTo(20, 10), LineTo(10, 20), ClosePath,
      LineTo(30, 10), Stroke)
    val png = renderPathPage(ops, 40, 40)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    // the post-h segment runs (10,10)->(30,10): row y=10 → image row 29
    assert((img.getRGB(25, 29) & 0xffffff) == 0xff0000,
      "post-h segment must be stroked from the closed subpath's start")
    // same after re (re sets the current point to its x,y corner)
    val ops2 = Seq(Rect(5, 5, 10, 10), LineTo(25, 5), Stroke)
    val png2 = renderPathPage(ops2, 40, 40)
    val img2 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png2))
    assert((img2.getRGB(20, 34) & 0xffffff) == 0,
      "post-re segment must be stroked from the rect origin")
    // a lineto with genuinely no current point still fails loudly
    intercept[IllegalArgumentException] {
      renderPathPage(Seq(LineTo(5, 5), Stroke), 20, 20)
    }
  }

  test("MiniPdf PathPage: content-stream decimals are locale-independent") {
    import MiniPdf._
    val saved = java.util.Locale.getDefault
    try {
      // a comma-decimal locale must not leak ',' into the PDF bytes
      java.util.Locale.setDefault(java.util.Locale.GERMANY)
      val s = pathOpsToStream(Seq(FillColor(0x336699), Rect(1, 2, 3, 4), Fill))
      assert(!s.contains(","), s"comma leaked into content stream: $s")
      assert(s.startsWith("0.2000 0.4000 0.6000 rg"), s)
      // and the round-trip still parses under that locale
      assert(parsePathOps(s) ==
        Seq(FillColor(0x336699), Rect(1, 2, 3, 4), Fill))
    } finally java.util.Locale.setDefault(saved)
  }

  test("MiniPdf PathPage: outside-envelope operators fail loudly, never paint wrong") {
    import MiniPdf._
    // an unknown operator has no defined raster here — the parse must
    // throw, not skip (skipping would render a DIFFERENT page than a
    // viewer shows); dash/width joined the envelope in round 17 and
    // caps/joins/miter in round 18
    val e = intercept[RuntimeException] { parsePathOps("/GS1 gs 10 10 m S") }
    assert(e.getMessage.contains("envelope"))
    val e2 = intercept[RuntimeException] { parsePathOps("1 2 3 zz") }
    assert(e2.getMessage.contains("zz"))
  }

  test("MiniPdf PathPage cm: translate+scale rasters byte-identically to " +
    "the pre-transformed page, and Q restores the state") {
    import MiniPdf._
    // scale 2× + translate (10,20): rect (5,5,10,10) → (20,30,20,20);
    // after Q the CTM is identity again, so the second rect lands raw
    val viaCm = Seq(FillColor(0xff0000), SaveState, Concat(2, 0, 0, 2, 10, 20),
      Rect(5, 5, 10, 10), Fill, RestoreState,
      FillColor(0x0000ff), Rect(70, 5, 5, 5), Fill)
    val direct = Seq(FillColor(0xff0000), Rect(20, 30, 20, 20), Fill,
      FillColor(0x0000ff), Rect(70, 5, 5, 5), Fill)
    assert(java.util.Arrays.equals(renderPathPage(viaCm, 100, 80),
      renderPathPage(direct, 100, 80)),
      "translate+scale page must raster byte-identically to its " +
        "pre-transformed twin")
    // Q restores COLOR state too (the whole envelope graphics state)
    val colorViaQ = Seq(FillColor(0xff0000), SaveState, FillColor(0x00ff00),
      RestoreState, Rect(5, 5, 5, 5), Fill)
    val colorDirect = Seq(FillColor(0xff0000), Rect(5, 5, 5, 5), Fill)
    assert(java.util.Arrays.equals(renderPathPage(colorViaQ, 20, 20),
      renderPathPage(colorDirect, 20, 20)))
    // unbalanced Q has no defined raster — loud failure
    intercept[IllegalArgumentException] {
      renderPathPage(Seq(RestoreState), 20, 20)
    }
  }

  test("MiniPdf PathPage cm: rotation turns re into the correct " +
    "parallelogram; Bézier control points transform before flattening") {
    import MiniPdf._
    // 90° CCW rotation + translate: (x,y) → (40−y, 10+x) — `re` must
    // paint the ROTATED quad, not an axis-aligned box
    val viaCm = Seq(FillColor(0x000000),
      Concat(0, 1, -1, 0, 40, 10), Rect(5, 5, 10, 20), Fill)
    val direct = Seq(FillColor(0x000000), MoveTo(35, 15), LineTo(35, 25),
      LineTo(15, 25), LineTo(15, 15), ClosePath, Fill)
    assert(java.util.Arrays.equals(renderPathPage(viaCm, 50, 40),
      renderPathPage(direct, 50, 40)),
      "rotated re must raster as its corner-mapped polygon")
    // a cubic under scale(2): transformed control points ≡ the explicitly
    // doubled curve (affine maps commute with Bézier evaluation)
    val curveCm = Seq(StrokeColor(0xff0000), Concat(2, 0, 0, 2, 0, 0),
      MoveTo(5, 5), CurveTo(10, 5, 15, 10, 15, 15), Stroke)
    val curveDirect = Seq(StrokeColor(0xff0000), MoveTo(10, 10),
      CurveTo(20, 10, 30, 20, 30, 30), Stroke)
    assert(java.util.Arrays.equals(renderPathPage(curveCm, 40, 40),
      renderPathPage(curveDirect, 40, 40)),
      "cubic under cm must flatten the transformed control points")
  }

  test("MiniPdf PathPage cm: write → extract round-trip through a real " +
    "content stream, clip ops included") {
    import MiniPdf._
    val ops = Seq(SaveState, Concat(2, 0, 0, 2, 10.5, 20),
      FillColor(0xff0000), Rect(5, 5, 10, 10), Clip, EndPath,
      Rect(0, 0, 50, 40), Fill, RestoreState,
      Rect(1, 1, 2, 2), ClipEvenOdd, EndPath)
    val pdf = writePages(Seq(PathPage(ops, w = 100, h = 80)))
    assert(extractPagePathOps(pdf, 1) == ops,
      "cm/q/Q/W/W*/n must round-trip (6-dp operands reparse exactly)")
  }

  test("MiniPdf PathPage W: a rect clip gates a larger fill to exactly the " +
    "intersection, byte-identical to filling the intersection directly") {
    import MiniPdf._
    // clip 10..30 × 10..25, then fill 0..40 × 0..40: only the clip
    // region paints — and the page must be byte-identical to a page that
    // just fills the intersection rect (clip mask and fill share ONE
    // span walk, so there is no half-pixel disagreement to tolerate)
    val clipped = Seq(FillColor(0xff0000),
      Rect(10, 10, 20, 15), Clip, EndPath,
      Rect(0, 0, 40, 40), Fill)
    val direct = Seq(FillColor(0xff0000), Rect(10, 10, 20, 15), Fill)
    assert(java.util.Arrays.equals(renderPathPage(clipped, 40, 40),
      renderPathPage(direct, 40, 40)))
  }

  test("MiniPdf PathPage W: §8.5.4 order — the painting op that carries " +
    "the pending clip still paints under the OLD clip") {
    import MiniPdf._
    // `re W f` fills the FULL rect (the clip only takes effect after);
    // the NEXT fill is gated
    val ops = Seq(FillColor(0x0000ff), Rect(5, 5, 30, 30), Clip, Fill)
    val png = renderPathPage(ops, 40, 40)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    // inside the W-carrying fill: painted
    assert((img.getRGB(20, 20) & 0xffffff) == 0x0000ff)
    // a follow-up fill outside the clip is suppressed
    val ops2 = ops ++ Seq(FillColor(0xff0000), Rect(0, 0, 40, 40), Fill)
    val img2 = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(renderPathPage(ops2, 40, 40)))
    assert((img2.getRGB(1, 1) & 0xffffff) == 0xffffff,
      "outside the clip must stay white")
    assert((img2.getRGB(20, 20) & 0xffffff) == 0xff0000,
      "inside the clip the second fill paints")
  }

  test("MiniPdf PathPage W: q/Q restores the clip region, clips compose " +
    "by intersection, and strokes are clipped too") {
    import MiniPdf._
    // inside q: clip to 10..20; after Q: full-page fill paints everywhere
    val viaQ = Seq(SaveState, Rect(10, 10, 10, 10), Clip, EndPath,
      RestoreState, FillColor(0x00ff00), Rect(0, 0, 40, 40), Fill)
    val direct = Seq(FillColor(0x00ff00), Rect(0, 0, 40, 40), Fill)
    assert(java.util.Arrays.equals(renderPathPage(viaQ, 40, 40),
      renderPathPage(direct, 40, 40)), "Q must restore the saved clip")
    // two successive clips intersect: 5..25 ∩ 15..35 = 15..25
    val twoClips = Seq(Rect(5, 5, 20, 20), Clip, EndPath,
      Rect(15, 15, 20, 20), Clip, EndPath,
      FillColor(0xff0000), Rect(0, 0, 40, 40), Fill)
    val inter = Seq(FillColor(0xff0000), Rect(15, 15, 10, 10), Fill)
    assert(java.util.Arrays.equals(renderPathPage(twoClips, 40, 40),
      renderPathPage(inter, 40, 40)), "clips must compose by intersection")
    // a stroke crossing the clip boundary only plots inside: horizontal
    // hairline y=20 from x=0..39 under clip x∈[10,30)
    val strokeClipped = Seq(Rect(10, 0, 20, 40), Clip, EndPath,
      MoveTo(0, 20), LineTo(39, 20), Stroke)
    val simg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      renderPathPage(strokeClipped, 40, 40)))
    assert((simg.getRGB(5, 19) & 0xffffff) == 0xffffff,
      "stroke outside the clip must not plot")
    assert((simg.getRGB(20, 19) & 0xffffff) == 0x000000,
      "stroke inside the clip must plot")
  }

  test("MiniPdf PathPage W: §8.5.4 strictness — a state op between W and " +
    "its paint, or a trailing unresolved W, fails loudly") {
    import MiniPdf._
    // q between W and the paint: invalid per spec — silently honoring it
    // would install the clip into the RESTORED state (the state Q brought
    // back), a page no conforming viewer paints
    val e1 = intercept[IllegalArgumentException] {
      renderPathPage(Seq(Rect(5, 5, 10, 10), Clip, SaveState, RestoreState,
        Fill), 40, 40)
    }
    assert(e1.getMessage.contains("8.5.4"), e1.getMessage)
    // color state between W and n: same class
    intercept[IllegalArgumentException] {
      renderPathPage(Seq(Rect(5, 5, 10, 10), Clip, FillColor(0xff0000),
        EndPath), 40, 40)
    }
    // a trailing W that no painting operator resolves
    val e2 = intercept[IllegalArgumentException] {
      renderPathPage(Seq(Rect(5, 5, 10, 10), Clip), 40, 40)
    }
    assert(e2.getMessage.contains("no subsequent painting"), e2.getMessage)
    // path CONSTRUCTION between W and the paint stays legal (§8.5.4):
    // the clip uses the whole accumulated path
    val legal = Seq(Rect(10, 10, 20, 20), Clip, MoveTo(0, 0), LineTo(1, 1),
      EndPath, FillColor(0xff0000), Rect(0, 0, 40, 40), Fill)
    val direct = Seq(FillColor(0xff0000), Rect(10, 10, 20, 20), Fill)
    assert(java.util.Arrays.equals(renderPathPage(legal, 40, 40),
      renderPathPage(direct, 40, 40)),
      "construction ops after W extend the clip path; the degenerate " +
        "2-point subpath adds no fillable region")
  }

  test("MiniPdf PathPage W*: even-odd clip of two overlapping squares " +
    "excludes the overlap") {
    import MiniPdf._
    // 5..25 and 15..35 as ONE path under even-odd: the 15..25 overlap is
    // outside the clip region
    val ops = Seq(Rect(5, 5, 20, 20), Rect(15, 15, 20, 20),
      ClipEvenOdd, EndPath,
      FillColor(0xff0000), Rect(0, 0, 40, 40), Fill)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      renderPathPage(ops, 40, 40)))
    assert((img.getRGB(10, 29) & 0xffffff) == 0xff0000,
      "first-square-only region is inside the even-odd clip")
    assert((img.getRGB(30, 9) & 0xffffff) == 0xff0000,
      "second-square-only region is inside the even-odd clip")
    assert((img.getRGB(20, 19) & 0xffffff) == 0xffffff,
      "the doubly-covered overlap is OUTSIDE the even-odd clip")
  }

  test("MiniPdf PathPage W: the clip path composes with the CTM " +
    "(cm before re W n clips the transformed rect)") {
    import MiniPdf._
    // scale 2× then clip a 5..15 user rect (= 10..30 device); the cm
    // persists, so the fill's user 0..20 rect is device 0..40 — the page
    // must equal the direct device-space equivalent
    val viaCm = Seq(Concat(2, 0, 0, 2, 0, 0),
      Rect(5, 5, 10, 10), Clip, EndPath,
      FillColor(0xff0000), Rect(0, 0, 20, 20), Fill)
    val direct = Seq(FillColor(0xff0000), Rect(10, 10, 20, 20), Fill)
    assert(java.util.Arrays.equals(renderPathPage(viaCm, 40, 40),
      renderPathPage(direct, 40, 40)))
  }

  test("MiniPdf PathPage Béziers: collinear cubic rasters byte-identically to its straight edge") {
    import MiniPdf._
    // the top edge drawn as a degenerate cubic whose control points sit ON
    // the segment: flattening yields collinear vertices, so the pixels must
    // be EXACTLY the plain-lineto square's — the strongest possible pin on
    // the flattening arithmetic (no tolerance anywhere)
    val curved = Seq(FillColor(0x000000), MoveTo(10, 10), LineTo(30, 10),
      LineTo(30, 30), CurveTo(25, 30, 15, 30, 10, 30), ClosePath, Fill)
    val straight = Seq(FillColor(0x000000), MoveTo(10, 10), LineTo(30, 10),
      LineTo(30, 30), LineTo(10, 30), ClosePath, Fill)
    assert(java.util.Arrays.equals(renderPathPage(curved, 40, 40),
      renderPathPage(straight, 40, 40)),
      "collinear-control cubic must raster exactly like the line it is")
  }

  test("MiniPdf PathPage Béziers: curved fill matches an independent point-in-polygon count") {
    import MiniPdf._
    // a genuinely curved shape: base segment + arching cubic, filled
    // nonzero. Expected coverage recomputed by an INDEPENDENT in-test
    // path: same fixed 16-step de Casteljau (the documented contract),
    // but a per-pixel-center crossing test instead of the renderer's
    // span filling — a span/boundary bug cannot cancel out
    val ops = Seq(FillColor(0x000000), MoveTo(5, 5), LineTo(35, 5),
      CurveTo(35, 25, 5, 25, 5, 5), Fill)
    val png = renderPathPage(ops, 40, 40)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val rendered = (for (y <- 0 until 40; x <- 0 until 40
      if (img.getRGB(x, y) & 0xffffff) == 0) yield 1).sum

    def ev(a: Double, b: Double, c: Double, d: Double, t: Double): Double = {
      val u = 1.0 - t
      val ab = a * u + b * t; val bc = b * u + c * t; val cd = c * u + d * t
      val abc = ab * u + bc * t; val bcd = bc * u + cd * t
      abc * u + bcd * t
    }
    val poly = ((5.0, 5.0) +: (35.0, 5.0) +: (1 to 16).map { k =>
      val t = k / 16.0
      (ev(35, 35, 5, 5, t), ev(5, 25, 25, 5, t))
    }).toIndexedSeq
    // renderer spans are half-open [xa, xb): a center ON a crossing is
    // inside iff the crossing is to its LEFT (inclusive) — accumulate
    // winding over crossings with xint ≤ cx, exactly the span rule
    def inside(cx: Double, cy: Double): Boolean = {
      var acc = 0
      for (i <- poly.indices) {
        val (x1, y1) = poly(i); val (x2, y2) = poly((i + 1) % poly.size)
        if (y1 < y2 && cy >= y1 && cy < y2 &&
          x1 + (cy - y1) * (x2 - x1) / (y2 - y1) <= cx) acc += 1
        else if (y2 < y1 && cy >= y2 && cy < y1 &&
          x1 + (cy - y1) * (x2 - x1) / (y2 - y1) <= cx) acc -= 1
      }
      acc != 0
    }
    val expected = (for (y <- 0 until 40; x <- 0 until 40
      if inside(x + 0.5, 40 - y - 0.5)) yield 1).sum
    assert(expected > 100, "fixture must have real curved area")
    assert(rendered == expected,
      s"curved fill covered $rendered centers, independent count $expected")
  }

  test("MiniPdf PathPage Béziers: v and y reduce exactly to the equivalent c") {
    import MiniPdf._
    def page(mid: Seq[PathOp]) = renderPathPage(
      FillColor(0x000000) +: MoveTo(5, 5) +: LineTo(35, 5) +: mid :+ Fill,
      40, 40)
    // v: first control = current point (35,5)
    assert(java.util.Arrays.equals(
      page(Seq(CurveToV(5, 25, 5, 5))),
      page(Seq(CurveTo(35, 5, 5, 25, 5, 5)))),
      "v must equal c with P1 = current point")
    // y: second control = endpoint (5,5)
    assert(java.util.Arrays.equals(
      page(Seq(CurveToY(35, 25, 5, 5))),
      page(Seq(CurveTo(35, 25, 5, 5, 5, 5)))),
      "y must equal c with P2 = endpoint")
    // a curve with genuinely no current point still fails loudly
    intercept[IllegalArgumentException] {
      renderPathPage(Seq(CurveTo(1, 1, 2, 2, 3, 3), Fill), 20, 20)
    }
  }

  test("MiniPdf PathPage Béziers: write → extract round-trip through a real content stream") {
    import MiniPdf._
    val ops = Seq(FillColor(0xff0000), MoveTo(5, 5), LineTo(35, 5),
      CurveTo(35, 25, 5, 25, 5, 5), Fill,
      StrokeColor(0x0000ff), MoveTo(5, 30), CurveToV(20, 38, 35, 30),
      CurveToY(20, 22, 5, 30), Stroke)
    val pdf = writePages(Seq(PathPage(ops, w = 40, h = 40)))
    assert(extractPagePathOps(pdf, 1) == ops)
    // and the curve page renders through the shared renderer seam
    val pdfs = Seq(("curve.pdf", 1, pdf)).toDF("file_name", "n_pages", "content")
    val png = PdfPages.renderPages(pdfs, col("n_pages"), pdfImageRenderer)
      .select("page_png").as[Array[Byte]].head()
    assert(java.util.Arrays.equals(png, renderPathPage(ops, 40, 40)))
  }

  // ------------------------------------------------- w/d stroke state (r17)

  private def pixelsOf(png: Array[Byte]): java.awt.image.BufferedImage =
    javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))

  test("MiniPdf PathPage dash: [4 2] pattern paints exact pixel runs; " +
    "phase shifts them; pattern restarts per subpath") {
    import MiniPdf._
    val h = 24
    def row(ops: Seq[PathOp]): Seq[Boolean] = {
      val img = pixelsOf(renderPathPage(ops, 24, h))
      (0 until 24).map(x => (img.getRGB(x, h - 1 - 10) & 0xffffff) == 0)
    }
    // horizontal rule x=0..17 at y=10: on 0-3, off 4-5, on 6-9, …
    val dashed = row(Seq(SetDash(Seq(4, 2), 0), MoveTo(0, 10),
      LineTo(17, 10), Stroke))
    val expect = (0 to 17).map(x => x % 6 < 4) ++ Seq.fill(6)(false)
    assert(dashed == expect, s"dash runs: $dashed")
    // §8.4.3.6: an ODD-length dash array alternates through a DOUBLE
    // pass — '[3] 0 d' is 3 on / 3 off (period 6), never a solid line
    val odd = row(Seq(SetDash(Seq(3), 0), MoveTo(0, 10),
      LineTo(17, 10), Stroke))
    val expectOdd = (0 to 17).map(x => x % 6 < 3) ++ Seq.fill(6)(false)
    assert(odd == expectOdd, s"odd-length dash must double-pass: $odd")
    // phase 2 starts the walk 2 units into the pattern
    val phased = row(Seq(SetDash(Seq(4, 2), 2), MoveTo(0, 10),
      LineTo(17, 10), Stroke))
    val expectPh = (0 to 17).map(x => (x + 2) % 6 < 4) ++ Seq.fill(6)(false)
    assert(phased == expectPh, s"phased runs: $phased")
    // §8.4.3.6: a NEW subpath restarts at the phase — splitting the rule
    // into (0..8)+(9..17) flips pixel 10 from off (continuous) to on
    val split = row(Seq(SetDash(Seq(4, 2), 0), MoveTo(0, 10), LineTo(8, 10),
      MoveTo(9, 10), LineTo(17, 10), Stroke))
    assert(!dashed(10) && split(10),
      s"subpath restart must re-anchor the pattern: $split")
    // and within one subpath the walk runs CONTINUOUSLY across a join:
    // an L-bend at (17,10) continues at pattern position 18 — the join
    // pixel itself (pos 17, off) is emitted once, never re-decided
    val img = pixelsOf(renderPathPage(Seq(SetDash(Seq(4, 2), 0),
      MoveTo(0, 10), LineTo(17, 10), LineTo(17, 15), Stroke), 24, h))
    def vPix(y: Int): Boolean = (img.getRGB(17, h - 1 - y) & 0xffffff) == 0
    // y=11..15 are walk positions 18..22 → on,on,on,on,off ([4 2]: pos%6<4)
    assert(Seq(11, 12, 13, 14).forall(vPix) && !vPix(15),
      s"dash must run continuously across the join: ${(11 to 15).map(vPix)}")
  }

  test("MiniPdf PathPage width: 3 w paints a 3-px band; even widths round " +
    "down to the odd brush; width ≤ 1 stays the byte-identical hairline") {
    import MiniPdf._
    def blackOf(ops: Seq[PathOp]): Set[(Int, Int)] = {
      val img = pixelsOf(renderPathPage(ops, 24, 24))
      (for (y <- 0 until 24; x <- 0 until 24
            if (img.getRGB(x, y) & 0xffffff) == 0) yield (x, 23 - y)).toSet
    }
    // default cap is BUTT (§8.4.1): the band ends flat AT the endpoints
    val black = blackOf(Seq(SetLineWidth(3), MoveTo(2, 10),
      LineTo(12, 10), Stroke))
    assert(black == (for (x <- 2 to 12; y <- 9 to 11) yield (x, y)).toSet,
      s"3-px butt-capped band: ${black.toSeq.sorted}")
    // width 2 rounds down to the 1-px brush (odd-square contract)…
    val two = renderPathPage(Seq(SetLineWidth(2), MoveTo(2, 10),
      LineTo(12, 10), Stroke), 24, 24)
    // …and width ≤ 1 (incl. the spec's 0 = thinnest renderable) is
    // BYTE-identical to the pre-`w` hairline renderer
    val hair = renderPathPage(Seq(MoveTo(2, 10), LineTo(12, 10), Stroke),
      24, 24)
    assert(java.util.Arrays.equals(two, hair), "even width → odd brush")
    for (wd <- Seq(0.0, 0.4, 1.0))
      assert(java.util.Arrays.equals(renderPathPage(
        Seq(SetLineWidth(wd), MoveTo(2, 10), LineTo(12, 10), Stroke),
        24, 24), hair), s"width $wd must stay the hairline")
  }

  test("MiniPdf PathPage w/d under CTM: pen scales by sqrt|det|; q/Q " +
    "restores stroke state; dashed+wide round-trips a real PDF") {
    import MiniPdf._
    // 2× CTM with 1.5 w ≡ identity with 3 w on the pre-scaled line
    val viaCm = renderPathPage(Seq(SaveState, Concat(2, 0, 0, 2, 0, 0),
      SetLineWidth(1.5), MoveTo(1, 5), LineTo(6, 5), Stroke, RestoreState),
      24, 24)
    val direct = renderPathPage(Seq(SetLineWidth(3), MoveTo(2, 10),
      LineTo(12, 10), Stroke), 24, 24)
    assert(java.util.Arrays.equals(viaCm, direct),
      "device pen width must scale with the CTM")
    // q/Q: width+dash set inside q…Q must NOT leak to the outer stroke
    val restored = renderPathPage(Seq(
      SaveState, SetLineWidth(3), SetDash(Seq(2, 2), 0), RestoreState,
      MoveTo(2, 10), LineTo(12, 10), Stroke), 24, 24)
    val hair = renderPathPage(Seq(MoveTo(2, 10), LineTo(12, 10), Stroke),
      24, 24)
    assert(java.util.Arrays.equals(restored, hair),
      "Q must restore width and dash")
    // write → extract → render round-trip through a REAL content stream
    val ops = Seq(StrokeColor(0x0000ff), SetLineWidth(3),
      SetDash(Seq(4, 2), 1.5), MoveTo(2, 10), LineTo(20, 10), Stroke,
      SetDash(Nil, 0), MoveTo(2, 18), LineTo(20, 18), Stroke)
    val pdf = writePages(Seq(PathPage(ops, w = 24, h = 24)))
    assert(extractPagePathOps(pdf, 1) == ops,
      s"w/d ops must round-trip: ${extractPagePathOps(pdf, 1)}")
    assert(java.util.Arrays.equals(
      PdfPages.renderPages(
        Seq(("wd.pdf", 1, pdf)).toDF("file_name", "n_pages", "content"),
        col("n_pages"), pdfImageRenderer)
        .select("page_png").as[Array[Byte]].head(),
      renderPathPage(ops, 24, 24)))
    // deterministic re-render
    assert(java.util.Arrays.equals(renderPathPage(ops, 24, 24),
      renderPathPage(ops, 24, 24)))
  }

  test("MiniPdf PathPage w/d validation: malformed dash state fails " +
    "loudly at parse, w/d between W and paint fail per §8.5.4") {
    import MiniPdf._
    // negative entries / all-zero array / missing array / operator inside
    // the array operand — each is an invalid stream, never a guess
    assert(intercept[IllegalArgumentException] {
      parsePathOps("[-1 2] 0 d")
    }.getMessage.contains("nonnegative"))
    assert(intercept[IllegalArgumentException] {
      parsePathOps("[0 0] 0 d")
    }.getMessage.contains("all-zero"))
    assert(intercept[IllegalArgumentException] {
      parsePathOps("3 d")
    }.getMessage.contains("no preceding"))
    assert(intercept[RuntimeException] {
      parsePathOps("[2 2 m] 0 d")
    }.getMessage.contains("inside"))
    assert(intercept[IllegalArgumentException] {
      parsePathOps("[2 2] 0")
    }.getMessage.contains("dangling"))
    // graphics-state ops between W and its paint have no defined raster
    intercept[IllegalArgumentException] {
      renderPathPage(Seq(Rect(2, 2, 8, 8), Clip, SetLineWidth(3),
        EndPath), 20, 20)
    }
    intercept[IllegalArgumentException] {
      renderPathPage(Seq(Rect(2, 2, 8, 8), Clip, SetDash(Seq(2, 2), 0),
        EndPath), 20, 20)
    }
  }

  // --------------------------------------------- J/j/M stroke state (r18)

  private def strokeBlack(ops: Seq[MiniPdf.PathOp], dim: Int = 24)
      : Set[(Int, Int)] = {
    val img = pixelsOf(MiniPdf.renderPathPage(ops, dim, dim))
    (for (y <- 0 until dim; x <- 0 until dim
          if (img.getRGB(x, y) & 0xffffff) == 0) yield (x, dim - 1 - y)).toSet
  }

  test("MiniPdf PathPage caps: butt default ends AT the endpoint, 2 J " +
    "projects the square, 1 J stamps end discs; hairline is cap-invariant") {
    import MiniPdf._
    val body = Seq(SetLineWidth(3), MoveTo(2, 10), LineTo(12, 10), Stroke)
    val butt = (for (x <- 2 to 12; y <- 9 to 11) yield (x, y)).toSet
    assert(strokeBlack(body) == butt)
    // projecting square (the pre-r18 implicit behavior): +r past each end
    assert(strokeBlack(SetLineCap(2) +: body) ==
      (for (x <- 1 to 13; y <- 9 to 11) yield (x, y)).toSet)
    // round: butt body + integer r=1 disc (a 1-px nub) at each open end
    assert(strokeBlack(SetLineCap(1) +: body) == butt + ((1, 10)) + ((13, 10)))
    // width ≤ 1 (r = 0): every cap style renders the identical hairline
    val hair = renderPathPage(Seq(MoveTo(2, 10), LineTo(12, 10), Stroke),
      24, 24)
    for (c <- 0 to 2)
      assert(java.util.Arrays.equals(renderPathPage(
        Seq(SetLineCap(c), MoveTo(2, 10), LineTo(12, 10), Stroke), 24, 24),
        hair), s"cap $c must not change the hairline")
    // closed subpaths have no caps: cap style never changes a closed path
    val rect = Seq(SetLineWidth(3), Rect(5, 5, 10, 10), Stroke)
    assert(java.util.Arrays.equals(
      renderPathPage(SetLineCap(1) +: rect, 24, 24),
      renderPathPage(SetLineCap(2) +: rect, 24, 24)))
  }

  test("MiniPdf PathPage joins: default miter keeps the square corner " +
    "(exact miter at 90°); 1 j / 2 j round it off via the disc stamp") {
    import MiniPdf._
    // L-bend: right along y=3 then up along x=10; vertex (10,3), outer
    // corner pixel (11,2) — covered only by the vertex stamp
    val bend = Seq(SetLineWidth(3), MoveTo(3, 3), LineTo(10, 3),
      LineTo(10, 10), Stroke)
    val miter = strokeBlack(bend)
    assert(miter((11, 2)), "miter (default) keeps the outer corner")
    val round = strokeBlack(SetLineJoin(1) +: bend)
    assert(!round((11, 2)), "round join cuts the outer corner")
    assert(round((11, 3)) && round((10, 2)),
      "round join keeps the disc cross arms")
    // bevel coincides with round at square-brush granularity (documented)
    assert(strokeBlack(SetLineJoin(2) +: bend) == round)
    // at 90° the square stamp IS the miter: an explicit generous limit
    // changes nothing (the quad repaints pixels the stamp already painted)
    assert(strokeBlack(SetMiterLimit(10) +: bend) == miter)
    // hairline joins are style-invariant
    val hairBend = Seq(MoveTo(3, 3), LineTo(10, 3), LineTo(10, 10), Stroke)
    assert(strokeBlack(hairBend) == strokeBlack(SetLineJoin(1) +: hairBend))
  }

  test("MiniPdf PathPage miter: an acute join paints the tip beyond the " +
    "vertex stamp; past the miter limit it falls back to bevel (§8.4.3.5)") {
    import MiniPdf._
    // V at (10,10): incoming from (2,10), outgoing to (3,6) — interior
    // angle ≈ 29.7°, miter ratio ≈ 3.89
    val v = Seq(SetLineWidth(5), MoveTo(2, 10), LineTo(10, 10),
      LineTo(3, 6), Stroke)
    val spiked = strokeBlack(v)
    val limited = strokeBlack(SetMiterLimit(2) +: v) // 3.89 > 2 → bevel
    val tip = spiked -- limited
    assert(tip.nonEmpty, "acute miter must add tip pixels")
    assert(tip.forall { case (x, y) =>
      math.max(math.abs(x - 10), math.abs(y - 10)) > 2 },
      s"tip pixels lie beyond the r=2 square stamp: ${tip.toSeq.sorted}")
    // ratio ≤ limit keeps the spike: the spec default limit (10) and an
    // explicit 4 both admit ratio 3.89
    assert(strokeBlack(SetMiterLimit(4) +: v) == spiked)
    // round join on the same path never paints past the vertex stamp
    assert((strokeBlack(SetLineJoin(1) +: v) -- limited).isEmpty)
  }

  test("MiniPdf PathPage J/j/M round-trip, validation, and q/Q restore") {
    import MiniPdf._
    val ops = Seq(SetLineCap(1), SetLineJoin(2), SetMiterLimit(4),
      SetLineWidth(3), MoveTo(2, 10), LineTo(12, 10), Stroke)
    val pdf = writePages(Seq(PathPage(ops, w = 24, h = 24)))
    assert(extractPagePathOps(pdf, 1) == ops,
      s"J/j/M must round-trip: ${extractPagePathOps(pdf, 1)}")
    // invalid styles / limits fail at parse, never guess
    assert(intercept[IllegalArgumentException] {
      parsePathOps("5 J")
    }.getMessage.contains("cap"))
    assert(intercept[IllegalArgumentException] {
      parsePathOps("1.5 j")
    }.getMessage.contains("non-integer"))
    assert(intercept[IllegalArgumentException] {
      parsePathOps("0.5 M")
    }.getMessage.contains("miter limit"))
    // graphics-state ops between W and its paint stay loud (§8.5.4)
    intercept[IllegalArgumentException] {
      renderPathPage(Seq(Rect(2, 2, 8, 8), Clip, SetLineCap(1),
        EndPath), 20, 20)
    }
    // q/Q: cap/join/miter set inside q…Q must not leak to the outer stroke
    val restored = renderPathPage(Seq(
      SaveState, SetLineCap(2), SetLineJoin(1), SetMiterLimit(1),
      RestoreState, SetLineWidth(3), MoveTo(2, 10), LineTo(12, 10), Stroke),
      24, 24)
    assert(java.util.Arrays.equals(restored, renderPathPage(
      Seq(SetLineWidth(3), MoveTo(2, 10), LineTo(12, 10), Stroke), 24, 24)),
      "Q must restore cap/join/miter state")
  }

  // ------------------------------------------- text in the path raster (r19)

  private def inkSetWH(png: Array[Byte], w: Int, h: Int,
                       rgb: Int = 0): Set[(Int, Int)] = {
    val img = pixelsOf(png)
    (for (y <- 0 until h; x <- 0 until w
          if (img.getRGB(x, y) & 0xffffff) == rgb)
      yield (x, h - 1 - y)).toSet
  }

  test("MiniPdf text: a pure-text page rasters byte-identically through " +
    "the unified path rasterizer; BT…ET parses into one ShowText") {
    import MiniPdf._
    val lines = Seq("Invoice 42 (final)", "total: 17.50")
    val pdf = writePages(Seq(TextPage(lines, 200, 120)))
    // the renderer seam now routes EVERY non-image page through
    // renderPathPage; the glyph stipples must land byte-equal to the
    // dedicated text raster
    assert(java.util.Arrays.equals(pdfImageRenderer("d", 1, pdf),
      renderTextPage(lines, 200, 120)),
      "unified raster must equal renderTextPage byte-for-byte")
    // and the parse is exact: writer Tm origin (72, h-72), TL 14 → one
    // run per line, escapes undone
    assert(extractPagePathOps(pdf, 1) == Seq(ShowText(Seq(
      (72.0, 48.0, lines(0)), (72.0, 34.0, lines(1))))))
  }

  test("MiniPdf text under an active path clip: glyphs stamp through the " +
    "mask — the last envelope notch, now a defined raster") {
    import MiniPdf._
    val run = ShowText(Seq((10.0, 20.0, "HXHXHX")))
    val u = inkSetWH(renderPathPage(Seq(run), 80, 40), 80, 40)
    val c = inkSetWH(renderPathPage(
      Seq(Rect(10, 13, 14, 10), Clip, EndPath, run), 80, 40), 80, 40)
    // clip region x∈[10,24), y∈[13,23) cuts the glyph boxes on both
    // axes: clipped ink must be EXACTLY the unclipped ink ∩ region
    val expect = u.filter { case (x, y) =>
      x >= 10 && x < 24 && y >= 13 && y < 23 }
    assert(c.nonEmpty && c != u && c == expect,
      s"clipped=$c\nexpected=$expect")
    // a mixed fill+clip+text page round-trips through a REAL PDF and
    // renders identically through the seam
    val ops = Seq(FillColor(0xff0000), Rect(0, 0, 5, 5), Fill,
      Rect(10, 13, 14, 10), Clip, EndPath, run)
    val pdf = writePages(Seq(PathPage(ops, 80, 40)))
    assert(extractPagePathOps(pdf, 1) == ops,
      "mixed content stream must round-trip exactly")
    assert(java.util.Arrays.equals(pdfImageRenderer("d", 1, pdf),
      renderPathPage(ops, 80, 40)))
    // text color is the FILL color, and q/Q restores it for text too
    val red = inkSetWH(renderPathPage(
      Seq(FillColor(0xff0000), run), 80, 40), 80, 40, rgb = 0xff0000)
    assert(red == u, "text must paint with the current fill color")
  }

  test("MiniPdf text envelope: loud failures — path op inside BT, " +
    "consecutive Tj, non-translation Tm, rotated CTM, W-gated text") {
    import MiniPdf._
    assert(intercept[RuntimeException] {
      parsePathOps("BT 10 10 m ET") }.getMessage.contains("inside BT"))
    assert(intercept[RuntimeException] {
      parsePathOps("BT (a) Tj (b) Tj ET") }
      .getMessage.contains("repositioning"))
    assert(intercept[RuntimeException] {
      parsePathOps("BT 2 0 0 2 5 5 Tm ET") }
      .getMessage.contains("translation"))
    assert(intercept[RuntimeException] {
      parsePathOps("BT (x) Tj") }.getMessage.contains("unterminated 'BT'"))
    assert(intercept[RuntimeException] {
      parsePathOps("(x) Tj") }.getMessage.contains("outside BT"))
    val e = intercept[RuntimeException] {
      renderPathPage(Seq(Concat(0, 1, -1, 0, 0, 0),
        ShowText(Seq((5.0, 5.0, "x")))), 20, 20) }
    assert(e.getMessage.contains("scaled/rotated CTM"))
    // §8.5.4 strictness: text between W and its resolving paint is loud
    val e2 = intercept[RuntimeException] {
      renderPathPage(Seq(Rect(0, 0, 10, 10), Clip,
        ShowText(Seq((5.0, 5.0, "x")))), 20, 20) }
    assert(e2.getMessage.contains("painting"))
  }

  test("MiniPdf PathPage caps: a subpath looping back past an endpoint's " +
    "perpendicular keeps its stroke-body pixels (emission-window planes)") {
    import MiniPdf._
    // width 5 (r=2), butt caps: start (10,10) heading +x, the subpath
    // returns at y=14 and crosses LEFT of the start perpendicular inside
    // the old spatial window — body pixels the round-18 form erased
    val ops = Seq(SetLineWidth(5), MoveTo(10, 10), LineTo(30, 10),
      LineTo(30, 14), LineTo(4, 14), Stroke)
    val ink = strokeBlack(ops, 40)
    for (x <- 5 to 9)
      assert(ink((x, 14)),
        s"loop-back body pixel ($x,14) erased by the start-cap plane")
    // the TERMINAL stamps still honor the butt plane: nothing paints
    // left of the start perpendicular on the start segment's own rows
    for (x <- 5 to 9; y <- 8 to 11)
      assert(!ink((x, y)), s"butt-cap leak at ($x,$y)")
  }
}
