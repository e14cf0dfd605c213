package graft.io

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.US_ASCII

/** A minimal REAL PDF backend for the S7 seam (reference:
  * Tools/server.py:59-74 renders PDF pages via fitz; SURVEY §7.4.8).
  *
  * No JVM PDF rasterizer ships in this environment, so full content-stream
  * rasterization stays out of scope — but the dominant document-AI case,
  * scanned/image-backed PDFs (one raster image per page), needs no
  * rasterizer at all: rendering such a page IS decoding its embedded image.
  * This object implements that subset for real:
  *
  *  - [[write]] produces a genuine PDF 1.4 file — catalog, page tree, one
  *    DCTDecode (JPEG) image XObject per page, content streams, xref table,
  *    trailer — that any conforming viewer opens;
  *  - [[pageCount]] reads /Count from the page tree via the trailer's
  *    /Root reference (not a substring guess);
  *  - [[extractPageImage]] walks trailer → /Root → /Pages → /Kids[n] →
  *    /Resources /XObject → image object, following the xref offsets, and
  *    returns the page's JPEG bytes;
  *  - [[pdfImageRenderer]] plugs that into [[PdfPages.renderPages]]:
  *    extract → JDK-ImageIO decode → PNG re-encode, a real render of a
  *    real PDF through the real codec.
  *
  * Envelope (documented, asserted by the parser): image-only pages, one
  * XObject per page, uncompressed object dictionaries (streams themselves
  * are DCT-compressed). A full engine (pdfbox-class) would replace this
  * object behind the same [[PdfPages.Renderer]] seam.
  */
object MiniPdf {

  /** Build a real one-image-per-page PDF from per-page JPEG bytes
    * (width/height must match the encoded images).
    */
  def write(pageJpegs: Seq[(Array[Byte], Int, Int)]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val offsets = scala.collection.mutable.ArrayBuffer[Int]()
    def emit(s: String): Unit = out.write(s.getBytes(US_ASCII))
    def beginObj(): Unit = offsets += out.size()
    emit("%PDF-1.4\n")
    val n = pageJpegs.size
    // object numbering: 1 catalog, 2 pages; per page i: 3+3i page,
    // 4+3i image, 5+3i content
    beginObj(); emit("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    val kids = (0 until n).map(i => s"${3 + 3 * i} 0 R").mkString(" ")
    beginObj()
    emit(s"2 0 obj\n<< /Type /Pages /Kids [$kids] /Count $n >>\nendobj\n")
    pageJpegs.zipWithIndex.foreach { case ((jpeg, w, h), i) =>
      val (pObj, iObj, cObj) = (3 + 3 * i, 4 + 3 * i, 5 + 3 * i)
      beginObj()
      emit(s"$pObj 0 obj\n<< /Type /Page /Parent 2 0 R " +
        s"/MediaBox [0 0 $w $h] " +
        s"/Resources << /XObject << /Im0 $iObj 0 R >> >> " +
        s"/Contents $cObj 0 R >>\nendobj\n")
      beginObj()
      emit(s"$iObj 0 obj\n<< /Type /XObject /Subtype /Image /Width $w " +
        s"/Height $h /ColorSpace /DeviceRGB /BitsPerComponent 8 " +
        s"/Filter /DCTDecode /Length ${jpeg.length} >>\nstream\n")
      out.write(jpeg)
      emit("\nendstream\nendobj\n")
      val draw = s"q $w 0 0 $h 0 0 cm /Im0 Do Q"
      beginObj()
      emit(s"$cObj 0 obj\n<< /Length ${draw.length} >>\nstream\n" +
        s"$draw\nendstream\nendobj\n")
    }
    val xrefAt = out.size()
    emit(f"xref%n0 ${offsets.size + 1}%n0000000000 65535 f %n")
    offsets.foreach(o => emit(f"$o%010d 00000 n %n"))
    emit(s"trailer\n<< /Size ${offsets.size + 1} /Root 1 0 R >>\n" +
      s"startxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  // -- parsing ------------------------------------------------------------

  private def ascii(b: Array[Byte], from: Int, until: Int): String =
    new String(b, from, (until min b.length) - from, US_ASCII)

  /** Object offsets from the xref table the trailer points at. */
  private def xrefOffsets(pdf: Array[Byte]): Map[Int, Int] = {
    val tail = ascii(pdf, math.max(0, pdf.length - 200), pdf.length)
    val sx = """startxref\s+(\d+)""".r.findAllMatchIn(tail).toSeq.lastOption
      .getOrElse(sys.error("no startxref")).group(1).toInt
    val table = ascii(pdf, sx, math.min(pdf.length, sx + 40000))
    val head = """xref\s+(\d+)\s+(\d+)""".r.findFirstMatchIn(table)
      .getOrElse(sys.error("no xref header"))
    val (first, count) = (head.group(1).toInt, head.group(2).toInt)
    val entries = """(\d{10}) (\d{5}) ([nf])""".r.findAllMatchIn(table)
      .toSeq.take(count)
    entries.zipWithIndex.collect {
      case (m, i) if m.group(3) == "n" => (first + i) -> m.group(1).toInt
    }.toMap
  }

  /** The dictionary text of object `num` (up to its stream/endobj). */
  private def objDict(pdf: Array[Byte], offsets: Map[Int, Int],
                      num: Int): String = {
    val at = offsets.getOrElse(num, sys.error(s"object $num not in xref"))
    val window = ascii(pdf, at, at + 2000)
    val end = Seq(window.indexOf("stream"), window.indexOf("endobj"))
      .filter(_ >= 0).min
    window.substring(0, end)
  }

  private def ref(dict: String, key: String): Int =
    (key + """\s+(\d+)\s+0\s+R""").r.findFirstMatchIn(dict)
      .getOrElse(sys.error(s"no $key in $dict")).group(1).toInt

  /** Page count via trailer /Root → /Pages /Count. */
  def pageCount(pdf: Array[Byte]): Int = {
    val offs = xrefOffsets(pdf)
    val trailer = ascii(pdf, math.max(0, pdf.length - 400), pdf.length)
    val root = ref(trailer, "/Root")
    val pages = ref(objDict(pdf, offs, root), "/Pages")
    """/Count\s+(\d+)""".r.findFirstMatchIn(objDict(pdf, offs, pages))
      .getOrElse(sys.error("no /Count")).group(1).toInt
  }

  /** The embedded image bytes (JPEG for DCTDecode) of 1-based `page`. */
  def extractPageImage(pdf: Array[Byte], page: Int): Array[Byte] = {
    val offs = xrefOffsets(pdf)
    val trailer = ascii(pdf, math.max(0, pdf.length - 400), pdf.length)
    val pagesDict = objDict(pdf, offs, ref(trailer, "/Root")) match {
      case d => objDict(pdf, offs, ref(d, "/Pages"))
    }
    val kids = """/Kids\s*\[([^\]]*)\]""".r.findFirstMatchIn(pagesDict)
      .getOrElse(sys.error("no /Kids")).group(1)
    val kidNums = """(\d+)\s+0\s+R""".r.findAllMatchIn(kids)
      .map(_.group(1).toInt).toSeq
    require(page >= 1 && page <= kidNums.size, s"page $page of ${kidNums.size}")
    val pageDict = objDict(pdf, offs, kidNums(page - 1))
    val xobj = """/XObject\s*<<[^>]*?(\d+)\s+0\s+R""".r
      .findFirstMatchIn(pageDict).getOrElse(sys.error("no /XObject"))
      .group(1).toInt
    val at = offs(xobj)
    val header = ascii(pdf, at, at + 1000)
    val len = """/Length\s+(\d+)""".r.findFirstMatchIn(header)
      .getOrElse(sys.error("no /Length")).group(1).toInt
    val streamKw = header.indexOf("stream")
    require(streamKw >= 0, "no stream keyword")
    // stream data begins after "stream" + EOL
    var s = at + streamKw + "stream".length
    if (pdf(s) == '\r') s += 1
    if (pdf(s) == '\n') s += 1
    java.util.Arrays.copyOfRange(pdf, s, s + len)
  }

  /** A real [[PdfPages.Renderer]]: page JPEG → full ImageIO pixel decode →
    * PNG re-encode. Rendering an image-backed page is exactly this.
    */
  def pdfImageRenderer: PdfPages.Renderer = (_, page, pdfBytes) => {
    val jpeg = extractPageImage(pdfBytes, page)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
    require(img != null, s"page $page image did not decode")
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Solid-color JPEG fixture page (ImageIO-encoded). */
  def solidJpeg(rgb: Int, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }
}
