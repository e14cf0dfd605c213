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
  *  - [[write]]/[[writePages]] produce a genuine PDF 1.4 file — catalog,
  *    page tree, one image XObject per page (DCTDecode/JPEG or
  *    FlateDecode raw RGB/gray), content streams, xref table, trailer — that
  *    any conforming viewer opens;
  *  - [[pageCount]] reads /Count from the page tree via the trailer's
  *    /Root reference (not a substring guess);
  *  - [[extractPageImage]] walks trailer → /Root → /Pages → /Kids[n] →
  *    /Resources /XObject → image object, following the xref offsets, and
  *    returns the page's JPEG bytes;
  *  - [[pdfImageRenderer]] plugs that into [[PdfPages.renderPages]]:
  *    extract → JDK-ImageIO decode → PNG re-encode, a real render of a
  *    real PDF through the real codec.
  *
  * Envelope (documented, asserted by the parser): one XObject per image
  * page (DCTDecode/JPEG, or FlateDecode raw RGB / gray / 8-bit
  * indexed-palette), PLUS text-operator pages (round 11): [[TextPage]]
  * writes a real standard-font `Tj` content stream, [[extractPageText]]
  * reads it back, and the renderer produces a defined, deterministic
  * metrics-free raster ([[renderTextPage]]) instead of an envelope miss,
  * PLUS vector-path pages (round 13): [[PathPage]] writes a real
  * `m l h re c v y f f* S n rg RG cm q Q W W* w d` content stream (cubic
  * Béziers since round 15), [[extractPagePathOps]] reads it back, and
  * [[renderPathPage]] rasterizes it with an own scanline fill (both
  * winding rules) + Bresenham strokes, curves flattened by a fixed
  * 16-segment de Casteljau — deterministic across JVMs, no Java2D
  * rasterizer. CTM transforms (`cm` with `q`/`Q`, round 16) apply at
  * path-construction time; clipping (`W`/`W*` with `n`, round 16)
  * intersects a copy-on-write device-pixel mask after each paint op;
  * stroke width `w` and dash state `d` (round 17) render as a square
  * device brush + a per-pixel dash walk along the Bresenham trace;
  * caps/joins/miter (`J`/`j`/`M`, round 18) complete the stroke state —
  * butt/round/projecting caps as half-plane clips and disc stamps on the
  * open ends, miter joins as the square vertex stamp plus an explicit
  * tip quad for acute angles (miter-limit bevel fallback per §8.4.3.5),
  * round/bevel joins as a disc vertex stamp; text blocks INSIDE path
  * pages (round 19 — the former last notch) parse as [[ShowText]] ops
  * and stamp the renderTextPage glyph stipples through the live clip
  * mask and fill color, so cropped-table pages (text under `W n`) have
  * a defined raster and EVERY non-image page routes through the one
  * scanline rasterizer. Out-of-envelope state (scaled/rotated text
  * matrices or CTMs under text, glyph-metric-dependent positioning,
  * TJ arrays) still fails loudly rather than paint a wrong page.
  * Object dictionaries are uncompressed (the image streams themselves are
  * compressed). A full engine (pdfbox-class) would replace this object
  * behind the same [[PdfPages.Renderer]] seam.
  */
object MiniPdf {

  /** One image-backed page: the stream bytes, their PDF /Filter, and the
    * pixel dimensions. DCTDecode wraps ready JPEG bytes; FlateDecode wraps
    * zlib-deflated raw RGB24 rows (top-down, 3 bytes/pixel) — the other
    * image encoding real scanners/exporters emit (both are public PDF 1.4
    * stream filters, and `java.util.zip` is the whole codec).
    */
  sealed trait PageImage { def w: Int; def h: Int }
  final case class DctPage(jpeg: Array[Byte], w: Int, h: Int)
    extends PageImage
  final case class FlateRgbPage(rawRgb: Array[Byte], w: Int, h: Int)
    extends PageImage {
    require(w > 0 && h > 0, s"non-positive page dims ${w}x$h")
    // long arithmetic: w*h*3 overflows Int past ~26k x 26k, and an
    // Int-wrapped product could let a wrong-size buffer pass validation
    require(rawRgb.length.toLong == w.toLong * h * 3,
      s"raw RGB size ${rawRgb.length} != $w*$h*3")
  }
  /** DeviceGray 8-bit (1 byte/pixel, rows top-down) — the encoding
    * grayscale scanners emit; the most common scanned-document format.
    */
  final case class FlateGrayPage(rawGray: Array[Byte], w: Int, h: Int)
    extends PageImage {
    require(w > 0 && h > 0, s"non-positive page dims ${w}x$h")
    require(rawGray.length.toLong == w.toLong * h,
      s"raw gray size ${rawGray.length} != $w*$h")
  }
  /** Indexed color (8-bit palette indices + an RGB lookup table, the PDF
    * `[/Indexed /DeviceRGB hival <lookup>]` color space — PNG-PLTE-style
    * screenshots and plot exports re-encoded into PDFs). `palette` is
    * 3·(hival+1) bytes of RGB triples, ≤ 256 entries; every index must be
    * ≤ hival (the renderer rejects out-of-range samples loudly, per spec
    * they would clamp — a symptom of a corrupt stream, not a rendering
    * choice this engine should paper over).
    */
  final case class FlateIndexedPage(indices: Array[Byte],
                                    palette: Array[Byte], w: Int, h: Int)
    extends PageImage {
    require(w > 0 && h > 0, s"non-positive page dims ${w}x$h")
    require(indices.length.toLong == w.toLong * h,
      s"index plane size ${indices.length} != $w*$h")
    require(palette.length % 3 == 0 && palette.length > 0 &&
      palette.length <= 768,
      s"palette must be 3·n bytes, 1 ≤ n ≤ 256, got ${palette.length}")
  }
  /** A TEXT-operator page (round 11, closing the vector-content notch of
    * the S7 envelope): `lines` become a genuine PDF text content stream —
    * `BT /F0 12 Tf 14 TL ... (line) Tj T* ... ET` against the standard
    * 14-font /Helvetica (PDF 1.4 §5.5.1: standard fonts need no embedded
    * program, any conforming viewer supplies them), so the file opens as
    * real selectable text everywhere. ASCII only (the Type-1 standard
    * encoding subset this writer targets); parens/backslashes escaped.
    */
  final case class TextPage(lines: Seq[String], w: Int = 612, h: Int = 792)
    extends PageImage {
    require(w > 0 && h > 0, s"non-positive page dims ${w}x$h")
    require(lines.forall(_.forall(c => c >= 0x20 && c <= 0x7e)),
      "TextPage lines must be printable ASCII")
  }

  /** Vector path operators (PDF 1.4 §4.4 subset) for [[PathPage]]:
    * path construction `m`/`l`/`h`/`re`, cubic Béziers `c`/`v`/`y`
    * (round 15) and painting `f` (nonzero fill), `f*` (even-odd fill),
    * `S` (stroke), with `rg`/`RG` color state and `w`/`d` stroke
    * width/dash state (round 17). Integer coordinates in page user space
    * (origin bottom-left, y-up).
    */
  sealed trait PathOp
  final case class MoveTo(x: Int, y: Int) extends PathOp
  final case class LineTo(x: Int, y: Int) extends PathOp
  case object ClosePath extends PathOp
  final case class Rect(x: Int, y: Int, rw: Int, rh: Int) extends PathOp
  /** `c` — full cubic: both control points explicit (PDF §8.5.2.2). */
  final case class CurveTo(x1: Int, y1: Int, x2: Int, y2: Int,
                           x3: Int, y3: Int) extends PathOp
  /** `v` — first control point = current point. */
  final case class CurveToV(x2: Int, y2: Int, x3: Int, y3: Int) extends PathOp
  /** `y` — second control point = endpoint. */
  final case class CurveToY(x1: Int, y1: Int, x3: Int, y3: Int) extends PathOp
  final case class FillColor(rgb: Int) extends PathOp
  final case class StrokeColor(rgb: Int) extends PathOp
  case object Fill extends PathOp          // f  (nonzero winding)
  case object FillEvenOdd extends PathOp   // f* (even-odd)
  case object Stroke extends PathOp        // S
  /** `w` — stroke line width, user-space units (§8.4.3.2). Rendered as a
    * square device brush: devW = width·√|det CTM| (the uniform-scale pen
    * approximation), painting the odd-width square of
    * 2·⌊(round(devW)−1)/2⌋+1 pixels centered on each stroke pixel — so
    * width ≤ 1 (and width 0, the spec's "thinnest renderable") stays the
    * 1-px hairline byte-identical to the pre-`w` renderer.
    */
  final case class SetLineWidth(width: Double) extends PathOp
  /** `d` — dash array + phase, user-space units (§8.4.3.6). The walk is
    * per device pixel along the Bresenham trace (Chebyshev arc length —
    * exact for the axis-aligned rules and table borders that dominate
    * document layout; diagonals dash by pixel count, documented
    * simplification), entries and phase scaled by √|det CTM|, pattern
    * restarted at each subpath start per spec. Empty array = solid.
    */
  final case class SetDash(pattern: Seq[Double], phase: Double)
    extends PathOp {
    require(pattern.forall(_ >= 0) && phase >= 0,
      s"dash entries and phase must be nonnegative: [$pattern] $phase")
    require(pattern.isEmpty || pattern.exists(_ > 0),
      "all-zero dash array would paint nothing (§8.4.3.6 forbids it)")
  }
  /** `J` — line cap style (§8.4.3.3): 0 butt (stroke squared off AT the
    * endpoint — the spec DEFAULT), 1 round (a disc of the pen radius
    * stamped at each open end), 2 projecting square (the full square
    * stamp, extending half the width past the endpoint — the only style
    * the pre-round-18 renderer painted). Caps apply to the two ends of
    * each OPEN subpath; at this renderer's per-pixel dash granularity,
    * dash-segment ends stay butt-shaped (documented simplification).
    */
  final case class SetLineCap(style: Int) extends PathOp {
    require(style >= 0 && style <= 2, s"line cap style must be 0/1/2: $style")
  }
  /** `j` — line join style (§8.4.3.4): 0 miter (spec default; the square
    * vertex stamp IS the exact miter for right angles, and an explicit
    * miter-quad paints the tip for acute ones, with the §8.4.3.5
    * miter-limit bevel fallback), 1 round, 2 bevel. Round and bevel both
    * render as a disc vertex stamp — at square-brush granularity the
    * chord-vs-arc difference is below one pixel (documented).
    */
  final case class SetLineJoin(style: Int) extends PathOp {
    require(style >= 0 && style <= 2, s"line join style must be 0/1/2: $style")
  }
  /** `M` — miter limit (§8.4.3.5): maximum ratio of miter length to line
    * width before a miter join falls back to bevel. Spec requires ≥ 1
    * (the ratio's geometric minimum).
    */
  final case class SetMiterLimit(limit: Double) extends PathOp {
    require(limit >= 1, s"miter limit must be >= 1 (§8.4.3.5): $limit")
  }
  /** `cm` (round 16) — concatenate a 2×3 affine matrix onto the CTM
    * (PDF 32000 §8.4.4): [x' y'] = [x y 1]·[[a b],[c d],[e f]], applied
    * at path-CONSTRUCTION time, so `re` under rotation is the correct
    * parallelogram and Bézier control points transform before the fixed
    * de Casteljau flattening (affine maps commute with Bézier
    * evaluation — the flattened polyline is exactly the transformed
    * curve's). Operands are written at 6 dp (Locale.ROOT), so simple
    * matrices round-trip bit-exactly through write→extract.
    */
  final case class Concat(a: Double, b: Double, c: Double, d: Double,
                          e: Double, f: Double) extends PathOp
  /** `q` — push the graphics state (CTM + fill/stroke colors, the whole
    * state this envelope carries). The current PATH is not graphics
    * state (§8.4.1) and survives q/Q untouched.
    */
  case object SaveState extends PathOp
  /** `Q` — pop the graphics state; unbalanced `Q` fails loudly. */
  case object RestoreState extends PathOp
  /** `W` (round 16) — mark the current path as a pending clip (nonzero
    * winding). Per PDF 32000 §8.5.4 the clip takes effect AFTER the next
    * painting operator (which itself paints under the OLD clip), as the
    * intersection of the current clip region and the path's fill region.
    * The clip region is graphics state: `q`/`Q` save/restore it
    * (copy-on-write mask, so a saved state never aliases a later
    * intersection).
    */
  case object Clip extends PathOp
  /** `W*` — pending clip under the even-odd rule. */
  case object ClipEvenOdd extends PathOp
  /** `n` — end the path without painting (PDF §8.5.3.1). With a pending
    * `W` this is the canonical clip-set sequence (`… re W n`); alone it
    * just discards the path.
    */
  case object EndPath extends PathOp
  /** A parsed `BT … ET` text block (round 19 — the last envelope notch:
    * text painted while a `W n` path clip is active, the cropped-table
    * shape `Tools/server.py:59-74` renders). Each run is one `Tj` with
    * its TEXT-SPACE baseline origin (the accumulated `Tm`/`Td`/`T*`/`TL`
    * positioning); glyphs raster through the SAME clip mask and fill
    * color as path paints, with [[renderTextPage]]'s exact 5×7 stipple
    * geometry — a pure-text page rasters byte-identically through either
    * path (PdfPagesSpec pins it). The envelope holds text matrices to
    * translation (`1 0 0 1 e f Tm`) and the CTM at paint time to
    * translation too: a scaled/rotated glyph grid has no defined stipple
    * raster here, so it fails loudly rather than paint a wrong page.
    */
  final case class ShowText(runs: Seq[(Double, Double, String)])
    extends PathOp

  /** A VECTOR-path page (round 13, the last S7 notch): `ops` become a
    * genuine PDF path content stream (`m l h re f f* S n rg RG cm q Q
    * W W*`) any conforming viewer paints, and [[renderPathPage]] rasterizes it
    * deterministically — an own scanline fill (both PDF winding rules)
    * plus Bresenham strokes, no Java2D rasterizer, so the pixels are
    * bit-identical across JVMs the same way [[renderTextPage]]'s glyph
    * stipples are. Cubic Béziers (`c v y`, round 15) flatten to a FIXED
    * 16-segment de Casteljau polyline (t = k/16 exact binary, fixed IEEE
    * operation order — reproducible anywhere) feeding the same scanline
    * machinery. CTM transforms (`cm`, round 16) apply at path-
    * construction time with `q`/`Q` state save/restore; stroke width and
    * dash state (`w`/`d`, round 17) scale to device by √|det CTM| — the
    * uniform-scale pen contract ([[SetLineWidth]]/[[SetDash]]). Clipping
    * (`W`/`W*` + `n`, round 16) rides the SAME scanline span walk as
    * fills — a clip mask and the fill it gates agree pixel-for-pixel by
    * construction — and `q`/`Q` save/restore the mask by reference
    * (copy-on-write on intersection).
    */
  final case class PathPage(ops: Seq[PathOp], w: Int = 612, h: Int = 792)
    extends PageImage {
    require(w > 0 && h > 0, s"non-positive page dims ${w}x$h")
  }

  // Locale.ROOT, never the f-interpolator: String.format under a comma-
  // decimal default locale (de, fr, …) would emit "0,2000" into the
  // content stream — an invalid PDF every viewer and our own parser reject
  private def pdfDecimal(channel: Int): String =
    String.format(java.util.Locale.ROOT, "%.4f", channel / 255.0)

  private[graft] def pathOpsToStream(ops: Seq[PathOp]): String =
    ops.map {
      case MoveTo(x, y) => s"$x $y m"
      case LineTo(x, y) => s"$x $y l"
      case ClosePath => "h"
      case Rect(x, y, rw, rh) => s"$x $y $rw $rh re"
      case CurveTo(x1, y1, x2, y2, x3, y3) => s"$x1 $y1 $x2 $y2 $x3 $y3 c"
      case CurveToV(x2, y2, x3, y3) => s"$x2 $y2 $x3 $y3 v"
      case CurveToY(x1, y1, x3, y3) => s"$x1 $y1 $x3 $y3 y"
      case FillColor(c) => s"${pdfDecimal(c >> 16 & 0xff)} " +
        s"${pdfDecimal(c >> 8 & 0xff)} ${pdfDecimal(c & 0xff)} rg"
      case StrokeColor(c) => s"${pdfDecimal(c >> 16 & 0xff)} " +
        s"${pdfDecimal(c >> 8 & 0xff)} ${pdfDecimal(c & 0xff)} RG"
      case Fill => "f"
      case FillEvenOdd => "f*"
      case Stroke => "S"
      case SetLineWidth(wd) => s"${pdfNum(wd)} w"
      case SetDash(pat, phase) =>
        "[" + pat.map(pdfNum).mkString(" ") + "] " + pdfNum(phase) + " d"
      case SetLineCap(s) => s"$s J"
      case SetLineJoin(s) => s"$s j"
      case SetMiterLimit(m) => s"${pdfNum(m)} M"
      case Concat(a, b, c, d, e, f) =>
        Seq(a, b, c, d, e, f).map(pdfNum).mkString(" ") + " cm"
      case SaveState => "q"
      case RestoreState => "Q"
      case Clip => "W"
      case ClipEvenOdd => "W*"
      case EndPath => "n"
      // each run re-states its origin as an explicit translation Tm, so
      // the stream round-trips through parsePathOps exactly (the parser
      // accumulates Td/T*/TL into per-run origins; emission normalizes)
      case ShowText(runs) =>
        "BT /F0 12 Tf " + runs.map { case (x, y, s) =>
          val esc = s.replace("\\", "\\\\")
            .replace("(", "\\(").replace(")", "\\)")
          s"1 0 0 1 ${pdfNum(x)} ${pdfNum(y)} Tm ($esc) Tj"
        }.mkString(" ") + " ET"
    }.mkString(" ")

  /** 6-dp PDF number (Locale.ROOT — see [[pdfDecimal]]'s comma-locale
    * trap); integral values print bare so coordinate-only streams stay
    * byte-identical to the pre-`cm` writer.
    */
  private def pdfNum(v: Double): String =
    if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString
    else String.format(java.util.Locale.ROOT, "%.6f", Double.box(v))

  /** Build a real one-image-per-page PDF from per-page JPEG bytes
    * (width/height must match the encoded images).
    */
  def write(pageJpegs: Seq[(Array[Byte], Int, Int)]): Array[Byte] =
    writePages(pageJpegs.map { case (j, w, h) => DctPage(j, w, h) })

  /** Build a real one-image-per-page PDF; pages may mix DCTDecode and
    * FlateDecode image XObjects.
    */
  def writePages(pages: Seq[PageImage]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val offsets = scala.collection.mutable.ArrayBuffer[Int]()
    def emit(s: String): Unit = out.write(s.getBytes(US_ASCII))
    def beginObj(): Unit = offsets += out.size()
    emit("%PDF-1.4\n")
    val n = pages.size
    // object numbering: 1 catalog, 2 pages; per page i: 3+3i page,
    // 4+3i image, 5+3i content
    beginObj(); emit("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    val kids = (0 until n).map(i => s"${3 + 3 * i} 0 R").mkString(" ")
    beginObj()
    emit(s"2 0 obj\n<< /Type /Pages /Kids [$kids] /Count $n >>\nendobj\n")
    pages.zipWithIndex.foreach { case (pg, i) =>
      val (pObj, iObj, cObj) = (3 + 3 * i, 4 + 3 * i, 5 + 3 * i)
      val (w, h) = (pg.w, pg.h)
      pg match {
        case TextPage(lines, _, _) =>
          // same 3-object numbering as image pages; the middle object is
          // the (stream-less) standard-font dict instead of an XObject
          beginObj()
          emit(s"$pObj 0 obj\n<< /Type /Page /Parent 2 0 R " +
            s"/MediaBox [0 0 $w $h] " +
            s"/Resources << /Font << /F0 $iObj 0 R >> >> " +
            s"/Contents $cObj 0 R >>\nendobj\n")
          beginObj()
          emit(s"$iObj 0 obj\n<< /Type /Font /Subtype /Type1 " +
            "/BaseFont /Helvetica >>\nendobj\n")
          val esc = lines.map(_.replace("\\", "\\\\")
            .replace("(", "\\(").replace(")", "\\)"))
          val body = s"BT /F0 12 Tf 14 TL 1 0 0 1 72 ${h - 72} Tm " +
            esc.map(l => s"($l) Tj T*").mkString(" ") + " ET"
          beginObj()
          emit(s"$cObj 0 obj\n<< /Length ${body.length} >>\nstream\n" +
            s"$body\nendstream\nendobj\n")

        case PathPage(pops, _, _) =>
          // 3-object numbering kept; the middle object is the font dict
          // when the page shows text (a conforming viewer needs the /F0
          // resource), else a placeholder so numbering stays uniform
          val hasText = pops.exists(_.isInstanceOf[ShowText])
          val resources =
            if (hasText) s"<< /Font << /F0 $iObj 0 R >> >>" else "<< >>"
          beginObj()
          emit(s"$pObj 0 obj\n<< /Type /Page /Parent 2 0 R " +
            s"/MediaBox [0 0 $w $h] /Resources $resources " +
            s"/Contents $cObj 0 R >>\nendobj\n")
          beginObj()
          emit(if (hasText)
            s"$iObj 0 obj\n<< /Type /Font /Subtype /Type1 " +
              "/BaseFont /Helvetica >>\nendobj\n"
          else s"$iObj 0 obj\n<< >>\nendobj\n")
          val body = pathOpsToStream(pops)
          beginObj()
          emit(s"$cObj 0 obj\n<< /Length ${body.length} >>\nstream\n" +
            s"$body\nendstream\nendobj\n")

        case img0 =>
          // colorSpace is the complete PDF value: a name for the device
          // spaces, the 4-element array form for /Indexed (lookup emitted
          // as a hex string — self-contained, no extra stream object)
          val (filter, colorSpace, data) = img0 match {
            case DctPage(jpeg, _, _) => ("DCTDecode", "/DeviceRGB", jpeg)
            case FlateRgbPage(raw, _, _) =>
              ("FlateDecode", "/DeviceRGB", deflate(raw))
            case FlateGrayPage(raw, _, _) =>
              ("FlateDecode", "/DeviceGray", deflate(raw))
            case FlateIndexedPage(idx, palette, _, _) =>
              val hex = palette.map(b => f"${b & 0xff}%02X").mkString
              ("FlateDecode",
                s"[/Indexed /DeviceRGB ${palette.length / 3 - 1} <$hex>]",
                deflate(idx))
            case _: TextPage | _: PathPage => sys.error("unreachable")
          }
          beginObj()
          emit(s"$pObj 0 obj\n<< /Type /Page /Parent 2 0 R " +
            s"/MediaBox [0 0 $w $h] " +
            s"/Resources << /XObject << /Im0 $iObj 0 R >> >> " +
            s"/Contents $cObj 0 R >>\nendobj\n")
          beginObj()
          emit(s"$iObj 0 obj\n<< /Type /XObject /Subtype /Image /Width $w " +
            s"/Height $h /ColorSpace $colorSpace /BitsPerComponent 8 " +
            s"/Filter /$filter /Length ${data.length} >>\nstream\n")
          out.write(data)
          emit("\nendstream\nendobj\n")
          val draw = s"q $w 0 0 $h 0 0 cm /Im0 Do Q"
          beginObj()
          emit(s"$cObj 0 obj\n<< /Length ${draw.length} >>\nstream\n" +
            s"$draw\nendstream\nendobj\n")
      }
    }
    val xrefAt = out.size()
    // explicit \n, never %n: the PDF spec fixes xref entries at exactly
    // 20 bytes ("nnnnnnnnnn ggggg n \n"); %n emits the platform separator,
    // and a CRLF platform's 21-byte entries overrun the size-derived parse
    // window in xrefOffsets
    emit(s"xref\n0 ${offsets.size + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => emit(f"$o%010d 00000 n \n"))
    emit(s"trailer\n<< /Size ${offsets.size + 1} /Root 1 0 R >>\n" +
      s"startxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private[graft] def inflate(data: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val out = new Array[Byte](expected)
    var at = 0
    while (at < expected && !inf.finished()) {
      val got = inf.inflate(out, at, expected - at)
      // Inflater returns 0 with needsInput() set (and not finished) when a
      // truncated stream runs dry — without this check a corrupt PDF spins
      // an executor task forever instead of failing the record loudly
      if (got == 0) {
        inf.end()
        sys.error(s"truncated FlateDecode stream: got $at of $expected " +
          "bytes before the inflater ran out of input")
      }
      at += got
    }
    inf.end()
    require(at == expected, s"inflated $at of expected $expected bytes")
    out
  }

  // -- parsing ------------------------------------------------------------

  private def ascii(b: Array[Byte], from: Int, until: Int): String =
    new String(b, from, (until min b.length) - from, US_ASCII)

  /** Object offsets from the xref table the trailer points at. The table
    * window is SIZED FROM THE XREF HEADER's entry count (each entry is a
    * fixed 20 bytes) rather than a hard cap, so a large but valid PDF that
    * [[write]] itself produced parses at any page count.
    */
  private def xrefOffsets(pdf: Array[Byte]): Map[Int, Int] = {
    val tail = ascii(pdf, math.max(0, pdf.length - 200), pdf.length)
    val sx = """startxref\s+(\d+)""".r.findAllMatchIn(tail).toSeq.lastOption
      .getOrElse(sys.error("no startxref")).group(1).toInt
    val headWin = ascii(pdf, sx, math.min(pdf.length, sx + 128))
    val head = """xref\s+(\d+)\s+(\d+)""".r.findFirstMatchIn(headWin)
      .getOrElse(sys.error("no xref header"))
    val (first, count) = (head.group(1).toInt, head.group(2).toInt)
    val table = ascii(pdf, sx,
      math.min(pdf.length, sx + head.end + count * 20 + 64))
    val entries = """(\d{10}) (\d{5}) ([nf])""".r.findAllMatchIn(table)
      .toSeq.take(count)
    entries.zipWithIndex.collect {
      case (m, i) if m.group(3) == "n" => (first + i) -> m.group(1).toInt
    }.toMap
  }

  /** The dictionary text of object `num` (up to its stream/endobj). The
    * window GROWS until a terminator is found (a /Kids array alone
    * outgrows any fixed cap past a few hundred pages).
    */
  private def objDict(pdf: Array[Byte], offsets: Map[Int, Int],
                      num: Int): String = {
    val at = offsets.getOrElse(num, sys.error(s"object $num not in xref"))
    var win = 2000
    while (true) {
      val window = ascii(pdf, at, at + win)
      val ends = Seq(window.indexOf("stream"), window.indexOf("endobj"))
        .filter(_ >= 0)
      if (ends.nonEmpty) return window.substring(0, ends.min)
      if (at + win >= pdf.length)
        sys.error(s"object $num has no stream/endobj terminator")
      win *= 4
    }
    sys.error("unreachable")
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

  /** The 1-based `page`'s image XObject: its dictionary text and raw
    * stream bytes (still filter-encoded).
    */
  /** xref offsets + the 1-based page's object dictionary (trailer →
    * /Root → /Pages → /Kids[page−1]) — the shared walk under the image
    * and text page paths.
    */
  private def pageDictOf(pdf: Array[Byte],
                         page: Int): (Map[Int, Int], String) = {
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
    (offs, objDict(pdf, offs, kidNums(page - 1)))
  }

  /** An object's dict plus its stream bytes (/Length-delimited). */
  private def objStream(pdf: Array[Byte], offs: Map[Int, Int],
                        objNum: Int): (String, Array[Byte]) = {
    val at = offs(objNum)
    val dict = objDict(pdf, offs, objNum)
    val len = """/Length\s+(\d+)""".r.findFirstMatchIn(dict)
      .getOrElse(sys.error("no /Length")).group(1).toInt
    val header = ascii(pdf, at, at + dict.length + 32)
    val streamKw = header.indexOf("stream")
    require(streamKw >= 0, "no stream keyword")
    // stream data begins after "stream" + EOL
    var s = at + streamKw + "stream".length
    if (pdf(s) == '\r') s += 1
    if (pdf(s) == '\n') s += 1
    (dict, java.util.Arrays.copyOfRange(pdf, s, s + len))
  }

  private def pageXObject(pdf: Array[Byte],
                          page: Int): (String, Array[Byte]) = {
    val (offs, pageDict) = pageDictOf(pdf, page)
    val xobj = """/XObject\s*<<[^>]*?(\d+)\s+0\s+R""".r
      .findFirstMatchIn(pageDict).getOrElse(sys.error("no /XObject"))
      .group(1).toInt
    objStream(pdf, offs, xobj)
  }

  /** The `(…) Tj` show-text strings of 1-based `page`, in stream order
    * with PDF string escapes undone — the text-extraction half of the
    * text-page round-trip (a [[TextPage]] written by [[writePages]] reads
    * back as exactly its lines).
    */
  def extractPageText(pdf: Array[Byte], page: Int): Seq[String] = {
    val (offs, pageDict) = pageDictOf(pdf, page)
    val (_, data) = objStream(pdf, offs, ref(pageDict, "/Contents"))
    val body = new String(data, US_ASCII)
    """\(((?:\\.|[^\\()])*)\)\s*Tj""".r.findAllMatchIn(body)
      .map(m => """\\(.)""".r.replaceAllIn(m.group(1),
        mm => scala.util.matching.Regex.quoteReplacement(mm.group(1))))
      .toSeq
  }

  /** The embedded image bytes (JPEG for DCTDecode) of 1-based `page`. */
  def extractPageImage(pdf: Array[Byte], page: Int): Array[Byte] =
    pageXObject(pdf, page)._2

  private def dictInt(dict: String, key: String): Int =
    (key + """\s+(\d+)""").r.findFirstMatchIn(dict)
      .getOrElse(sys.error(s"no $key in $dict")).group(1).toInt

  /** A real [[PdfPages.Renderer]]: page XObject → pixel decode (ImageIO
    * for DCTDecode JPEGs, java.util.zip inflate for FlateDecode raw RGB)
    * → PNG re-encode. Rendering an image-backed page is exactly this.
    */
  def pdfImageRenderer: PdfPages.Renderer = (_, page, pdfBytes) => {
    val (_, pageDict) = pageDictOf(pdfBytes, page)
    def mediaBox: (Int, Int) = {
      val mb = """/MediaBox\s*\[\s*0\s+0\s+(\d+)\s+(\d+)\s*\]""".r
        .findFirstMatchIn(pageDict).getOrElse(sys.error("no /MediaBox"))
      (mb.group(1).toInt, mb.group(2).toInt)
    }
    if (!pageDict.contains("/XObject")) {
      // text / vector / MIXED page — one rasterizer (round 19):
      // parsePathOps lifts BT…ET blocks into ShowText ops, so a pure
      // text page takes the same scanline path (byte-identical to
      // [[renderTextPage]] — PdfPagesSpec pins it) and text painted
      // under an active `W n` path clip stamps through the mask, the
      // cropped-table shape that used to be the last loud envelope notch
      val (w, h) = mediaBox
      renderPathPage(extractPagePathOps(pdfBytes, page), w, h)
    } else renderImagePage(page, pageXObject(pdfBytes, page))
  }

  private def renderImagePage(page: Int,
                              dictData: (String, Array[Byte])): Array[Byte] = {
    val (dict, data) = dictData
    val img =
      if (dict.contains("/DCTDecode")) {
        val i = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(data))
        require(i != null, s"page $page JPEG did not decode")
        i
      } else if (dict.contains("/FlateDecode")) {
        val (w, h) = (dictInt(dict, "/Width"), dictInt(dict, "/Height"))
        // [/Indexed /DeviceRGB hival <hex-lookup>] → RGB triples; parsed
        // BEFORE the device-space dispatch because the array also contains
        // the literal /DeviceRGB
        val indexed =
          """\[\s*/Indexed\s+/DeviceRGB\s+(\d+)\s*<([0-9A-Fa-f\s]*)>\s*\]""".r
            .findFirstMatchIn(dict)
        if (indexed.isDefined) {
          val m = indexed.get
          val hival = m.group(1).toInt
          val hex = m.group(2).filterNot(_.isWhitespace)
          require(hival >= 0 && hival <= 255 &&
            hex.length == 6 * (hival + 1),
            s"palette lookup is ${hex.length} hex chars for hival $hival")
          val palette = Array.tabulate(hival + 1) { i =>
            Integer.parseInt(hex.substring(6 * i, 6 * i + 6), 16)
          }
          require(dictInt(dict, "/BitsPerComponent") == 8,
            s"unsupported indexed depth in $dict")
          val pixBytes = w.toLong * h
          require(w > 0 && h > 0 && pixBytes <= Int.MaxValue,
            s"unreasonable indexed image dims ${w}x$h")
          val idx = inflate(data, pixBytes.toInt)
          val i = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val s = idx(y * w + x) & 0xff
              require(s <= hival,
                s"palette index $s > hival $hival at ($x,$y) — corrupt " +
                  "index plane")
              i.setRGB(x, y, palette(s))
              x += 1
            }
            y += 1
          }
          i
        } else {
          val gray = dict.contains("/DeviceGray")
          require((gray || dict.contains("/DeviceRGB")) &&
            dictInt(dict, "/BitsPerComponent") == 8,
            s"unsupported Flate image format: $dict")
          val bytesPerPx = if (gray) 1 else 3
          // untrusted dims from the parsed dict: validate the pixel-buffer
          // size in LONG arithmetic before allocating — an Int-wrapped
          // product would accept a tiny buffer for absurd claimed dims and
          // fail later as an out-of-bounds read instead of loudly here
          val pixBytes = w.toLong * h * bytesPerPx
          require(w > 0 && h > 0 && pixBytes <= Int.MaxValue,
            s"unreasonable Flate image dims ${w}x$h")
          val raw = inflate(data, pixBytes.toInt)
          val i = new java.awt.image.BufferedImage(w, h,
            if (gray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
            else java.awt.image.BufferedImage.TYPE_INT_RGB)
          if (gray)
            // one bulk raster copy, via the raster and NOT setRGB:
            // TYPE_BYTE_GRAY's color model is linear gray, so setRGB would
            // gamma-convert the scanner's sample values instead of
            // preserving them — and raw IS the top-down 1-byte/pixel plane
            // the raster stores
            i.getRaster.setDataElements(0, 0, w, h, raw)
          else {
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val o = (y * w + x) * bytesPerPx
                i.setRGB(x, y, ((raw(o) & 0xff) << 16) |
                  ((raw(o + 1) & 0xff) << 8) | (raw(o + 2) & 0xff))
                x += 1
              }
              y += 1
            }
          }
          i
        }
      } else sys.error(s"page $page: unsupported /Filter in $dict")
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Metrics-free deterministic raster of a text page (PNG bytes): white
    * page at MediaBox dims, each character drawn as a 5×7 ink stipple in a
    * 7pt-advance / 14pt-leading cell grid from the writer's Tm origin
    * (72, h−72). Glyph INK is a fixed per-codepoint bit pattern (a pure
    * integer mix — identical chars raster identically, different chars
    * differ), not a typographic outline: cell positions, extents and ink
    * coverage — the layout-analysis signal — are exact and reproducible
    * across JVMs, which no font-rendering path guarantees (freetype/java2d
    * hinting varies). A pdfbox-class engine swaps in behind the same
    * [[PdfPages.Renderer]] seam for faithful glyphs.
    */
  private[graft] def renderTextPage(lines: Seq[String], w: Int,
                                    h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(java.awt.Color.WHITE); g.fillRect(0, 0, w, h); g.dispose()
    lines.zipWithIndex.foreach { case (line, j) =>
      // writer geometry: baseline j sits at PDF y = (h-72) − j·14 →
      // image row h − baseline; the 7-row glyph box ends at the baseline
      val baseTop = 72 + j * 14 - 7
      line.zipWithIndex.foreach { case (c, k) =>
        if (c != ' ') {
          val x0 = 72 + k * 7
          var r = 0
          while (r < 7) {
            var col = 0
            while (col < 5) {
              val bit = ((c.toInt * 2654435761L + r * 40503L +
                col * 9973L) >>> 13) & 1L
              val (px, py) = (x0 + col, baseTop + r)
              if (bit == 1L && px >= 0 && px < w && py >= 0 && py < h)
                img.setRGB(px, py, 0x000000)
              col += 1
            }
            r += 1
          }
        }
      }
    }
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** The path operators of a 1-based [[PathPage]]'s content stream, parsed
    * back into the [[PathOp]] ADT — the vector-content analog of
    * [[extractPageText]]. Fails loudly on any operator outside the
    * `m l h re c v y f f* S n rg RG cm q Q W W* w d J j M` +
    * `BT…ET` text-block envelope: a
    * page drawn with other operators has no defined raster here, and
    * silently skipping an operator would paint a WRONG page, which is
    * worse than no page.
    */
  def extractPagePathOps(pdf: Array[Byte], page: Int): Seq[PathOp] = {
    val (offs, pageDict) = pageDictOf(pdf, page)
    val (_, data) = objStream(pdf, offs, ref(pageDict, "/Contents"))
    parsePathOps(new String(data, US_ASCII))
  }

  private[graft] def parsePathOps(body: String): Seq[PathOp] = {
    val out = scala.collection.mutable.ArrayBuffer[PathOp]()
    val stack = scala.collection.mutable.ArrayBuffer[Double]()
    def popN(n: Int, op: String): Seq[Double] = {
      require(stack.size >= n, s"path op '$op' needs $n operands, " +
        s"stack has ${stack.size}")
      val args = stack.takeRight(n).toSeq
      stack.remove(stack.size - n, n)
      args
    }
    def popColor(op: String): Int = {
      val Seq(r, g, b) = popN(3, op)
      require(Seq(r, g, b).forall(v => v >= 0 && v <= 1),
        s"$op components must be in [0,1]")
      (math.round(r * 255).toInt << 16) | (math.round(g * 255).toInt << 8) |
        math.round(b * 255).toInt
    }
    // PDF string literals may contain whitespace, operators, and
    // brackets — lift them out BEFORE whitespace tokenization, storing
    // the unescaped values (\X → X, extractPageText's rule; balanced
    // unescaped parens nest per §7.3.4.2). NUL (escaped in the literal
    // below) cannot appear in an
    // ASCII content stream, so the placeholder token never collides.
    val strings = scala.collection.mutable.ArrayBuffer[String]()
    val lifted = new StringBuilder
    var ci = 0
    while (ci < body.length) {
      if (body.charAt(ci) == '(') {
        val v = new StringBuilder
        ci += 1
        var depth = 1
        while (ci < body.length && depth > 0) {
          val c = body.charAt(ci)
          if (c == '\\' && ci + 1 < body.length) {
            v.append(body.charAt(ci + 1)); ci += 2
          } else {
            if (c == '(') depth += 1
            else if (c == ')') depth -= 1
            if (depth > 0) v.append(c)
            ci += 1
          }
        }
        require(depth == 0, "unterminated '(' string literal")
        lifted.append(" \u0000" + strings.size + " ")
        strings += v.toString
      } else { lifted.append(body.charAt(ci)); ci += 1 }
    }
    // text-block state (round 19): BT…ET parses into ONE ShowText op so
    // the rasterizer paints it in stream order (under the clip/color
    // state at paint time). The envelope models no glyph metrics, so a
    // run's origin must be explicit — Tm (translation), Td, T*/TL — and
    // consecutive Tj without repositioning fails loudly.
    var inText = false
    var positioned = true // Tm identity default: origin (0,0) is defined
    var leading = 0.0
    var lineX = 0.0
    var lineY = 0.0
    var pendingName: Option[String] = None
    var pendingString: Option[String] = None
    var runs: scala.collection.mutable.ArrayBuffer[(Double, Double, String)] =
      null
    // dash-array operand state: `[` … `]` collects numbers into lastArray
    // for the next `d`. `[`/`]` are PDF delimiters that may abut numbers
    // ("[3 2]0 d" is legal) — pad them into their own tokens first.
    var arrayStart = -1
    var lastArray: Option[Seq[Double]] = None
    lifted.toString.replace("[", " [ ").replace("]", " ] ")
      .split("\\s+").filter(_.nonEmpty).foreach {
      case t if t.matches("[-+]?[0-9]*\\.?[0-9]+") => stack += t.toDouble
      case "[" =>
        require(arrayStart < 0, "nested '[' in dash array operand")
        arrayStart = stack.size
      case "]" =>
        require(arrayStart >= 0, "']' with no matching '['")
        lastArray = Some(stack.slice(arrayStart, stack.size).toSeq)
        stack.remove(arrayStart, stack.size - arrayStart)
        arrayStart = -1
      case op if arrayStart >= 0 =>
        // only numbers may appear inside an array operand — executing an
        // operator mid-array would consume the array's numbers as its own
        sys.error(s"operator '$op' inside a '[' … ']' array operand")
      // ---- text block grammar (round 19) ----
      case "BT" =>
        require(!inText, "nested 'BT'")
        inText = true
        runs = scala.collection.mutable.ArrayBuffer()
        leading = 0.0; lineX = 0.0; lineY = 0.0; positioned = true
        pendingName = None; pendingString = None
      case "ET" =>
        require(inText, "'ET' with no matching 'BT'")
        require(pendingString.isEmpty, "dangling string operand at 'ET'")
        out += ShowText(runs.toSeq)
        inText = false
      case t if t.startsWith("\u0000") =>
        require(inText, "string literal outside BT…ET")
        require(pendingString.isEmpty, "two string operands before 'Tj'")
        pendingString = Some(strings(t.drop(1).toInt))
      case t if inText && t.startsWith("/") => pendingName = Some(t)
      case "Tf" if inText =>
        val Seq(size) = popN(1, "Tf")
        require(pendingName.isDefined, "'Tf' needs a font name operand")
        require(size > 0, s"non-positive font size $size")
        pendingName = None
      case "TL" if inText => val Seq(l) = popN(1, "TL"); leading = l
      case "Tm" if inText =>
        val Seq(a, b, c, d, e, f) = popN(6, "Tm")
        require(a == 1 && b == 0 && c == 0 && d == 1,
          s"text matrix [$a $b $c $d] is not a pure translation — a " +
            "scaled/rotated glyph grid has no defined stipple raster")
        lineX = e; lineY = f; positioned = true
      case "Td" if inText =>
        val Seq(dx, dy) = popN(2, "Td")
        lineX += dx; lineY += dy; positioned = true
      case "T*" if inText => lineY -= leading; positioned = true
      case "Tj" if inText =>
        require(pendingString.isDefined, "'Tj' needs a string operand")
        require(positioned,
          "consecutive 'Tj' without repositioning — the glyph advance " +
            "is font-metric state this renderer does not model; " +
            "reposition with Tm/Td/T*")
        runs += ((lineX, lineY, pendingString.get))
        pendingString = None; positioned = false
      case op if inText =>
        sys.error(s"operator '$op' inside BT…ET — only Tf/TL/Tm/Td/T*/Tj " +
          "have a defined raster in the text envelope")
      case "m" => val Seq(x, y) = popN(2, "m")
        out += MoveTo(x.toInt, y.toInt)
      case "l" => val Seq(x, y) = popN(2, "l")
        out += LineTo(x.toInt, y.toInt)
      case "h" => out += ClosePath
      case "re" => val Seq(x, y, rw, rh) = popN(4, "re")
        out += Rect(x.toInt, y.toInt, rw.toInt, rh.toInt)
      case "c" => val Seq(x1, y1, x2, y2, x3, y3) = popN(6, "c")
        out += CurveTo(x1.toInt, y1.toInt, x2.toInt, y2.toInt,
          x3.toInt, y3.toInt)
      case "v" => val Seq(x2, y2, x3, y3) = popN(4, "v")
        out += CurveToV(x2.toInt, y2.toInt, x3.toInt, y3.toInt)
      case "y" => val Seq(x1, y1, x3, y3) = popN(4, "y")
        out += CurveToY(x1.toInt, y1.toInt, x3.toInt, y3.toInt)
      case "rg" => out += FillColor(popColor("rg"))
      case "RG" => out += StrokeColor(popColor("RG"))
      case "f" => out += Fill
      case "f*" => out += FillEvenOdd
      case "S" => out += Stroke
      case "w" => val Seq(wd) = popN(1, "w")
        require(wd >= 0, s"negative line width $wd")
        out += SetLineWidth(wd)
      case "d" =>
        val Seq(phase) = popN(1, "d")
        require(lastArray.isDefined,
          "'d' with no preceding '[' … ']' dash array operand")
        out += SetDash(lastArray.get, phase) // SetDash validates entries
        lastArray = None
      case "J" => val Seq(s) = popN(1, "J")
        require(s == math.rint(s), s"non-integer line cap style $s")
        out += SetLineCap(s.toInt) // SetLineCap validates the range
      case "j" => val Seq(s) = popN(1, "j")
        require(s == math.rint(s), s"non-integer line join style $s")
        out += SetLineJoin(s.toInt) // SetLineJoin validates the range
      case "M" => val Seq(m) = popN(1, "M")
        out += SetMiterLimit(m) // SetMiterLimit validates >= 1
      case "cm" => val Seq(a, b, c, d, e, f) = popN(6, "cm")
        out += Concat(a, b, c, d, e, f)
      case "q" => out += SaveState
      case "Q" => out += RestoreState
      case "W" => out += Clip
      case "W*" => out += ClipEvenOdd
      case "n" => out += EndPath
      case other => sys.error(s"path-page operator '$other' outside the " +
        "m/l/h/re/c/v/y/f/f*/S/n/rg/RG/cm/q/Q/W/W*/w/d/J/j/M/BT…ET " +
        "envelope — " +
        "no defined raster")
    }
    require(!inText, "unterminated 'BT' — no closing 'ET'")
    require(stack.isEmpty, s"dangling operands ${stack.mkString(",")}")
    require(arrayStart < 0, "unterminated '[' array operand")
    require(lastArray.isEmpty,
      "dangling '[' … ']' array operand with no consuming 'd'")
    out.toSeq
  }

  /** Deterministic raster of a vector-path page (PNG bytes): an OWN
    * scanline polygon fill — both PDF winding rules, sampled at pixel
    * centers (user y = h − py − 0.5), subpaths implicitly closed on fill
    * per spec — plus 1-px Bresenham strokes, on a white page. No Java2D
    * rasterizer is involved, so output is bit-identical across JVMs
    * (the same determinism contract as [[renderTextPage]]; Marlin's
    * coverage rounding is JVM-version-dependent, this isn't).
    */
  private[graft] def renderPathPage(ops: Seq[PathOp], w: Int,
                                    h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g2 = img.createGraphics()
    g2.setColor(java.awt.Color.WHITE); g2.fillRect(0, 0, w, h); g2.dispose()

    // CTM (round 16): points enter the path in DEVICE space — every
    // construction coordinate maps through the current matrix, exactly
    // the PDF model (§8.3.4: the CTM applies at construction time, so a
    // later cm never moves an already-built path). Identity by default;
    // a fixed a·x + c·y + e / b·x + d·y + f IEEE chain keeps rasters
    // bit-identical across JVMs (the flatten() determinism argument).
    var ctm = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)
    // clip region (round 16): a device-pixel boolean mask, null = whole
    // page (the common case pays nothing). COPY-ON-WRITE: intersection
    // allocates a new array, so the references q pushed stay valid — Q
    // restores by reference, no defensive copies.
    var clipMask: Array[Boolean] = null
    // W/W* set this; the clip intersects AFTER the next painting op
    // (§8.5.4 — the paint itself still sees the old clip)
    var pendingClip: Option[Boolean] = None
    // stroke state (round 17): line width + dash pattern/phase, both in
    // user-space units (§8.4.3), scaled to device by √|det CTM| at stroke
    // time. Defaults (1.0, solid) keep every pre-`w`/`d` page bit-equal.
    var lineWidth = 1.0
    var dash: (Seq[Double], Double) = (Nil, 0.0)
    // cap/join/miter state (round 18), spec defaults (§8.4.1): butt caps,
    // miter joins, miter limit 10. NOTE the pre-round-18 renderer painted
    // the full square stamp at endpoints — i.e. projecting-square caps —
    // which was a deviation from the spec default; wide open strokes now
    // end flat AT the endpoint unless `2 J` asks for the projection.
    var lineCap = 0
    var lineJoin = 0
    var miterLimit = 10.0
    val gsStack = scala.collection.mutable.ArrayBuffer[
      ((Double, Double, Double, Double, Double, Double), Int, Int,
        Array[Boolean], Double, (Seq[Double], Double), Int, Int, Double)]()
    def tx(x: Double, y: Double): (Double, Double) =
      (ctm._1 * x + ctm._3 * y + ctm._5, ctm._2 * x + ctm._4 * y + ctm._6)

    // current path: subpaths as point lists (device space), explicit-closed flag
    val subpaths = scala.collection.mutable.ArrayBuffer[
      (scala.collection.mutable.ArrayBuffer[(Double, Double)], Boolean)]()
    var open: scala.collection.mutable.ArrayBuffer[(Double, Double)] = null
    // after `h` the current point is the closed subpath's START (PDF
    // 32000 §8.5.2.1): a following `l` begins a NEW subpath from there —
    // a legal stream this writer can emit, so the renderer must accept it
    var closedStart: (Double, Double) = null
    var fillRgb = 0x000000
    var strokeRgb = 0x000000
    def flushOpen(closed: Boolean): Unit = {
      if (open != null && open.nonEmpty) {
        subpaths += ((open, closed))
        closedStart = if (closed) open.head else null
      }
      open = null
    }
    def clearPath(): Unit = {
      flushOpen(false); subpaths.clear(); closedStart = null
    }

    // The scanline span walk (pixel-center sampling, both winding rules),
    // shared by fill painting and clip-mask construction — the two MUST
    // agree pixel-for-pixel or a path used as its own clip would erode
    // itself (PDF: clip region = the region the path would fill).
    def forEachSpan(evenOdd: Boolean)(emit: (Int, Int, Int) => Unit): Unit = {
      val polys = subpaths.map(_._1).filter(_.size >= 3)
      var py = 0
      while (py < h) {
        val sy = h - py - 0.5 // scanline in user space, pixel-center sample
        val xs = scala.collection.mutable.ArrayBuffer[(Double, Int)]()
        polys.foreach { pts =>
          var i = 0
          val n = pts.size
          while (i < n) {
            val (x1, y1) = pts(i); val (x2, y2) = pts((i + 1) % n)
            // half-open [min, max) span: a vertex shared by two edges
            // crosses exactly once, the standard crossing discipline
            if (y1 < y2 && sy >= y1 && sy < y2)
              xs += ((x1 + (sy - y1) * (x2 - x1) / (y2 - y1), 1))
            else if (y2 < y1 && sy >= y2 && sy < y1)
              xs += ((x1 + (sy - y1) * (x2 - x1) / (y2 - y1), -1))
            i += 1
          }
        }
        if (xs.nonEmpty) {
          val sorted = xs.sortBy(_._1)
          var acc = 0
          var i = 0
          while (i < sorted.size - 1) {
            acc += sorted(i)._2
            val inside = if (evenOdd) ((i + 1) % 2) == 1 else acc != 0
            if (inside) {
              val xa = sorted(i)._1; val xb = sorted(i + 1)._1
              // pixels whose center x = px+0.5 lies in [xa, xb)
              val px = math.max(0, math.ceil(xa - 0.5).toInt)
              val pxEnd = math.min(w - 1, math.ceil(xb - 0.5).toInt - 1)
              if (px <= pxEnd) emit(py, px, pxEnd)
            }
            i += 1
          }
        }
        py += 1
      }
    }

    // Painting epilogue (§8.5.4 order): the paint above ran under the OLD
    // clip; only now does a pending W/W* intersect the region, then the
    // path clears. Copy-on-write keeps q-saved masks intact.
    def finishPaint(): Unit = {
      pendingClip.foreach { eo =>
        val inside = new Array[Boolean](w * h)
        forEachSpan(eo) { (py, px0, px1) =>
          var px = px0
          while (px <= px1) { inside(py * w + px) = true; px += 1 }
        }
        clipMask =
          if (clipMask == null) inside
          else {
            val m = new Array[Boolean](w * h)
            var i = 0
            while (i < m.length) { m(i) = inside(i) && clipMask(i); i += 1 }
            m
          }
        pendingClip = None
      }
      clearPath()
    }

    def fill(evenOdd: Boolean): Unit = {
      flushOpen(false)
      forEachSpan(evenOdd) { (py, px0, px1) =>
        var px = px0
        while (px <= px1) {
          if (clipMask == null || clipMask(py * w + px))
            img.setRGB(px, py, fillRgb)
          px += 1
        }
      }
      finishPaint()
    }

    def stroke(): Unit = {
      flushOpen(false)
      // device pen geometry at STROKE time (§8.4.3: width/dash are user-
      // space, transformed by the CTM): the uniform-scale approximation
      // √|det M| — exact under translate/scale/rotate, the defined
      // semantics under skew. Width paints an odd square brush (2r+1 px)
      // so width ≤ 1 stays the 1-px hairline bit-equal to the pre-`w`
      // renderer; even widths round down to the next odd square.
      val penScale = math.sqrt(math.abs(
        ctm._1 * ctm._4 - ctm._2 * ctm._3))
      val r = (math.max(1L, math.round(lineWidth * penScale)).toInt - 1) / 2
      // §8.4.3.6: an ODD-length dash array alternates through a double
      // pass — `[3] 0 d` means 3 on / 3 off (period 6), because the
      // on/off parity flips when the array is re-entered. Doubling the
      // array makes the even-index-is-on walk below implement exactly
      // that; an even-length array is its own period.
      val basePat = dash._1.map(_ * penScale)
      val pat = if (basePat.size % 2 == 1) basePat ++ basePat else basePat
      val cycle = pat.sum
      val solid = pat.isEmpty || cycle == 0.0
      def dashOn(dist: Double): Boolean = {
        var pos = dist % cycle
        if (pos >= cycle) pos = 0.0 // fp guard: x % c can round to c
        var acc = 0.0
        var i = 0
        var on = true // even-index entries are "on" (§8.4.3.6)
        var decided = false
        while (i < pat.size && !decided) {
          acc += pat(i)
          if (pos < acc) { on = i % 2 == 0; decided = true }
          i += 1
        }
        on
      }
      // cap half-plane clips for the CURRENT subpath (§8.4.3.3: butt and
      // round caps must not let the TERMINAL stamps extend past the
      // endpoint's perpendicular; projecting-square keeps the full
      // stamp). A plane applies only to stamps emitted within 2r+1 PATH
      // units of its own end of the subpath — by EMISSION index, not
      // spatial proximity (round 19): a subpath looping back past an
      // endpoint's perpendicular keeps its legitimate stroke-body pixels,
      // which the round-18 spatial-window form erased. Within the
      // terminal window the Chebyshev guard and the half-plane test are
      // unchanged, so non-reentrant paths raster pixel-identically.
      var capStartP: (Int, Int, Double, Double) = null
      var capEndP: (Int, Int, Double, Double) = null
      var emitIdx = 0
      var totalPix = 0
      def capOk(x: Int, y: Int): Boolean = {
        def ok(p: (Int, Int, Double, Double)): Boolean = {
          val dx = x - p._1; val dy = y - p._2
          math.max(math.abs(dx), math.abs(dy)) > 2 * r + 1 ||
            dx * p._3 + dy * p._4 <= 0.25
        }
        (capStartP == null || emitIdx > 2 * r + 1 || ok(capStartP)) &&
        (capEndP == null || emitIdx < totalPix - 1 - (2 * r + 1) ||
          ok(capEndP))
      }
      // disc = round stamp (round caps / round+bevel joins): the integer
      // disc dx²+dy² ≤ r², same diameter as the square brush
      def stamp(cx: Int, cy: Int, disc: Boolean, isCapDisc: Boolean): Unit = {
        var dy = -r
        while (dy <= r) {
          val py = h - 1 - (cy + dy)
          var dx = -r
          while (dx <= r) {
            val x = cx + dx
            if ((!disc || dx * dx + dy * dy <= r * r) &&
                x >= 0 && x < w && py >= 0 && py < h &&
                (clipMask == null || clipMask(py * w + x)) &&
                (isCapDisc || capOk(x, cy + dy)))
              img.setRGB(x, py, strokeRgb)
            dx += 1
          }
          dy += 1
        }
      }
      // round/bevel join vertices stamp a disc instead of the square (the
      // two styles coincide at this granularity — chord-vs-arc is sub-px)
      val joinDisc = lineJoin != 0 && r > 0
      val vertexPx = new java.util.HashSet[Long]()
      def pxKey(x: Int, y: Int): Long = (x.toLong << 32) | (y & 0xffffffffL)
      // dash walk state: distance advances 1.0 per NEW Bresenham pixel
      // (the Chebyshev arc length — see SetDash); a segment join re-emits
      // its shared vertex, which must neither re-advance nor re-decide
      var dist = 0.0
      var havePrev = false
      var prevX = 0; var prevY = 0
      var lastOn = false // dash decision of the most recently emitted pixel
      def step(x: Int, y: Int): Unit = {
        if (!(havePrev && x == prevX && y == prevY)) {
          // the decision is by PATH distance, so clipped/off-page pixels
          // still advance the pattern (dash is path state, not raster)
          lastOn = solid || dashOn(dist)
          if (lastOn)
            stamp(x, y, disc = joinDisc && vertexPx.contains(pxKey(x, y)),
              isCapDisc = false)
          dist += 1.0
          emitIdx += 1
          havePrev = true; prevX = x; prevY = y
        }
      }
      // miter join (§8.4.3.4 style 0 + §8.4.3.5 limit): the square vertex
      // stamp already IS the exact miter for right/obtuse angles (tip
      // distance r/sin(θ/2) ≤ r√2 = the stamp corner); only acute angles
      // need the explicit tip quad (v, A, tip, B) painted, and a ratio
      // past the miter limit falls back to bevel (= no quad) per spec.
      def miterSpike(pv: (Int, Int), v: (Int, Int), nx: (Int, Int),
                     on: Boolean): Unit = {
        if (r == 0 || !on) return
        def unitTo(to: (Int, Int)): Option[(Double, Double)] = {
          val dx = (to._1 - v._1).toDouble; val dy = (to._2 - v._2).toDouble
          val l = math.sqrt(dx * dx + dy * dy)
          if (l < 1e-9) None else Some((dx / l, dy / l))
        }
        (unitTo(pv), unitTo(nx)) match {
          case (Some((ux, uy)), Some((wx, wy))) =>
            val cosT = math.max(-1.0, math.min(1.0, ux * wx + uy * wy))
            val sinHalf = math.sqrt((1.0 - cosT) / 2.0)
            if (sinHalf < 1e-9) return // path doubles back: ∞ miter → bevel
            val ratio = 1.0 / sinHalf
            if (ratio > miterLimit) return // §8.4.3.5 bevel fallback
            val bx = ux + wx; val by = uy + wy
            val bl = math.sqrt(bx * bx + by * by)
            if (bl < 1e-9) return // straight through — no corner to fill
            val tdx = -bx / bl; val tdy = -by / bl // outward bisector
            val rd = r.toDouble
            def perpToward(dx0: Double, dy0: Double): (Double, Double) = {
              val (px0, py0) = (-dy0, dx0)
              if (px0 * tdx + py0 * tdy >= 0) (px0, py0) else (dy0, -dx0)
            }
            val (n1x, n1y) = perpToward(-ux, -uy) // incoming travel = -u
            val (n2x, n2y) = perpToward(wx, wy)   // outgoing travel = w
            val quad = Array[(Double, Double)](
              (v._1.toDouble, v._2.toDouble),
              (v._1 + rd * n1x, v._2 + rd * n1y),
              (v._1 + rd * ratio * tdx, v._2 + rd * ratio * tdy),
              (v._1 + rd * n2x, v._2 + rd * n2y))
            var area = 0.0
            var k = 0
            while (k < 4) {
              val (x1, y1) = quad(k); val (x2, y2) = quad((k + 1) % 4)
              area += x1 * y2 - x2 * y1; k += 1
            }
            val sgn = if (area >= 0) 1.0 else -1.0
            val minX = math.max(0, math.floor(quad.map(_._1).min).toInt)
            val maxX = math.min(w - 1, math.ceil(quad.map(_._1).max).toInt)
            val minY = math.max(0, math.floor(quad.map(_._2).min).toInt)
            val maxY = math.min(h - 1, math.ceil(quad.map(_._2).max).toInt)
            var y = minY
            while (y <= maxY) {
              var x = minX
              while (x <= maxX) {
                var ok = true
                var k2 = 0
                while (k2 < 4 && ok) {
                  val (x1, y1) = quad(k2); val (x2, y2) = quad((k2 + 1) % 4)
                  if (sgn * ((x2 - x1) * (y - y1) -
                      (y2 - y1) * (x - x1)) < -1e-9) ok = false
                  k2 += 1
                }
                if (ok) {
                  val py = h - 1 - y
                  if (clipMask == null || clipMask(py * w + x))
                    img.setRGB(x, py, strokeRgb)
                }
                x += 1
              }
              y += 1
            }
          case _ => // degenerate neighbor — no defined join direction
        }
      }
      def line(x0: Int, y0: Int, x1: Int, y1: Int): Unit = {
        // integer Bresenham — exact, no float accumulation
        var (x, y) = (x0, y0)
        val dx = math.abs(x1 - x0); val sx = if (x0 < x1) 1 else -1
        val dy = -math.abs(y1 - y0); val sy = if (y0 < y1) 1 else -1
        var err = dx + dy
        var continue = true
        while (continue) {
          step(x, y)
          if (x == x1 && y == y1) continue = false
          else {
            val e2 = 2 * err
            if (e2 >= dy) { err += dy; x += sx }
            if (e2 <= dx) { err += dx; y += sy }
          }
        }
      }
      subpaths.foreach { case (pts, closed) =>
        // §8.4.3.6: the dash pattern restarts (at the phase) for each
        // subpath; within a subpath it runs continuously across joins
        dist = dash._2 * penScale
        havePrev = false
        val ipts = pts.map(p => (p._1.toInt, p._2.toInt))
        val n = ipts.size
        // join vertices: interior points of an open subpath; EVERY point
        // of a closed one (the h-closing vertex is a join too, §8.4.3.4)
        vertexPx.clear()
        if (joinDisc)
          (if (closed) ipts.indices else 1 until math.max(1, n - 1))
            .foreach { i => vertexPx.add(pxKey(ipts(i)._1, ipts(i)._2)) }
        // cap planes: open subpaths only; anchored at the int endpoint
        // pixels with the outward direction from the nearest DISTINCT
        // neighbor (an all-one-pixel subpath is a dot — no cap direction).
        // emitIdx/totalPix drive the terminal emission windows: Bresenham
        // emits exactly Chebyshev(a,b) new pixels per segment after the
        // shared-vertex dedup, plus the subpath's first pixel.
        capStartP = null; capEndP = null
        emitIdx = 0
        totalPix = 1 + (0 until n - 1).map { i =>
          math.max(math.abs(ipts(i + 1)._1 - ipts(i)._1),
            math.abs(ipts(i + 1)._2 - ipts(i)._2))
        }.sum
        if (!closed && r > 0 && lineCap != 2 && n >= 2) {
          def outward(anchor: (Int, Int), from: Option[(Int, Int)])
              : Option[(Int, Int, Double, Double)] = from.flatMap { f =>
            val dx = (anchor._1 - f._1).toDouble
            val dy = (anchor._2 - f._2).toDouble
            val l = math.sqrt(dx * dx + dy * dy)
            if (l < 1e-9) None
            else Some((anchor._1, anchor._2, dx / l, dy / l))
          }
          capStartP = outward(ipts.head, ipts.find(_ != ipts.head)).orNull
          capEndP =
            outward(ipts.last, ipts.reverse.find(_ != ipts.last)).orNull
        }
        // dash decision each vertex pixel received when it was emitted —
        // caps and joins paint only where the pattern is ON (§8.4.3.6)
        val vertexOn = new Array[Boolean](math.max(1, n))
        vertexOn(0) = solid || dashOn(dist)
        var i = 0
        while (i < n - 1) {
          line(ipts(i)._1, ipts(i)._2, ipts(i + 1)._1, ipts(i + 1)._2)
          vertexOn(i + 1) = lastOn
          i += 1
        }
        if (closed && n >= 2)
          line(ipts.last._1, ipts.last._2, ipts.head._1, ipts.head._2)
        // round caps: a disc stamped at each open end (§8.4.3.3 style 1),
        // exempt from the butt planes (the cap IS the part beyond them)
        if (!closed && lineCap == 1 && r > 0 && n >= 1) {
          if (vertexOn(0))
            stamp(ipts.head._1, ipts.head._2, disc = true, isCapDisc = true)
          val endOn = if (n == 1) vertexOn(0) else vertexOn(n - 1)
          if (endOn)
            stamp(ipts.last._1, ipts.last._2, disc = true, isCapDisc = true)
        }
        // miter tips (join style 0): acute interior vertices, plus the
        // two wrap vertices of a closed subpath
        if (lineJoin == 0 && r > 0 && n >= 3) {
          capStartP = null; capEndP = null // joins are never cap-clipped
          var j = 1
          while (j < n - 1) {
            miterSpike(ipts(j - 1), ipts(j), ipts(j + 1), vertexOn(j))
            j += 1
          }
          if (closed) {
            miterSpike(ipts.last, ipts.head, ipts(1), vertexOn(0))
            miterSpike(ipts(n - 2), ipts.last, ipts.head, vertexOn(n - 1))
          }
        }
      }
      finishPaint()
    }

    // Fixed-count de Casteljau flattening for c/v/y: 16 segments, t = k/16
    // (an exact binary fraction), a fixed chain of IEEE +/* — every JVM
    // produces the same doubles, so curve pages raster bit-identically the
    // way line pages do. 16 segments keeps the chord error of a page-scale
    // cubic under half a pixel (max deviation ≤ |control polygon|/16²·c —
    // PdfPagesSpec pins exact pixel counts, not an error bound).
    val FlattenSegs = 16
    def flatten(p0: (Double, Double), x1: Double, y1: Double, x2: Double,
                y2: Double, x3: Double, y3: Double): Unit = {
      def eval(a: Double, b: Double, c: Double, d: Double, t: Double)
          : Double = {
        val u = 1.0 - t
        val ab = a * u + b * t; val bc = b * u + c * t
        val cd = c * u + d * t
        val abc = ab * u + bc * t; val bcd = bc * u + cd * t
        abc * u + bcd * t
      }
      var k = 1
      while (k <= FlattenSegs) {
        val t = k.toDouble / FlattenSegs
        open += ((eval(p0._1, x1, x2, x3, t), eval(p0._2, y1, y2, y3, t)))
        k += 1
      }
    }
    def currentPointFor(op: String): (Double, Double) = {
      if (open == null && closedStart != null) {
        // segment directly after h: new subpath from the closed start
        open = scala.collection.mutable.ArrayBuffer(closedStart)
        closedStart = null
      }
      require(open != null, s"$op with no current point")
      open.last
    }

    // §8.5.4: after W/W* only path-construction and path-PAINTING
    // operators may appear until the paint resolves the pending clip.
    // A graphics-state or color op in between (q/Q/cm/rg/RG) has no
    // defined raster — fail loudly (the envelope discipline), because a
    // silent interpretation would e.g. install the clip into a RESTORED
    // state a conforming viewer never sees.
    def noPendingClip(op: String): Unit =
      require(pendingClip.isEmpty,
        s"'$op' between 'W' and its painting operator — PDF 32000 §8.5.4 " +
          "allows only path construction/painting after a clip operator")

    ops.foreach {
      case MoveTo(x, y) =>
        flushOpen(false)
        open = scala.collection.mutable.ArrayBuffer(tx(x, y))
      case LineTo(x, y) =>
        currentPointFor("lineto")
        open += tx(x, y)
      // Bézier control points transform BEFORE the fixed flattening —
      // affine maps commute with Bézier evaluation, so the flattened
      // polyline IS the transformed curve's (no re-flattening error)
      case CurveTo(x1, y1, x2, y2, x3, y3) =>
        val p0 = currentPointFor("curveto")
        val (c1, c2, c3) = (tx(x1, y1), tx(x2, y2), tx(x3, y3))
        flatten(p0, c1._1, c1._2, c2._1, c2._2, c3._1, c3._2)
      case CurveToV(x2, y2, x3, y3) =>
        // implied control1 = current point: T(user current) IS the device
        // current point, so p0 serves both roles
        val p0 = currentPointFor("curveto-v")
        val (c2, c3) = (tx(x2, y2), tx(x3, y3))
        flatten(p0, p0._1, p0._2, c2._1, c2._2, c3._1, c3._2)
      case CurveToY(x1, y1, x3, y3) =>
        val p0 = currentPointFor("curveto-y")
        val (c1, c3) = (tx(x1, y1), tx(x3, y3))
        flatten(p0, c1._1, c1._2, c3._1, c3._2, c3._1, c3._2)
      case ClosePath => flushOpen(closed = true)
      case Rect(x, y, rw, rh) =>
        flushOpen(false)
        // all four user-space corners map through the CTM: under rotation
        // or skew `re` is the correct parallelogram, not an axis-aligned box
        subpaths += ((scala.collection.mutable.ArrayBuffer(
          tx(x, y), tx(x + rw, y), tx(x + rw, y + rh), tx(x, y + rh)), true))
        closedStart = tx(x, y) // re sets the current point
      case FillColor(c) => noPendingClip("rg"); fillRgb = c
      case StrokeColor(c) => noPendingClip("RG"); strokeRgb = c
      case Fill => fill(evenOdd = false)
      case FillEvenOdd => fill(evenOdd = true)
      case Stroke => stroke()
      case SetLineWidth(wd) => noPendingClip("w"); lineWidth = wd
      case SetDash(p, ph) => noPendingClip("d"); dash = (p, ph)
      case SetLineCap(s) => noPendingClip("J"); lineCap = s
      case SetLineJoin(s) => noPendingClip("j"); lineJoin = s
      case SetMiterLimit(m) => noPendingClip("M"); miterLimit = m
      case Concat(a, b, c, d, e, f) =>
        noPendingClip("cm")
        // row-vector pre-concatenation (§8.4.4): points map through the
        // NEW matrix first, then the old CTM — tx'(p) = tx_old(m(p))
        val (pA, pB, pC, pD, pE, pF) = ctm
        ctm = (a * pA + b * pC, a * pB + b * pD,
          c * pA + d * pC, c * pB + d * pD,
          e * pA + f * pC + pE, e * pB + f * pD + pF)
      case SaveState =>
        noPendingClip("q")
        gsStack += ((ctm, fillRgb, strokeRgb, clipMask, lineWidth, dash,
          lineCap, lineJoin, miterLimit))
      case RestoreState =>
        noPendingClip("Q")
        require(gsStack.nonEmpty, "'Q' with no matching 'q' — unbalanced " +
          "graphics-state restore has no defined raster")
        val (m, fc, sc, cm, lw, da, lc, lj, ml) =
          gsStack.remove(gsStack.size - 1)
        ctm = m; fillRgb = fc; strokeRgb = sc; clipMask = cm
        lineWidth = lw; dash = da; lineCap = lc; lineJoin = lj
        miterLimit = ml
      case Clip => pendingClip = Some(false)
      case ClipEvenOdd => pendingClip = Some(true)
      case EndPath =>
        flushOpen(false)
        finishPaint()
      // text through the CURRENT clip mask and fill color (round 19 —
      // the text-inside-path-clip envelope notch): the same 5×7 stipple
      // geometry as renderTextPage, anchored per run at the CTM-mapped
      // baseline origin, so a pure-text page rasters byte-identically
      // through this path and a clipped run paints exactly the masked
      // subset of its unclipped pixels
      case ShowText(runs) =>
        noPendingClip("BT")
        require(ctm._1 == 1.0 && ctm._2 == 0.0 &&
            ctm._3 == 0.0 && ctm._4 == 1.0,
          s"text under a scaled/rotated CTM [${ctm._1} ${ctm._2} " +
            s"${ctm._3} ${ctm._4}] — the stipple glyph grid only " +
            "translates; no defined raster")
        runs.foreach { case (ux, uy, s) =>
          val (ox, oy) = tx(ux, uy)
          val x0base = math.round(ox).toInt
          val baseRow = h - math.round(oy).toInt // image row of baseline
          var k = 0
          while (k < s.length) {
            val c = s.charAt(k)
            if (c != ' ') {
              var gr = 0
              while (gr < 7) {
                var gc = 0
                while (gc < 5) {
                  val bit = ((c.toInt * 2654435761L + gr * 40503L +
                    gc * 9973L) >>> 13) & 1L
                  val px = x0base + k * 7 + gc
                  val py = baseRow - 7 + gr
                  if (bit == 1L && px >= 0 && px < w && py >= 0 &&
                      py < h && (clipMask == null || clipMask(py * w + px)))
                    img.setRGB(px, py, fillRgb)
                  gc += 1
                }
                gr += 1
              }
            }
            k += 1
          }
        }
    }
    // a trailing W with no painting operator never resolved — an invalid
    // stream a viewer rejects; silently discarding it would render a page
    // with a DIFFERENT clip than any conforming reading
    require(pendingClip.isEmpty,
      "clip operator 'W' with no subsequent painting operator — invalid " +
        "content stream, no defined raster")
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Solid-color raw-RGB24 fixture page (rows top-down) for
    * [[FlateRgbPage]].
    */
  def solidRgb(rgb: Int, w: Int, h: Int): Array[Byte] = {
    val raw = new Array[Byte](w * h * 3)
    var i = 0
    while (i < w * h) {
      raw(3 * i) = ((rgb >> 16) & 0xff).toByte
      raw(3 * i + 1) = ((rgb >> 8) & 0xff).toByte
      raw(3 * i + 2) = (rgb & 0xff).toByte
      i += 1
    }
    raw
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
