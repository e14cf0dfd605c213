package graft.geo

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Coordinate-geometry scalar functions of the reference toolkit, re-expressed
  * as pure Catalyst `Column` expressions (never UDFs) so they stay inside
  * whole-stage codegen and remain pushdown/prune-friendly at any scale.
  *
  * Reference semantics (file:line into /root/reference):
  *  - clip:       converter_to_yolo_data.py:84-87, predictions_to_json.py:68-71
  *  - xywh→norm:  converter_to_yolo_data.py:88-91 (zero-guard when W or H = 0)
  *  - norm→xywh:  predictions_to_json.py:62-72 (inverse, then clip)
  *  - norm→xyxy:  Test/accuracy.ipynb `yolo_norm_to_xyxy`
  *  - xyxy→xywh:  Tools/server.py:96-98
  *  - IoU:        Test/accuracy.ipynb second `iou` definition (0.0 on no overlap)
  *  - label line: converter_to_yolo_data.py:92 (6-dp fixed format)
  *
  * Boxes are modelled as four scalar columns rather than a struct so every
  * function codegens to straight-line arithmetic; struct packing is left to
  * call sites that need nesting (see ops/Predictions.scala).
  */
object Geometry {

  /** A box as four columns; convenience carrier, no runtime cost. */
  final case class Box(x1: Column, y1: Column, x2: Column, y2: Column)

  private val zero = lit(0.0)

  /** G1 — clip an absolute `[x, y, w, h]` box to image bounds `[0,W]×[0,H]`.
    * Returns (x, y, w, h) clipped exactly as the reference: clamp the corner
    * first, then clamp the extent to what remains.
    */
  def clipXYWH(x: Column, y: Column, w: Column, h: Column,
               imgW: Column, imgH: Column): (Column, Column, Column, Column) = {
    val cx = greatest(zero, least(x, imgW))
    val cy = greatest(zero, least(y, imgH))
    val cw = greatest(zero, least(w, imgW - cx))
    val ch = greatest(zero, least(h, imgH - cy))
    (cx, cy, cw, ch)
  }

  /** G2 — absolute `[x, y, w, h]` → normalized YOLO `(xc, yc, wn, hn)` in
    * [0,1]. Emits 0.0 when the image dimension is 0 (reference zero-guard).
    */
  def xywhToNorm(x: Column, y: Column, w: Column, h: Column,
                 imgW: Column, imgH: Column): (Column, Column, Column, Column) = {
    def guard(dim: Column, v: Column): Column = when(dim === zero, zero).otherwise(v)
    (guard(imgW, (x + w / 2.0) / imgW),
     guard(imgH, (y + h / 2.0) / imgH),
     guard(imgW, w / imgW),
     guard(imgH, h / imgH))
  }

  /** G3 — normalized YOLO center box → absolute `[x, y, w, h]`, clipped to the
    * image (the reference always clips on this path).
    */
  def normToAbsXYWH(xc: Column, yc: Column, wn: Column, hn: Column,
                    imgW: Column, imgH: Column): (Column, Column, Column, Column) = {
    // association order matters for bit-parity with the reference:
    // (xc - w/2) * W, NOT xc*W - (w*W)/2 — the two differ in the last ulp,
    // which the 2-dp HALF_EVEN round downstream can amplify to a visible digit
    val w = wn * imgW
    val h = hn * imgH
    val x = (xc - wn / 2.0) * imgW
    val y = (yc - hn / 2.0) * imgH
    clipXYWH(x, y, w, h, imgW, imgH)
  }

  /** G4 — normalized YOLO center box → absolute corner box `(x1, y1, x2, y2)`. */
  def normToXYXY(xc: Column, yc: Column, wn: Column, hn: Column,
                 imgW: Column, imgH: Column): Box = {
    // exact reference association (yolo_norm_to_xyxy): every corner is
    // (xc ± w/2) * img — x1 + w would differ from (xc + w/2)*W in the
    // last ulp and flip IoU-threshold comparisons on boundary boxes
    Box((xc - wn / 2.0) * imgW, (yc - hn / 2.0) * imgH,
        (xc + wn / 2.0) * imgW, (yc + hn / 2.0) * imgH)
  }

  /** G5 — corner box → `[x, y, w, h]`. */
  def xyxyToXYWH(b: Box): (Column, Column, Column, Column) =
    (b.x1, b.y1, b.x2 - b.x1, b.y2 - b.y1)

  /** G6 — intersection-over-union of two corner boxes; 0.0 when disjoint or
    * when the union is degenerate. Pure arithmetic: stays in codegen and is
    * usable inside join conditions (the J4 candidate-pair theta join).
    */
  def iou(a: Box, b: Box): Column = {
    val ix1 = greatest(a.x1, b.x1)
    val iy1 = greatest(a.y1, b.y1)
    val ix2 = least(a.x2, b.x2)
    val iy2 = least(a.y2, b.y2)
    val iw = greatest(zero, ix2 - ix1)
    val ih = greatest(zero, iy2 - iy1)
    val inter = iw * ih
    val areaA = greatest(zero, a.x2 - a.x1) * greatest(zero, a.y2 - a.y1)
    val areaB = greatest(zero, b.x2 - b.x1) * greatest(zero, b.y2 - b.y1)
    val union = areaA + areaB - inter
    when(union > zero, inter / union).otherwise(zero)
  }

  /** G7+G9 — YOLO ground-truth label line: `cls xc yc w h`, 6-dp fixed.
    * Round with exact Python semantics first so formatting matches the
    * reference's `f"{v:.6f}"` (Java's `%.6f` alone would round HALF_UP).
    */
  def labelLine(cls: Column, xc: Column, yc: Column, w: Column, h: Column): Column =
    format_string("%d %.6f %.6f %.6f %.6f",
      cls, pyRound(xc, 6), pyRound(yc, 6), pyRound(w, 6), pyRound(h, 6))

  /** G8 — Python-`round` parity: HALF_EVEN on the EXACT binary expansion
    * (see [[graft.functions.PyRound]] — `bround` diverges on decimal-repr
    * ties like 2.675).
    */
  def pyRound(c: Column, scale: Int): Column =
    graft.functions.PyRoundFunctions.pyRound(c, scale)
}
