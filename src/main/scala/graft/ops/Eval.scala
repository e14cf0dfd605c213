package graft.ops

import graft.schema.{GtBox, PageEval, PredBox}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Detection-evaluation operators: the greedy IoU matcher (J4) and the
  * TP/FP/FN → precision/recall/F1 rollup (A5–A8).
  *
  * Reference: Test/accuracy.ipynb `match_detections` + `iou` (cell d497de3d)
  * and the metric-accumulation cell 86959f74.
  *
  * The greedy matcher is order-dependent (predictions are matched in raw line
  * order, NOT confidence-sorted — a reference quirk we preserve), so it is not
  * expressible as a relational join. It is implemented as a typed `cogroup`
  * keyed by page: one shuffle on `file_name`, then embarrassingly parallel
  * per-page greedy loops over (typically tens of) boxes. No driver-side
  * state, no collect — scales to any number of pages.
  */
object Eval {

  /** One matched (prediction, ground-truth) pair. */
  final case class Match(file_name: String, pred_line: Long, gt_line: Long,
                         class_id: Int, iou: Double)

  /** Exact reference `iou`: early 0.0 on empty intersection; areas unsigned
    * only via that early exit (degenerate boxes can't reach the division with
    * inter > 0 unless they truly overlap).
    */
  private[graft] def iouOf(px1: Double, py1: Double, px2: Double, py2: Double,
                           gx1: Double, gy1: Double, gx2: Double, gy2: Double): Double = {
    val ix1 = math.max(px1, gx1); val iy1 = math.max(py1, gy1)
    val ix2 = math.min(px2, gx2); val iy2 = math.min(py2, gy2)
    val inter = math.max(0.0, ix2 - ix1) * math.max(0.0, iy2 - iy1)
    if (inter == 0.0) 0.0
    else {
      val aA = (px2 - px1) * (py2 - py1)
      val aB = (gx2 - gx1) * (gy2 - gy1)
      inter / (aA + aB - inter)
    }
  }

  /** Greedy core, exact reference semantics: for each prediction in order,
    * scan unmatched same-class GTs, track the best IoU with strict `>`
    * starting from 0.0 (⇒ the lowest-indexed GT wins ties), then accept the
    * pair iff `best ≥ iouThr`. Returns (gtIndex per accepted pred, iou).
    */
  private def greedyCore(pred: Array[PredBox], gt: Array[GtBox],
                         iouThr: Double): Array[(Int, Int, Double)] = {
    val taken = new Array[Boolean](gt.length)
    val out = Array.newBuilder[(Int, Int, Double)]
    var pi = 0
    while (pi < pred.length) {
      val p = pred(pi)
      var best = -1; var bestIou = 0.0
      var gi = 0
      while (gi < gt.length) {
        if (!taken(gi) && gt(gi).class_id == p.class_id) {
          val g = gt(gi)
          val v = iouOf(p.x1, p.y1, p.x2, p.y2, g.x1, g.y1, g.x2, g.y2)
          if (v > bestIou) { bestIou = v; best = gi }
        }
        gi += 1
      }
      if (bestIou >= iouThr && best >= 0) {
        taken(best) = true
        out += ((pi, best, bestIou))
      }
      pi += 1
    }
    out.result()
  }

  /** Matched pairs per page (J4). Both sides are sorted by line number before
    * the loop — determinism never depends on partition iteration order.
    */
  def greedyMatch(preds: Dataset[PredBox], gts: Dataset[GtBox],
                  iouThr: Double = 0.5): Dataset[Match] = {
    val spark = preds.sparkSession
    import spark.implicits._
    preds.groupByKey(_.file_name).cogroup(gts.groupByKey(_.file_name)) {
      (page, ps, gs) =>
        val pred = ps.toArray.sortBy(_.line_no)
        val gt = gs.toArray.sortBy(_.line_no)
        greedyCore(pred, gt, iouThr).iterator.map { case (pi, gi, v) =>
          Match(page, pred(pi).line_no, gt(gi).line_no, pred(pi).class_id, v)
        }
    }
  }

  /** Per-page eval records (A9): `{page, num_predictions, num_gt, tp, fp, fn}`.
    * Reference quirk preserved: when a page has no GT boxes the matcher is
    * skipped entirely — tp=0, fp=len(preds) (cell 86959f74 `if gt_abs else`).
    * Pages present on either side appear (cogroup is full-outer by key).
    */
  def pageEval(preds: Dataset[PredBox], gts: Dataset[GtBox],
               iouThr: Double = 0.5): Dataset[PageEval] = {
    val spark = preds.sparkSession
    import spark.implicits._
    preds.groupByKey(_.file_name).cogroup(gts.groupByKey(_.file_name)) {
      (page, ps, gs) =>
        val pred = ps.toArray.sortBy(_.line_no)
        val gt = gs.toArray.sortBy(_.line_no)
        val tp = if (gt.isEmpty) 0L else greedyCore(pred, gt, iouThr).length.toLong
        Iterator.single(PageEval(page, pred.length.toLong, gt.length.toLong,
          tp, pred.length - tp, gt.length - tp))
    }
  }

  /** Per-class TP/FP/FN (cell 86959f74 per-class block): matched predictions
    * count as TP under the prediction's class, unmatched predictions as FP,
    * unmatched GTs as FN — all computed only on pages that have GT boxes
    * (reference quirk: pages without GT contribute nothing per-class).
    */
  def perClassCounts(preds: Dataset[PredBox], gts: Dataset[GtBox],
                     iouThr: Double = 0.5): DataFrame = {
    val spark = preds.sparkSession
    import spark.implicits._
    val counts = preds.groupByKey(_.file_name).cogroup(gts.groupByKey(_.file_name)) {
      (_, ps, gs) =>
        val pred = ps.toArray.sortBy(_.line_no)
        val gt = gs.toArray.sortBy(_.line_no)
        if (gt.isEmpty) Iterator.empty
        else {
          val m = greedyCore(pred, gt, iouThr)
          val mp = m.map(_._1).toSet
          val mg = m.map(_._2).toSet
          val tp = m.iterator.map { case (pi, _, _) => (pred(pi).class_id, (1L, 0L, 0L)) }
          val fp = pred.indices.iterator.filterNot(mp).map(pi => (pred(pi).class_id, (0L, 1L, 0L)))
          val fn = gt.indices.iterator.filterNot(mg).map(gi => (gt(gi).class_id, (0L, 0L, 1L)))
          tp ++ fp ++ fn
        }
    }.toDF("class_id", "cnt")
    counts.groupBy("class_id").agg(
      sum(col("cnt._1")).as("tp"),
      sum(col("cnt._2")).as("fp"),
      sum(col("cnt._3")).as("fn"))
  }

  /** A5–A8: global + per-key P/R/F1 in one pass via ROLLUP (the reference
    * runs two parallel accumulations; grouping sets give both from a single
    * shuffle). Zero-denominator guard matches the reference's 0.0.
    */
  def prf1Rollup(perKey: DataFrame, keyCol: String): DataFrame = {
    perKey
      .rollup(col(keyCol))
      .agg(sum(col("tp")).as("tp"), sum(col("fp")).as("fp"), sum(col("fn")).as("fn"))
      .select(
        coalesce(col(keyCol).cast("string"), lit("ALL")).as(keyCol),
        col("tp"), col("fp"), col("fn"),
        when(col("tp") + col("fp") > 0, col("tp") / (col("tp") + col("fp")))
          .otherwise(0.0).as("precision"),
        when(col("tp") + col("fn") > 0, col("tp") / (col("tp") + col("fn")))
          .otherwise(0.0).as("recall"))
      .withColumn("f1",
        when(col("precision") + col("recall") > 0,
          lit(2.0) * col("precision") * col("recall") /
            (col("precision") + col("recall"))).otherwise(0.0))
  }
}
