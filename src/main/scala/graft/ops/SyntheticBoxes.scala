package graft.ops

import graft.Tables
import graft.geo.Geometry
import graft.schema.{GtBox, PredBox}
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bounding-box datasets derived deterministically from the `part` table so
  * the reference's geometry (G1–G6) and matching (J4/O4) semantics run against
  * the driver testdata with a DuckDB oracle.
  *
  * Every coordinate is an integer-valued double and every normalized value has
  * a power-of-two denominator (W=1024, H=512), so all arithmetic — including
  * IoU division — is bit-identical across engines and needs no rounding.
  * (Power-of-two denominators also mean 6-dp *formatting* could tie exactly at
  * a half; formatting parity is therefore covered by golden unit tests, not
  * the oracle — SURVEY §7.4.1.)
  */
object SyntheticBoxes {

  val ImgW = 1024.0
  val ImgH = 512.0

  private def base(part: DataFrame): DataFrame = {
    val k = col("p_partkey")
    part.select(
      k.as("k"),
      expr("p_partkey div 25").as("page"),
      (k % 25).cast("long").as("line_no"),
      (k % 6).cast("int").as("class_id"),
      (k * 37 % 960).cast("double").as("x"),
      (k * 59 % 480).cast("double").as("y"),
      (lit(64) + k * 13 % 128).cast("double").as("w"),
      (lit(48) + k * 17 % 96).cast("double").as("h"))
  }

  /** Ground-truth-like boxes: page = p_partkey div 25, one box per part row.
    * Coordinates can overflow the image (exercises clip G1).
    */
  def gtBoxes(part: DataFrame): DataFrame = base(part).drop("k")

  /** Prediction-like boxes: the GT boxes under a small deterministic jitter,
    * with a derived confidence in [0,1).
    */
  def predBoxes(part: DataFrame): DataFrame =
    base(part)
      .withColumn("x", col("x") + (col("k") % 7).cast("double") - 3.0)
      .withColumn("y", col("y") + (col("k") % 11).cast("double") - 5.0)
      .withColumn("w", col("w") + (col("k") % 5).cast("double") - 2.0)
      .withColumn("h", col("h") + (col("k") % 9).cast("double") - 4.0)
      // conf_pct is the EXACT integer the double confidence derives from —
      // calibration (q160) bins and averages on it, never on the double
      // (reconstructing k from confidence·100 truncates 0.29 to 28)
      .withColumn("conf_pct", (col("k") % 100).cast("long"))
      .withColumn("confidence", (col("k") % 100).cast("double") / 100.0)
      .drop("k")

  /** G1+G2 over the GT boxes: clip to 1024×512 then normalize — raw exact
    * doubles out (denominators 2^a ⇒ bit-identical everywhere).
    */
  def yoloNorm(part: DataFrame): DataFrame = {
    val b = gtBoxes(part)
    val (cx, cy, cw, ch) = Geometry.clipXYWH(
      col("x"), col("y"), col("w"), col("h"), lit(ImgW), lit(ImgH))
    val (xc, yc, wn, hn) = Geometry.xywhToNorm(cx, cy, cw, ch, lit(ImgW), lit(ImgH))
    b.select(col("page"), col("line_no"), col("class_id"),
      xc.as("x_center"), yc.as("y_center"), wn.as("w_norm"), hn.as("h_norm"))
  }

  private def corners(pfx: String): Geometry.Box =
    Geometry.Box(col(s"${pfx}x"), col(s"${pfx}y"),
      col(s"${pfx}x") + col(s"${pfx}w"), col(s"${pfx}y") + col(s"${pfx}h"))

  /** J4 candidate pairs + O4 argmax, fully relational: equi-join on
    * (page, class), θ-filter IoU ≥ thr, then best GT per prediction with
    * deterministic tie-break. (The order-dependent greedy one-to-one matcher
    * is the typed operator in [[Eval]]; this is its relational companion.)
    */
  def bestMatches(part: DataFrame, iouThr: Double = 0.3): DataFrame = {
    val g = gtBoxes(part).select(
      col("page"), col("class_id"), col("line_no").as("gt_line"),
      col("x").as("gx"), col("y").as("gy"), col("w").as("gw"), col("h").as("gh"))
    val p = predBoxes(part).select(
      col("page"), col("class_id"), col("line_no").as("pred_line"),
      col("x").as("px"), col("y").as("py"), col("w").as("pw"), col("h").as("ph"))
    val iou = Geometry.iou(corners("p"), corners("g"))
    val cands = p.join(g, Seq("page", "class_id"))
      .withColumn("iou", iou)
      .filter(col("iou") >= iouThr)
    val w = Window.partitionBy("page", "pred_line")
      .orderBy(col("iou").desc, col("gt_line"))
    cands
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("page"), col("class_id"), col("pred_line"), col("gt_line"), col("iou"))
  }

  /** Confidence-calibration readout (reliability diagram): predictions
    * bucketed by confidence decile; per bin, how often the model's claim
    * is borne out (a best-match at `iouThr` exists) versus what it
    * claimed (mean confidence) — THE eval artifact behind "is this
    * detector over-confident". All arithmetic is integer until two final
    * single divisions: bins and confidence sums ride the exact
    * `conf_pct`, matched flags are a left-join existence test against
    * [[bestMatches]].
    *
    * Scale shape: the match side is the existing bounded operator; the
    * rollup is a 10-row hash aggregation. Left join on the prediction
    * key rides the page partitioning.
    */
  def calibration(part: DataFrame, iouThr: Double = 0.3): DataFrame = {
    val preds = predBoxes(part)
      .select(col("page"), col("line_no").as("pred_line"), col("conf_pct"))
    val matched = bestMatches(part, iouThr)
      .select(col("page"), col("pred_line"), lit(1L).as("m"))
    preds.join(matched, Seq("page", "pred_line"), "left")
      .groupBy((col("conf_pct") / 10).cast("long").as("bin"))
      .agg(count(lit(1)).as("n_preds"),
        sum(col("conf_pct")).as("sum_conf_pct"),
        count(col("m")).as("n_matched"))
      .select(col("bin"), col("n_preds"), col("sum_conf_pct"),
        col("n_matched"),
        (col("sum_conf_pct").cast("double") /
          (col("n_preds") * 100).cast("double")).as("mean_conf"),
        (col("n_matched").cast("double") / col("n_preds").cast("double"))
          .as("accuracy"))
  }

  /** Typed datasets feeding the greedy matcher (corner coordinates). */
  def typedBoxes(spark: SparkSession, part: DataFrame): (Dataset[PredBox], Dataset[GtBox]) = {
    import spark.implicits._
    val p = predBoxes(part).select(
      concat(lit("page_"), col("page")).as("file_name"), col("line_no"),
      col("class_id"), col("x").as("x1"), col("y").as("y1"),
      (col("x") + col("w")).as("x2"), (col("y") + col("h")).as("y2"),
      col("confidence")).as[PredBox]
    val g = gtBoxes(part).select(
      concat(lit("page_"), col("page")).as("file_name"), col("line_no"),
      col("class_id"), col("x").as("x1"), col("y").as("y1"),
      (col("x") + col("w")).as("x2"), (col("y") + col("h")).as("y2")).as[GtBox]
    (p, g)
  }

  /** Greedy matcher + per-class P/R/F1 rollup — the full eval pipeline.
    *
    * Every prediction is doubled: a second copy at `line_no + 25`, shifted
    * +4 px in x (still above the IoU threshold against its GT). The two
    * copies COMPETE for one GT box, so the greedy one-to-one assignment in
    * line order — not mere thresholding — determines which becomes TP and
    * which FP. Oracle: a DuckDB recursive CTE replays the same greedy loop
    * (list-valued `used` state, one step per prediction in line order).
    */
  def qGreedyEval(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val (p, g) = typedBoxes(spark, Tables.part(spark, sfDir))
    val dups = p.map(b => b.copy(line_no = b.line_no + 25,
      x1 = b.x1 + 4.0, x2 = b.x2 + 4.0))
    val perClass = Eval.perClassCounts(p.union(dups), g, iouThr = 0.5)
    Eval.prf1Rollup(perClass, "class_id")
  }
}
