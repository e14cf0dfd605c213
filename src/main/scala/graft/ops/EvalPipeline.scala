package graft.ops

import graft.geo.Geometry
import graft.io.LabelsIO
import graft.schema.{GtBox, PredBox}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** §3.4 — the full accuracy-evaluation pipeline (Test/accuracy.ipynb):
  * prediction + GT label files → absolute corner boxes → greedy IoU match →
  * per-page records → global + per-class P/R/F1.
  *
  * One DAG: two label scans, per-page cogroup (single shuffle each side),
  * rollup aggregation. The image-dimension inputs arrive as a DataFrame
  * (stem, width, height) — from `io/ImageMeta.probe` in production, inline
  * literals in tests.
  */
object EvalPipeline {

  private def withCorners(labels: DataFrame, dims: DataFrame,
                          hasConf: Boolean): DataFrame = {
    val joined = labels.join(dims, "stem")
    val w = col("width").cast("double")
    val h = col("height").cast("double")
    val b = Geometry.normToXYXY(col("x_center"), col("y_center"),
      col("box_w"), col("box_h"), w, h)
    joined.select(
      (Seq(col("stem").as("file_name"), col("line_no"), col("class_id"),
        b.x1.as("x1"), b.y1.as("y1"), b.x2.as("x2"), b.y2.as("y2")) ++
        (if (hasConf) Seq(col("confidence")) else Nil)): _*)
  }

  private def renameBox(df: DataFrame): DataFrame =
    df.withColumnRenamed("width", "box_w").withColumnRenamed("height", "box_h")

  /** Prediction label files → typed corner boxes (conf-filtered, F4). */
  def predBoxes(spark: SparkSession, labelsDir: String, dims: DataFrame,
                confThr: Double = 0.25): Dataset[PredBox] = {
    import spark.implicits._
    withCorners(renameBox(LabelsIO.readPredictions(spark, labelsDir)), dims, hasConf = true)
      .filter(col("confidence") >= confThr)
      .as[PredBox]
  }

  /** GT label files → typed corner boxes. */
  def gtBoxes(spark: SparkSession, labelsDir: String, dims: DataFrame): Dataset[GtBox] = {
    import spark.implicits._
    withCorners(renameBox(LabelsIO.readGroundTruth(spark, labelsDir)), dims, hasConf = false)
      .as[GtBox]
  }

  /** End-to-end: label dirs → per-class + global P/R/F1 (one row per class
    * plus the ALL rollup row).
    */
  def evaluate(spark: SparkSession, predDir: String, gtDir: String,
               dims: DataFrame, confThr: Double = 0.25,
               iouThr: Double = 0.5): DataFrame = {
    val p = predBoxes(spark, predDir, dims, confThr)
    val g = gtBoxes(spark, gtDir, dims)
    Eval.prf1Rollup(Eval.perClassCounts(p, g, iouThr), "class_id")
  }

  /** Per-page eval records variant (notebook `all_pred_records`). The
    * reference iterates PAGES (from the PDFs), not label files — a page with
    * neither predictions nor GT still yields an all-zero record, so the
    * cogroup result is left-joined back onto the full page list from `dims`.
    */
  def pageRecords(spark: SparkSession, predDir: String, gtDir: String,
                  dims: DataFrame, confThr: Double = 0.25,
                  iouThr: Double = 0.5): DataFrame = {
    val records = Eval.pageEval(predBoxes(spark, predDir, dims, confThr),
      gtBoxes(spark, gtDir, dims), iouThr).toDF()
    dims.select(col("stem").as("file_name"))
      .join(records, Seq("file_name"), "left_outer")
      .na.fill(0L, Seq("num_predictions", "num_gt", "tp", "fp", "fn"))
  }
}
