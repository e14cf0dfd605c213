package graft.schema

import org.apache.spark.sql.types._

/** Input/output schemas of the reference data model (FIXTURES.md §A).
  * Schema-on-read is explicit everywhere: at 100 TB an inferred-schema pass is
  * a full extra scan, so every reader in `graft.io` takes one of these.
  */
object Schemas {

  /** Annotation document (converter_to_yolo_data.py:10-17,
    * predictions_to_json.py:124-128).
    */
  val annotationDoc: StructType = StructType(Seq(
    StructField("file_name", StringType),
    StructField("annotations", ArrayType(StructType(Seq(
      StructField("bbox", ArrayType(DoubleType)),
      StructField("category_id", IntegerType),
      StructField("category_name", StringType))))),
    StructField("corruption", StructType(Seq(
      StructField("type", StringType),
      StructField("severity", IntegerType))))))

  /** Same, plus the permissive-parse corrupt-record column (F1 skip-and-count
    * semantics — see io/AnnotationsIO).
    */
  val annotationDocPermissive: StructType =
    annotationDoc.add(StructField("_corrupt_record", StringType))

  /** YOLO ground-truth label row (5 whitespace fields,
    * converter_to_yolo_data.py:37-39).
    */
  val gtLabel: StructType = StructType(Seq(
    StructField("class_id", IntegerType),
    StructField("x_center", DoubleType),
    StructField("y_center", DoubleType),
    StructField("width", DoubleType),
    StructField("height", DoubleType)))

  /** YOLO prediction label row (exactly 6 fields, predictions_to_json.py:7-9). */
  val predLabel: StructType = gtLabel.add(StructField("confidence", DoubleType))

  /** Class taxonomy dimension (converter_to_yolo_data.py:20-26). */
  val classNames: Seq[(Int, String)] = Seq(
    0 -> "Background", 1 -> "Text", 2 -> "Title",
    3 -> "List", 4 -> "Table", 5 -> "Figure")
}

/** Typed rows for the Dataset-based operators. */
final case class PredBox(
    file_name: String, line_no: Long, class_id: Int,
    x1: Double, y1: Double, x2: Double, y2: Double, confidence: Double)

final case class GtBox(
    file_name: String, line_no: Long, class_id: Int,
    x1: Double, y1: Double, x2: Double, y2: Double)

/** Per-page evaluation record (notebook `all_pred_records`). */
final case class PageEval(
    file_name: String, num_predictions: Long, num_gt: Long,
    tp: Long, fp: Long, fn: Long)
