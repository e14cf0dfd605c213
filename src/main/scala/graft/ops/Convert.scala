package graft.ops

import graft.geo.Geometry
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** §3.1 — the annotation→YOLO-dataset pipeline (converter_to_yolo_data.py),
  * re-expressed as one lazy DataFrame DAG:
  *
  *   images ⟕ annotations  →  explode_outer  →  validate  →  geometry  →
  *   ordered collect_list  →  split column   →  partitioned sink
  *
  * One shuffle for the join (none when the annotation side is broadcastable),
  * one for the per-image regroup. The reference's per-image Python loop
  * becomes embarrassingly parallel; its warn-and-skip counters become
  * `observe` metrics on the same pass.
  */
object Convert {

  /** Deterministic split assignment (G16 scale path): stable under reruns and
    * cluster topology, unlike seeded shuffling — `hash(file_name) mod 100`.
    * The 80/20 proportion + determinism are the contract (SURVEY §7.4.3);
    * exact sklearn membership is not reproduced.
    *
    * math.round, not toInt: naive truncation turns ratios whose double repr
    * sits just below the integer (0.29 * 100 = 28.999…) into an off-by-one
    * percent split.
    */
  def hashSplit(fileName: Column, trainRatio: Double = 0.8): Column =
    when(pmod(hash(fileName), lit(100)) < lit(math.round(trainRatio * 100).toInt), "train")
      .otherwise("val")

  /** J1 + G14 + F2/F3 + G1/G2/G7 — per-image label lines.
    *
    * @param images DataFrame(file_name, width, height)
    * @param anns   DataFrame(file_name, annotations: array<struct<bbox array<double>,
    *               category_id int, category_name string>>)
    * @return DataFrame(file_name, missing_json, lines: array<string>, n_boxes)
    *         — images with no/empty annotations keep an empty `lines` (the
    *         reference still writes an empty label file, :173).
    */
  def labelLines(images: DataFrame, anns: DataFrame): DataFrame = {
    val joined = images
      .join(anns.select("file_name", "annotations"), Seq("file_name"), "left_outer")
      .select(col("file_name"), col("width"), col("height"),
        col("annotations").isNull.as("missing_json"),
        posexplode_outer(col("annotations")).as(Seq("pos", "ann")))

    val bbox = col("ann.bbox")
    val valid = col("ann").isNotNull &&
      size(bbox) === 4 &&                                  // F2
      col("ann.category_id").isin(0, 1, 2, 3, 4, 5)        // F3 (CLASS_IDS)

    val w = col("width").cast("double")
    val h = col("height").cast("double")
    val (cx, cy, cw, ch) = Geometry.clipXYWH(
      element_at(bbox, 1), element_at(bbox, 2),
      element_at(bbox, 3), element_at(bbox, 4), w, h)
    val (xc, yc, wn, hn) = Geometry.xywhToNorm(cx, cy, cw, ch, w, h)
    val line = Geometry.labelLine(col("ann.category_id"), xc, yc, wn, hn)

    joined
      .withColumn("entry", when(valid, struct(col("pos"), line.as("line"))))
      .groupBy("file_name")
      .agg(
        first(col("missing_json")).as("missing_json"),
        // A4-style ordered aggregation: explicit sort key, never partition order
        transform(array_sort(collect_list(col("entry"))), e => e("line")).as("lines"))
      .withColumn("n_boxes", size(col("lines")))
  }

  /** Full pipeline: label lines + split assignment. */
  def dataset(images: DataFrame, anns: DataFrame, trainRatio: Double = 0.8): DataFrame =
    dataset(images, anns, hashSplit(col("file_name"), trainRatio))

  /** Full pipeline with a caller-supplied split expression (evaluated over the
    * per-image row; any deterministic assignment works — e.g. an
    * engine-neutral arithmetic hash where cross-engine reproducibility
    * matters, since `hashSplit`'s Murmur3 is Spark-specific).
    */
  def dataset(images: DataFrame, anns: DataFrame, splitCol: Column): DataFrame =
    labelLines(images, anns)
      .withColumn("split", splitCol)
      .withColumn("stem", regexp_replace(col("file_name"), "\\.[^.]+$", ""))

  /** A1/A2 — conversion stats in one aggregation (reference counters at
    * converter_to_yolo_data.py:142,160-161,176-184).
    */
  def stats(ds: DataFrame): DataFrame =
    ds.agg(
      count(lit(1)).as("images"),
      count(lit(1)).as("labels"),
      sum(col("n_boxes")).as("boxes"),
      sum(when(col("missing_json"), 1L).otherwise(0L)).as("missing_json"),
      sum(when(col("split") === "train", 1L).otherwise(0L)).as("train_images"),
      sum(when(col("split") === "val", 1L).otherwise(0L)).as("val_images"))
}
