package graft.ops

import graft.geo.Geometry
import graft.schema.Schemas
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §3.2 — the YOLO-predictions→nested-JSON pipeline (predictions_to_json.py),
  * as one DAG:
  *
  *   images ⟕ prediction rows → conf/class filters → norm→abs geometry →
  *   HALF_EVEN round → broadcast taxonomy join → ordered nested assembly →
  *   JSON
  *
  * The 6-row class taxonomy is a broadcast join (J3) — never a shuffle. The
  * per-image nested `annotations` array preserves label-file line order via an
  * explicit sort key (A4; Spark gives no intra-group order guarantee).
  */
object Predictions {

  /** Taxonomy dimension (J3), broadcast by construction. */
  def taxonomy(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Schemas.classNames.toDF("category_id", "category_name")
  }

  /** @param images DataFrame(file_name, width, height) — stem derived here
    * @param preds  DataFrame(stem, line_no, class_id, x_center, y_center,
    *               width, height, confidence) — normalized coords
    * @return DataFrame(file_name, annotations, corruption) matching the
    *         reference output document schema (predictions_to_json.py:124-128)
    */
  def documents(images: DataFrame, preds: DataFrame,
                confThr: Double = 0.25, roundDp: Int = 2): DataFrame = {
    val spark = images.sparkSession

    val filtered = preds
      .filter(col("confidence") >= lit(confThr))            // F4
      .filter(col("class_id").isin(0, 1, 2, 3, 4, 5))       // F3
      // box w/h vs image w/h name collision after the image join
      .withColumnRenamed("width", "wn").withColumnRenamed("height", "hn")
      .join(broadcast(taxonomy(spark)),
        col("class_id") === col("category_id"), "inner")    // J3

    val imgs = images.withColumn("stem",
      regexp_replace(col("file_name"), "\\.[^.]+$", ""))

    val joined = imgs.join(filtered, Seq("stem"), "left_outer")  // J2

    val w = col("width").cast("double")
    val h = col("height").cast("double")
    val (bx, by, bw, bh) = Geometry.normToAbsXYWH(
      col("x_center"), col("y_center"), col("wn"), col("hn"), w, h)
    def rd(c: org.apache.spark.sql.Column) =
      if (roundDp >= 0) Geometry.pyRound(c, roundDp) else c  // G8 HALF_EVEN

    joined
      .withColumn("entry",
        when(col("line_no").isNotNull, struct(
          col("line_no"),
          struct(
            array(rd(bx), rd(by), rd(bw), rd(bh)).as("bbox"),
            col("class_id").as("category_id"),
            col("category_name")).as("ann"))))
      .groupBy(col("file_name"))
      .agg(transform(array_sort(collect_list(col("entry"))), e => e("ann"))
        .as("annotations"))
      .select(
        col("file_name"),
        col("annotations"),
        struct(lit("none").as("type"), lit(0).as("severity")).as("corruption"))
  }

  /** G15/S11 — one JSON document string per image. Byte-level parity with
    * Python's `json.dump(indent=2)` is out of contract (SURVEY §7.4.5);
    * values are compared parsed.
    */
  def toJsonDocs(docs: DataFrame): DataFrame =
    docs.select(col("file_name"),
      to_json(struct(col("file_name"), col("annotations"), col("corruption")))
        .as("json"))
}
