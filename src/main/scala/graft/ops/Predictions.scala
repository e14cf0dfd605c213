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

  /** G15/S11 — one JSON document string per image, via Spark's codegen'd
    * `to_json` (the scale sink). Byte-level parity with Python's
    * `json.dump(indent=2)` is out of THIS form's contract (SURVEY
    * §7.4.5); values are compared parsed. For the byte contract, see
    * [[toJsonDocsExact]].
    */
  def toJsonDocs(docs: DataFrame): DataFrame =
    docs.select(col("file_name"),
      to_json(struct(col("file_name"), col("annotations"), col("corruption")))
        .as("json"))

  /** The BYTE-exact sink (closing SURVEY §7.4.5's last parity cut): each
    * document serialized exactly as the reference's
    * `json.dump(data, ensure_ascii=False, indent=2)`
    * (predictions_to_json.py:151-155) — indent layout, separators,
    * shortest-round-trip float repr, escaping — via
    * [[graft.functions.PyJson]]. Runs as a per-row `map` over the typed
    * rows (string assembly, no shuffle); EndToEndSpec byte-diffs it
    * against goldens produced by the real `json.dumps`. Use
    * [[toJsonDocs]] when parsed-value parity suffices — `to_json` stays
    * inside codegen.
    *
    * CPython type-leak, replicated (the byte golden caught it): in
    * `yolo_to_bbox_abs` (predictions_to_json.py:62-72) `min(x_min,
    * img_w)` returns the INT bound when it clips, and ints serialize
    * without the `.0` — so a fully-out-of-range box emits
    * `"bbox": [640, ...]`. Tracing the reference's max/min type flow:
    * only bbox[0]/bbox[1] can become ints (clip to img_w/img_h); bw/bh
    * NEVER do (an int width-remainder bound is only ever 0, and Python's
    * `max(0.0, 0)` tie returns its float first argument). Hence `images`
    * (file_name, width, height) is a parameter: bbox[0] serializes as
    * int iff it equals the width, bbox[1] iff it equals the height.
    * Envelope caveat: an UNCLIPPED box edge landing exactly on the bound
    * (x_min_f == img_w, a float in Python) is indistinguishable from the
    * clip and serializes as int here — measure-zero under any continuous
    * coordinate source.
    */
  def toJsonDocsExact(docs: DataFrame, images: DataFrame): DataFrame = {
    import graft.functions.PyJson._
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .join(broadcast(images.select(col("file_name"),
        col("width").cast("double").as("w"),
        col("height").cast("double").as("h"))), Seq("file_name"))
      .select(col("file_name"), col("w"), col("h"),
        transform(col("annotations"), a => struct(
          a("bbox").as("bbox"),
          a("category_id").cast("long").as("category_id"),
          a("category_name").as("category_name"))).as("anns"),
        col("corruption.type").as("ctype"),
        col("corruption.severity").cast("long").as("csev"))
      .as[(String, Double, Double,
        Seq[(Seq[Double], Long, String)], String, Long)]
      .map { case (fn, w, h, anns, ctype, csev) =>
        def num(v: Double, bound: Double): J =
          if (v == bound) JInt(v.toLong) else JFloat(v)
        val doc = JObj(Seq(
          "file_name" -> JStr(fn),
          "annotations" -> JArr(anns.map { case (bbox, cid, cname) =>
            JObj(Seq(
              "bbox" -> JArr(Seq(num(bbox(0), w), num(bbox(1), h),
                JFloat(bbox(2)), JFloat(bbox(3)))),
              "category_id" -> JInt(cid),
              "category_name" -> JStr(cname)))
          }),
          "corruption" -> JObj(Seq(
            "type" -> JStr(ctype), "severity" -> JInt(csev)))))
        (fn, dumps(doc))
      }
      .toDF("file_name", "json")
  }
}
