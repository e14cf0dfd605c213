package graft

import graft.ops.Predictions
import org.apache.spark.sql.functions._

/** §3.2 pipeline semantics: confidence/class filters, missing-label-file
  * empties, ordered nested assembly, HALF_EVEN rounding, taxonomy enrich,
  * constant corruption struct.
  */
class PredictionsSpec extends SparkSuite {
  import spark.implicits._

  private def predsDf(rows: (String, Long, Int, Double, Double, Double, Double, Double)*) =
    rows.toDF("stem", "line_no", "class_id", "x_center", "y_center",
      "width", "height", "confidence")

  private def imagesDf(rows: (String, Int, Int)*) =
    rows.toDF("file_name", "width", "height")

  test("confidence below threshold and unknown classes are dropped (F4/F3)") {
    val images = imagesDf(("a.png", 1000, 1000))
    val preds = predsDf(
      ("a", 0, 1, 0.5, 0.5, 0.1, 0.1, 0.9),    // kept
      ("a", 1, 1, 0.5, 0.5, 0.1, 0.1, 0.2),    // conf < 0.25 → dropped
      ("a", 2, 9, 0.5, 0.5, 0.1, 0.1, 0.9),    // unknown class → dropped
      ("a", 3, 1, 0.5, 0.5, 0.1, 0.1, 0.25))   // conf == thr → kept (>=)
    val Array(n) = Predictions.documents(images, preds)
      .select(size(col("annotations"))).as[Int].collect()
    assert(n == 2)
  }

  test("image with no label rows gets an empty annotations array (J2 miss)") {
    val images = imagesDf(("a.png", 100, 100), ("b.png", 100, 100))
    val preds = predsDf(("a", 0, 1, 0.5, 0.5, 0.2, 0.2, 0.9))
    val r = Predictions.documents(images, preds)
      .select(col("file_name"), size(col("annotations")).as("n"))
      .as[(String, Int)].collect().toMap
    assert(r == Map("a.png" -> 1, "b.png" -> 0))
  }

  test("annotations preserve label-file line order (A4)") {
    val images = imagesDf(("a.png", 1000, 1000))
    val preds = predsDf((0 until 10).map(i =>
      ("a", i.toLong, i % 6 match { case 0 => 1; case c => c },
        0.5, 0.5, 0.1, 0.1, 0.9)): _*)
    val Array(cats) = Predictions.documents(images, preds)
      .select(transform(col("annotations"), a => a("category_id")).as("c"))
      .as[Seq[Int]].collect()
    assert(cats == (0 until 10).map(i => i % 6 match { case 0 => 1; case c => c }))
  }

  test("bbox is norm→abs, clipped, and HALF_EVEN-rounded to 2dp (G3/G8)") {
    val images = imagesDf(("a.png", 100, 200))
    // xc=0.5,w=0.25 on W=100 → x=37.5, bw=25; yc near edge to exercise clip
    val preds = predsDf(("a", 0, 1, 0.5, 0.99, 0.25, 0.1, 0.9))
    val Array(bbox) = Predictions.documents(images, preds)
      .select(col("annotations")(0)("bbox")).as[Seq[Double]].collect()
    assert(bbox(0) == 37.5)
    assert(bbox(1) == 188.0)          // (0.99-0.05)*200 = 188
    assert(bbox(2) == 25.0)
    assert(bbox(3) == 12.0)           // clip: min(20, 200-188) = 12
  }

  test("category_name from broadcast taxonomy; corruption constant (J3/G13)") {
    val images = imagesDf(("a.png", 100, 100))
    val preds = predsDf(
      ("a", 0, 4, 0.5, 0.5, 0.2, 0.2, 0.9),
      ("a", 1, 5, 0.5, 0.5, 0.2, 0.2, 0.9))
    val df = Predictions.documents(images, preds)
    val Array((names, ctype, sev)) = df.select(
      transform(col("annotations"), a => a("category_name")).as("n"),
      col("corruption.type"), col("corruption.severity"))
      .as[(Seq[String], String, Int)].collect()
    assert(names == Seq("Table", "Figure"))
    assert(ctype == "none" && sev == 0)
  }

  test("toJsonDocs emits parseable documents with the reference schema") {
    val images = imagesDf(("a.png", 100, 100))
    val preds = predsDf(("a", 0, 1, 0.5, 0.5, 0.2, 0.2, 0.9))
    val Array(js) = Predictions.toJsonDocs(Predictions.documents(images, preds))
      .select("json").as[String].collect()
    assert(js.contains(""""file_name":"a.png""""))
    assert(js.contains(""""category_name":"Text""""))
    assert(js.contains(""""corruption":{"type":"none","severity":0}"""))
  }
}
