package graft

import graft.ops.Convert
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §3.1 pipeline semantics: validation filters, empty-output preservation,
  * split determinism, stats.
  */
class ConvertSpec extends SparkSuite {
  import spark.implicits._

  private val annType = ArrayType(StructType(Seq(
    StructField("bbox", ArrayType(DoubleType)),
    StructField("category_id", IntegerType),
    StructField("category_name", StringType))))

  private def annsDf(rows: (String, Seq[(Seq[Double], Int)])*) = {
    val data = rows.map { case (fn, anns) =>
      Row(fn, anns.map { case (bbox, cid) => Row(bbox, cid, "") })
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data),
      StructType(Seq(StructField("file_name", StringType),
        StructField("annotations", annType))))
  }

  private def imagesDf(rows: (String, Int, Int)*) =
    rows.toDF("file_name", "width", "height")

  test("image with no annotation doc: empty lines + missing_json flag (J1 miss)") {
    val images = imagesDf(("a.png", 100, 100), ("b.png", 100, 100))
    val anns = annsDf("a.png" -> Seq((Seq(10.0, 10.0, 20.0, 20.0), 1)))
    val r = Convert.labelLines(images, anns)
      .select("file_name", "missing_json", "n_boxes")
      .as[(String, Boolean, Int)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(r("a.png") == ((false, 1)))
    assert(r("b.png") == ((true, 0)))
  }

  test("bad bbox shape and unknown class are skipped; valid ones survive (F2/F3)") {
    val images = imagesDf(("a.png", 100, 100))
    val anns = annsDf("a.png" -> Seq(
      (Seq(10.0, 10.0, 20.0, 20.0), 1),   // valid
      (Seq(10.0, 10.0, 20.0), 2),         // 3-element bbox → skip
      (Seq(10.0, 10.0, 20.0, 20.0), 7),   // unknown class → skip
      (Seq(30.0, 30.0, 10.0, 10.0), 5)))  // valid
    val Array((lines, n)) = Convert.labelLines(images, anns)
      .select("lines", "n_boxes").as[(Seq[String], Int)].collect()
    assert(n == 2)
    assert(lines.forall(l => l.startsWith("1 ") || l.startsWith("5 ")))
  }

  test("annotation with empty list: empty label output still emitted (G14 outer)") {
    val images = imagesDf(("a.png", 100, 100))
    val anns = annsDf("a.png" -> Seq())
    val r = Convert.labelLines(images, anns).select("n_boxes").as[Int].collect()
    assert(r.sameElements(Array(0)))
  }

  test("line order follows annotation array order (A4 ordered collect)") {
    val images = imagesDf(("a.png", 1000, 1000))
    val anns = annsDf("a.png" -> (0 until 20).map(i =>
      (Seq(i * 10.0, i * 10.0, 5.0, 5.0), i % 6)))
    val Array(lines) = Convert.labelLines(images, anns)
      .select("lines").as[Seq[String]].collect()
    val classes = lines.map(_.split(" ")(0).toInt)
    assert(classes == (0 until 20).map(_ % 6))
  }

  test("hashSplit is deterministic and ~80/20 on the documents corpus") {
    val names = Tables.documents(spark, sf)
      .select(concat(lit("doc_"), col("doc_id"), lit(".png")).as("file_name"))
    val counts = names.select(Convert.hashSplit(col("file_name")).as("split"))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    val total = counts.values.sum.toDouble
    assert(counts("train") / total > 0.7 && counts("train") / total < 0.9)
    // re-evaluation gives identical assignment
    val a = names.select(col("file_name"), Convert.hashSplit(col("file_name")).as("s"))
      .as[(String, String)].collect().toMap
    val b = names.select(col("file_name"), Convert.hashSplit(col("file_name")).as("s"))
      .as[(String, String)].collect().toMap
    assert(a == b)
  }

  test("stats aggregation counts images, boxes, missing_json, splits (A1/A2)") {
    val images = imagesDf(("a.png", 100, 100), ("b.png", 100, 100), ("c.png", 100, 100))
    val anns = annsDf(
      "a.png" -> Seq((Seq(1.0, 1.0, 2.0, 2.0), 1), (Seq(3.0, 3.0, 2.0, 2.0), 2)),
      "b.png" -> Seq())
    val ds = Convert.dataset(images, anns)
    val r = Convert.stats(ds).collect()(0)
    assert(r.getAs[Long]("images") == 3)
    assert(r.getAs[Long]("boxes") == 2)
    assert(r.getAs[Long]("missing_json") == 1)
    assert(r.getAs[Long]("train_images") + r.getAs[Long]("val_images") == 3)
  }
}
