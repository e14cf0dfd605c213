package graft

import graft.io.{AnnotationsIO, ImageMeta}
import graft.ops.{Convert, EvalPipeline}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path}

/** End-to-end flows through the REAL IO paths:
  *  - Convert over the actual reference corpus (JSON scan + PNG binary probe)
  *    vs the golden fixtures generated from the reference's own logic;
  *  - EvalPipeline from label files on disk → P/R/F1.
  */
class EndToEndSpec extends SparkSuite {
  import spark.implicits._

  test("Convert over real reference corpus files matches goldens (S1+S3+full DAG)") {
    // first 100 docs via glob; goldens cover a subset of these
    val anns = AnnotationsIO.validDocs(AnnotationsIO.read(
      spark, "/root/reference/raw_data/jsons/doc_000*.json"))
    val images = ImageMeta.probe(ImageMeta.readBinary(
      spark, "/root/reference/raw_data/images/doc_000*.png"))
    assert(images.filter(col("width").isNull).count() == 0)

    val got = Convert.labelLines(images, anns)
      .select(col("file_name"), col("lines"))
      .as[(String, Seq[String])].collect().toMap

    val golden = spark.read.option("multiLine", true)
      .json(resource("/golden/convert_labels.json"))
      .select(col("file_name"), col("lines"))
      .as[(String, Seq[String])].collect().toMap

    val common = got.keySet intersect golden.keySet
    assert(common.size >= 40, s"only ${common.size} overlapping docs")
    for (fn <- common) assert(got(fn) == golden(fn), s"doc $fn")
  }

  private def tmpDir(prefix: String): Path = {
    val d = Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit(); d
  }

  test("Predictions over synthesized label files matches the reference converter's docs") {
    val golden = spark.read.option("multiLine", true)
      .json(resource("/golden/predictions_docs.json")).cache()
    // materialize the label files exactly as fixtures prescribe
    val dir = tmpDir("predlabels")
    golden.select("stem", "label_text").as[(String, String)].collect()
      .foreach { case (stem, text) =>
        Files.writeString(dir.resolve(s"$stem.txt"), text)
      }
    val images = golden.select(col("file_name"), col("width"), col("height"))
    val preds = io.LabelsIO.readPredictions(spark, dir.toString + "/*.txt")
    val got = ops.Predictions.documents(images, preds, confThr = 0.25, roundDp = 2)
      .select(col("file_name"),
        transform(col("annotations"), a => struct(
          a("bbox").as("bbox"), a("category_id").cast("long").as("category_id"),
          a("category_name").as("category_name"))).as("anns"),
        col("corruption.type").as("ctype"), col("corruption.severity").as("csev"))
      .as[(String, Seq[(Seq[Double], Long, String)], String, Int)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val want = golden
      .select(col("file_name"),
        transform(col("expected.annotations"), a => struct(
          a("bbox").as("bbox"), a("category_id").as("category_id"),
          a("category_name").as("category_name"))).as("anns"),
        col("expected.corruption.type").as("ctype"),
        col("expected.corruption.severity").as("csev"))
      .as[(String, Seq[(Seq[Double], Long, String)], String, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4.toInt))).toMap
    assert(got.keySet == want.keySet)
    for ((fn, w) <- want) assert(got(fn) == w, s"image $fn")
  }

  test("toJsonDocsExact is BYTE-identical to the reference's json.dump(indent=2)") {
    // the goldens carry the literal string json.dumps(expected,
    // ensure_ascii=False, indent=2) produced — the S11 byte contract
    // (SURVEY §7.4.5's last parity cut, now closed)
    val golden = spark.read.option("multiLine", true)
      .json(resource("/golden/predictions_docs.json")).cache()
    val dir = tmpDir("jsonbytes")
    golden.select("stem", "label_text").as[(String, String)].collect()
      .foreach { case (stem, text) =>
        Files.writeString(dir.resolve(s"$stem.txt"), text)
      }
    val images = golden.select(col("file_name"), col("width"), col("height"))
    val preds = io.LabelsIO.readPredictions(spark, dir.toString + "/*.txt")
    val got = ops.Predictions.toJsonDocsExact(
      ops.Predictions.documents(images, preds, confThr = 0.25, roundDp = 2),
      images)
      .as[(String, String)].collect().toMap
    val want = golden.select("file_name", "expected_json")
      .as[(String, String)].collect().toMap
    assert(got.keySet == want.keySet)
    for ((fn, w) <- want)
      assert(got(fn) == w, s"byte diff for $fn:\n-- got --\n${got(fn)}\n" +
        s"-- want --\n$w")
    // the byte form parses back to the value form the parsed-parity sink
    // emits (the two sinks agree on content, differ only in layout)
    val parsed = got.values.count(_.contains("\"corruption\": {"))
    assert(parsed == got.size)
  }

  test("EvalPipeline: label files on disk → greedy match → P/R/F1 rollup") {
    val gt = tmpDir("gt"); val pred = tmpDir("pred")
    // page p1: one perfect match (cls 1), one miss (cls 2 vs nothing)
    Files.writeString(gt.resolve("p1.txt"),
      "1 0.500000 0.500000 0.200000 0.200000\n")
    Files.writeString(pred.resolve("p1.txt"),
      "1 0.500000 0.500000 0.200000 0.200000 0.90\n" +
      "2 0.100000 0.100000 0.050000 0.050000 0.80\n" +
      "1 0.900000 0.900000 0.050000 0.050000 0.10\n")  // below conf thr
    // page p2: GT only → FN
    Files.writeString(gt.resolve("p2.txt"),
      "3 0.300000 0.300000 0.100000 0.100000\n")
    Files.writeString(pred.resolve("p2.txt"), "")

    val dims = Seq(("p1", 1000, 1000), ("p2", 1000, 1000))
      .toDF("stem", "width", "height")
    val r = EvalPipeline.evaluate(spark,
        pred.toString + "/*.txt", gt.toString + "/*.txt", dims)
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap

    assert(r("1") == ((1L, 0L, 0L)))   // tp, fp, fn
    assert(r("2") == ((0L, 1L, 0L)))
    assert(r("3") == ((0L, 0L, 1L)))
    assert(r("ALL") == ((1L, 1L, 1L)))
  }

  test("EvalPipeline pageRecords covers ALL pages incl. boxless ones (all_pred_records)") {
    val gt = tmpDir("gt2"); val pred = tmpDir("pred2")
    Files.writeString(gt.resolve("q.txt"), "1 0.5 0.5 0.2 0.2\n")
    Files.writeString(pred.resolve("q.txt"), "1 0.5 0.5 0.2 0.2 0.9\n")
    // page "empty" has dims but no label files at all → all-zero record
    val dims = Seq(("q", 100, 100), ("empty", 100, 100))
      .toDF("stem", "width", "height")
    val rows = EvalPipeline.pageRecords(spark,
      pred.toString + "/*.txt", gt.toString + "/*.txt", dims).collect()
      .map(r => r.getAs[String]("file_name") ->
        ((r.getAs[Long]("num_predictions"), r.getAs[Long]("tp"),
          r.getAs[Long]("fp"), r.getAs[Long]("fn")))).toMap
    assert(rows("q") == ((1L, 1L, 0L, 0L)))
    assert(rows("empty") == ((0L, 0L, 0L, 0L)))
  }
}
