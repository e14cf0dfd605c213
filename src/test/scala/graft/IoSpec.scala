package graft

import graft.io.{AnnotationsIO, ImageMeta, LabelsIO}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path}

/** Sources/sinks: permissive JSON scan with skip counters, whitespace label
  * scan with malformed-line drops, PNG IHDR probe.
  */
class IoSpec extends SparkSuite {
  import spark.implicits._

  private def tmpDir(prefix: String): Path = {
    val d = Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit(); d
  }

  test("annotation JSON scan: corrupt docs and missing file_name skipped (S1/F1)") {
    val d = tmpDir("anns")
    Files.writeString(d.resolve("good.json"),
      """{"file_name":"a.png","annotations":[{"bbox":[1,2,3,4],"category_id":1,"category_name":""}],"corruption":{"type":"none","severity":0}}""")
    Files.writeString(d.resolve("noname.json"),
      """{"annotations":[]}""")
    Files.writeString(d.resolve("broken.json"), """{"file_name": "b.png", "annotations": [""")
    val raw = AnnotationsIO.read(spark, d.toString + "/*.json", multiLine = true)
    val valid = AnnotationsIO.validDocs(raw)
    val rows = valid.select("file_name").as[String].collect()
    assert(rows.toSeq == Seq("a.png"))
    val Array(bbox) = valid.select(col("annotations")(0)("bbox")).as[Seq[Double]].collect()
    assert(bbox == Seq(1.0, 2.0, 3.0, 4.0))
  }

  test("observe counters report skip counts without a second scan (A1/S14)") {
    val d = tmpDir("obs")
    Files.writeString(d.resolve("good.json"),
      """{"file_name":"a.png","annotations":[],"corruption":{"type":"none","severity":0}}""")
    Files.writeString(d.resolve("noname.json"), """{"annotations":[]}""")
    Files.writeString(d.resolve("broken.json"), """{"file_name": "b.png", """)
    val obs = new org.apache.spark.sql.Observation("ann_scan_test")
    val valid = AnnotationsIO.validDocs(
      AnnotationsIO.read(spark, d.toString + "/*.json"), Some(obs))
    assert(valid.count() == 1)
    val m = obs.get
    assert(m("bad_json") == 1L)
    assert(m("missing_file_name") == 1L)
  }

  test("partitioned parquet sink: split directories, readable round-trip (S9 scale form)") {
    val d = tmpDir("sink")
    val ds = Seq(("a", "train", Seq("1 0.1 0.1 0.1 0.1")),
      ("b", "val", Seq.empty[String]), ("c", "train", Seq("2 0.2 0.2 0.2 0.2")))
      .toDF("stem", "split", "lines")
    graft.io.Sinks.writeDataset(ds, d.toString + "/out")
    val back = spark.read.parquet(d.toString + "/out")
    assert(back.count() == 3)
    assert(back.filter(col("split") === "train").count() == 2)
    assert(Files.list(d.resolve("out")).toArray.map(_.toString)
      .exists(_.contains("split=train")))
  }

  test("last-wins dedup on duplicate file_name (A10)") {
    val docs = Seq(("a.png", "f1"), ("a.png", "f2"), ("b.png", "f1"))
      .toDF("file_name", "src")
    val r = AnnotationsIO.lastWins(docs, "src")
      .select("file_name", "src").as[(String, String)].collect().toMap
    assert(r == Map("a.png" -> "f2", "b.png" -> "f1"))
  }

  test("prediction label scan: 6 numeric fields enforced, blanks skipped (S5/F5/F6)") {
    val d = tmpDir("labels")
    Files.writeString(d.resolve("img1.txt"),
      """1 0.5 0.5 0.1 0.1 0.9
        |
        |2 0.4 0.4 0.2 0.2
        |x 0.1 0.1 0.1 0.1 0.5
        |3 0.3 0.3 0.1 0.1 0.7
        |""".stripMargin)
    val r = LabelsIO.readPredictions(spark, d.toString + "/*.txt")
    val rows = r.select("stem", "class_id", "confidence")
      .as[(String, Int, Double)].collect().sortBy(_._2)
    assert(rows.toSeq == Seq(("img1", 1, 0.9), ("img1", 3, 0.7)))
  }

  test("GT label scan accepts ≥5 fields, uses first five (S6/F7)") {
    val d = tmpDir("gt")
    Files.writeString(d.resolve("img2.txt"),
      """1 0.5 0.5 0.1 0.1
        |2 0.4 0.4 0.2 0.2 0.99 extra
        |3 0.3 0.3
        |""".stripMargin)
    val rows = LabelsIO.readGroundTruth(spark, d.toString + "/*.txt")
      .select("class_id").as[Int].collect().sorted
    assert(rows.toSeq == Seq(1, 2))
  }

  test("PNG IHDR probe reads dimensions without decoding (S3)") {
    // minimal PNG header: signature + IHDR length/type + 13-byte payload
    val sig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    val ihdr = Array[Byte](0, 0, 0, 13) ++ "IHDR".getBytes ++
      Array[Byte](0, 0, 2, 0) ++ // width 512
      Array[Byte](0, 0, 1, 0) ++ // height 256
      Array[Byte](8, 2, 0, 0, 0)
    val bytes = sig ++ ihdr
    val df = Seq(("f.png", bytes), ("bad.bin", Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9)))
      .toDF("path", "content")
    val probed = ImageMeta.probe(df).collect()
      .map(x => x.getString(0) -> (Option(x.get(1)), Option(x.get(2)))).toMap
    assert(probed("f.png") == ((Some(512), Some(256))))
    assert(probed("bad.bin") == ((None, None)))
  }

  test("per-image label sink writes one file per stem incl. empty (S9 parity)") {
    val d = tmpDir("out")
    val df = Seq(("a", Seq("1 0.1 0.1 0.1 0.1", "2 0.2 0.2 0.2 0.2")),
      ("b", Seq.empty[String])).toDF("stem", "lines")
    LabelsIO.writePerImage(df, d.toString)
    val a = Files.readString(d.resolve("a.txt"))
    val b = Files.readString(d.resolve("b.txt"))
    assert(a == "1 0.1 0.1 0.1 0.1\n2 0.2 0.2 0.2 0.2\n")
    assert(b == "")
  }
}
