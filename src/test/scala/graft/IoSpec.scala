package graft

import graft.io.{AnnotationsIO, CsvIO, ImageMeta, LabelsIO}
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

  test("CSV source: schema'd read, quarantine split, observe tallies, round-trip") {
    import org.apache.spark.sql.types._
    val d = tmpDir("csv")
    Files.writeString(d.resolve("part1.csv"),
      "id,name,score\n1,alpha,2.5\n2,beta,oops\n3,gamma,4.0\n")
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType), StructField("score", DoubleType)))
    val raw = CsvIO.read(spark, d.toString, schema).cache()
    val obs = org.apache.spark.sql.Observation("csv")
    val clean = CsvIO.valid(raw, Some(obs))
    val rows = clean.as[(Long, String, Double)].collect().sortBy(_._1)
    assert(rows.toSeq === Seq((1L, "alpha", 2.5), (3L, "gamma", 4.0)))
    assert(obs.get("bad_rows") === 1L && obs.get("total_rows") === 3L)
    val quarantined = CsvIO.quarantine(raw).as[String].collect()
    assert(quarantined.toSeq === Seq("2,beta,oops"))
    // round-trip through the sink preserves values and schema
    val out = tmpDir("csvout")
    CsvIO.write(clean, out.toString)
    val back = CsvIO.read(spark, out.toString, schema)
    assert(CsvIO.valid(back).as[(Long, String, Double)].collect().sorted
      === rows.toSeq.sorted)
    raw.unpersist()
    // quarantine on a FRESH (uncached) read must not hit SPARK-21610 —
    // the corrupt-only-column AnalysisException on raw CSV scans
    val fresh = CsvIO.read(spark, d.toString, schema)
    assert(CsvIO.quarantine(fresh).as[String].collect().toSeq
      === Seq("2,beta,oops"))
    fresh.unpersist()
  }

  test("ORC source/sink: round-trip preserves values; filters push into the ORC scan") {
    val d = tmpDir("orc")
    val src = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    src.write.mode("overwrite").orc(d.toString)
    val back = spark.read.orc(d.toString)
    assert(back.count() === src.count())
    val a = src.as[(Long, Int, Double, String)].collect().sorted.toSeq
    val b = back.as[(Long, Int, Double, String)].collect().sorted.toSeq
    assert(a === b)
    // predicate pushdown reaches the ORC scan, same contract as parquet
    val p = back.filter(col("l_quantity") >= 30.0)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("PushedFilters") && p.contains("l_quantity"),
      s"ORC scan must receive the pushed predicate:\n$p")
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

  test("z-value interleaves bits; z-ordered write narrows per-file ranges") {
    import graft.functions.ZOrder.zValue
    // hand-checked Morton codes: z(1,0)=1, z(0,1)=2, z(3,3)=15, z(2,1)=6
    val z = Seq((1L, 0L), (0L, 1L), (3L, 3L), (2L, 1L)).toDF("a", "b")
      .select(zValue(col("a"), col("b")).as("z")).as[Long].collect().toSeq
    assert(z === Seq(1L, 2L, 15L, 6L))
    // locality: sort 32×32 grid by z; per-file ranges shrink in BOTH dims
    val d = tmpDir("zord")
    val grid = spark.range(1024).select(
      (col("id") % 32).as("x"), expr("id div 32").as("y"))
    graft.io.Sinks.writeZOrdered(grid, d.toString + "/out", "x", "y", files = 16)
    val perFile = spark.read.parquet(d.toString + "/out")
      .groupBy(input_file_name().as("f"))
      .agg((max(col("x")) - min(col("x"))).as("xr"),
        (max(col("y")) - min(col("y"))).as("yr"),
        count(lit(1)).as("n"))
      .as[(String, Long, Long, Long)].collect()
    assert(perFile.map(_._4).sum === 1024L)
    // a 1024-row/16-file z-layout keeps most files within half the 0..31
    // extent in both dimensions (a random layout would be ~31 everywhere);
    // files straddling a major Morton-tile transition may span wider, so
    // allow a couple of exceptions
    val tight = perFile.count(f => f._2 <= 15 && f._3 <= 15)
    assert(tight >= perFile.length - 3,
      s"only $tight/${perFile.length} tight files:\n${perFile.mkString("\n")}")
  }

  test("compaction rewrites many small files into the size-targeted few") {
    val d = tmpDir("compact")
    val src = d.toString + "/in"
    val out = d.toString + "/out"
    Tables.lineitem(spark, sf).repartition(50).write.parquet(src)
    def files(p: String) = new java.io.File(p).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files(src) == 50)
    graft.io.Sinks.compact(spark, src, out, targetFileBytes = 1L * 1024 * 1024)
    assert(files(out) < 10, s"expected few files, got ${files(out)}")
    assert(spark.read.parquet(out).count() ===
      Tables.lineitem(spark, sf).count())
    // size bounds: no output file exceeds ~2× the target (parquet encoding
    // vs the optimizer's in-memory estimate allows slack, but compaction
    // must not produce one giant file) and the small-file problem is gone
    // (every file but the remainder is ≥ 1/8 of target)
    val sizes = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sorted
    assert(sizes.forall(_ <= 2L * 1024 * 1024),
      s"oversized output file: ${sizes.mkString(",")}")
    assert(sizes.dropRight(1).forall(_ >= 128L * 1024) || sizes.length == 1,
      s"still-tiny output files: ${sizes.mkString(",")}")
  }

  test("S10 image copy sink: binary passthrough round-trip with observe counters") {
    val d = tmpDir("imgcopy")
    val png = {
      val img = new java.awt.image.BufferedImage(
        12, 10, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out); out.toByteArray
    }
    val src = Seq(
      ("train", "a.png", png),
      ("train", "b.png", Array[Byte](1, 2, 3)),
      ("val", "c.png", png)).toDF("split", "file_name", "content")
    val (nFiles, nBytes) = LabelsIO.copyImages(src, d.toString)
    assert(nFiles == 3L)
    assert(nBytes == 2L * png.length + 3)
    // byte-identical copies in the reference's images/<split>/ layout
    val a = Files.readAllBytes(d.resolve("images/train/a.png"))
    val b = Files.readAllBytes(d.resolve("images/train/b.png"))
    val c = Files.readAllBytes(d.resolve("images/val/c.png"))
    assert(java.util.Arrays.equals(a, png) && java.util.Arrays.equals(c, png))
    assert(b.toSeq == Seq[Byte](1, 2, 3))
  }

  test("z-ordered layout + stats manifest: 2-D selective filter skips most files") {
    val d = tmpDir("zskip")
    val out = d.toString + "/out"
    // 64×64 grid z-ordered into 16 files: a point-ish predicate on BOTH
    // dims should land in very few Morton tiles
    val grid = spark.range(4096).select(
      (col("id") % 64).as("x"), expr("id div 64").as("y"))
    graft.io.Sinks.writeZOrdered(grid, out, "x", "y", files = 16)
    val manifest = graft.io.Sinks.statsManifest(spark, out, Seq("x", "y")).cache()
    val total = manifest.count()
    assert(total >= 12, s"expected ~16 files, got $total")
    val keep = graft.io.Sinks.filesOverlapping(
      manifest, Map("x" -> ((3L, 6L)), "y" -> ((3L, 6L))))
    assert(keep.nonEmpty && keep.size * 4 <= total,
      s"z-order should skip ≥75% of files: kept ${keep.size}/$total")
    // the pruned read returns exactly the full-scan answer
    val pruned = spark.read.parquet(keep: _*)
      .filter(col("x").between(3, 6) && col("y").between(3, 6))
    val full = spark.read.parquet(out)
      .filter(col("x").between(3, 6) && col("y").between(3, 6))
    assert(pruned.count() == 16 && full.count() == 16)
    // contrast: the same manifest over a row-major (x-sorted) layout prunes
    // on x but NOT on y — the measured reason z-order exists
    val rowMajor = d.toString + "/rowmajor"
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x", "y")
      .write.parquet(rowMajor)
    val m2 = graft.io.Sinks.statsManifest(spark, rowMajor, Seq("x", "y"))
    val keepY = graft.io.Sinks.filesOverlapping(m2, Map("y" -> ((3L, 6L))))
    assert(keepY.size >= m2.count() * 3 / 4,
      s"row-major layout unexpectedly pruned on y: ${keepY.size}")
  }
}
