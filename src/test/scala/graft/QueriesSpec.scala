package graft

import org.apache.spark.sql.types._

/** Harness-contract checks: every query runs and returns rows at sf0.001,
  * oracle entries refer to registered queries, no hashed output carries a
  * DECIMAL column, and the flagship smoke works.
  */
class QueriesSpec extends SparkSuite {

  /** Paths of every DecimalType inside a (possibly nested) data type. The
    * driver's hasher normalizes decimal values differently across
    * duckdb/pyarrow versions (round-6 adjudication: the ONLY four red rows
    * were exactly the four queries emitting DECIMAL output columns), so the
    * standing rule is: hashed outputs are BIGINT / DOUBLE / STRING /
    * BOOLEAN (or arrays/structs thereof) only — fixed-point scaled BIGINT
    * where exactness matters.
    */
  private def decimalPaths(dt: DataType, path: String): Seq[String] =
    dt match {
      case _: DecimalType => Seq(path)
      case s: StructType =>
        s.fields.toSeq.flatMap(f => decimalPaths(f.dataType, s"$path.${f.name}"))
      case a: ArrayType => decimalPaths(a.elementType, s"$path[]")
      case m: MapType =>
        decimalPaths(m.keyType, s"$path<key>") ++
          decimalPaths(m.valueType, s"$path<value>")
      case _ => Nil
    }

  test("entry returns rows (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("queries and oracles are in exact 1:1 correspondence (no rows-only drift)") {
    // as of round 2 EVERY query is oracled; a new query without an oracle
    // (or a stale oracle for a removed query) should fail loudly here, not
    // silently downgrade the driver's check to rows-only
    assert(SparkEntry.oracleSql.keySet == SparkEntry.queries.keySet,
      s"mismatch: only-in-queries=${SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet}, " +
        s"only-in-oracles=${SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet}")
  }

  test("Tables.events normalizes ts to epoch-ns long under any parquet encoding") {
    // the testdata generator has shipped events.ts as both TIMESTAMP(NANOS)
    // (LongType under nanosAsLong) and TIMESTAMP(MICROS) (TIMESTAMP_NTZ);
    // the loader must bind to the logical type and always hand downstream
    // operators the same contract: LongType nanoseconds since epoch
    val df = Tables.events(spark, sf)
    assert(df.schema("ts").dataType.typeName == "long")
    val stats = df.agg(
      org.apache.spark.sql.functions.min("ts"),
      org.apache.spark.sql.functions.max("ts"),
      org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1))
    ).head()
    // sane epoch-ns range: 2000-01-01 .. 2200-01-01
    assert(stats.getLong(2) > 0)
    assert(stats.getLong(0) >= 946684800000000000L,
      s"min ts ${stats.getLong(0)} is below 2000-01-01 in ns — wrong unit?")
    assert(stats.getLong(1) <= 7258118400000000000L,
      s"max ts ${stats.getLong(1)} is above 2200-01-01 in ns — wrong unit?")
  }

  test("Tables.events unions a MIXED-encoding directory (ns-long + µs files)") {
    // a 100 TB lake mixes timestamp encodings across files of one table;
    // the loader must group part files by footer encoding and union the
    // normalized scans — one Spark scan cannot read both
    import spark.implicits._
    import java.nio.file.{Files, Path => JPath, StandardCopyOption}
    val root = Files.createTempDirectory("graft-mixed")
    val table = root.resolve("events.parquet")
    Files.createDirectories(table)
    val legacy = Seq(
      (1L, 1700000000000000000L, 10L, "a", 1.0, "{}"),
      (2L, 1700000001500000000L, 11L, "b", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val ldt = java.time.LocalDateTime.of(2023, 11, 14, 22, 13, 22)
    val modern = Seq((3L, ldt, 12L, "c", 3.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    def landPart(df: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      val out = root.resolve(tag)
      df.coalesce(1).write.mode("overwrite").parquet(out.toString)
      val listing = Files.list(out)
      val part =
        try listing.filter(_.getFileName.toString.endsWith(".parquet"))
          .findFirst().get()
        finally listing.close()
      Files.move(part, table.resolve(s"$tag.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    try {
      landPart(legacy, "legacy-nanos")
      landPart(modern, "reencoded-micros")
      val df = Tables.events(spark, root.toString)
      assert(df.schema("ts").dataType.typeName == "long")
      val got = df.select("event_id", "ts").as[(Long, Long)].collect().toMap
      assert(got.size == 3)
      assert(got(1L) == 1700000000000000000L && got(2L) == 1700000001500000000L)
      assert(got(3L) ==
        ldt.toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000000L)
    } finally {
      def rm(p: JPath): Unit = {
        val walk = Files.walk(p)
        try walk.sorted(java.util.Comparator.reverseOrder[JPath]())
          .forEach(f => Files.deleteIfExists(f))
        finally walk.close()
      }
      rm(root)
    }
  }

  test("Tables.events keeps Hive partition columns on the MIXED-encoding path") {
    // the mixed branch reads explicit per-encoding file lists; without
    // basePath pinned to the table root, a partitioned 100 TB events tree
    // would silently LOSE its directory partition columns there while the
    // homogeneous one-scan path kept them
    import spark.implicits._
    import java.nio.file.{Files, Path => JPath, StandardCopyOption}
    val root = Files.createTempDirectory("graft-mixed-part")
    val table = root.resolve("events.parquet")
    val legacy = Seq(
      (1L, 1700000000000000000L, 10L, "a", 1.0, "{}"),
      (2L, 1700000001500000000L, 11L, "b", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val ldt = java.time.LocalDateTime.of(2023, 11, 14, 22, 13, 22)
    val modern = Seq((3L, ldt, 12L, "c", 3.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    def landPart(df: org.apache.spark.sql.DataFrame, dir: String,
                 tag: String): Unit = {
      val stage = root.resolve(s"stage-$tag")
      df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val target = table.resolve(dir)
      Files.createDirectories(target)
      val listing = Files.list(stage)
      val part =
        try listing.filter(_.getFileName.toString.endsWith(".parquet"))
          .findFirst().get()
        finally listing.close()
      Files.move(part, target.resolve(s"$tag.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    try {
      landPart(legacy, "day=1", "legacy-nanos")
      landPart(modern, "day=2", "reencoded-micros")
      val df = Tables.events(spark, root.toString)
      assert(df.schema("ts").dataType.typeName == "long")
      assert(df.schema.fieldNames.contains("day"),
        s"partition column lost on the mixed path: ${df.schema.treeString}")
      import org.apache.spark.sql.functions.col
      val got = df.select(col("event_id"),
        col("day").cast("long"), col("ts"))
        .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
        .toMap
      assert(got.size == 3)
      assert(got(1L) == ((1L, 1700000000000000000L)))
      assert(got(2L) == ((1L, 1700000001500000000L)))
      assert(got(3L) == ((2L,
        ldt.toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000000L)))
    } finally {
      def rm(p: JPath): Unit = {
        val walk = Files.walk(p)
        try walk.sorted(java.util.Comparator.reverseOrder[JPath]())
          .forEach(f => Files.deleteIfExists(f))
        finally walk.close()
      }
      rm(root)
    }
  }

  test("Tables.events fails loudly on a non-UTC session for timestamp-encoded ts") {
    // NTZ→TIMESTAMP casting applies the session timezone; on a µs-encoded
    // file the loader must refuse a non-UTC session instead of silently
    // shifting event times. (Legacy LongType-ns files are TZ-free, so the
    // guard only applies — and this test only bites — on timestamp files.)
    val rawType = spark.read.parquet(s"$sf/events.parquet").schema("ts").dataType
    if (rawType.typeName != "long") {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      try {
        val e = intercept[IllegalArgumentException](Tables.events(spark, sf))
        assert(e.getMessage.contains("timeZone"))
      } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
      // zones EQUIVALENT to UTC are accepted (ZoneId-normalized, not a
      // string compare): "Etc/UTC" and "+00:00" are the same fixed offset
      for (tz <- Seq("Etc/UTC", "+00:00")) {
        spark.conf.set("spark.sql.session.timeZone", tz)
        try assert(
          Tables.events(spark, sf).schema("ts").dataType.typeName == "long",
          s"zone $tz spuriously rejected")
        finally spark.conf.set("spark.sql.session.timeZone", "UTC")
      }
    }
    assert(Tables.events(spark, sf).schema("ts").dataType.typeName == "long")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs, returns rows at sf0.001, and emits no DECIMAL column") {
      val df = fn(spark, sf)
      val bad = df.schema.fields.toSeq
        .flatMap(f => decimalPaths(f.dataType, f.name))
      assert(bad.isEmpty,
        s"$name hashed output carries DECIMAL at ${bad.mkString(", ")} — " +
          "driver-hasher decimal normalization is version-sensitive " +
          "(round 6); emit scaled BIGINT or DOUBLE instead")
      // plan-size regression guard (round-10 incident): an iterative
      // operator that rebinds its iterate without graft.Pin multiplies the
      // logical plan per pass — q231's unpinned 5-pass MM loop reached
      // ~10^5-10^6 nodes and Catalyst ANALYSIS alone ran >11 min, timing
      // out the driver bench (BENCH_r10 rc=124). Every sane registered
      // query analyzes to a few hundred nodes; 20k is 2 orders of margin
      // above today's max and 1+ below the failure.
      var planNodes = 0
      df.queryExecution.analyzed.foreach(_ => planNodes += 1)
      assert(planNodes < 20000,
        s"$name analyzed logical plan has $planNodes nodes (budget 20000) — " +
          "likely an unpinned iterative loop; pin the iterate each pass " +
          "with graft.Pin (see Labeling.bradleyTerry / Components)")
      // q06 (customers without orders) is legitimately empty at tiny SF
      if (name == "q06_no_orders") assert(df.count() >= 0)
      else assert(df.count() > 0, s"$name returned no rows")
    }
  }
}
