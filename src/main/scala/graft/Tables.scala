package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Uniform access to the driver test tables (`/root/testdata/sf*`, see
  * TESTDATA.md). One parquet file per table; at cluster scale these would be
  * partitioned directories — the read path is identical.
  *
  * The `events.ts` column has appeared under two physical parquet encodings
  * across testdata generations: TIMESTAMP(NANOS) (reads as LongType ns under
  * `spark.sql.legacy.parquet.nanosAsLong`) and TIMESTAMP(MICROS)
  * (reads as TIMESTAMP / TIMESTAMP_NTZ). A 100 TB lake mixes encodings
  * across files, so [[Tables.events]] binds to the LOGICAL type and
  * normalizes every encoding to one canonical contract: `ts` is a LongType
  * count of NANOSECONDS since the epoch, on which all event-time operators
  * do exact integer arithmetic (the DuckDB oracle reads the same column via
  * `epoch_us(ts)`, so both sides agree in microseconds — see
  * `ext/Sessions.scala`).
  */
object Tables {
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** Row count of a table from parquet FOOTER metadata only — a driver-side
    * file-metadata read, NO Spark job. This is what operators that need a
    * plan-decision cardinality (e.g. [[ops.Percentiles.exactPercentiles]]'s
    * holistic-vs-distributed cutover) should use on a bare table scan:
    * `df.count()` at plan-construction time is a blocking distributed job
    * in the timed path, while the footer already knows the answer. At
    * cluster scale this is the same footer enumeration the scan planner
    * performs — O(files) driver work, zero executor time.
    */
  def footerRowCount(spark: SparkSession, sfDir: String, name: String): Long = {
    import org.apache.hadoop.fs.Path
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(s"$sfDir/$name.parquet")
    val fs = root.getFileSystem(conf)
    val files =
      if (fs.getFileStatus(root).isDirectory)
        fs.listStatus(root).map(_.getPath)
          .filter(p => p.getName.endsWith(".parquet"))
      else Array(root)
    files.map { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getRecordCount finally r.close()
    }.sum
  }

  /** Normalize an already-loaded events frame so `ts` is LongType
    * nanoseconds since epoch, branching on the LOGICAL type:
    *   - LongType — legacy TIMESTAMP(NANOS) read under the `nanosAsLong`
    *     builder flag (Bench / Verify / the test suite all set it for
    *     legacy-file back-compat): already ns, passed through.
    *   - TimestampType / TimestampNTZType — µs-precision timestamps:
    *     `unix_micros(cast to TIMESTAMP) * 1000L` (µs→ns is exact in int64
    *     until 2262). Casting NTZ→TIMESTAMP reinterprets the wall-clock in
    *     the session timezone, so that path is only identity under UTC; the
    *     accessor fails loudly on a misconfigured session rather than
    *     silently shifting every event time.
    *
    * The conversion is a codegen'd per-row projection fused into the scan
    * stage — no shuffle, no UDF; at 100 TB it costs one multiply per row.
    */
  private def normalizeTs(s: SparkSession, df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, unix_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType => df // legacy nanos-as-long: already the contract
      case TimestampType | TimestampNTZType =>
        require(
          s.conf.get("spark.sql.session.timeZone") == "UTC",
          "events.ts is TIMESTAMP/TIMESTAMP_NTZ: normalizing to epoch-ns " +
            "requires spark.sql.session.timeZone=UTC (NTZ→TIMESTAMP cast " +
            "applies the session zone; any other zone would silently shift " +
            "event times). Build the SparkSession with " +
            ".config(\"spark.sql.session.timeZone\", \"UTC\") " +
            "(see graft.Bench / graft.Verify builders)")
        df.withColumn("ts", unix_micros(col("ts").cast("timestamp")) * lit(1000L))
      case other =>
        sys.error(s"events.ts has unsupported type $other; expected " +
          "LongType (legacy nanos), TIMESTAMP or TIMESTAMP_NTZ")
    }
  }

  /** `ts` column normalized to LongType nanoseconds since epoch.
    *
    * A real lake mixes timestamp encodings ACROSS FILES of one table (old
    * nanos-era files next to re-encoded µs files), and one Spark scan
    * cannot read INT64-ns and TIMESTAMP columns together — so when the
    * table root is a directory, the loader groups the part files by the
    * `ts` encoding in their parquet FOOTERS (the same O(files) driver-side
    * footer enumeration the scan planner performs; cf. [[footerRowCount]])
    * and unions one normalized scan per encoding group. Homogeneous
    * directories and single files skip straight to the one-scan path; the
    * union costs nothing at scale (each file is read exactly once either
    * way, and both branches push the same projection into the scan).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val root = new Path(s"$d/events.parquet")
    val conf = s.sessionState.newHadoopConf()
    val fs = root.getFileSystem(conf)
    if (!fs.getFileStatus(root).isDirectory)
      return normalizeTs(s, t(s, d, "events"))
    val files = fs.listStatus(root).map(_.getPath)
      .filter(_.getName.endsWith(".parquet"))
    // group by the footer's ts annotation: TIMESTAMP(NANOS) / plain INT64
    // both surface as the legacy ns-long read; MICROS/MILLIS as timestamps
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
    val (nanoLong, micros) = files.partition { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        r.getFileMetaData.getSchema.getType(Seq("ts"): _*).asPrimitiveType()
          .getLogicalTypeAnnotation match {
          case ts: TimestampLogicalTypeAnnotation =>
            ts.getUnit == LogicalTypeAnnotation.TimeUnit.NANOS
          case _ => true // plain INT64: already epoch-ns longs
        }
      } finally r.close()
    }
    if (nanoLong.isEmpty || micros.isEmpty)
      normalizeTs(s, t(s, d, "events")) // homogeneous: one scan
    else
      normalizeTs(s, s.read.parquet(nanoLong.map(_.toString).toSeq: _*))
        .unionByName(
          normalizeTs(s, s.read.parquet(micros.map(_.toString).toSeq: _*)))
  }
}
