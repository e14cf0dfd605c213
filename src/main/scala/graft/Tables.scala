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

  /** `ts` column normalized to LongType nanoseconds since epoch (class doc).
    *
    * Encoding-adaptive on the LOGICAL type of the stored column:
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
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, unix_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val df = t(s, d, "events")
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
}
