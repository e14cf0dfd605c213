package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Uniform access to the driver test tables (`/root/testdata/sf*`, see
  * TESTDATA.md). One parquet file per table; at cluster scale these would be
  * partitioned directories — the read path is identical.
  *
  * The `events` table carries TIMESTAMP(NANOS) which Spark 4 refuses by
  * default; [[Tables.events]] reads it as raw nanosecond longs
  * (`spark.sql.legacy.parquet.nanosAsLong`), which is also what we want for
  * exact integer event-time arithmetic (the DuckDB oracle truncates the same
  * column to microseconds, so downstream code works in microseconds — see
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

  /** `ts` column is LongType nanoseconds since epoch (see class doc).
    *
    * The nanos-as-long flag must be set at session BUILD time (Bench, Verify
    * and the test suite all do); setting it here as a read side effect would
    * mutate shared session state behind concurrent users' backs, so instead
    * the accessor fails loudly with the fix when the flag is absent.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    require(
      s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
      "events.parquet carries TIMESTAMP(NANOS): build the SparkSession with " +
        ".config(\"spark.sql.legacy.parquet.nanosAsLong\", \"true\") " +
        "(see graft.Bench / graft.Verify builders)")
    t(s, d, "events")
  }
}
