package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** CSV source with the same quarantine discipline as the JSON reader
  * ([[AnnotationsIO]]): explicit schema (no inference pass over 100 TB),
  * PERMISSIVE parse with a corrupt-record column, and `observe` counters so
  * bad-row tallies cost no second scan. CSV is splittable when uncompressed
  * or zstd/bzip2-framed, so the scan parallelizes like any text source; a
  * schema mismatch lands in the quarantine frame instead of failing the job
  * (ANSI-mode casts THROW — quarantine-then-cast is the safe order).
  */
object CsvIO {

  /** Read CSV files under `path` with `schema` + a trailing string
    * `_corrupt_record` column populated for rows that fail to parse.
    */
  def read(spark: SparkSession, path: String, schema: StructType,
           header: Boolean = true, sep: String = ","): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", "string"))
      .option("header", header)
      .option("sep", sep)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)

  /** Split a permissive read into the clean frame (corrupt column dropped)
    * while tallying rejects into an observation — mirror of
    * [[AnnotationsIO.validDocs]].
    */
  def valid(raw: DataFrame,
            obs: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    val counters = Seq(
      sum(when(col("_corrupt_record").isNotNull, 1L).otherwise(0L))
        .as("bad_rows"),
      count(lit(1)).as("total_rows"))
    val observed = obs match {
      case Some(o) => raw.observe(o, counters.head, counters.tail: _*)
      case None    => raw.observe("csv_scan", counters.head, counters.tail: _*)
    }
    observed.filter(col("_corrupt_record").isNull).drop("_corrupt_record")
  }

  /** The rejected rows, raw text preserved for replay/debugging — the
    * quarantine side of [[valid]] (separate scan branch; both ride one
    * cached read in a caller that needs the two together).
    *
    * Self-defending: since Spark 2.3 a query whose only referenced column
    * on a FRESH CSV scan is the internal corrupt-record column throws
    * AnalysisException (SPARK-21610) — from-cache scans are exempt, so an
    * uncached input is cached here (a no-op for callers already on the
    * documented cache-then-split pattern; the cache is the two-branch
    * read's working set either way).
    */
  def quarantine(raw: DataFrame): DataFrame = {
    val src =
      if (raw.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
        raw.cache()
      else raw
    src.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("raw_line"))
  }

  /** Write a DataFrame as headered CSV (round-trip partner of [[read]]). */
  def write(df: DataFrame, path: String, sep: String = ","): Unit =
    df.write.mode("overwrite").option("header", true).option("sep", sep)
      .csv(path)
}
