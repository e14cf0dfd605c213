package graft.io

import graft.schema.Schemas
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S1/S11 — annotation-document JSON source and sink.
  *
  * Reference scan: converter_to_yolo_data.py:65-78 — parse each file, skip
  * unparseable JSON and docs without `file_name`, with a warning. Spark
  * equivalent: schema'd PERMISSIVE read with a corrupt-record column
  * (`wholeFile` per-doc JSON), then F1 filter; the skip counts the reference
  * prints are recoverable via `observe` metrics instead of a second scan.
  *
  * Scale note: an explicit schema means no inference pass over 100 TB, and
  * `multiLine=false` (JSONL) stays splittable; the per-file layout of the
  * reference is preserved only at the edge via `input_file_name`.
  */
object AnnotationsIO {

  /** Read a directory of per-document annotation JSON files (or JSONL). */
  def read(spark: SparkSession, path: String, multiLine: Boolean = true): DataFrame =
    spark.read
      .schema(Schemas.annotationDocPermissive)
      .option("multiLine", multiLine)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** F1 — keep only well-formed docs that carry a join key; tally the rest
    * into observed metrics (`bad_json`, `missing_file_name`) so stats match
    * the reference's warn-and-skip counters without a second scan. Pass an
    * [[org.apache.spark.sql.Observation]] to read the counters after the
    * first action (see IoSpec).
    */
  def validDocs(raw: DataFrame,
                obs: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    val counters = Seq(
      sum(when(col("_corrupt_record").isNotNull, 1L).otherwise(0L)).as("bad_json"),
      sum(when(col("_corrupt_record").isNull && col("file_name").isNull, 1L)
        .otherwise(0L)).as("missing_file_name"))
    val observed = obs match {
      case Some(o) => raw.observe(o, counters.head, counters.tail: _*)
      case None    => raw.observe("ann_scan", counters.head, counters.tail: _*)
    }
    observed
      .filter(col("_corrupt_record").isNull && col("file_name").isNotNull)
      .drop("_corrupt_record")
  }

  /** A10 — last-wins dedup when two docs claim the same `file_name` (the
    * reference's sorted-glob dict overwrite ⇒ lexicographically last source
    * file wins). `orderCol` is typically `input_file_name()`.
    */
  def lastWins(docs: DataFrame, orderCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    docs
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("file_name")).orderBy(col(orderCol).desc)))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
