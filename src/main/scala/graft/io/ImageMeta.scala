package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S2/S3/S4 — binary image source + dimension probe.
  *
  * Reference probes only `(width, height)` via PIL (converter_to_yolo_data
  * .py:152-154). For PNG that is 8 bytes of the IHDR chunk (big-endian at
  * offsets 16..23) — no full decode. Implemented with built-in expressions
  * (`substring` on binary → `hex` → `conv`) so it codegens; no UDF, no
  * image library, and only the first row-group bytes of each file matter.
  *
  * Scale note: `binaryFile` loads whole files; when only dimensions are
  * needed at 100 TB, pair this with a manifest scan or store dims as parquet
  * metadata at ingest. The probe itself is O(1) per file either way.
  */
object ImageMeta {

  /** Read a directory of images as (path, modificationTime, length, content). */
  def readBinary(spark: SparkSession, glob: String): DataFrame =
    spark.read.format("binaryFile").load(glob)

  private def beInt(content: Column, offset1Based: Int): Column =
    conv(hex(substring(content, offset1Based, 4)), 16, 10).cast("int")

  /** PNG IHDR width (bytes 16-19, 0-based) — null if not a PNG signature. */
  def pngWidth(content: Column): Column =
    when(isPng(content), beInt(content, 17)).otherwise(lit(null))

  /** PNG IHDR height (bytes 20-23, 0-based). */
  def pngHeight(content: Column): Column =
    when(isPng(content), beInt(content, 21)).otherwise(lit(null))

  /** PNG 8-byte signature check. */
  def isPng(content: Column): Column =
    hex(substring(content, 1, 8)) === lit("89504E470D0A1A0A")

  /** Probe rows: file_name, width, height; unreadable images become nulls so
    * the caller can apply the reference's row-drop (F8) while counting drops.
    */
  def probe(images: DataFrame): DataFrame =
    images.select(
      regexp_extract(col("path"), "([^/]+)$", 1).as("file_name"),
      pngWidth(col("content")).as("width"),
      pngHeight(col("content")).as("height"))
}
