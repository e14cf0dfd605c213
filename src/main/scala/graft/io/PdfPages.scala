package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** S7 — PDF page explode (Tools/server.py:59-74, notebook `pdf_to_images`).
  *
  * Rendering is out-of-JVM (PyMuPDF equivalent unavailable; SURVEY §7.4.8) —
  * pages are *data*: this operator fans a container row out to one row per
  * page with the reference's synthetic `<stem>_page<N>` naming (1-based,
  * G12), and the render itself is a pluggable per-partition stage exactly
  * like `ext/Multimodal.decodeFeatures`. Page counts arrive either from
  * metadata or from the pluggable prober.
  */
object PdfPages {

  /** Explode container rows to page rows. `pageCount` is any Column giving
    * the number of pages (metadata column, prober output, …).
    */
  def explodePages(pdfs: DataFrame, pageCount: Column): DataFrame = {
    val stem = regexp_replace(col("file_name"), "\\.[^.]+$", "")
    pdfs
      .withColumn("page", explode(sequence(lit(1), pageCount)))
      .withColumn("page_name", concat(stem, lit("_page"), col("page")))
  }
}
