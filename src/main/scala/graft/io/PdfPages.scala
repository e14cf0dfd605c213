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

  /** A page renderer maps (file_name, page, container bytes) → page PNG. */
  type Renderer = (String, Int, Array[Byte]) => Array[Byte]

  /** Render each exploded page to a PNG, batch-shaped like
    * `Multimodal.decodeFeatures`: renderer init is per-partition (a real
    * PDF engine opens the document once per partition and rasterizes pages
    * from it). `pdfs` must carry (file_name, content) container rows.
    */
  def renderPages(pdfs: DataFrame, pageCount: Column,
                  render: Renderer): DataFrame = {
    val spark = pdfs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    explodePages(pdfs, pageCount)
      .select(col("file_name"), col("page").cast("int"), col("page_name"),
        col("content"))
      .as[(String, Int, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (fn, page, pageName, bytes) =>
          val content = if (bytes == null) Array.emptyByteArray else bytes
          (fn, page, pageName, render(fn, page, content))
        }
      }
      .toDF("file_name", "page", "page_name", "page_png")
  }

  /** Non-stub fixture renderer: produces REAL PNGs (encoded by the JDK's
    * ImageIO) whose pixels are a deterministic function of (file_name, page,
    * container bytes) — the same contract a PyMuPDF-class rasterizer
    * fulfills, so the seam (schema, batching, decodability of the output) is
    * exercised end-to-end without shipping a PDF engine. Output pages decode
    * back through `Multimodal.imageIoDecode` and probe correctly via
    * `ImageMeta.pngWidth/pngHeight`.
    */
  def pngFixtureRenderer(width: Int = 40, height: Int = 30): Renderer =
    (fileName, page, bytes) => {
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val seed = fileName.hashCode * 31 + page * 7 + bytes.length
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          img.setRGB(x, y, (seed + x * 13 + y * 101) & 0xffffff)
          x += 1
        }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
}
