package graft

import graft.io.PdfPages
import org.apache.spark.sql.functions._

class PdfPagesSpec extends SparkSuite {
  import spark.implicits._

  test("explodePages: one row per page with reference _page<N> naming (S7/G12)") {
    val pdfs = Seq(("report.pdf", 3), ("single.pdf", 1)).toDF("file_name", "n_pages")
    val r = PdfPages.explodePages(pdfs, col("n_pages"))
      .select("page_name").as[String].collect().sorted
    assert(r.toSeq == Seq("report_page1", "report_page2", "report_page3",
      "single_page1"))
  }
}
