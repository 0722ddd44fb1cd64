package graft.pdf

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.hocr.Hocr
import graft.layout.{Assembly, MediaOcr, RuneIndex}

/** Distributed searchable-PDF sink: one PDF binary per document from the
  * page table (doc_id, page_idx, media_ref) — the Spark form of the
  * reference's per-document ApplyOCRToPDF loop
  * (/root/reference/pkg/pdfocr/pdfocr.go, create.go:14-65).
  *
  * Shape: one shuffle of the tiny page-ref rows onto doc_id, then each
  * document's classify -> G-13 assembly -> P-7 render runs where the doc
  * lands (the document is the reference's own unit of PDF emission; page
  * parallelism inside extraction is PagesPipeline's job). Binary columns
  * out, exactly like the multimodal featurizer's contract. */
object PdfAssemble {

  /** (doc_id, page_idx, media_ref) -> (doc_id, pdf, n_pages, err).
    * `err` carries the reference's >10%-encoding-errors gate verbatim
    * (layer.go:104-107); affected docs emit an empty binary, not a crash. */
  def run(input: DataFrame): DataFrame = {
    val s = input.sparkSession
    import s.implicits._
    input
      .select(col("doc_id").cast("string"), col("page_idx").cast("int"), col("media_ref"))
      .as[(String, Int, String)]
      .groupByKey(_._1)
      .mapGroups { (docId, it) =>
        val sorted = it.toVector.sortBy(_._2) // page order from DATA, not arrival
        val pages = sorted.zipWithIndex.map { case ((_, _, ref), i) =>
          val ocr = MediaOcr.classify(ref)
          Assembly.createHocrPage(ocr.page, new RuneIndex(ocr.text), i + 1)
        }
        val hocr = Assembly.createHocrDocument(None, pages)
        PdfRender.applyOcrPdf(hocr) match {
          case Right(r) => (docId, r.pdf, pages.length, null: String)
          case Left(e)  => (docId, Array.empty[Byte], pages.length, e)
        }
      }
      .toDF("doc_id", "pdf", "n_pages", "err")
  }
}
