package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.hocr.{Hocr, HocrRender, HocrText}
import graft.layout.{Assembly, MediaOcr, RuneIndex}

/** The page-parallel document pipeline — the distributed generalization
  * of DocumentHOCRFromPages (/root/reference/pkg/gdocai/gdocai.go:72-147),
  * the reference's own statement of its parallel decomposition: pages are
  * processed independently, page numbers come from INPUT ORDER (i+1),
  * page texts join with "\n\n", and the combined doc is assembled with
  * CreateHOCRDocument(nil, pages...) then rendered.
  *
  * Input: one row per page, (doc_id, page_idx, media_ref) — the page
  * payload is addressed by media_ref and classified by the deterministic
  * layout classifier (the gRPC boundary G-22 replaced, north rule).
  *
  * Spark shape: per-page map (embarrassingly parallel, zero shuffle) ->
  * groupBy(doc_id) ordered reduce (one shuffle). The per-page stage emits
  * the page's rendered hOCR page-fragment data as a struct; the reduce
  * re-sorts by page_idx (never by arrival order) and stitches.
  */
object PagesPipeline {

  final case class PageResult(pageText: String, extractedText: String)

  /** Per-page work: classify -> G-13 assembly -> per-page stitch.
    * Returns (pageText, reading-order text) — exactly the fields the
    * reduce consumes. (An earlier version also rendered the full hOCR
    * page fragment per page; nothing read it, and Spark cannot prune
    * fields out of an opaque UDF, so the render cost was paid on every
    * benchmarked page for nothing. The byte-parity renderer keeps its
    * own round-trip pins in HocrRenderSpec.) */
  private val processPageUdf = udf((mediaRef: String, pageNum: Int) => {
    val ocr = MediaOcr.classify(mediaRef)
    val page = Assembly.createHocrPage(ocr.page, new RuneIndex(ocr.text), pageNum)
    val singlePage = Hocr(pages = Vector(page))
    PageResult(ocr.text, HocrText.extractText(singlePage))
  })

  /** Full job: (doc_id, page_idx, media_ref) ->
    * (doc_id, n_pages, full_text, doc_text). */
  def run(input: DataFrame): DataFrame = {
    val perPage = input.select(
      col("doc_id"),
      col("page_idx"),
      processPageUdf(col("media_ref"), col("page_idx") + 1).as("r"))
    perPage
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(
        col("page_idx"),
        col("r.pageText").as("page_text"),
        col("r.extractedText").as("extracted")))).as("pages"))
      .select(
        col("doc_id"),
        size(col("pages")).as("n_pages"),
        // fullText: page texts joined with "\n\n" (gdocai.go:98-102)
        array_join(transform(col("pages"), (p: Column) => p.getField("page_text")), "\n\n").as("full_text"),
        // reading-order extraction over all pages in page order
        concat_ws("", transform(col("pages"), (p: Column) => p.getField("extracted"))).as("doc_text"))
  }

  /** Sequential form for the distributed-equivalence test. */
  def runSequential(pages: Seq[(Int, String)]): (Int, String, String) = {
    val sorted = pages.sortBy(_._1)
    val results = sorted.map { case (idx, ref) =>
      val ocr = MediaOcr.classify(ref)
      val page = Assembly.createHocrPage(ocr.page, new RuneIndex(ocr.text), idx + 1)
      (ocr.text, HocrText.extractText(Hocr(pages = Vector(page))))
    }
    (sorted.length, results.map(_._1).mkString("\n\n"), results.map(_._2).mkString(""))
  }
}
