package graft.fixtures

import graft.model.{Doc, Span}
import graft.pipeline.SpanExtract

/** The frozen golden corpus (SURVEY.md §5.2, FIXTURES.md): a fixed doc
  * set whose expected extraction output is checked into
  * src/test/resources/golden/extract.jsonl. Any semantic drift in the
  * extraction stack fails GoldenSpec. */
object Golden {

  private def words(seed: String, n: Int): String = {
    val vocab = Array("alpha", "bravo", "charlie", "delta", "echo", "fox",
      "golf", "hotel", "india", "juliet", "kilo", "lima", "the", "and",
      "merge", "stream", "batch", "join", "scan", "sort")
    (0 until n).map { i =>
      vocab(Math.floorMod(graft.layout.MediaOcr.hash64(s"$seed:$i"), vocab.length.toLong).toInt)
    }.mkString(" ")
  }

  /** Hand-crafted hOCR exercising the FIXTURES.md §3 edge shapes:
    * direct lines under page, words under area/paragraph, duplicate and
    * empty line IDs, x_wconf 0 / 99.5, ppageno 0, baseline, non-BMP. */
  val edgeHocr: String =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<html lang="en"><head><title>edge</title>
      |<meta name="ocr-system" content="x" /></head><body>
      |<div class="ocr_page" id="p1" title="bbox 0 0 100 100">
      | <div class="ocr_carea" id="a1" title="bbox 0 0 50 50">
      |  <p class="ocr_par" id="pp1" title="bbox 0 0 50 25">
      |   <span class="ocr_line" id="l1" title="bbox 0 0 50 10; baseline 0.01 -2">
      |    <span class="ocrx_word" id="w1" title="bbox 0 0 10 10; x_wconf 99.5">emoji😀word</span>
      |    <span class="ocrx_word" id="w2" title="bbox 12 0 20 10; x_wconf 0">zero</span>
      |   </span>
      |   <span class="ocr_line" id="l1" title="bbox 0 12 50 22">
      |    <span class="ocrx_word" id="w3" title="bbox 0 12 10 22">dupline</span>
      |   </span>
      |  </p>
      |  <span class="ocr_line" id="" title="bbox 0 26 50 36">
      |   <span class="ocrx_word" id="w4" title="bbox 0 26 9 36">emptyid1</span>
      |  </span>
      |  <span class="ocr_line" id="" title="bbox 0 38 50 48">
      |   <span class="ocrx_word" id="w5" title="bbox 0 38 9 48">emptyid2</span>
      |  </span>
      |  <span class="ocrx_word" id="w6" title="bbox 0 52 9 60">areaword</span>
      | </div>
      | <p class="ocr_par" id="pd" title="bbox 0 60 100 70">
      |  <span class="ocrx_word" id="w7" title="bbox 0 60 9 70">paraword</span>
      | </p>
      | <span class="ocr_line" id="pl" title="bbox 0 72 100 82">
      |  <span class="ocrx_word" id="w8" title="bbox 0 72 9 82">pageline</span>
      | </span>
      |</div></body></html>""".stripMargin

  val boilerHtml: String =
    "<html><head><script>skip()</script></head><body>" +
    "<nav><a href='/'>Home</a><a href='/x'>Other</a></nav>" +
    "<h1>Golden Heading</h1>" +
    "<div><p>The golden paragraph has plenty of words to clear every density threshold with ease.</p>" +
    "<p>tiny</p>" +
    "<ul><li>a list item long enough to be kept by the list rule of the extractor</li>" +
    "<li><a href='/l'>linked item dropped</a></li></ul></div>" +
    "<footer>copyright</footer></body></html>"

  /** 24 docs: 20 generated + 4 edge docs. */
  def corpus: Seq[Doc] = {
    val generated = (0L until 20L).map(id => CorpusGen.genDoc(id, words(s"doc$id", 60 + (id % 40).toInt)))
    val edge = Seq(
      Doc("edge_hocr", Seq(Span("pdf_layout", edgeHocr, "", 0))),
      Doc("edge_html", Seq(
        Span("html", boilerHtml, "", 0),
        Span("media", "", "img://00000000deadbeef", 1000))),
      Doc("edge_mixed", Seq(
        Span("html", "<p>first html block with enough words to be kept for sure here now</p>", "", 0),
        Span("pdf_layout", edgeHocr, "", 100),
        Span("media", "", "img://cafebabe12345678", 200),
        Span("html", "<div><a href='/'>only links</a></div>", "", 300))),
      Doc("edge_empty", Seq(Span("html", "", "", 0))))
    generated ++ edge
  }

  /** Expected output rows via the sequential library path. */
  def expectedJsonl: String = {
    def q(s: String): String = {
      val sb = new StringBuilder("\"")
      s.foreach {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      sb.append('"').toString
    }
    corpus.map { d =>
      val spans = d.spans.zipWithIndex.map { case (s, i) =>
        s"""{"kind":${q(s.kind)},"text":${q(SpanExtract.extractSpanText(s.kind, s.text, s.media_ref))},"media_ref":${q(s.media_ref)},"order":$i}"""
      }
      s"""{"doc_id":${q(d.doc_id)},"spans":[${spans.mkString(",")}]}"""
    }.mkString("\n") + "\n"
  }
}

/** One-time generator: writes the golden resource. Run only when the
  * pinned semantics INTENTIONALLY change; the diff is the review. */
object GoldenGen {
  def main(args: Array[String]): Unit = {
    val path = java.nio.file.Paths.get("src/test/resources/golden/extract.jsonl")
    java.nio.file.Files.createDirectories(path.getParent)
    java.nio.file.Files.writeString(path, Golden.expectedJsonl)
    println(s"wrote $path (${Golden.corpus.length} docs)")
  }
}
