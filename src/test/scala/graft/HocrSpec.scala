package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.hocr._
import graft.model.BBox

class HocrSpec extends AnyFunSuite {

  val sample: String =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<html xmlns="http://www.w3.org/1999/xhtml" lang="en">
      |<head>
      |  <title>Sample OCR</title>
      |  <meta name="ocr-system" content="tesseract 5" />
      |  <meta name="ocr-number-of-pages" content="1" />
      |  <meta name="description" content="a test doc" />
      |  <meta name="dc.language" content="de" />
      |  <meta name="irrelevant" content="dropme" />
      |</head>
      |<body>
      |  <div class="ocr_page" id="page_1" title="bbox 0 0 1000 1400; image page1.png; ppageno 1">
      |    <div class="ocr_carea" id="carea_1_0" title="bbox 10 10 990 700; x_extra zz">
      |      <p class="ocr_par" id="par_1_0_0" title="bbox 10 10 990 300">
      |        <span class="ocr_line" id="line_1_0_0_0" title="bbox 10 10 990 40; baseline 0.01 -2">
      |          <span class="ocrx_word" id="w1" title="bbox 10 10 80 40; x_wconf 95">Hello</span>
      |          <span class="ocrx_word" id="w2" title="bbox 90 10 160 40; x_wconf 96.5" lang="fr">world</span>
      |        </span>
      |        <span class="ocr_line" id="line_1_0_0_1" title="bbox 10 50 990 80">
      |          <span class="ocrx_word" id="w3" title="bbox 10 50 120 80">again</span>
      |        </span>
      |      </p>
      |      <span class="ocr_line" id="directline_a" title="bbox 10 310 990 340">
      |        <span class="ocrx_word" id="w4" title="bbox 10 310 60 340; x_wconf 80; lang es">hola</span>
      |      </span>
      |    </div>
      |    <p class="ocr_par" id="par_direct" title="bbox 10 710 990 800">
      |      <span class="ocr_line" id="pline" title="bbox 10 710 990 740">
      |        <span class="ocrx_word" id="w5" title="bbox 10 710 99 740; x_wconf 70">direct</span>
      |      </span>
      |    </p>
      |    <span class="ocr_line" id="freeline" title="bbox 10 810 990 840">
      |      <span class="ocrx_word" id="w6" title="bbox 10 810 70 840">loose</span>
      |    </span>
      |  </div>
      |</body>
      |</html>""".stripMargin

  lazy val parsed: Hocr = HocrParse.parseHocr(sample.getBytes("UTF-8")).toOption.get

  test("document metadata whitelist + dc.language override (parse.go:162-193)") {
    assert(parsed.title == "Sample OCR")
    assert(parsed.description == "a test doc")
    assert(parsed.language == "de") // dc.language beats html lang attr
    assert(parsed.metadata == Map("ocr-system" -> "tesseract 5", "ocr-number-of-pages" -> "1"))
  }

  test("page attributes: bbox, image, ppageno") {
    val p = parsed.pages.head
    assert(p.id == "page_1")
    assert(p.bbox == BBox(0, 0, 1000, 1400))
    assert(p.imageName == "page1.png")
    assert(p.pageNumber == 1)
  }

  test("hierarchy incl. direct lines/paragraphs + early-stop collection") {
    val p = parsed.pages.head
    assert(p.areas.length == 1)
    assert(p.paragraphs.map(_.id) == Vector("par_direct"))
    assert(p.lines.map(_.id) == Vector("freeline"))
    val area = p.areas.head
    assert(area.metadata == Map("x_extra" -> "zz"))
    assert(area.paragraphs.map(_.id) == Vector("par_1_0_0"))
    assert(area.lines.map(_.id) == Vector("directline_a"))
    val par = area.paragraphs.head
    assert(par.lines.map(_.id) == Vector("line_1_0_0_0", "line_1_0_0_1"))
    assert(par.lines.head.baseline == "0.01 -2")
    val words = par.lines.head.words
    assert(words.map(_.text) == Vector("Hello", "world"))
    assert(words(0).confidence == 95.0)
    assert(words(1).confidence == 96.5)
    assert(words(1).lang == "fr")
    // title 'lang' prop overrides attr lang (parse.go:520-522)
    assert(area.lines.head.words.head.lang == "es")
  }

  test("reading-order stitch: areas -> page paras -> page lines (helpers.go)") {
    val text = HocrText.extractText(parsed)
    assert(text ==
      "Hello world \nagain \nhola \ndirect \nloose \n\n\n")
  }

  test("line dedup by ID: same-ID line emitted once (helpers.go:29-34)") {
    val line = HLine(id = "dup", words = Vector(HWord(text = "x")))
    val doc = Hocr(pages = Vector(HPage(
      areas = Vector(HArea(lines = Vector(line))),
      lines = Vector(line))))
    assert(HocrText.extractText(doc) == "x \n\n\n")
    // empty-ID lines collide after the first (helpers.go:100-102)
    val l1 = HLine(id = "", words = Vector(HWord(text = "a")))
    val l2 = HLine(id = "", words = Vector(HWord(text = "b")))
    val doc2 = Hocr(pages = Vector(HPage(lines = Vector(l1, l2))))
    assert(HocrText.extractText(doc2) == "a \n\n\n")
  }

  test("render -> parse round-trip preserves structure (generate.go + tmpl)") {
    val rendered = HocrRender.render(parsed)
    assert(rendered.contains("<meta name=\"ocr-system\" content=\"tesseract 5\" />"))
    assert(rendered.contains("x_wconf 95")) // %.0f of 95.0
    assert(rendered.contains("x_wconf 96")) // %.0f of 96.5 (half-even -> 96)
    assert(rendered.contains("; ppageno 1"))
    val reparsed = HocrParse.parseHocr(rendered.getBytes("UTF-8")).toOption.get
    assert(reparsed.pages.length == 1)
    assert(HocrText.extractText(reparsed) == HocrText.extractText(parsed))
    assert(reparsed.pages.head.bbox == parsed.pages.head.bbox)
    assert(reparsed.title == parsed.title)
    // render o parse reaches a fixpoint after one iteration (the first
    // render moves the defaulted ocr-langs meta into Metadata, which
    // re-sorts the meta lines once)
    val rendered2 = HocrRender.render(reparsed)
    val reparsed2 = HocrParse.parseHocr(rendered2.getBytes("UTF-8")).toOption.get
    assert(HocrRender.render(reparsed2) == rendered2)
  }

  test("x_wconf omitted when confidence == 0; ppageno omitted when 0") {
    val doc = Hocr(pages = Vector(HPage(
      id = "p", pageNumber = 0,
      lines = Vector(HLine(id = "l", words = Vector(HWord(id = "w", text = "t")))))))
    val r = HocrRender.render(doc)
    assert(!r.contains("x_wconf"))
    assert(!r.contains("ppageno"))
  }

  test("no ocr_page elements -> error (parse.go:79-81)") {
    assert(HocrParse.parseHocr("<html><body><p>x</p></body></html>".getBytes("UTF-8")).isLeft)
  }
}
