package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.hocr.HocrText
import graft.layout._
import graft.model.BBox

class AssemblySpec extends AnyFunSuite {

  private def lay(start: Int, end: Int, conf: Float = 0.9f,
                  x1: Float = 0f, y1: Float = 0f, x2: Float = 0.5f, y2: Float = 0.5f): Option[LLayout] =
    Some(LLayout(Vector(TextSegment(start, end)), conf,
      Vector((x1, y1), (x2, y1), (x2, y2), (x1, y2))))

  test("hocrBBox: int(v*dim + 0.5) truncation on half-integers (hocr.go:344-354)") {
    // exact float32 values: 0.0625*1000+0.5 = 63.0 -> 63;
    // 0.03125*1000+0.5 = 31.75 -> trunc 31; 0.5*1000+0.5 = 500.5 -> 500
    val l = Some(LLayout(Vector(TextSegment(0, 1)), 1f,
      Vector((0.0625f, 0.03125f), (0f, 0f), (0.5f, 1.0f), (0f, 0f))))
    assert(Assembly.hocrBBox(l, 1000f, 1000f).contains(BBox(63, 31, 500, 1000)))
    // fewer than 4 vertices -> None
    val short = Some(LLayout(Vector(TextSegment(0, 1)), 1f, Vector((0f, 0f), (1f, 1f))))
    assert(Assembly.hocrBBox(short, 1000f, 1000f).isEmpty)
  }

  test("containment: segment[0] only, inclusive bounds (hocr.go:392-405)") {
    assert(Anchors.isElementInParent(lay(5, 10), lay(5, 10)))
    assert(Anchors.isElementInParent(lay(6, 9), lay(5, 10)))
    assert(!Anchors.isElementInParent(lay(4, 9), lay(5, 10)))
    assert(!Anchors.isElementInParent(lay(6, 11), lay(5, 10)))
    assert(!Anchors.isElementInParent(None, lay(5, 10)))
    // only segment[0] participates
    val multi = Some(LLayout(Vector(TextSegment(6, 9), TextSegment(50, 60)), 1f, Vector.empty))
    assert(Anchors.isElementInParent(multi, lay(5, 10)))
  }

  test("ContainmentIndex == nested-loop semantics incl. multi-parent & order") {
    val children = Vector(lay(8, 10), lay(2, 4), lay(0, 20), lay(3, 4), None).map(LLine(_))
    val idx = new ContainmentIndex[LLine](children, _.layout)
    // parent [2,10]: children 0 (8-10), 1 (2-4), 3 (3-4) in ORIGINAL order
    assert(idx.containedIn(lay(2, 10)).map(_._2) == Vector(0, 1, 3))
    // child in two parents is matched in both
    assert(idx.containedIn(lay(1, 5)).map(_._2) == Vector(1, 3))
    assert(idx.containedIn(None).isEmpty)
  }

  /** A two-block page exercising every assignment branch of
    * CreateHOCRPage (hocr.go:76-217). Text anchors (codepoints):
    * "alpha beta\ngamma delta\nepsilon zeta\norphan words here\n"
    *  0123456789...                                             */
  val text = "alpha beta\ngamma delta\nepsilon zeta\norphan words here\n"
  val page = LPage(
    pageNumber = 1, dimW = 1000f, dimH = 1000f,
    layout = lay(0, text.length, 1f, 0f, 0f, 1f, 1f),
    detectedLanguages = Vector("en", "de"),
    blocks = Vector(
      LBlock(lay(0, 23)),   // holds paragraphs 0 and 1
      LBlock(lay(23, 36))), // holds paragraph 2
    paragraphs = Vector(
      LPara(lay(0, 11)),   // in block 0
      LPara(lay(11, 23)),  // in block 0
      LPara(lay(23, 36)),  // in block 1 (and exactly equal -> contained)
      LPara(lay(36, 54))), // in NO block -> page-direct par_1_direct_3
    lines = Vector(
      LLine(lay(0, 11), Vector("en")),
      LLine(lay(11, 23)),
      LLine(lay(23, 36)),
      LLine(lay(36, 54))), // contained in direct para
    tokens = Vector(
      LToken(lay(0, 6, 0.965f), Vector("en"), hasBreak = true),   // "alpha "
      LToken(lay(6, 11, 0.5f), Vector.empty, hasBreak = true),    // "beta\n"
      LToken(lay(11, 17, 0.7f), Vector.empty, hasBreak = true),   // "gamma "
      LToken(lay(17, 23, 0.7f), Vector.empty, hasBreak = true),   // "delta\n"
      LToken(lay(23, 31, 0.8f), Vector.empty, hasBreak = true),   // "epsilon "
      LToken(lay(31, 36, 0.8f), Vector.empty, hasBreak = true),   // "zeta\n"
      LToken(lay(36, 43, 0.6f), Vector.empty, hasBreak = true),   // "orphan "
      LToken(lay(43, 49, 0.6f), Vector.empty, hasBreak = true),   // "words "
      LToken(lay(49, 54, 0.6f), Vector.empty, hasBreak = false))) // "here\n" NO break

  lazy val hp = Assembly.createHocrPage(page, new RuneIndex(text), 1)

  test("CreateHOCRPage: block->area, containment-assigned paras/lines, IDs") {
    assert(hp.id == "page_1")
    assert(hp.lang == "en") // first detected language
    assert(hp.areas.map(_.id) == Vector("carea_1_0", "carea_1_1"))
    assert(hp.areas(0).paragraphs.map(_.id) == Vector("par_1_0_0", "par_1_0_1"))
    assert(hp.areas(1).paragraphs.map(_.id) == Vector("par_1_1_2"))
    assert(hp.areas(0).paragraphs(0).lines.map(_.id) == Vector("line_1_0_0_0"))
    assert(hp.areas(0).paragraphs(1).lines.map(_.id) == Vector("line_1_0_1_1"))
    // page-direct paragraph (in no block) with its line
    assert(hp.paragraphs.map(_.id) == Vector("par_1_direct_3"))
    assert(hp.paragraphs(0).lines.map(_.id) == Vector("line_1_0_3_3"))
    // all lines were assigned -> no page-direct lines
    assert(hp.lines.isEmpty)
  }

  test("token cleaning + confidence x100 + word IDs (hocr.go:445-492)") {
    val w = hp.areas(0).paragraphs(0).lines(0).words
    assert(w.map(_.text) == Vector("alpha", "beta")) // trailing break trimmed
    assert(w.map(_.id) == Vector("word_1_0_0_0_0", "word_1_0_0_0_1"))
    assert(w(0).confidence == (0.965f * 100f).toDouble) // float32 multiply
    assert(w(0).lang == "en")
    // token without DetectedBreak keeps no trailing space after TrimSpace
    val lastWords = hp.paragraphs(0).lines(0).words
    assert(lastWords.map(_.text) == Vector("orphan", "words", "here"))
  }

  test("unassigned-line fallback: line in no paragraph -> page-direct") {
    val page2 = page.copy(
      paragraphs = page.paragraphs.take(3), // drop the direct para
      tokens = page.tokens)
    val hp2 = Assembly.createHocrPage(page2, new RuneIndex(text), 1)
    assert(hp2.lines.map(_.id) == Vector("line_1_0_0_3"))
    assert(hp2.lines(0).words.map(_.text) == Vector("orphan", "words", "here"))
  }

  test("H-13 stitch over the assembled page") {
    val doc = graft.hocr.Hocr(pages = Vector(hp))
    assert(HocrText.extractText(doc) ==
      "alpha beta \ngamma delta \nepsilon zeta \norphan words here \n\n\n")
  }

  test("documentLanguage: frequency argmax with lexicographic tie-break") {
    val d = LDoc(text, Vector(page))
    // counts: en: page(1) + token(1) = 2, de: page(1) = 1
    assert(Assembly.documentLanguage(d) == "en")
    val tie = LDoc("", Vector(LPage(1, 1f, 1f, detectedLanguages = Vector("fr", "de"))))
    assert(Assembly.documentLanguage(tie) == "de") // tie -> lexicographic
    assert(Assembly.documentLanguage(LDoc("", Vector.empty)) == "")
  }

  test("createHocrDocument defaults + updateDocumentLanguages") {
    val doc = Assembly.createHocrDocument(None, Vector(hp))
    assert(doc.title == "Document OCR")
    assert(doc.language == "unknown")
    assert(doc.metadata("ocr-system") == "Document AI OCR")
    assert(doc.metadata("ocr-number-of-pages") == "1")
    // langs collected from page/line/word levels, sorted
    assert(doc.metadata("ocr-langs") == "en")
  }

  test("page sort: only when >1 pages and first pageNumber > 0 (G-4)") {
    val d = LDoc(text, Vector(page.copy(pageNumber = 2), page.copy(pageNumber = 1)))
    assert(Structured.createPages(d).map(_.pageNumber) == Vector(1, 2))
    val zero = LDoc(text, Vector(page.copy(pageNumber = 0), page.copy(pageNumber = 1)))
    assert(Structured.createPages(zero).map(_.pageNumber) == Vector(0, 1))
  }

  test("structured hierarchy via interval containment (document.go:154-164)") {
    val d = LDoc(text, Vector(page))
    val sp = Structured.createPages(d).head
    assert(sp.tokens == Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "orphan", "words", "here\n"))
    assert(sp.lineTokens(0) == Vector(0, 1))
    assert(sp.paraLines(2) == Vector(2))
    assert(sp.blockParas(0) == Vector(0, 1))
    assert(sp.blockParas(1) == Vector(2))
  }

  test("form-field fold: dedup-on-equal, array append unconditional (G-7)") {
    val mkPage = (nameAnchor: (Int, Int), valAnchor: (Int, Int)) =>
      LPage(1, 1f, 1f, formFields = Vector(
        LFormField(lay(nameAnchor._1, nameAnchor._2), lay(valAnchor._1, valAnchor._2))))
    // text: "Name: Bob Name: Bob Name: Eve "
    val t = "Name: Bob Name: Bob Name: Eve "
    val d = LDoc(t, Vector(
      mkPage((0, 5), (6, 9)),    // Name: -> Bob (trailing ':' trimmed)
      mkPage((10, 15), (16, 19)), // Name -> Bob (same -> stays scalar)
      mkPage((20, 25), (26, 29)))) // Name -> Eve (differs -> array)
    val fields = Structured.extractFormFields(d)
    assert(Structured.toJson(Structured.FMap(fields)) == """{"Name":["Bob","Eve"]}""")
  }

  test("entity fold: nested props, _value, array dedup (G-8..G-10)") {
    val entities = Vector(
      LEntity("invoice", "INV-1", Vector(
        LEntity("line", "a"),
        LEntity("line", "b"),
        LEntity("line", "a"),   // dedup in addValueToMap (unlike G-7!)
        LEntity("total", "9"))),
      LEntity("vendor", "Acme"),
      LEntity("vendor", "Acme"), // same scalar -> unchanged
      LEntity("", "skipped"),
      LEntity("note", ""))       // empty value -> empty map
    val d = LDoc("", Vector.empty, entities)
    val json = Structured.toJson(Structured.FMap(Structured.extractEntityFields(d)))
    assert(json == """{"invoice":{"_value":"INV-1","line":["a","b"],"total":"9"},"note":{},"vendor":"Acme"}""")
  }
}
