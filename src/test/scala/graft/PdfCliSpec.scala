package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.cli.Fields
import graft.layout.Structured.{FArr, FMap, FStr, FVal}
import graft.pdf.PdfOps

class PdfCliSpec extends AnyFunSuite {

  private def latin1Bytes(s: String): Array[Byte] =
    s.toCharArray.map(c => (c & 0xFF).toByte)

  val pdfBlob: Array[Byte] = latin1Bytes(
    "%PDF-1.7\n" +
    "/Type /OCG /Name (OCR Text \\(Page 1\\))\n" +
    "/Title (Some Title)\n" +
    "/Type /OCG /Name (watermark ocr backup)\n")

  test("detectPdfLayers: OCG regexes, unescape, order-preserving dedup") {
    val layers = PdfOps.detectPdfLayers(pdfBlob).toOption.get
    // [^)]+ stops at the first ')' even if escaped — reference quirk
    // (detect.go:17): group is "OCR Text \(Page 1\" -> unescaped
    assert(layers.contains("OCR Text (Page 1\\"))
    assert(layers.contains("watermark ocr backup"))
    assert(layers.contains("Some Title")) // /Title pattern
    assert(layers.distinct == layers)
    assert(PdfOps.detectPdfLayers(Array.empty).isLeft)
  }

  test("checkExistingOcrLayers: page-pattern match breaks before warnings") {
    val r = PdfOps.checkExistingOcrLayers(pdfBlob, "OCR Text").toOption.get
    assert(r.hasOcrLayer)
    assert(r.ocrLayerName.startsWith("OCR Text (Page 1"))
    // reference breaks on first match -> the "watermark ocr" layer never
    // produces its warning (detect.go:96-117)
    assert(r.warnings.isEmpty)
    // without a match, the ocr-containing layer warns
    val r2 = PdfOps.checkExistingOcrLayers(pdfBlob, "ZZZ").toOption.get
    assert(!r2.hasOcrLayer)
    assert(r2.warnings.exists(_.contains("watermark ocr backup")))
    val d2 = PdfOps.detectOcr(pdfBlob, "ZZZ")
    assert(!d2.hasOcr)
    assert(d2.warnings.contains("Potential OCR layers were detected"))
  }

  test("UTF-16BE BOM layer names decode (naive, no surrogates)") {
    val blob = latin1Bytes("/Type /OCG /Name (\u00fe\u00ff\u0000O\u0000K)\n")
    val layers = PdfOps.detectPdfLayers(blob).toOption.get
    assert(layers.contains("OK"))
  }

  test("drawPage order: area words -> area lines -> area paras; thresholds") {
    import graft.hocr._
    val w = (t: String) => HWord(text = t, bbox = graft.model.BBox(0, 0, 50, 10))
    val page = HPage(
      areas = Vector(HArea(
        words = Vector(w("aw")),
        lines = Vector(HLine(words = Vector(w("alw")))),
        paragraphs = Vector(HPara(words = Vector(w("apw")), lines = Vector(HLine(words = Vector(w("aplw")))))))),
      paragraphs = Vector(HPara(words = Vector(w("ppw")), lines = Vector(HLine(words = Vector(w("plw")))))),
      lines = Vector(HLine(words = Vector(w("pl")))))
    val r = PdfOps.drawPage(page, (x, y) => (x, y))
    // P-6 order differs from H-13: words-before-lines inside areas/paras
    assert(r.words.map(_.text) == Vector("aw", "alw", "apw", "aplw", "ppw", "plw", "pl"))
    assert(!r.tooManyEncodingErrors)
    val bad = HPage(lines = Vector(HLine(words = Vector(w("Ā"), w("ok")))))
    val rb = PdfOps.drawPage(bad, (x, y) => (x, y))
    assert(rb.encodingErrors == 1 && rb.wordCount == 2 && rb.tooManyEncodingErrors)
  }

  test("placeholders: source prefixes, dot paths, form-wins conflict, defaults") {
    import scala.collection.mutable.LinkedHashMap
    val form = LinkedHashMap[String, FVal]("invoice" -> FStr("INV-9"), "both" -> FStr("from-form"))
    val ext = LinkedHashMap[String, FVal](
      "vendor" -> FMap(LinkedHashMap("_value" -> FStr("Acme"), "city" -> FStr("Oslo"))),
      "both" -> FStr("from-ext"),
      "tags" -> FArr(Vector("a", "b")))
    assert(Fields.processPlaceholders(
      "doc @{invoice} from @{extractor_field.vendor.city} t=@{tags} v=@{vendor}", form, ext) ==
      "doc INV-9 from Oslo t=a v=Acme")
    var warned = false
    assert(Fields.processPlaceholders(
      "@{both} @{missing:dflt} @{form_field.missing:d2}", form, ext, _ => warned = true) ==
      "from-form dflt d2")
    assert(warned)
  }

  test("sanitizeFilename: traversal, control chars, reserved names, 240-byte cap") {
    assert(Fields.sanitizeFilename("  ../..\\Ärger: <Straße>/CON.txt  ") ==
      "arger_ _strasse_con.txt")
    assert(Fields.sanitizeFilename("con") == "_con")
    // transliteration: NFKD compatibility forms + Greek/Cyrillic folds
    assert(Fields.transliterate("Ελλάδα") == "Ellada")
    assert(Fields.transliterate("Москва") == "Moskva")
    assert(Fields.transliterate("щука ы") == "shchuka y")
    assert(Fields.transliterate("𝔤𝔯𝔞𝔣𝔱") == "graft") // non-BMP math letters via NFKD
    assert(Fields.transliterate("ＦＵＬＬ　ｗｉｄｔｈ") == "FULL width")
    assert(Fields.transliterate("€9 — “fin”") == "EUR9 - \"fin\"")
    // round-5 verdict #5: Kana (Hepburn, per-char), Hangul (NFKD to the
    // fully-mapped jamo block, Revised Romanization), top-frequency CJK
    // pinyin; uncommon ideographs still drop (documented divergence)
    assert(Fields.transliterate("中文") == "zhongwen")
    assert(Fields.transliterate("北京 2024") == "beijing 2024")
    assert(Fields.transliterate("が") == "ga") // precomposed fold wins over NFKD mark-strip
    assert(Fields.transliterate("カタカナ") == "katakana")
    assert(Fields.transliterate("とうきょう") == "toukiyou") // per-char, no digraph context
    assert(Fields.transliterate("アート") == "a-to")
    assert(Fields.transliterate("한글") == "hangeul")
    assert(Fields.transliterate("서울") == "seoul")
    assert(Fields.transliterate("값") == "gap") // compound trailing jamo ᆹ
    assert(Fields.transliterate("齉") == "") // uncommon ideograph: drops (documented)
    assert(Fields.sanitizeFilename("Отчёт — Q4.pdf") == "otchet - q4.pdf")
    assert(Fields.sanitizeFilename("com7.pdf") == "_com7.pdf")
    assert(Fields.sanitizeFilename("") == "unnamed")
    assert(Fields.sanitizeFilename("...") == "unnamed")
    val long = Fields.sanitizeFilename("x" * 300 + ".pdf")
    assert(long.length == 240 && long.endsWith(".pdf"))
  }

  test("exit-code protocol (C-4)") {
    assert(Fields.exitCode(0, 0, 0, 0) == 0)
    assert(Fields.exitCode(5, 0, 0, 0) == 1)
    assert(Fields.exitCode(0, 0, 1, 0) == 2)
    assert(Fields.exitCode(0, 0, 0, 2) == 2)
    assert(Fields.exitCode(1, 1, 0, 9) == 3)
  }
}
