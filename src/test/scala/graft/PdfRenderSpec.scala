package graft

import java.nio.charset.StandardCharsets.ISO_8859_1

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.hocr.{HLine, HPage, HWord, Hocr}
import graft.model.BBox
import graft.pdf.{PdfAssemble, PdfOps, PdfRender}

/** The binary PDF sink (P-7/P-8): real bytes out, verified by feeding
  * them back through our own P-3/P-4/P-5 detection operators — the same
  * closed loop the reference runs when it refuses to re-OCR a PDF that
  * already carries its layer. */
class PdfRenderSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def page(words: Seq[String], pageNum: Int): HPage =
    HPage(id = s"page_$pageNum", pageNumber = pageNum, bbox = BBox(0, 0, 612, 792),
      lines = Vector(HLine(id = "l1", bbox = BBox(40, 80, 580, 98),
        words = words.zipWithIndex.map { case (w, i) =>
          HWord(id = s"w$i", text = w, bbox = BBox(40.0 + i * 90, 80.0, 120.0 + i * 90, 98.0))
        }.toVector)))

  /** Minimal JPEG: SOI, SOF0 (8-bit, 32x48, 3 components), EOI. */
  private val tinyJpeg: Array[Byte] = Array(
    0xFF, 0xD8,
    0xFF, 0xC0, 0x00, 0x11, 0x08, 0x00, 0x20, 0x00, 0x30, 0x03,
    0x01, 0x11, 0x00, 0x02, 0x11, 0x00, 0x03, 0x11, 0x00,
    0xFF, 0xD9).map(_.toByte)

  test("jpegDims parses the SOF frame header") {
    assert(PdfRender.jpegDims(tinyJpeg).contains((48, 32)))
    assert(PdfRender.jpegDims("not a jpeg".getBytes(ISO_8859_1)).isEmpty)
    assert(PdfOps.detectImageType(tinyJpeg).contains("JPEG"))
  }

  test("P-7 round-trip: emitted PDF's layers are detected by our own P-3/P-4/P-5") {
    val hocr = Hocr(pages = Vector(page(Seq("alpha", "beta"), 1), page(Seq("gamma"), 2)))
    val res = PdfRender.createPdfFromImages(hocr, Seq(tinyJpeg, tinyJpeg)).toOption.get
    assert(res.warnings.isEmpty)
    val pdf = res.pdf
    assert(new String(pdf.take(8), ISO_8859_1) == "%PDF-1.4")
    assert(new String(pdf.takeRight(6), ISO_8859_1) == "%%EOF\n")
    // P-3: one OCG per page. The name comes back as "OCR Text (Page 1\"
    // — the escaped-paren residue is the REFERENCE's own detection
    // behavior on fpdf-escaped names: detect.go's regex stops at the
    // `\)` (capturing the backslash) and helpers.go:18-23 only unescapes
    // \( \) \\ pairs, leaving the trailing lone backslash
    val layers = PdfOps.detectPdfLayers(pdf).toOption.get
    assert(layers == Vector("OCR Text (Page 1\\", "OCR Text (Page 2\\"))
    // P-4/P-5: the gate that stops double-OCR fires on our own output
    // (the `^name\s*\(Page\s*\d+.*` match tolerates the residue, exactly
    // as it does for the Go writer's output)
    val det = PdfOps.detectOcr(pdf, "OCR Text")
    assert(det.hasOcr && det.layerInfo.ocrLayerName == "OCR Text (Page 1\\")
    // the JPEG bytes are embedded verbatim (DCTDecode passthrough)
    assert(pdf.containsSlice(tinyJpeg))
    // invisible-text state + per-word text ops present
    val s = new String(pdf, ISO_8859_1)
    assert(s.contains("/CA 0.000 /ca 0.000"))
    assert(s.contains("(alpha) Tj") && s.contains("(gamma) Tj"))
  }

  test("xref offsets are exact: every entry points at its `N 0 obj` header") {
    val res = PdfRender.applyOcrPdf(Hocr(pages = Vector(page(Seq("word"), 1)))).toOption.get
    val s = new String(res.pdf, ISO_8859_1)
    val xrefAt = s.substring(s.lastIndexOf("startxref\n") + 10).trim.takeWhile(_.isDigit).toInt
    assert(s.startsWith("xref", xrefAt))
    val entries = s.substring(xrefAt).linesIterator.drop(3).takeWhile(_.endsWith("n ")).toVector
    assert(entries.nonEmpty)
    entries.zipWithIndex.foreach { case (e, i) =>
      val off = e.take(10).toInt
      assert(s.startsWith(s"${i + 1} 0 obj\n", off), s"xref entry ${i + 1} -> $off")
    }
  }

  test("deterministic: same input, byte-identical output") {
    val hocr = Hocr(pages = Vector(page(Seq("same", "bytes"), 1)))
    val a = PdfRender.applyOcrPdf(hocr).toOption.get.pdf
    val b = PdfRender.applyOcrPdf(hocr).toOption.get.pdf
    assert(java.util.Arrays.equals(a, b))
  }

  test("encoding gate: >10% non-Latin-1 words fail like layer.go:104-107") {
    val bad = Hocr(pages = Vector(page(Seq("𝔤𝔯𝔞𝔣𝔱", "ok"), 1))) // 1 of 2 = 50%
    assert(PdfRender.applyOcrPdf(bad).isLeft)
    val mostlyOk = Hocr(pages = Vector(page((1 to 20).map(i => s"w$i") :+ "𝔤𝔯𝔞𝔣𝔱", 1)))
    assert(PdfRender.applyOcrPdf(mostlyOk).isRight) // 1 of 21 < 10%
  }

  test("non-JPEG underlay: undecodable skips with warning, real PNG transcodes to JPEG") {
    // a bare PNG signature (no IHDR) decodes in no reader: skip + warn
    val png = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    val res = PdfRender.createPdfFromImages(
      Hocr(pages = Vector(page(Seq("text"), 1))), Seq(png)).toOption.get
    assert(res.warnings.exists(w => w.contains("PNG") && w.contains("skipped")))
    assert(PdfOps.detectPdfLayers(res.pdf).toOption.get.nonEmpty)
    assert(!new String(res.pdf, ISO_8859_1).contains("/XObject"))
    // a REAL PNG transcodes to a JPEG underlay via ImageIO (round 3)
    val realPng = graft.multimodal.Multimodal.encodeImage(
      graft.multimodal.Multimodal.bmpToImage(
        graft.multimodal.Multimodal.genBmp(3L, 24, 16)).get, "png")
    val res2 = PdfRender.createPdfFromImages(
      Hocr(pages = Vector(page(Seq("text"), 1))), Seq(realPng)).toOption.get
    assert(res2.warnings.exists(_.contains("transcoded PNG -> JPEG")))
    val s2 = new String(res2.pdf, ISO_8859_1)
    assert(s2.contains("/XObject") && s2.contains("/DCTDecode"))
    assert(s2.contains("/Width 24 /Height 16"))
    assert(PdfOps.detectPdfLayers(res2.pdf).toOption.get.nonEmpty)
  }

  test("distributed sink: per-doc PDFs, layer count == page count, deterministic") {
    import spark.implicits._
    val pageDf = (0 until 12).map(i => (s"d${i % 4}", i / 4, s"img://pdf/$i")).toDF("doc_id", "page_idx", "media_ref")
    val out = PdfAssemble.run(pageDf).collect().map(r =>
      (r.getString(0), r.getAs[Array[Byte]](1), r.getInt(2), r.getString(3))).sortBy(_._1)
    assert(out.length == 4)
    out.foreach { case (doc, pdf, nPages, err) =>
      assert(nPages == 3)
      if (err == null) {
        val layers = PdfOps.detectPdfLayers(pdf).toOption.get
        assert(layers.length == 3, s"doc $doc")
        assert(PdfOps.detectOcr(pdf, "OCR Text").hasOcr)
      } else assert(pdf.isEmpty) // encoding gate: reference aborts the doc
    }
    val again = PdfAssemble.run(pageDf).collect().map(r =>
      (r.getString(0), r.getAs[Array[Byte]](1).toSeq)).sortBy(_._1)
    assert(out.map(o => (o._1, o._2.toSeq)).toSeq == again.toSeq)
  }
}
