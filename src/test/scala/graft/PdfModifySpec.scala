package graft

import java.nio.charset.StandardCharsets.ISO_8859_1

import org.scalatest.funsuite.AnyFunSuite

import graft.hocr.{HLine, HPage, HWord, Hocr}
import graft.model.BBox
import graft.pdf.{PdfOps, PdfParse, PdfRender}

/** P-8 full semantics (modify.go:14-51): the source page background is
  * IMPORTED under the new OCR layer — PdfParse plays the gofpdi role.
  * Closed loop: our writer emits, our parser imports, our detector
  * verifies; plus a hand-built Flate-compressed source to prove the
  * import path is not limited to our own output. */
class PdfModifySpec extends AnyFunSuite {

  private def page(words: Seq[String], pageNum: Int): HPage =
    HPage(id = s"page_$pageNum", pageNumber = pageNum, bbox = BBox(0, 0, 612, 792),
      lines = Vector(HLine(id = "l1", bbox = BBox(40, 80, 580, 98),
        words = words.zipWithIndex.map { case (w, i) =>
          HWord(id = s"w$i", text = w, bbox = BBox(40.0 + i * 90, 80.0, 120.0 + i * 90, 98.0))
        }.toVector)))

  private def raw(pdf: Array[Byte]): String = new String(pdf, ISO_8859_1)

  test("PdfParse round-trips our own writer's output") {
    val src = PdfRender.applyOcrPdf(
      Hocr(pages = Vector(page(Seq("uno", "dos"), 1), page(Seq("tres"), 2))),
      layerNameBase = "Scan Text").toOption.get.pdf
    val doc = PdfParse.parse(src).toOption.get
    val pages = doc.pages.toOption.get
    assert(pages.length == 2)
    assert(pages(0).mediaBox.contains((0.0, 0.0, 612.0, 792.0)))
    assert(pages(0).contentObjs.length == 1)
    val content = doc.decodedStream(pages(0).contentObjs.head).toOption.get
    assert(new String(content, ISO_8859_1).contains("(uno) Tj"))
    // resources resolve and carry the OCG property ref
    assert(PdfParse.serialize(pages(0).resources.get, identity).contains("/Properties"))
  }

  test("modifyExistingPdf imports the background and overlays the new layer") {
    val src = PdfRender.applyOcrPdf(
      Hocr(pages = Vector(page(Seq("originalword"), 1))),
      layerNameBase = "Scan Text").toOption.get.pdf
    val out = PdfRender.modifyExistingPdf(src,
      Hocr(pages = Vector(page(Seq("addedword"), 1)))).toOption.get
    assert(out.warnings.isEmpty)
    val s = raw(out.pdf)
    // imported content (inside the Form XObject) AND the new layer text
    assert(s.contains("(originalword) Tj") && s.contains("(addedword) Tj"))
    assert(s.contains("/Tpl0 Do") && s.contains("/Subtype /Form"))
    // both OCGs detectable: the copied source layer and the new one
    val layers = PdfOps.detectPdfLayers(out.pdf).toOption.get
    assert(layers.contains("OCR Text (Page 1\\") && layers.contains("Scan Text (Page 1\\"))
    // the double-OCR gate fires on the result
    assert(PdfOps.detectOcr(out.pdf, "OCR Text").hasOcr)
    // the result is itself parseable (valid xref, objects, page tree)
    val reparsed = PdfParse.parse(out.pdf).toOption.get
    assert(reparsed.pages.toOption.get.length == 1)
    // determinism: same inputs, same bytes
    val again = PdfRender.modifyExistingPdf(src,
      Hocr(pages = Vector(page(Seq("addedword"), 1)))).toOption.get
    assert(java.util.Arrays.equals(out.pdf, again.pdf))
  }

  test("startFromPage selects source pages; unused pages are not copied") {
    val src = PdfRender.applyOcrPdf(
      Hocr(pages = Vector(page(Seq("pOneWord"), 1), page(Seq("pTwoWord"), 2), page(Seq("pThreeWord"), 3))),
      layerNameBase = "Scan Text").toOption.get.pdf
    val out = PdfRender.modifyExistingPdf(src,
      Hocr(pages = Vector(page(Seq("ocrA"), 1), page(Seq("ocrB"), 2))),
      startFromPage = 2).toOption.get
    val s = raw(out.pdf)
    assert(s.contains("(pTwoWord) Tj") && s.contains("(pThreeWord) Tj"))
    assert(!s.contains("(pOneWord) Tj")) // source page 1 not imported
    assert(PdfParse.parse(out.pdf).toOption.get.pages.toOption.get.length == 2)
  }

  /** Hand-built source: Flate-compressed content, indirect /Length, and
    * MediaBox inherited from the /Pages node — none of which our own
    * writer produces. */
  private def flateSource(word: String): Array[Byte] = {
    val content = s"BT /F9 12 Tf ($word) Tj ET"
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(content.getBytes(ISO_8859_1)); deflater.finish()
    val buf = new Array[Byte](1024)
    val n = deflater.deflate(buf); deflater.end()
    val compressed = java.util.Arrays.copyOf(buf, n)
    val objs = Vector(
      "<< /Type /Catalog /Pages 2 0 R >>".getBytes(ISO_8859_1),
      "<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 400 300] >>".getBytes(ISO_8859_1),
      "<< /Type /Page /Parent 2 0 R /Contents 4 0 R /Resources << >> >>".getBytes(ISO_8859_1),
      ("<< /Length 5 0 R /Filter /FlateDecode >>\nstream\n".getBytes(ISO_8859_1) ++
        compressed ++ "\nendstream".getBytes(ISO_8859_1)),
      compressed.length.toString.getBytes(ISO_8859_1))
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    w("%PDF-1.4\n")
    val offsets = objs.zipWithIndex.map { case (body, i) =>
      val off = out.size()
      w(s"${i + 1} 0 obj\n"); out.write(body); w("\nendobj\n")
      off
    }
    val xrefAt = out.size()
    w(s"xref\n0 ${objs.length + 1}\n0000000000 65535 f \n")
    offsets.foreach(off => w("%010d 00000 n \n".formatLocal(java.util.Locale.ROOT, off.toLong)))
    w(s"trailer\n<< /Size ${objs.length + 1} /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  test("Flate content, indirect /Length, inherited MediaBox all import") {
    val src = flateSource("flateword")
    val doc = PdfParse.parse(src).toOption.get
    val pages = doc.pages.toOption.get
    assert(pages.head.mediaBox.contains((0.0, 0.0, 400.0, 300.0))) // inherited
    val out = PdfRender.modifyExistingPdf(src,
      Hocr(pages = Vector(page(Seq("newocr"), 1)))).toOption.get
    val s = raw(out.pdf)
    // the imported content is INFLATED into the form (searchable again)
    assert(s.contains("(flateword) Tj") && s.contains("(newocr) Tj"))
    // template scale: source 400x300 drawn at page width 612 -> sx 1.53
    assert(s.contains("1.53 0 0 1.53"))
  }

  /** A PDF 1.5-style source: same objects as flateSource but indexed by
    * a cross-reference STREAM (/Type /XRef, W [1 2 1]), optionally
    * Flate-compressed with the PNG Up predictor — the encoding real
    * writers emit. */
  private def xrefStreamSource(word: String, flatePredictor: Boolean): Array[Byte] = {
    val content = s"BT /F9 12 Tf ($word) Tj ET"
    val objs = Vector(
      "<< /Type /Catalog /Pages 2 0 R >>".getBytes(ISO_8859_1),
      "<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 400 300] >>".getBytes(ISO_8859_1),
      "<< /Type /Page /Parent 2 0 R /Contents 4 0 R /Resources << >> >>".getBytes(ISO_8859_1),
      (s"<< /Length ${content.length} >>\nstream\n$content\nendstream").getBytes(ISO_8859_1))
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    w("%PDF-1.5\n")
    val offsets = objs.zipWithIndex.map { case (body, i) =>
      val off = out.size()
      w(s"${i + 1} 0 obj\n"); out.write(body); w("\nendobj\n")
      off
    }
    val xrefAt = out.size()
    // entries for objects 0..5: free, four type-1, the xref stream itself
    val rows: Seq[Array[Byte]] =
      Array[Byte](0, 0, 0, -1) +: // obj 0: type 0 (free); f2/f3 arbitrary
        (offsets.map(_.toLong) :+ xrefAt.toLong).map { off =>
          Array[Byte](1, ((off >> 8) & 0xFF).toByte, (off & 0xFF).toByte, 0)
        }
    val entryBytes: Array[Byte] =
      if (!flatePredictor) rows.flatten.toArray
      else {
        // PNG Up predictor (tag 2): row[i] - prevRow[i], then Flate
        val cols = 4
        var prev = new Array[Byte](cols)
        val enc = new java.io.ByteArrayOutputStream()
        rows.foreach { r =>
          enc.write(2)
          (0 until cols).foreach(i => enc.write((r(i) - prev(i)).toByte))
          prev = r
        }
        val deflater = new java.util.zip.Deflater()
        deflater.setInput(enc.toByteArray); deflater.finish()
        val buf = new Array[Byte](1024)
        val n = deflater.deflate(buf); deflater.end()
        java.util.Arrays.copyOf(buf, n)
      }
    val parms =
      if (flatePredictor) " /Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 4 >>"
      else ""
    w(s"5 0 obj\n<< /Type /XRef /Size 6 /W [1 2 1] /Root 1 0 R" +
      s" /Length ${entryBytes.length}$parms >>\nstream\n")
    out.write(entryBytes)
    w(s"\nendstream\nendobj\nstartxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  test("PDF 1.5 xref streams parse and import (raw and Flate+Predictor-12)") {
    for (pred <- Seq(false, true)) {
      val src = xrefStreamSource("xrefword", pred)
      val doc = PdfParse.parse(src).toOption.getOrElse(
        fail(s"xref-stream parse failed (pred=$pred): ${PdfParse.parse(src).left.toOption.get}"))
      val pages = doc.pages.toOption.get
      assert(pages.length == 1)
      assert(pages.head.mediaBox.contains((0.0, 0.0, 400.0, 300.0)))
      val out = PdfRender.modifyExistingPdf(src,
        Hocr(pages = Vector(page(Seq("newocr"), 1)))).toOption.get
      val s = raw(out.pdf)
      assert(s.contains("(xrefword) Tj") && s.contains("(newocr) Tj"))
    }
  }

  /** A fully-compressed PDF 1.5 source: catalog/pages/page dicts live
    * inside a /Type /ObjStm container (object 6), indexed by type-2
    * entries in a cross-reference stream. The content stream stays a
    * regular type-1 object (streams inside object streams are forbidden
    * by spec). */
  private def objStmSource(word: String, flateContainer: Boolean): Array[Byte] = {
    val content = s"BT /F9 12 Tf ($word) Tj ET"
    val inner = Vector(
      "<< /Type /Catalog /Pages 2 0 R >>",
      "<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 400 300] >>",
      "<< /Type /Page /Parent 2 0 R /Contents 4 0 R /Resources << >> >>")
    val innerOffs = inner.map(_.length + 1).scanLeft(0)(_ + _).take(3)
    val header = inner.indices.map(i => s"${i + 1} ${innerOffs(i)}").mkString(" ") + "\n"
    val stmPlain = (header + inner.mkString("\n") + "\n").getBytes(ISO_8859_1)
    val stmBytes =
      if (!flateContainer) stmPlain
      else {
        val d = new java.util.zip.Deflater()
        d.setInput(stmPlain); d.finish()
        val buf = new Array[Byte](4096)
        val n = d.deflate(buf); d.end()
        java.util.Arrays.copyOf(buf, n)
      }
    val filter = if (flateContainer) " /Filter /FlateDecode" else ""
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    w("%PDF-1.5\n")
    val off4 = out.size()
    w(s"4 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n")
    val off6 = out.size()
    w(s"6 0 obj\n<< /Type /ObjStm /N 3 /First ${header.length}" +
      s" /Length ${stmBytes.length}$filter >>\nstream\n")
    out.write(stmBytes)
    w("\nendstream\nendobj\n")
    val xrefAt = out.size()
    def t1(off: Long) = Array[Byte](1, ((off >> 8) & 0xFF).toByte, (off & 0xFF).toByte, 0)
    def t2(container: Int, idx: Int) = Array[Byte](2, 0, container.toByte, idx.toByte)
    val rows: Array[Byte] = Array.concat(
      Array[Byte](0, 0, 0, -1), // obj 0: free
      t2(6, 0), t2(6, 1), t2(6, 2), // objs 1-3 inside container 6
      t1(off4), t1(xrefAt), t1(off6))
    w(s"5 0 obj\n<< /Type /XRef /Size 7 /W [1 2 1] /Root 1 0 R" +
      s" /Length ${rows.length} >>\nstream\n")
    out.write(rows)
    w(s"\nendstream\nendobj\nstartxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  test("fully-compressed PDFs (/Type /ObjStm, type-2 entries) parse and import") {
    for (flate <- Seq(false, true)) {
      val src = objStmSource("objstmword", flate)
      val doc = PdfParse.parse(src).toOption.getOrElse(
        fail(s"objstm parse failed (flate=$flate): ${PdfParse.parse(src).left.toOption.get}"))
      val pages = doc.pages.toOption.getOrElse(
        fail(s"objstm page walk failed (flate=$flate): ${doc.pages.left.toOption.get}"))
      assert(pages.length == 1)
      assert(pages.head.mediaBox.contains((0.0, 0.0, 400.0, 300.0)))
      val out = PdfRender.modifyExistingPdf(src,
        Hocr(pages = Vector(page(Seq("newocr"), 1)))).toOption.get
      val s = raw(out.pdf)
      assert(s.contains("(objstmword) Tj") && s.contains("(newocr) Tj"))
    }
  }

  test("error paths: empty input, missing page, object-stream PDFs") {
    val hocr = Hocr(pages = Vector(page(Seq("w"), 1)))
    assert(PdfRender.modifyExistingPdf(Array.emptyByteArray, hocr).isLeft)
    val src = flateSource("x")
    assert(PdfRender.modifyExistingPdf(src, hocr, startFromPage = 2)
      .left.exists(_.contains("1 pages")))
    // startxref pointing at a bare object that is not a usable xref
    // stream: clear Left, no throw
    val xs = "%PDF-1.5\n7 0 obj\n<< /Type /XRef >>\nstream\nx\nendstream\nendobj\nstartxref\n9\n%%EOF\n"
    assert(PdfParse.parse(xs.getBytes(ISO_8859_1)).isLeft)
    // a type-2 entry whose /ObjStm container object is absent from the
    // file: clear Left, no throw
    val objStm = {
      val out = new java.io.ByteArrayOutputStream()
      def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
      w("%PDF-1.5\n")
      val xrefAt = out.size()
      // W [1 2 1]; obj0 free, obj1 type-2 (inside objstream 9), obj2 = xref stream
      val rows = Array[Byte](0, 0, 0, -1, 2, 0, 9, 0, 1, 0, xrefAt.toByte, 0)
      w(s"2 0 obj\n<< /Type /XRef /Size 3 /W [1 2 1] /Root 1 0 R /Length ${rows.length} >>\nstream\n")
      out.write(rows)
      w(s"\nendstream\nendobj\nstartxref\n$xrefAt\n%%EOF\n")
      out.toByteArray
    }
    assert(PdfParse.parse(objStm).left.exists(_.contains("object stream 9")))
    // structurally corrupt inputs must come back as Left, never throw:
    // truncated xref entries, offsets past EOF, garbage offsets
    // startxref points AT the truncated table: entry parsing must hit the
    // short row and come back Left (via the corrupt-structure catch)
    val truncated = "%PDF-1.4\nxref\n0 3\n0000000000 65535 f \n00000\nstartxref\n9\n%%EOF\n"
      .getBytes(ISO_8859_1)
    val good = flateSource("x")
    val goodText = new String(good, ISO_8859_1)
    val pastEof = goodText.replaceAll("startxref\n\\d+", "startxref\n999999999").getBytes(ISO_8859_1)
    Seq(
      truncated,
      "%PDF-1.4\nstartxref\nnotanumber\n%%EOF".getBytes(ISO_8859_1),
      pastEof,
      good.take(40).toArray // cut mid-object
    ).foreach { bytes =>
      PdfParse.parse(bytes) match {
        case Left(_) => // ok
        case Right(_) => fail("corrupt input parsed successfully")
      }
    }
  }
}
