package graft.pdf

import java.nio.charset.StandardCharsets.ISO_8859_1

import scala.collection.mutable

import graft.hocr.Hocr

/** Deterministic PDF 1.4 writer — the binary sink for P-7/P-8
  * (/root/reference/pkg/pdfocr/create.go:14-65, layer.go:14-144), built
  * from the public PDF 1.4 specification only (no pdf library exists in
  * this environment). Produces what the reference's fpdf path produces
  * semantically:
  *
  *   - one PDF page per hOCR page, MediaBox = page bbox (points);
  *   - an Optional Content Group (OCG) per page named
  *     "{layerName} (Page N)" and registered in /OCProperties — the same
  *     structure our own P-3 `detectPdfLayers` regexes (and any PDF
  *     reader's layer panel) recognize;
  *   - the OCR text inside a marked-content /OC block, invisible via an
  *     alpha-0 ExtGState (fpdf's SetAlpha(0.0, "Normal"), layer.go:38) —
  *     selectable/searchable, not rendered;
  *   - per-word Helvetica at drawWord's fitted size and baseline
  *     (geometry from PdfOps.drawPage, identical to the positioned-spans
  *     relation);
  *   - optionally a full-page image underlay (create.go:44-46). JPEG
  *     payloads embed natively (DCTDecode passthrough + SOF header
  *     dimensions — no codec needed); PNG/GIF would require a real
  *     decode/recompress (no codecs in this container), so those pages
  *     emit the text layer without the underlay and carry a warning.
  *
  * Documented divergences from fpdf byte output (semantics preserved,
  * bytes not): object layout/ordering is ours; non-Latin-1 characters
  * render as '?' where Go writes mojibake fallback bytes
  * (layer.go:122-127 counts them as encoding errors either way — the
  * >10% error gate is preserved exactly).
  */
object PdfRender {

  /** An imported page background (gofpdi's "template" role): a Form
    * XObject assembled from a source page's content stream(s) and its
    * renumbered resources; `copied` source objects ride along in
    * `render`'s `extra` list. */
  final case class Tpl(
      bbox: (Double, Double, Double, Double), // source MediaBox
      content: Array[Byte],                   // decoded page content
      resources: String)                      // serialized, refs renumbered

  final case class PdfPage(
      width: Double, height: Double,
      image: Option[Array[Byte]],
      words: Vector[PdfOps.PositionedWord],
      layerName: String,
      template: Option[Tpl] = None)

  final case class PdfResult(pdf: Array[Byte], warnings: Vector[String])

  /** JPEG pixel dimensions from the SOF0/1/2/9/10 frame header (public
    * JFIF spec): FF D8, then marker segments FF mm len(2) payload; SOF
    * payload = precision(1) height(2) width(2). */
  def jpegDims(data: Array[Byte]): Option[(Int, Int)] = {
    def u8(i: Int) = data(i) & 0xFF
    if (data.length < 4 || u8(0) != 0xFF || u8(1) != 0xD8) return None
    var i = 2
    while (i + 3 < data.length) {
      if (u8(i) != 0xFF) return None
      var m = i + 1
      while (m < data.length && u8(m) == 0xFF) m += 1 // fill bytes
      if (m >= data.length) return None
      val marker = u8(m)
      if (marker == 0xD9 || marker == 0xDA) return None // EOI / SOS before SOF
      if (m + 2 >= data.length) return None
      val len = (u8(m + 1) << 8) | u8(m + 2)
      val isSof = (marker >= 0xC0 && marker <= 0xCF) &&
        marker != 0xC4 && marker != 0xC8 && marker != 0xCC
      if (isSof) {
        if (m + 7 >= data.length) return None
        val h = (u8(m + 4) << 8) | u8(m + 5)
        val w = (u8(m + 6) << 8) | u8(m + 7)
        return Some((w, h))
      }
      i = m + 1 + len
    }
    None
  }

  /** "%.2f" with a per-thread memo: word/page geometry comes from small
    * deterministic grids, so the distinct-coordinate vocabulary is tiny
    * while the call count is ~5 per word — and each uncached
    * formatLocal spins up a whole java.util.Formatter (the allocation
    * churn this host's 32-thread PDF path is bounded by). Same bytes:
    * the memo stores exactly the formatter's output. Cleared past 64k
    * entries as a leak guard (never fires on the deterministic grids). */
  private val f2Cache = new ThreadLocal[java.util.HashMap[java.lang.Double, String]] {
    override def initialValue(): java.util.HashMap[java.lang.Double, String] =
      new java.util.HashMap
  }
  private def f2(d: Double): String = {
    val m = f2Cache.get()
    val k = java.lang.Double.valueOf(d)
    var s = m.get(k)
    if (s == null) {
      if (m.size > 65536) m.clear()
      s = "%.2f".formatLocal(java.util.Locale.ROOT, d)
      m.put(k, s)
    }
    s
  }

  /** PDF literal-string escape over the Latin-1-projected text. The
    * reference encodes to ISO-8859-1 and falls back to the raw string on
    * failure (layer.go:122-127); we project unencodable chars to '?'. */
  private def pdfString(s: String): String = {
    val sb = new StringBuilder
    s.foreach { c =>
      val cc = if (c > 0xFF) '?' else c
      cc match {
        case '\\' => sb.append("\\\\")
        case '(' => sb.append("\\(")
        case ')' => sb.append("\\)")
        case '\r' => sb.append("\\r")
        case '\n' => sb.append("\\n")
        case other => sb.append(other)
      }
    }
    sb.toString
  }

  /** Assemble the byte stream: header, numbered objects, xref with exact
    * byte offsets, trailer. `extra` carries objects imported from a
    * source PDF (modify path) — ids must continue contiguously after the
    * page objects (see `objectCount`). */
  /** JPEG payloads embed natively via DCTDecode passthrough. */
  private def jpegEmbeddable(img: Array[Byte]): Boolean =
    PdfOps.detectImageType(img).contains("JPEG") && jpegDims(img).isDefined

  /** Non-JPEG underlays (PNG/GIF/TIFF/BMP) transcode to JPEG through
    * the JDK's own ImageIO readers/writers — zero new dependencies
    * (round-3: the earlier "no codecs in this environment" premise was
    * wrong for images). None when no reader decodes the payload. */
  private def transcodeToJpeg(img: Array[Byte]): Option[Array[Byte]] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(img))).map { bi =>
      val rgb = new java.awt.image.BufferedImage(bi.getWidth, bi.getHeight,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = rgb.createGraphics()
      g.drawImage(bi, 0, 0, null)
      g.dispose()
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(rgb, "jpg", out)
      out.toByteArray
    } catch { case _: Exception => None }

  def render(pages0: Seq[PdfPage], extra: Seq[(Int, Array[Byte])] = Nil): PdfResult = {
    val warnings = Vector.newBuilder[String]
    // normalize underlays up front: native JPEG passes through,
    // decodable non-JPEG transcodes, undecodable drops with a warning
    val pages = pages0.map { p =>
      p.image match {
        case Some(img) if !jpegEmbeddable(img) =>
          val codec = PdfOps.detectImageType(img).getOrElse("unknown")
          transcodeToJpeg(img).filter(jpegEmbeddable) match {
            case Some(j) =>
              warnings += s"image underlay transcoded $codec -> JPEG via ImageIO"
              p.copy(image = Some(j))
            case None =>
              warnings += s"image underlay skipped (codec $codec not decodable); text layer emitted"
              p.copy(image = None)
          }
        case _ => p
      }
    }
    final case class Ids(page: Int, content: Int, ocg: Int, image: Option[Int], form: Option[Int])
    var next = 5 // 1 Catalog, 2 Pages, 3 Font, 4 ExtGState
    val ids = pages.map { p =>
      val embeddable = p.image.isDefined
      val base = 3 + (if (embeddable) 1 else 0)
      val r = Ids(next, next + 1, next + 2,
        if (embeddable) Some(next + 3) else None,
        if (p.template.isDefined) Some(next + base) else None)
      next += base + (if (p.template.isDefined) 1 else 0)
      r
    }

    val objs = mutable.LinkedHashMap.empty[Int, Array[Byte]]
    def put(id: Int, body: String): Unit = objs(id) = body.getBytes(ISO_8859_1)

    val ocgRefs = ids.map(i => s"${i.ocg} 0 R").mkString(" ")
    put(1,
      s"<< /Type /Catalog /Pages 2 0 R /OCProperties << /OCGs [$ocgRefs] " +
      s"/D << /Order [$ocgRefs] /ON [$ocgRefs] >> >> >>")
    put(2,
      s"<< /Type /Pages /Kids [${ids.map(i => s"${i.page} 0 R").mkString(" ")}] /Count ${ids.length} >>")
    put(3, "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")
    put(4, "<< /Type /ExtGState /BM /Normal /CA 0.000 /ca 0.000 >>")

    pages.zip(ids).zipWithIndex.foreach { case ((p, id), k) =>
      val xobjEntries =
        id.image.map(i => s"/Img$k $i 0 R").toSeq ++
        id.form.map(f => s"/Tpl$k $f 0 R").toSeq
      val xobj = if (xobjEntries.isEmpty) "" else s" /XObject << ${xobjEntries.mkString(" ")} >>"
      put(id.page,
        s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 ${f2(p.width)} ${f2(p.height)}] " +
        s"/Resources << /Font << /F1 3 0 R >> /ExtGState << /GS0 4 0 R >>$xobj " +
        s"/Properties << /OC$k ${id.ocg} 0 R >> >> /Contents ${id.content} 0 R >>")

      val body = new StringBuilder
      p.template.foreach { t =>
        // gofpdi's UseImportedTemplate(x=0, y=0, w=pageW, h=auto)
        // placement math (modify.go:38): scale the source MediaBox to the
        // page width, aspect-preserving, anchored at the page top-left.
        val (bx1, by1, bx2, by2) = t.bbox
        val (bw, bh) = (bx2 - bx1, by2 - by1)
        val sx = if (bw != 0) p.width / bw else 1.0
        val hDraw = bh * sx
        val tx = -bx1 * sx
        val ty = (p.height - hDraw) - by1 * sx
        body.append(s"q\n${f2(sx)} 0 0 ${f2(sx)} ${f2(tx)} ${f2(ty)} cm\n/Tpl$k Do\nQ\n")
      }
      if (id.image.isDefined)
        body.append(s"q\n${f2(p.width)} 0 0 ${f2(p.height)} 0 0 cm\n/Img$k Do\nQ\n")
      body.append(s"/OC /OC$k BDC\nq\n/GS0 gs\nBT\n")
      p.words.foreach { w =>
        body.append(s"/F1 ${f2(w.fontSize)} Tf\n")
        body.append(s"1 0 0 1 ${f2(w.x)} ${f2(p.height - w.yBaseline)} Tm\n")
        body.append(s"(${pdfString(w.text)}) Tj\n")
      }
      body.append("ET\nQ\nEMC\n")
      val bodyBytes = body.toString.getBytes(ISO_8859_1)
      objs(id.content) =
        (s"<< /Length ${bodyBytes.length} >>\nstream\n".getBytes(ISO_8859_1) ++
         bodyBytes ++ "\nendstream".getBytes(ISO_8859_1))

      put(id.ocg, s"<< /Type /OCG /Name (${pdfString(p.layerName)}) >>")

      id.image.foreach { imgId =>
        val img = p.image.get
        val (iw, ih) = jpegDims(img).get
        objs(imgId) =
          (s"<< /Type /XObject /Subtype /Image /Width $iw /Height $ih " +
           s"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /DCTDecode " +
           s"/Length ${img.length} >>\nstream\n").getBytes(ISO_8859_1) ++
          img ++ "\nendstream".getBytes(ISO_8859_1)
      }

      id.form.foreach { formId =>
        val t = p.template.get
        val (bx1, by1, bx2, by2) = t.bbox
        objs(formId) =
          (s"<< /Type /XObject /Subtype /Form /FormType 1 " +
           s"/BBox [${f2(bx1)} ${f2(by1)} ${f2(bx2)} ${f2(by2)}] " +
           s"/Resources ${t.resources} /Length ${t.content.length} >>\nstream\n").getBytes(ISO_8859_1) ++
          t.content ++ "\nendstream".getBytes(ISO_8859_1)
      }
    }

    extra.foreach { case (id, body) =>
      require(id >= next, s"extra object id $id collides with page objects (< $next)")
      objs(id) = body
    }
    val size = ((next - 1) +: extra.map(_._1)).max + 1
    // the single-section xref declares every id in [1, size) in-use
    require(objs.keySet == (1 until size).toSet,
      s"object ids not contiguous: missing ${(1 until size).toSet -- objs.keySet}")

    val out = new java.io.ByteArrayOutputStream()
    def write(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    // binary-content comment line per spec so transfers treat the file as binary
    write("%PDF-1.4\n%âãÏÓ\n")
    val offsets = new Array[Long](size)
    objs.keys.toSeq.sorted.foreach { id =>
      offsets(id) = out.size().toLong
      write(s"$id 0 obj\n")
      out.write(objs(id))
      write("\nendobj\n")
    }
    val xrefAt = out.size()
    write(s"xref\n0 $size\n")
    write("0000000000 65535 f \n")
    (1 until size).foreach(id => write("%010d 00000 n \n".formatLocal(java.util.Locale.ROOT, offsets(id))))
    write(s"trailer\n<< /Size $size /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    PdfResult(out.toByteArray, warnings.result())
  }

  /** P-7 createPDFFromImage (create.go:14-65): new searchable PDF from
    * page images + the hOCR layout. Page i gets image i, MediaBox from
    * the page bbox, and the invisible OCR layer "{layerName} (Page N)".
    * The loop bound, 1-based page numbering, startFromPage offset, and
    * the >10% encoding-error failure (layer.go:104-107) all match the
    * reference. */
  def createPdfFromImages(
      hocr: Hocr,
      imagesData: Seq[Array[Byte]],
      startFromPage: Int = 1,
      layerNameBase: String = "OCR Text",
      font: PdfOps.FontConfig = PdfOps.FontConfig()): Either[String, PdfResult] = {
    val startIdx = startFromPage - 1
    val pages = Vector.newBuilder[PdfPage]
    var i = startIdx
    while (i < hocr.pages.length && i < imagesData.length) {
      val page = hocr.pages(i)
      val (w, h) = (page.bbox.x2, page.bbox.y2)
      // create.go's transform normalizes hOCR coords to the SAME (w,h) —
      // identity by construction; drawPage applies it
      val drawn = PdfOps.drawPage(page,
        (x, y) => PdfOps.normalizeCoords(x, y, w, h, w, h), font)
      if (drawn.tooManyEncodingErrors)
        return Left(s"character encoding issues in ${drawn.encodingErrors} of ${drawn.wordCount} words")
      pages += PdfPage(w, h, Some(imagesData(i)), drawn.words,
        PdfOps.layerName(layerNameBase, i + 1))
      i += 1
    }
    Right(render(pages.result()))
  }

  /** P-8 OCR-layer pages WITHOUT background import — the fallback when
    * no source PDF bytes are available (e.g. the distributed sink builds
    * pages straight from media). For the full modifyExistingPDF
    * semantics (original page background imported under the OCR layer),
    * see [[modifyExistingPdf]]. */
  def applyOcrPdf(
      hocr: Hocr,
      layerNameBase: String = "OCR Text",
      font: PdfOps.FontConfig = PdfOps.FontConfig()): Either[String, PdfResult] = {
    val pages = Vector.newBuilder[PdfPage]
    var i = 0
    while (i < hocr.pages.length) {
      val page = hocr.pages(i)
      // modify.go uses the identity transform
      val drawn = PdfOps.drawPage(page, (x, y) => (x, y), font)
      if (drawn.tooManyEncodingErrors)
        return Left(s"character encoding issues in ${drawn.encodingErrors} of ${drawn.wordCount} words")
      pages += PdfPage(page.bbox.x2, page.bbox.y2, None, drawn.words,
        PdfOps.layerName(layerNameBase, i + 1))
      i += 1
    }
    Right(render(pages.result()))
  }

  /** P-8 modifyExistingPDF (modify.go:14-51), full semantics: import
    * each source page as a Form XObject template (content stream(s) +
    * resources, the gofpdi role), draw it scaled to the hOCR page width
    * at the top-left (UseImportedTemplate(0, 0, bbox.X2, 0)), then
    * overlay the invisible OCR layer with the identity transform —
    * exactly the reference's loop. hOCR page i maps to source page
    * i + startFromPage (1-based), and the output has one page per hOCR
    * page (modify.go:33-48).
    *
    * Source support = PdfParse's (classic xref, uncompressed or Flate
    * content streams); resource objects (images, fonts) are copied
    * byte-verbatim whatever their encoding. */
  def modifyExistingPdf(
      inputPdf: Array[Byte],
      hocr: Hocr,
      startFromPage: Int = 1,
      layerNameBase: String = "OCR Text",
      font: PdfOps.FontConfig = PdfOps.FontConfig()): Either[String, PdfResult] = {
    import PdfParse._
    val doc = parse(inputPdf) match {
      case Right(d) => d
      case Left(e) => return Left(s"cannot parse source PDF: $e")
    }
    val srcPages = doc.pages match {
      case Right(p) => p
      case Left(e) => return Left(s"cannot read source page tree: $e")
    }
    val warnings = Vector.newBuilder[String]
    val nPages = hocr.pages.length
    val extrasBase = 5 + 4 * nPages // per page: page, content, ocg, form

    // resolve + collect everything each used source page needs
    final case class Prepared(tplBbox: (Double, Double, Double, Double),
        content: Array[Byte], resources: PVal)
    val prepared = new Array[Prepared](nPages)
    val roots = scala.collection.mutable.HashSet.empty[Int]
    var i = 0
    while (i < nPages) {
      val srcIdx = i + startFromPage - 1
      if (srcIdx < 0 || srcIdx >= srcPages.length)
        return Left(s"source PDF has ${srcPages.length} pages; page ${srcIdx + 1} requested")
      val sp = srcPages(srcIdx)
      val bbox = sp.mediaBox.getOrElse(return Left(s"source page ${srcIdx + 1} has no /MediaBox"))
      if (sp.rotate % 360 != 0)
        warnings += s"source page ${srcIdx + 1} /Rotate ${sp.rotate} ignored (rotation not supported)"
      val content = new java.io.ByteArrayOutputStream()
      sp.contentObjs.foreach { cn =>
        doc.decodedStream(cn) match {
          case Right(b) => content.write(b); content.write('\n')
          case Left(e) => return Left(s"source page ${srcIdx + 1}: $e")
        }
      }
      val res = sp.resources.getOrElse(PDict(Vector.empty))
      collectRefs(res, roots)
      prepared(i) = Prepared(bbox, content.toByteArray, res)
      i += 1
    }

    // copy the reachable source objects under new contiguous ids
    val copyOlds = reachable(doc, roots.toSet).toSeq.sorted
    val renum: Map[Int, Int] = copyOlds.zipWithIndex
      .map { case (old, k) => old -> (extrasBase + k) }.toMap
    def rn(old: Int): Int = renum.getOrElse(old, 0) // 0 0 R = harmless null ref
    val extra = copyOlds.flatMap { old =>
      doc.objects.get(old) match {
        case Some(PObjDef(_, v, stream)) =>
          val head = serialize(v, rn).getBytes(ISO_8859_1)
          val body = stream match {
            case Some(data) =>
              head ++ "\nstream\n".getBytes(ISO_8859_1) ++ data ++ "\nendstream".getBytes(ISO_8859_1)
            case None => head
          }
          Some(renum(old) -> body)
        case None =>
          warnings += s"source object $old referenced but absent; copied as null"
          Some(renum(old) -> "null".getBytes(ISO_8859_1))
      }
    }

    val outPages = Vector.newBuilder[PdfPage]
    i = 0
    while (i < nPages) {
      val page = hocr.pages(i)
      val drawn = PdfOps.drawPage(page, (x, y) => (x, y), font) // identity (modify.go:40-42)
      if (drawn.tooManyEncodingErrors)
        return Left(s"character encoding issues in ${drawn.encodingErrors} of ${drawn.wordCount} words")
      val prep = prepared(i)
      outPages += PdfPage(page.bbox.x2, page.bbox.y2, None, drawn.words,
        PdfOps.layerName(layerNameBase, i + 1),
        template = Some(Tpl(prep.tplBbox, prep.content, serialize(prep.resources, rn))))
      i += 1
    }
    val r = render(outPages.result(), extra)
    Right(PdfResult(r.pdf, warnings.result() ++ r.warnings))
  }
}
