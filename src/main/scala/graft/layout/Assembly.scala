package graft.layout

import scala.collection.mutable

import graft.hocr._
import graft.model.BBox
import graft.text.GoStrings

/** hOCR assembly from the layout model — mirrors
  * /root/reference/pkg/gdocai/hocr.go (CreateHOCRPage and friends). */
object Assembly {

  /** getHocrBoundingBox (hocr.go:344-354): normalized vertices x page
    * dimension, Go int(v*dim + 0.5) = float32 multiply then truncation
    * toward zero; needs >= 4 vertices, uses idx 0 and 2. */
  def hocrBBox(layout: Option[LLayout], dimW: Float, dimH: Float): Option[BBox] =
    layout match {
      case Some(l) if l.vertices.length >= 4 =>
        val minX = (l.vertices(0)._1 * dimW + 0.5f).toInt
        val minY = (l.vertices(0)._2 * dimH + 0.5f).toInt
        val maxX = (l.vertices(2)._1 * dimW + 0.5f).toInt
        val maxY = (l.vertices(2)._2 * dimH + 0.5f).toInt
        Some(BBox(minX, minY, maxX, maxY))
      case _ => None
    }

  /** convertLineFromProto (hocr.go:417-496). `tokens` must be the page's
    * token ContainmentIndex (original indices = tidx in word IDs). */
  def convertLine(
      line: LLine, tokenIndex: ContainmentIndex[LToken], page: LPage, idx: RuneIndex,
      pageNum: Int, blockIdx: Int, paraIdx: Int, lineIdx: Int): HLine = {
    // Locals + single construction per node (no copy-per-field churn):
    // this is the per-token hot loop of the media assembly path, where
    // allocation rate is the measured scaling limiter (CLAUDE.md).
    // (baseline branch of hocr.go:433-436 can never fire: the title string
    // built from getHocrBoundingBox only ever contains "bbox".)
    val lineBBox = hocrBBox(line.layout, page.dimW, page.dimH).getOrElse(BBox.zero)
    val lineLang =
      if (line.detectedLanguages.nonEmpty) line.detectedLanguages.head else ""
    val words = Vector.newBuilder[HWord]
    tokenIndex.containedIn(line.layout).foreach { case (token, tidx) =>
      val cleanText = GoStrings.cleanTokenText(
        Anchors.textFromLayout(token.layout, idx), token.hasBreak)
      val wBBox = hocrBBox(token.layout, page.dimW, page.dimH).getOrElse(BBox.zero)
      val wConf = token.layout match {
        case Some(l) => (l.confidence * 100f).toDouble
        case None    => 0.0
      }
      val wLang =
        if (token.detectedLanguages.nonEmpty) token.detectedLanguages.head else ""
      words += HWord(
        id = s"word_${pageNum}_${blockIdx}_${paraIdx}_${lineIdx}_$tidx",
        text = cleanText, bbox = wBBox, confidence = wConf, lang = wLang)
    }
    HLine(id = s"line_${pageNum}_${blockIdx}_${paraIdx}_$lineIdx",
      lang = lineLang, bbox = lineBBox, words = words.result())
  }

  /** CreateHOCRPage (hocr.go:76-217): blocks -> areas `carea_p_a`;
    * paragraphs assigned to each containing block (`par_p_a_i`, duplicated
    * when contained in several); lines assigned likewise; paragraphs in no
    * block -> page-direct `par_p_direct_i`; lines never assigned -> page
    * direct. assignedLines is keyed by layoutKey across ALL passes. */
  def createHocrPage(page: LPage, fullTextIdx: RuneIndex, pageNumber: Int): HPage = {
    var ocrPage = HPage(id = s"page_$pageNumber", pageNumber = pageNumber)
    if (page.detectedLanguages.nonEmpty)
      ocrPage = ocrPage.copy(lang = page.detectedLanguages.head)
    hocrBBox(page.layout, page.dimW, page.dimH).foreach(b => ocrPage = ocrPage.copy(bbox = b))

    val tokenIndex = new ContainmentIndex[LToken](page.tokens, _.layout)
    val paraIndex = new ContainmentIndex[LPara](page.paragraphs, _.layout)
    val lineIndex = new ContainmentIndex[LLine](page.lines, _.layout)
    val assignedLines = mutable.HashSet.empty[String]

    val areas = Vector.newBuilder[HArea]
    page.blocks.zipWithIndex.foreach { case (block, aidx) =>
      var ocrArea = HArea(id = s"carea_${pageNumber}_$aidx")
      hocrBBox(block.layout, page.dimW, page.dimH).foreach(b => ocrArea = ocrArea.copy(bbox = b))
      val paras = Vector.newBuilder[HPara]
      paraIndex.containedIn(block.layout).foreach { case (para, pidx) =>
        var ocrPara = HPara(id = s"par_${pageNumber}_${aidx}_$pidx")
        hocrBBox(para.layout, page.dimW, page.dimH).foreach(b => ocrPara = ocrPara.copy(bbox = b))
        val lines = Vector.newBuilder[HLine]
        lineIndex.containedIn(para.layout).foreach { case (line, lidx) =>
          assignedLines += Anchors.layoutKey(line.layout)
          lines += convertLine(line, tokenIndex, page, fullTextIdx, pageNumber, aidx, pidx, lidx)
        }
        paras += ocrPara.copy(lines = lines.result())
      }
      areas += ocrArea.copy(paragraphs = paras.result())
    }
    ocrPage = ocrPage.copy(areas = areas.result())

    // Paragraphs not contained in any block (hocr.go:162-205).
    val directParas = Vector.newBuilder[HPara]
    page.paragraphs.zipWithIndex.foreach { case (para, pidx) =>
      val isAssigned = page.blocks.exists(b => Anchors.isElementInParent(para.layout, b.layout))
      if (!isAssigned) {
        var ocrPara = HPara(id = s"par_${pageNumber}_direct_$pidx")
        hocrBBox(para.layout, page.dimW, page.dimH).foreach(b => ocrPara = ocrPara.copy(bbox = b))
        val lines = Vector.newBuilder[HLine]
        lineIndex.containedIn(para.layout).foreach { case (line, lidx) =>
          assignedLines += Anchors.layoutKey(line.layout)
          lines += convertLine(line, tokenIndex, page, fullTextIdx, pageNumber, 0, pidx, lidx)
        }
        directParas += ocrPara.copy(lines = lines.result())
      }
    }
    ocrPage = ocrPage.copy(paragraphs = directParas.result())

    // Lines never assigned anywhere -> page-direct (hocr.go:208-214).
    val directLines = Vector.newBuilder[HLine]
    page.lines.zipWithIndex.foreach { case (line, lidx) =>
      if (!assignedLines.contains(Anchors.layoutKey(line.layout)))
        directLines += convertLine(line, tokenIndex, page, fullTextIdx, pageNumber, 0, 0, lidx)
    }
    ocrPage.copy(lines = directLines.result())
  }

  /** getDocumentLanguage (hocr.go:358-389): frequency argmax over
    * page-level + token-level detected languages. The reference's Go map
    * iteration makes ties NONDETERMINISTIC; we pin the deterministic rule
    * "highest count, then lexicographically smallest" (SURVEY.md §7.4#3). */
  def documentLanguage(doc: LDoc): String = {
    val counts = mutable.HashMap.empty[String, Int]
    doc.pages.foreach { page =>
      page.detectedLanguages.foreach(l => counts(l) = counts.getOrElse(l, 0) + 1)
      page.tokens.foreach(_.detectedLanguages.foreach(l => counts(l) = counts.getOrElse(l, 0) + 1))
    }
    if (counts.isEmpty) ""
    else counts.toSeq.minBy { case (lang, c) => (-c, lang) }._1
  }

  /** CreateHOCRDocument (hocr.go:35-73). */
  def createHocrDocument(doc: Option[LDoc], pages: Vector[HPage]): Hocr = {
    var docLang = "unknown"
    var pageCount = pages.length
    doc.foreach { d =>
      val fromDoc = documentLanguage(d)
      if (fromDoc.nonEmpty) docLang = fromDoc
      if (pageCount == 0) pageCount = d.pages.length
    }
    var result = Hocr(
      title = "Document OCR",
      language = docLang,
      metadata = Map(
        "ocr-system" -> "Document AI OCR",
        "ocr-number-of-pages" -> pageCount.toString,
        "ocr-capabilities" -> "ocrp_lang ocr_page ocr_carea ocr_par ocr_line ocrx_word",
        "ocr-langs" -> docLang),
      pages = pages)
    if (pages.nonEmpty) result = updateDocumentLanguages(result)
    result
  }

  /** updateDocumentLanguages (hocr.go:220-340): collect every level's
    * lang, drop ""/"unknown"; reference joins in Go-map (nondeterministic)
    * order — we pin SORTED order (metadata only; not part of the span
    * invariant). */
  def updateDocumentLanguages(result: Hocr): Hocr = {
    val all = mutable.HashSet.empty[String]
    all += result.language
    result.pages.foreach { page =>
      if (page.lang.nonEmpty) all += page.lang
      def addLine(l: HLine): Unit = {
        if (l.lang.nonEmpty) all += l.lang
        l.words.foreach(w => if (w.lang.nonEmpty) all += w.lang)
      }
      def addPara(p: HPara): Unit = {
        if (p.lang.nonEmpty) all += p.lang
        p.lines.foreach(addLine)
        p.words.foreach(w => if (w.lang.nonEmpty) all += w.lang)
      }
      page.areas.foreach { a =>
        if (a.lang.nonEmpty) all += a.lang
        a.paragraphs.foreach(addPara)
        a.lines.foreach(addLine)
        a.words.foreach(w => if (w.lang.nonEmpty) all += w.lang)
      }
      page.paragraphs.foreach(addPara)
      page.lines.foreach(addLine)
    }
    val langs = all.toSeq.filter(l => l.nonEmpty && l != "unknown").sorted
    if (langs.nonEmpty)
      result.copy(metadata = result.metadata.updated("ocr-langs", langs.mkString(", ")))
    else result
  }

  /** CreateHOCRStruct (hocr.go:12-30): page.PageNumber drives the IDs. */
  def createHocrStruct(doc: LDoc): Hocr = {
    val idx = new RuneIndex(doc.text)
    val pages = doc.pages.map(p => createHocrPage(p, idx, p.pageNumber))
    createHocrDocument(Some(doc), pages)
  }
}
