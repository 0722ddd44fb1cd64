package graft.hocr

import graft.text.GoStrings.{goF0, goFloat}

/** hOCR XHTML rendering — byte-parity re-implementation of
  * /root/reference/pkg/hocr/generate.go:16-32 +
  * /root/reference/pkg/hocr/templates/hocr.tmpl (text/template, so values
  * are NOT HTML-escaped; Go template `range` over a map iterates in
  * sorted-key order; floats print as Go `%v`; x_wconf as `%.0f` and only
  * when confidence != 0; ppageno only when > 0). */
object HocrRender {

  def render(doc: Hocr): String = {
    val sb = new StringBuilder(4096)
    val lang = if (doc.language.nonEmpty) doc.language else "unknown"
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append("<!DOCTYPE html PUBLIC \"-//W3C//DTD XHTML 1.0 Transitional//EN\" \"http://www.w3.org/TR/xhtml1/DTD/xhtml1-transitional.dtd\">\n")
    sb.append("<html xmlns=\"http://www.w3.org/1999/xhtml\" xml:lang=\"").append(lang)
      .append("\" lang=\"").append(lang).append("\">\n")
    sb.append("<head>\n")
    sb.append("    <title>").append(if (doc.title.nonEmpty) doc.title else "Document OCR").append("</title>\n")
    sb.append("    <meta http-equiv=\"Content-Type\" content=\"text/html;charset=utf-8\" />")
    // metadata in sorted-key order (Go template map range, tmpl:7-9)
    doc.metadata.toSeq.sortBy(_._1).foreach { case (k, v) =>
      sb.append("\n    <meta name=\"").append(k).append("\" content=\"").append(v).append("\" />")
    }
    if (!doc.metadata.contains("ocr-system"))
      sb.append("\n    <meta name=\"ocr-system\" content=\"hOCR\" />")
    if (!doc.metadata.contains("ocr-number-of-pages"))
      sb.append("\n    <meta name=\"ocr-number-of-pages\" content=\"").append(doc.pages.length).append("\" />")
    if (!doc.metadata.contains("ocr-langs"))
      sb.append("\n    <meta name=\"ocr-langs\" content=\"").append(lang).append("\" />")
    if (doc.description.nonEmpty)
      sb.append("\n    <meta name=\"description\" content=\"").append(doc.description).append("\" />")
    sb.append("\n</head>\n<body>")

    doc.pages.foreach { page =>
      sb.append("\n    <div class='ocr_page' id='").append(page.id).append('\'')
      if (page.lang.nonEmpty) sb.append(" lang='").append(page.lang).append('\'')
      sb.append(" title='bbox ").append(goFloat(page.bbox.x1)).append(' ').append(goFloat(page.bbox.y1))
        .append(' ').append(goFloat(page.bbox.x2)).append(' ').append(goFloat(page.bbox.y2))
      if (page.imageName.nonEmpty) sb.append("; image ").append(page.imageName)
      if (page.pageNumber > 0) sb.append("; ppageno ").append(page.pageNumber)
      sb.append("'>")

      page.areas.foreach { area =>
        sb.append("\n        <div class='ocr_carea' id='").append(area.id).append('\'')
        if (area.lang.nonEmpty) sb.append(" lang='").append(area.lang).append('\'')
        appendBBoxTitle(sb, area.bbox); sb.append("'>")
        area.paragraphs.foreach { para =>
          sb.append("\n            <p class='ocr_par' id='").append(para.id).append('\'')
          if (para.lang.nonEmpty) sb.append(" lang='").append(para.lang).append('\'')
          appendBBoxTitle(sb, para.bbox); sb.append("'>")
          para.lines.foreach(line => appendLine(sb, line, "\n                "))
          if (para.words.nonEmpty) {
            sb.append("\n                <!-- Direct words in paragraph (if no lines) -->")
            para.words.foreach(w => { sb.append("\n                "); appendWord(sb, w) })
          }
          sb.append("\n            </p>")
        }
        area.lines.foreach(line => appendLine(sb, line, "\n            "))
        if (area.words.nonEmpty) {
          sb.append("\n            <!-- Direct words in area (if no lines) -->")
          area.words.foreach(w => { sb.append("\n            "); appendWord(sb, w) })
        }
        sb.append("\n        </div>")
      }

      page.paragraphs.foreach { para =>
        sb.append("\n        <p class='ocr_par' id='").append(para.id).append('\'')
        if (para.lang.nonEmpty) sb.append(" lang='").append(para.lang).append('\'')
        appendBBoxTitle(sb, para.bbox); sb.append("'>")
        para.lines.foreach(line => appendLine(sb, line, "\n            "))
        if (para.words.nonEmpty) {
          sb.append("\n            <!-- Direct words in paragraph (if no lines) -->")
          para.words.foreach(w => { sb.append("\n            "); appendWord(sb, w) })
        }
        sb.append("\n        </p>")
      }

      if (page.lines.nonEmpty) {
        sb.append("\n        <!-- Direct lines in page (if no areas, blocks, or paragraphs) -->")
        page.lines.foreach(line => appendLine(sb, line, "\n        "))
      }
      sb.append("\n    </div>")
    }
    sb.append("\n</body>\n</html>\n")
    sb.toString
  }

  private def appendBBoxTitle(sb: StringBuilder, b: graft.model.BBox): Unit =
    sb.append(" title='bbox ").append(goFloat(b.x1)).append(' ').append(goFloat(b.y1))
      .append(' ').append(goFloat(b.x2)).append(' ').append(goFloat(b.y2))

  private def appendLine(sb: StringBuilder, line: HLine, indent: String): Unit = {
    sb.append(indent)
    sb.append("<span class='ocr_line' id='").append(line.id).append('\'')
    if (line.lang.nonEmpty) sb.append(" lang='").append(line.lang).append('\'')
    appendBBoxTitle(sb, line.bbox)
    if (line.baseline.nonEmpty) sb.append("; baseline ").append(line.baseline)
    sb.append("'>")
    line.words.foreach(w => appendWord(sb, w)) // inline, no separators
    sb.append("</span>")
  }

  private def appendWord(sb: StringBuilder, w: HWord): Unit = {
    sb.append("<span class='ocrx_word' id='").append(w.id).append('\'')
    if (w.lang.nonEmpty) sb.append(" lang='").append(w.lang).append('\'')
    appendBBoxTitle(sb, w.bbox)
    if (w.confidence != 0.0) sb.append("; x_wconf ").append(goF0(w.confidence))
    sb.append("'>").append(w.text).append("</span>")
  }
}
