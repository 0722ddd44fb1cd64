package graft.hocr

import scala.collection.mutable

/** Reading-order text extraction — mirrors
  * /root/reference/pkg/hocr/helpers.go:10-102 exactly, including the
  * line-dedup-by-ID behavior (empty-ID lines all collide after the first)
  * and the separators: word -> "text ", line -> "\n", page -> "\n\n".
  *
  * Order per page: areas (slice order) -> page-direct paragraphs ->
  * page-direct lines. Inside an area: paragraphs -> direct lines ->
  * direct words. Inside a paragraph: lines -> direct words. */
object HocrText {

  def extractText(doc: Hocr): String = {
    val sb = new StringBuilder
    doc.pages.foreach { page =>
      val processed = mutable.HashSet.empty[String]
      page.areas.foreach(a => extractAreaText(sb, a, processed))
      page.paragraphs.foreach(p => extractParagraphText(sb, p, processed))
      page.lines.foreach { line =>
        if (!processed.contains(line.id)) {
          extractLineText(sb, line)
          processed += line.id
        }
      }
      sb.append("\n\n")
    }
    sb.toString
  }

  private def extractAreaText(sb: StringBuilder, area: HArea, processed: mutable.HashSet[String]): Unit = {
    area.paragraphs.foreach(p => extractParagraphText(sb, p, processed))
    area.lines.foreach { line =>
      if (!processed.contains(line.id)) {
        extractLineText(sb, line)
        processed += line.id
      }
    }
    if (area.words.nonEmpty) {
      area.words.foreach(w => sb.append(w.text).append(' '))
      sb.append('\n')
    }
  }

  private def extractParagraphText(sb: StringBuilder, para: HPara, processed: mutable.HashSet[String]): Unit = {
    para.lines.foreach { line =>
      if (!processed.contains(line.id)) {
        extractLineText(sb, line)
        processed += line.id
      }
    }
    if (para.words.nonEmpty) {
      para.words.foreach(w => sb.append(w.text).append(' '))
      sb.append('\n')
    }
  }

  private def extractLineText(sb: StringBuilder, line: HLine): Unit = {
    line.words.foreach(w => sb.append(w.text).append(' '))
    sb.append('\n')
  }
}
