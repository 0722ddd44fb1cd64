package graft.hocr

import graft.model.BBox

/** hOCR object model — mirrors /root/reference/pkg/hocr/types.go.
  * Class tags: page=ocr_page, area=ocr_carea, paragraph=ocr_par,
  * line=ocr_line, word=ocrx_word (types.go Class() methods). */
final case class HWord(
    id: String = "",
    text: String = "",
    bbox: BBox = BBox.zero,
    confidence: Double = 0.0, // 0-100
    lang: String = "",
    metadata: Map[String, String] = Map.empty)

final case class HLine(
    id: String = "",
    lang: String = "",
    bbox: BBox = BBox.zero,
    baseline: String = "",
    words: Vector[HWord] = Vector.empty,
    metadata: Map[String, String] = Map.empty)

final case class HPara(
    id: String = "",
    lang: String = "",
    bbox: BBox = BBox.zero,
    lines: Vector[HLine] = Vector.empty,
    words: Vector[HWord] = Vector.empty, // direct words (no lines)
    metadata: Map[String, String] = Map.empty)

final case class HArea(
    id: String = "",
    lang: String = "",
    bbox: BBox = BBox.zero,
    paragraphs: Vector[HPara] = Vector.empty,
    lines: Vector[HLine] = Vector.empty,  // direct lines
    words: Vector[HWord] = Vector.empty,  // direct words
    metadata: Map[String, String] = Map.empty)

final case class HPage(
    id: String = "",
    title: String = "",
    pageNumber: Int = 0,
    imageName: String = "",
    lang: String = "",
    bbox: BBox = BBox.zero,
    areas: Vector[HArea] = Vector.empty,
    paragraphs: Vector[HPara] = Vector.empty, // direct paragraphs
    lines: Vector[HLine] = Vector.empty,      // direct lines
    metadata: Map[String, String] = Map.empty)

final case class Hocr(
    title: String = "",
    description: String = "",
    language: String = "",
    metadata: Map[String, String] = Map.empty,
    pages: Vector[HPage] = Vector.empty)
