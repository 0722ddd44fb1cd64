package graft.layout

/** Layout model — the observable subset of the Document-AI-shaped proto
  * the reference consumes (/root/reference/pkg/gdocai/types.go and the
  * documentaipb fields referenced from hocr.go/document.go).
  *
  * Text anchors are [start,end) in CODEPOINTS into the page/document text
  * (Go rune indexing, /root/reference/pkg/gdocai/text.go:22). Vertices are
  * normalized (0-1); confidences are 0-1 floats (widened to 0-100 only at
  * hOCR word conversion, hocr.go:484).
  */
final case class TextSegment(start: Int, end: Int)
final case class LLayout(
    segments: Vector[TextSegment],
    confidence: Float = 0.0f,
    /** normalized vertices; hOCR bbox uses idx 0 (top-left) and 2
      * (bottom-right), hocr.go:348-352 */
    vertices: Vector[(Float, Float)] = Vector.empty)

final case class LToken(layout: Option[LLayout], detectedLanguages: Vector[String] = Vector.empty,
    hasBreak: Boolean = false)
final case class LLine(layout: Option[LLayout], detectedLanguages: Vector[String] = Vector.empty)
final case class LPara(layout: Option[LLayout])
final case class LBlock(layout: Option[LLayout])
final case class LFormField(fieldName: Option[LLayout], fieldValue: Option[LLayout])

final case class LPage(
    pageNumber: Int,
    dimW: Float,
    dimH: Float,
    layout: Option[LLayout] = None,
    detectedLanguages: Vector[String] = Vector.empty,
    blocks: Vector[LBlock] = Vector.empty,
    paragraphs: Vector[LPara] = Vector.empty,
    lines: Vector[LLine] = Vector.empty,
    tokens: Vector[LToken] = Vector.empty,
    formFields: Vector[LFormField] = Vector.empty)

final case class LEntity(
    entityType: String,
    mentionText: String,
    properties: Vector[LEntity] = Vector.empty)

final case class LDoc(text: String, pages: Vector[LPage], entities: Vector[LEntity] = Vector.empty)

/** Precomputed codepoint index: O(1) rune slicing instead of the
  * reference's O(doc_len) []rune re-materialization per element
  * (text.go:22) — observable output identical, per SURVEY.md §4.1. */
final class RuneIndex(val s: String) {
  // Fast path: no surrogate pairs => codepoint index == UTF-16 index,
  // slices are plain substrings and no position array is needed. Real
  // corpora are overwhelmingly BMP-only; the array is the non-BMP tax.
  private val identity: Boolean = {
    var i = 0
    var id = true
    while (id && i < s.length) { if (Character.isHighSurrogate(s.charAt(i))) id = false; i += 1 }
    id
  }
  // charPos(i) = UTF-16 offset of codepoint i; length = runeCount+1
  private val charPos: Array[Int] =
    if (identity) null
    else {
      val buf = new Array[Int](s.codePointCount(0, s.length) + 1)
      var ci = 0; var cp = 0
      while (ci < s.length) {
        buf(cp) = ci
        ci += Character.charCount(s.codePointAt(ci))
        cp += 1
      }
      buf(cp) = s.length
      buf
    }
  val runeCount: Int = if (identity) s.length else charPos.length - 1

  /** Go string([]rune(s)[start:end]) with textFromLayout clamping
    * (text.go:26-38). */
  def slice(start0: Int, end0: Int): String = {
    var start = if (start0 < 0) 0 else start0
    var end = if (end0 > runeCount) runeCount else end0
    if (end < 0) end = 0
    if (start > end) start = end
    if (start == end) ""
    else if (identity) s.substring(start, end)
    else s.substring(charPos(start), charPos(end))
  }
}

object Anchors {
  /** textFromLayout (text.go:18-41): concat of clamped rune slices over
    * all segments; None layout -> "". */
  def textFromLayout(layout: Option[LLayout], idx: RuneIndex): String = layout match {
    case None => ""
    case Some(l) =>
      if (l.segments.length == 1) idx.slice(l.segments.head.start, l.segments.head.end)
      else {
        val sb = new StringBuilder
        l.segments.foreach(seg => sb.append(idx.slice(seg.start, seg.end)))
        sb.toString
      }
  }

  /** isElementInParent (hocr.go:392-405): containment on segment[0] ONLY,
    * inclusive bounds; missing layout/anchor/segments -> false. */
  def isElementInParent(element: Option[LLayout], parent: Option[LLayout]): Boolean =
    (element, parent) match {
      case (Some(e), Some(p)) if e.segments.nonEmpty && p.segments.nonEmpty =>
        e.segments.head.start >= p.segments.head.start &&
        e.segments.head.end <= p.segments.head.end
      case _ => false
    }

  /** getLayoutKey (hocr.go:408-414): "start-end" of segment[0]; "" when
    * absent (all nil-layout lines collide). */
  def layoutKey(layout: Option[LLayout]): String = layout match {
    case Some(l) if l.segments.nonEmpty => s"${l.segments.head.start}-${l.segments.head.end}"
    case _ => ""
  }
}

/** Sorted-sweep containment matcher. Semantics identical to the
  * reference's O(parents x children) nested loops (document.go:211-247,
  * hocr.go:121-124/140-151): for a parent [ps,pe], matches are children
  * with start >= ps and end <= pe, returned in ORIGINAL child order; a
  * child may match multiple parents. Cost O(C log C) prep + per-parent
  * O(log C + hits + extra) where extra = children starting in-range but
  * ending outside. */
final class ContainmentIndex[T](children: IndexedSeq[T], layoutOf: T => Option[LLayout]) {
  // (start, end, originalIdx) for children with a usable anchor
  private val entries: Array[(Int, Int, Int)] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
    var i = 0
    while (i < children.length) {
      layoutOf(children(i)) match {
        case Some(l) if l.segments.nonEmpty =>
          buf += ((l.segments.head.start, l.segments.head.end, i))
        case _ =>
      }
      i += 1
    }
    buf.toArray.sortBy(e => (e._1, e._3))
  }
  private val starts: Array[Int] = entries.map(_._1)

  /** Children contained in [ps,pe], in original order. */
  def containedIn(parent: Option[LLayout]): Vector[(T, Int)] = parent match {
    case Some(p) if p.segments.nonEmpty =>
      val ps = p.segments.head.start
      val pe = p.segments.head.end
      var lo = java.util.Arrays.binarySearch(starts, ps)
      if (lo < 0) lo = -lo - 1 else { while (lo > 0 && starts(lo - 1) == ps) lo -= 1 }
      val hits = scala.collection.mutable.ArrayBuffer.empty[(T, Int)]
      var i = lo
      while (i < entries.length && entries(i)._1 <= pe) {
        if (entries(i)._2 <= pe) hits += ((children(entries(i)._3), entries(i)._3))
        i += 1
      }
      hits.sortBy(_._2).toVector
    case _ => Vector.empty
  }
}
