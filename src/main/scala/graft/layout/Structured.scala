package graft.layout

import scala.collection.mutable

import graft.text.GoStrings

/** Structured-document assembly and field extraction — mirrors
  * /root/reference/pkg/gdocai/document.go, form_fields.go,
  * custom_extractor_fields.go. */
object Structured {

  /** One assembled page: flat element texts + the derived hierarchy
    * (document.go:68-177). Children are indices into the flat lists. */
  final case class SPage(
      pageNumber: Int,
      text: String,
      tokens: Vector[String],
      lines: Vector[String],
      paragraphs: Vector[String],
      blocks: Vector[String],
      lineTokens: Vector[Vector[Int]],
      paraLines: Vector[Vector[Int]],
      blockParas: Vector[Vector[Int]])

  /** createPagesFromProtoDoc (document.go:68-177): resolve texts (tokens
    * get the DetectedBreak one-char trim, :97-106), build hierarchy by
    * interval containment on segment[0] (getChildElements :181-248), then
    * sort pages by PageNumber when >1 and first > 0 (:169-174). */
  def createPages(doc: LDoc): Vector[SPage] = {
    val idx = new RuneIndex(doc.text)
    var result = doc.pages.map { page =>
      val tokens = page.tokens.map { t =>
        val txt = Anchors.textFromLayout(t.layout, idx)
        if (t.hasBreak) GoStrings.trimOneTrailingBreak(txt) else txt
      }
      val tokenIndex = new ContainmentIndex[LToken](page.tokens, _.layout)
      val lineIndex = new ContainmentIndex[LLine](page.lines, _.layout)
      val paraIndex = new ContainmentIndex[LPara](page.paragraphs, _.layout)
      // getChildElements returns nil for a parent without a usable anchor.
      def kids[C](parent: Option[LLayout], index: ContainmentIndex[C]): Vector[Int] =
        parent match {
          case Some(l) if l.segments.nonEmpty => index.containedIn(parent).map(_._2)
          case _ => Vector.empty
        }
      SPage(
        pageNumber = page.pageNumber,
        text = Anchors.textFromLayout(page.layout, idx),
        tokens = tokens,
        lines = page.lines.map(l => Anchors.textFromLayout(l.layout, idx)),
        paragraphs = page.paragraphs.map(p => Anchors.textFromLayout(p.layout, idx)),
        blocks = page.blocks.map(b => Anchors.textFromLayout(b.layout, idx)),
        lineTokens = page.lines.map(l => kids(l.layout, tokenIndex)),
        paraLines = page.paragraphs.map(p => kids(p.layout, lineIndex)),
        blockParas = page.blocks.map(b => kids(b.layout, paraIndex)))
    }
    if (result.length > 1 && result.head.pageNumber > 0)
      result = result.sortBy(_.pageNumber) // stable, like sort.Slice in practice
    result
  }

  /** Dynamic field value: string | array | nested map — the
    * map[string]interface{} of the reference, rendered to JSON with
    * sorted keys (Go's encoding/json also sorts map keys). */
  sealed trait FVal
  final case class FStr(s: String) extends FVal
  final case class FArr(vs: Vector[String]) extends FVal
  final case class FMap(m: mutable.LinkedHashMap[String, FVal]) extends FVal

  def toJson(v: FVal): String = v match {
    case FStr(s)  => quote(s)
    case FArr(vs) => vs.map(quote).mkString("[", ",", "]")
    case FMap(m)  =>
      m.toSeq.sortBy(_._1)
        .map { case (k, fv) => quote(k) + ":" + toJson(fv) }
        .mkString("{", ",", "}")
  }

  private def quote(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  /** ExtractFormFields (form_fields.go:11-41): key = TrimSpace minus one
    * trailing ':'; skip empty keys; duplicate key folding: string->array
    * only when the new value DIFFERS, array append is unconditional (note
    * the asymmetry vs addValueToMap, which dedups). */
  def extractFormFields(doc: LDoc): mutable.LinkedHashMap[String, FVal] = {
    val idx = new RuneIndex(doc.text)
    val fields = mutable.LinkedHashMap.empty[String, FVal]
    doc.pages.foreach { page =>
      page.formFields.foreach { field =>
        val key = GoStrings.trimSuffix(
          GoStrings.trimSpace(Anchors.textFromLayout(field.fieldName, idx)), ":")
        val value = GoStrings.trimSpace(Anchors.textFromLayout(field.fieldValue, idx))
        if (key.nonEmpty) {
          fields.get(key) match {
            case Some(FStr(v)) => if (v != value) fields(key) = FArr(Vector(v, value))
            case Some(FArr(vs)) => fields(key) = FArr(vs :+ value)
            case Some(_) => // map value cannot occur for form fields
            case None => fields(key) = FStr(value)
          }
        }
      }
    }
    fields
  }

  /** ExtractCustomExtractorFields + processEntity + addValueToMap
    * (custom_extractor_fields.go:9-112). */
  def extractEntityFields(doc: LDoc): mutable.LinkedHashMap[String, FVal] = {
    val fields = mutable.LinkedHashMap.empty[String, FVal]
    doc.entities.foreach { e => if (e.entityType.nonEmpty) processEntity(e, fields) }
    fields
  }

  private def processEntity(entity: LEntity, fields: mutable.LinkedHashMap[String, FVal]): Unit = {
    val key = entity.entityType
    val value = entity.mentionText
    if (entity.properties.nonEmpty) {
      val propMap: mutable.LinkedHashMap[String, FVal] = fields.get(key) match {
        case Some(FMap(m)) => m
        case Some(other) =>
          val m = mutable.LinkedHashMap.empty[String, FVal]
          m("_value") = other
          m
        case None =>
          val m = mutable.LinkedHashMap.empty[String, FVal]
          if (value.nonEmpty) m("_value") = FStr(value)
          m
      }
      entity.properties.foreach(p => processEntity(p, propMap))
      fields(key) = FMap(propMap)
    } else addValueToMap(fields, key, value)
  }

  /** addValueToMap (custom_extractor_fields.go:73-112): string->array only
    * when different AND non-empty; array append DEDUPS; map -> _value;
    * absent with empty value -> empty map. */
  private def addValueToMap(fields: mutable.LinkedHashMap[String, FVal], key: String, value: String): Unit = {
    if (key.isEmpty) return
    fields.get(key) match {
      case Some(FStr(v)) =>
        if (v != value && value.nonEmpty) fields(key) = FArr(Vector(v, value))
      case Some(FArr(vs)) =>
        if (value.nonEmpty && !vs.contains(value)) fields(key) = FArr(vs :+ value)
      case Some(FMap(m)) =>
        if (value.nonEmpty) addValueToMap(m, "_value", value)
      case None =>
        if (value.nonEmpty) fields(key) = FStr(value)
        else fields(key) = FMap(mutable.LinkedHashMap.empty)
    }
  }
}
