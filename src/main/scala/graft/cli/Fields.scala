package graft.cli

import java.util.regex.{Matcher, Pattern}

import graft.layout.Structured.{FArr, FMap, FStr, FVal}

/** CLI-layer field operators — mirrors /root/reference/cmd/gdocai/main.go
  * (placeholder substitution C-1/C-2, filename sanitization C-3). */
object Fields {

  /** `@{(form_field|extractor_field).name(:default)}` (main.go:189-249).
    * Lookup order without explicit source: both -> form wins (warn),
    * else form, else extractor, else default. */
  private val placeholderRe =
    Pattern.compile("""@\{(?:(form_field|extractor_field)\.)?([^:}]+)(?::([^}]*))?\}""")

  def processPlaceholders(
      input: String,
      formFields: collection.Map[String, FVal],
      extractorFields: collection.Map[String, FVal],
      warn: String => Unit = _ => ()): String = {
    val m = placeholderRe.matcher(input)
    val sb = new java.lang.StringBuffer
    while (m.find()) {
      val source = Option(m.group(1)).getOrElse("")
      val fieldName = graft.text.GoStrings.trimSpace(Option(m.group(2)).getOrElse(""))
      val default = Option(m.group(3)).getOrElse("")
      val replacement = source match {
        case "form_field" =>
          val v = lookupFieldValue(fieldName, formFields); if (v.nonEmpty) v else default
        case "extractor_field" =>
          val v = lookupFieldValue(fieldName, extractorFields); if (v.nonEmpty) v else default
        case _ =>
          val formValue = lookupFieldValue(fieldName, formFields)
          val customValue = lookupFieldValue(fieldName, extractorFields)
          if (formValue.nonEmpty && customValue.nonEmpty) {
            warn(s"Field '$fieldName' found in both form fields and custom extractor fields. Using form field value.")
            formValue
          } else if (formValue.nonEmpty) formValue
          else if (customValue.nonEmpty) customValue
          else default
      }
      m.appendReplacement(sb, Matcher.quoteReplacement(replacement))
    }
    m.appendTail(sb)
    sb.toString
  }

  /** lookupFieldValue (main.go:253-297): dot-path navigation; arrays ->
    * first element; maps -> `_value`. */
  def lookupFieldValue(fieldPath: String, data: collection.Map[String, FVal]): String = {
    val parts = fieldPath.split("\\.", -1)
    var current: Option[FVal] = Some(FMap(
      scala.collection.mutable.LinkedHashMap(data.toSeq: _*)))
    parts.foreach { part =>
      current = current match {
        case Some(FMap(mm)) => mm.get(part)
        case _ => None
      }
    }
    current match {
      case Some(FStr(s)) => s
      case Some(FArr(vs)) => vs.headOption.getOrElse("")
      case Some(FMap(mm)) => mm.get("_value") match {
        case Some(FStr(s)) => s
        case _ => ""
      }
      case None => ""
    }
  }

  private val reservedNames = Set(
    "con", "prn", "aux", "nul",
    "com1", "com2", "com3", "com4", "com5", "com6", "com7", "com8", "com9",
    "lpt1", "lpt2", "lpt3", "lpt4", "lpt5", "lpt6", "lpt7", "lpt8", "lpt9")

  private val controlChars = Pattern.compile("""[\x00-\x1F\x7F<>:"/\\|?*]""")

  /** Minimal deterministic ASCII transliteration (the reference uses the
    * anyascii table; we only need determinism + coverage of common Latin
    * accents — unknown non-ASCII folds to "", like anyascii's default for
    * unmapped planes). */
  def transliterate(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c < 0x80) sb.append(c)
      else {
        val d = java.text.Normalizer.normalize(c.toString, java.text.Normalizer.Form.NFKD)
          .filter(_ < 0x80)
        if (d.nonEmpty) sb.append(d)
        else c match {
          case 'ß' => sb.append("ss")
          case 'æ' | 'Æ' => sb.append(if (c == 'æ') "ae" else "AE")
          case 'ø' | 'Ø' => sb.append(if (c == 'ø') "o" else "O")
          case 'đ' | 'Đ' => sb.append(if (c == 'đ') "d" else "D")
          case 'þ' | 'Þ' => sb.append(if (c == 'þ') "th" else "TH")
          case '€' => sb.append("EUR")
          case _ => // unmapped -> dropped
        }
      }
      i += 1
    }
    sb.toString
  }

  /** sanitizeFilename (main.go:302-375). */
  def sanitizeFilename(filename0: String): String = {
    if (graft.text.GoStrings.trimSpace(filename0).isEmpty) return "unnamed"
    var filename = transliterate(filename0).toLowerCase
    filename = filename.replace("../", "").replace("..\\", "")
    var sanitized = controlChars.matcher(filename).replaceAll("_")
    sanitized = sanitized.replaceAll("_+", "_")
    sanitized = trimChars(sanitized, "_ .")
    // extension split (filepath.Ext: suffix from last '.')
    val dot = sanitized.lastIndexOf('.')
    val ext = if (dot >= 0) sanitized.substring(dot) else ""
    var baseName = if (ext.nonEmpty) sanitized.substring(0, sanitized.length - ext.length) else sanitized
    if (reservedNames.contains(baseName)) {
      baseName = "_" + baseName
      sanitized = baseName + ext
    }
    if (sanitized.isEmpty) sanitized = "unnamed"
    val maxLength = 240 // BYTES (Go len); truncation is UTF-8-safe
    val bytes = sanitized.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (bytes.length > maxLength) {
      val extBytes = ext.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var s =
        if (ext.nonEmpty) utf8Prefix(bytes, maxLength - extBytes.length) + ext
        else utf8Prefix(bytes, maxLength)
      sanitized = s
    }
    sanitized
  }

  private def trimChars(s: String, cutset: String): String = {
    var i = 0
    var j = s.length
    while (i < j && cutset.indexOf(s.charAt(i)) >= 0) i += 1
    while (j > i && cutset.indexOf(s.charAt(j - 1)) >= 0) j -= 1
    s.substring(i, j)
  }

  /** Byte-truncate then drop trailing bytes until valid UTF-8 (mirrors
    * main.go:370-372's ValidString loop). */
  private def utf8Prefix(bytes: Array[Byte], n: Int): String = {
    var len = Math.max(0, Math.min(n, bytes.length))
    def valid(l: Int): Boolean = {
      val cs = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      try { cs.decode(java.nio.ByteBuffer.wrap(bytes, 0, l)); true }
      catch { case _: Exception => false }
    }
    while (len > 0 && !valid(len)) len -= 1
    new String(bytes, 0, len, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Exit-code protocol (C-4, main.go:901-910 + cmd/pdfocr/main.go:323-331)
    * as job-level status aggregation: 3 = strict OCR block, 2 = "already
    * has OCR" or any warning, 1 = errors, 0 = clean. */
  def exitCode(nErrors: Long, nStrictOcrBlocks: Long, nHasOcr: Long, nWarnings: Long): Int =
    if (nStrictOcrBlocks > 0) 3
    else if (nHasOcr > 0 || nWarnings > 0) 2
    else if (nErrors > 0) 1
    else 0
}
