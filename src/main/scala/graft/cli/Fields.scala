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

  /** Post-NFKD single-char fold table for letters NFKD cannot reduce:
    * Latin specials, the Greek and Cyrillic alphabets (standard
    * romanization), typographic punctuation. The reference uses the
    * anyascii table (main.go:307); shipping that table verbatim is out of
    * scope (zero egress), so this is our own deterministic romanization —
    * a DOCUMENTED divergence on exotic planes, but common European
    * scripts now fold instead of dropping. Lowercase keys only: callers
    * see the result lowercased by sanitizeFilename anyway, and uppercase
    * source chars are folded via toLower below. */
  private val foldTable: Map[Char, String] = {
    val latin = Map(
      'ß' -> "ss", 'æ' -> "ae", 'ø' -> "o", 'đ' -> "d", 'þ' -> "th",
      'ð' -> "d", 'ł' -> "l", 'œ' -> "oe", 'ŋ' -> "ng", 'ħ' -> "h")
    val greek = Map(
      'α' -> "a", 'β' -> "b", 'γ' -> "g", 'δ' -> "d", 'ε' -> "e",
      'ζ' -> "z", 'η' -> "e", 'θ' -> "th", 'ι' -> "i", 'κ' -> "k",
      'λ' -> "l", 'μ' -> "m", 'ν' -> "n", 'ξ' -> "x", 'ο' -> "o",
      'π' -> "p", 'ρ' -> "r", 'σ' -> "s", 'ς' -> "s", 'τ' -> "t",
      'υ' -> "y", 'φ' -> "f", 'χ' -> "ch", 'ψ' -> "ps", 'ω' -> "o")
    val cyrillic = Map(
      'а' -> "a", 'б' -> "b", 'в' -> "v", 'г' -> "g", 'д' -> "d",
      'е' -> "e", 'ё' -> "e", 'ж' -> "zh", 'з' -> "z", 'и' -> "i",
      'й' -> "i", 'к' -> "k", 'л' -> "l", 'м' -> "m", 'н' -> "n",
      'о' -> "o", 'п' -> "p", 'р' -> "r", 'с' -> "s", 'т' -> "t",
      'у' -> "u", 'ф' -> "f", 'х' -> "kh", 'ц' -> "ts", 'ч' -> "ch",
      'ш' -> "sh", 'щ' -> "shch", 'ъ' -> "", 'ы' -> "y", 'ь' -> "",
      'э' -> "e", 'ю' -> "yu", 'я' -> "ya")
    val punct = Map(
      '‐' -> "-", '‑' -> "-", '–' -> "-", '—' -> "-",
      '‘' -> "'", '’' -> "'", '“' -> "\"", '”' -> "\"",
      '«' -> "\"", '»' -> "\"", '•' -> "*", '·' -> "*",
      '€' -> "EUR", '£' -> "GBP", '¥' -> "JPY",
      '©' -> "(c)", '®' -> "(r)", '°' -> "deg")
    latin ++ greek ++ cyrillic ++ punct
  }

  /** Deterministic ASCII transliteration: NFKD per CODEPOINT (so
    * compatibility forms — fullwidth, mathematical alphanumerics like
    * the non-BMP Fraktur vocab word — reduce to their ASCII base), then
    * the fold table for what NFKD cannot reduce; anything still unmapped
    * drops (like anyascii's default for unmapped planes). */
  def transliterate(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      if (cp < 0x80) sb.append(cp.toChar)
      else {
        val d = java.text.Normalizer.normalize(
          new String(Character.toChars(cp)), java.text.Normalizer.Form.NFKD)
        d.foreach { dc =>
          if (dc < 0x80) sb.append(dc)
          else foldTable.get(dc) match {
            case Some(f) => sb.append(f)
            case None =>
              val lower = Character.toLowerCase(dc)
              foldTable.get(lower).foreach { f =>
                // Locale.ROOT: default-locale toUpperCase is host-dependent
                // (tr-TR turns "i" into non-ASCII U+0130)
                sb.append(if (f.nonEmpty && Character.isUpperCase(dc))
                  f.toUpperCase(java.util.Locale.ROOT) else f)
              } // else: combining marks / unmapped planes drop
          }
        }
      }
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
