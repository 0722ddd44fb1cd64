package graft.pdf

import scala.collection.mutable

/** The non-Flate PDF stream filters (PDF 32000-1 §7.4), pure public
  * arithmetic — no codecs, no dependencies: ASCIIHexDecode,
  * ASCII85Decode, RunLengthDecode and LZWDecode (the TIFF/PDF variant:
  * MSB-first packing, 9→12-bit codes, Clear=256/EOD=257, earlyChange).
  * With these plus FlateDecode (and DCTDecode via PdfParse.dctDecode's
  * ImageIO path), every standard CONTENT-stream filter except the
  * JPX/CCITT image codecs (image XObjects are copied byte-verbatim,
  * never decoded) round-trips through [[PdfParse
  * .PdfDoc.decodedStream]], including filter CHAINS like
  * [/ASCII85Decode /FlateDecode]. Encoders exist for each so specs
  * exercise the decoders on real self-authored ciphertext, plus the
  * PDF-spec LZW known-answer vector. */
object PdfFilters {

  // ---- ASCIIHexDecode ----

  def asciiHexDecode(data: Array[Byte]): Either[String, Array[Byte]] = {
    val out = mutable.ArrayBuilder.make[Byte]
    var hi = -1
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val c = (data(i) & 0xFF).toChar
      if (c == '>') done = true
      else if (c.isWhitespace) ()
      else {
        val v = Character.digit(c, 16)
        if (v < 0) return Left(s"bad hex char '$c' in ASCIIHex stream")
        if (hi < 0) hi = v
        else { out += ((hi << 4) | v).toByte; hi = -1 }
      }
      i += 1
    }
    if (hi >= 0) out += (hi << 4).toByte // odd final digit: low nibble 0
    Right(out.result())
  }

  def asciiHexEncode(data: Array[Byte]): Array[Byte] =
    (data.map(b => f"${b & 0xFF}%02X").mkString + ">")
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  // ---- ASCII85Decode ----

  def ascii85Decode(data: Array[Byte]): Either[String, Array[Byte]] = {
    val out = mutable.ArrayBuilder.make[Byte]
    val grp = new Array[Int](5)
    var n = 0
    var i = 0
    var done = false
    def flush(k: Int): Option[String] = {
      // pad with 'u' (84) to a full group, emit k-1 bytes
      var j = k
      while (j < 5) { grp(j) = 84; j += 1 }
      var v = 0L
      j = 0
      while (j < 5) { v = v * 85 + grp(j); j += 1 }
      // a 5-digit base-85 group can encode up to 85^5-1 > 2^32-1; values
      // above 2^32-1 (e.g. "s8W-!") are invalid per spec — error, never
      // silently truncate to wrong bytes
      if (v > 0xFFFFFFFFL) return Some(f"ASCII85 group value 0x$v%x exceeds 2^32-1")
      var b = 0
      while (b < k - 1) { out += ((v >>> (24 - 8 * b)) & 0xFF).toByte; b += 1 }
      None
    }
    while (i < data.length && !done) {
      val c = (data(i) & 0xFF).toChar
      if (c == '~') done = true // "~>" EOD
      else if (c.isWhitespace) ()
      else if (c == 'z') {
        if (n != 0) return Left("'z' inside an ASCII85 group")
        out ++= Array[Byte](0, 0, 0, 0)
      } else if (c >= '!' && c <= 'u') {
        grp(n) = c - '!'
        n += 1
        if (n == 5) { flush(5).foreach(e => return Left(e)); n = 0 }
      } else return Left(s"bad ASCII85 char '$c'")
      i += 1
    }
    if (n == 1) return Left("single trailing ASCII85 char")
    if (n > 1) flush(n).foreach(e => return Left(e))
    Right(out.result())
  }

  def ascii85Encode(data: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    var i = 0
    while (i < data.length) {
      val k = math.min(4, data.length - i)
      var v = 0L
      var j = 0
      while (j < 4) {
        v = (v << 8) | (if (j < k) data(i + j) & 0xFF else 0)
        j += 1
      }
      if (k == 4 && v == 0L) sb.append('z')
      else {
        val digits = new Array[Char](5)
        var d = 4
        while (d >= 0) { digits(d) = ('!' + (v % 85).toInt).toChar; v /= 85; d -= 1 }
        sb.appendAll(digits, 0, k + 1)
      }
      i += 4
    }
    sb.append("~>")
    sb.toString.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  }

  // ---- RunLengthDecode ----

  def runLengthDecode(data: Array[Byte]): Either[String, Array[Byte]] = {
    val out = mutable.ArrayBuilder.make[Byte]
    var i = 0
    while (i < data.length) {
      val l = data(i) & 0xFF
      if (l == 128) return Right(out.result()) // EOD
      if (l < 128) {
        if (i + 1 + l + 1 > data.length) return Left("truncated RunLength literal run")
        out ++= data.slice(i + 1, i + 2 + l)
        i += 2 + l
      } else {
        if (i + 1 >= data.length) return Left("truncated RunLength repeat run")
        val b = data(i + 1)
        var r = 257 - l
        while (r > 0) { out += b; r -= 1 }
        i += 2
      }
    }
    Right(out.result()) // EOD byte is optional in practice
  }

  def runLengthEncode(data: Array[Byte]): Array[Byte] = {
    // naive literal-only runs (valid, not maximally compressed)
    val out = mutable.ArrayBuilder.make[Byte]
    var i = 0
    while (i < data.length) {
      val k = math.min(128, data.length - i)
      out += (k - 1).toByte
      out ++= data.slice(i, i + k)
      i += k
    }
    out += 128.toByte
    out.result()
  }

  // ---- LZWDecode (PDF/TIFF variant) ----

  def lzwDecode(data: Array[Byte], earlyChange: Boolean = true): Either[String, Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(data.length * 3)
    val nBits = data.length * 8
    var bitPos = 0
    var codeLen = 9
    val dict = mutable.ArrayBuffer.empty[Array[Byte]]
    def resetDict(): Unit = {
      dict.clear()
      var i = 0
      while (i < 256) { dict += Array(i.toByte); i += 1 }
      dict += Array.empty[Byte] // 256 Clear
      dict += Array.empty[Byte] // 257 EOD
      codeLen = 9
    }
    resetDict()
    var prev: Array[Byte] = null
    var done = false
    while (!done) {
      if (bitPos + codeLen > nBits) done = true
      else {
        var code = 0
        var i = 0
        while (i < codeLen) {
          val bit = (data((bitPos + i) >> 3) >> (7 - ((bitPos + i) & 7))) & 1
          code = (code << 1) | bit
          i += 1
        }
        bitPos += codeLen
        if (code == 257) done = true
        else if (code == 256) { resetDict(); prev = null }
        else {
          val entry: Array[Byte] =
            if (code < dict.length) dict(code)
            else if (code == dict.length && prev != null) prev :+ prev(0)
            else return Left(s"bad LZW code $code (dict ${dict.length})")
          out.write(entry, 0, entry.length)
          if (prev != null) dict += (prev :+ entry(0))
          prev = entry
          val limit = (1 << codeLen) - (if (earlyChange) 1 else 0)
          if (dict.length >= limit && codeLen < 12) codeLen += 1
        }
      }
    }
    Right(out.toByteArray)
  }

  /** Valid (uncompressing) LZW encoder: Clear, then one code per input
    * byte, then EOD — tracking the exact dictionary-growth/width rules
    * the decoder applies, so output is real spec-conformant LZW. */
  def lzwEncode(data: Array[Byte], earlyChange: Boolean = true): Array[Byte] = {
    val out = mutable.ArrayBuilder.make[Byte]
    var acc = 0L
    var accBits = 0
    var codeLen = 9
    var dictLen = 258
    def emit(code: Int): Unit = {
      acc = (acc << codeLen) | code
      accBits += codeLen
      while (accBits >= 8) {
        out += ((acc >>> (accBits - 8)) & 0xFF).toByte
        accBits -= 8
      }
    }
    emit(256) // Clear
    var i = 0
    while (i < data.length) {
      emit(data(i) & 0xFF)
      if (i > 0) { // decoder adds a dict entry for every code after the first
        dictLen += 1
        val limit = (1 << codeLen) - (if (earlyChange) 1 else 0)
        if (dictLen >= limit && codeLen < 12) codeLen += 1
      }
      i += 1
    }
    emit(257) // EOD
    if (accBits > 0) out += ((acc << (8 - accBits)) & 0xFF).toByte
    out.result()
  }
}
