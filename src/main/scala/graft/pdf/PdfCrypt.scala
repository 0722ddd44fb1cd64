package graft.pdf

import java.nio.charset.StandardCharsets.ISO_8859_1
import java.security.MessageDigest

import scala.collection.mutable

import PdfParse._

/** PDF standard security handler, RC4 variants (public PDF 32000-1
  * spec, §7.6.2-7.6.3 algorithms 1-5): V 1/2, R 2/3, 40-128 bit keys.
  * Decryption supports the ubiquitous "owner password only" class —
  * files any reader opens without a prompt (empty USER password); a
  * non-empty user password, AES (V≥4 /AESV2, /AESV3) and PDF 2.0
  * handlers are rejected with a clear error. The symmetric half
  * ([[encrypt]]) re-emits a parsed document RC4-encrypted — used by the
  * engine to password-protect its own output and by the spec to prove
  * the decrypt path on real ciphertext it did not author byte-by-byte.
  *
  * RC4 and MD5 come from the JVM (MessageDigest; RC4 is 15 lines of
  * public arithmetic) — zero new dependencies, mirroring the PdfParse
  * FlateDecode story. Reference context: the Go tool shells PDF I/O to
  * fpdf/gofpdi, which reject encrypted input outright
  * (/root/reference/pkg/pdfocr/modify.go:14-51 surfaces the library
  * error); supporting the no-prompt class here widens P-8 to scanner
  * output that sets an owner password, which real scan workflows do. */
object PdfCrypt {

  /** The spec's 32-byte password padding (algorithm 2 step a). */
  private val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  private def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  /** RC4 (KSA + PRGA). Symmetric: encrypt == decrypt. */
  def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(_.toByte)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + (s(i) & 0xFF) + (key(i % key.length) & 0xFF)) & 0xFF
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    var x = 0; var y = 0; var k = 0
    while (k < data.length) {
      x = (x + 1) & 0xFF
      y = (y + (s(x) & 0xFF)) & 0xFF
      val t = s(x); s(x) = s(y); s(y) = t
      out(k) = (data(k) ^ s(((s(x) & 0xFF) + (s(y) & 0xFF)) & 0xFF)).toByte
      k += 1
    }
    out
  }

  private def pad(pwd: Array[Byte]): Array[Byte] =
    (pwd.take(32) ++ Pad).take(32)

  /** Algorithm 2: the file encryption key (empty-or-given user pwd). */
  private def fileKey(userPwd: Array[Byte], o: Array[Byte], p: Int,
      id0: Array[Byte], n: Int, r: Int): Array[Byte] = {
    val pBytes = Array[Byte](
      (p & 0xFF).toByte, ((p >> 8) & 0xFF).toByte,
      ((p >> 16) & 0xFF).toByte, ((p >> 24) & 0xFF).toByte)
    var key = md5(pad(userPwd), o.take(32), pBytes, id0)
    if (r >= 3) (0 until 50).foreach(_ => key = md5(key.take(n)))
    key.take(n)
  }

  /** Algorithm 3: the /O value from the owner (or user) password. */
  private def computeO(ownerPwd: Array[Byte], userPwd: Array[Byte],
      n: Int, r: Int): Array[Byte] = {
    var key = md5(pad(if (ownerPwd.nonEmpty) ownerPwd else userPwd))
    if (r >= 3) (0 until 50).foreach(_ => key = md5(key))
    val rc4Key = key.take(n)
    var o = rc4(rc4Key, pad(userPwd))
    if (r >= 3) (1 to 19).foreach { i =>
      o = rc4(rc4Key.map(b => (b ^ i).toByte), o)
    }
    o
  }

  /** Algorithms 4/5: the /U value for the EMPTY user password. */
  private def computeU(fk: Array[Byte], id0: Array[Byte], r: Int): Array[Byte] =
    if (r == 2) rc4(fk, Pad)
    else {
      var u = rc4(fk, md5(Pad, id0))
      (1 to 19).foreach(i => u = rc4(fk.map(b => (b ^ i).toByte), u))
      u ++ new Array[Byte](16) // 32 bytes on disk; only 16 compared
    }

  /** Algorithm 1: the per-object RC4 key. */
  private def objectKey(fk: Array[Byte], num: Int, gen: Int): Array[Byte] =
    md5(fk, Array[Byte](
      (num & 0xFF).toByte, ((num >> 8) & 0xFF).toByte, ((num >> 16) & 0xFF).toByte,
      (gen & 0xFF).toByte, ((gen >> 8) & 0xFF).toByte))
      .take(math.min(fk.length + 5, 16))

  // ---- PDF string <-> byte helpers ----

  /** Literal-string unescape (spec table 3): \n \r \t \b \f \( \) \\,
    * \ooo octal (1-3 digits), backslash-EOL line continuation, lone
    * backslash dropped before any other char; a bare EOL in the string
    * reads as \n. */
  private[graft] def unescapeLit(inner: String): Array[Byte] = {
    val out = mutable.ArrayBuilder.make[Byte]
    var i = 0
    while (i < inner.length) {
      val c = inner.charAt(i)
      if (c == '\\' && i + 1 < inner.length) {
        inner.charAt(i + 1) match {
          case 'n' => out += '\n'.toByte; i += 2
          case 'r' => out += '\r'.toByte; i += 2
          case 't' => out += '\t'.toByte; i += 2
          case 'b' => out += '\b'.toByte; i += 2
          case 'f' => out += '\f'.toByte; i += 2
          case '\r' => i += 2; if (i < inner.length && inner.charAt(i) == '\n') i += 1
          case '\n' => i += 2
          case d if d >= '0' && d <= '7' =>
            var v = 0; var k = 0; i += 1
            while (k < 3 && i < inner.length && inner.charAt(i) >= '0' && inner.charAt(i) <= '7') {
              v = v * 8 + (inner.charAt(i) - '0'); i += 1; k += 1
            }
            out += (v & 0xFF).toByte
          case other => out += other.toByte; i += 2
        }
      } else if (c == '\r') {
        out += '\n'.toByte; i += 1
        if (i < inner.length && inner.charAt(i) == '\n') i += 1
      } else { out += c.toByte; i += 1 }
    }
    out.result()
  }

  /** Escape arbitrary bytes into literal-string inner text: backslash,
    * parens, and both EOL bytes (a raw EOL would read back as \n). */
  private[graft] def escapeLit(bytes: Array[Byte]): String = {
    val sb = new StringBuilder(bytes.length + 8)
    bytes.foreach { b =>
      (b & 0xFF) match {
        case 0x5C => sb.append("\\\\")
        case 0x28 => sb.append("\\(")
        case 0x29 => sb.append("\\)")
        case 0x0D => sb.append("\\015")
        case 0x0A => sb.append("\\012")
        case v => sb.append(v.toChar)
      }
    }
    sb.toString
  }

  private def hexToBytes(s: String): Array[Byte] = {
    val clean = s.filterNot(c => c == ' ' || c == '\n' || c == '\r' || c == '\t')
    val padded = if (clean.length % 2 == 1) clean + "0" else clean
    padded.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray
  }

  private def bytesToHex(b: Array[Byte]): String =
    b.map(x => f"${x & 0xFF}%02x").mkString

  private def strBytes(v: PVal): Option[Array[Byte]] = v match {
    case PLit(inner) => Some(unescapeLit(inner))
    case PHex(inner) => Some(hexToBytes(inner))
    case _ => None
  }

  // ---- decryption (called by PdfParse between object load and ObjStm
  //      extraction, so container streams decrypt before unpacking) ----

  private def isType(d: PVal, t: String): Boolean = d match {
    case dict: PDict => dict.get("Type").contains(PName(t))
    case _ => false
  }

  /** Decrypt every string and stream in place (per-object RC4 keys).
    * Skips the /Encrypt dictionary itself and /Type /XRef stream
    * objects (never encrypted per spec); /ObjStm container streams ARE
    * decrypted — their packed objects unpack as plaintext afterwards. */
  private[pdf] def decryptInPlace(objects: mutable.HashMap[Int, PObjDef],
      gens: collection.Map[Int, Int], trailer: PDict): Either[String, Unit] = {
    def resolve(v: PVal): PVal = v match {
      case PRef(n, _) => objects.get(n).map(o => resolve(o.value)).getOrElse(PKw("null"))
      case x => x
    }
    val encNum = trailer.get("Encrypt") match {
      case Some(PRef(n, _)) => n
      case Some(_: PDict) => -1
      case _ => return Left("trailer /Encrypt is neither a ref nor a dict")
    }
    val enc = resolve(trailer.get("Encrypt").get) match {
      case d: PDict => d
      case _ => return Left("unresolvable /Encrypt dictionary")
    }
    if (!enc.get("Filter").contains(PName("Standard")))
      return Left(s"unsupported encryption filter ${enc.get("Filter").map(serialize(_, identity)).getOrElse("?")} (only /Standard)")
    val v = enc.get("V").map(resolve).collect { case n: PNum => n.toInt }.getOrElse(0)
    val r = enc.get("R").map(resolve).collect { case n: PNum => n.toInt }.getOrElse(0)
    if (v < 1 || v > 2 || r < 2 || r > 3)
      return Left(s"unsupported encryption V=$v R=$r (RC4 V1/V2 R2/R3 only; AES and PDF 2.0 handlers are rejected)")
    val n = if (v == 1) 5
      else enc.get("Length").map(resolve).collect { case x: PNum => x.toInt }.getOrElse(40) / 8
    if (n < 5 || n > 16) return Left(s"implausible encryption key length ${n * 8}")
    val o = enc.get("O").map(resolve).flatMap(strBytes)
      .getOrElse(return Left("encryption dict missing /O"))
    val u = enc.get("U").map(resolve).flatMap(strBytes)
      .getOrElse(return Left("encryption dict missing /U"))
    if (o.length < 32 || u.length < 32) return Left("truncated /O or /U value")
    val p = enc.get("P").map(resolve).collect { case x: PNum => x.raw.toDouble.toLong.toInt }
      .getOrElse(return Left("encryption dict missing /P"))
    val id0 = trailer.get("ID").map(resolve) match {
      case Some(PArr(items)) if items.nonEmpty => strBytes(resolve(items.head)).getOrElse(Array.empty[Byte])
      case _ => Array.empty[Byte]
    }
    val fk = fileKey(Array.empty, o, p, id0, n, r)
    val uOk =
      if (r == 2) java.util.Arrays.equals(computeU(fk, id0, r), u.take(32))
      else computeU(fk, id0, r).take(16).sameElements(u.take(16))
    if (!uOk)
      return Left("encrypted PDF requires a non-empty user password (empty-password open failed /U check)")

    def walk(pv: PVal, key: Array[Byte]): PVal = pv match {
      case PLit(inner) => PLit(escapeLit(rc4(key, unescapeLit(inner))))
      case PHex(inner) => PHex(bytesToHex(rc4(key, hexToBytes(inner))))
      case PArr(items) => PArr(items.map(walk(_, key)))
      case PDict(entries) => PDict(entries.map { case (k, x) => k -> walk(x, key) })
      case other => other
    }
    objects.keys.toSeq.sorted.foreach { num =>
      val obj = objects(num)
      if (num != encNum && !isType(obj.value, "XRef")) {
        val key = objectKey(fk, num, gens.getOrElse(num, 0))
        objects(num) = PObjDef(num, walk(obj.value, key), obj.stream.map(rc4(key, _)))
      }
    }
    Right(())
  }

  // ---- encryption: re-emit a parsed doc as a classic RC4-encrypted PDF ----

  /** Encrypt a parsed document (R=3, V=2, 128-bit by default): computes
    * /O from the owner password and /U for the given user password
    * (empty = opens without a prompt), RC4s every string and stream,
    * and re-emits a classic-xref PDF. /Type /XRef and /ObjStm leftovers
    * from the parse are dropped — their payload objects already live in
    * the object map as plain values. */
  def encrypt(doc: PdfDoc, ownerPwd: String, userPwd: String = "",
      bits: Int = 128, r: Int = 3): Either[String, Array[Byte]] = {
    if (bits % 8 != 0 || bits < 40 || bits > 128) return Left(s"bad key size $bits")
    if (r != 2 && r != 3) return Left(s"unsupported revision $r")
    val n = if (r == 2) 5 else bits / 8 // R=2 is V=1: fixed 40-bit
    val keep = doc.objects.filter { case (_, o) =>
      !isType(o.value, "XRef") && !isType(o.value, "ObjStm")
    }
    val id0 = md5(keep.keys.toSeq.sorted.mkString(",").getBytes(ISO_8859_1),
      serialize(doc.trailer, identity).getBytes(ISO_8859_1))
    val p = -4 // all permissions
    val o = computeO(ownerPwd.getBytes(ISO_8859_1), userPwd.getBytes(ISO_8859_1), n, r)
    val fk = fileKey(userPwd.getBytes(ISO_8859_1), o, p, id0, n, r)
    val u = computeU(fk, id0, r)

    def walk(pv: PVal, key: Array[Byte]): PVal = pv match {
      case PLit(inner) => PLit(escapeLit(rc4(key, unescapeLit(inner))))
      case PHex(inner) => PHex(bytesToHex(rc4(key, hexToBytes(inner))))
      case PArr(items) => PArr(items.map(walk(_, key)))
      case PDict(entries) => PDict(entries.map { case (k, x) => k -> walk(x, key) })
      case other => other
    }
    val encNum = (keep.keys.toSet + 0).max + 1
    val encDict = PDict(Vector(
      "Filter" -> PName("Standard"),
      "V" -> PNum(if (r == 2) "1" else "2"), "R" -> PNum(r.toString)) ++
      (if (r == 2) Vector.empty else Vector("Length" -> PNum(bits.toString))) ++
      Vector("P" -> PNum(p.toString),
        "O" -> PHex(bytesToHex(o)), "U" -> PHex(bytesToHex(u))))

    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    w("%PDF-1.4\n%âãÏÓ\n")
    val offsets = mutable.HashMap.empty[Int, Long]
    keep.toSeq.sortBy(_._1).foreach { case (num, obj) =>
      val key = objectKey(fk, num, 0)
      offsets(num) = out.size().toLong
      w(s"$num 0 obj\n${serialize(walk(obj.value, key), identity)}\n")
      obj.stream.foreach { data =>
        w("stream\n"); out.write(rc4(key, data)); w("\nendstream\n")
      }
      w("endobj\n")
    }
    offsets(encNum) = out.size().toLong
    w(s"$encNum 0 obj\n${serialize(encDict, identity)}\nendobj\n")
    val size = encNum + 1
    val xrefAt = out.size().toLong
    w(s"xref\n0 $size\n")
    w("0000000000 65535 f \n")
    (1 until size).foreach { i =>
      w(offsets.get(i) match {
        case Some(off) => f"$off%010d 00000 n \n"
        case None => "0000000000 65535 f \n"
      })
    }
    val strip = Set("Size", "Prev", "XRefStm", "Encrypt", "ID",
      "Type", "W", "Index", "Filter", "Length", "DecodeParms", "First", "N")
    val kept = doc.trailer.entries.filterNot { case (k, _) => strip(k) }
    val tr = PDict(kept ++ Vector(
      "Size" -> PNum(size.toString), "Encrypt" -> PRef(encNum, 0),
      "ID" -> PArr(Vector(PHex(bytesToHex(id0)), PHex(bytesToHex(id0))))))
    w(s"trailer\n${serialize(tr, identity)}\nstartxref\n$xrefAt\n%%EOF\n")
    Right(out.toByteArray)
  }
}
