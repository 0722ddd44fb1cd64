package graft.pdf

import java.nio.charset.StandardCharsets.ISO_8859_1
import java.security.MessageDigest

import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

import scala.collection.mutable

import PdfParse._

/** PDF standard security handler (public PDF 32000-1 §7.6 and 32000-2
  * §7.6 algorithms): RC4 V 1/2 R 2/3 (40-128 bit), AES-128-CBC V 4 R 4
  * (/AESV2 crypt filter, per-object keys with the sAlT suffix), and
  * AES-256-CBC V 5 R 5/6 (/AESV3, SHA-256/384/512 hash chain of ISO
  * 32000-2 algorithm 2.B, /UE-wrapped file key, /Perms cross-check).
  * Decryption covers the ubiquitous "owner password only" class —
  * files any reader opens without a prompt (empty USER password) —
  * AND password-prompted files: a password handed to
  * [[PdfParse.parse]] is tried as the user password, then as the
  * owner password (algorithm 7 RC4-unwrap of /O for the classic
  * handlers; the /O hash + /OE unwrap for V5). Only non-Standard
  * (e.g. certificate) security handlers are rejected, with a clear
  * error. The symmetric half ([[encrypt]],
  * [[encryptAes128]], [[encryptAes256]]) re-emits a parsed document
  * encrypted — used by the engine to password-protect its own output
  * and by the spec to prove the decrypt path on real ciphertext it did
  * not author byte-by-byte.
  *
  * RC4 is 15 lines of public arithmetic; MD5/SHA-2 and AES-CBC come
  * from the JVM (MessageDigest, javax.crypto) — zero new dependencies,
  * mirroring the PdfParse FlateDecode story. Reference context: the Go
  * tool shells PDF I/O to fpdf/gofpdi, which reject encrypted input
  * outright (/root/reference/pkg/pdfocr/modify.go:14-51 surfaces the
  * library error); supporting the no-prompt class here widens P-8 to
  * scanner output that sets an owner password, which real scan
  * workflows do. */
object PdfCrypt {

  /** The spec's 32-byte password padding (algorithm 2 step a). */
  private val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  // getInstance() takes a JCA provider lock — at 32 executor threads the
  // per-call lookups SERIALIZE (measured: q_pdf_encrypt 31.7s -> ~8s at
  // sf0.1 after caching). Digests and ciphers are not thread-safe, so
  // the cache is per thread; digest() auto-resets, init() re-keys.
  private val mdCache = new ThreadLocal[mutable.HashMap[String, MessageDigest]] {
    override def initialValue(): mutable.HashMap[String, MessageDigest] =
      mutable.HashMap.empty
  }
  private def digestFor(alg: String): MessageDigest = {
    val d = mdCache.get().getOrElseUpdate(alg, MessageDigest.getInstance(alg))
    d.reset(); d
  }

  private def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = digestFor("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  private def sha(alg: String, parts: Array[Byte]*): Array[Byte] = {
    val d = digestFor(alg)
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

  // ---- AES plumbing (JDK javax.crypto; JDK 9+ ships unlimited-strength
  //      policy, so AES-256 needs no extra setup) ----

  private val cipherCache = new ThreadLocal[mutable.HashMap[String, Cipher]] {
    override def initialValue(): mutable.HashMap[String, Cipher] =
      mutable.HashMap.empty
  }
  private def cipherFor(tf: String): Cipher =
    cipherCache.get().getOrElseUpdate(tf, Cipher.getInstance(tf))

  private def aesCbc(encryptMode: Boolean, key: Array[Byte], iv: Array[Byte],
      data: Array[Byte], padded: Boolean): Array[Byte] = {
    val c = cipherFor(if (padded) "AES/CBC/PKCS5Padding" else "AES/CBC/NoPadding")
    c.init(if (encryptMode) Cipher.ENCRYPT_MODE else Cipher.DECRYPT_MODE,
      new SecretKeySpec(key, "AES"), new IvParameterSpec(iv))
    c.doFinal(data)
  }

  private def aesEcb(encryptMode: Boolean, key: Array[Byte], block: Array[Byte]): Array[Byte] = {
    val c = cipherFor("AES/ECB/NoPadding")
    c.init(if (encryptMode) Cipher.ENCRYPT_MODE else Cipher.DECRYPT_MODE,
      new SecretKeySpec(key, "AES"))
    c.doFinal(block)
  }

  /** IV-prefixed CBC blob (spec §7.6.3.1): 16-byte IV then PKCS#7-padded
    * ciphertext. STRINGS decode leniently — structurally impossible
    * input decrypts to empty, matching how readers treat zero-length
    * encrypted strings; STREAMS use [[aesBlobDecStrict]] so truncated
    * ciphertext surfaces as a parse error instead of silently-empty
    * content. */
  private def aesBlobDec(key: Array[Byte], data: Array[Byte]): Array[Byte] =
    if (data.length < 32 || (data.length - 16) % 16 != 0) Array.empty[Byte]
    else aesCbc(encryptMode = false, key, data.take(16), data.drop(16), padded = true)

  private def aesBlobDecStrict(key: Array[Byte], data: Array[Byte]): Array[Byte] =
    if (data.length < 32 || (data.length - 16) % 16 != 0)
      throw new javax.crypto.BadPaddingException(
        s"AES stream ciphertext structurally invalid (${data.length} bytes: need 16-byte IV + non-empty 16-aligned blocks)")
    else aesCbc(encryptMode = false, key, data.take(16), data.drop(16), padded = true)

  private def aesBlobEnc(key: Array[Byte], iv: Array[Byte], data: Array[Byte]): Array[Byte] =
    iv ++ aesCbc(encryptMode = true, key, iv, data, padded = true)

  /** ISO 32000-2 algorithm 2.B — the R=6 password hash: an iterated
    * SHA-256/384/512 chain where each round AES-128-CBC-encrypts 64
    * copies of (password ‖ K ‖ udata) under the previous digest and the
    * first-16-byte sum mod 3 picks the next hash width. At least 64
    * rounds; stops when the last ciphertext byte ≤ round − 32. */
  private[graft] def hash2B(pwd: Array[Byte], salt: Array[Byte],
      udata: Array[Byte]): Array[Byte] = {
    var k = sha("SHA-256", pwd, salt, udata)
    // Round buffers (unit / 64-copy block / ciphertext) are reused across
    // the >= 64 rounds: K varies 32/48/64 bytes by round, so the buffers
    // are sized for the max and sliced by the round's true length. The
    // per-round `pwd ++ k ++ udata` + two fresh ~5 KB arrays were the
    // dominant allocation of the battery's crypto path, and ALLOCATION
    // RATE (not crypto) is the measured 32-thread wall on this host
    // (CLAUDE.md crypto lessons). Byte-for-byte the same chain.
    val maxUnit = pwd.length + 64 + udata.length
    val unit = new Array[Byte](maxUnit)
    val k1 = new Array[Byte](maxUnit * 64)
    val e = new Array[Byte](maxUnit * 64)
    var i = 0
    var done = false
    while (!done) {
      val ulen = pwd.length + k.length + udata.length
      System.arraycopy(pwd, 0, unit, 0, pwd.length)
      System.arraycopy(k, 0, unit, pwd.length, k.length)
      System.arraycopy(udata, 0, unit, pwd.length + k.length, udata.length)
      var j = 0
      while (j < 64) { System.arraycopy(unit, 0, k1, j * ulen, ulen); j += 1 }
      val c = cipherFor("AES/CBC/NoPadding")
      c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(k, 0, 16, "AES"),
        new IvParameterSpec(k, 16, 16))
      val elen = c.doFinal(k1, 0, ulen * 64, e)
      var sum = 0
      var t = 0
      while (t < 16) { sum += e(t) & 0xFF; t += 1 }
      val alg = (sum % 3) match {
        case 0 => "SHA-256"
        case 1 => "SHA-384"
        case _ => "SHA-512"
      }
      val d = digestFor(alg)
      d.update(e, 0, elen)
      k = d.digest()
      i += 1
      done = i >= 64 && (e(elen - 1) & 0xFF) <= i - 32
    }
    k.take(32)
  }

  private def pad(pwd: Array[Byte]): Array[Byte] =
    (pwd.take(32) ++ Pad).take(32)

  /** Algorithm 2: the file encryption key (empty-or-given user pwd).
    * R≥4 with /EncryptMetadata false appends 0xFFFFFFFF (step f). */
  private def fileKey(userPwd: Array[Byte], o: Array[Byte], p: Int,
      id0: Array[Byte], n: Int, r: Int, encMeta: Boolean = true): Array[Byte] = {
    val pBytes = Array[Byte](
      (p & 0xFF).toByte, ((p >> 8) & 0xFF).toByte,
      ((p >> 16) & 0xFF).toByte, ((p >> 24) & 0xFF).toByte)
    val noMeta: Array[Byte] =
      if (r >= 4 && !encMeta) Array(0xFF, 0xFF, 0xFF, 0xFF).map(_.toByte)
      else Array.empty[Byte]
    var key = md5(pad(userPwd), o.take(32), pBytes, id0, noMeta)
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

  /** Algorithms 4/5: the /U value for the EMPTY user password (R 2-4). */
  private def computeU(fk: Array[Byte], id0: Array[Byte], r: Int): Array[Byte] =
    if (r == 2) rc4(fk, Pad)
    else {
      var u = rc4(fk, md5(Pad, id0))
      (1 to 19).foreach(i => u = rc4(fk.map(b => (b ^ i).toByte), u))
      u ++ new Array[Byte](16) // 32 bytes on disk; only 16 compared
    }

  /** Classic-handler (V 1-4) key recovery with reader-prompt semantics:
    * try `pwd` as the USER password (algorithm 2 + the algorithm 4/5 /U
    * check), then as the OWNER password — algorithm 7: RC4-unwrap /O
    * (inverting computeO's 20-pass key^i schedule) into the padded user
    * password and re-derive + re-check. None = wrong password. */
  private def classicFileKey(pwd: Array[Byte], o: Array[Byte], u: Array[Byte],
      p: Int, id0: Array[Byte], n: Int, r: Int,
      encMeta: Boolean): Option[Array[Byte]] = {
    def uOk(fk: Array[Byte]): Boolean =
      if (r == 2) java.util.Arrays.equals(computeU(fk, id0, r), u.take(32))
      else computeU(fk, id0, r).take(16).sameElements(u.take(16))
    val asUser = fileKey(pwd, o, p, id0, n, r, encMeta)
    if (uOk(asUser)) Some(asUser)
    else {
      var key = md5(pad(pwd))
      if (r >= 3) (0 until 50).foreach(_ => key = md5(key))
      val rc4Key = key.take(n)
      var userPad = o.take(32)
      if (r == 2) userPad = rc4(rc4Key, userPad)
      else (19 to 0 by -1).foreach(i =>
        userPad = rc4(rc4Key.map(b => (b ^ i).toByte), userPad))
      val asOwner = fileKey(userPad, o, p, id0, n, r, encMeta)
      if (uOk(asOwner)) Some(asOwner) else None
    }
  }

  /** Algorithm 1: the per-object RC4 key. */
  private def objectKey(fk: Array[Byte], num: Int, gen: Int): Array[Byte] =
    md5(fk, Array[Byte](
      (num & 0xFF).toByte, ((num >> 8) & 0xFF).toByte, ((num >> 16) & 0xFF).toByte,
      (gen & 0xFF).toByte, ((gen >> 8) & 0xFF).toByte))
      .take(math.min(fk.length + 5, 16))

  /** Algorithm 1 for /AESV2: the per-object key additionally hashes the
    * 4-byte constant "sAlT" (73 41 6C 54). */
  private def objectKeyAes(fk: Array[Byte], num: Int, gen: Int): Array[Byte] =
    md5(fk, Array[Byte](
      (num & 0xFF).toByte, ((num >> 8) & 0xFF).toByte, ((num >> 16) & 0xFF).toByte,
      (gen & 0xFF).toByte, ((gen >> 8) & 0xFF).toByte),
      Array[Byte](0x73, 0x41, 0x6C, 0x54))
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

  /** Apply a byte transform to every string (literal and hex) inside a
    * value tree, leaving structure intact. */
  private def walkStrings(pv: PVal, f: Array[Byte] => Array[Byte]): PVal = pv match {
    case PLit(inner) => PLit(escapeLit(f(unescapeLit(inner))))
    case PHex(inner) => PHex(bytesToHex(f(hexToBytes(inner))))
    case PArr(items) => PArr(items.map(walkStrings(_, f)))
    case PDict(entries) => PDict(entries.map { case (k, x) => k -> walkStrings(x, f) })
    case other => other
  }

  // ---- decryption (called by PdfParse between object load and ObjStm
  //      extraction, so container streams decrypt before unpacking) ----

  private def isType(d: PVal, t: String): Boolean = d match {
    case dict: PDict => dict.get("Type").contains(PName(t))
    case _ => false
  }

  /** Resolve the /StmF / /StrF / CF names of a V≥4 dictionary. Returns
    * (cfm, streamsEncrypted, stringsEncrypted) or an error for crypt
    * filter shapes outside /Identity + a single /StdCF. */
  private def cryptFilters(enc: PDict, resolve: PVal => PVal): Either[String, (String, Boolean, Boolean)] = {
    def fname(k: String): String =
      enc.get(k).map(resolve).collect { case PName(nm) => nm }.getOrElse("Identity")
    val stmF = fname("StmF")
    val strF = fname("StrF")
    if (!Set("Identity", "StdCF")(stmF) || !Set("Identity", "StdCF")(strF))
      return Left(s"unsupported crypt filter names /StmF $stmF /StrF $strF (Identity and StdCF only)")
    if (stmF == "Identity" && strF == "Identity") return Right(("None", false, false))
    val cfm = (for {
      cf <- enc.get("CF").map(resolve).collect { case d: PDict => d }
      std <- cf.get("StdCF").map(resolve).collect { case d: PDict => d }
      m <- std.get("CFM").map(resolve).collect { case PName(nm) => nm }
    } yield m).getOrElse(
      return Left("V>=4 encryption missing /CF /StdCF /CFM"))
    Right((cfm, stmF == "StdCF", strF == "StdCF"))
  }

  /** Decrypt every string and stream in place. Skips the /Encrypt
    * dictionary itself and /Type /XRef stream objects (never encrypted
    * per spec); /ObjStm container streams ARE decrypted — their packed
    * objects unpack as plaintext afterwards. Dispatches on /V: 1-2 RC4,
    * 4 AESV2 (or V2-in-a-crypt-filter RC4), 5 AESV3.
    *
    * `password` follows reader-prompt semantics: tried first as the
    * USER password (algorithm 4/5 check, or the V5 /U hash), then as
    * the OWNER password — algorithm 7 (RC4-unwrap /O into the padded
    * user password) for the classic handlers, the /O hash + /OE unwrap
    * for V5. The empty default is the ubiquitous no-prompt class. */
  private[pdf] def decryptInPlace(objects: mutable.HashMap[Int, PObjDef],
      gens: collection.Map[Int, Int], trailer: PDict,
      password: String = ""): Either[String, Unit] = {
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

    /** Shared final pass: strings through strDec, streams through
      * stmDec. /EncryptMetadata false leaves the metadata STREAM
      * plaintext per spec (the key derivation already accounted for it
      * via the 0xFFFFFFFF step-f suffix). */
    def apply(strOn: Boolean, stmOn: Boolean,
        strDec: (Int, Int, Array[Byte]) => Array[Byte],
        stmDec: (Int, Int, Array[Byte]) => Array[Byte],
        encMeta: Boolean = true): Unit =
      objects.keys.toSeq.sorted.foreach { num =>
        val obj = objects(num)
        if (num != encNum && !isType(obj.value, "XRef")) {
          val gen = gens.getOrElse(num, 0)
          val nv = if (strOn) walkStrings(obj.value, b => strDec(num, gen, b)) else obj.value
          val skipStream = !encMeta && isType(obj.value, "Metadata")
          val ns = if (stmOn && !skipStream) obj.stream.map(d => stmDec(num, gen, d)) else obj.stream
          objects(num) = PObjDef(num, nv, ns)
        }
      }

    def readEncMeta(): Boolean = enc.get("EncryptMetadata").map(resolve) match {
      case Some(PKw("false")) => false
      case _ => true
    }

    try {
      if (v == 5) {
        // ---- AESV3 (ISO 32000-2): SHA-2 password hash, /UE-wrapped key ----
        if (r != 5 && r != 6)
          return Left(s"unsupported encryption V=5 R=$r (AESV3 R 5/6 only)")
        val (cfm, stmOn, strOn) = cryptFilters(enc, resolve) match {
          case Left(e) => return Left(e)
          case Right(t) => t
        }
        if (stmOn || strOn) {
          if (cfm != "AESV3") return Left(s"unsupported V=5 crypt filter /$cfm (AESV3 only)")
          val u = enc.get("U").map(resolve).flatMap(strBytes)
            .getOrElse(return Left("encryption dict missing /U"))
          val ue = enc.get("UE").map(resolve).flatMap(strBytes)
            .getOrElse(return Left("encryption dict missing /UE"))
          if (u.length < 48 || ue.length < 32) return Left("truncated /U or /UE value")
          val vsalt = u.slice(32, 40)
          val ksalt = u.slice(40, 48)
          // ISO 32000-2 passwords are UTF-8 (SASLprep assumed applied),
          // truncated to 127 bytes — matching the emit side.
          val pwd = password.getBytes("UTF-8").take(127)
          def h(s: Array[Byte], udata: Array[Byte]): Array[Byte] =
            if (r == 5) sha("SHA-256", pwd, s, udata) else hash2B(pwd, s, udata)
          val fkOpt: Option[Array[Byte]] =
            if (java.util.Arrays.equals(h(vsalt, Array.empty), u.take(32)))
              Some(aesCbc(encryptMode = false, h(ksalt, Array.empty),
                new Array[Byte](16), ue.take(32), padded = false))
            else for {
              // owner role: /O carries hash+salts over (pwd, /U[0:48])
              o <- enc.get("O").map(resolve).flatMap(strBytes).filter(_.length >= 48)
              oe <- enc.get("OE").map(resolve).flatMap(strBytes).filter(_.length >= 32)
              u48 = u.take(48)
              if java.util.Arrays.equals(h(o.slice(32, 40), u48), o.take(32))
            } yield aesCbc(encryptMode = false, h(o.slice(40, 48), u48),
              new Array[Byte](16), oe.take(32), padded = false)
          val fk = fkOpt.getOrElse(return Left(
            if (password.isEmpty)
              "encrypted PDF requires its user password (empty-password open failed the V5 /U hash; pass it to parse)"
            else
              "wrong password (V5 /U and /O validation both failed)"))
          val permsOk = enc.get("Perms").map(resolve).flatMap(strBytes) match {
            case Some(pm) if pm.length >= 16 =>
              val d = aesEcb(encryptMode = false, fk, pm.take(16))
              d(9) == 'a'.toByte && d(10) == 'd'.toByte && d(11) == 'b'.toByte
            case _ => true
          }
          if (!permsOk)
            return Left("V5 /Perms validation failed (wrong file key or tampered permissions)")
          apply(strOn, stmOn,
            (_, _, d) => aesBlobDec(fk, d),
            (_, _, d) => aesBlobDecStrict(fk, d),
            readEncMeta())
        }
        return Right(())
      }

      if (v == 4) {
        // ---- crypt-filter layer over the classic key: AESV2 or V2 (RC4) ----
        if (r != 4) return Left(s"unsupported encryption V=4 R=$r (R 4 only)")
        val (cfm, stmOn, strOn) = cryptFilters(enc, resolve) match {
          case Left(e) => return Left(e)
          case Right(t) => t
        }
        if (!stmOn && !strOn) return Right(())
        if (cfm != "AESV2" && cfm != "V2")
          return Left(s"unsupported V=4 crypt filter /$cfm (AESV2 and V2 only)")
        val n = math.min(16, math.max(5,
          enc.get("Length").map(resolve).collect { case x: PNum => x.toInt }.getOrElse(128) / 8))
        val o = enc.get("O").map(resolve).flatMap(strBytes)
          .getOrElse(return Left("encryption dict missing /O"))
        val u = enc.get("U").map(resolve).flatMap(strBytes)
          .getOrElse(return Left("encryption dict missing /U"))
        if (o.length < 32 || u.length < 32) return Left("truncated /O or /U value")
        val p = enc.get("P").map(resolve).collect { case x: PNum => x.raw.toDouble.toLong.toInt }
          .getOrElse(return Left("encryption dict missing /P"))
        val encMeta = readEncMeta()
        val id0 = trailer.get("ID").map(resolve) match {
          case Some(PArr(items)) if items.nonEmpty => strBytes(resolve(items.head)).getOrElse(Array.empty[Byte])
          case _ => Array.empty[Byte]
        }
        val fk = classicFileKey(password.getBytes(ISO_8859_1), o, u, p, id0, n, r, encMeta)
          .getOrElse(return Left(
            if (password.isEmpty)
              "encrypted PDF requires its user password (empty-password open failed /U check; pass it to parse)"
            else "wrong password (classic /U check failed for both user and owner roles)"))
        if (cfm == "AESV2")
          apply(strOn, stmOn,
            (num, gen, d) => aesBlobDec(objectKeyAes(fk, num, gen), d),
            (num, gen, d) => aesBlobDecStrict(objectKeyAes(fk, num, gen), d),
            encMeta)
        else {
          val rc4Dec = (num: Int, gen: Int, d: Array[Byte]) => rc4(objectKey(fk, num, gen), d)
          apply(strOn, stmOn, rc4Dec, rc4Dec, encMeta)
        }
        return Right(())
      }

      // ---- classic RC4 (V 1/2, R 2/3) ----
      if (v < 1 || v > 2 || r < 2 || r > 3)
        return Left(s"unsupported encryption V=$v R=$r (RC4 V1/V2 R2/R3, AESV2 V4/R4, AESV3 V5/R5-6)")
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
      val fk = classicFileKey(password.getBytes(ISO_8859_1), o, u, p, id0, n, r, encMeta = true)
        .getOrElse(return Left(
          if (password.isEmpty)
            "encrypted PDF requires its user password (empty-password open failed /U check; pass it to parse)"
          else "wrong password (classic /U check failed for both user and owner roles)"))
      val rc4Dec = (num: Int, gen: Int, d: Array[Byte]) => rc4(objectKey(fk, num, gen), d)
      apply(strOn = true, stmOn = true, rc4Dec, rc4Dec)
      Right(())
    } catch {
      case e: javax.crypto.BadPaddingException =>
        Left(s"AES decrypt failed (bad padding — wrong key or corrupt data): ${e.getMessage}")
      case e: java.security.GeneralSecurityException =>
        Left(s"AES decrypt failed: ${e.getMessage}")
    }
  }

  // ---- encryption: re-emit a parsed doc encrypted (classic xref) ----

  /** Shared deterministic emitter: strings and streams of every kept
    * object go through `encObj`, the /Encrypt dictionary and xref are
    * appended classic-style. Determinism (no SecureRandom) is a feature
    * here: the engine's outputs must be byte-stable across runs. */
  private def emitEncrypted(doc: PdfDoc, encDict: PDict, id0: Array[Byte],
      encObj: (Int, Array[Byte]) => Array[Byte],
      encryptStreamOf: PVal => Boolean = _ => true): Array[Byte] = {
    val keep = doc.objects.filter { case (_, o) =>
      !isType(o.value, "XRef") && !isType(o.value, "ObjStm")
    }
    val encNum = (keep.keys.toSet + 0).max + 1
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    w("%PDF-1.4\n%âãÏÓ\n")
    val offsets = mutable.HashMap.empty[Int, Long]
    keep.toSeq.sortBy(_._1).foreach { case (num, obj) =>
      offsets(num) = out.size().toLong
      val encStream = obj.stream.map(data =>
        if (encryptStreamOf(obj.value)) encObj(num, data) else data)
      val walked = walkStrings(obj.value, b => encObj(num, b))
      // AES blobs grow (IV + PKCS#7 padding): /Length must describe the
      // bytes on disk, so rewrite it to the encrypted stream length
      val fixed = (walked, encStream) match {
        case (d: PDict, Some(es)) =>
          PDict(d.entries.filterNot(_._1 == "Length") :+ ("Length" -> PNum(es.length.toString)))
        case _ => walked
      }
      w(s"$num 0 obj\n${serialize(fixed, identity)}\n")
      encStream.foreach { data =>
        w("stream\n"); out.write(data); w("\nendstream\n")
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
    out.toByteArray
  }

  /** Deterministic file ID from the document's own shape. */
  private def deriveId0(doc: PdfDoc): Array[Byte] = {
    val keep = doc.objects.filter { case (_, o) =>
      !isType(o.value, "XRef") && !isType(o.value, "ObjStm")
    }
    md5(keep.keys.toSeq.sorted.mkString(",").getBytes(ISO_8859_1),
      serialize(doc.trailer, identity).getBytes(ISO_8859_1))
  }

  /** Encrypt a parsed document RC4 (R=3, V=2, 128-bit by default):
    * computes /O from the owner password and /U for the given user
    * password (empty = opens without a prompt), RC4s every string and
    * stream, and re-emits a classic-xref PDF. /Type /XRef and /ObjStm
    * leftovers from the parse are dropped — their payload objects
    * already live in the object map as plain values. */
  def encrypt(doc: PdfDoc, ownerPwd: String, userPwd: String = "",
      bits: Int = 128, r: Int = 3): Either[String, Array[Byte]] = {
    if (bits % 8 != 0 || bits < 40 || bits > 128) return Left(s"bad key size $bits")
    if (r != 2 && r != 3) return Left(s"unsupported revision $r")
    val n = if (r == 2) 5 else bits / 8 // R=2 is V=1: fixed 40-bit
    val id0 = deriveId0(doc)
    val p = -4 // all permissions
    val o = computeO(ownerPwd.getBytes(ISO_8859_1), userPwd.getBytes(ISO_8859_1), n, r)
    val fk = fileKey(userPwd.getBytes(ISO_8859_1), o, p, id0, n, r)
    val u = computeU(fk, id0, r)
    val encDict = PDict(Vector(
      "Filter" -> PName("Standard"),
      "V" -> PNum(if (r == 2) "1" else "2"), "R" -> PNum(r.toString)) ++
      (if (r == 2) Vector.empty else Vector("Length" -> PNum(bits.toString))) ++
      Vector("P" -> PNum(p.toString),
        "O" -> PHex(bytesToHex(o)), "U" -> PHex(bytesToHex(u))))
    Right(emitEncrypted(doc, encDict, id0,
      (num, data) => rc4(objectKey(fk, num, 0), data)))
  }

  /** Encrypt AES-128-CBC (V=4, R=4, /AESV2 crypt filter): the classic
    * MD5 key schedule plus the sAlT per-object suffix; every string and
    * stream becomes an IV-prefixed CBC blob. IVs are derived
    * deterministically from (file key, object, counter) — unique per
    * blob, byte-stable across runs. */
  def encryptAes128(doc: PdfDoc, ownerPwd: String, userPwd: String = "",
      encryptMetadata: Boolean = true): Either[String, Array[Byte]] = {
    val id0 = deriveId0(doc)
    val p = -4
    val o = computeO(ownerPwd.getBytes(ISO_8859_1), userPwd.getBytes(ISO_8859_1), 16, 4)
    val fk = fileKey(userPwd.getBytes(ISO_8859_1), o, p, id0, 16, 4, encryptMetadata)
    val u = computeU(fk, id0, 4)
    val encDict = PDict(Vector(
      "Filter" -> PName("Standard"),
      "V" -> PNum("4"), "R" -> PNum("4"), "Length" -> PNum("128"),
      "CF" -> PDict(Vector("StdCF" -> PDict(Vector(
        "CFM" -> PName("AESV2"), "AuthEvent" -> PName("DocOpen"),
        "Length" -> PNum("16"))))),
      "StmF" -> PName("StdCF"), "StrF" -> PName("StdCF"),
      "P" -> PNum(p.toString),
      "O" -> PHex(bytesToHex(o)), "U" -> PHex(bytesToHex(u))) ++
      (if (encryptMetadata) Vector.empty
       else Vector("EncryptMetadata" -> PKw("false"))))
    val iv = ivSequence(fk)
    Right(emitEncrypted(doc, encDict, id0,
      (num, data) => aesBlobEnc(objectKeyAes(fk, num, 0), iv(num), data),
      encryptStreamOf = v => encryptMetadata || !isType(v, "Metadata")))
  }

  /** Deterministic per-blob IV stream: md5 over (file key, object,
    * running counter) — unique per blob, byte-stable across runs (the
    * engine's outputs must be reproducible; these are uniqueness
    * values, not secrets). Shared by both AES emitters so the scheme
    * cannot drift.
    *
    * SECURITY TRADE, documented per the repo's determinism rule:
    * predictable (key-derived) CBC IVs give an adversary who can submit
    * chosen plaintexts a distinguishing oracle, a guarantee strictly
    * weaker than random-IV CBC. This engine's outputs must be
    * bit-reproducible (the correctness gate hashes them), so
    * SecureRandom is not an option here; a deployment that needs
    * IND-CPA-grade confidentiality over reproducibility should swap
    * this one function for a SecureRandom IV source — every consumer
    * already treats the IV as an opaque per-blob prefix. The same trade
    * applies to the id0-derived /U //O salts. */
  private def ivSequence(fk: Array[Byte]): Int => Array[Byte] = {
    var ctr = 0
    (num: Int) => {
      ctr += 1
      md5(fk, Array[Byte](
        (num & 0xFF).toByte, ((num >> 8) & 0xFF).toByte,
        (ctr & 0xFF).toByte, ((ctr >> 8) & 0xFF).toByte, ((ctr >> 16) & 0xFF).toByte))
    }
  }

  /** Encrypt AES-256-CBC (V=5, R=6, /AESV3): ISO 32000-2 key wrapping —
    * /U from the hash-2B chain over a validation salt, the file key
    * wrapped into /UE under the key-salt hash, owner values /O //OE
    * bound to the final /U, and the /Perms ECB block carrying P +
    * the "adb" marker. Salts derive deterministically from the document
    * ID (byte-stable output; uniqueness values, not secrets); the FILE
    * KEY derives from the OWNER PASSWORD through a dedicated hash-2B
    * chain over an id0 salt — a holder of the file alone cannot
    * recompute it (the secret is the password; recovery is only via the
    * /UE//OE unwrap with a correct password). Deterministic-IV caveat:
    * see [[ivSequence]]. */
  def encryptAes256(doc: PdfDoc, ownerPwd: String,
      userPwd: String = ""): Either[String, Array[Byte]] = {
    val id0 = deriveId0(doc)
    val p = -4
    val upwd = userPwd.getBytes("UTF-8").take(127)
    val opwd = ownerPwd.getBytes("UTF-8").take(127)
    // password-bound file key: without a password the 32 bytes are not
    // recomputable from anything the file carries (id0 is public in the
    // trailer /ID — the previous md5(id0)-only derivation gave zero
    // confidentiality). hash2B is the spec's own >= 64-round KDF; the
    // "fk" tag domain-separates this chain from the /U //O chains.
    val fk = hash2B(opwd, md5(id0, "fk".getBytes(ISO_8859_1)).take(8), Array.empty)
    def salt(tag: String): Array[Byte] = md5(id0, tag.getBytes(ISO_8859_1)).take(8)
    val vs = salt("uv"); val ks = salt("uk")
    val ovs = salt("ov"); val oks = salt("ok")
    val u48 = hash2B(upwd, vs, Array.empty) ++ vs ++ ks
    val ue = aesCbc(encryptMode = true, hash2B(upwd, ks, Array.empty),
      new Array[Byte](16), fk, padded = false)
    val o48 = hash2B(opwd, ovs, u48) ++ ovs ++ oks
    val oe = aesCbc(encryptMode = true, hash2B(opwd, oks, u48),
      new Array[Byte](16), fk, padded = false)
    val permsPlain = Array[Byte](
      (p & 0xFF).toByte, ((p >> 8) & 0xFF).toByte,
      ((p >> 16) & 0xFF).toByte, ((p >> 24) & 0xFF).toByte,
      0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte) ++
      "Tadb".getBytes(ISO_8859_1) ++ md5(id0, "pm".getBytes(ISO_8859_1)).take(4)
    val perms = aesEcb(encryptMode = true, fk, permsPlain)
    val encDict = PDict(Vector(
      "Filter" -> PName("Standard"),
      "V" -> PNum("5"), "R" -> PNum("6"), "Length" -> PNum("256"),
      "CF" -> PDict(Vector("StdCF" -> PDict(Vector(
        "CFM" -> PName("AESV3"), "AuthEvent" -> PName("DocOpen"),
        "Length" -> PNum("32"))))),
      "StmF" -> PName("StdCF"), "StrF" -> PName("StdCF"),
      "P" -> PNum(p.toString),
      "O" -> PHex(bytesToHex(o48)), "U" -> PHex(bytesToHex(u48)),
      "OE" -> PHex(bytesToHex(oe)), "UE" -> PHex(bytesToHex(ue)),
      "Perms" -> PHex(bytesToHex(perms))))
    val iv = ivSequence(fk)
    Right(emitEncrypted(doc, encDict, id0,
      (num, data) => aesBlobEnc(fk, iv(num), data)))
  }
}
