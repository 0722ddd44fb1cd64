package graft

import java.nio.charset.StandardCharsets.ISO_8859_1

import org.scalatest.funsuite.AnyFunSuite

import graft.hocr.{HLine, HPage, HWord, Hocr}
import graft.model.BBox
import graft.pdf.{PdfCrypt, PdfParse, PdfRender}

/** RC4 standard-security-handler round trip: our writer emits, PdfCrypt
  * encrypts (computing /O, /U and per-object keys from the public spec
  * algorithms), PdfParse decrypts transparently during parse, and the
  * page-import path runs end-to-end on the ciphertext. Password-
  * prompted files (non-empty USER password) open with either the user
  * or the owner password across all three ciphers; a missing or wrong
  * password is a clear error, never garbage output. */
class PdfCryptSpec extends AnyFunSuite {

  private def page(words: Seq[String], pageNum: Int): HPage =
    HPage(id = s"page_$pageNum", pageNumber = pageNum, bbox = BBox(0, 0, 612, 792),
      lines = Vector(HLine(id = "l1", bbox = BBox(40, 80, 580, 98),
        words = words.zipWithIndex.map { case (w, i) =>
          HWord(id = s"w$i", text = w, bbox = BBox(40.0 + i * 90, 80.0, 120.0 + i * 90, 98.0))
        }.toVector)))

  private def source(words: String*): Array[Byte] =
    PdfRender.applyOcrPdf(
      Hocr(pages = Vector(page(words, 1))),
      layerNameBase = "Scan Text").toOption.get.pdf

  test("literal-string escape/unescape round-trips every byte value") {
    val all = Array.tabulate(256)(_.toByte)
    assert(PdfCrypt.unescapeLit(PdfCrypt.escapeLit(all)).sameElements(all))
    val rng = new scala.util.Random(42)
    (0 until 50).foreach { _ =>
      val b = Array.fill(rng.nextInt(64) + 1)(rng.nextInt(256).toByte)
      assert(PdfCrypt.unescapeLit(PdfCrypt.escapeLit(b)).sameElements(b))
    }
    // spec escapes parse too: octal, named, continuation, bare EOL
    assert(PdfCrypt.unescapeLit("a\\012b").sameElements("a\nb".getBytes(ISO_8859_1)))
    assert(PdfCrypt.unescapeLit("a\\nb\\(c\\)").sameElements("a\nb(c)".getBytes(ISO_8859_1)))
    assert(PdfCrypt.unescapeLit("a\\\nb").sameElements("ab".getBytes(ISO_8859_1)))
    assert(PdfCrypt.unescapeLit("a\rb").sameElements("a\nb".getBytes(ISO_8859_1)))
    assert(PdfCrypt.unescapeLit("\\101\\53").sameElements("A+".getBytes(ISO_8859_1)))
  }

  test("128-bit R=3 encrypt -> transparent decrypt on parse -> content intact") {
    val plain = source("uno", "dos")
    val enc = PdfCrypt.encrypt(PdfParse.parse(plain).toOption.get,
      ownerPwd = "owner-secret").toOption.get
    // really ciphertext: the emitted layer text is gone from the raw bytes
    assert(!new String(enc, ISO_8859_1).contains("(uno) Tj"))
    assert(new String(enc, ISO_8859_1).contains("/Encrypt"))
    val doc = PdfParse.parse(enc).toOption.get
    val pages = doc.pages.toOption.get
    assert(pages.length == 1)
    assert(pages(0).mediaBox.contains((0.0, 0.0, 612.0, 792.0)))
    val content = doc.decodedStream(pages(0).contentObjs.head).toOption.get
    assert(new String(content, ISO_8859_1).contains("(uno) Tj"))
  }

  test("40-bit R=2 (V=1) path decrypts too") {
    val plain = source("cuarenta")
    val enc = PdfCrypt.encrypt(PdfParse.parse(plain).toOption.get,
      ownerPwd = "o", bits = 40, r = 2).toOption.get
    val doc = PdfParse.parse(enc).toOption.get
    val content = doc.decodedStream(doc.pages.toOption.get.head.contentObjs.head).toOption.get
    assert(new String(content, ISO_8859_1).contains("(cuarenta) Tj"))
  }

  test("page import (P-8) runs end-to-end on an encrypted source") {
    val plain = source("originalword")
    val enc = PdfCrypt.encrypt(PdfParse.parse(plain).toOption.get,
      ownerPwd = "owner-secret").toOption.get
    val out = PdfRender.modifyExistingPdf(enc,
      Hocr(pages = Vector(page(Seq("addedword"), 1)))).toOption.get
    val s = new String(out.pdf, ISO_8859_1)
    // imported background (decrypted!) + the new layer, in plaintext out
    assert(s.contains("(originalword) Tj") && s.contains("(addedword) Tj"))
    assert(s.contains("/Tpl0 Do") && s.contains("/Subtype /Form"))
  }

  test("non-empty user password: no-password open fails clearly; user AND owner passwords open (RC4)") {
    val plain = source("sealed")
    val enc = PdfCrypt.encrypt(PdfParse.parse(plain).toOption.get,
      ownerPwd = "owner", userPwd = "user-pwd").toOption.get
    PdfParse.parse(enc) match {
      case Left(e) => assert(e.contains("user password"))
      case Right(_) => fail("user-password-protected PDF must not parse without the password")
    }
    PdfParse.parse(enc, "definitely-wrong") match {
      case Left(e) => assert(e.contains("wrong password"))
      case Right(_) => fail("a wrong password must not parse")
    }
    def text(doc: graft.pdf.PdfParse.PdfDoc): String = new String(
      doc.decodedStream(doc.pages.toOption.get.head.contentObjs.head).toOption.get, ISO_8859_1)
    // reader-prompt semantics: the user password opens...
    assert(text(PdfParse.parse(enc, "user-pwd").toOption.get).contains("(sealed) Tj"))
    // ...and so does the OWNER password (algorithm 7 /O unwrap)
    assert(text(PdfParse.parse(enc, "owner").toOption.get).contains("(sealed) Tj"))
  }

  test("R=2 (40-bit) user-password file opens via user and owner passwords too") {
    val plain = source("vintage")
    val enc = PdfCrypt.encrypt(PdfParse.parse(plain).toOption.get,
      ownerPwd = "ow", userPwd = "us", bits = 40, r = 2).toOption.get
    assert(PdfParse.parse(enc).isLeft)
    Seq("us", "ow").foreach { pwd =>
      val doc = PdfParse.parse(enc, pwd).toOption.get
      val content = doc.decodedStream(doc.pages.toOption.get.head.contentObjs.head).toOption.get
      assert(new String(content, ISO_8859_1).contains("(vintage) Tj"))
    }
  }

  test("AES-128 (V=4 R=4 /AESV2) encrypt -> transparent decrypt -> content intact") {
    val plain = source("aesuno", "aesdos")
    val enc = PdfCrypt.encryptAes128(PdfParse.parse(plain).toOption.get,
      ownerPwd = "owner-secret").toOption.get
    val raw = new String(enc, ISO_8859_1)
    assert(!raw.contains("(aesuno) Tj")) // really ciphertext
    assert(raw.contains("/AESV2"))
    val doc = PdfParse.parse(enc).toOption.get
    val pages = doc.pages.toOption.get
    assert(pages.length == 1)
    val content = doc.decodedStream(pages(0).contentObjs.head).toOption.get
    assert(new String(content, ISO_8859_1).contains("(aesuno) Tj"))
  }

  test("AES-256 (V=5 R=6 /AESV3) encrypt -> transparent decrypt -> content intact") {
    val plain = source("aes256word")
    val enc = PdfCrypt.encryptAes256(PdfParse.parse(plain).toOption.get,
      ownerPwd = "owner-secret").toOption.get
    val raw = new String(enc, ISO_8859_1)
    assert(!raw.contains("(aes256word) Tj"))
    assert(raw.contains("/AESV3") && raw.contains("/UE") && raw.contains("/Perms"))
    val doc = PdfParse.parse(enc).toOption.get
    val content = doc.decodedStream(doc.pages.toOption.get.head.contentObjs.head).toOption.get
    assert(new String(content, ISO_8859_1).contains("(aes256word) Tj"))
  }

  test("AES-256 file key is password-bound: same doc, different owner passwords -> different ciphertext") {
    // the advisor-flagged hole: fk used to derive from id0 alone (public
    // in the trailer /ID), so anyone holding the file could recompute it.
    // Now fk = hash2B(ownerPwd, salt(id0)) — with the password as input,
    // two passwords must produce different encrypted bodies for the same
    // document, and each still round-trips through its own /OE unwrap.
    val plain = source("fkbound")
    val parsed = PdfParse.parse(plain).toOption.get
    val encA = PdfCrypt.encryptAes256(parsed, ownerPwd = "owner-A").toOption.get
    val encB = PdfCrypt.encryptAes256(parsed, ownerPwd = "owner-B").toOption.get
    assert(!encA.sameElements(encB), "ciphertext must depend on the password, not just id0")
    // determinism retained: same (doc, password) -> identical bytes
    val encA2 = PdfCrypt.encryptAes256(parsed, ownerPwd = "owner-A").toOption.get
    assert(encA.sameElements(encA2))
    for (enc <- Seq(encA, encB)) {
      val doc = PdfParse.parse(enc).toOption.get
      val content = doc.decodedStream(doc.pages.toOption.get.head.contentObjs.head).toOption.get
      assert(new String(content, ISO_8859_1).contains("(fkbound) Tj"))
    }
  }

  test("hash-2B chain is stable (regression pin) and password-sensitive") {
    // No network, so no external vector; pin our own digest so any
    // silent change to the 2.B loop (round count, mod-3 pick, stop
    // rule) fails loudly, and check the security-relevant properties.
    val a = PdfCrypt.hash2B("pw".getBytes(ISO_8859_1), Array[Byte](1, 2, 3, 4, 5, 6, 7, 8), Array.empty)
    val b = PdfCrypt.hash2B("pw".getBytes(ISO_8859_1), Array[Byte](1, 2, 3, 4, 5, 6, 7, 8), Array.empty)
    val c = PdfCrypt.hash2B("pW".getBytes(ISO_8859_1), Array[Byte](1, 2, 3, 4, 5, 6, 7, 8), Array.empty)
    assert(a.length == 32)
    assert(a.sameElements(b))
    assert(!a.sameElements(c))
  }

  test("AES-128 page import (P-8) runs end-to-end on an encrypted source") {
    val plain = source("aesoriginal")
    val enc = PdfCrypt.encryptAes128(PdfParse.parse(plain).toOption.get,
      ownerPwd = "owner-secret").toOption.get
    val out = PdfRender.modifyExistingPdf(enc,
      Hocr(pages = Vector(page(Seq("aesadded"), 1)))).toOption.get
    val s = new String(out.pdf, ISO_8859_1)
    assert(s.contains("(aesoriginal) Tj") && s.contains("(aesadded) Tj"))
  }

  test("non-empty user password on AES files: no-password open fails; user AND owner passwords open") {
    val plain = source("sealedaes")
    def text(doc: graft.pdf.PdfParse.PdfDoc): String = new String(
      doc.decodedStream(doc.pages.toOption.get.head.contentObjs.head).toOption.get, ISO_8859_1)
    val enc128 = PdfCrypt.encryptAes128(PdfParse.parse(plain).toOption.get,
      ownerPwd = "owner", userPwd = "user-pwd").toOption.get
    PdfParse.parse(enc128) match {
      case Left(e) => assert(e.contains("user password"))
      case Right(_) => fail("user-password AESV2 PDF must not parse without the password")
    }
    assert(text(PdfParse.parse(enc128, "user-pwd").toOption.get).contains("(sealedaes) Tj"))
    assert(text(PdfParse.parse(enc128, "owner").toOption.get).contains("(sealedaes) Tj"))
    val enc256 = PdfCrypt.encryptAes256(PdfParse.parse(plain).toOption.get,
      ownerPwd = "owner", userPwd = "user-pwd").toOption.get
    PdfParse.parse(enc256) match {
      case Left(e) => assert(e.contains("user password"))
      case Right(_) => fail("user-password AESV3 PDF must not parse without the password")
    }
    // V5: user hash validates directly; owner path re-hashes over /U[0:48]
    // and unwraps /OE — both recover the same file key
    assert(text(PdfParse.parse(enc256, "user-pwd").toOption.get).contains("(sealedaes) Tj"))
    assert(text(PdfParse.parse(enc256, "owner").toOption.get).contains("(sealedaes) Tj"))
    PdfParse.parse(enc256, "nope") match {
      case Left(e) => assert(e.contains("wrong password"))
      case Right(_) => fail("a wrong V5 password must not parse")
    }
  }

  test("non-Standard (certificate) security handler: clear detectable error (q_pdf_quarantine pin)") {
    val plain = source("uno", "dos")
    val enc = PdfCrypt.encrypt(PdfParse.parse(plain).toOption.get,
      ownerPwd = "owner-secret").toOption.get
    val raw = new String(enc, ISO_8859_1)
    val at = raw.indexOf("/Filter /Standard")
    assert(at >= 0, "emitted encrypt dict must carry /Filter /Standard")
    // same-length handler rewrite (offsets untouched) — the stand-in for
    // an /Adobe.PubSec certificate-security file
    val pubsec = (raw.substring(0, at) + "/Filter /PubKeySH" +
      raw.substring(at + "/Filter /Standard".length)).getBytes(ISO_8859_1)
    PdfParse.parse(pubsec) match {
      case Left(e) => assert(e.contains("unsupported encryption filter"),
        s"wrong error class: $e")
      case Right(_) => fail("non-Standard security handler must be a clear error")
    }
  }

  test("an unknown crypt filter method is rejected, not garbage") {
    val plain = source("cfm")
    val enc = PdfCrypt.encryptAes128(PdfParse.parse(plain).toOption.get,
      ownerPwd = "owner").toOption.get
    // same-length splice keeps every xref offset valid
    val s = new String(enc, ISO_8859_1).replace("/CFM /AESV2", "/CFM /AESV9")
    PdfParse.parse(s.getBytes(ISO_8859_1)) match {
      case Left(e) => assert(e.contains("crypt filter"))
      case Right(_) => fail("unknown CFM must be rejected")
    }
  }

  test("/EncryptMetadata false: metadata stream stays plaintext, content still decrypts") {
    import graft.pdf.PdfParse._
    val plain = source("metaword")
    val doc = PdfParse.parse(plain).toOption.get
    val xmp = "<x:xmpmeta>plain-xmp-payload</x:xmpmeta>".getBytes(ISO_8859_1)
    val metaNum = doc.objects.keys.max + 1
    val withMeta = PdfDoc(doc.objects + (metaNum -> PObjDef(metaNum,
      PDict(Vector("Type" -> PName("Metadata"), "Subtype" -> PName("XML"),
        "Length" -> PNum(xmp.length.toString))), Some(xmp))), doc.trailer)
    val enc = PdfCrypt.encryptAes128(withMeta, ownerPwd = "owner",
      encryptMetadata = false).toOption.get
    val raw = new String(enc, ISO_8859_1)
    // the metadata stream is verbatim plaintext in the ciphertext file
    assert(raw.contains("plain-xmp-payload"))
    assert(raw.contains("/EncryptMetadata false"))
    assert(!raw.contains("(metaword) Tj")) // content IS encrypted
    // parse succeeds (the plaintext metadata stream must NOT be AES-decrypted)
    val re = PdfParse.parse(enc).toOption.get
    val content = re.decodedStream(re.pages.toOption.get.head.contentObjs.head).toOption.get
    assert(new String(content, ISO_8859_1).contains("(metaword) Tj"))
    val metaBack = re.objects.values.find(o =>
      o.value match { case d: PDict => d.get("Type").contains(PName("Metadata")); case _ => false })
    assert(metaBack.get.stream.get.sameElements(xmp))
  }

  test("truncated AES stream ciphertext is a clear parse error, not silent empty content") {
    val plain = source("truncword")
    val enc = PdfCrypt.encryptAes128(PdfParse.parse(plain).toOption.get,
      ownerPwd = "owner").toOption.get
    // same-length splice: corrupt the FINAL ciphertext byte of a stream
    // (the CBC padding block), keeping every offset and /Length valid —
    // the strict AES stream decoder must surface the bad padding as a
    // parse error, never as silently-garbled or empty content
    val raw = new String(enc, ISO_8859_1)
    val end = raw.indexOf("\nendstream")
    assert(end > 0)
    val damaged = raw.substring(0, end - 1) +
      ((raw.charAt(end - 1) ^ 0x55) & 0xFF).toChar + raw.substring(end)
    assert(damaged.length == raw.length)
    PdfParse.parse(damaged.getBytes(ISO_8859_1)) match {
      case Left(e) => assert(e.toLowerCase.contains("aes"))
      case Right(d) => fail(s"damaged AES stream must not parse cleanly: ${d.objects.size}")
    }
  }

  test("V5 /Perms tamper is caught by the ECB cross-check") {
    val plain = source("permsword")
    val enc = PdfCrypt.encryptAes256(PdfParse.parse(plain).toOption.get,
      ownerPwd = "owner").toOption.get
    val raw = new String(enc, ISO_8859_1)
    val at = raw.indexOf("/Perms <")
    assert(at > 0)
    // flip one hex digit of the Perms block (same length — offsets valid)
    val digitAt = at + "/Perms <".length
    val flipped = raw.updated(digitAt, if (raw.charAt(digitAt) == '0') '1' else '0')
    PdfParse.parse(flipped.getBytes(ISO_8859_1)) match {
      case Left(e) => assert(e.contains("Perms"))
      case Right(_) => fail("tampered /Perms must be rejected")
    }
  }
}
