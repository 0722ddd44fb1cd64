package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.GoStrings._

class GoStringsSpec extends AnyFunSuite {

  test("trimSpace matches Go's unicode.IsSpace class (incl. NBSP, NEL)") {
    assert(trimSpace("  hi \t\n") == "hi")
    assert(trimSpace(" x ") == "x") // Go trims NBSP; Java trim does not
    assert(trimSpace("y ") == "y")
    assert(trimSpace("") == "")
    assert(trimSpace("\t \n") == "")
  }

  test("fields splits on whitespace runs") {
    assert(fields("bbox 1  2\t3 4").toSeq == Seq("bbox", "1", "2", "3", "4"))
    assert(fields("   ").isEmpty)
    assert(fields("one").toSeq == Seq("one"))
  }

  test("parseFloat/atoi with Go error-discard semantics -> 0") {
    assert(parseFloatOrZero("3.25") == 3.25)
    assert(parseFloatOrZero("junk") == 0.0)
    assert(atoiOrZero("42") == 42)
    assert(atoiOrZero("4.2") == 0)
  }

  test("parseFloatOrZero integer fast path is bit-identical to parseDouble") {
    // exhaustive-ish sweep over the fast-path shapes plus edge forms that
    // must FALL THROUGH (signs, fractions, exponents, emptiness)
    val rnd = new scala.util.Random(42)
    val cases = Seq("0", "-0", "7", "40", "612", "999999999999999", "-999999999999999",
      "1234567890123456" /* 16 digits: beyond fast path */,
      "007", "-007", "", "-", "+5", "5.5", "-5.5", "1e3", " 5", "5 ") ++
      (1 to 2000).map(_ => rnd.nextLong(1000000000000000L).toString) ++
      (1 to 2000).map(_ => (-rnd.nextLong(1000000000000000L)).toString)
    cases.foreach { s =>
      val expect = try java.lang.Double.parseDouble(s) catch { case _: NumberFormatException => 0.0 }
      val got = parseFloatOrZero(s)
      assert(java.lang.Double.doubleToRawLongBits(got) == java.lang.Double.doubleToRawLongBits(expect),
        s"parseFloatOrZero('$s') = $got != $expect")
    }
  }

  test("hash64 ASCII fast path == UTF-8 byte path") {
    def slow(s: String): Long = {
      var h = 0x9E3779B97F4A7C15L
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8).foreach { b =>
        h ^= (b & 0xFFL)
        h *= 0xBF58476D1CE4E5B9L
        h ^= (h >>> 27)
        h *= 0x94D049BB133111EBL
        h ^= (h >>> 31)
      }
      h
    }
    Seq("", "img://page/0/0", "pdf://k/123", "a", "𝔤𝔯𝔞𝔟", "héllo", "mixed𝔤ascii")
      .foreach(s => assert(graft.layout.MediaOcr.hash64(s) == slow(s), s"hash64('$s')"))
  }

  test("goFloat = Go %v for float64 (no trailing .0, 'g' exponent rules)") {
    assert(goFloat(100.0) == "100")
    assert(goFloat(100.5) == "100.5")
    assert(goFloat(0.0) == "0")
    assert(goFloat(-3.0) == "-3")
    assert(goFloat(0.25) == "0.25")
    assert(goFloat(1e21) == "1e+21")
    assert(goFloat(1e20) == "100000000000000000000")
    assert(goFloat(1.5e-5) == "1.5e-05")
    assert(goFloat(0.0001) == "0.0001")
    assert(goFloat(1234.5678) == "1234.5678")
  }

  test("goF0 = Go %.0f (round-half-even, unlike Java's HALF_UP)") {
    assert(goF0(99.5) == "100")
    assert(goF0(98.5) == "98") // Java String.format %.0f would say 99
    assert(goF0(95.0) == "95")
    assert(goF0(0.5) == "0")
    assert(goF0(1.5) == "2")
  }

  test("runeSlice clamps like textFromLayout and slices codepoints") {
    // non-BMP: each emoji is ONE rune in Go, two UTF-16 chars on the JVM
    val s = "a😀b😁c" // a😀b😁c = 5 runes
    assert(runeSlice(s, 0, 2) == "a😀")
    assert(runeSlice(s, 1, 4) == "😀b😁")
    assert(runeSlice(s, -5, 99) == s)
    assert(runeSlice(s, 4, 2) == "") // start>end -> start=end (after clamp)
    assert(runeSlice("", 0, 3) == "")
  }

  test("cleanTokenText: TrimSpace, \\n->space, \\r dropped, break trim") {
    assert(cleanTokenText("word ", hasBreak = false) == "word")
    assert(cleanTokenText("a\nb", hasBreak = false) == "a b")
    assert(cleanTokenText("a\rb", hasBreak = false) == "ab")
    // interior \n becomes a space; break trim then removes it only if last
    assert(cleanTokenText(" x\n", hasBreak = true) == "x")
    assert(cleanTokenText("x", hasBreak = true) == "x")
  }

  test("charset sniff: ISO8859-1 declared -> Latin-1 decode of whole doc") {
    val latin1 = "<meta charset=\"iso-8859-1\"><p>café</p>"
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(decodeWithSniff(latin1).contains("café"))
    val utf8 = "<meta charset=\"utf-8\"><p>café</p>"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    assert(decodeWithSniff(utf8).contains("café"))
    // any non-utf-8 label (even utf-16!) triggers Latin-1 (parse.go:36-44)
    val weird = "charset=utf-16xxxxxxxxxx content".getBytes("UTF-8")
    assert(decodeWithSniff(weird) == new String(weird, "ISO-8859-1"))
  }

  test("latin1Encodable threshold input") {
    assert(latin1Encodable("plain ascii & café"))
    assert(!latin1Encodable("Ā"))
  }

  test("UTF-16BE naive decode: BOM required, no surrogate pairing") {
    val bytes = Array[Byte](0xFE.toByte, 0xFF.toByte, 0x00, 0x41, 0x00, 0x42)
    assert(decodeUtf16beNaive(bytes).contains("AB"))
    assert(decodeUtf16beNaive(Array[Byte](0x00, 0x41)).isEmpty)
    // a surrogate half decodes to U+FFFD, not a paired char
    val sur = Array[Byte](0xFE.toByte, 0xFF.toByte, 0xD8.toByte, 0x3D.toByte)
    assert(decodeUtf16beNaive(sur).contains("�"))
  }

  test("unescapePdfString") {
    assert(unescapePdfString("a\\(b\\)c\\\\d") == "a(b)c\\d")
  }
}
