package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.hocr._
import graft.model.BBox
import graft.text.GoStrings

/** Property-based round-trip laws (SURVEY.md §5.2 item 2), driven by
  * deterministic scalacheck generators (seeded; scalatestplus bridge is
  * not available offline, so we sample explicitly). */
class PropertySpec extends AnyFunSuite {

  private val params = Gen.Parameters.default.withSize(12)
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).map(i => g.pureApply(params, Seed(42L + i), retries = 200))

  // word text safe for the non-escaping renderer (text/template inserts
  // raw text, parse.go decodes entities — so avoid markup chars)
  private val wordText: Gen[String] =
    Gen.nonEmptyListOf(Gen.oneOf(
      Gen.alphaNumChar.map(_.toString),
      Gen.oneOf("é", "ß", "€", "😀", "中"))).map(_.take(6).mkString)

  private val genWord: Gen[HWord] = for {
    t <- wordText
    id <- Gen.identifier.map(_.take(8))
    conf <- Gen.chooseNum(0, 100).map(_.toDouble)
    x1 <- Gen.chooseNum(0, 500); y1 <- Gen.chooseNum(0, 500)
    w <- Gen.chooseNum(1, 100); h <- Gen.chooseNum(1, 40)
  } yield HWord(id = id, text = t, bbox = BBox(x1, y1, x1 + w, y1 + h), confidence = conf)

  private val genLine: Gen[HLine] = for {
    id <- Gen.identifier.map(_.take(8))
    words <- Gen.nonEmptyListOf(genWord).map(_.take(5).toVector)
  } yield HLine(id = id, words = words, bbox = BBox(0, 0, 600, 40))

  private val genPara: Gen[HPara] = for {
    id <- Gen.identifier.map(_.take(8))
    lines <- Gen.listOf(genLine).map(_.take(3).toVector)
    words <- Gen.listOf(genWord).map(_.take(2).toVector)
  } yield HPara(id = id, lines = lines, words = words, bbox = BBox(0, 0, 600, 200))

  private val genArea: Gen[HArea] = for {
    id <- Gen.identifier.map(_.take(8))
    paras <- Gen.listOf(genPara).map(_.take(2).toVector)
    lines <- Gen.listOf(genLine).map(_.take(2).toVector)
    words <- Gen.listOf(genWord).map(_.take(2).toVector)
  } yield HArea(id = id, paragraphs = paras, lines = lines, words = words, bbox = BBox(0, 0, 600, 400))

  private val genPage: Gen[HPage] = for {
    n <- Gen.chooseNum(1, 3)
    areas <- Gen.listOf(genArea).map(_.take(2).toVector)
    paras <- Gen.listOf(genPara).map(_.take(2).toVector)
    lines <- Gen.listOf(genLine).map(_.take(2).toVector)
  } yield HPage(id = s"page_$n", pageNumber = n, areas = areas, paragraphs = paras,
    lines = lines, bbox = BBox(0, 0, 1000, 1400))

  private val genHocr: Gen[Hocr] = for {
    pages <- Gen.nonEmptyListOf(genPage).map(_.take(3).toVector)
    lang <- Gen.oneOf("", "en", "de")
  } yield Hocr(title = "t", language = lang, pages = pages)

  test("property: extractText(parse(render(h))) == extractText(h), 60 trees") {
    samples(genHocr, 60).foreach { h =>
      val rendered = HocrRender.render(h)
      val reparsed = HocrParse.parseHocr(rendered.getBytes("UTF-8")).toOption.get
      assert(HocrText.extractText(reparsed) == HocrText.extractText(h), rendered.take(400))
    }
  }

  test("property: render o parse reaches a fixpoint after one iteration") {
    samples(genHocr, 30).foreach { h =>
      val r1 = HocrRender.render(h)
      val p1 = HocrParse.parseHocr(r1.getBytes("UTF-8")).toOption.get
      val r2 = HocrRender.render(p1)
      val p2 = HocrParse.parseHocr(r2.getBytes("UTF-8")).toOption.get
      assert(HocrRender.render(p2) == r2)
    }
  }

  test("property: runeSlice == naive codepoint-array slice with clamping") {
    val genStr = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar.map(_.toString), Gen.const("😀"), Gen.const("é"), Gen.const("中")))
      .map(_.mkString)
    val triples = for {
      s <- genStr; a <- Gen.chooseNum(-3, 30); b <- Gen.chooseNum(-3, 30)
    } yield (s, a, b)
    samples(triples, 300).foreach { case (s, a, b) =>
      val cps = s.codePoints().toArray
      var start = Math.max(a, 0)
      var end = Math.min(b, cps.length)
      if (end < 0) end = 0
      if (start > end) start = end
      val expected = new String(cps.slice(start, end), 0, end - start)
      assert(GoStrings.runeSlice(s, a, b) == expected, s"($s, $a, $b)")
    }
  }

  test("property: goFloat round-trips through parseDouble; ints stay ints") {
    samples(Gen.chooseNum(-1e9, 1e9), 500).foreach { d =>
      assert(java.lang.Double.parseDouble(GoStrings.goFloat(d)) == d, d.toString)
    }
    samples(Gen.chooseNum(-100000, 100000), 300).foreach { i =>
      assert(GoStrings.goFloat(i.toDouble) == i.toString)
    }
  }

  test("property: PDF emit -> parse -> modify round-trip over random hOCR trees") {
    import graft.pdf.{PdfOps, PdfParse, PdfRender}
    samples(genHocr, 25).foreach { h =>
      PdfRender.applyOcrPdf(h, layerNameBase = "Scan Text") match {
        case Left(e) =>
          // only the reference's >10%-encoding-errors gate may refuse
          assert(e.contains("character encoding issues"), e)
        case Right(src) =>
          // parse: page count and MediaBox from every emitted page
          val doc = PdfParse.parse(src.pdf).toOption.get
          val pages = doc.pages.toOption.get
          assert(pages.length == h.pages.length)
          pages.zip(h.pages).foreach { case (p, hp) =>
            assert(p.mediaBox.exists { case (_, _, x2, y2) =>
              math.abs(x2 - hp.bbox.x2) < 0.01 && math.abs(y2 - hp.bbox.y2) < 0.01 })
            assert(p.contentObjs.nonEmpty)
            assert(doc.decodedStream(p.contentObjs.head).isRight)
          }
          // modify: import every page under a new layer; result reparses
          // with the same page count and carries both layer families
          PdfRender.modifyExistingPdf(src.pdf, h) match {
            case Left(e) => assert(e.contains("character encoding issues"), e)
            case Right(out) =>
              val re = PdfParse.parse(out.pdf).toOption.get
              assert(re.pages.toOption.get.length == h.pages.length)
              val layers = PdfOps.detectPdfLayers(out.pdf).toOption.get
              assert(layers.exists(_.startsWith("OCR Text")) &&
                layers.exists(_.startsWith("Scan Text")), layers)
          }
      }
    }
  }

  test("property: trimSpace/fields laws") {
    val genWs = Gen.listOf(Gen.oneOf("a", "b", " ", "\t", "\n", " ", "")).map(_.mkString)
    samples(genWs, 300).foreach { s =>
      val t = GoStrings.trimSpace(s)
      assert(t.isEmpty || (!GoStrings.isSpace(t.head) && !GoStrings.isSpace(t.last)))
      val f = GoStrings.fields(s)
      assert(f.forall(w => w.nonEmpty && !w.exists(GoStrings.isSpace)))
      assert(f.mkString("") == s.filterNot(GoStrings.isSpace))
    }
  }

  test("property: VectorExprs.quantize == BigDecimal HALF_UP of x*1000 (Spark Round law)") {
    // the exact semantics Spark's Round(DoubleType) implements — the
    // claim VectorExprs' Scaladoc makes, proven over generated floats
    // incl. .5 ties (k/16), negatives, tiny and large magnitudes
    def spec(x: Float): Long =
      java.math.BigDecimal.valueOf(x.toDouble * 1000.0)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    val gen: Gen[Float] = Gen.oneOf(
      Gen.chooseNum(-32, 32).map(_ / 16.0f),          // exact .5 ties
      Gen.chooseNum(-1000000, 1000000).map(_ / 1e6f), // embedding range
      Gen.chooseNum(-2000, 2000).map(_ / 1e9f),       // quantizes to 0
      Gen.chooseNum(-100000, 100000).map(_.toFloat))  // large magnitudes
    samples(gen, 2000).foreach { x =>
      assert(graft.functions.VectorExprs.quantize(x) == spec(x), s"x=$x")
    }
  }

  test("property: PNG predictor round-trip for every filter tag (PdfParse.unpredict)") {
    // forward-apply each PNG filter to random rows, then unpredict must
    // restore the original bytes — covers Sub/Up/Average/Paeth paths the
    // xref-stream fixtures (which use Up) don't reach
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    def encode(data: Array[Byte], cols: Int, tag: Int): Array[Byte] = {
      val nRows = data.length / cols
      val out = new Array[Byte](nRows * (cols + 1))
      var prev = new Array[Byte](cols)
      for (r <- 0 until nRows) {
        val row = java.util.Arrays.copyOfRange(data, r * cols, (r + 1) * cols)
        out(r * (cols + 1)) = tag.toByte
        for (i <- 0 until cols) {
          val left = if (i > 0) row(i - 1) & 0xFF else 0
          val up = prev(i) & 0xFF
          val upLeft = if (i > 0) prev(i - 1) & 0xFF else 0
          val pred = tag match {
            case 0 => 0
            case 1 => left
            case 2 => up
            case 3 => (left + up) >> 1
            case 4 => paeth(left, up, upLeft)
          }
          out(r * (cols + 1) + 1 + i) = (row(i) - pred).toByte
        }
        prev = row
      }
      out
    }
    val gen = for {
      cols <- Gen.chooseNum(1, 9)
      nRows <- Gen.chooseNum(1, 12)
      data <- Gen.listOfN(cols * nRows, Gen.chooseNum(-128, 127).map(_.toByte))
      tag <- Gen.chooseNum(0, 4)
    } yield (cols, data.toArray, tag)
    samples(gen, 300).foreach { case (cols, data, tag) =>
      val dec = graft.pdf.PdfParse.unpredict(encode(data, cols, tag), 10 + tag, cols)
      assert(dec.exists(_.sameElements(data)), s"tag=$tag cols=$cols: $dec")
    }
    // mixed tags per row (real writers vary the filter row-by-row)
    samples(gen, 100).foreach { case (cols, data, _) =>
      val nRows = data.length / cols
      val enc = new Array[Byte](nRows * (cols + 1))
      var prev = new Array[Byte](cols)
      for (r <- 0 until nRows) {
        val tag = (r * 7 + cols) % 5
        val one = encode(
          prev ++ java.util.Arrays.copyOfRange(data, r * cols, (r + 1) * cols), cols, tag)
        // take the second encoded row (encoded against `prev` correctly)
        System.arraycopy(one, cols + 1, enc, r * (cols + 1), cols + 1)
        prev = java.util.Arrays.copyOfRange(data, r * cols, (r + 1) * cols)
      }
      val dec = graft.pdf.PdfParse.unpredict(enc, 12, cols)
      assert(dec.exists(_.sameElements(data)), s"mixed tags cols=$cols")
    }
  }
}
