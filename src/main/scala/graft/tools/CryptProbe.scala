package graft.tools

import java.nio.charset.StandardCharsets.ISO_8859_1

import graft.hocr.{HLine, HPage, HWord, Hocr}
import graft.model.BBox
import graft.pdf.{PdfCrypt, PdfParse, PdfRender}

/** Single-threaded phase timing of the q_pdf_encrypt per-doc work:
  * build, parse, encrypt (per cipher), re-parse(+decrypt). Run:
  * sbt "runMain graft.tools.CryptProbe [nDocs]" */
object CryptProbe {
  private def page(id: Long, p: Int): HPage =
    HPage(id = s"page_$p", pageNumber = p + 1, bbox = BBox(0, 0, 612, 792),
      lines = Vector(HLine(id = "l1", bbox = BBox(40, 80, 580, 98),
        words = (0 until 6).map(w =>
          HWord(id = s"w$w", text = s"doc${id}pg${p}w$w",
            bbox = BBox(40.0 + w * 90, 80.0, 120.0 + w * 90, 98.0))).toVector)))

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200)
    var tBuild, tParse, tRc4, tA128, tA256, tRe = 0L
    // warmup
    (0 until 20).foreach { i =>
      val src = PdfRender.applyOcrPdf(Hocr(pages = Vector(page(i, 0)))).toOption.get.pdf
      val d = PdfParse.parse(src).toOption.get
      PdfCrypt.encryptAes256(d, "o").foreach(b => PdfParse.parse(b))
    }
    var i = 0L
    while (i < n) {
      var s = System.nanoTime()
      val nPages = (i % 3).toInt + 1
      val src = PdfRender.applyOcrPdf(
        Hocr(pages = (0 until nPages).map(p => page(i, p)).toVector)).toOption.get.pdf
      tBuild += System.nanoTime() - s
      s = System.nanoTime()
      val parsed = PdfParse.parse(src).toOption.get
      tParse += System.nanoTime() - s
      s = System.nanoTime()
      val r = PdfCrypt.encrypt(parsed, s"owner-$i").toOption.get
      tRc4 += System.nanoTime() - s
      s = System.nanoTime()
      val a1 = PdfCrypt.encryptAes128(parsed, s"owner-$i").toOption.get
      tA128 += System.nanoTime() - s
      s = System.nanoTime()
      val a2 = PdfCrypt.encryptAes256(parsed, s"owner-$i").toOption.get
      tA256 += System.nanoTime() - s
      s = System.nanoTime()
      Seq(r, a1, a2).foreach(b => PdfParse.parse(b).toOption.get)
      tRe += System.nanoTime() - s
      i += 1
    }
    def ms(x: Long) = f"${x / 1e6 / n}%.2f ms/doc"
    println(s"CRYPTPROBE n=$n build=${ms(tBuild)} parse=${ms(tParse)} " +
      s"rc4=${ms(tRc4)} aes128=${ms(tA128)} aes256=${ms(tA256)} reparse3x=${ms(tRe)}")
    val _ = (tBuild, ISO_8859_1)
  }
}
