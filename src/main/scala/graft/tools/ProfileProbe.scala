package graft.tools

/** Per-kind extraction micro-profile (single thread, warm JIT). */
object ProfileProbe {
  def main(args: Array[String]): Unit = {
    val html = (0 until 500).map { i =>
      graft.fixtures.CorpusGen.genDoc(i.toLong, ("word" + i + " ") * 120)
        .spans.filter(_.kind == "html")
    }.flatten.toArray
    val hocr = (0 until 500).map { i =>
      graft.fixtures.CorpusGen.genDoc(i.toLong, ("word" + i + " ") * 120)
        .spans.filter(_.kind == "pdf_layout")
    }.flatten.toArray
    val media = (0 until 2000).map(i => f"img://prof/$i%d").toArray

    def time(label: String, reps: Int)(body: => Unit): Unit = {
      body // warm
      val t0 = System.nanoTime()
      (0 until reps).foreach(_ => body)
      val ns = (System.nanoTime() - t0) / reps
      println(f"PROFILE $label%-18s ${ns / 1e6}%8.2f ms/rep")
    }

    println(s"spans: html=${html.length} hocr=${hocr.length} media=${media.length}")
    println(f"avg sizes: html=${html.map(_.text.length).sum / html.length}%d chars, hocr=${hocr.map(_.text.length).sum / hocr.length}%d chars")
    time("html-extract", 5) {
      html.foreach(s => graft.pipeline.SpanExtract.extractSpanText("html", s.text, ""))
    }
    time("hocr-extract", 5) {
      hocr.foreach(s => graft.pipeline.SpanExtract.extractSpanText("pdf_layout", s.text, ""))
    }
    time("media-extract", 5) {
      media.foreach(m => graft.pipeline.SpanExtract.extractSpanText("media", "", m))
    }
    // decompose hOCR: parse vs stitch
    val parsed = hocr.map(s => graft.hocr.HocrParse.parseHocrString(s.text).toOption.get)
    time("hocr-parse-only", 5) {
      hocr.foreach(s => graft.hocr.HocrParse.parseHocrString(s.text))
    }
    time("hocr-stitch-only", 20) {
      parsed.foreach(h => graft.hocr.HocrText.extractText(h))
    }
    // decompose media: classify vs assemble vs stitch
    time("media-classify", 10) { media.foreach(graft.layout.MediaOcr.classify) }
    val classified = media.map(graft.layout.MediaOcr.classify)
    time("media-assemble", 10) {
      classified.foreach(r => graft.layout.Assembly.createHocrPage(
        r.page, new graft.layout.RuneIndex(r.text), 1))
    }
    // html decompose: dom parse vs boilerplate walk
    time("html-dom-parse", 5) { html.foreach(s => graft.html.HtmlDom.parse(s.text)) }
    // hocr decompose further: DOM tokenize vs hOCR tree walk
    time("hocr-dom-parse", 5) { hocr.foreach(s => graft.html.HtmlDom.parse(s.text)) }
    val doms = hocr.map(s => graft.html.HtmlDom.parse(s.text))
    time("hocr-walk-only", 5) {
      doms.foreach { d =>
        def find(n: graft.html.HtmlDom.Node): Unit = {
          if (n.nodeType == graft.html.HtmlDom.ElementNode && n.data == "div" &&
              n.attr("class").contains("ocr_page")) { graft.hocr.HocrParse.processPage(n); () }
          else n.children.foreach(find)
        }
        find(d)
      }
    }
  }
}
