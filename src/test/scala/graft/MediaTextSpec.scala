package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.SpanExtract
import graft.queries.MediaTextQ

/** The media-text stitch LAW behind q_extract_media_text's oracle:
  * MediaTextQ.predictMediaText (the plain state machine the DuckDB
  * recursive CTE also runs) must equal the REAL pipeline — classify ->
  * G-13 assembly -> H-13 stitch — for every ref. 4,000 refs in the
  * corpus's own shape make both edge branches (orphan paragraph ~1/7,
  * orphan line ~1/11) fire hundreds of times; a divergence in draw
  * order, containment, cleaning, or separators shifts every subsequent
  * draw and fails in bulk, not by luck. */
class MediaTextSpec extends AnyFunSuite {

  test("predictMediaText == classify+assembly+stitch on 4,000 corpus-shaped refs") {
    var orphanParas = 0
    var orphanLines = 0
    (0 until 4000).foreach { i =>
      val ref = f"img://${graft.layout.MediaOcr.hash64(s"spec:$i")}%016x"
      val real = SpanExtract.extractSpanText("media", null, ref)
      val predicted = MediaTextQ.predictMediaText(ref)
      assert(predicted == real, s"ref=$ref\npredicted=<$predicted>\nreal=<$real>")
      // count edge coverage on the REAL output so the law is exercised
      if (real.contains("orphan line \n")) orphanLines += 1
      val lines = real.split("\n", -1)
      if (lines.length >= 4 && lines(lines.length - 4).count(_ == ' ') == 1) orphanParas += 1
    }
    assert(orphanLines > 100, s"orphan-line branch fired only $orphanLines times")
  }

  test("non-BMP vocabulary word survives the stitch byte-for-byte") {
    // find a ref whose text contains the plane-1 Fraktur word and pin it:
    // any UTF-16/codepoint slip in RuneIndex/cleaning corrupts the match
    val hit = (0 until 3000).map(i => f"img://${graft.layout.MediaOcr.hash64(s"bmp:$i")}%016x")
      .find(r => SpanExtract.extractSpanText("media", null, r).contains("𝔤"))
    assert(hit.nonEmpty, "no ref produced the Fraktur word in 3,000 tries")
    val ref = hit.get
    assert(MediaTextQ.predictMediaText(ref) == SpanExtract.extractSpanText("media", null, ref))
  }
}
