package graft.tools

import java.util.concurrent.{Callable, Executors, TimeUnit}

/** Diagnostic: raw multi-thread scaling of SpanExtract WITHOUT Spark —
  * isolates code-level contention from harness effects. */
object ThreadProbe {
  def main(args: Array[String]): Unit = {
    val work: Array[(String, String, String)] = (0 until 4000).toArray.map { i =>
      val h = graft.layout.MediaOcr.hash64(s"p:$i")
      (i % 3) match {
        case 0 => ("html", s"<html><body><nav><a href='/'>x</a></nav><div><p>some long paragraph of text number $i with enough words to pass the threshold easily and then some.</p></div></body></html>", "")
        case 1 =>
          val ocr = graft.layout.MediaOcr.classify(f"pdf://$i")
          val page = graft.layout.Assembly.createHocrPage(ocr.page, new graft.layout.RuneIndex(ocr.text), 1)
          ("pdf_layout", graft.hocr.HocrRender.render(graft.layout.Assembly.createHocrDocument(None, Vector(page))), "")
        case _ => ("media", "", f"img://$h%016x")
      }
    }
    def run(threads: Int): Double = {
      val pool = Executors.newFixedThreadPool(threads)
      val t0 = System.nanoTime()
      val tasks = (0 until threads).map { t =>
        new Callable[Long] {
          def call(): Long = {
            var acc = 0L
            var rep = 0
            while (rep < 24) {
              var i = t
              while (i < work.length) {
                val (k, x, m) = work(i)
                acc += graft.pipeline.SpanExtract.extractSpanText(k, x, m).length
                i += threads
              }
              rep += 1
            }
            acc
          }
        }
      }
      pool.invokeAll(scala.jdk.CollectionConverters.SeqHasAsJava(tasks).asJava)
      pool.shutdown()
      pool.awaitTermination(10, TimeUnit.MINUTES)
      (System.nanoTime() - t0) / 1e9
    }
    run(4) // warm JIT
    var base = -1.0
    for (t <- Seq(1, 4, 16, 4, 16)) {
      val s = run(t)
      if (t == 1) base = s
      println(f"THREADS $t%2d  wall=$s%6.2fs  speedup_vs_1=${if (base > 0) base / s else -1.0}%.2f")
    }
    // second pass to print speedups properly
    val s1 = run(1); val s8 = run(8); val s32 = run(32)
    println(f"THREADPROBE s1=$s1%.2f s8=$s8%.2f (x${s1 / s8}%.1f) s32=$s32%.2f (x${s1 / s32}%.1f)")
  }
}
