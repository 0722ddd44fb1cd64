package graft.tools

import graft.BenchCore

/** No-Spark scaling of the DRAM-bound extraction kernel across thread
  * counts — the single-JVM scaling CEILING at each level pair. The
  * round-4 question: at which N does N -> 4N stop being a measurement
  * of the plan and start being a measurement of the host's memory
  * bandwidth? (4->16 threads saturates DRAM at ~2.4-2.7x on this host —
  * a 0.6-0.675 efficiency ceiling BEFORE any Spark overhead; 1->4 and
  * 2->8 stay under the bandwidth knee.)
  *
  * Usage: runMain graft.tools.KernelScaleProbe [threads...]
  * (default 1 2 4 8 16; min-of-3 with naps, burn alongside for
  * throttle context)
  */
object KernelScaleProbe {
  def main(args: Array[String]): Unit = {
    val counts = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 2, 4, 8, 16)
    BenchCore.kernelSec(4) // JIT warm
    BenchCore.burnSec(4)
    val res = counts.map { c =>
      val runs = (1 to 3).map { _ =>
        Thread.sleep(3000)
        val b = BenchCore.burnSec(c)
        val k = BenchCore.kernelSec(c)
        (k, b)
      }
      val best = runs.minBy(_._1)
      println(f"KERNEL threads=$c%2d min_kernel=${best._1}%.3f burn_at_min=${best._2}%.3f all=${runs.map(r => f"${r._1}%.3f").mkString(",")}")
      c -> best._1
    }
    val m = res.toMap
    def ratio(a: Int, b: Int): String =
      if (m.contains(a) && m.contains(b)) f"${m(a) / m(b)}%.2f" else "n/a"
    println(s"RATIOS 1->4=${ratio(1, 4)} 2->8=${ratio(2, 8)} 4->16=${ratio(4, 16)}")
  }
}
