package graft.tools

import graft.BenchCore

/** One-shot host-state pulse: JIT-warm briefly, then print one line with
  * the register-only burn (CPU-credit state) and the allocation-heavy
  * extraction kernel (memory-bandwidth state) at `threads` (default 4).
  * The two throttles are independent on this host (CLAUDE.md): burn
  * clean + kernel 10-100x floor = memory-side depletion; both elevated =
  * CPU-credit depletion. Cheap enough to poll between work phases.
  *
  * Rep 1 of a fresh JVM carries kernelWork init + JIT ramp — it is
  * labeled warmup and its verdict untrusted; read rep 2+.
  *
  * Usage: runMain graft.tools.HostPulse [threads] [reps]
  */
object HostPulse {
  def main(args: Array[String]): Unit = {
    val threads = if (args.nonEmpty) args(0).toInt else 4
    val reps = if (args.length > 1) args(1).toInt else 2
    BenchCore.burnSec(threads) // JIT warm (cheap, register-only)
    (1 to reps).foreach { r =>
      val b = BenchCore.burnSec(threads)
      val k = BenchCore.kernelSec(threads)
      val verdict =
        if (r == 1) "WARMUP"
        else if (b <= BenchCore.BurnClean && k <= BenchCore.kernelCleanThreshold(threads)) "CLEAN"
        else if (b <= BenchCore.BurnClean) "MEM-THROTTLED"
        else "CPU-THROTTLED"
      println(f"PULSE rep=$r threads=$threads burn=$b%.3f kernel=$k%.3f state=$verdict")
      if (r < reps) Thread.sleep(5000)
    }
  }
}
