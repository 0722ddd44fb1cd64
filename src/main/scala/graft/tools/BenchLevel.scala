package graft.tools

import graft.BenchCore

/** One bench LEVEL in a dedicated JVM — the faithful sandbox proxy for
  * an N-core executor. [[graft.Bench]] forks this with
  * `-XX:ActiveProcessorCount=<cores>` (plus -Xms = -Xmx), so the GC
  * worker pool, JIT compiler threads and every
  * `Runtime.availableProcessors`-derived pool scale with the LEVEL,
  * exactly as they would on a real N-core executor launched by
  * spark-submit. Measured in round 3/4: in one shared 32-vCPU JVM the
  * local[4] level's ParallelGC ran on ~20 idle host threads — a GC
  * subsidy the 16-thread level does not get (its collections compete
  * with its own tasks), which systematically deflates the 4->16 ratio;
  * a fresh JVM per level also removes cross-level JIT/heap pollution
  * (the round-4 rehearsal's first pair ran at 0.34/0.76 GC task
  * fraction purely from adaptive heap ramp-up).
  *
  * args: cores sfDir timedReps cleanWaitMs
  * stdout: one line `LEVELRESULT {json}` — parsed by the parent.
  * Also usable standalone for level A/Bs (GRAFT_JVM_EXTRA applies when
  * run through sbt).
  */
object BenchLevel {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val sfDir = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
    val cleanWaitMs = if (args.length > 3) args(3).toLong else 60000L

    val (spark, listener) = BenchCore.newSession(cores)
    val corpus = BenchCore.corpusPath(spark, sfDir)
    // JIT-warm the calibration loops, then the replicated plan at 1/8
    BenchCore.burnSec(cores); BenchCore.kernelSec(cores)
    BenchCore.warm(spark, corpus)

    val (burnBefore, kernel, waitUsed) = BenchCore.waitForCleanWindow(cores, cleanWaitMs)
    val (gc0, tt0) = (listener.gcTime.sum(), listener.taskTime.sum())
    val runs = (1 to reps).map(_ => BenchCore.timedReplicated(spark, corpus, BenchCore.Replicas))
    val gcFrac = (listener.gcTime.sum() - gc0).toDouble /
      math.max(1L, listener.taskTime.sum() - tt0)
    val burnAfter = BenchCore.burnSec(cores)
    spark.stop()

    val procs = Runtime.getRuntime.availableProcessors()
    println(
      f"""LEVELRESULT {"cores":$cores,"active_procs":$procs,"runs":[${runs.map(r => f"$r%.3f").mkString(",")}],"t":${runs.min}%.3f,"burn_before":$burnBefore%.3f,"burn_after":$burnAfter%.3f,"kernel":$kernel%.3f,"gcfrac":$gcFrac%.4f,"clean_wait_ms":$waitUsed}""")
  }
}
