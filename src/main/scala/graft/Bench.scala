package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import graft.fixtures.CorpusGen
import graft.pipeline.Extract

/** Benchmark main (driver contract): prints ONE JSON line.
  *
  * Measures (BASELINE.md):
  *  - flagship extraction throughput (docs/sec) at two parallelism levels
  *    (local[4] = N, local[16] = 4N — the sandbox proxy for the north
  *    rule's N vs 4N executors; this host advertises 32 vCPUs but
  *    delivers ~20 effective cores under load, measured with a
  *    subprocess burn test, so the 4/16 pair is the largest ratio the
  *    hardware can actually express) over a pre-materialized corpus,
  *    and the scaling efficiency throughput(4N) / (4 x throughput(N));
  *  - per-query wall seconds for the full battery at local[32];
  *  - shuffle-spill and shuffle-IO bytes via TaskMetrics.
  */
object Bench {

  private final class MetricsListener extends SparkListener {
    val memSpilled = new LongAdder
    val diskSpilled = new LongAdder
    val shuffleRead = new LongAdder
    val shuffleWrite = new LongAdder
    val gcTime = new LongAdder
    val taskTime = new LongAdder
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        memSpilled.add(m.memoryBytesSpilled)
        diskSpilled.add(m.diskBytesSpilled)
        shuffleRead.add(m.shuffleReadMetrics.totalBytesRead)
        shuffleWrite.add(m.shuffleWriteMetrics.bytesWritten)
        gcTime.add(m.jvmGCTime)
      }
      if (e.taskInfo != null) taskTime.add(e.taskInfo.duration)
    }
  }

  private def newSession(cores: Int): (SparkSession, MetricsListener) = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val l = new MetricsListener
    spark.sparkContext.addSparkListener(l)
    (spark, l)
  }

  /** Materialize the synthetic corpus once per sf dir (measured runs then
    * time extraction, not corpus synthesis). The PRE-SPLIT layout —
    * bounded part rows so mega-doc scans parallelize — with n_spans as
    * the pushdown split key; shared with q_extract_presplit. */
  private def corpusPath(spark: SparkSession, sfDir: String): String =
    CorpusGen.materializedPreSplit(spark, sfDir)

  /** Replication factor for the timed run (doc_ids remapped to keep
    * stitch groups distinct): makes the measured region long enough
    * (tens of seconds) that fixed DAG/stage costs (~2-3s) stop
    * dominating the N-vs-4N comparison. */
  private val Replicas = 96

  /** Warm-up: the REPLICATED plan at 1/8 scale — warming with the plain
    * 1x corpus leaves the replicated plan's codegen/JIT cold and the
    * first timed pair measured ~4x slow. */
  private def warm(spark: SparkSession, corpus: String): Unit =
    timedReplicated(spark, corpus, Replicas / 8)

  /** One timed flagship run; returns (seconds, docs). The host VM's CPU
    * allocation is bursty (observed 5x swings on a pure hash loop), so
    * callers take the MIN of several runs. */
  private def timedExtract(spark: SparkSession, corpus: String): (Double, Long) =
    timedReplicated(spark, corpus, Replicas)

  private def timedReplicated(spark: SparkSession, corpus: String, replicas: Int): (Double, Long) = {
    import org.apache.spark.sql.functions.{col, concat, explode, lit, sequence}
    val base = spark.read.parquet(corpus)
    // single-scan replication (a many-branch union would add ~seconds of
    // SERIAL driver planning per run — pure Amdahl loss in the N-vs-4N
    // comparison); schema-generic so it carries the pre-split part_idx
    val big = base
      .withColumn("r", explode(sequence(lit(0), lit(replicas - 1))))
      .withColumn("doc_id", concat(col("doc_id"), lit("#"), col("r")))
      .drop("r")
    val t0 = System.nanoTime()
    Extract.run(big).write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t0) / 1e9
    // docs = distinct doc_ids x replicas (base rows are PARTS, not docs)
    val baseDocs = base.select("doc_id").distinct().count()
    (sec, baseDocs * replicas)
  }

  /** CPU-capacity calibration: a fixed splitmix64 burn on `threads`
    * JVM threads, returning wall seconds. Run IMMEDIATELY before each
    * timed extraction at the same thread count, it measures what the
    * bursty host actually delivers at that moment — reported raw in the
    * JSON so throttle state is visible per measurement, and used for a
    * transparency-only normalized efficiency (raw stays the headline). */
  private def burnSec(threads: Int): Double = {
    val perThread = 60_000_000L // ~60M splitmix rounds per thread
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { t =>
      val th = new Thread(() => {
        var h = 0x9E3779B97F4A7C15L + t
        var i = 0L
        while (i < perThread) {
          h ^= h >>> 30; h *= 0xBF58476D1CE4E5B9L
          h ^= h >>> 27; h *= 0x94D049BB133111EBL
          i += 1
        }
        if (h == 42L) println("") // defeat dead-code elimination
      })
      th.start(); th
    }
    ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  /** Fixed extraction-kernel workload for the second calibration: the
    * real SpanExtract over a synthesized span mix, on plain JVM threads
    * (no Spark). Unlike the register-only burn, this is allocation- and
    * memory-bandwidth-heavy — on this host it tops out at ~2.7-2.8x from
    * 4 to 16 threads (ThreadProbe), which is the scaling CEILING any
    * plan doing this work in one JVM can reach. Reported per pair so the
    * reader can separate (a) host capacity, (b) kernel bandwidth
    * ceiling, (c) plan overhead — only (c) is this engine's doing. */
  /** 20k DISTINCT items (~60+ MB with rendered hOCR), single pass — the
    * working set must exceed L3 so the calibration is DRAM-bound like
    * the real extraction path. The original 1200-item x 8-rep loop was
    * cache-resident and scaled 3-3.5x from 4 to 16 threads, overstating
    * the ceiling the streaming job (which never revisits a document)
    * could reach; the distinct-item version measures the
    * allocation/bandwidth-limited ratio the job actually competes
    * against (StageProbe: ~1/3 of 16-thread task time is GC on this
    * workload — allocation rate, not CPU, is the scaling limiter). */
  private lazy val kernelWork: Array[(String, String, String)] =
    (0 until 20000).toArray.map { i =>
      val h = graft.layout.MediaOcr.hash64(s"k:$i")
      (i % 3) match {
        case 0 => ("html", s"<html><body><nav><a href='/'>x</a></nav><div><p>some long paragraph of text number $i with enough words to pass the threshold easily and then some more filler so the densest block wins $h.</p></div></body></html>", "")
        case 1 =>
          val ocr = graft.layout.MediaOcr.classify(f"pdf://k/$i")
          val page = graft.layout.Assembly.createHocrPage(ocr.page, new graft.layout.RuneIndex(ocr.text), 1)
          ("pdf_layout", graft.hocr.HocrRender.render(graft.layout.Assembly.createHocrDocument(None, Vector(page))), "")
        case _ => ("media", "", f"img://$h%016x")
      }
    }

  private def kernelSec(threads: Int): Double = {
    import java.util.concurrent.{Callable, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(threads)
    val t0 = System.nanoTime()
    val tasks = (0 until threads).map { t =>
      new Callable[Long] {
        def call(): Long = {
          var acc = 0L
          var i = t
          while (i < kernelWork.length) {
            val (k, x, m) = kernelWork(i)
            acc += graft.pipeline.SpanExtract.extractSpanText(k, x, m).length
            i += threads
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

  /** One level observation: timed seconds plus the same-moment
    * calibrations that tell the reader whether the host was throttled
    * while it ran. `clean` = both the pre- and post-run burns sat at
    * the unthrottled hardware floor (0.22-0.27 s on this host; a
    * depleted window reads 1.1 s+ — the two populations never overlap,
    * see BASELINE.md round-3/4 runs). */
  private final case class Obs(t: Double, burnBefore: Double, burnAfter: Double,
                               kernel: Double, gcFrac: Double) {
    def burnMax: Double = math.max(burnBefore, burnAfter)
    def clean(thresh: Double): Boolean = burnMax <= thresh
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    // ---- interleaved N=4 / 4N=16 pairs ----
    // The host throttles CPU after sustained load (burst credits), so
    // absolute timings drift over minutes. Adjacent A/B pairs see similar
    // throttle state, making the RATIO robust; we report every pair,
    // each with its same-moment burn calibration.
    var nDocs = 0L
    burnSec(4); kernelSec(4) // JIT-warm both calibration loops
    // Burn-clean threshold: the register-only burn measures 0.22-0.27 s
    // per level on an unthrottled window (flat across all levels and all
    // rounds — it is a hardware constant, independent of thread count
    // because 16 threads still fit the ~20 effective cores) and 1.1 s+
    // once burst credits deplete. 0.40 s separates the two populations
    // with margin in both directions.
    val BurnClean = 0.40
    // Total sleep budget for clean-window waits (ms). The round-3 driver
    // run landed every 16-level observation on a depleted window and the
    // min-per-level statistic had nothing clean to pick; waiting out a
    // depleted window (bounded) is cheaper than publishing a corrupted
    // ratio. Budget is global so a permanently-throttled host degrades
    // to the old behavior instead of hanging.
    var sleepBudgetMs = 360000L
    def waitForCleanWindow(cores: Int): Double = {
      var b = burnSec(cores)
      while (b > BurnClean && sleepBudgetMs > 0) {
        val nap = math.min(45000L, sleepBudgetMs)
        Thread.sleep(nap)
        sleepBudgetMs -= nap
        b = burnSec(cores)
      }
      b
    }
    // one measured level: session up, warm, clean-window gate (bounded
    // wait until the burn calibration reads unthrottled), same-moment
    // kernel calibration, timed extraction, post-run burn (catches a
    // throttle that landed MID-run), GC fraction.
    def level(cores: Int): Obs = {
      val (s, l) = newSession(cores)
      val corpus = corpusPath(s, sfDir)
      warm(s, corpus)
      val b0 = waitForCleanWindow(cores)
      val kk = kernelSec(cores)
      val (gc0, tt0) = (l.gcTime.sum(), l.taskTime.sum())
      val (t, n) = timedExtract(s, corpus)
      val b1 = burnSec(cores)
      val gcf = (l.gcTime.sum() - gc0).toDouble / math.max(1L, l.taskTime.sum() - tt0)
      nDocs = n
      s.stop()
      Obs(t, b0, b1, kk, gcf)
    }
    // ALTERNATE which level runs first in each pair: the host's burst
    // credits deplete DURING the long timed runs, so a fixed 4-then-16
    // order systematically lands the depletion on the 16 level and
    // deflates every pair's ratio (round-3 run: pair efficiencies
    // 0.817/0.713/0.597, monotonically worse). With alternation the
    // min-per-level statistic picks each level's least-throttled
    // observation from either position, cancelling the order bias.
    val NPairs = 5
    val pairOrder = (1 to NPairs).map(i => if (i % 2 == 1) "4-first" else "16-first")
    val pairsBuf = scala.collection.mutable.ArrayBuffer.empty[(Obs, Obs)]
    (1 to NPairs).foreach { i =>
      val fourFirst = i % 2 == 1
      val (r4, r16) =
        if (fourFirst) { val a = level(4); val b = level(16); (a, b) }
        else { val b = level(16); val a = level(4); (a, b) }
      pairsBuf += ((r4, r16))
    }
    // Bounded per-level retry: if a level has NO burn-clean observation
    // after the alternated pairs (the exact round-3 failure mode — every
    // 16-level run landed throttled), re-run that level up to twice,
    // each behind the clean-window gate. Extra observations join the
    // per-level pool; they do not form pairs.
    val extra4 = scala.collection.mutable.ArrayBuffer.empty[Obs]
    val extra16 = scala.collection.mutable.ArrayBuffer.empty[Obs]
    def allObs4 = pairsBuf.map(_._1) ++ extra4
    def allObs16 = pairsBuf.map(_._2) ++ extra16
    var retries = 0
    while (!allObs4.exists(_.clean(BurnClean)) && retries < 2) { extra4 += level(4); retries += 1 }
    while (!allObs16.exists(_.clean(BurnClean)) && retries < 4) { extra16 += level(16); retries += 1 }
    val obs4 = allObs4.toVector
    val obs16 = allObs16.toVector

    val pairs = pairsBuf.toVector
    val gcFracs = pairs.map { case (a, b) => (a.gcFrac, b.gcFrac) }
    val effs = pairs.map { case (a, b) => (nDocs / b.t) / (4.0 * (nDocs / a.t)) }
    // Primary statistic: min time per LEVEL across burn-CLEAN
    // observations. The burn calibration is an independent register-only
    // probe of host state (it cannot see the extraction time), so
    // gating on it discards only measurements the hypervisor provably
    // corrupted — the round-3 driver run's own burn columns showed 2 of
    // 3 pairs depleted (1.13 s vs the 0.22 s floor) and one
    // physically-impossible efficiency of 2.14. If a level has zero
    // clean observations even after the bounded retries, fall back to
    // all observations (old behavior); `scaling_efficiency_all_obs`
    // always carries the unfiltered number for transparency.
    def minClean(obs: Vector[Obs]): Double = {
      val clean = obs.filter(_.clean(BurnClean))
      (if (clean.nonEmpty) clean else obs).map(_.t).min
    }
    val sec8 = minClean(obs4)
    val sec16 = minClean(obs16)
    val eff = Math.min(1.0, sec8 / (4.0 * sec16))
    val effAllObs = Math.min(1.0, obs4.map(_.t).min / (4.0 * obs16.map(_.t).min))
    val tp8 = nDocs / sec8
    val tp32 = nDocs / sec16
    // capacity-normalized efficiency per pair: what the extraction ratio
    // looks like relative to what the HOST could deliver at that moment.
    // cap ratio = (4 threads of burn work / b4) vs (16 threads / b16):
    // ideal host -> 4.0; a throttled 16-level shows < 4. Transparency
    // metric only.
    val capRatios = pairs.map { case (a, b) => (16.0 / b.burnBefore) / (4.0 / a.burnBefore) }
    val normEffs = pairs.zip(capRatios).map { case ((a, b), cap) =>
      if (cap <= 0) 0.0 else Math.min(1.0, (a.t / b.t) / cap)
    }
    // the extraction-kernel ceiling: same work, plain threads, no Spark.
    // kernelRatio is the best ANY single-JVM plan can scale 4->16 doing
    // this bandwidth-bound work on this host; planEff ~ 1.0 means the
    // Spark plan adds no scaling loss beyond the kernel itself.
    val kernelRatios = pairs.map { case (a, b) => a.kernel / b.kernel }
    val planEffs = pairs.zip(kernelRatios).map { case ((a, b), kr) =>
      if (kr <= 0) 0.0 else Math.min(1.0, (a.t / b.t) / kr)
    }

    // ---- battery session at 32 cores ----
    val (s32, l32) = newSession(32)
    val sec32 = sec16

    // ---- battery at 32 cores ----
    // per-query shuffle-write deltas (listener snapshot around each run):
    // the scale-audit signal — a query whose shuffle bytes dwarf its
    // output is shuffling something it shouldn't
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val w0 = l32.shuffleWrite.sum()
      try {
        fn(s32, sfDir).write.format("noop").mode("overwrite").save()
        (name, (System.nanoTime() - t0) / 1e9, l32.shuffleWrite.sum() - w0)
      } catch { case _: Throwable => (name, -1.0, 0L) }
      // per-query cache teardown (round-3 verdict #6): scoped intra-query
      // caches release here so every battery entry starts cold and is
      // independently measurable; only the documented memos (LSH bands,
      // on-disk pre-split corpus) persist across queries
      finally graft.queries.QCache.releaseScoped()
    }
    val spillMem = l32.memSpilled.sum()
    val spillDisk = l32.diskSpilled.sum()
    val shufRead = l32.shuffleRead.sum()
    val shufWrite = l32.shuffleWrite.sum()
    s32.stop()

    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val qshuf = results.map { case (k, _, w) => "\"" + k + "\":" + w }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // Two lines, detail FIRST and a compact headline LAST: the driver
    // captures only the final ~2,000 chars of stdout, and rounds 1-2 both
    // lost the headline fields because the single line carried two
    // 62-query maps and overflowed that capture (BENCH_r02 `parsed: null`,
    // tail starts mid-line). The headline line below stays well under
    // 1,500 chars even with sbt's trailing `[success]` line, so it always
    // fits the capture whole; the per-query maps ride the detail line
    // (still on stdout for humans/ledger, loss-tolerant).
    val obsJson = (lvl: Vector[Obs]) =>
      lvl.map(o => f"""{"t":${o.t}%.2f,"burn_before":${o.burnBefore}%.2f,"burn_after":${o.burnAfter}%.2f,"kernel":${o.kernel}%.2f,"clean":${o.clean(BurnClean)}}""").mkString("[", ",", "]")
    println(
      s"""{"detail":"per_query","queries":$qs,"queries_shuffle_write_bytes":$qshuf,"pair_order":[${pairOrder.map("\"" + _ + "\"").mkString(",")}],"scaling_pairs":[${pairs.map { case (a, b) => f"[${a.t}%.2f,${b.t}%.2f]" }.mkString(",")}],"scaling_efficiencies":[${effs.map(e => f"$e%.3f").mkString(",")}],"burn_sec_pairs":[${pairs.map { case (a, b) => f"[${a.burnBefore}%.2f,${b.burnBefore}%.2f]" }.mkString(",")}],"kernel_sec_pairs":[${pairs.map { case (a, b) => f"[${a.kernel}%.2f,${b.kernel}%.2f]" }.mkString(",")}],"gc_task_fraction_pairs":[${gcFracs.map { case (a, b) => f"[$a%.3f,$b%.3f]" }.mkString(",")}],"obs_N4":${obsJson(obs4)},"obs_4N16":${obsJson(obs16)}}""")
    println(
      s"""{"metric":"extract_docs_per_sec_4N16","value":${f"$tp32%.2f"},"unit":"docs/sec","sf":"$sfDir","n_docs":$nDocs,"n_queries":${results.size},"total_query_sec":${f"$total%.2f"},"extract_sec_N4":${f"$sec8%.3f"},"extract_sec_4N16":${f"$sec32%.3f"},"throughput_N4":${f"$tp8%.2f"},"throughput_4N16":${f"$tp32%.2f"},"scaling_efficiency":${f"$eff%.3f"},"scaling_efficiency_all_obs":${f"$effAllObs%.3f"},"burn_clean_threshold_sec":$BurnClean,"n_obs":{"N4":${obs4.size},"4N16":${obs16.size}},"n_clean_obs":{"N4":${obs4.count(_.clean(BurnClean))},"4N16":${obs16.count(_.clean(BurnClean))}},"level_retries":$retries,"clean_wait_sleep_ms_used":${360000L - sleepBudgetMs},"cpu_capacity_ratios":[${capRatios.map(c => f"$c%.2f").mkString(",")}],"capacity_normalized_efficiencies":[${normEffs.map(e => f"$e%.3f").mkString(",")}],"kernel_scaling_ratios":[${kernelRatios.map(k => f"$k%.2f").mkString(",")}],"plan_efficiencies_vs_kernel":[${planEffs.map(e => f"$e%.3f").mkString(",")}],"shuffle_partitions":{"N4":4,"4N16":16},"spill_bytes_mem":$spillMem,"spill_bytes_disk":$spillDisk,"shuffle_read_bytes":$shufRead,"shuffle_write_bytes":$shufWrite}""")
  }
}
