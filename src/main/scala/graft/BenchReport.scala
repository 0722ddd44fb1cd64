package graft

/** One timed REP from a BenchLevel child — each rep is its own
  * observation, preceded by a recovery nap and a clean-window gate
  * inside the child. `clean` = the bracketing burns sat at the
  * unthrottled hardware floor (0.22-0.27 s on this host; CPU-throttle
  * depletion reads 1.1 s+), the allocation-heavy kernel probe sat at
  * ITS floor (the memory throttle is independent of the CPU one and
  * invisible to the burn), AND the rep's GC task fraction stayed sane
  * (mid-run bucket drain shows up here first — rehearsal 2 measured
  * gcfrac 0.46-0.68 on every back-to-back 16-wide rep while both
  * probes read clean). */
final case class Obs(cores: Int, t: Double, burnBefore: Double,
                     burnAfter: Double, kernel: Double, gcFrac: Double,
                     waitMs: Long) {
  def burnMax: Double = math.max(burnBefore, burnAfter)
  def clean: Boolean = burnMax <= BenchCore.BurnClean &&
    gcFrac <= BenchCore.gcCleanThreshold(cores) &&
    kernel <= BenchCore.kernelCleanThreshold(cores)
}

/** TOTAL (never-throwing) assembly of the two bench JSON lines, plus
  * the child-stdout parser. Split out of [[Bench]] after round 4, where
  * a single OOM-killed child JVM aborted the whole main and the round
  * shipped `parsed: null` — no perf evidence at all. Every function
  * here accepts empty/partial observation sets and still returns
  * driver-parseable JSON (missing levels encode as -1 values, never as
  * absent keys or NaN/Infinity, which JSON.parse rejects).
  * [[graft.BenchReportSpec]] pins: full, one-level-dead, and
  * both-levels-dead inputs all produce machine-parseable lines. */
object BenchReport {

  /** Parse a BenchLevel child's captured stdout into observations.
    * Total: a killed/crashed child (rc!=0, truncated output, no
    * LEVELRESULT line, malformed reps) yields Vector.empty — the caller
    * records a failed level and the run degrades instead of dying. */
  def parseLevelResult(out: Seq[String], cores: Int): Vector[Obs] = {
    val repRe = ("""\{"t":(-?[0-9.]+),"burn_before":(-?[0-9.]+),"burn_after":(-?[0-9.]+),""" +
      """"kernel":(-?[0-9.]+),"gcfrac":(-?[0-9.]+),"wait_ms":([0-9]+)\}""").r
    out.find(_.startsWith("LEVELRESULT ")) match {
      case None => Vector.empty
      case Some(line) =>
        try {
          repRe.findAllMatchIn(line).map { m =>
            Obs(cores, m.group(1).toDouble, m.group(2).toDouble, m.group(3).toDouble,
              m.group(4).toDouble, m.group(5).toDouble, m.group(6).toLong)
          }.toVector
        } catch { case _: Throwable => Vector.empty }
    }
  }

  /** Everything the scaling phase produced — possibly nothing. `pairs`
    * holds only visits where BOTH levels returned observations; the
    * per-level pools (`obsN`/`obsW`) additionally carry observations
    * from half-dead pairs and retries. */
  final case class Scaling(nDocs: Long, nCores: Int, wideCores: Int,
                           pairOrder: Seq[String], pairs: Vector[(Obs, Obs)],
                           obsN: Vector[Obs], obsW: Vector[Obs],
                           retries: Int, levelFailures: Int,
                           elapsedSec: Double, budgetSec: Double)

  object Scaling {
    /** The degenerate all-dead scaling result (headline still prints). */
    def empty(nCores: Int, wideCores: Int, budgetSec: Double): Scaling =
      Scaling(-1L, nCores, wideCores, Nil, Vector.empty, Vector.empty,
        Vector.empty, 0, -1, 0.0, budgetSec)
  }

  /** Min time per level across CLEAN observations, falling back to all
    * observations; -1.0 when the level produced none at all. */
  private def minClean(obs: Vector[Obs]): Double =
    if (obs.isEmpty) -1.0
    else {
      val clean = obs.filter(_.clean)
      (if (clean.nonEmpty) clean else obs).map(_.t).min
    }

  private def fmt(d: Double): String =
    if (d.isNaN || d.isInfinite) "-1.0" else f"$d%.3f"

  private def obsJson(lvl: Vector[Obs]): String =
    lvl.map(o => f"""{"t":${o.t}%.2f,"burn_before":${o.burnBefore}%.2f,"burn_after":${o.burnAfter}%.2f,"kernel":${o.kernel}%.2f,"gcfrac":${o.gcFrac}%.3f,"wait_ms":${o.waitMs},"clean":${o.clean}}""").mkString("[", ",", "]")

  /** Detail line: per-query maps + raw observations. Loss-tolerant (the
    * driver captures only the last ~2,000 chars of stdout; the headline
    * prints LAST and stays under that bound). */
  def detailLine(sc: Scaling, battery: Seq[(String, Double, Long)]): String = {
    val qs = battery.map { case (k, v, _) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val qshuf = battery.map { case (k, _, w) => "\"" + k + "\":" + w }.mkString("{", ",", "}")
    val effs = sc.pairs.map { case (a, b) => fmt(a.t / (4.0 * b.t)) }
    s"""{"detail":"per_query","queries":$qs,"queries_shuffle_write_bytes":$qshuf,"pair_order":[${sc.pairOrder.map("\"" + _ + "\"").mkString(",")}],"scaling_pairs":[${sc.pairs.map { case (a, b) => f"[${a.t}%.2f,${b.t}%.2f]" }.mkString(",")}],"scaling_efficiencies":[${effs.mkString(",")}],"burn_sec_pairs":[${sc.pairs.map { case (a, b) => f"[${a.burnBefore}%.2f,${b.burnBefore}%.2f]" }.mkString(",")}],"kernel_sec_pairs":[${sc.pairs.map { case (a, b) => f"[${a.kernel}%.2f,${b.kernel}%.2f]" }.mkString(",")}],"gc_task_fraction_pairs":[${sc.pairs.map { case (a, b) => f"[${a.gcFrac}%.3f,${b.gcFrac}%.3f]" }.mkString(",")}],"obs_N":${obsJson(sc.obsN)},"obs_4N":${obsJson(sc.obsW)}}"""
  }

  /** Headline line: compact, printed LAST, always under ~1,500 chars so
    * the driver's tail capture gets it whole. Total: every field is a
    * finite JSON number even when a level (or the whole scaling phase)
    * died — dead levels read -1. */
  def headlineLine(sc: Scaling, sfDir: String,
                   battery: Seq[(String, Double, Long)],
                   spillMem: Long, spillDisk: Long,
                   shufRead: Long, shufWrite: Long,
                   childHeap: String): String = {
    val secN = minClean(sc.obsN)
    val secW = minClean(sc.obsW)
    val tpN = if (secN > 0 && sc.nDocs > 0) sc.nDocs / secN else -1.0
    val tpW = if (secW > 0 && sc.nDocs > 0) sc.nDocs / secW else -1.0
    val eff = if (secN > 0 && secW > 0) math.min(1.0, secN / (4.0 * secW)) else -1.0
    val effAll =
      if (sc.obsN.nonEmpty && sc.obsW.nonEmpty)
        math.min(1.0, sc.obsN.map(_.t).min / (4.0 * sc.obsW.map(_.t).min))
      else -1.0
    // headline metric: prefer the wide level; degrade to the narrow one
    val value = if (tpW > 0) tpW else tpN
    val capRatios = sc.pairs.map { case (a, b) =>
      if (a.burnBefore <= 0 || b.burnBefore <= 0) 0.0
      else (sc.wideCores.toDouble / b.burnBefore) / (sc.nCores.toDouble / a.burnBefore)
    }
    val normEffs = sc.pairs.zip(capRatios).map { case ((a, b), cap) =>
      if (cap <= 0) 0.0 else math.min(1.0, (a.t / b.t) / cap)
    }
    val kernelRatios = sc.pairs.map { case (a, b) =>
      if (b.kernel <= 0) 0.0 else a.kernel / b.kernel }
    val planEffs = sc.pairs.zip(kernelRatios).map { case ((a, b), kr) =>
      if (kr <= 0) 0.0 else math.min(1.0, (a.t / b.t) / kr)
    }
    val total = battery.map(_._2).filter(_ >= 0).sum
    s"""{"metric":"extract_docs_per_sec_4N","value":${fmt(value)},"unit":"docs/sec","sf":"$sfDir","n_docs":${sc.nDocs},"n_queries":${battery.size},"total_query_sec":${fmt(total)},"scale_cores_N":${sc.nCores},"scale_cores_4N":${sc.wideCores},"scale_replicas":${BenchCore.ScaleReplicas},"extract_sec_N":${fmt(secN)},"extract_sec_4N":${fmt(secW)},"throughput_N":${fmt(tpN)},"throughput_4N":${fmt(tpW)},"scaling_efficiency":${fmt(eff)},"scaling_efficiency_all_obs":${fmt(effAll)},"level_isolation":"forked_jvm_active_procs_own_heap","child_heap":"$childHeap","burn_clean_threshold_sec":${BenchCore.BurnClean},"gc_clean_thresholds":{"N":${BenchCore.gcCleanThreshold(sc.nCores)},"4N":${BenchCore.gcCleanThreshold(sc.wideCores)}},"kernel_clean_thresholds":{"N":${BenchCore.kernelCleanThreshold(sc.nCores)},"4N":${BenchCore.kernelCleanThreshold(sc.wideCores)}},"n_obs":{"N":${sc.obsN.size},"4N":${sc.obsW.size}},"n_clean_obs":{"N":${sc.obsN.count(_.clean)},"4N":${sc.obsW.count(_.clean)}},"pairs_run":${sc.pairs.size},"level_retries":${sc.retries},"levels_failed":${sc.levelFailures},"bench_elapsed_sec":${fmt(sc.elapsedSec)},"bench_budget_sec":${fmt(sc.budgetSec)},"nap_and_wait_ms_used":${(sc.obsN ++ sc.obsW).map(_.waitMs).sum},"cpu_capacity_ratios":[${capRatios.map(c => f"$c%.2f").mkString(",")}],"capacity_normalized_efficiencies":[${normEffs.map(fmt).mkString(",")}],"kernel_scaling_ratios":[${kernelRatios.map(k => f"$k%.2f").mkString(",")}],"plan_efficiencies_vs_kernel":[${planEffs.map(fmt).mkString(",")}],"shuffle_partitions":{"N":${sc.nCores},"4N":${sc.wideCores}},"spill_bytes_mem":$spillMem,"spill_bytes_disk":$spillDisk,"shuffle_read_bytes":$shufRead,"shuffle_write_bytes":$shufWrite}"""
  }
}
