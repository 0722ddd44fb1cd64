package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-4 verdict's degradation requirement: a killed child
  * JVM (the BENCH_r04 OOM — signal 137, truncated stdout) must cost one
  * level's observations, NOT the round's perf evidence. Every input
  * shape — full, one-level-dead, all-dead, truncated/garbled child
  * stdout — must still yield two strictly-parseable JSON lines with the
  * headline's driver-read keys present and finite. */
class BenchReportSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  private def parse(line: String) = mapper.readTree(line)

  private def obs(cores: Int, t: Double, burn: Double = 0.25,
                  kernel: Double = 0.2, gc: Double = 0.2): Obs =
    Obs(cores, t, burn, burn, kernel, gc, 1000L)

  private val battery = Seq(("q_a", 1.5, 100L), ("q_b", -1.0, 0L))

  private def scaling(obsN: Vector[Obs], obsW: Vector[Obs],
                      pairs: Vector[(Obs, Obs)]): BenchReport.Scaling =
    BenchReport.Scaling(1000L, 2, 8, Seq("narrow-first"), pairs, obsN, obsW,
      retries = 1, levelFailures = 2 - Seq(obsN, obsW).count(_.nonEmpty),
      elapsedSec = 123.4, budgetSec = 1800.0)

  private val headlineKeys = Seq("metric", "value", "unit", "throughput_N",
    "throughput_4N", "scaling_efficiency", "extract_sec_N", "extract_sec_4N",
    "n_queries", "levels_failed", "pairs_run", "spill_bytes_disk")

  private def assertHeadline(sc: BenchReport.Scaling): com.fasterxml.jackson.databind.JsonNode = {
    val line = BenchReport.headlineLine(sc, "/tmp/sf", battery, 0L, 0L, 10L, 20L, "16g")
    val node = parse(line) // throws on any malformed JSON (NaN, Infinity, truncation)
    headlineKeys.foreach(k => assert(node.has(k), s"headline missing $k"))
    assert(parse(BenchReport.detailLine(sc, battery)).has("queries"))
    node
  }

  test("full two-level data: parses, efficiency in (0,1]") {
    val a = obs(2, 40.0); val b = obs(8, 11.0)
    val node = assertHeadline(scaling(Vector(a), Vector(b), Vector((a, b))))
    val eff = node.get("scaling_efficiency").asDouble()
    assert(eff > 0.0 && eff <= 1.0)
    assert(math.abs(eff - 40.0 / 44.0) < 1e-3) // headline prints %.3f
    assert(node.get("throughput_4N").asDouble() > 0.0)
    assert(node.get("value").asDouble() === node.get("throughput_4N").asDouble())
  }

  test("wide level dead (child OOM-killed): still parses, degrades to narrow throughput") {
    val a = obs(2, 40.0)
    val node = assertHeadline(scaling(Vector(a), Vector.empty, Vector.empty))
    assert(node.get("scaling_efficiency").asDouble() === -1.0)
    assert(node.get("throughput_4N").asDouble() === -1.0)
    // headline metric degrades to the surviving level instead of dying
    assert(node.get("value").asDouble() === 1000.0 / 40.0)
    assert(node.get("levels_failed").asInt() === 1)
  }

  test("both levels dead: still parses with -1 sentinels") {
    val node = assertHeadline(scaling(Vector.empty, Vector.empty, Vector.empty))
    assert(node.get("value").asDouble() === -1.0)
    assert(node.get("scaling_efficiency").asDouble() === -1.0)
  }

  test("whole scaling phase aborted: Scaling.empty still renders both lines") {
    val node = assertHeadline(BenchReport.Scaling.empty(2, 8, 1800.0))
    assert(node.get("n_docs").asLong() === -1L)
  }

  test("parseLevelResult: good LEVELRESULT line yields all reps") {
    val line = """LEVELRESULT {"cores":8,"active_procs":8,"reps":[{"t":11.500,"burn_before":0.250,"burn_after":0.260,"kernel":0.200,"gcfrac":0.3000,"wait_ms":45000},{"t":12.100,"burn_before":0.240,"burn_after":0.250,"kernel":0.210,"gcfrac":0.3100,"wait_ms":45000}]}"""
    val reps = BenchReport.parseLevelResult(Vector("noise", line), 8)
    assert(reps.size === 2)
    assert(reps.head.t === 11.5)
    assert(reps.head.cores === 8)
  }

  test("parseLevelResult: kill-9-truncated stdout (no LEVELRESULT) yields empty, not a throw") {
    assert(BenchReport.parseLevelResult(Vector("partial spark log line"), 8).isEmpty)
    assert(BenchReport.parseLevelResult(Vector.empty, 8).isEmpty)
    // garbled reps payload
    assert(BenchReport.parseLevelResult(Vector("LEVELRESULT {\"cores\":8,\"reps\":[{\"t\":broken"), 8).isEmpty)
  }
}
