ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ocrchestraspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forked `runMain graft.Bench` must emit its one-line JSON on RAW stdout:
// sbt's default LoggedOutput prefixes every line with `[info] `, which the
// driver's JSON parser rejects (BENCH_r01 `parsed: null`).
outputStrategy := Some(StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// Forked-run heap: honor SPARK_DRIVER_MEM but CAP at 24g. The driver
// exports ~90g; with -Xms=-Xmx + AlwaysPreTouch that heap is fully
// resident at JVM start, and round 4's bench — whose per-level child
// JVMs then inherited the same args — pre-touched ~180 GiB on a 125 GiB
// host and was kernel-OOM-killed (BENCH_r04 rc=1 signal 137, dmesg:
// 94 GB + 36 GB java RSS). 16g is rehearsal-proven sufficient for every
// main including the full query battery; 24g leaves headroom while
// guaranteeing parent + one 16g bench child always fit.
val runHeap: String = {
  val raw = sys.env.getOrElse("SPARK_DRIVER_MEM", "16g").trim.toLowerCase
  val gib: Double = try {
    if (raw.endsWith("g")) raw.dropRight(1).toDouble
    else if (raw.endsWith("m")) raw.dropRight(1).toDouble / 1024.0
    else if (raw.endsWith("k")) raw.dropRight(1).toDouble / (1024.0 * 1024.0)
    else raw.toDouble / (1024.0 * 1024.0 * 1024.0) // raw bytes
  } catch { case _: NumberFormatException => 16.0 }
  if (gib > 24.0) "24g" else raw
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$runHeap",
  // -Xms = -Xmx: ParallelGC's adaptive heap ramp cost the round-4 bench
  // rehearsal its first pair (GC task fractions 0.34/0.76 while the
  // heap grew from its tiny default); a pre-sized heap makes the first
  // heavy run as GC-stable as the fifth
  s"-Xms$runHeap",
  // Pre-touch the pre-sized heap at startup: without it the first
  // allocation-heavy runs in a fresh JVM pay lazy page commits that
  // read exactly like a memory-bandwidth throttle (KernelScaleProbe:
  // first kernel runs 8-75 s vs the 0.12-0.48 s settled floors, with
  // the register-only burn clean throughout)
  "-XX:+AlwaysPreTouch",
  // ParallelGC beats default G1 on this allocation-heavy single-JVM
  // workload (BASELINE.md A/B: 34->27 s wall on the 16-thread extract;
  // G1's concurrent threads compete with task threads for the same
  // burst-limited cores, Parallel's stop-the-world does not)
  "-XX:+UseParallelGC",
) ++ sys.env.get("GRAFT_GC_LOG").map(f => s"-Xlog:gc:$f").toSeq ++
  sys.env.get("GRAFT_JVM_EXTRA").toSeq.flatMap(_.split(" ").toSeq) ++ Seq(
)
