package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: measure raw task-parallel scaling of this JVM/host for
  * (a) pure CPU work and (b) the real per-span extraction, at two core
  * counts. Usage: runMain graft.tools.ScaleProbe [sfDir] */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"

    def session(cores: Int): SparkSession = {
      val s = SparkSession.builder().master(s"local[$cores]")
        .appName(s"probe$cores")
        .config("spark.sql.shuffle.partitions", cores.toString)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      s
    }

    // (a) pure CPU: hash mixing, no allocation
    val burn = udf((x: Long) => {
      var h = x
      var i = 0
      while (i < 200000) { h = h * 6364136223846793005L + 1442695040888963407L; i += 1 }
      h
    })
    // (b) allocation-heavy: the real extraction udf
    val extract = udf((kind: String, text: String, mediaRef: String) =>
      graft.pipeline.SpanExtract.extractSpanText(kind, text, mediaRef))

    for (cores <- Seq(32, 8, 32)) {
      val s = session(cores)
      import s.implicits._
      // warm
      s.range(0, 256, 1, cores).select(burn(col("id"))).write.format("noop").mode("overwrite").save()
      var t0 = System.nanoTime()
      s.range(0, 2048, 1, cores * 4).select(burn(col("id"))).write.format("noop").mode("overwrite").save()
      val cpuSec = (System.nanoTime() - t0) / 1e9

      // same pre-split cache the bench uses (built here if absent) —
      // named from sfDir so probing another scale can't poison the
      // bench's sf0.1 cache with wrong-scale data
      val sfName = java.nio.file.Paths.get(sfDir).getFileName.toString
      val corpusPath = s"/tmp/graft_corpus_${sfName}_v2"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(corpusPath, "_SUCCESS")))
        graft.fixtures.CorpusGen.preSplit(
          graft.fixtures.CorpusGen.fromDocuments(s, sfDir))
          .repartition(32).write.mode("overwrite").parquet(corpusPath)
      val corpus0 = s.read.parquet(corpusPath)
      val corpus = (0 until 8).map(i => corpus0.withColumn("doc_id", concat(col("doc_id"), lit(i.toString)))).reduce(_ unionAll _)
      val spansOnly = graft.pipeline.Extract.extractSpans(corpus)
      spansOnly.write.format("noop").mode("overwrite").save() // warm
      t0 = System.nanoTime()
      spansOnly.write.format("noop").mode("overwrite").save()
      val exSec = (System.nanoTime() - t0) / 1e9
      val full = graft.pipeline.Extract.run(corpus)
      t0 = System.nanoTime()
      full.write.format("noop").mode("overwrite").save()
      val fullSec = (System.nanoTime() - t0) / 1e9
      println(f"PROBE cores=$cores%2d cpu_burn=$cpuSec%6.2fs extractOnly=$exSec%6.2fs full=$fullSec%6.2fs")
      s.stop()
    }
  }
}
