package graft.tools

import org.apache.spark.sql.SparkSession

/** One bench LEVEL in isolation: the exact replicated flagship
  * extraction Bench times, at a given core count, min-of-k. Run it
  * under different JVM flags (GRAFT_JVM_EXTRA) to A/B collector
  * settings per level — e.g. quantifying the ParallelGCThreads
  * distortion: a local[4] session in a default JVM still gets ~23 GC
  * worker threads on this host's idle cores, so the 4-thread level's
  * GC is nearly wall-free while the 16-thread level's GC competes with
  * its own tasks, deflating the measured 4->16 ratio.
  *
  * Usage: runMain graft.tools.LevelProbe <cores> [k] [replicas] [sfDir]
  * Prints: LEVEL cores=<c> gcThreads=<g> runs=[..] min=<s>
  */
object LevelProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val k = if (args.length > 1) args(1).toInt else 2
    val replicas = if (args.length > 2) args(2).toInt else 96
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"

    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-level-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpus = graft.fixtures.CorpusGen.materializedPreSplit(spark, sfDir)

    import org.apache.spark.sql.functions.{col, concat, explode, lit, sequence}
    def timed(reps: Int): Double = {
      val base = spark.read.parquet(corpus)
      val big = base
        .withColumn("r", explode(sequence(lit(0), lit(reps - 1))))
        .withColumn("doc_id", concat(col("doc_id"), lit("#"), col("r")))
        .drop("r")
      val t0 = System.nanoTime()
      graft.pipeline.Extract.run(big).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    timed(replicas / 8) // warm (the replicated plan, like Bench.warm)
    val runs = (1 to k).map(_ => timed(replicas))
    val gcThreads = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    println(f"LEVEL cores=$cores gcBeans=${gcThreads.size} " +
      s"runs=[${runs.map(r => f"$r%.2f").mkString(",")}] min=${f"${runs.min}%.2f"}")
    spark.stop()
  }
}
