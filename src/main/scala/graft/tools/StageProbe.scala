package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: per-stage wall time + task-time distribution for the
  * flagship extract at a given core count.
  * Usage: runMain graft.tools.StageProbe <cores> */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0).toInt else 32
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class StageAgg(name: String) {
      var tasks = 0
      var totalMs = 0L
      var maxMs = 0L
      var gcMs = 0L
      var submitted = 0L
      var completed = 0L
      var inRecords = 0L
      var inBytes = 0L
      var outRecords = 0L
      var spillMem = 0L
      val durations = mutable.ArrayBuffer.empty[Long]
    }
    val stages = mutable.LinkedHashMap.empty[Int, StageAgg]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
        stages.synchronized {
          stages.getOrElseUpdate(e.stageInfo.stageId, StageAgg(e.stageInfo.name.take(60)))
            .submitted = System.currentTimeMillis()
        }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = stages.synchronized {
        val s = stages.getOrElseUpdate(e.stageId, StageAgg("?"))
        s.tasks += 1
        val d = e.taskInfo.duration
        s.totalMs += d
        s.maxMs = Math.max(s.maxMs, d)
        s.durations += d
        if (e.taskMetrics != null) {
          s.gcMs += e.taskMetrics.jvmGCTime
          s.inRecords += e.taskMetrics.inputMetrics.recordsRead
          s.inBytes += e.taskMetrics.inputMetrics.bytesRead
          s.outRecords += e.taskMetrics.shuffleWriteMetrics.recordsWritten
          s.spillMem += e.taskMetrics.memoryBytesSpilled
        }
        s.completed = System.currentTimeMillis()
      }
    })

    // in-process sampling profiler over the executor threads (external
    // jstack/jcmd attach is unavailable in this sandbox): every 50 ms,
    // histogram the topmost in-our-code frame of each running
    // "Executor task launch worker" thread
    val frameCounts = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.LongAdder]()
    val sampling = new java.util.concurrent.atomic.AtomicBoolean(false)
    val sampler = new Thread(() => {
      while (true) {
        if (sampling.get()) {
          val all = Thread.getAllStackTraces
          all.forEach { (t, frames) =>
            if (t.getName.startsWith("Executor task launch worker") && t.getState == Thread.State.RUNNABLE) {
              val top = frames.take(14).map(f => s"${f.getClassName}.${f.getMethodName}")
              // first frame that is interpretable: our code, spark exec, or codegen
              val pick = top.find(f => f.startsWith("graft.") || f.contains("GeneratedClass") ||
                  f.startsWith("org.apache.spark.sql.execution") || f.startsWith("org.apache.spark.sql.catalyst"))
                .getOrElse(top.headOption.getOrElse("<empty>"))
              frameCounts.computeIfAbsent(pick, _ => new java.util.concurrent.atomic.LongAdder).increment()
            }
          }
        }
        Thread.sleep(50)
      }
    })
    sampler.setDaemon(true)
    sampler.start()

    // same corpus + replication shape as graft.Bench's timed region
    val corpus = {
      val path = "/tmp/graft_corpus_sf0.1_v2"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path, "_SUCCESS")))
        graft.fixtures.CorpusGen.preSplit(
          graft.fixtures.CorpusGen.fromDocuments(spark, "/root/testdata/sf0.1"))
          .repartition(32).write.mode("overwrite").parquet(path)
      path
    }
    val replicas = if (args.length > 1) args(1).toInt else 96
    val base = spark.read.parquet(corpus)
    val big = base
      .withColumn("r", explode(sequence(lit(0), lit(replicas - 1))))
      .withColumn("doc_id", concat(col("doc_id"), lit("#"), col("r")))
      .drop("r")
    // warm
    graft.pipeline.Extract.run(base).write.format("noop").mode("overwrite").save()
    stages.clear()
    sampling.set(true)
    val t0 = System.nanoTime()
    graft.pipeline.Extract.run(big).write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    sampling.set(false)
    println(f"WALL cores=$cores $wall%.2fs")
    val totalSamples = frameCounts.values().stream().mapToLong(_.sum()).sum().toDouble
    frameCounts.entrySet().stream()
      .sorted((a, b) => java.lang.Long.compare(b.getValue.sum(), a.getValue.sum()))
      .limit(24)
      .forEach(e => println(f"FRAME ${e.getValue.sum()}%6d (${e.getValue.sum() / totalSamples * 100}%5.1f%%)  ${e.getKey}"))
    stages.toSeq.sortBy(_._1).foreach { case (id, s) =>
      val ds = s.durations.sorted
      val med = if (ds.nonEmpty) ds(ds.length / 2) else 0L
      println(f"STAGE $id%3d tasks=${s.tasks}%4d wall=${s.completed - s.submitted}%6dms cpuSum=${s.totalMs}%7dms med=${med}%5dms max=${s.maxMs}%6dms gc=${s.gcMs}%5dms inRec=${s.inRecords}%9d inMB=${s.inBytes / 1000000}%5d outRec=${s.outRecords}%9d spill=${s.spillMem / 1000000}%5dMB  ${s.name}")
    }
    spark.stop()
  }
}
