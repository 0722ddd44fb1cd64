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
        if (e.taskMetrics != null) s.gcMs += e.taskMetrics.jvmGCTime
        s.completed = System.currentTimeMillis()
      }
    })

    val base = spark.read.parquet("/tmp/graft_corpus_sf0.1")
    val big = base
      .select(explode(sequence(lit(0), lit(31))).as("r"), col("doc_id"), col("spans"), col("n_spans"))
      .select(concat(col("doc_id"), lit("#"), col("r")).as("doc_id"), col("spans"), col("n_spans"))
    // warm
    graft.pipeline.Extract.run(base).write.format("noop").mode("overwrite").save()
    stages.clear()
    val t0 = System.nanoTime()
    graft.pipeline.Extract.run(big).write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"WALL cores=$cores $wall%.2fs")
    stages.toSeq.sortBy(_._1).foreach { case (id, s) =>
      val ds = s.durations.sorted
      val med = if (ds.nonEmpty) ds(ds.length / 2) else 0L
      println(f"STAGE $id%3d tasks=${s.tasks}%4d wall=${s.completed - s.submitted}%6dms cpuSum=${s.totalMs}%7dms med=${med}%5dms max=${s.maxMs}%6dms gc=${s.gcMs}%5dms  ${s.name}")
    }
    spark.stop()
  }
}
