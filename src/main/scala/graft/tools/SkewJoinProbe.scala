package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** AQE skew-join evidence (BASELINE.md "skew handling"): a shuffle join
  * where half the probe side shares ONE key. Without AQE skew handling
  * that key's partition is a straggler; with it, AQE splits the skewed
  * partition into many subtasks. Reports max/median task time and task
  * count of each run. Usage: runMain graft.tools.SkewJoinProbe */
object SkewJoinProbe {
  def main(args: Array[String]): Unit = {
    def run(skewJoin: Boolean): Unit = {
      val spark = SparkSession.builder().master("local[8]")
        .appName(s"skewjoin-$skewJoin")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", skewJoin.toString)
        // thresholds scaled to the demo's MBs (defaults are tuned for GBs)
        .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2m")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val taskTimes = mutable.ArrayBuffer.empty[Long]
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
          taskTimes.synchronized { taskTimes += e.taskInfo.duration }
      })
      // probe side: 4M rows, 50% on the hot key 0, rest uniform over 1k keys
      val probe = spark.range(4000000L).select(
        when(col("id") % 2 === 0, lit(0L)).otherwise(col("id") % 1000).as("k"),
        concat(lit("payload_"), col("id")).as(("p")))
      val build = spark.range(1000L).select(col("id").as("k"),
        concat(lit("dim_"), col("id")).as("d"))
      val t0 = System.nanoTime()
      probe.join(build, Seq("k"))
        .select(sum(length(col("p")) + length(col("d"))))
        .collect()
      val wall = (System.nanoTime() - t0) / 1e9
      val ts = taskTimes.synchronized(taskTimes.sorted.toVector)
      val med = if (ts.nonEmpty) ts(ts.length / 2) else 0L
      val max = if (ts.nonEmpty) ts.last else 0L
      println(f"SKEWJOIN aqeSkew=$skewJoin%-5s wall=$wall%6.2fs tasks=${ts.length}%4d medTask=${med}%5dms maxTask=${max}%6dms max/med=${if (med > 0) max.toDouble / med else 0.0}%6.1f")
      spark.stop()
    }
    run(skewJoin = false) // warm-up + baseline
    run(skewJoin = true)
    run(skewJoin = false)
    run(skewJoin = true)
  }
}
