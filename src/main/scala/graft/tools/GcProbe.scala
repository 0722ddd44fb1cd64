package graft.tools

import java.lang.management.ManagementFactory

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling-loss diagnosis: is the 4-vs-16-core efficiency gap GC?
  * The CPU-burn calibration in Bench allocates nothing, so a shared-heap
  * limit (16 extraction threads allocating DOM/hOCR garbage into ONE
  * JVM) would not show up there — but it would not exist on a real
  * cluster of per-executor heaps either. This probe times the flagship
  * extraction at both levels and reports the JVM GC-time fraction of
  * each run. Usage: runMain graft.tools.GcProbe [replicas] */
object GcProbe {
  private def gcMs: Long =
    ManagementFactory.getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum

  def main(args: Array[String]): Unit = {
    val replicas = if (args.nonEmpty) args(0).toInt else 24
    for (cores <- Seq(4, 16, 4, 16)) {
      val s = SparkSession.builder().master(s"local[$cores]")
        .appName(s"gcprobe$cores")
        .config("spark.sql.shuffle.partitions", cores.toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      val base = s.read.parquet("/tmp/graft_corpus_sf0.1_v2")
      def replicated(r: Int) = base
        .withColumn("r", explode(sequence(lit(0), lit(r - 1))))
        .withColumn("doc_id", concat(col("doc_id"), lit("#"), col("r")))
        .drop("r")
      graft.pipeline.Extract.run(replicated(replicas / 4))
        .write.format("noop").mode("overwrite").save() // warm
      val g0 = gcMs
      val t0 = System.nanoTime()
      graft.pipeline.Extract.run(replicated(replicas))
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val gc = (gcMs - g0) / 1000.0
      println(f"GCPROBE cores=$cores%2d wall=$wall%7.2fs gc=$gc%6.2fs gc_frac=${gc / wall}%5.3f heap_max=${Runtime.getRuntime.maxMemory() / (1 << 20)}m")
      s.stop()
    }
  }
}
