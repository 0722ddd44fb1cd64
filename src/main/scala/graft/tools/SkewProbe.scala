package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.model.{Doc, Span}

/** Skew evidence (north rule: "salted repartitioning for skewed
  * mega-documents"): one 100k-span mega-doc among 2k normal docs, run
  * with and without the spread path; reports max/median task time of
  * the heaviest stage. Usage: runMain graft.tools.SkewProbe */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      // the synthetic media spans are byte-tiny but CPU-heavy (the probe
      // corpus is ~2 MB for ~3.5 s of extraction CPU), so Spark's
      // byte-based file packing would coalesce every part file into one
      // scan task and serialize the work the pre-split layout just
      // parallelized. Real corpora carry the payload bytes (KBs/span), so
      // bytes track CPU and the default 128 MB split works; here we scale
      // maxPartitionBytes down to keep the bytes-to-CPU proportion honest.
      .config("spark.sql.files.maxPartitionBytes", "131072")
      .config("spark.sql.files.openCostInBytes", "0")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val taskTimes = mutable.ArrayBuffer.empty[Long]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        taskTimes.synchronized { taskTimes += e.taskInfo.duration }
    })

    // corpus: 2000 small docs + ONE mega doc with 100k media spans
    val small = spark.range(2000).map { id =>
      Doc(s"doc_$id", (0 until 4).map(i =>
        Span("media", "", f"img://sk/$id%d/$i%d", i * 10)))
    }.toDF()
    val mega = spark.createDataset(Seq(
      Doc("mega", (0 until 100000).map(i =>
        Span("media", "", f"img://mega/$i%d", i * 10)).toVector)
    )).toDF().repartition(1)
    val corpus = small.unionAll(mega)
    corpus.write.mode("overwrite").parquet("/tmp/skew_corpus")
    val input = spark.read.parquet("/tmp/skew_corpus")
    // the storage-level fix: same corpus in the PRE-SPLIT layout
    // (bounded part rows, so the mega-doc SCAN itself parallelizes)
    graft.fixtures.CorpusGen.preSplit(input)
      .repartition(16).write.mode("overwrite").parquet("/tmp/skew_corpus_presplit")
    val inputPre = spark.read.parquet("/tmp/skew_corpus_presplit")

    def measure(label: String, in: org.apache.spark.sql.DataFrame, threshold: Int): Unit = {
      taskTimes.synchronized(taskTimes.clear())
      val t0 = System.nanoTime()
      graft.pipeline.Extract.run(in, spreadThreshold = threshold)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val ts = taskTimes.synchronized(taskTimes.sorted.toVector)
      val med = if (ts.nonEmpty) ts(ts.length / 2) else 0L
      val max = if (ts.nonEmpty) ts.last else 0L
      println(f"SKEW $label wall=$wall%6.2fs tasks=${ts.length}%4d medTask=${med}%5dms maxTask=${max}%6dms max/med=${if (med > 0) max.toDouble / med else 0.0}%6.1f")
    }

    measure("warmup    (spread)", input, 64)
    measure("unsalted  (narrow-only)", input, Int.MaxValue)
    measure("salted    (spread>64)", input, 64)
    measure("unsalted  (narrow-only)", input, Int.MaxValue)
    measure("salted    (spread>64)", input, 64)
    measure("pre-split (storage)", inputPre, 64)
    measure("pre-split (storage)", inputPre, 64)
    spark.stop()
  }
}
