package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TrainPrepQ
import graft.streaming.StreamingOps

/** Streaming contamination gate == batch q_contam_coverage on the real
  * sf0.001 corpus: the frozen benchmark fps come from the shared batch
  * gram kernel (TrainPrepQ.contamBenchFps), the stream folds the
  * interval union row-locally, and every emitted (doc_id, n_tokens,
  * n_contam_grams, covered_tokens, contam_bp) row must match the batch
  * query exactly. Stateless append: no watermark, no state store. */
class StreamingContamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("streamed contamination rows == batch q_contam_coverage rows on the real corpus") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val corpus = spark.read.parquet(s"$dir/documents.parquet")
    val benchFps = TrainPrepQ.contamBenchFps(corpus)
    assert(benchFps.nonEmpty)

    // the stream carries the same sentinel-injected text the batch
    // fixture scores, and only TRAINING docs arrive (bench held out)
    val docs = corpus.withColumn("text", TrainPrepQ.injectedText)
      .filter(col("doc_id") % 97 =!= 0)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val source = MemoryStream[(Long, String)]
    val stream = source.toDF().toDF("doc_id", "text")
    val q = StreamingOps.contamCoverageStream(stream, benchFps)
      .writeStream.outputMode("append")
      .format("memory").queryName("contam_gate").start()
    // two micro-batches, so the gate provably needs no cross-batch state
    source.addData(docs.take(docs.length / 2): _*)
    q.processAllAvailable()
    source.addData(docs.drop(docs.length / 2): _*)
    q.processAllAvailable()
    q.stop()

    def asTuples(rows: Array[org.apache.spark.sql.Row]): Set[(Long, Long, Long, Long, Long)] =
      rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val streamed = asTuples(spark.table("contam_gate").collect())
    val batch = asTuples(TrainPrepQ.qContamCoverage(spark, dir).collect())
    assert(streamed == batch)
    // non-vacuous: contaminated and clean docs both occur
    assert(batch.exists(_._5 > 0) && batch.exists(_._5 == 0))
  }
}
