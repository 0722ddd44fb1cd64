package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TrainPrepQ
import graft.streaming.StreamingOps

/** Streaming DSIR gate == batch q_dsir_select on the real sf0.001
  * corpus: the frozen distributions come from the shared batch kernel
  * (TrainPrepQ.dsirDistributions), the stream scores rows locally with
  * map-literal lookups, and every emitted (doc_id, n_tokens,
  * score_target, score_raw, selected) row must match the batch query
  * exactly. Stateless append: no watermark, no state store. */
class StreamingDsirSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("streamed DSIR rows == batch q_dsir_select rows on the real corpus") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val corpus = spark.read.parquet(s"$dir/documents.parquet")
    val (tDist, sDist, tTot, sTot) = TrainPrepQ.dsirDistributions(corpus)
    assert(tDist.nonEmpty && tTot > 0 && sTot > tTot)

    val docs = corpus.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val source = MemoryStream[(Long, String)]
    val stream = source.toDF().toDF("doc_id", "text")
    val q = StreamingOps.dsirSelectStream(stream, tDist, sDist, tTot, sTot)
      .writeStream.outputMode("append")
      .format("memory").queryName("dsir_gate").start()
    // two micro-batches, so the gate provably needs no cross-batch state
    source.addData(docs.take(docs.length / 2): _*)
    q.processAllAvailable()
    source.addData(docs.drop(docs.length / 2): _*)
    q.processAllAvailable()
    q.stop()

    def asTuples(rows: Array[org.apache.spark.sql.Row]): Set[(Long, Long, Long, Long, Int)] =
      rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))).toSet
    val streamed = asTuples(spark.table("dsir_gate").collect())
    val batch = asTuples(TrainPrepQ.qDsirSelect(spark, dir).collect())
    assert(streamed == batch)
    assert(batch.exists(_._5 == 1) && batch.exists(_._5 == 0)) // non-vacuous gate
  }
}
