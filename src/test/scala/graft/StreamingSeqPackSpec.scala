package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TrainPrepQ
import graft.streaming.StreamingOps

/** Streaming sequence packing == batch q_seq_pack over the same corpus,
  * cross-micro-batch: a doc_id-ordered feed (the ingestion contract)
  * must stamp every document with exactly the training-sequence id and
  * offset the batch window arithmetic assigns, with state bounded at one
  * running counter per source shard. */
class StreamingSeqPackSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("streaming seq-pack == batch q_seq_pack across 3 micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    assert(docs.length > 30)

    val source = MemoryStream[(Long, String, String)]
    val stream = source.toDF().toDF("doc_id", "source", "text")
    val q = StreamingOps.seqPackStream(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("seq_pack_stream").start()
    docs.grouped((docs.length + 2) / 3).foreach { chunk =>
      source.addData(chunk.toIndexedSeq: _*)
      q.processAllAvailable()
    }
    q.stop()

    val streamed = spark.table("seq_pack_stream").collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val batch = TrainPrepQ.qSeqPack(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

    assert(streamed.size == docs.length, "one stamped row per document")
    assert(streamed == batch, "streaming packing must equal the batch window arithmetic")
    // non-vacuous: the corpus must actually wrap sequences (seq_id > 0
    // somewhere) and use more than one source shard
    assert(streamed.values.exists(_._3 > 0L), "no sequence boundary ever crossed")
    assert(streamed.values.map(_._1).toSet.size > 1, "single-source fixture is degenerate")
  }
}
