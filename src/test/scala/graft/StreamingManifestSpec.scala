package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TrainPrepQ
import graft.streaming.StreamingOps

/** Streaming shard manifest == batch q_shard_manifest on the real
  * sf0.001 corpus: the SAME aggregate kernel runs in complete mode over
  * two micro-batches and the final table must equal the batch manifest
  * — the behavioral proof that every manifest column (count, sums,
  * min/max, the modular checksum) merges incrementally. */
class StreamingManifestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("streamed complete-mode manifest == batch q_shard_manifest after two batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val source = MemoryStream[(Long, String, Long)]
    val stream = source.toDF().toDF("doc_id", "text", "n_chars")
    val q = StreamingOps.shardManifestStream(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("manifest_live").start()
    source.addData(docs.take(docs.length / 2): _*)
    q.processAllAvailable()
    val partial = spark.table("manifest_live").count()
    source.addData(docs.drop(docs.length / 2): _*)
    q.processAllAvailable()
    q.stop()

    def asTuples(rows: Array[org.apache.spark.sql.Row]): Set[(Int, Long, Long, Long, Long, Long, Long)] =
      rows.map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    val streamed = asTuples(spark.table("manifest_live").collect())
    val batch = asTuples(TrainPrepQ.qShardManifest(spark, dir).collect())
    assert(streamed == batch)
    assert(partial > 0) // the first batch already materialized a live manifest
  }
}
