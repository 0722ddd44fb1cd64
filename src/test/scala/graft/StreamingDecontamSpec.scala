package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TrainPrepQ
import graft.streaming.StreamingOps

/** Stream-static decontamination join: incoming docs probe the static
  * benchmark-fp table; the emitted hit stream must equal the batch join
  * on the same data, and the query must be stateless append (no
  * watermark, no state store). */
class StreamingDecontamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streaming hit stream == batch join; clean docs emit nothing") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // static benchmark set: the eval docs' own shingles
    val bench = Seq(
      (1000L, "b1 b2 b3 b4 b5 b6 b7 b8 b9"),
      (1001L, "c1 c2 c3 c4 c5 c6 c7 c8")).toDF("doc_id", "text")
    val benchFps = TrainPrepQ.shingleFps(bench).select(col("fp")).distinct().cache()

    val docs = Seq(
      // copies bench doc 1000's first 8 tokens -> exactly 1 hit
      (1L, "b1 b2 b3 b4 b5 b6 b7 b8 zz"),
      // clean
      (2L, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"),
      // too short for any shingle
      (3L, "b1 b2 b3"),
      // contains bench doc 1001's full text mid-document -> 1 hit
      (4L, "pre c1 c2 c3 c4 c5 c6 c7 c8 post"))

    val source = MemoryStream[(Long, String)]
    val stream = source.toDF().toDF("doc_id", "text")
    val q = StreamingOps.decontaminateStream(stream, benchFps)
      .writeStream.outputMode("append")
      .format("memory").queryName("decontam_hits").start()
    source.addData(docs.take(2): _*)
    q.processAllAvailable()
    source.addData(docs.drop(2): _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("decontam_hits")
      .select(col("doc_id"), col("fp")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val batch = StreamingOps.decontaminateStream(
        docs.toDF("doc_id", "text"), benchFps) // same code path, batch df
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(streamed == batch)
    assert(streamed.map(_._1) == Set(1L, 4L))
    assert(streamed.size == 2) // exactly one hit each, none from docs 2/3
  }
}
