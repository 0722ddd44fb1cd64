package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingOps

/** Checkpoint-restart semantics: a streaming job stopped mid-feed and
  * restarted from its checkpoint must (1) not re-emit anything it
  * already produced (exactly-once sink rows across the restart) and
  * (2) restore its DEDUP STATE — a post-restart duplicate of a
  * pre-restart fingerprint stays suppressed. This is the recovery
  * contract a 100-TB ingestion feed runs on: executors die, the query
  * restarts, the output must not fork. (The batch side's analogue is
  * ResumableExtract's kill+resume zero-re-extraction pin.) */
class StreamingRestartSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def writeJsonl(dir: Path, name: String, rows: Seq[String]): Unit =
    Files.write(dir.resolve(name), String.join("\n", rows: _*).getBytes("UTF-8"))

  test("dedup stream restarted from checkpoint: no re-emission, state survives") {
    val root = Files.createTempDirectory("graft_restart")
    val in = Files.createDirectory(root.resolve("in"))
    val out = root.resolve("out").toString
    val ckpt = root.resolve("ckpt").toString

    def r(id: Long, min: Int, text: String) =
      f"""{"doc_id":$id,"ts":"2024-01-01 10:$min%02d:00","text":"$text"}"""

    // batch 1: A B C, with an in-batch duplicate of A
    writeJsonl(in, "b1.json", Seq(
      r(1, 0, "alpha text"), r(2, 1, "beta text"),
      r(3, 2, "gamma text"), r(4, 3, "alpha text")))

    def startQuery() = StreamingOps.dedupStream(
      spark.readStream
        .schema("doc_id LONG, ts STRING, text STRING")
        .json(in.toString))
      .select("doc_id", "fp")
      .writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start()

    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop(); q1.awaitTermination()
    val after1 = spark.read.parquet(out).collect().map(_.getLong(0)).sorted.toSeq
    assert(after1 == Seq(1L, 2L, 3L)) // first-seen of A B C; in-batch dup dropped

    // batch 2 lands while the query is DOWN: a duplicate of batch-1's
    // "beta text" (must stay suppressed — only possible if state was
    // restored from the checkpoint), one new doc, one in-batch dup pair
    writeJsonl(in, "b2.json", Seq(
      r(5, 4, "beta text"), r(6, 5, "delta text"),
      r(7, 6, "epsilon text"), r(8, 7, "epsilon text")))

    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop(); q2.awaitTermination()

    val rows = spark.read.parquet(out).collect()
      .map(rr => (rr.getLong(0), rr.getString(1))).sortBy(_._1).toSeq
    // exactly-once: batch-1 rows appear ONCE; doc 5 suppressed by restored
    // state; docs 6 and 7 new; doc 8 in-batch dup dropped
    assert(rows.map(_._1) == Seq(1L, 2L, 3L, 6L, 7L))
    // fingerprints are distinct (it is a dedup output)
    assert(rows.map(_._2).distinct.size == rows.size)
  }
}
