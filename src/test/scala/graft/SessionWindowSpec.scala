package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Spark-native `session_window` pinned against hand-computed gap
  * sessions, batch AND streaming: the declarative counterpart to the
  * custom flatMapGroupsWithState sessionizer (StreamingOps.sessionize).
  * Boundary semantics, verified empirically here: Spark 4's
  * session_window is INCLUSIVE at exactly-gap (an event at
  * last_ts + gap MERGES into the session) — the same rule as the
  * custom operator's `t - end <= gap`, so the two designs agree on
  * boundary events too. */
class SessionWindowSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  // user 1: [0,10] then 35-min gap -> [45,50]; user 2: single event
  private val events = Seq(
    (1L, ts(0)), (1L, ts(10)), (1L, ts(45)), (1L, ts(50)),
    (2L, ts(7)))
  private val expected = Set(
    (1L, 2L, ts(0)), (1L, 2L, ts(45)), (2L, 1L, ts(7)))

  test("batch session_window == hand-computed 30-minute-gap sessions; exact-gap is inclusive") {
    import spark.implicits._
    val got = events.toDF("user_id", "ts")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("n"), col("w.start").as("start"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2))).toSet
    assert(got == expected)

    // boundary: an event at EXACTLY last + 30 min MERGES (inclusive) —
    // same rule as the custom sessionizer's `t - end <= gap`
    val boundary = Seq((9L, ts(0)), (9L, ts(30))).toDF("user_id", "ts")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .collect()
    assert(boundary.length == 1 && boundary.head.getLong(2) == 2L,
      "exactly-gap event must merge into the native session (inclusive)")
  }

  test("streaming session_window == batch on the same events across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val source = MemoryStream[(Long, Timestamp)]
    val q = source.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("n"), col("w.start").as("start"))
      .writeStream.outputMode("append")
      .format("memory").queryName("native_sessions").start()
    source.addData(events.take(3): _*)
    q.processAllAvailable()
    source.addData(events.drop(3): _*)
    q.processAllAvailable()
    // flush: a far-future event (excluded user) advances the watermark
    // past every real session's close
    source.addData((999L, ts(10000)))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("native_sessions")
      .filter(col("user_id") =!= 999L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2))).toSet
    assert(got == expected, s"streaming sessions $got != $expected")
  }
}
