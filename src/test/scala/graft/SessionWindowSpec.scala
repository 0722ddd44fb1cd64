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

  test("custom sessionizer: a within-watermark LATE event must not shrink the session") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingOps
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, min: Long) =
      StreamingOps.Event(id, ts(min), 5L, "e", 0.0, "{}")
    val source = MemoryStream[StreamingOps.Event]
    val q = StreamingOps.sessionize(source.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("late_sessions").start()
    source.addData(ev(1, 600), ev(2, 620)) // session [600, 620]
    q.processAllAvailable()
    // LATE but within the 2h watermark horizon: must JOIN the session
    // without moving its end back to 605 (the pre-fix overwrite bug,
    // which then split the session on the next on-time event)
    source.addData(ev(3, 605))
    q.processAllAvailable()
    source.addData(ev(4, 640)) // true gap from 620 is 20 min -> same session
    q.processAllAvailable()
    // flush via a sentinel user far in the future (two batches: advance
    // watermark, then fire timeouts)
    source.addData(StreamingOps.Event(-1L, ts(5000), -1L, "s", 0.0, "{}"))
    q.processAllAvailable()
    source.addData(StreamingOps.Event(-2L, ts(5100), -1L, "s", 0.0, "{}"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("late_sessions").filter(col("user_id") === 5L)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((4, ts(600).getTime, ts(640).getTime)),
      s"expected ONE intact session of 4 events, got ${got.toSeq}")
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
