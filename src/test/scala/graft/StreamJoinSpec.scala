package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingOps

/** Stream-stream interval join (view->click attribution): the streamed
  * result must equal the batch inner join run through the SAME operator
  * (watermarks are a no-op in batch), pairs must form ACROSS
  * micro-batches through the two-sided join state, and the interval
  * bounds must hold exactly (clicks before the view or past 24h never
  * match). */
class StreamJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(s: String) = Timestamp.valueOf(s)

  // (event_id, ts, user_id)
  private val views = Seq(
    (101L, ts("2024-01-01 10:00:00"), 1L),
    (102L, ts("2024-01-01 12:00:00"), 2L), // no clicks -> no row
    (103L, ts("2024-01-01 12:30:00"), 4L)) // click arrives in batch 2
  private val clicks = Seq(
    (201L, ts("2024-01-01 09:59:00"), 1L), // BEFORE the view -> excluded
    (202L, ts("2024-01-01 10:30:00"), 1L), // +30m -> match
    (203L, ts("2024-01-02 09:59:00"), 1L), // +23h59m -> match (inside 24h)
    (204L, ts("2024-01-02 10:01:00"), 1L), // +24h01m -> excluded
    (205L, ts("2024-01-01 12:00:00"), 3L), // user with no view -> excluded
    (206L, ts("2024-01-01 13:00:00"), 4L)) // cross-batch match for view 103

  private val expected = Set(
    (1L, 101L, 202L, 1800L),
    (1L, 101L, 203L, 86340L),
    (4L, 103L, 206L, 1800L))

  test("streaming attribution == batch join; pairs form across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val vSrc = MemoryStream[(Long, Timestamp, Long)]
    val cSrc = MemoryStream[(Long, Timestamp, Long)]
    val q = StreamingOps.attributeStream(
        vSrc.toDF().toDF("event_id", "ts", "user_id"),
        cSrc.toDF().toDF("event_id", "ts", "user_id"))
      .writeStream.outputMode("append")
      .format("memory").queryName("attrib").start()
    // batch 1: all views + the first two clicks (202 must pair now,
    // 206's view is buffered in state for batch 2)
    vSrc.addData(views: _*)
    cSrc.addData(clicks.take(2): _*)
    q.processAllAvailable()
    val afterB1 = spark.table("attrib").count()
    // batch 2: remaining clicks pair against batch-1 views via state
    cSrc.addData(clicks.drop(2): _*)
    q.processAllAvailable()
    q.stop()

    assert(afterB1 == 1) // only (101, 202) can exist after batch 1
    val streamed = spark.table("attrib").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed == expected)

    val batch = StreamingOps.attributeStream(
        views.toDF("event_id", "ts", "user_id"),
        clicks.toDF("event_id", "ts", "user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(batch == expected)
  }

  test("left-outer: unconverted view emits null row only after the watermark closes its window") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val vSrc = MemoryStream[(Long, Timestamp, Long)]
    val cSrc = MemoryStream[(Long, Timestamp, Long)]
    val q = StreamingOps.unconvertedStream(
        vSrc.toDF().toDF("event_id", "ts", "user_id"),
        cSrc.toDF().toDF("event_id", "ts", "user_id"))
      .writeStream.outputMode("append")
      .format("memory").queryName("unconverted").start()
    // view 101 converts; view 102 never does
    vSrc.addData((101L, ts("2024-01-01 10:00:00"), 1L), (102L, ts("2024-01-01 10:00:00"), 2L))
    cSrc.addData((202L, ts("2024-01-01 10:30:00"), 1L))
    q.processAllAvailable()
    // too early: a click for view 102 could still arrive
    assert(spark.table("unconverted").count() == 0)
    // heartbeats advance BOTH watermarks 3 days past the window
    vSrc.addData((901L, ts("2024-01-04 10:00:00"), 8L))
    cSrc.addData((902L, ts("2024-01-04 10:00:00"), 9L))
    q.processAllAvailable()
    // one more batch: nulls emit after the watermark update takes effect
    vSrc.addData((903L, ts("2024-01-04 10:01:00"), 8L))
    cSrc.addData((904L, ts("2024-01-04 10:01:00"), 9L))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("unconverted").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((2L, 102L))) // only the unconverted view; never the matched one
  }
}
