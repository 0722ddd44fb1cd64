package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.EventsQ

/** Laws for the event-analytics batch (exact values pinned by the DuckDB
  * oracles at both scales; these pin the semantic invariants). */
class EventsQSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("q_cohort_retention: triangular-matrix laws hold") {
    val rows = EventsQ.qCohortRetention(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // day-0 retention is total: everyone in a cohort is active on their first day
    val day0 = rows.filter(_._2 == 0L)
    val cohorts = rows.map(r => (r._1, r._3)).distinct
    assert(day0.map(_._1).toSet === cohorts.map(_._1).toSet)
    day0.foreach { case (c, _, nc, na, bp) =>
      assert(na === nc, s"cohort $c day-0 active != cohort size")
      assert(bp === 10000L)
    }
    // cohort sizes partition the user base
    val nUsers = spark.read.parquet(s"$dir/events.parquet")
      .select("user_id").distinct().count()
    assert(cohorts.map(_._2).sum === nUsers)
    rows.foreach { case (_, off, nc, na, bp) =>
      assert(off >= 0 && na <= nc && bp <= 10000L)
    }
  }

  test("q_gap_fill: spine is dense, zero-filled, and event-count preserving") {
    val rows = EventsQ.qGapFill(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    val hours = rows.map(_._1).distinct
    val types = rows.map(_._2).distinct
    assert(rows.length === hours.length * types.length, "spine must be a dense cross product")
    assert(hours.max - hours.min + 1 === hours.length, "hour range must have no holes")
    rows.filter(_._5).foreach { case (h, t, n, s, _) =>
      assert(n === 0L && s === 0L, s"filled row ($h,$t) must be zero")
    }
    assert(rows.exists(_._5), "corpus has silent hours — gaps must appear")
    val total = spark.read.parquet(s"$dir/events.parquet").count()
    assert(rows.map(_._3).sum === total, "gap filling must not lose or invent events")
  }
}
