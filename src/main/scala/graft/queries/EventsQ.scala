package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-stream analytics beyond the funnel/sessionize/hop-window trio
  * (engine-side additions, SURVEY.md §2.F/G): cohort retention and
  * time-series gap filling — the two reporting shapes a usage pipeline
  * asks of an events table that the existing entries don't cover.
  *
  * Determinism rules (CLAUDE.md): day/hour buckets are INTEGER indexes
  * (datediff / epoch-hour — no date formatting), money is DECIMAL-summed
  * then floored to BIGINT cents, ratios are integer basis points.
  */
object EventsQ {

  private def events(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/events.parquet")

  private def dec(c: Column): Column = c.cast("decimal(18,4)")

  // ---------------------------------------------------------------------
  // q_cohort_retention — first-activity cohorts x day offset
  // ---------------------------------------------------------------------

  /** Cohort retention: users cohorted by FIRST-activity day, retention =
    * distinct active users per (cohort, day-offset) — the triangular
    * matrix every growth report draws. Days are integer indexes from the
    * corpus epoch (2024-01-01), never formatted dates.
    *
    * Scale notes: the per-(user, day) DISTINCT is the compaction step —
    * the shuffle carries one row per user-day, not per event (map-side
    * partial distinct); first-day and activity join on user_id
    * (co-partitioned equi-join); the cohort-size relation is one row
    * per cohort day (broadcast). Nothing scales with raw event count
    * past the first aggregate. */
  def qCohortRetention(s: SparkSession, dir: String): DataFrame = {
    val days = events(s, dir)
      .select(col("user_id"),
        datediff(to_date(col("ts")), lit("2024-01-01").cast("date")).cast("long").as("day"))
      .distinct()
      .cache()
    val first = days.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    val cohorts = first.groupBy(col("cohort_day")).agg(count(lit(1)).as("n_cohort"))
    val ret = days.join(first, Seq("user_id"))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
    ret.join(cohorts, Seq("cohort_day"))
      .select(col("cohort_day"), col("day_offset"), col("n_cohort"), col("n_active"),
        expr("(n_active * 10000) div n_cohort").as("ret_bp"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  val qCohortRetentionSql: String =
    """WITH d AS (SELECT DISTINCT user_id,
      |    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day FROM events),
      |f AS (SELECT user_id, MIN(day) AS cohort_day FROM d GROUP BY 1),
      |c AS (SELECT cohort_day, COUNT(*) AS n_cohort FROM f GROUP BY 1),
      |r AS (SELECT f.cohort_day, d.day - f.cohort_day AS day_offset,
      |        COUNT(DISTINCT d.user_id) AS n_active
      |      FROM d JOIN f ON f.user_id = d.user_id GROUP BY 1, 2)
      |SELECT CAST(r.cohort_day AS BIGINT) AS cohort_day,
      |  CAST(r.day_offset AS BIGINT) AS day_offset,
      |  CAST(c.n_cohort AS BIGINT) AS n_cohort,
      |  CAST(r.n_active AS BIGINT) AS n_active,
      |  CAST((r.n_active * 10000) // c.n_cohort AS BIGINT) AS ret_bp
      |FROM r JOIN c ON c.cohort_day = r.cohort_day
      |ORDER BY cohort_day, day_offset""".stripMargin

  // ---------------------------------------------------------------------
  // q_gap_fill — dense hourly spine with zero-filled gaps
  // ---------------------------------------------------------------------

  /** Time-series gap filling: aggregate per (hour, event_type), then
    * LEFT-join onto the DENSE hour x type spine so silent hours appear
    * as explicit zero rows (`filled` marks them) — the densification
    * step dashboards and downstream window functions require (a LAG over
    * a sparse series silently skips gaps).
    *
    * Scale notes: the spine derives from the data's own [min, max] hour
    * bounds (one tiny agg row — no driver-side collect) crossed with the
    * distinct type relation (broadcast-tiny, the IVF-centroid
    * precedent); the left join is spine-sized (hours x types), not
    * event-sized, and the event table is touched exactly twice, both
    * times collapsing map-side. */
  def qGapFill(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
      .select(expr("to_unix_timestamp(ts) div 3600").as("h"),
        col("event_type"), col("value"))
    val agg = ev.groupBy(col("h"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        floor(sum(dec(col("value"))) * 100).cast("long").as("s"))
    val spine = ev.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(explode(sequence(col("h0"), col("h1"))).as("h"))
      .crossJoin(ev.select(col("event_type")).distinct())
    spine.join(agg, Seq("h", "event_type"), "left")
      .select(col("h"), col("event_type"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        coalesce(col("s"), lit(0L)).as("sum_cents"),
        col("n").isNull.as("filled"))
      .orderBy(col("h"), col("event_type"))
  }

  val qGapFillSql: String =
    """WITH e AS (SELECT CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS h, event_type, value
      |           FROM events),
      |a AS (SELECT h, event_type, COUNT(*) AS n,
      |        CAST(FLOOR(SUM(CAST(value AS DECIMAL(18,4))) * 100) AS BIGINT) AS s
      |      FROM e GROUP BY 1, 2),
      |b AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM e),
      |sp AS (SELECT CAST(u.h AS BIGINT) AS h, t.event_type
      |       FROM b, UNNEST(generate_series(b.h0, b.h1)) AS u(h),
      |            (SELECT DISTINCT event_type FROM e) t)
      |SELECT sp.h, sp.event_type, CAST(COALESCE(a.n, 0) AS BIGINT) AS n_events,
      |  CAST(COALESCE(a.s, 0) AS BIGINT) AS sum_cents, a.n IS NULL AS filled
      |FROM sp LEFT JOIN a ON a.h = sp.h AND a.event_type = sp.event_type
      |ORDER BY sp.h, sp.event_type""".stripMargin

  val all: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "q_cohort_retention" -> ((qCohortRetention _, Some(qCohortRetentionSql))),
    "q_gap_fill" -> ((qGapFill _, Some(qGapFillSql))))
}
