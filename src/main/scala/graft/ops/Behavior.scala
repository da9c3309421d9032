package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Behavioral analytics over the `events` stream table: funnel conversion
  * and cohort retention — the two queries every product-analytics engine
  * ships, and classic shuffle-shape tests (everything keys on `user_id`).
  *
  * Scale posture: both operators reduce events to one row per user (or
  * per user-day) FIRST via a map-side-combinable aggregate, so the heavy
  * shuffle moves O(users) rows, not O(events). At 100 TB of events the
  * user_id shuffle is the only wide stage in either plan, and both
  * groupBys share that partitioning.
  */
object Behavior {

  /** Strict first-occurrence funnel view → click → purchase: a user
    * converts a step only if the step's first occurrence happens after the
    * previous step's first occurrence (the standard "ordered funnel"
    * semantics; re-orderings don't count). One conditional aggregate per
    * user collapses the event log to three timestamps; the final count is
    * a single-row reduce. */
  def funnelCounts(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === "view", col("ts"))).as("v"),
        min(when(col("event_type") === "click", col("ts"))).as("c"),
        min(when(col("event_type") === "purchase", col("ts"))).as("p"))
      .agg(
        count(col("v")).as("n_view"),
        count(when(col("c") > col("v"), lit(1))).as("n_view_click"),
        count(when(col("c") > col("v") && col("p") > col("c"), lit(1)))
          .as("n_full_funnel"))

  val funnelCountsSql: String =
    """WITH m AS (
      |  SELECT user_id,
      |    min(ts) FILTER (event_type = 'view') AS v,
      |    min(ts) FILTER (event_type = 'click') AS c,
      |    min(ts) FILTER (event_type = 'purchase') AS p
      |  FROM events GROUP BY user_id)
      |SELECT count(v) AS n_view,
      |  count(*) FILTER (c > v) AS n_view_click,
      |  count(*) FILTER (c > v AND p > c) AS n_full_funnel
      |FROM m""".stripMargin

  /** Cohort retention matrix: users grouped by first-seen calendar day,
    * counted at each day-offset where they were active again. first-seen
    * is a user_id aggregate; activity is the distinct user-day grid; both
    * shuffle on user_id so the join is co-partitioned, then one final
    * aggregate onto the (cohort_day, day_offset) grid — whose cardinality
    * is O(days²), driver-safe forever. */
  def cohortRetention(s: SparkSession, d: String): DataFrame = {
    val firstSeen = Tables.events(s, d)
      .groupBy("user_id")
      .agg(to_date(min(col("ts"))).as("cohort_day"))
    val activity = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("act_day"))
      .distinct()
    firstSeen.join(activity, Seq("user_id"))
      .groupBy(col("cohort_day"),
        datediff(col("act_day"), col("cohort_day")).as("day_offset"))
      .agg(count_distinct(col("user_id")).as("n_users"))
  }

  /** Traffic heatmap: event counts on the (day-of-week × hour-of-day)
    * grid per event type — the date-part extraction battery every
    * monitoring dashboard runs. Engine alignment: Spark's `dayofweek` is
    * 1-based Sunday=1, DuckDB's 0-based Sunday=0 — the oracle adds 1
    * rather than both sides guessing; hour/minute extraction agrees
    * as-is. One map-side-combinable aggregate over a 7×24×5 grid. */
  def trafficMatrix(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(
        dayofweek(col("ts")).as("dow"),
        hour(col("ts")).as("hod"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"))

  val trafficMatrixSql: String =
    """SELECT CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
      |  CAST(hour(ts) AS INTEGER) AS hod,
      |  event_type, count(*) AS n_events
      |FROM events GROUP BY 1, 2, 3""".stripMargin

  val cohortRetentionSql: String =
    """WITH first_seen AS (
      |  SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day
      |  FROM events GROUP BY user_id),
      |activity AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS act_day FROM events)
      |SELECT cohort_day,
      |  CAST(date_diff('day', cohort_day, act_day) AS INTEGER) AS day_offset,
      |  count(DISTINCT user_id) AS n_users
      |FROM first_seen JOIN activity USING (user_id)
      |GROUP BY 1, 2""".stripMargin
}
