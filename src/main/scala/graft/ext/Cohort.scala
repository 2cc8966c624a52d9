package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention analysis — the product-analytics staple beside the
  * funnel (Sessionize): bucket every user by first-active day, then
  * count how many of each cohort return at each day offset.
  *
  * 100 TB shape: both passes shuffle on user_id — the first-active
  * aggregate is a map-side-combining min, the active-day set is a
  * distinct on the SAME key, so AQE coalesces them onto one exchange
  * layout; the cohort join is user-keyed (co-partitioned, no broadcast
  * needed even though the first-active table is user-sized), and the
  * final (cohort, offset) aggregate's cardinality is bounded by the
  * SQUARE of the observation window in days, not by users or events.
  * A user contributes at most one row per active day, so the retention
  * cell count is a plain count(*), not a count-distinct.
  */
object Cohort {

  /** Retention matrix over `events(user_id, ts_us)`:
    * (cohort_day, day_offset, n_active) — epoch-day granularity,
    * offset 0 row = cohort size.
    */
  def retention(events: DataFrame): DataFrame = {
    val dayUs = 86400000000L
    val activeDays = events
      .select(col("user_id"), expr(s"ts_us div $dayUs").as("day"))
      .distinct()
    val firstDay = activeDays.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    activeDays.join(firstDay, "user_id")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_active"))
  }

  /** Signup→purchase conversion-delay profile per weekly signup cohort:
    * (cohort_week, n_converted, min/lower-median/max delay in µs). The
    * "first purchase AFTER signup" needs the signup time inside the
    * purchase aggregate, so it is a user-keyed join (signup table is
    * user-sized, co-partitioned with the purchase scan on user_id) —
    * never a window over the raw stream. The median is the exact rank
    * formula (value at rn = (n+1) div 2) over a cohort-keyed window;
    * parallelism = cohort count, rows per cohort = converted users —
    * the same per-key bound documented on the cusum family.
    */
  def conversionDelay(events: DataFrame): DataFrame = {
    val weekUs = 7L * 86400000000L
    val signup = events.where(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("signup_ts"))
    val firstPurchase = events.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"))
      .join(signup, "user_id")
      .where(col("ts_us") >= col("signup_ts"))
      .groupBy(col("user_id"), col("signup_ts"))
      .agg(min(col("ts_us")).as("purchase_ts"))
    val delays = firstPurchase.select(
      expr(s"signup_ts div $weekUs").as("cohort_week"),
      col("user_id"),
      (col("purchase_ts") - col("signup_ts")).as("delay_us"))
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cohort_week"))
      .orderBy(col("delay_us"), col("user_id"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cohort_week"))
    delays
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))
      .groupBy(col("cohort_week"))
      .agg(max(col("n")).as("n_converted"),
        min(col("delay_us")).as("min_delay_us"),
        min(when(col("rn") === expr("(n + 1) div 2"), col("delay_us")))
          .as("median_delay_us"),
        max(col("delay_us")).as("max_delay_us"))
  }

  /** Cohort LTV curve: purchase revenue per (signup-week cohort,
    * week offset since cohort), with the running cumulative — the
    * money companion of [[retention]]. Shape: first-seen week is a
    * user-keyed min; revenue re-joins on user_id (co-partitioned);
    * the cumulative is a window over the cohort×offset grid, whose
    * row count is the SQUARE of the observation window in weeks —
    * calendar-bounded, never user- or event-sized.
    */
  def ltv(events: DataFrame): DataFrame = {
    val weekUs = 7L * 86400000000L
    val firstWeek = events
      .select(col("user_id"), expr(s"ts_us div $weekUs").as("week"))
      .groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
    val rev = events.where(col("event_type") === "purchase")
      .select(col("user_id"), expr(s"ts_us div $weekUs").as("week"),
        round(col("value") * 100).cast("long").as("cents"))
    val grid = rev.join(firstWeek, "user_id")
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .agg(sum(col("cents")).as("rev_cents"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cohort_week")).orderBy(col("week_offset"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    grid.withColumn("cum_rev_cents", sum(col("rev_cents")).over(w))
  }

  val queries: Map[String, Q] = Map(
    "cohort_retention" -> ((s, dir) => retention(Tables.events(s, dir))),
    "cohort_conversion_delay" ->
      ((s, dir) => conversionDelay(Tables.events(s, dir))),
    "cohort_ltv" -> ((s, dir) => ltv(Tables.events(s, dir)))
  )

  val oracleSql: Map[String, String] = Map(
    "cohort_ltv" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us,
        |    CAST(round(value*100) AS BIGINT) AS cents
        |  FROM events),
        |fw AS (
        |  SELECT user_id, min(ts_us // 604800000000) AS cohort_week
        |  FROM ev GROUP BY user_id),
        |grid AS (
        |  SELECT f.cohort_week,
        |    e.ts_us // 604800000000 - f.cohort_week AS week_offset,
        |    CAST(sum(e.cents) AS BIGINT) AS rev_cents
        |  FROM ev e JOIN fw f ON f.user_id = e.user_id
        |  WHERE e.event_type = 'purchase'
        |  GROUP BY 1, 2)
        |SELECT cohort_week, week_offset, rev_cents,
        |  CAST(sum(rev_cents) OVER (PARTITION BY cohort_week
        |    ORDER BY week_offset
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_rev_cents
        |FROM grid""".stripMargin,

    "cohort_conversion_delay" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |signup AS (
        |  SELECT user_id, min(ts_us) AS signup_ts
        |  FROM ev WHERE event_type = 'signup' GROUP BY user_id),
        |fp AS (
        |  SELECT e.user_id, s.signup_ts, min(e.ts_us) AS purchase_ts
        |  FROM ev e JOIN signup s ON s.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts_us >= s.signup_ts
        |  GROUP BY e.user_id, s.signup_ts),
        |delays AS (
        |  SELECT signup_ts // 604800000000 AS cohort_week, user_id,
        |    purchase_ts - signup_ts AS delay_us
        |  FROM fp),
        |rk AS (
        |  SELECT *, row_number() OVER (PARTITION BY cohort_week
        |      ORDER BY delay_us, user_id) AS rn,
        |    count(*) OVER (PARTITION BY cohort_week) AS n
        |  FROM delays)
        |SELECT cohort_week, max(n) AS n_converted,
        |  min(delay_us) AS min_delay_us,
        |  min(CASE WHEN rn = (n + 1) // 2 THEN delay_us END) AS median_delay_us,
        |  max(delay_us) AS max_delay_us
        |FROM rk GROUP BY cohort_week""".stripMargin,
    "cohort_retention" ->
      """WITH active AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
        |  FROM events),
        |first AS (
        |  SELECT user_id, min(day) AS cohort_day FROM active GROUP BY user_id)
        |SELECT f.cohort_day, a.day - f.cohort_day AS day_offset,
        |  count(*) AS n_active
        |FROM active a JOIN first f ON f.user_id = a.user_id
        |GROUP BY f.cohort_day, a.day - f.cohort_day""".stripMargin
  )
}
