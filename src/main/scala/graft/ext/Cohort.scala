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

  val queries: Map[String, Q] = Map(
    "cohort_retention" -> ((s, dir) => retention(Tables.events(s, dir)))
  )

  val oracleSql: Map[String, String] = Map(
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
