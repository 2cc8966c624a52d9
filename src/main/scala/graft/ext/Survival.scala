package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Survival analysis (Kaplan–Meier product-limit estimator) over user
  * lifetimes — the churn/retention readout: at each observed lifetime
  * t, how many users were still "at risk", how many churned exactly at
  * t, and the per-interval survival factor (n−d)/n.
  *
  * The estimator's cumulative product is a FLOAT fold, whose value
  * depends on multiplication order — so, per the PSI/per-row-term
  * discipline, this emits the EXACT integer per-interval table
  * (t_days, n_risk, n_events, n_censored, factor_ppm) and leaves the
  * product to the consumer. Right-censoring: a user whose last event
  * falls within `censorDays` of the observation end is censored (still
  * alive), otherwise their lifetime ended in churn.
  *
  * 100 TB shape: one user-keyed aggregate (first/last event), one
  * 1-row broadcast (observation end), one aggregate per distinct
  * lifetime day; the risk-set suffix sum runs over the distinct-day
  * table (span-bounded — days in the observation window, never users).
  */
object Survival {

  private val dayUs = 86400000000L

  /** (t_days, n_risk, n_events, n_censored, factor_ppm) per distinct
    * lifetime, ordered by t. `factor_ppm = (n_risk − d)·10⁶ div n_risk`
    * — all nonneg, `div` = floor on both engines.
    */
  def kaplanMeier(events: DataFrame, censorDays: Int = 14): DataFrame =
    riskTable(events, censorDays)
      .select(col("t_days"), col("n_risk"), col("n_events"), col("n_censored"),
        expr("(n_risk - n_events) * 1000000 div n_risk").as("factor_ppm"))

  /** Shared per-lifetime risk table: (t_days, n_risk, n_events,
    * n_censored), day-bounded.
    */
  private def riskTable(events: DataFrame, censorDays: Int): DataFrame = {
    val lives = events.groupBy(col("user_id"))
      .agg(min(col("ts_us")).as("first_us"), max(col("ts_us")).as("last_us"))
    val end = lives.agg(max(col("last_us")).as("end_us"))
    val spans = lives.crossJoin(broadcast(end))
      .select(expr("(last_us - first_us) div 86400000000").as("t_days"),
        when(col("last_us") < col("end_us") - lit(censorDays * dayUs), 1L)
          .otherwise(0L).as("churned"))
    val byDay = spans.groupBy(col("t_days"))
      .agg(sum(col("churned")).as("n_events"),
        sum(lit(1L) - col("churned")).as("n_censored"))
    // risk set at t = users with lifetime >= t: suffix sum over the
    // distinct-day table (bounded by the observation span in days)
    val wSuffix = Window.orderBy(col("t_days"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    byDay.withColumn("n_risk",
      sum(col("n_events") + col("n_censored")).over(wSuffix))
  }

  /** Nelson–Aalen cumulative hazard — KM's additive sibling: H(t) =
    * Σ_{tᵢ ≤ t} dᵢ/nᵢ. Unlike KM's float cumulative PRODUCT (left to
    * the consumer by design), the cumulative SUM of the truncated
    * integer ppm terms is itself exact and order-pinned by the same
    * ordered day window on both engines — so the cumulative curve
    * ships inside the hash gate, not just the per-interval factors.
    */
  def nelsonAalen(events: DataFrame, censorDays: Int = 14): DataFrame = {
    val wCum = Window.orderBy(col("t_days"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    riskTable(events, censorDays)
      .withColumn("hazard_ppm", expr("n_events * 1000000 div n_risk"))
      .withColumn("cum_hazard_ppm", sum(col("hazard_ppm")).over(wCum))
      .select(col("t_days"), col("n_risk"), col("n_events"),
        col("hazard_ppm"), col("cum_hazard_ppm"))
  }

  val queries: Map[String, Q] = Map(
    "survival_kaplan_meier" -> ((s, dir) =>
      kaplanMeier(Tables.events(s, dir), censorDays = 14)),
    "survival_nelson_aalen" -> ((s, dir) =>
      nelsonAalen(Tables.events(s, dir), censorDays = 14))
  )

  val oracleSql: Map[String, String] = Map(
    "survival_kaplan_meier" ->
      """WITH lives AS (
        |  SELECT user_id, min(epoch_us(ts)) AS first_us,
        |    max(epoch_us(ts)) AS last_us
        |  FROM events GROUP BY user_id),
        |e AS (SELECT max(last_us) AS end_us FROM lives),
        |spans AS (
        |  SELECT (last_us - first_us) // 86400000000 AS t_days,
        |    CASE WHEN last_us < end_us - 14 * 86400000000 THEN 1 ELSE 0 END AS churned
        |  FROM lives, e),
        |byday AS (
        |  SELECT t_days, CAST(sum(churned) AS BIGINT) AS n_events,
        |    CAST(sum(1 - churned) AS BIGINT) AS n_censored
        |  FROM spans GROUP BY t_days)
        |SELECT t_days,
        |  CAST(sum(n_events + n_censored) OVER (ORDER BY t_days
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk,
        |  n_events, n_censored,
        |  (CAST(sum(n_events + n_censored) OVER (ORDER BY t_days
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) - n_events)
        |    * 1000000
        |    // CAST(sum(n_events + n_censored) OVER (ORDER BY t_days
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS factor_ppm
        |FROM byday""".stripMargin,

    "survival_nelson_aalen" ->
      """WITH lives AS (
        |  SELECT user_id, min(epoch_us(ts)) AS first_us,
        |    max(epoch_us(ts)) AS last_us
        |  FROM events GROUP BY user_id),
        |e AS (SELECT max(last_us) AS end_us FROM lives),
        |spans AS (
        |  SELECT (last_us - first_us) // 86400000000 AS t_days,
        |    CASE WHEN last_us < end_us - 14 * 86400000000 THEN 1 ELSE 0 END AS churned
        |  FROM lives, e),
        |byday AS (
        |  SELECT t_days, CAST(sum(churned) AS BIGINT) AS n_events,
        |    CAST(sum(1 - churned) AS BIGINT) AS n_censored
        |  FROM spans GROUP BY t_days),
        |risk AS (
        |  SELECT t_days, n_events,
        |    CAST(sum(n_events + n_censored) OVER (ORDER BY t_days
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk
        |  FROM byday),
        |term AS (
        |  SELECT t_days, n_risk, n_events,
        |    n_events * 1000000 // n_risk AS hazard_ppm
        |  FROM risk)
        |SELECT t_days, n_risk, n_events, hazard_ppm,
        |  CAST(sum(hazard_ppm) OVER (ORDER BY t_days
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_hazard_ppm
        |FROM term""".stripMargin
  )
}
