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

  /** Log-rank test table comparing two cohorts' survival — "does cohort
    * A churn faster than cohort B?", the experiment readout on top of
    * the KM machinery. At each distinct lifetime t with d = d_a + d_b
    * total events and (n_a, n_b) at risk:
    *
    *   E_a(t) = d·n_a/n          (expected events in A under H0)
    *   V(t)   = d·n_a·n_b·(n−d) / (n²·(n−1))
    *
    * Per the KM/Nelson–Aalen discipline the per-interval terms are
    * emitted as truncating integer rationals (`e_a_ppm`, `v_x1e12`) and
    * the cumulative statistic inputs (`oe_cum_ppm = Σ d_a·10⁶ − e_a_ppm`,
    * `v_cum_x1e12`) ride an ordered window over the day-bounded table —
    * order-pinned exact sums of pinned terms, so the whole curve sits
    * inside the hash gate; the final z = OE/√V float is the consumer's
    * one square root. Products ride decimal(38,0) (n⁴·10¹² passes the
    * 38-digit ceiling near 3e6 users — the house ceiling, documented).
    *
    * 100 TB shape: identical to [[kaplanMeier]] plus one conditional
    * split in the day aggregate — one user-keyed aggregate, one 1-row
    * broadcast, then day-bounded arithmetic.
    */
  def logRank(events: DataFrame, censorDays: Int = 14): DataFrame = {
    val lives = events.groupBy(col("user_id"))
      .agg(min(col("ts_us")).as("first_us"), max(col("ts_us")).as("last_us"))
    val end = lives.agg(max(col("last_us")).as("end_us"))
    val spans = lives.crossJoin(broadcast(end))
      .select((col("user_id") % 2).as("grp"),
        expr("(last_us - first_us) div 86400000000").as("t_days"),
        when(col("last_us") < col("end_us") - lit(censorDays * dayUs), 1L)
          .otherwise(0L).as("churned"))
    val byDay = spans.groupBy(col("t_days"))
      .agg(sum(when(col("grp") === 0, col("churned")).otherwise(0L)).as("d_a"),
        sum(when(col("grp") === 1, col("churned")).otherwise(0L)).as("d_b"),
        sum(when(col("grp") === 0, lit(1L) - col("churned")).otherwise(0L)).as("c_a"),
        sum(when(col("grp") === 1, lit(1L) - col("churned")).otherwise(0L)).as("c_b"))
    val wSuffix = Window.orderBy(col("t_days"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val wCum = Window.orderBy(col("t_days"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byDay
      .withColumn("n_risk_a", sum(col("d_a") + col("c_a")).over(wSuffix))
      .withColumn("n_risk_b", sum(col("d_b") + col("c_b")).over(wSuffix))
      .withColumn("_n", col("n_risk_a") + col("n_risk_b"))
      .withColumn("_d", col("d_a") + col("d_b"))
      .withColumn("e_a_ppm", expr(
        "CAST(CAST(_d AS DECIMAL(38,0)) * n_risk_a * 1000000 div _n AS BIGINT)"))
      .withColumn("v_x1e12", expr(
        """CAST(CAST(_d AS DECIMAL(38,0)) * n_risk_a * n_risk_b * (_n - _d)
          | * 1000000000000
          | div greatest(CAST(_n AS DECIMAL(38,0)) * _n * greatest(_n - 1, 1L), 1)
          | AS BIGINT)""".stripMargin))
      .withColumn("oe_cum_ppm", sum(expr("d_a * 1000000 - e_a_ppm")).over(wCum))
      .withColumn("v_cum_x1e12", sum(col("v_x1e12")).over(wCum))
      .select(col("t_days"), col("n_risk_a"), col("n_risk_b"),
        col("d_a"), col("d_b"), col("e_a_ppm"), col("v_x1e12"),
        col("oe_cum_ppm"), col("v_cum_x1e12"))
  }

  val queries: Map[String, Q] = Map(
    "survival_kaplan_meier" -> ((s, dir) =>
      kaplanMeier(Tables.events(s, dir), censorDays = 14)),
    "survival_nelson_aalen" -> ((s, dir) =>
      nelsonAalen(Tables.events(s, dir), censorDays = 14)),
    // two-cohort churn comparison (user_id parity as the arm split —
    // an A/A-style null test, so the cumulative OE should hover near 0)
    "survival_logrank" -> ((s, dir) =>
      logRank(Tables.events(s, dir), censorDays = 14))
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
        |FROM term""".stripMargin,

    "survival_logrank" ->
      """WITH lives AS (
        |  SELECT user_id, min(epoch_us(ts)) AS first_us,
        |    max(epoch_us(ts)) AS last_us
        |  FROM events GROUP BY user_id),
        |e AS (SELECT max(last_us) AS end_us FROM lives),
        |spans AS (
        |  SELECT user_id % 2 AS grp,
        |    (last_us - first_us) // 86400000000 AS t_days,
        |    CASE WHEN last_us < end_us - 14 * 86400000000 THEN 1 ELSE 0 END AS churned
        |  FROM lives, e),
        |byday AS (
        |  SELECT t_days,
        |    CAST(sum(CASE WHEN grp = 0 THEN churned ELSE 0 END) AS BIGINT) AS d_a,
        |    CAST(sum(CASE WHEN grp = 1 THEN churned ELSE 0 END) AS BIGINT) AS d_b,
        |    CAST(sum(CASE WHEN grp = 0 THEN 1 - churned ELSE 0 END) AS BIGINT) AS c_a,
        |    CAST(sum(CASE WHEN grp = 1 THEN 1 - churned ELSE 0 END) AS BIGINT) AS c_b
        |  FROM spans GROUP BY t_days),
        |risk AS (
        |  SELECT t_days, d_a, d_b,
        |    CAST(sum(d_a + c_a) OVER (ORDER BY t_days
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk_a,
        |    CAST(sum(d_b + c_b) OVER (ORDER BY t_days
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk_b
        |  FROM byday),
        |term AS (
        |  SELECT t_days, n_risk_a, n_risk_b, d_a, d_b,
        |    CAST(CAST(d_a + d_b AS HUGEINT) * n_risk_a * 1000000
        |      // (n_risk_a + n_risk_b) AS BIGINT) AS e_a_ppm,
        |    CAST(CAST(d_a + d_b AS HUGEINT) * n_risk_a * n_risk_b
        |        * (n_risk_a + n_risk_b - d_a - d_b) * 1000000000000
        |      // greatest(CAST(n_risk_a + n_risk_b AS HUGEINT)
        |          * (n_risk_a + n_risk_b)
        |          * greatest(n_risk_a + n_risk_b - 1, 1), 1) AS BIGINT) AS v_x1e12
        |  FROM risk)
        |SELECT t_days, n_risk_a, n_risk_b, d_a, d_b, e_a_ppm, v_x1e12,
        |  CAST(sum(d_a * 1000000 - e_a_ppm) OVER (ORDER BY t_days
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS oe_cum_ppm,
        |  CAST(sum(v_x1e12) OVER (ORDER BY t_days
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS v_cum_x1e12
        |FROM term""".stripMargin
  )
}
