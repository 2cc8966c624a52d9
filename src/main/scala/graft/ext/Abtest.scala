package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Experiment-analysis completions beyond the raw conversion readout
  * ([[Growth.abConversion]]): CUPED variance reduction and a
  * difference-in-differences readout — the two adjustments an
  * experimentation platform applies before calling a result.
  *
  * Shared disciplines: variant = md5-bit of user_id (never
  * `user_id % 2`); the pre/post boundary is the midpoint day of the
  * observed event range, computed as a 1-row broadcast (deterministic,
  * no config knob to drift from the oracle); money is integer cents;
  * ratios are staged truncating divisions (Spark `div` and DuckDB `//`
  * both truncate toward zero, so SIGNED intermediates — regression
  * numerators, mean deltas — stay engine-identical).
  *
  * 100 TB shape: both operators reduce to one user-keyed aggregate
  * (map-side combining) followed by arithmetic over ≤4 grouped rows
  * and 1-row broadcast moments. Nothing data-sized crosses a second
  * exchange.
  */
object Abtest {

  private val dayUs = 86400000000L

  private val variantCol =
    (expr("conv(substring(md5(cast(user_id AS STRING)), 1, 4), 16, 10)")
      .cast("long") % 2).as("variant")

  /** Per-user pre/post purchase cents around the midpoint day of the
    * event range: (user_id, variant, x = pre cents, y = post cents).
    * Users with no purchases in a period carry 0 — the standard CUPED
    * covariate convention (missing pre-exposure data imputed to the
    * mean is a refinement; zero is the portable exact baseline).
    */
  private def prePost(events: DataFrame): DataFrame = {
    val bounds = events.agg(
      min(expr(s"ts_us div $dayUs")).as("min_day"),
      max(expr(s"ts_us div $dayUs")).as("max_day"))
      .select(expr("(min_day + max_day + 1) div 2").as("mid_day"))
    events
      .crossJoin(broadcast(bounds))
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("event_type") === "purchase" &&
          expr(s"ts_us div $dayUs") < col("mid_day"),
          round(col("value") * 100).cast("long")).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "purchase" &&
          expr(s"ts_us div $dayUs") >= col("mid_day"),
          round(col("value") * 100).cast("long")).otherwise(0L)).as("y"))
      .select(col("user_id"), variantCol, col("x"), col("y"))
  }

  /** CUPED readout: per variant, the raw post-period mean and the
    * CUPED-adjusted mean (milli-cents), with the pooled
    * θ = cov(x,y)/var(x) as ppm. adj = mean_y − θ·(mean_x_v − mean_x);
    * every stage a truncating division mirrored in the oracle.
    * Range audit: θ's numerator n·Σxy·10⁶ stays inside decimal(38,0)
    * to ~10⁹ users at cent scale (1e9·1e19·1e6 ≈ 10³⁴); past that,
    * rescale cents to whole currency upstream.
    */
  def cupedReadout(events: DataFrame): DataFrame = {
    // ONE pass over the user panel: per-variant moments carry
    // everything the pooled theta needs (Sxy and Sx2 sum across
    // variants exactly — decimal addition is associative), so the
    // global moments fold over the 2-row variant table as
    // unpartitioned WINDOW sums — one consumer, no persist, no cache
    // residue for library callers. The single-partition window frame
    // is variant-count-bounded (2 rows), never data-sized.
    val w = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    prePost(events).groupBy(col("variant"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("x")).as("sx_v"), sum(col("y")).as("sy_v"),
        sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy_v"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).as("sx2_v"))
      .withColumn("n", sum(col("n_users")).over(w))
      .withColumn("sx", sum(col("sx_v")).over(w))
      .withColumn("sy", sum(col("sy_v")).over(w))
      .withColumn("sxy", sum(col("sxy_v")).over(w))
      .withColumn("sx2", sum(col("sx2_v")).over(w))
      .withColumn("theta_ppm",
        expr("""CAST((n * sxy - CAST(sx AS DECIMAL(38,0)) * sy) * 1000000
               div greatest(n * sx2 - CAST(sx AS DECIMAL(38,0)) * sx, 1)
               AS BIGINT)"""))
      .withColumn("mean_x_milli", expr("sx * 1000 div greatest(n, 1L)"))
      .select(col("variant"), col("n_users"), col("theta_ppm"),
        expr("sy_v * 1000 div n_users").as("mean_y_milli"),
        expr("sx_v * 1000 div n_users").as("mean_x_v_milli"),
        expr("""sy_v * 1000 div n_users
               - (theta_ppm * (sx_v * 1000 div n_users - mean_x_milli))
                 div 1000000""").as("cuped_adj_milli"))
  }

  /** Difference-in-differences over the same grid: one row with both
    * variants' pre/post mean purchase cents (milli) and
    * did_milli = (treat_post − treat_pre) − (ctrl_post − ctrl_pre).
    * Every user contributes to both periods (zeros when inactive), so
    * the per-cell denominator is the variant's user count.
    */
  def diffInDiff(events: DataFrame): DataFrame = {
    prePost(events).agg(
      sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n_ctrl"),
      sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n_treat"),
      sum(when(col("variant") === 0, col("x")).otherwise(0L)).as("sx_c"),
      sum(when(col("variant") === 0, col("y")).otherwise(0L)).as("sy_c"),
      sum(when(col("variant") === 1, col("x")).otherwise(0L)).as("sx_t"),
      sum(when(col("variant") === 1, col("y")).otherwise(0L)).as("sy_t"))
      .select(col("n_ctrl"), col("n_treat"),
        expr("sx_c * 1000 div greatest(n_ctrl, 1L)").as("ctrl_pre_milli"),
        expr("sy_c * 1000 div greatest(n_ctrl, 1L)").as("ctrl_post_milli"),
        expr("sx_t * 1000 div greatest(n_treat, 1L)").as("treat_pre_milli"),
        expr("sy_t * 1000 div greatest(n_treat, 1L)").as("treat_post_milli"),
        expr("""(sy_t * 1000 div greatest(n_treat, 1L)
                 - sx_t * 1000 div greatest(n_treat, 1L))
               - (sy_c * 1000 div greatest(n_ctrl, 1L)
                 - sx_c * 1000 div greatest(n_ctrl, 1L))""").as("did_milli"))
  }

  val queries: Map[String, Q] = Map(
    "abtest_cuped" -> ((s, dir) => cupedReadout(Tables.events(s, dir))),
    "abtest_diff_in_diff" -> ((s, dir) => diffInDiff(Tables.events(s, dir)))
  )

  private val prePostSql =
    """b AS (
      |  SELECT (min(epoch_us(ts) // 86400000000)
      |        + max(epoch_us(ts) // 86400000000) + 1) // 2 AS mid_day
      |  FROM events),
      |pp AS (
      |  SELECT user_id,
      |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4))
      |      AS BIGINT) % 2 AS variant,
      |    CAST(sum(CASE WHEN event_type = 'purchase'
      |      AND epoch_us(ts) // 86400000000 < b.mid_day
      |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
      |    CAST(sum(CASE WHEN event_type = 'purchase'
      |      AND epoch_us(ts) // 86400000000 >= b.mid_day
      |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
      |  FROM events CROSS JOIN b
      |  GROUP BY user_id, b.mid_day)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "abtest_cuped" ->
      s"""WITH $prePostSql,
        |m AS (
        |  SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(y) AS BIGINT) AS sy,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy,
        |    sum(CAST(x AS HUGEINT) * x) AS sx2
        |  FROM pp),
        |g AS (
        |  SELECT CAST(n AS BIGINT) AS n,
        |    CAST((n * sxy - CAST(sx AS HUGEINT) * sy) * 1000000
        |      // greatest(n * sx2 - CAST(sx AS HUGEINT) * sx, 1) AS BIGINT)
        |      AS theta_ppm,
        |    sx * 1000 // greatest(n, 1) AS mean_x_milli
        |  FROM m),
        |v AS (
        |  SELECT variant, count(*) AS n_users,
        |    CAST(sum(x) AS BIGINT) AS sx_v, CAST(sum(y) AS BIGINT) AS sy_v
        |  FROM pp GROUP BY variant)
        |SELECT variant, n_users, theta_ppm,
        |  sy_v * 1000 // n_users AS mean_y_milli,
        |  sx_v * 1000 // n_users AS mean_x_v_milli,
        |  sy_v * 1000 // n_users
        |    - (theta_ppm * (sx_v * 1000 // n_users - mean_x_milli)) // 1000000
        |    AS cuped_adj_milli
        |FROM v CROSS JOIN g""".stripMargin,
    "abtest_diff_in_diff" ->
      s"""WITH $prePostSql,
        |c AS (
        |  SELECT
        |    CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ctrl,
        |    CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_treat,
        |    CAST(sum(CASE WHEN variant = 0 THEN x ELSE 0 END) AS BIGINT) AS sx_c,
        |    CAST(sum(CASE WHEN variant = 0 THEN y ELSE 0 END) AS BIGINT) AS sy_c,
        |    CAST(sum(CASE WHEN variant = 1 THEN x ELSE 0 END) AS BIGINT) AS sx_t,
        |    CAST(sum(CASE WHEN variant = 1 THEN y ELSE 0 END) AS BIGINT) AS sy_t
        |  FROM pp)
        |SELECT n_ctrl, n_treat,
        |  sx_c * 1000 // greatest(n_ctrl, 1) AS ctrl_pre_milli,
        |  sy_c * 1000 // greatest(n_ctrl, 1) AS ctrl_post_milli,
        |  sx_t * 1000 // greatest(n_treat, 1) AS treat_pre_milli,
        |  sy_t * 1000 // greatest(n_treat, 1) AS treat_post_milli,
        |  (sy_t * 1000 // greatest(n_treat, 1)
        |    - sx_t * 1000 // greatest(n_treat, 1))
        |  - (sy_c * 1000 // greatest(n_ctrl, 1)
        |    - sx_c * 1000 // greatest(n_ctrl, 1)) AS did_milli
        |FROM c""".stripMargin
  )
}
