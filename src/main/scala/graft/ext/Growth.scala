package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** User-base growth accounting — the standard DAU/WAU decomposition
  * (new / retained / resurrected / churned per period) plus the
  * cumulative-users curve. Both are exact integer counts.
  *
  * 100 TB shape: everything reduces to the distinct (user, week)
  * activity table — one user-keyed shuffle — then:
  *
  *  - growth accounting is a SELF-JOIN of that table against itself
  *    shifted one week (full outer on (user, week) vs (user, week+1)),
  *    classified per row and aggregated per week: no window over the
  *    raw stream, no per-user state, join keys are (user, week) —
  *    high-cardinality and balanced;
  *  - first-seen weeks are a per-user min (map-side combining);
  *  - the cumulative curve is a running sum over the PER-WEEK new-user
  *    counts — a series bounded by the calendar, where the
  *    single-partition window is the documented bounded discipline
  *    (same as the autocorrelation day series).
  */
object Growth {

  private val weekUs = 7L * 86400000000L

  /** (week, n_new, n_retained, n_resurrected, n_churned) — active =
    * any event in that week; new = first-ever active week; retained =
    * active this week and the previous; resurrected = active this week,
    * inactive previous, not new; churned = active previous week,
    * inactive this (attributed to THIS week).
    */
  def growthAccounting(events: DataFrame): DataFrame = {
    val active = events
      .select(col("user_id"), expr(s"ts_us div $weekUs").as("week"))
      .distinct()
    val firstSeen = active.groupBy(col("user_id"))
      .agg(min(col("week")).as("first_week"))
    val prev = active.select(col("user_id"), (col("week") + 1).as("week"),
      lit(1).as("was_active"))
    val cur = active.select(col("user_id"), col("week"), lit(1).as("is_active"))
    cur.join(prev, Seq("user_id", "week"), "full_outer")
      .join(firstSeen, "user_id")
      .groupBy(col("week"))
      .agg(
        sum(when(col("is_active").isNotNull && col("week") === col("first_week"),
          1L).otherwise(0L)).as("n_new"),
        sum(when(col("is_active").isNotNull && col("was_active").isNotNull,
          1L).otherwise(0L)).as("n_retained"),
        sum(when(col("is_active").isNotNull && col("was_active").isNull &&
          col("week") > col("first_week"), 1L).otherwise(0L)).as("n_resurrected"),
        sum(when(col("is_active").isNull && col("was_active").isNotNull,
          1L).otherwise(0L)).as("n_churned"))
  }

  /** (day, n_new_users, cum_users) — distinct-to-date via first-seen
    * days, no running count-distinct state anywhere.
    */
  def cumulativeUsers(events: DataFrame): DataFrame = {
    val dayUs = 86400000000L
    val firstDay = events
      .select(col("user_id"), expr(s"ts_us div $dayUs").as("day"))
      .groupBy(col("user_id")).agg(min(col("day")).as("day"))
    val perDay = firstDay.groupBy(col("day"))
      .agg(count(lit(1)).as("n_new_users"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("day"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    perDay.withColumn("cum_users", sum(col("n_new_users")).over(w))
  }

  /** A/B experiment readout with a deterministic hash split: variant =
    * md5-bit of user_id (the portable split already used by the
    * sampling family — never `user_id % 2`, which inherits generator
    * structure), conversion = any purchase. Per variant: exposed
    * users, converters, integer conversion ppm, and purchase cents.
    * One user-keyed aggregate → 2-row output; significance testing
    * belongs downstream of these exact counts.
    */
  def abConversion(events: DataFrame): DataFrame = {
    val variant = (expr("conv(substring(md5(cast(user_id AS STRING)), 1, 4), 16, 10)")
      .cast("long") % 2).as("variant")
    events
      .groupBy(col("user_id")).agg(
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("converted"),
        sum(when(col("event_type") === "purchase",
          round(col("value") * 100).cast("long")).otherwise(0L))
          .as("cents"))
      .select(variant, col("converted"), col("cents"))
      .groupBy(col("variant"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("converted")).as("n_converted"),
        sum(col("cents")).as("purchase_cents"))
      .withColumn("conv_ppm", expr("n_converted * 1000000 div n_users"))
  }

  /** Sample-ratio-mismatch (SRM) check on the same md5 A/B split —
    * experimentation QA step zero: a 50/50 split whose realized counts
    * deviate beyond chance means the assignment (or logging) is broken
    * and every downstream readout is invalid. χ² vs the expected even
    * split as an exact integer ×10⁶:
    * `Σ (2·nᵥ − N)² · 10⁶ div (2·N)` over the two variants
    * (= Σ(nᵥ−N/2)²/(N/2) with the halves cleared). One 2-row
    * aggregate; the verdict boolean pins χ² < 3.84·10⁶ (the 5% level).
    */
  def srmCheck(events: DataFrame): DataFrame = {
    val variant = (expr("conv(substring(md5(cast(user_id AS STRING)), 1, 4), 16, 10)")
      .cast("long") % 2).as("variant")
    events.select(col("user_id")).distinct()
      .select(variant)
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n_b"))
      .select(col("n_total"), col("n_a"), col("n_b"),
        // greatest(...,1) guard (round-10 advice): an empty input zeroes
        // 2·N, where Spark div yields NULL but DuckDB // errors — the
        // established mcnemar/bootstrap guard, mirrored in the oracle
        expr("""((2 * n_a - n_total) * CAST(2 * n_a - n_total AS DECIMAL(38,0))
               + (2 * n_b - n_total) * CAST(2 * n_b - n_total AS DECIMAL(38,0)))
               * 1000000 div greatest(2 * CAST(n_total AS DECIMAL(38,0)), 1)""")
          .as("chi2_x1e6"))
      .withColumn("srm_ok", col("chi2_x1e6") < 3841459L)
  }

  /** DAU/WAU stickiness per day — "what fraction of this week's users
    * showed up today": daily actives joined against the trailing-7-day
    * distinct actives, ratio as exact ppm. The weekly side reuses the
    * daily distinct table exploded to the 7 days each activity covers
    * (activity × 7 rows — bounded fan-out, map-side), so no distinct
    * runs over a sliding window.
    */
  def dauWauStickiness(events: DataFrame): DataFrame = {
    val daily = events
      .select(col("user_id"), expr("ts_us div 86400000000").as("day"))
      .distinct()
    val dau = daily.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val wau = daily
      .select(col("user_id"),
        explode(sequence(col("day"), col("day") + 6)).as("day"))
      .distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("wau"))
    dau.join(wau, "day")
      .select(col("day"), col("dau"), col("wau"),
        expr("dau * 1000000 div wau").as("stickiness_ppm"))
  }

  val queries: Map[String, Q] = Map(
    "growth_accounting" ->
      ((s, dir) => growthAccounting(Tables.events(s, dir))),
    "cumulative_distinct_users" ->
      ((s, dir) => cumulativeUsers(Tables.events(s, dir))),
    "abtest_conversion" ->
      ((s, dir) => abConversion(Tables.events(s, dir))),
    "abtest_srm_check" ->
      ((s, dir) => srmCheck(Tables.events(s, dir))),
    "dau_wau_stickiness" ->
      ((s, dir) => dauWauStickiness(Tables.events(s, dir)))
  )

  val oracleSql: Map[String, String] = Map(
    "growth_accounting" ->
      """WITH active AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS week
        |  FROM events),
        |first_seen AS (
        |  SELECT user_id, min(week) AS first_week FROM active GROUP BY user_id),
        |cur AS (SELECT user_id, week, 1 AS is_active FROM active),
        |prev AS (SELECT user_id, week + 1 AS week, 1 AS was_active FROM active),
        |j AS (
        |  SELECT coalesce(c.user_id, p.user_id) AS user_id,
        |    coalesce(c.week, p.week) AS week, c.is_active, p.was_active
        |  FROM cur c FULL OUTER JOIN prev p
        |    ON p.user_id = c.user_id AND p.week = c.week)
        |SELECT j.week,
        |  CAST(sum(CASE WHEN is_active IS NOT NULL AND j.week = f.first_week
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        |  CAST(sum(CASE WHEN is_active IS NOT NULL AND was_active IS NOT NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
        |  CAST(sum(CASE WHEN is_active IS NOT NULL AND was_active IS NULL
        |    AND j.week > f.first_week THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected,
        |  CAST(sum(CASE WHEN is_active IS NULL AND was_active IS NOT NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_churned
        |FROM j JOIN first_seen f ON f.user_id = j.user_id
        |GROUP BY j.week""".stripMargin,

    "abtest_srm_check" ->
      """WITH u AS (
        |  SELECT DISTINCT user_id FROM events),
        |v AS (
        |  SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4))
        |    AS BIGINT) % 2 AS variant
        |  FROM u),
        |m AS (
        |  SELECT count(*) AS n_total,
        |    CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        |  FROM v)
        |SELECT n_total, n_a, n_b,
        |  CAST(((2 * n_a - n_total) * CAST(2 * n_a - n_total AS HUGEINT)
        |      + (2 * n_b - n_total) * CAST(2 * n_b - n_total AS HUGEINT))
        |    * 1000000 // greatest(2 * CAST(n_total AS HUGEINT), 1) AS BIGINT)
        |    AS chi2_x1e6,
        |  CAST(((2 * n_a - n_total) * CAST(2 * n_a - n_total AS HUGEINT)
        |      + (2 * n_b - n_total) * CAST(2 * n_b - n_total AS HUGEINT))
        |    * 1000000 // greatest(2 * CAST(n_total AS HUGEINT), 1) AS BIGINT)
        |    < 3841459 AS srm_ok
        |FROM m""".stripMargin,

    "dau_wau_stickiness" ->
      """WITH daily AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
        |  FROM events),
        |dau AS (SELECT day, count(*) AS dau FROM daily GROUP BY day),
        |wau AS (
        |  SELECT d2.day, count(DISTINCT daily.user_id) AS wau
        |  FROM daily, UNNEST(generate_series(daily.day, daily.day + 6)) AS d2(day)
        |  GROUP BY d2.day)
        |SELECT day, dau, wau, dau * 1000000 // wau AS stickiness_ppm
        |FROM dau JOIN wau USING (day)""".stripMargin,

    "cumulative_distinct_users" ->
      """WITH first_day AS (
        |  SELECT user_id, min(epoch_us(ts) // 86400000000) AS day
        |  FROM events GROUP BY user_id),
        |per_day AS (
        |  SELECT day, count(*) AS n_new_users FROM first_day GROUP BY day)
        |SELECT day, n_new_users,
        |  CAST(sum(n_new_users) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_users
        |FROM per_day""".stripMargin,

    "abtest_conversion" ->
      """WITH ev AS (
        |  SELECT user_id, event_type,
        |    CAST(round(value*100) AS BIGINT) AS cents
        |  FROM events),
        |per_user AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN cents ELSE 0 END)
        |      AS BIGINT) AS cents
        |  FROM ev GROUP BY user_id),
        |v AS (
        |  SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4))
        |      AS BIGINT) % 2 AS variant,
        |    converted, cents
        |  FROM per_user)
        |SELECT variant, count(*) AS n_users,
        |  CAST(sum(converted) AS BIGINT) AS n_converted,
        |  CAST(sum(cents) AS BIGINT) AS purchase_cents,
        |  CAST(sum(converted) AS BIGINT) * 1000000 // count(*) AS conv_ppm
        |FROM v GROUP BY variant""".stripMargin
  )
}
