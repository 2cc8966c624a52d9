package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Marketing attribution over the event stream — the product-analytics
  * companion to [[Cohort]] and Sessionize: credit each purchase to the
  * touch events (clicks / views) that preceded it.
  *
  * Two standard models, both integer-exact (cents in, cents/micros out):
  *
  *  - '''last-touch''': the whole purchase value goes to the most recent
  *    touch within the lookback window. One pass, one window.
  *  - '''linear (multi-touch)''': the value splits evenly across every
  *    touch in the window; the per-touch credit is
  *    `cents * 1e6 div n_touches` so the split is exact, deterministic
  *    truncating integer arithmetic in BOTH engines (Spark `div` ==
  *    DuckDB `//`, both truncate — see PLANS.md round-9 on the
  *    floor-vs-truncate trap).
  *
  * 100 TB shape: everything is keyed by `user_id` — the last-touch
  * window is one user-keyed shuffle with O(1) running state per user
  * (a single max); the linear model's purchase×touch join fans out at
  * most (touches in a 7-day window) per purchase FOR THAT USER — per-key
  * work is bounded by per-user activity, never corpus-sized, and the
  * follow-up `n_touches` window re-keys by purchase id (high-cardinality,
  * balanced). No broadcast of anything data-sized, no global state.
  *
  * The last-touch "which touch was it" problem is solved WITHOUT a
  * struct-max (not portable to the oracle) by encoding (ts_us, channel)
  * into one orderable long: `ts_us * 8 + code` — ts_us ≈ 1.7e15 so the
  * shifted value stays far under 2^63, and ties at the same microsecond
  * resolve to the higher channel code, a defined rule applied
  * identically in both engines.
  */
object Attribution {

  private val dayUs = 86400000000L
  private val lookbackUs: Long = 7L * dayUs

  /** (channel, n_purchases, attributed_cents) — purchase value credited
    * to the most recent click/view by the same user ≤ 7 days before.
    *
    * PINNED lookback-boundary rule: the window orders by
    * (ts_us, event_id) with a `1 PRECEDING` upper bound, so a touch at
    * the SAME microsecond as the purchase is credited iff its event_id
    * sorts lower — whereas [[linear]] strictly excludes same-ts touches
    * (`t_ts < p_ts`). The two models intentionally disagree on that
    * boundary (last-touch is "the latest signal known at purchase
    * time", linear is "signals strictly before"); both engines mirror
    * each rule exactly, so the oracle gate pins both.
    */
  def lastTouch(events: DataFrame): DataFrame = {
    val enc = when(col("event_type") === "click", col("ts_us") * 8 + 1)
      .when(col("event_type") === "view", col("ts_us") * 8 + 2)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      .withColumn("last_enc", max(enc).over(w))
      .where(col("event_type") === "purchase" && col("last_enc").isNotNull &&
        col("ts_us") - expr("last_enc div 8") <= lookbackUs)
      .groupBy(when(col("last_enc") % 8 === 1, "click").otherwise("view")
        .as("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("cents")).as("attributed_cents"))
  }

  /** (channel, n_credits, credit_micros) — every touch in the 7-day
    * window before a purchase gets an equal share of its value,
    * `cents * 1e6 div n_touches` (micro-cents, truncating).
    */
  def linear(events: DataFrame): DataFrame = {
    val ev = events.select(col("user_id"), col("ts_us"), col("event_id"),
      col("event_type"), round(col("value") * 100).cast("long").as("cents"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us").as("p_ts"),
        col("event_id").as("p_id"), col("cents"))
    val touches = ev.where(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("ts_us").as("t_ts"),
        col("event_type").as("channel"))
    val joined = purchases.join(touches, Seq("user_id"))
      .where(col("t_ts") < col("p_ts") &&
        col("p_ts") - col("t_ts") <= lookbackUs)
    joined
      .withColumn("n_touch", count(lit(1)).over(Window.partitionBy(col("p_id"))))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_credits"),
        sum(expr("cents * 1000000 div n_touch")).as("credit_micros"))
  }

  val queries: Map[String, Q] = Map(
    "attribution_last_touch" ->
      ((s, dir) => lastTouch(Tables.events(s, dir))),
    "attribution_linear" ->
      ((s, dir) => linear(Tables.events(s, dir)))
  )

  val oracleSql: Map[String, String] = Map(
    "attribution_last_touch" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
        |    CAST(round(value*100) AS BIGINT) AS cents
        |  FROM events),
        |w AS (
        |  SELECT *, max(CASE WHEN event_type = 'click' THEN ts_us*8 + 1
        |                     WHEN event_type = 'view'  THEN ts_us*8 + 2 END)
        |    OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_enc
        |  FROM ev)
        |SELECT CASE WHEN last_enc % 8 = 1 THEN 'click' ELSE 'view' END AS channel,
        |  count(*) AS n_purchases, CAST(sum(cents) AS BIGINT) AS attributed_cents
        |FROM w
        |WHERE event_type = 'purchase' AND last_enc IS NOT NULL
        |  AND ts_us - last_enc // 8 <= 604800000000
        |GROUP BY 1""".stripMargin,

    "attribution_linear" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
        |    CAST(round(value*100) AS BIGINT) AS cents
        |  FROM events),
        |p AS (SELECT user_id, ts_us AS p_ts, event_id AS p_id, cents
        |      FROM ev WHERE event_type = 'purchase'),
        |t AS (SELECT user_id, ts_us AS t_ts, event_type AS channel
        |      FROM ev WHERE event_type IN ('click', 'view')),
        |j AS (SELECT p.p_id, p.cents, t.channel
        |      FROM p JOIN t ON t.user_id = p.user_id
        |       AND t.t_ts < p.p_ts AND p.p_ts - t.t_ts <= 604800000000),
        |n AS (SELECT *, count(*) OVER (PARTITION BY p_id) AS n_touch FROM j)
        |SELECT channel, count(*) AS n_credits,
        |  CAST(sum(cents * 1000000 // n_touch) AS BIGINT) AS credit_micros
        |FROM n GROUP BY 1""".stripMargin
  )
}
