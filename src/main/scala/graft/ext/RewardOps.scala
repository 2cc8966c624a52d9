package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Group-relative reward preparation — the two readouts an RLHF data
  * pipeline computes over sampled rollouts BEFORE any policy update:
  *
  *  - the GRPO advantage (Shao et al. 2024, DeepSeekMath): each
  *    sample's reward centered on its GROUP's mean (the per-prompt
  *    sample set is the baseline — no learned critic), summarized as a
  *    sign × magnitude-band histogram so a flat or collapsed advantage
  *    distribution is visible before training;
  *  - the best-of-n gain: per group, how much the argmax sample beats
  *    the group mean (the rejection-sampling / BoN selection value),
  *    banded by group size — the readout that prices "sample more
  *    rollouts per prompt" against reward gained.
  *
  * Here the event stream stands in for rollouts: `user_id` is the
  * prompt group, purchase `value` (exact cents) the scalar reward.
  *
  * Determinism discipline: the group mean is never divided into —
  * advantage numerators are cross-multiplied (cents·n − Σcents), the
  * per-group magnitude uses one truncating `div`, and bands are
  * floor-log2 (`length(bin(x)) - 1`) — all engine-identical integers.
  *
  * 100 TB shape: one stateless projection, one group-keyed aggregate,
  * one group-keyed equi-join back (the winsorize_by_group shape — the
  * join co-partitions with the aggregate's exchange), and a final
  * bounded-alphabet (sign × ~40 bands) aggregate that map-side
  * combines. Nothing wider than the purchase table ever shuffles.
  */
object RewardOps {

  private def purchases(events: DataFrame): DataFrame =
    events.where(col("event_type") === "purchase")
      .select(col("user_id"), round(col("value") * 100).cast("long").as("cents"))

  /** Sign × floor-log2 magnitude histogram of group-mean-centered
    * advantages: (sign, mag_band, n_events, sum_mag_cents). Singleton
    * groups land at (0, 0) by construction (cents·1 − cents = 0).
    */
  def grpoAdvantageHistogram(events: DataFrame): DataFrame = {
    val p = purchases(events)
    val g = p.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
    p.join(g, "user_id")
      .select(
        (col("cents") * col("n") - col("sum_cents")).as("adv_num"), col("n"))
      .select(
        when(col("adv_num") > 0, 1).when(col("adv_num") < 0, -1).otherwise(0)
          .as("sign"),
        expr("abs(adv_num) div n").as("mag"))
      .select(col("sign"),
        (length(bin(col("mag") + 1)) - 1).cast("long").as("mag_band"),
        col("mag"))
      .groupBy(col("sign"), col("mag_band"))
      .agg(count(lit(1)).as("n_events"), sum(col("mag")).as("sum_mag_cents"))
  }

  /** Best-of-n gain by group-size band: per group the argmax reward's
    * lead over the group mean in milli-cents (one truncating div per
    * group), aggregated per ⌊log2 n⌋ band — (size_band, n_groups,
    * avg_best_cents, avg_gain_x1000).
    */
  def bestOfNGain(events: DataFrame): DataFrame =
    purchases(events)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"),
        max(col("cents")).as("best_cents"))
      .select(
        (length(bin(col("n"))) - 1).cast("long").as("size_band"),
        col("best_cents"),
        expr("(best_cents * n - sum_cents) * 1000 div n").as("gain_x1000"))
      .groupBy(col("size_band"))
      .agg(count(lit(1)).as("n_groups"),
        expr("sum(best_cents) div count(1)").as("avg_best_cents"),
        expr("sum(gain_x1000) div count(1)").as("avg_gain_x1000"))

  val queries: Map[String, Q] = Map(
    "grpo_group_advantage" -> ((s, dir) =>
      grpoAdvantageHistogram(Tables.events(s, dir))),
    "reward_best_of_n_gain" -> ((s, dir) =>
      bestOfNGain(Tables.events(s, dir)))
  )

  private val pSql =
    """p AS (
      |  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase')""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "grpo_group_advantage" ->
      s"""WITH $pSql,
         |g AS (
         |  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(cents) AS BIGINT) AS sum_cents
         |  FROM p GROUP BY user_id),
         |adv AS (
         |  SELECT p.cents * g.n - g.sum_cents AS adv_num, g.n
         |  FROM p JOIN g ON g.user_id = p.user_id),
         |m AS (
         |  SELECT CASE WHEN adv_num > 0 THEN 1 WHEN adv_num < 0 THEN -1 ELSE 0 END AS sign,
         |    abs(adv_num) // n AS mag
         |  FROM adv)
         |SELECT sign, CAST(length(bin(mag + 1)) - 1 AS BIGINT) AS mag_band,
         |  CAST(count(*) AS BIGINT) AS n_events,
         |  CAST(sum(mag) AS BIGINT) AS sum_mag_cents
         |FROM m GROUP BY 1, 2""".stripMargin,
    "reward_best_of_n_gain" ->
      s"""WITH $pSql,
         |g AS (
         |  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(cents) AS BIGINT) AS sum_cents,
         |    CAST(max(cents) AS BIGINT) AS best_cents
         |  FROM p GROUP BY user_id),
         |b AS (
         |  SELECT CAST(length(bin(n)) - 1 AS BIGINT) AS size_band, best_cents,
         |    (best_cents * n - sum_cents) * 1000 // n AS gain_x1000
         |  FROM g)
         |SELECT size_band, CAST(count(*) AS BIGINT) AS n_groups,
         |  CAST(sum(best_cents) // count(*) AS BIGINT) AS avg_best_cents,
         |  CAST(sum(gain_x1000) // count(*) AS BIGINT) AS avg_gain_x1000
         |FROM b GROUP BY 1""".stripMargin
  )
}
