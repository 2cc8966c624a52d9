package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Lift / gains-table analysis — the model-evaluation readout a
  * targeting or ranking pipeline produces: rank the population by a
  * score, cut into deciles, and ask how concentrated the responders
  * are in the top cuts (cumulative lift = how much better than random
  * the top-k·10% is).
  *
  * Exactness discipline: deciles come from the distributed two-phase
  * rank (`Offsets.globalPosition` — no single-partition window over
  * the population), `decile = pos·10 div n`; the per-decile and
  * cumulative windows then run over EXACTLY 10 rows (the histogram-bin
  * bounded regime). Rates and lift are integer ppm with decimal(38,0)
  * intermediates (cum_resp·n_total·10⁶ passes 2⁶³ near 1e6 users);
  * all quantities nonneg so `div`/`//` agree without the pmod
  * identity.
  *
  * 100 TB shape: one keyed aggregate (user → score, outcome), one
  * range shuffle for the rank, then 10-row arithmetic. Nothing
  * data-sized crosses an exchange twice.
  */
object Uplift {

  /** (decile, n_users, n_resp, resp_rate_ppm, cum_lift_ppm) — decile 0
    * is the TOP-scored 10%. `scored` must have columns (id, score,
    * responded∈{0,1}).
    */
  def liftGainsDeciles(scored: DataFrame): DataFrame = {
    val ranked = graft.ops.Offsets.globalPosition(
      scored.select(col("id"), col("score"), col("responded")),
      Seq(col("score").desc, col("id")), "pos")
    val tot = ranked.agg(count(lit(1)).as("n_total"),
      sum(col("responded")).as("total_resp"))
    val byDecile = ranked.crossJoin(broadcast(tot))
      .select(expr("pos * 10 div n_total").as("decile"),
        col("responded"), col("n_total"), col("total_resp"))
      .groupBy(col("decile"), col("n_total"), col("total_resp"))
      .agg(count(lit(1)).as("n_users"), sum(col("responded")).as("n_resp"))
    val wCum = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byDecile
      .withColumn("cum_users", sum(col("n_users")).over(wCum))
      .withColumn("cum_resp", sum(col("n_resp")).over(wCum))
      .select(col("decile"), col("n_users"), col("n_resp"),
        expr("n_resp * 1000000 div n_users").as("resp_rate_ppm"),
        expr("""CAST(CAST(cum_resp AS DECIMAL(38,0)) * n_total * 1000000
               div (CAST(cum_users AS DECIMAL(38,0)) * greatest(total_resp, 1L))
               AS BIGINT)""").as("cum_lift_ppm"))
  }

  val queries: Map[String, Q] = Map(
    // score users by click count, outcome = any purchase: does click
    // volume rank purchase propensity? (the gains table a targeting
    // model would be judged by, on the behavioral baseline score)
    "lift_gains_deciles" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val perUser = ev.groupBy(col("user_id").as("id"))
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("score"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("responded"))
      liftGainsDeciles(perUser)
    })
  )

  val oracleSql: Map[String, String] = Map(
    "lift_gains_deciles" ->
      """WITH u AS (
        |  SELECT user_id AS id,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS score,
        |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS responded
        |  FROM events GROUP BY user_id),
        |r AS (
        |  SELECT score, responded,
        |    ROW_NUMBER() OVER (ORDER BY score DESC, id) - 1 AS pos,
        |    count(*) OVER () AS n_total,
        |    CAST(sum(responded) OVER () AS BIGINT) AS total_resp
        |  FROM u),
        |d AS (
        |  SELECT pos * 10 // n_total AS decile, n_total, total_resp,
        |    count(*) AS n_users, CAST(sum(responded) AS BIGINT) AS n_resp
        |  FROM r GROUP BY 1, 2, 3),
        |c AS (
        |  SELECT decile, n_users, n_resp, n_total, total_resp,
        |    CAST(sum(n_users) OVER (ORDER BY decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users,
        |    CAST(sum(n_resp) OVER (ORDER BY decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_resp
        |  FROM d)
        |SELECT decile, n_users, n_resp,
        |  n_resp * 1000000 // n_users AS resp_rate_ppm,
        |  CAST(CAST(cum_resp AS HUGEINT) * n_total * 1000000
        |    // (CAST(cum_users AS HUGEINT) * greatest(total_resp, 1)) AS BIGINT) AS cum_lift_ppm
        |FROM c""".stripMargin
  )
}
