package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring — the ML-ops screen that decides
  * whether yesterday's model still sees today's data: the event value
  * distribution of an early window vs a late window, compared two
  * standard ways.
  *
  *  - '''PSI''' (population stability index): equi-width bins over the
  *    pooled [min, max]; per bin the exact counts, integer ppm shares,
  *    and the PSI term `(pA−pB)·ln(pA/pB)` as ONE rounded float per
  *    ROW — no float ever aggregates (a float Σ over bins is
  *    addition-order-dependent across engines); the consumer sums the
  *    terms. Sparse bins take share-level ε smoothing (floor 1 ppm),
  *    spelled out identically on both sides.
  *  - '''KS''' (Kolmogorov–Smirnov, binned): the max CDF gap at bin
  *    granularity, cross-multiplied to stay integer-exact —
  *    `max |cumA·nB − cumB·nA| · 10⁶ div (nA·nB)` — so the whole
  *    statistic passes the hash gate.
  *
  * 100 TB shape: one scan aggregates the pooled stats (1 row,
  * broadcast); one map-side-combining (bin, side) count; every window
  * runs over ≤ bins rows (the RangeRle bounded discipline). Nothing
  * data-sized moves after the first aggregate.
  */
object Drift {

  private val bins = 64

  /** Split `events` into early/late halves by median-ish time split
    * (first vs second half of the observed span), bin `cents` and
    * emit per-bin drift rows.
    */
  /** The 1-row binning configuration (mid, mn, width) — in production
    * a static baseline config; here derived from the batch table so
    * the streaming monitor bins IDENTICALLY to the batch query.
    */
  private[graft] def binStats(events: DataFrame): DataFrame =
    events.select(col("ts_us"),
        round(col("value") * 100).cast("long").as("cents"))
      .agg(min(col("ts_us")).as("t0"), max(col("ts_us")).as("t1"),
        min(col("cents")).as("mn"), max(col("cents")).as("mx"))
      .withColumn("mid", expr("t0 + (t1 - t0) div 2"))
      .withColumn("width", expr(s"(mx - mn) div $bins + 1"))

  private def binned(events: DataFrame): DataFrame = {
    val v = events.select(col("ts_us"),
      round(col("value") * 100).cast("long").as("cents"))
    val stats = binStats(events)
    v.crossJoin(broadcast(stats))
      .select(expr("(cents - mn) div width").as("bin"),
        when(col("ts_us") <= col("mid"), "a").otherwise("b").as("side"))
      .groupBy(col("bin"))
      .agg(sum(when(col("side") === "a", 1L).otherwise(0L)).as("n_a"),
        sum(when(col("side") === "b", 1L).otherwise(0L)).as("n_b"))
  }

  /** (bin, n_a, n_b, share_a_ppm, share_b_ppm, psi_term) — PSI terms
    * per bin with share-level ε smoothing (floor 1 ppm); consumer sums.
    */
  def psiBins(events: DataFrame): DataFrame = psiFromBinned(binned(events))

  /** The PSI term arithmetic over an already-binned (bin, n_a, n_b)
    * table — shared by the batch query above and the STREAMING drift
    * monitor (streaming/StreamingOps `streaming_drift_psi`), which
    * produces the same binned counts incrementally and hands them here
    * for the bounded-size share/term step.
    */
  private[graft] def psiFromBinned(b: DataFrame): DataFrame = {
    val tot = b.agg(sum(col("n_a")).as("t_a"), sum(col("n_b")).as("t_b"))
    // Smoothing happens at the SHARE level (floor 1 ppm), not the count
    // level: `greatest(n,1)*1e6 div t` floors to 0 once t > 1e6 rows,
    // and ln(0) is an engine divergence (Spark log() → NULL, DuckDB
    // ln() → error). `greatest(n*1e6 div t, 1)` is scale-proof: every
    // bin share is ≥ 1 ppm at any corpus size.
    b.crossJoin(broadcast(tot))
      .withColumn("sa", expr("greatest(n_a * 1000000 div t_a, 1L)"))
      .withColumn("sb", expr("greatest(n_b * 1000000 div t_b, 1L)"))
      .select(col("bin"), col("n_a"), col("n_b"),
        expr("n_a * 1000000 div t_a").as("share_a_ppm"),
        expr("n_b * 1000000 div t_b").as("share_b_ppm"),
        round((col("sa") - col("sb")).cast("double") / 1e6 *
          (log(col("sa").cast("double")) - log(col("sb").cast("double"))), 6)
          .as("psi_term"))
  }

  /** (bin, n_a, n_b, js_term) — per-bin Jensen–Shannon divergence
    * terms (the SYMMETRIC, bounded drift measure PSI isn't):
    * `½·pa·ln(2pa/(pa+pb)) + ½·pb·ln(2pb/(pa+pb))` with the same
    * 1 ppm share-level smoothing as [[psiBins]], one rounded float per
    * ROW (no float aggregates — the consumer sums; Σ is bounded by
    * ln 2). Identical plan shape to PSI: one pooled-stats broadcast,
    * one (bin, side) count, bin-bounded arithmetic after.
    */
  def jsBins(events: DataFrame): DataFrame = {
    val b = binned(events)
    val tot = b.agg(sum(col("n_a")).as("t_a"), sum(col("n_b")).as("t_b"))
    b.crossJoin(broadcast(tot))
      .withColumn("sa", expr("greatest(n_a * 1000000 div t_a, 1L)"))
      .withColumn("sb", expr("greatest(n_b * 1000000 div t_b, 1L)"))
      .select(col("bin"), col("n_a"), col("n_b"),
        round(
          col("sa").cast("double") / 2e6 *
            log(lit(2.0) * col("sa").cast("double") /
              (col("sa") + col("sb")).cast("double")) +
          col("sb").cast("double") / 2e6 *
            log(lit(2.0) * col("sb").cast("double") /
              (col("sa") + col("sb")).cast("double")), 6).as("js_term"))
  }

  /** One row: (n_a, n_b, ks_x1e6) — the binned KS statistic,
    * integer-exact via cross-multiplied CDF counts. The cross-products
    * ride decimal(38,0) so the statistic cannot wrap at any row count
    * (cum·total tops 2⁶³ past ~3e9 rows per side in longs).
    */
  def ksBinned(events: DataFrame): DataFrame = {
    val b = binned(events)
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = b
      .withColumn("cum_a", sum(col("n_a")).over(w))
      .withColumn("cum_b", sum(col("n_b")).over(w))
    val tot = b.agg(sum(col("n_a")).as("t_a"), sum(col("n_b")).as("t_b"))
    cum.crossJoin(broadcast(tot))
      .select(expr("""abs(CAST(cum_a AS DECIMAL(38,0)) * t_b
                    - CAST(cum_b AS DECIMAL(38,0)) * t_a)""").as("gap"),
        col("t_a"), col("t_b"))
      .groupBy(col("t_a").as("n_a"), col("t_b").as("n_b"))
      .agg(expr("""CAST(max(gap) * 1000000
                 div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)""")
        .as("ks_x1e6"))
  }

  val queries: Map[String, Q] = Map(
    "drift_psi_bins" -> ((s, dir) => psiBins(Tables.events(s, dir))),
    "drift_ks_binned" -> ((s, dir) => ksBinned(Tables.events(s, dir))),
    "drift_js_bins" -> ((s, dir) => jsBins(Tables.events(s, dir)))
  )

  val oracleSql: Map[String, String] = Map(
    "drift_psi_bins" ->
      """WITH v AS (
        |  SELECT epoch_us(ts) AS ts_us,
        |    CAST(round(value*100) AS BIGINT) AS cents
        |  FROM events),
        |st AS (
        |  SELECT min(ts_us) AS t0, max(ts_us) AS t1,
        |    min(cents) AS mn, max(cents) AS mx,
        |    min(ts_us) + (max(ts_us) - min(ts_us)) // 2 AS mid,
        |    (max(cents) - min(cents)) // 64 + 1 AS width
        |  FROM v),
        |b AS (
        |  SELECT (cents - mn) // width AS bin,
        |    CAST(sum(CASE WHEN ts_us <= mid THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN ts_us <= mid THEN 0 ELSE 1 END) AS BIGINT) AS n_b
        |  FROM v, st GROUP BY 1),
        |t AS (SELECT CAST(sum(n_a) AS BIGINT) AS t_a,
        |        CAST(sum(n_b) AS BIGINT) AS t_b FROM b),
        |s AS (
        |  SELECT bin, n_a, n_b,
        |    greatest(n_a * 1000000 // t_a, 1) AS sa,
        |    greatest(n_b * 1000000 // t_b, 1) AS sb,
        |    n_a * 1000000 // t_a AS share_a_ppm,
        |    n_b * 1000000 // t_b AS share_b_ppm
        |  FROM b, t)
        |SELECT bin, n_a, n_b, share_a_ppm, share_b_ppm,
        |  round(CAST(sa - sb AS DOUBLE) / 1e6 *
        |    (ln(CAST(sa AS DOUBLE)) - ln(CAST(sb AS DOUBLE))), 6) AS psi_term
        |FROM s""".stripMargin,

    "drift_js_bins" ->
      """WITH v AS (
        |  SELECT epoch_us(ts) AS ts_us,
        |    CAST(round(value*100) AS BIGINT) AS cents
        |  FROM events),
        |st AS (
        |  SELECT min(ts_us) + (max(ts_us) - min(ts_us)) // 2 AS mid,
        |    min(cents) AS mn, (max(cents) - min(cents)) // 64 + 1 AS width
        |  FROM v),
        |b AS (
        |  SELECT (cents - mn) // width AS bin,
        |    CAST(sum(CASE WHEN ts_us <= mid THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN ts_us <= mid THEN 0 ELSE 1 END) AS BIGINT) AS n_b
        |  FROM v, st GROUP BY 1),
        |t AS (SELECT CAST(sum(n_a) AS BIGINT) AS t_a,
        |        CAST(sum(n_b) AS BIGINT) AS t_b FROM b),
        |s AS (
        |  SELECT bin, n_a, n_b,
        |    greatest(n_a * 1000000 // t_a, 1) AS sa,
        |    greatest(n_b * 1000000 // t_b, 1) AS sb
        |  FROM b, t)
        |SELECT bin, n_a, n_b,
        |  round(CAST(sa AS DOUBLE) / 2e6 *
        |      ln(2.0 * CAST(sa AS DOUBLE) / CAST(sa + sb AS DOUBLE)) +
        |    CAST(sb AS DOUBLE) / 2e6 *
        |      ln(2.0 * CAST(sb AS DOUBLE) / CAST(sa + sb AS DOUBLE)), 6) AS js_term
        |FROM s""".stripMargin,

    "drift_ks_binned" ->
      """WITH v AS (
        |  SELECT epoch_us(ts) AS ts_us,
        |    CAST(round(value*100) AS BIGINT) AS cents
        |  FROM events),
        |st AS (
        |  SELECT min(ts_us) + (max(ts_us) - min(ts_us)) // 2 AS mid,
        |    min(cents) AS mn, (max(cents) - min(cents)) // 64 + 1 AS width
        |  FROM v),
        |b AS (
        |  SELECT (cents - mn) // width AS bin,
        |    CAST(sum(CASE WHEN ts_us <= mid THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN ts_us <= mid THEN 0 ELSE 1 END) AS BIGINT) AS n_b
        |  FROM v, st GROUP BY 1),
        |c AS (
        |  SELECT bin, n_a, n_b,
        |    CAST(sum(n_a) OVER (ORDER BY bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_a,
        |    CAST(sum(n_b) OVER (ORDER BY bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_b
        |  FROM b),
        |t AS (SELECT CAST(sum(n_a) AS BIGINT) AS t_a,
        |        CAST(sum(n_b) AS BIGINT) AS t_b FROM b)
        |SELECT t_a AS n_a, t_b AS n_b,
        |  CAST(max(abs(CAST(cum_a AS HUGEINT) * t_b
        |          - CAST(cum_b AS HUGEINT) * t_a)) * 1000000
        |    // (CAST(t_a AS HUGEINT) * t_b) AS BIGINT) AS ks_x1e6
        |FROM c, t GROUP BY t_a, t_b""".stripMargin
  )
}
