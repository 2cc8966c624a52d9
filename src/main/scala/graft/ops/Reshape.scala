package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Wide↔long reshaping and rank-based robust clipping — the two
  * remaining relational-surface staples beside `pivot_agg`:
  *
  *  - '''unpivot''' (melt): lineitem's four numeric measures become
  *    (metric, value) rows via `stack` — a codegen `Generate`, zero
  *    shuffle until the downstream aggregate; the inverse of PIVOT.
  *  - '''winsorize''': clip each group's values into its exact
  *    [p05, p95] band. The percentile is PERCENTILE_DISC semantics made
  *    explicit — the value at global in-group rank `(n*5) div 100` —
  *    so the whole operator is integer arithmetic the oracle reproduces
  *    exactly (no interpolated double percentiles).
  *
  * 100 TB shape: unpivot multiplies rows by the metric count but stays
  * pipelined into the map-side-combining aggregate — no extra exchange.
  * Winsorize finds its clip bounds with [[Selection.groupedSelect]]'s
  * two-phase histogram selection (no data-sized sort, no per-group
  * window); the per-group bounds (2 values × groups) broadcast back
  * onto the scan.
  */
object Reshape {

  /** Long-form summary of lineitem's measures: one row per
    * (l_returnflag, metric) with count / sum / min / max over exact
    * integer encodings (cents for money/quantity, basis points for
    * the two ratio columns).
    */
  def unpivotMeasures(lineitem: DataFrame): DataFrame =
    lineitem
      .select(col("l_returnflag"),
        round(col("l_quantity") * 100).cast("long").as("qty_c"),
        round(col("l_extendedprice") * 100).cast("long").as("price_c"),
        round(col("l_discount") * 10000).cast("long").as("disc_bp"),
        round(col("l_tax") * 10000).cast("long").as("tax_bp"))
      .selectExpr("l_returnflag",
        """stack(4, 'quantity_cents', qty_c, 'price_cents', price_c,
          |'discount_bp', disc_bp, 'tax_bp', tax_bp) AS (metric, v)""".stripMargin)
      .groupBy(col("l_returnflag"), col("metric"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v"),
        min(col("v")).as("min_v"), max(col("v")).as("max_v"))

  /** Per-group winsorized totals over `l_extendedprice` cents, grouped
    * by `l_returnflag`: (group, n, n_clipped_lo, n_clipped_hi,
    * winsorized_sum_cents) with exact rank-based p05/p95 bounds.
    *
    * The bounds are found by [[Selection.groupedSelect]]'s two-phase
    * histogram selection — the full grouped ranking this started with
    * probed 3.3× at 10× (range-repartition sort of every row); rank
    * selection needs only the two boundary VALUES per group, so the
    * only sorted rows are the target histogram bins (~n/4096), and the
    * 10× ratio drops to ~1 (one scan pair + a broadcast clip pass).
    */
  def winsorize(lineitem: DataFrame): DataFrame = {
    val data = lineitem.select(col("l_returnflag").as("grp"),
      round(col("l_extendedprice") * 100).cast("long").as("v"))
    val sel = Selection.groupedSelect(data, "grp", "v",
      Seq(("lo", "(n * 5) div 100 + 1"), ("hi", "(n * 95) div 100")))
    // groups below 20 rows have no well-defined p95 rank ((n·95) div 100
    // can reach 0) and are EXCLUDED — without this, the hi bound is NULL
    // and the engines disagree on least(x, NULL) (Spark propagates,
    // DuckDB ignores); the floor makes "too small to winsorize" the
    // defined, engine-identical semantics
    val bounds = sel.where(col("n") >= 20)
      .groupBy(col("grp"), col("n"))
      .agg(min(when(col("sel_label") === "lo", col("x"))).as("lo"),
        max(when(col("sel_label") === "hi", col("x"))).as("hi"))
    data.join(broadcast(bounds), "grp")
      .groupBy(col("grp"))
      .agg(max(col("n")).as("n"),
        sum(when(col("v") < col("lo"), 1L).otherwise(0L)).as("n_clipped_lo"),
        sum(when(col("v") > col("hi"), 1L).otherwise(0L)).as("n_clipped_hi"),
        sum(least(greatest(col("v"), col("lo")), col("hi")))
          .as("winsorized_sum_cents"))
  }

  val queries: Map[String, Q] = Map(
    "unpivot_long" -> ((s, dir) => unpivotMeasures(Tables.lineitem(s, dir))),
    "winsorize_by_group" -> ((s, dir) => winsorize(Tables.lineitem(s, dir)))
  )

  val oracleSql: Map[String, String] = Map(
    "unpivot_long" ->
      """WITH base AS (
        |  SELECT l_returnflag,
        |    CAST(round(l_quantity*100) AS BIGINT) AS qty_c,
        |    CAST(round(l_extendedprice*100) AS BIGINT) AS price_c,
        |    CAST(round(l_discount*10000) AS BIGINT) AS disc_bp,
        |    CAST(round(l_tax*10000) AS BIGINT) AS tax_bp
        |  FROM lineitem),
        |u AS (
        |  SELECT l_returnflag, 'quantity_cents' AS metric, qty_c AS v FROM base
        |  UNION ALL SELECT l_returnflag, 'price_cents', price_c FROM base
        |  UNION ALL SELECT l_returnflag, 'discount_bp', disc_bp FROM base
        |  UNION ALL SELECT l_returnflag, 'tax_bp', tax_bp FROM base)
        |SELECT l_returnflag, metric, count(*) AS n,
        |  CAST(sum(v) AS BIGINT) AS sum_v,
        |  min(v) AS min_v, max(v) AS max_v
        |FROM u GROUP BY 1, 2""".stripMargin,

    "winsorize_by_group" ->
      """WITH data AS (
        |  SELECT l_returnflag AS grp,
        |    CAST(round(l_extendedprice*100) AS BIGINT) AS v,
        |    l_orderkey, l_linenumber
        |  FROM lineitem),
        |rk AS (
        |  SELECT grp, v,
        |    row_number() OVER (PARTITION BY grp
        |      ORDER BY v, l_orderkey, l_linenumber) - 1 AS gpos,
        |    count(*) OVER (PARTITION BY grp) AS n
        |  FROM data),
        |bounds AS (
        |  SELECT grp, n,
        |    min(CASE WHEN gpos = (n * 5) // 100 THEN v END) AS lo,
        |    max(CASE WHEN gpos = (n * 95) // 100 - 1 THEN v END) AS hi
        |  FROM rk
        |  WHERE (gpos = (n * 5) // 100 OR gpos = (n * 95) // 100 - 1)
        |    AND n >= 20
        |  GROUP BY grp, n)
        |SELECT d.grp, max(b.n) AS n,
        |  CAST(sum(CASE WHEN d.v < b.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_lo,
        |  CAST(sum(CASE WHEN d.v > b.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_hi,
        |  CAST(sum(least(greatest(d.v, b.lo), b.hi)) AS BIGINT) AS winsorized_sum_cents
        |FROM data d JOIN bounds b ON b.grp = d.grp
        |GROUP BY d.grp""".stripMargin
  )
}
