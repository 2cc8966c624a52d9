package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probability-calibration and two-sample inference — the evaluation
  * screens a model-training pipeline runs on scored data before
  * trusting the scores: is the predicted probability CALIBRATED
  * (reliability diagram, ECE — Naeini et al. 2015 / Guo et al. 2017),
  * how good is it as a probabilistic forecast (Brier 1950), and do two
  * cohorts differ beyond noise (Welch 1947 unequal-variance t-test,
  * Cohen's d effect size)?
  *
  * All statistics are EXACT INTEGER RATIONALS in the house style
  * (Agreement.scala precedent): scores live in ppm (parts-per-million
  * BIGINTs), every mean/rate is one truncating `div` (Spark `div` and
  * DuckDB `//` both truncate toward zero), and products that can pass
  * 2⁶³ ride decimal(38,0). No floats anywhere, so the driver's hash
  * compare is exact by construction.
  *
  * The demo "model" is a deliberately naive monotone score from
  * `l_quantity` predicting returns (`l_returnflag = 'R'`) — a signal
  * with essentially no predictive power, which is exactly what a
  * reliability diagram is for: every bin's empirical rate hugs the
  * base rate while confidence spans [0,1], and ECE quantifies the gap.
  *
  * 100 TB shape: reliability is ONE map-side-combined aggregate on a
  * 10-row key (the bin); ECE/Brier fold that into a second aggregate
  * over ≤10 rows; Welch/Cohen is one 2-key aggregate (per cohort
  * Σx, Σx², n) — everything downstream is arithmetic on ≤2 rows.
  * Magnitude ceiling: Σ(score_ppm − y·10⁶)² ≤ 10¹²·n stays inside
  * decimal(38,0) to n ≈ 10²⁶ rows; the Welch denominators
  * n·Q·10⁶ ≤ 2.5·10⁹·n² hold to n ≈ 6·10¹³ rows per cohort.
  */
object Calibration {

  /** score_ppm ∈ [24600, 985000]: affine map of quantity 1..50. */
  private val scorePpm: Column =
    (col("l_quantity").cast("long") * lit(19600L) + lit(5000L)).as("score_ppm")

  private val labelY: Column =
    when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y")

  /** (score_ppm, y) projection of lineitem — shared with the streaming
    * face (streaming_calibration) so the two can never diverge.
    */
  private[graft] def scoreLabel(lineitem: DataFrame): DataFrame =
    lineitem.select(scorePpm, labelY)

  private def scored(spark: org.apache.spark.sql.SparkSession,
                     dir: String): DataFrame =
    scoreLabel(Tables.lineitem(spark, dir))

  /** Reliability diagram over 10 equal-width score bins: per bin the
    * support, mean confidence (ppm), empirical positive rate (ppm),
    * and |confidence − accuracy| gap (ppm).
    */
  def reliability(data: DataFrame): DataFrame =
    reliabilityFinish(binned(data))

  /** The incremental (bin, n, Σscore, n_pos) aggregate — the part a
    * streaming complete-mode aggregation can maintain.
    */
  private[graft] def binned(data: DataFrame): DataFrame =
    data
      .withColumn("bin", expr("least(score_ppm div 100000, 9L)"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(col("score_ppm")).as("_sum_score"),
        sum(col("y")).as("n_pos"))

  /** Batch finisher over the binned aggregate (arithmetic on ≤10 rows). */
  private[graft] def reliabilityFinish(bins: DataFrame): DataFrame =
    bins
      .select(col("bin"), col("n"), col("n_pos"),
        expr("_sum_score div n").as("conf_ppm"),
        expr("n_pos * 1000000 div n").as("acc_ppm"),
        expr("abs(_sum_score div n - n_pos * 1000000 div n)").as("gap_ppm"))
      .orderBy("bin")

  /** One row: expected calibration error (support-weighted mean bin
    * gap, ppm) and the Brier score (mean squared forecast error,
    * ×10¹²) over the same scored data. The squared-error sum rides
    * decimal(38,0); each per-bin gap reuses the reliability
    * arithmetic verbatim so the two queries can never disagree.
    */
  def eceBrier(data: DataFrame): DataFrame = {
    val bins = data
      .withColumn("bin", expr("least(score_ppm div 100000, 9L)"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(col("score_ppm")).as("_sum_score"),
        sum(col("y")).as("n_pos"),
        sum(expr(
          """(CAST(score_ppm AS DECIMAL(38,0)) - y * 1000000)
            | * (CAST(score_ppm AS DECIMAL(38,0)) - y * 1000000)""".stripMargin))
          .as("_sq"))
    bins
      .agg(sum(col("n")).as("n_total"),
        sum(expr("n * abs(_sum_score div n - n_pos * 1000000 div n)"))
          .as("_wgap"),
        sum(col("_sq")).as("_sqsum"))
      .select(col("n_total"),
        expr("CAST(_wgap div n_total AS BIGINT)").as("ece_ppm"),
        expr("CAST(_sqsum div n_total AS BIGINT)").as("brier_x1e12"))
  }

  /** Welch's unequal-variance t-test plus Cohen's d between two
    * cohorts of an integer measure, all via staged truncating integer
    * division mirrored exactly in the oracle:
    *
    *   var_x1e6  = (n·Q − S²)·10⁶ div (n·(n−1))     (sample variance ×10⁶)
    *   dm_ppm    = S₁·10⁶ div n₁ − S₂·10⁶ div n₂     (mean difference ×10⁶)
    *   t²_ppm    = dm_ppm² div (v₁ div n₁ + v₂ div n₂)
    *   df_ppm    = (a₁+a₂)²·10⁶ div (a₁² div (n₁−1) + a₂² div (n₂−1)),
    *               a_i = v_i div n_i                  (Welch–Satterthwaite)
    *   d²_ppm    = dm_ppm² div pooled_var_x1e6        (Cohen's d, squared)
    *
    * Squares avoid sqrt (float) entirely; t and d are recoverable as
    * sqrt(t²_ppm/10⁶) downstream. Degenerate inputs (a cohort of ≤1
    * row, or zero variance) emit explicit NULLs on BOTH sides rather
    * than diverge (the Agreement.scala guard pattern). Ceiling note:
    * a_i = v_i div n_i truncates to 0 once n_i exceeds ~10⁶·var —
    * beyond that the guard turns t²/df NULL loudly on both engines
    * (same class of documented ceiling as RankStats spearman).
    */
  def welch(data: DataFrame, measure: Column, cohortA: Column,
            cohortB: Column): DataFrame = {
    data
      // filter FIRST with the raw cohort predicates: a CASE-WHEN-null
      // filter after the projection is not a pushable parquet
      // predicate, while `cohortA or cohortB` (e.g. an IN list) reaches
      // PushedFilters and prunes row groups at the scan — at 100 TB
      // that's the difference between reading 2/3 and 3/3 of the table
      .where(cohortA || cohortB)
      .select(measure.cast("long").as("x"),
        when(cohortA, 1L).when(cohortB, 2L).as("g"))
      .where(col("g").isNotNull)
      .groupBy()
      .agg(
        sum(when(col("g") === 1L, 1L).otherwise(0L)).as("n1"),
        sum(when(col("g") === 1L, col("x")).otherwise(0L)).as("s1"),
        sum(when(col("g") === 1L, col("x") * col("x")).otherwise(0L)).as("q1"),
        sum(when(col("g") === 2L, 1L).otherwise(0L)).as("n2"),
        sum(when(col("g") === 2L, col("x")).otherwise(0L)).as("s2"),
        sum(when(col("g") === 2L, col("x") * col("x")).otherwise(0L)).as("q2"))
      .withColumn("v1", expr(
        """CASE WHEN n1 > 1 THEN
          | (CAST(n1 AS DECIMAL(38,0)) * q1 - CAST(s1 AS DECIMAL(38,0)) * s1)
          |   * 1000000 div (CAST(n1 AS DECIMAL(38,0)) * (n1 - 1))
          | END""".stripMargin))
      .withColumn("v2", expr(
        """CASE WHEN n2 > 1 THEN
          | (CAST(n2 AS DECIMAL(38,0)) * q2 - CAST(s2 AS DECIMAL(38,0)) * s2)
          |   * 1000000 div (CAST(n2 AS DECIMAL(38,0)) * (n2 - 1))
          | END""".stripMargin))
      .withColumn("dm_ppm", expr(
        "s1 * 1000000 div greatest(n1, 1L) - s2 * 1000000 div greatest(n2, 1L)"))
      .withColumn("a1", expr("v1 div greatest(n1, 1L)"))
      .withColumn("a2", expr("v2 div greatest(n2, 1L)"))
      .select(col("n1"), col("n2"), col("s1"), col("s2"),
        expr("CAST(v1 AS BIGINT)").as("var1_x1e6"),
        expr("CAST(v2 AS BIGINT)").as("var2_x1e6"),
        col("dm_ppm"),
        expr(
          """CASE WHEN a1 IS NULL OR a2 IS NULL OR a1 + a2 = 0 THEN CAST(NULL AS BIGINT)
            | ELSE CAST(CAST(dm_ppm AS DECIMAL(38,0)) * dm_ppm
            |   div (a1 + a2) AS BIGINT) END""".stripMargin).as("t2_ppm"),
        expr(
          """CASE WHEN a1 IS NULL OR a2 IS NULL
            |   OR a1 * a1 div (n1 - 1) + a2 * a2 div (n2 - 1) = 0
            | THEN CAST(NULL AS BIGINT)
            | ELSE CAST((a1 + a2) * CAST(a1 + a2 AS DECIMAL(38,0)) * 1000000
            |   div (a1 * CAST(a1 AS DECIMAL(38,0)) div (n1 - 1)
            |      + a2 * CAST(a2 AS DECIMAL(38,0)) div (n2 - 1)) AS BIGINT) END"""
            .stripMargin).as("df_ppm"),
        // the pooled product n·v passes 2⁶³ near n ≈ 5·10¹⁰ at this
        // variance — ride decimal like the Agreement margins
        expr(
          """CASE WHEN v1 IS NULL OR v2 IS NULL
            |   OR (CAST(n1 - 1 AS DECIMAL(38,0)) * v1
            |     + CAST(n2 - 1 AS DECIMAL(38,0)) * v2) div (n1 + n2 - 2) = 0
            | THEN CAST(NULL AS BIGINT)
            | ELSE CAST(CAST(dm_ppm AS DECIMAL(38,0)) * dm_ppm
            |   div ((CAST(n1 - 1 AS DECIMAL(38,0)) * v1
            |     + CAST(n2 - 1 AS DECIMAL(38,0)) * v2) div (n1 + n2 - 2))
            |   AS BIGINT) END""".stripMargin).as("d2_ppm"))
  }

  val queries: Map[String, Q] = Map(
    // is the naive quantity-score calibrated against actual returns?
    // (it is not — that's the point of the diagram)
    "calibration_reliability" -> ((s, dir) => reliability(scored(s, dir))),

    // the two scalar summaries of the same question: support-weighted
    // calibration gap (ECE) and mean squared forecast error (Brier)
    "calibration_ece_brier" -> ((s, dir) => eceBrier(scored(s, dir))),

    // do returned ('R') and shipped-clean ('N') line items differ in
    // quantity beyond noise? Welch t² + Welch–Satterthwaite df +
    // Cohen's d², all exact-integer
    "welch_ttest" -> ((s, dir) =>
      welch(Tables.lineitem(s, dir), col("l_quantity"),
        col("l_returnflag") === "R", col("l_returnflag") === "N"))
  )

  val oracleSql: Map[String, String] = Map(
    "calibration_reliability" ->
      """WITH s AS (
        |  SELECT CAST(l_quantity AS BIGINT) * 19600 + 5000 AS score_ppm,
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        |  FROM lineitem),
        |b AS (
        |  SELECT least(score_ppm // 100000, 9) AS bin, count(*) AS n,
        |    sum(score_ppm) AS sum_score, sum(y) AS n_pos
        |  FROM s GROUP BY 1)
        |SELECT bin, n, CAST(n_pos AS BIGINT) AS n_pos,
        |  CAST(sum_score // n AS BIGINT) AS conf_ppm,
        |  CAST(n_pos * 1000000 // n AS BIGINT) AS acc_ppm,
        |  CAST(abs(sum_score // n - n_pos * 1000000 // n) AS BIGINT) AS gap_ppm
        |FROM b ORDER BY bin""".stripMargin,

    "calibration_ece_brier" ->
      """WITH s AS (
        |  SELECT CAST(l_quantity AS BIGINT) * 19600 + 5000 AS score_ppm,
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        |  FROM lineitem),
        |b AS (
        |  SELECT least(score_ppm // 100000, 9) AS bin, count(*) AS n,
        |    sum(score_ppm) AS sum_score, sum(y) AS n_pos,
        |    sum((CAST(score_ppm AS HUGEINT) - y * 1000000)
        |      * (CAST(score_ppm AS HUGEINT) - y * 1000000)) AS sq
        |  FROM s GROUP BY 1)
        |SELECT CAST(sum(n) AS BIGINT) AS n_total,
        |  CAST(sum(n * abs(sum_score // n - n_pos * 1000000 // n))
        |    // sum(n) AS BIGINT) AS ece_ppm,
        |  CAST(sum(sq) // sum(n) AS BIGINT) AS brier_x1e12
        |FROM b""".stripMargin,

    "welch_ttest" ->
      """WITH g AS (
        |  SELECT CAST(l_quantity AS BIGINT) AS x,
        |    CASE WHEN l_returnflag = 'R' THEN 1
        |         WHEN l_returnflag = 'N' THEN 2 END AS g
        |  FROM lineitem WHERE l_returnflag IN ('R', 'N')),
        |m AS (
        |  SELECT
        |    sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS n1,
        |    sum(CASE WHEN g = 1 THEN x ELSE 0 END) AS s1,
        |    sum(CASE WHEN g = 1 THEN x * x ELSE 0 END) AS q1,
        |    sum(CASE WHEN g = 2 THEN 1 ELSE 0 END) AS n2,
        |    sum(CASE WHEN g = 2 THEN x ELSE 0 END) AS s2,
        |    sum(CASE WHEN g = 2 THEN x * x ELSE 0 END) AS q2
        |  FROM g),
        |v AS (
        |  SELECT *,
        |    CASE WHEN n1 > 1 THEN
        |      (CAST(n1 AS HUGEINT) * q1 - CAST(s1 AS HUGEINT) * s1) * 1000000
        |        // (CAST(n1 AS HUGEINT) * (n1 - 1)) END AS v1,
        |    CASE WHEN n2 > 1 THEN
        |      (CAST(n2 AS HUGEINT) * q2 - CAST(s2 AS HUGEINT) * s2) * 1000000
        |        // (CAST(n2 AS HUGEINT) * (n2 - 1)) END AS v2,
        |    s1 * 1000000 // greatest(n1, 1) - s2 * 1000000 // greatest(n2, 1)
        |      AS dm_ppm
        |  FROM m),
        |a AS (
        |  SELECT *, v1 // greatest(n1, 1) AS a1, v2 // greatest(n2, 1) AS a2
        |  FROM v)
        |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
        |  CAST(s1 AS BIGINT) AS s1, CAST(s2 AS BIGINT) AS s2,
        |  CAST(v1 AS BIGINT) AS var1_x1e6, CAST(v2 AS BIGINT) AS var2_x1e6,
        |  CAST(dm_ppm AS BIGINT) AS dm_ppm,
        |  CASE WHEN a1 IS NULL OR a2 IS NULL OR a1 + a2 = 0 THEN NULL
        |    ELSE CAST(CAST(dm_ppm AS HUGEINT) * dm_ppm // (a1 + a2) AS BIGINT)
        |    END AS t2_ppm,
        |  CASE WHEN a1 IS NULL OR a2 IS NULL
        |      OR a1 * a1 // (n1 - 1) + a2 * a2 // (n2 - 1) = 0 THEN NULL
        |    ELSE CAST((a1 + a2) * CAST(a1 + a2 AS HUGEINT) * 1000000
        |      // (a1 * CAST(a1 AS HUGEINT) // (n1 - 1)
        |         + a2 * CAST(a2 AS HUGEINT) // (n2 - 1)) AS BIGINT)
        |    END AS df_ppm,
        |  CASE WHEN v1 IS NULL OR v2 IS NULL
        |      OR ((n1 - 1) * v1 + (n2 - 1) * v2) // (n1 + n2 - 2) = 0 THEN NULL
        |    ELSE CAST(CAST(dm_ppm AS HUGEINT) * dm_ppm
        |      // (((n1 - 1) * v1 + (n2 - 1) * v2) // (n1 + n2 - 2)) AS BIGINT)
        |    END AS d2_ppm
        |FROM a""".stripMargin
  )
}
