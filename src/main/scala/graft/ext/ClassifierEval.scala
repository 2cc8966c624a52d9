package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multiclass classifier evaluation — the per-class readout a labeling
  * or distillation pipeline runs on every model revision: confusion
  * margins, precision / recall / F1 per class, and the full
  * precision-recall curve by score threshold.
  *
  * House exactness style (Agreement/Calibration precedent): every rate
  * is an integer ppm via one truncating `div`, F1 folds to the single
  * rational 2·tp / (n_pred + n_true) so it needs no nested division,
  * and zero margins are guarded with greatest(·,1) identically on both
  * engines.
  *
  * 100 TB shape: `multiclassPrf` is ONE map-side-combined
  * confusion-matrix aggregate (|classes|² rows) whose margins and
  * diagonal are re-aggregated from that bounded frame — the fact table
  * is scanned exactly once, and everything after the first aggregate
  * is arithmetic on frames the size of the label alphabet.
  * `prCurve` aggregates to one row per distinct score (the score
  * alphabet, 50 values here) and runs its cumulative sums in a window
  * over that BOUNDED frame — the unbounded-window-over-data
  * anti-pattern never appears; a continuous score would be binned
  * first (equidepth_bins exists for exactly that).
  */
object ClassifierEval {

  /** Per-class (class, n_true, n_pred, tp, precision_ppm, recall_ppm,
    * f1_ppm) for a true-label column vs a predicted-label column.
    */
  def multiclassPrf(data: DataFrame, trueCol: Column, predCol: Column): DataFrame = {
    // ONE fact-table scan: the |classes|² confusion-matrix aggregate
    // (map-side combined), then margins derived from that bounded
    // frame. The diagonal rides the true-margin aggregate as a
    // CONDITIONAL SUM, not a filter — a `where(t === p)` on group keys
    // gets pushed below the aggregate by Catalyst, which changes the
    // scan subtree and defeats ReuseExchange (measured: a second full
    // fact scan); with the condition inside the aggregate both margin
    // branches hang off the SAME (t,p) exchange and the plan shows one
    // FileScan + one ReusedExchange.
    val cm = data.select(trueCol.as("t"), predCol.as("p"))
      .groupBy("t", "p").agg(count(lit(1)).as("c"))
    val byTrue = cm.groupBy(col("t").as("class"))
      .agg(sum(col("c")).as("n_true"),
        sum(when(col("t") === col("p"), col("c")).otherwise(0L)).as("tp"))
    val byPred = cm.groupBy(col("p").as("class"))
      .agg(sum(col("c")).as("n_pred"))
    byTrue.join(byPred, Seq("class"), "full_outer")
      .select(col("class"),
        coalesce(col("n_true"), lit(0L)).as("n_true"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("tp"), lit(0L)).as("tp"))
      .select(col("class"), col("n_true"), col("n_pred"), col("tp"),
        expr("tp * 1000000 div greatest(n_pred, 1L)").as("precision_ppm"),
        expr("tp * 1000000 div greatest(n_true, 1L)").as("recall_ppm"),
        // F1 = 2PR/(P+R) = 2·tp/(n_pred + n_true): one exact rational
        expr("2 * tp * 1000000 div greatest(n_pred + n_true, 1L)").as("f1_ppm"))
      .orderBy("class")
  }

  /** Precision-recall curve over an INTEGER score: one row per distinct
    * score threshold t with the counts and rates of the classifier
    * "positive iff score ≥ t". The cumulative sums run score-descending
    * over the distinct-score frame (bounded by the score alphabet).
    */
  def prCurve(data: DataFrame, scoreCol: Column, labelCol: Column): DataFrame = {
    val byScore = data
      .select(scoreCol.cast("long").as("threshold"),
        labelCol.cast("long").as("y"))
      .groupBy("threshold")
      .agg(sum(col("y")).as("_pos"), sum(lit(1L) - col("y")).as("_neg"))
    val w = Window.orderBy(col("threshold").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byScore
      .withColumn("tp", sum(col("_pos")).over(w))
      .withColumn("fp", sum(col("_neg")).over(w))
      .withColumn("_npos", sum(col("_pos")).over(Window.partitionBy()))
      .select(col("threshold"), col("tp"), col("fp"),
        expr("tp * 1000000 div greatest(tp + fp, 1L)").as("precision_ppm"),
        expr("tp * 1000000 div greatest(_npos, 1L)").as("recall_ppm"))
      .orderBy(col("threshold").desc)
  }

  /** Matthews correlation coefficient for a binary classifier — the
    * single-number confusion summary that stays honest under class
    * imbalance (accuracy and F1 both saturate on a 99:1 split; MCC
    * does not). Emitted without the square root: `mcc_num =
    * tp·tn − fp·fn` carries the exact sign, and
    * `mcc2_x1e6 = num²·10⁶ div ((tp+fp)(tp+fn)(tn+fp)(tn+fn))` is the
    * exact squared magnitude — the consumer's MCC is
    * sign(num)·√(mcc2/10⁶), its one float op. A zero margin makes MCC
    * undefined: pinned NULL on both engines (the kappa guard).
    * Products ride decimal(38,0); n⁴·10⁶ passes 38 digits near 5e7
    * rows — document-level evaluation never gets near it, and past it
    * the margins themselves need re-bucketing anyway.
    *
    * 100 TB shape: ONE map-side-combined aggregate produces the four
    * cells; everything after is arithmetic on one row.
    */
  def matthewsCorr(data: DataFrame, labelCol: Column, predCol: Column): DataFrame = {
    data.select(labelCol.cast("int").as("y"), predCol.cast("int").as("p"))
      .agg(sum(expr("y * p")).as("tp"),
        sum(expr("(1 - y) * p")).as("fp"),
        sum(expr("y * (1 - p)")).as("fn"),
        sum(expr("(1 - y) * (1 - p)")).as("tn"))
      .withColumn("_den", expr(
        """CAST(tp + fp AS DECIMAL(38,0)) * (tp + fn)
          | * (tn + fp) * (tn + fn)""".stripMargin))
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        expr("CAST(CAST(tp AS DECIMAL(38,0)) * tn - CAST(fp AS DECIMAL(38,0)) * fn AS BIGINT)")
          .as("mcc_num"),
        expr("""CASE WHEN _den = 0 THEN CAST(NULL AS BIGINT)
               ELSE CAST((CAST(tp AS DECIMAL(38,0)) * tn - CAST(fp AS DECIMAL(38,0)) * fn)
                 * (CAST(tp AS DECIMAL(38,0)) * tn - CAST(fp AS DECIMAL(38,0)) * fn)
                 * 1000000 div _den AS BIGINT) END""").as("mcc2_x1e6"))
  }

  /** Deterministic demo predictor: quantity terciles → returnflag
    * class (a signal with no real predictive power — the diagonal of
    * the confusion matrix quantifies exactly how little).
    */
  private val predFromQuantity: Column =
    when(col("l_quantity") <= 17, "A")
      .when(col("l_quantity") <= 34, "N")
      .otherwise("R")

  val queries: Map[String, Q] = Map(
    // per-class precision/recall/F1 of the naive quantity-tercile
    // predictor against the actual returnflag
    "multiclass_prf" -> ((s, dir) =>
      multiclassPrf(Tables.lineitem(s, dir),
        col("l_returnflag"), predFromQuantity)),

    // the full PR curve of "predict returned when quantity ≥ t"
    "pr_curve_by_threshold" -> ((s, dir) =>
      prCurve(Tables.lineitem(s, dir), col("l_quantity"),
        (col("l_returnflag") === "R").cast("int"))),

    // the binary collapse of the same predictor: "returned iff
    // quantity in the top tercile" vs the actual R flag, summarized by
    // the imbalance-honest MCC
    "matthews_corr" -> ((s, dir) =>
      matthewsCorr(Tables.lineitem(s, dir),
        (col("l_returnflag") === "R").cast("int"),
        (col("l_quantity") >= 35).cast("int")))
  )

  val oracleSql: Map[String, String] = Map(
    "multiclass_prf" ->
      """WITH tp AS (
        |  SELECT l_returnflag AS t,
        |    CASE WHEN l_quantity <= 17 THEN 'A'
        |         WHEN l_quantity <= 34 THEN 'N' ELSE 'R' END AS p
        |  FROM lineitem),
        |bt AS (SELECT t AS class, count(*) AS n_true FROM tp GROUP BY 1),
        |bp AS (SELECT p AS class, count(*) AS n_pred FROM tp GROUP BY 1),
        |dg AS (SELECT t AS class, count(*) AS tp FROM tp WHERE t = p GROUP BY 1),
        |m AS (
        |  SELECT coalesce(bt.class, bp.class, dg.class) AS class,
        |    coalesce(n_true, 0) AS n_true, coalesce(n_pred, 0) AS n_pred,
        |    coalesce(tp, 0) AS tp
        |  FROM bt FULL OUTER JOIN bp USING (class)
        |    FULL OUTER JOIN dg USING (class))
        |SELECT class, CAST(n_true AS BIGINT) AS n_true,
        |  CAST(n_pred AS BIGINT) AS n_pred, CAST(tp AS BIGINT) AS tp,
        |  CAST(tp * 1000000 // greatest(n_pred, 1) AS BIGINT) AS precision_ppm,
        |  CAST(tp * 1000000 // greatest(n_true, 1) AS BIGINT) AS recall_ppm,
        |  CAST(2 * tp * 1000000 // greatest(n_pred + n_true, 1) AS BIGINT)
        |    AS f1_ppm
        |FROM m ORDER BY class""".stripMargin,

    "pr_curve_by_threshold" ->
      """WITH s AS (
        |  SELECT CAST(l_quantity AS BIGINT) AS threshold,
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        |  FROM lineitem),
        |g AS (
        |  SELECT threshold, sum(y) AS pos, sum(1 - y) AS neg
        |  FROM s GROUP BY 1),
        |c AS (
        |  SELECT threshold,
        |    sum(pos) OVER (ORDER BY threshold DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
        |    sum(neg) OVER (ORDER BY threshold DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp,
        |    sum(pos) OVER () AS npos
        |  FROM g)
        |SELECT threshold, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
        |  CAST(tp * 1000000 // greatest(tp + fp, 1) AS BIGINT) AS precision_ppm,
        |  CAST(tp * 1000000 // greatest(npos, 1) AS BIGINT) AS recall_ppm
        |FROM c ORDER BY threshold DESC""".stripMargin,

    "matthews_corr" ->
      """WITH s AS (
        |  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
        |    CASE WHEN l_quantity >= 35 THEN 1 ELSE 0 END AS p
        |  FROM lineitem),
        |m AS (
        |  SELECT CAST(sum(y * p) AS BIGINT) AS tp,
        |    CAST(sum((1 - y) * p) AS BIGINT) AS fp,
        |    CAST(sum(y * (1 - p)) AS BIGINT) AS fn,
        |    CAST(sum((1 - y) * (1 - p)) AS BIGINT) AS tn
        |  FROM s),
        |d AS (
        |  SELECT *, CAST(tp + fp AS HUGEINT) * (tp + fn)
        |      * (tn + fp) * (tn + fn) AS den
        |  FROM m)
        |SELECT tp, fp, fn, tn,
        |  CAST(CAST(tp AS HUGEINT) * tn - CAST(fp AS HUGEINT) * fn AS BIGINT)
        |    AS mcc_num,
        |  CASE WHEN den = 0 THEN NULL
        |  ELSE CAST((CAST(tp AS HUGEINT) * tn - CAST(fp AS HUGEINT) * fn)
        |      * (CAST(tp AS HUGEINT) * tn - CAST(fp AS HUGEINT) * fn)
        |      * 1000000 // den AS BIGINT) END AS mcc2_x1e6
        |FROM d""".stripMargin
  )
}
