package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Group-fairness audit — the bias screen a curation pipeline runs
  * before a filter or classifier ships: does an acceptance rule treat
  * the corpus's groups (here: document sources) evenly?
  *
  *  - '''Demographic parity''': per-group acceptance rate, plus the
  *    max−min rate gap ("Feldman et al. 2015 disparate impact" is this
  *    gap's ratio form; the difference form keeps integer exactness).
  *  - '''Equalized odds''' (Hardt et al. 2016): per-group TPR and FPR
  *    against a ground-truth label; a rule is equalized-odds-fair when
  *    both are constant across groups, so the readout is the two gaps.
  *
  * House exactness style: rates are integer ppm via one truncating
  * `div` with greatest(·,1) guards; the gap rows come from a 1-row
  * aggregate cross-joined back (the established bounded-crossJoin
  * pattern — never a window over data).
  *
  * 100 TB shape: ONE map-side-combined aggregate on the group key
  * (|groups| rows); the gap is a second aggregate over that bounded
  * frame. Nothing else touches the data.
  */
object Fairness {

  /** Per-group (group, n, n_accept, accept_ppm) plus the corpus-wide
    * max−min acceptance gap replicated on each row (bounded cross
    * join), so one frame carries both the diagram and the verdict.
    */
  def parityGap(data: DataFrame, groupCol: Column, acceptCol: Column): DataFrame = {
    val rates = data
      .select(groupCol.as("grp"), acceptCol.cast("long").as("a"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n"), sum(col("a")).as("n_accept"))
      .select(col("grp"), col("n"), col("n_accept"),
        expr("n_accept * 1000000 div greatest(n, 1L)").as("accept_ppm"))
    val gap = rates.agg(
      (max(col("accept_ppm")) - min(col("accept_ppm"))).as("parity_gap_ppm"))
    rates.crossJoin(gap).orderBy("grp")
  }

  /** Per-group confusion rates against a ground-truth label:
    * (group, n_pos, n_neg, tpr_ppm, fpr_ppm) plus the corpus-wide
    * max−min TPR and FPR gaps — both must be ~0 for equalized odds.
    */
  def equalizedOdds(data: DataFrame, groupCol: Column, labelCol: Column,
                    predCol: Column): DataFrame = {
    val rates = data
      .select(groupCol.as("grp"), labelCol.cast("long").as("y"),
        predCol.cast("long").as("p"))
      .groupBy("grp")
      .agg(sum(col("y")).as("n_pos"),
        sum(lit(1L) - col("y")).as("n_neg"),
        sum(col("y") * col("p")).as("_tp"),
        sum((lit(1L) - col("y")) * col("p")).as("_fp"))
      .select(col("grp"), col("n_pos"), col("n_neg"),
        expr("_tp * 1000000 div greatest(n_pos, 1L)").as("tpr_ppm"),
        expr("_fp * 1000000 div greatest(n_neg, 1L)").as("fpr_ppm"))
    val gaps = rates.agg(
      (max(col("tpr_ppm")) - min(col("tpr_ppm"))).as("tpr_gap_ppm"),
      (max(col("fpr_ppm")) - min(col("fpr_ppm"))).as("fpr_gap_ppm"))
    rates.crossJoin(gaps).orderBy("grp")
  }

  val queries: Map[String, Q] = Map(
    // does the "substantial document" acceptance rule (chars ≥ 500)
    // accept evenly across sources?
    "fairness_parity_gap" -> ((s, dir) =>
      parityGap(Tables.documents(s, dir), col("source"),
        (col("n_chars") >= 500).cast("int"))),

    // treating "long by tokens" as ground truth and "long by chars" as
    // the shipped rule (the kappa raters): are TPR/FPR flat across
    // sources?
    "fairness_equalized_odds" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("source"), col("n_chars"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
      equalizedOdds(docs, col("source"),
        (col("n_tokens") >= 80).cast("int"), (col("n_chars") >= 500).cast("int"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "fairness_parity_gap" ->
      """WITH r AS (
        |  SELECT source AS grp, count(*) AS n,
        |    sum(CASE WHEN n_chars >= 500 THEN 1 ELSE 0 END) AS n_accept
        |  FROM documents GROUP BY 1),
        |p AS (
        |  SELECT grp, CAST(n AS BIGINT) AS n, CAST(n_accept AS BIGINT) AS n_accept,
        |    CAST(n_accept * 1000000 // greatest(n, 1) AS BIGINT) AS accept_ppm
        |  FROM r)
        |SELECT grp, n, n_accept, accept_ppm,
        |  (SELECT CAST(max(accept_ppm) - min(accept_ppm) AS BIGINT) FROM p)
        |    AS parity_gap_ppm
        |FROM p ORDER BY grp""".stripMargin,

    "fairness_equalized_odds" ->
      """WITH d AS (
        |  SELECT source AS grp,
        |    CASE WHEN len(list_filter(string_split_regex(text, '\s+'),
        |      x -> x != '')) >= 80 THEN 1 ELSE 0 END AS y,
        |    CASE WHEN n_chars >= 500 THEN 1 ELSE 0 END AS p
        |  FROM documents),
        |r AS (
        |  SELECT grp, sum(y) AS n_pos, sum(1 - y) AS n_neg,
        |    sum(y * p) AS tp, sum((1 - y) * p) AS fp
        |  FROM d GROUP BY 1),
        |q AS (
        |  SELECT grp, CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
        |    CAST(tp * 1000000 // greatest(n_pos, 1) AS BIGINT) AS tpr_ppm,
        |    CAST(fp * 1000000 // greatest(n_neg, 1) AS BIGINT) AS fpr_ppm
        |  FROM r)
        |SELECT grp, n_pos, n_neg, tpr_ppm, fpr_ppm,
        |  (SELECT CAST(max(tpr_ppm) - min(tpr_ppm) AS BIGINT) FROM q) AS tpr_gap_ppm,
        |  (SELECT CAST(max(fpr_ppm) - min(fpr_ppm) AS BIGINT) FROM q) AS fpr_gap_ppm
        |FROM q ORDER BY grp""".stripMargin
  )
}
