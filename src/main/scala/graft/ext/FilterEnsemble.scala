package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Filter-ensemble audit — the readout a corpus owner checks before
  * trusting ANY single quality filter: the engine now has three
  * independent keep/drop signals (the Gopher rule verdict
  * [[Quality.gopherRules]], the learned NB score [[NbFilter]], and the
  * contextual LM perplexity [[BackoffLm]] cut at the exact corpus
  * median), and this module measures where they agree, where they
  * fight, and what a majority vote would keep. Public pipelines stack
  * exactly these three filter classes (rules → classifier → LM
  * perplexity: CCNet, Gopher, Dolma); the ensemble matrix is the
  * data-card table that justifies the stack.
  *
  * All integer-exact: the vote frame is three doc-keyed equi-joins;
  * the matrix/keep finishers are bounded keyed aggregates (8 cells /
  * #sources rows); the pairwise Cohen's kappa is ONE global fold into
  * a 1-row cell table, fanned to 3 pair rows by an in-row explode —
  * ppm arithmetic cross-multiplied, with truncating integer division
  * (both engines truncate toward zero, machine-checked). Headroom:
  * kappa's numerator is agree·n·10⁶ ≤ n²·10⁶, so the BIGINT bound
  * holds to n ≈ 3.0M scored docs — beyond that drop to ×10³ scaling
  * (the [[Curriculum.dedupWeights]] ADVICE discipline, documented
  * rather than silently wrapped).
  *
  * 100 TB shape: each signal is its own probed chain; the joins are
  * doc-keyed equi-joins (co-partitioned after the first exchange); the
  * ppl threshold is ONE broadcast row (exact median, the
  * [[Curriculum.phaseManifest]] discipline). Nothing data-sized ever
  * sits on a single partition.
  */
object FilterEnsemble {

  /** Per-doc vote frame: (doc_id, source, n_chars, gopher, nb, ppl_ok).
    * gopher = rule pass; nb = learned score ≥ 0; ppl_ok = contextual
    * millibits/token ≤ the exact corpus median (the CCNet "head+middle"
    * half — low perplexity = model-like text).
    */
  def votes(docs: DataFrame): DataFrame = {
    val g = Quality.gopherRules(docs)
      .select(col("doc_id"), col("source"), col("n_words"),
        col("pass").as("gopher"))
    val nb = NbFilter.scored(docs, lit(true))
      .select(col("doc_id"), (col("score_mbits") >= 0).as("nb"))
    val ppl = BackoffLm.docPpl(docs)
      .select(col("doc_id"), col("mbits_per_tok"))
      // read TWICE (the median aggregate + the vote projection) — an
      // unpersisted lineage evaluated the whole backoff-LM chain twice
      // per ensemble face; released by the harness's per-query
      // clearCache (the registry contract)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val med = ppl.agg(percentile(col("mbits_per_tok"), lit(0.5)).as("med"))
    val pplVote = ppl.crossJoin(broadcast(med))
      .select(col("doc_id"),
        (col("mbits_per_tok").cast("double") <= col("med")).as("ppl_ok"))
    g.join(nb, "doc_id")
      .join(pplVote, "doc_id")
      .join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
      .select(col("doc_id"), col("source"), col("n_chars"), col("n_words"),
        col("gopher"), col("nb"), col("ppl_ok"))
  }

  /** Quality-tier token-budget allocation: documents tiered by their
    * ensemble VOTE COUNT (3 = unanimous keep … 0 = unanimous drop),
    * and a token budget of `pct`% of the corpus filled greedily from
    * the best tier down — the recipe planner that spends a compute
    * budget on the text the filter stack trusts most. Σ alloc = budget
    * EXACTLY (greedy min() over a budget ≤ total). The cumulative fill
    * is a window over ≤ 4 tier rows (the curriculum_pacing_schedule
    * kind-scoped shape); everything data-sized is the vote frame.
    */
  def tierBudget(docs: DataFrame, pct: Int = 50): DataFrame = {
    val tiers = votes(docs)
      .select(col("n_words"),
        (when(col("gopher"), 1).otherwise(0) + when(col("nb"), 1).otherwise(0)
          + when(col("ppl_ok"), 1).otherwise(0)).as("tier"))
      .groupBy(col("tier"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_words")).as("tier_tokens"))
    val tot = tiers.agg(sum(col("tier_tokens")).as("total_tokens"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("tier").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    tiers.crossJoin(broadcast(tot))
      .withColumn("cum_before", coalesce(sum(col("tier_tokens")).over(w), lit(0L)))
      .select(col("tier"), col("n_docs"), col("tier_tokens"),
        greatest(lit(0L), least(col("tier_tokens"),
          expr(s"total_tokens * $pct div 100") - col("cum_before")))
          .as("alloc_tokens"))
  }

  /** The 2×2×2 ensemble matrix: doc count and char mass per vote cell
    * — which documents all three filters would keep, which only one
    * would, and how much text each disagreement class holds.
    */
  def matrix(docs: DataFrame): DataFrame =
    votes(docs).groupBy(col("gopher"), col("nb"), col("ppl_ok"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("char_mass"))

  /** Majority-vote keep rates per source: what a 2-of-3 ensemble keeps,
    * beside the unanimous core — the actionable cut.
    */
  def majorityKeep(docs: DataFrame): DataFrame =
    votes(docs)
      .select(col("source"), col("n_chars"),
        (when(col("gopher"), 1).otherwise(0) + when(col("nb"), 1).otherwise(0)
          + when(col("ppl_ok"), 1).otherwise(0)).as("nv"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("nv") >= 2, 1L).otherwise(0L)).as("n_majority"),
        sum(when(col("nv") === 3, 1L).otherwise(0L)).as("n_unanimous"),
        sum(when(col("nv") >= 2, col("n_chars")).otherwise(0L)).as("kept_chars"))
      .select(col("source"), col("n_docs"), col("n_majority"), col("n_unanimous"),
        col("kept_chars"),
        expr("n_majority * 1000000L div n_docs").as("keep_ppm"))

  /** Pairwise Cohen's kappa between the three filters (ppm): observed
    * agreement, chance agreement from the marginals, and the chance-
    * corrected score — negative when two filters disagree more than
    * chance. kappa is defined 0 when chance agreement is exactly 1
    * (both filters constant), the documented degenerate case.
    */
  def filterKappa(docs: DataFrame): DataFrame = {
    val cells = votes(docs).agg(
      count(lit(1)).as("n"),
      sum(when(col("gopher"), 1L).otherwise(0L)).as("a_g"),
      sum(when(col("nb"), 1L).otherwise(0L)).as("a_n"),
      sum(when(col("ppl_ok"), 1L).otherwise(0L)).as("a_p"),
      sum(when(col("gopher") === col("nb"), 1L).otherwise(0L)).as("agree_gn"),
      sum(when(col("gopher") === col("ppl_ok"), 1L).otherwise(0L)).as("agree_gp"),
      sum(when(col("nb") === col("ppl_ok"), 1L).otherwise(0L)).as("agree_np"))
    cells.select(explode(array(
      struct(lit("gopher_nb").as("pair"), col("n"),
        col("a_g").as("a1"), col("a_n").as("a2"), col("agree_gn").as("agree")),
      struct(lit("gopher_ppl").as("pair"), col("n"),
        col("a_g").as("a1"), col("a_p").as("a2"), col("agree_gp").as("agree")),
      struct(lit("nb_ppl").as("pair"), col("n"),
        col("a_n").as("a1"), col("a_p").as("a2"), col("agree_np").as("agree"))
    )).as("x"))
      .select(col("x.pair").as("pair"), col("x.n").as("n_docs"),
        col("x.agree").as("agree"), col("x.a1").as("a1"), col("x.a2").as("a2"))
      .select(col("pair"), col("n_docs"), col("agree"),
        expr("agree * 1000000L div n_docs").as("po_ppm"),
        expr("(a1 * a2 + (n_docs - a1) * (n_docs - a2)) * 1000000L " +
          "div (n_docs * n_docs)").as("pe_ppm"),
        expr("CASE WHEN n_docs * n_docs = a1 * a2 + (n_docs - a1) * (n_docs - a2) " +
          "THEN CAST(0 AS BIGINT) " +
          "ELSE (agree * n_docs - (a1 * a2 + (n_docs - a1) * (n_docs - a2))) " +
          "* 1000000L div (n_docs * n_docs - (a1 * a2 + (n_docs - a1) * (n_docs - a2))) END")
          .as("kappa_ppm"))
  }

  val queries: Map[String, Q] = Map(
    "quality_ensemble_matrix" -> ((s, dir) =>
      matrix(Tables.documents(s, dir))),
    "quality_ensemble_keep" -> ((s, dir) =>
      majorityKeep(Tables.documents(s, dir))),
    "quality_filter_kappa" -> ((s, dir) =>
      filterKappa(Tables.documents(s, dir))),
    "mixture_quality_tiers" -> ((s, dir) =>
      tierBudget(Tables.documents(s, dir)))
  )

  // ---- oracle side: the three signal chains composed in one WITH —
  // the gopher/NB CTEs (flags/feat/model/ftot/prior/w/score) and the
  // backoff chain (toks/pairs/train/.../docppl) share no names.
  private def voteCtes: String =
    s"""${NbFilter.scoreCtes("TRUE")},
       |${BackoffLm.perDocCtes},
       |med AS (SELECT quantile_cont(mbits_per_tok, 0.5) AS med FROM docppl),
       |votes AS MATERIALIZED (
       |  SELECT s.doc_id, s.source, d.n_chars, fl.n_words,
       |    s.pass AS gopher, s.score_mbits >= 0 AS nb,
       |    CAST(dp.mbits_per_tok AS DOUBLE) <= m.med AS ppl_ok
       |  FROM score s
       |  JOIN docppl dp ON dp.doc_id = s.doc_id
       |  JOIN documents d ON d.doc_id = s.doc_id
       |  JOIN flags fl ON fl.doc_id = s.doc_id
       |  CROSS JOIN med m)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "quality_ensemble_matrix" ->
      s"""WITH $voteCtes
         |SELECT gopher, nb, ppl_ok, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS char_mass
         |FROM votes GROUP BY gopher, nb, ppl_ok""".stripMargin,
    "quality_ensemble_keep" ->
      s"""WITH $voteCtes,
         |nv AS (
         |  SELECT source, n_chars,
         |    (CASE WHEN gopher THEN 1 ELSE 0 END + CASE WHEN nb THEN 1 ELSE 0 END
         |      + CASE WHEN ppl_ok THEN 1 ELSE 0 END) AS nv
         |  FROM votes)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN nv >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_majority,
         |  CAST(sum(CASE WHEN nv = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_unanimous,
         |  CAST(sum(CASE WHEN nv >= 2 THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars,
         |  CAST(sum(CASE WHEN nv >= 2 THEN 1 ELSE 0 END) * 1000000
         |    // count(*) AS BIGINT) AS keep_ppm
         |FROM nv GROUP BY source""".stripMargin,
    "mixture_quality_tiers" ->
      s"""WITH $voteCtes,
         |tiers AS (
         |  SELECT (CASE WHEN gopher THEN 1 ELSE 0 END + CASE WHEN nb THEN 1 ELSE 0 END
         |      + CASE WHEN ppl_ok THEN 1 ELSE 0 END) AS tier,
         |    CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(n_words) AS BIGINT) AS tier_tokens
         |  FROM votes GROUP BY 1),
         |tot AS (SELECT CAST(sum(tier_tokens) AS BIGINT) AS total_tokens FROM tiers)
         |SELECT tier, n_docs, tier_tokens,
         |  greatest(CAST(0 AS BIGINT), least(tier_tokens,
         |    total_tokens * 50 // 100
         |      - CAST(coalesce(sum(tier_tokens) OVER (ORDER BY tier DESC
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)))
         |    AS alloc_tokens
         |FROM tiers, tot""".stripMargin,
    "quality_filter_kappa" ->
      s"""WITH $voteCtes,
         |cells AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN gopher THEN 1 ELSE 0 END) AS BIGINT) AS a_g,
         |    CAST(sum(CASE WHEN nb THEN 1 ELSE 0 END) AS BIGINT) AS a_n,
         |    CAST(sum(CASE WHEN ppl_ok THEN 1 ELSE 0 END) AS BIGINT) AS a_p,
         |    CAST(sum(CASE WHEN gopher = nb THEN 1 ELSE 0 END) AS BIGINT) AS agree_gn,
         |    CAST(sum(CASE WHEN gopher = ppl_ok THEN 1 ELSE 0 END) AS BIGINT) AS agree_gp,
         |    CAST(sum(CASE WHEN nb = ppl_ok THEN 1 ELSE 0 END) AS BIGINT) AS agree_np
         |  FROM votes),
         |pairs3 AS (
         |  SELECT 'gopher_nb' AS pair, n, a_g AS a1, a_n AS a2, agree_gn AS agree FROM cells
         |  UNION ALL
         |  SELECT 'gopher_ppl', n, a_g, a_p, agree_gp FROM cells
         |  UNION ALL
         |  SELECT 'nb_ppl', n, a_n, a_p, agree_np FROM cells)
         |SELECT pair, n AS n_docs, agree,
         |  CAST(agree * 1000000 // n AS BIGINT) AS po_ppm,
         |  CAST((a1 * a2 + (n - a1) * (n - a2)) * 1000000 // (n * n) AS BIGINT) AS pe_ppm,
         |  CAST(CASE WHEN n * n = a1 * a2 + (n - a1) * (n - a2) THEN 0
         |    ELSE (agree * n - (a1 * a2 + (n - a1) * (n - a2))) * 1000000
         |      // (n * n - (a1 * a2 + (n - a1) * (n - a2))) END AS BIGINT) AS kappa_ppm
         |FROM pairs3""".stripMargin
  )
}
