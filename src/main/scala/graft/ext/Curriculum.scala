package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-run planning faces: the curriculum manifest (which docs
  * train FIRST) and dedup-aware mixture weights (how much each doc
  * should be sampled given its duplicate family) — the two decisions a
  * pretraining recipe makes AFTER curation and BEFORE the tokenizer
  * run, both pure derivations over signals the engine already computes
  * exactly.
  *
  * 100 TB shape: the curriculum face is the [[Quality]] surprisal chain
  * (token-keyed model join + doc-keyed aggregate) plus ONE 1-row
  * threshold broadcast — phase assignment is a stateless comparison,
  * never a global sort (the [[Stats.equiDepthBins]] discipline: exact
  * percentile thresholds move to the data, ntile's all-data-one-
  * partition window never appears). The mixture face is two hash-keyed
  * aggregates and one hash-keyed equi-join — family sizes ride the
  * content-hash key, the exact-dedup shuffle discipline.
  */
object Curriculum {

  /** Per-doc difficulty scores: (doc_id, source, n_tokens, rarity) —
    * CCNet's perplexity ordering with a HIGHER-RESOLUTION integer-exact
    * stand-in than the floor-log2 surprisal bits: mean inverse corpus
    * token frequency, rarity = Σ(10⁹ div n_w) div n_tokens. The
    * floor-log2 score collapses to one value on a flat-vocabulary
    * corpus (measured: 75% of gate docs at exactly 5000 milli-bits),
    * which would degenerate the phase bands; the inverse-frequency
    * score separates rare-token density at full integer resolution.
    * Headroom: a term is ≤ 10⁹, so the per-doc sum holds to ~9·10⁹
    * tokens per document. Same plan as the surprisal chain: one
    * token-keyed model join + a doc-keyed aggregate.
    *
    * Zero-token (empty / whitespace-only) documents carry no rarity
    * evidence and score rarity 0, landing in the easiest phase — the
    * docs side is LEFT-joined so phase doc counts always sum to the
    * corpus size (round-13 ADVICE: the old explode+inner-join silently
    * dropped token-less docs from the manifest).
    */
  private def docScores(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"),
      explode(TextAnalysis.tokens(col("text"))).as("w"))
    val model = tok.groupBy(col("w")).agg(count(lit(1)).as("n_w"))
    val perDoc = tok.join(model, "w")
      .select(col("doc_id"), expr("1000000000L div n_w").as("r"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("r")).as("r_sum"))
      .select(col("doc_id"), col("n_tokens"),
        expr("r_sum div greatest(n_tokens, 1L)").as("rarity"))
    docs.select(col("doc_id"), col("source"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("rarity"), lit(0L)).as("rarity"))
  }

  /** Easy→hard curriculum manifest over `phases` equi-depth rarity
    * bands: per phase, the doc count, token budget, score band, and
    * source spread — the readout a staged pretraining run schedules
    * from (phase 0 = most templated/easy, last = the rare-token tail).
    * Thresholds are exact percentiles broadcast as ONE row; assignment
    * is a per-row comparison fold, never a global sort.
    */
  def phaseManifest(docs: DataFrame, phases: Int): DataFrame = {
    require(phases >= 2, s"phases must be >= 2, got $phases")
    val scored = docScores(docs)
    val ps = (1 until phases).map(i => lit(i.toDouble / phases))
    val bnds = scored.agg(percentile(col("rarity"), array(ps: _*)).as("bnds"))
    scored.crossJoin(broadcast(bnds))
      .select(col("source"), col("n_tokens"), col("rarity"), col("bnds"))
      .select(col("source"), col("n_tokens"), col("rarity"),
        aggregate(col("bnds"), lit(0),
          (acc, b) => acc + when(col("rarity").cast("double") > b, 1).otherwise(0))
          .as("phase"))
      .groupBy(col("phase"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("token_budget"),
        min(col("rarity")).as("rarity_lo"),
        max(col("rarity")).as("rarity_hi"),
        countDistinct(col("source")).as("n_sources"))
  }

  /** Dedup-aware mixture weights: every doc in an exact-duplicate
    * family of size k samples at weight 1/k (ppm), so a 10k-copy
    * boilerplate page contributes ONE document's worth of gradient —
    * the soft alternative to dropping duplicates outright. Per-source
    * readout: raw docs, distinct families, effective docs (Σ 1/k in
    * ppm — the deduplicated mass), and the dup-inflation of the raw
    * count over the effective mass.
    *
    * Inflation is reported in ×10³ fixed point: the numerator is
    * n_docs·10⁹, so the BIGINT bound holds to ~9.2·10⁹ raw docs per
    * source (≈ 40+ TB of text per source at typical doc sizes) —
    * round-13 ADVICE replaced the ×10⁶ form, whose n_docs·10¹²
    * numerator silently wrapped past ~9.2M docs.
    */
  def dedupWeights(docs: DataFrame): DataFrame = {
    val keyed = docs.select(col("doc_id"), col("source"),
      md5(to_binary(col("text"), lit("utf-8"))).as("h"))
    val fams = keyed.groupBy(col("h")).agg(count(lit(1)).as("fam_size"))
    keyed.join(fams, "h")
      .select(col("source"), col("h"),
        expr("1000000L div fam_size").as("w_ppm"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("h")).as("n_families"),
        sum(col("w_ppm")).as("effective_docs_ppm"))
      .select(col("source"), col("n_docs"), col("n_families"),
        col("effective_docs_ppm"),
        // effective is in ppm, so inflation×1e3 = n_docs·10⁹ div eff_ppm
        expr("n_docs * 1000000000L div greatest(effective_docs_ppm, 1L)")
          .as("inflation_x1e3"))
  }

  /** Pacing schedule: the phase manifest turned into step ranges —
    * given a per-step token budget, each phase trains for
    * ⌈token_budget / step_tokens⌉ steps, scheduled consecutively in
    * phase order (easy → hard). The cumulative fold is a window over
    * ≤ `phases` rows (the manifest itself), the batch_length_buckets
    * bounded-window convention — nothing data-sized appears after the
    * manifest's aggregate.
    */
  def pacingSchedule(docs: DataFrame, phases: Int, stepTokens: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("phase"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    phaseManifest(docs, phases)
      .select(col("phase"), col("n_docs"), col("token_budget"),
        expr(s"(token_budget + ${stepTokens - 1}L) div ${stepTokens}L").as("n_steps"))
      .withColumn("start_step", coalesce(sum(col("n_steps")).over(w), lit(0L)))
      .withColumn("end_step", col("start_step") + col("n_steps") - 1)
  }

  val queries: Map[String, Q] = Map(
    "curriculum_phase_manifest" -> ((s, dir) =>
      phaseManifest(Tables.documents(s, dir), phases = 4)),
    "mixture_dedup_weights" -> ((s, dir) =>
      dedupWeights(Tables.documents(s, dir))),
    // 4 phases, 10k tokens per optimizer step
    "curriculum_pacing_schedule" -> ((s, dir) =>
      pacingSchedule(Tables.documents(s, dir), phases = 4, stepTokens = 10000L))
  )

  // shared manifest CTE chain (interpolated before the enclosing
  // stripMargin — continuation lines must not start with `||`)
  private val manifestSql =
    """tok AS (
      |  SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'),
      |    x -> x != '')) AS w
      |  FROM documents),
      |cnt AS (SELECT w, count(*) AS n_w FROM tok GROUP BY w),
      |perdoc AS (
      |  SELECT tok.doc_id, count(*) AS n_tokens,
      |    CAST(sum(1000000000 // cnt.n_w) AS BIGINT)
      |      // greatest(count(*), 1) AS rarity
      |  FROM tok JOIN cnt ON cnt.w = tok.w
      |  GROUP BY tok.doc_id),
      |scored AS (
      |  SELECT d.source,
      |    CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens,
      |    CAST(coalesce(p.rarity, 0) AS BIGINT) AS rarity
      |  FROM documents d
      |  LEFT JOIN perdoc p ON d.doc_id = p.doc_id),
      |b AS (SELECT quantile_cont(rarity, [0.25, 0.5, 0.75]) AS bnds FROM scored),
      |manifest AS (
      |  SELECT CAST(len(list_filter(b.bnds, x -> CAST(s.rarity AS DOUBLE) > x)) AS INTEGER) AS phase,
      |    count(*) AS n_docs,
      |    CAST(sum(s.n_tokens) AS BIGINT) AS token_budget,
      |    min(s.rarity) AS rarity_lo, max(s.rarity) AS rarity_hi,
      |    CAST(count(DISTINCT s.source) AS BIGINT) AS n_sources
      |  FROM scored s CROSS JOIN b
      |  GROUP BY 1)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "curriculum_pacing_schedule" ->
      s"""WITH $manifestSql,
         |steps AS (
         |  SELECT phase, n_docs, token_budget,
         |    CAST((token_budget + 9999) // 10000 AS BIGINT) AS n_steps
         |  FROM manifest)
         |SELECT phase, n_docs, token_budget, n_steps,
         |  CAST(coalesce(sum(n_steps) OVER (ORDER BY phase
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_step,
         |  CAST(coalesce(sum(n_steps) OVER (ORDER BY phase
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + n_steps - 1 AS BIGINT)
         |    AS end_step
         |FROM steps""".stripMargin,
    "curriculum_phase_manifest" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'),
        |    x -> x != '')) AS w
        |  FROM documents),
        |cnt AS (SELECT w, count(*) AS n_w FROM tok GROUP BY w),
        |perdoc AS (
        |  SELECT tok.doc_id, count(*) AS n_tokens,
        |    CAST(sum(1000000000 // cnt.n_w) AS BIGINT)
        |      // greatest(count(*), 1) AS rarity
        |  FROM tok JOIN cnt ON cnt.w = tok.w
        |  GROUP BY tok.doc_id),
        |scored AS (
        |  SELECT d.source,
        |    CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens,
        |    CAST(coalesce(p.rarity, 0) AS BIGINT) AS rarity
        |  FROM documents d
        |  LEFT JOIN perdoc p ON d.doc_id = p.doc_id),
        |b AS (SELECT quantile_cont(rarity, [0.25, 0.5, 0.75]) AS bnds FROM scored)
        |SELECT CAST(len(list_filter(b.bnds, x -> CAST(s.rarity AS DOUBLE) > x)) AS INTEGER) AS phase,
        |  count(*) AS n_docs,
        |  CAST(sum(s.n_tokens) AS BIGINT) AS token_budget,
        |  min(s.rarity) AS rarity_lo, max(s.rarity) AS rarity_hi,
        |  CAST(count(DISTINCT s.source) AS BIGINT) AS n_sources
        |FROM scored s CROSS JOIN b
        |GROUP BY 1""".stripMargin,
    "mixture_dedup_weights" ->
      """WITH keyed AS (SELECT doc_id, source, md5(text) AS h FROM documents),
        |fams AS (SELECT h, count(*) AS fam_size FROM keyed GROUP BY h)
        |SELECT k.source, count(*) AS n_docs,
        |  CAST(count(DISTINCT k.h) AS BIGINT) AS n_families,
        |  CAST(sum(1000000 // f.fam_size) AS BIGINT) AS effective_docs_ppm,
        |  CAST(count(*) * 1000000000 // greatest(sum(1000000 // f.fam_size), 1) AS BIGINT)
        |    AS inflation_x1e3
        |FROM keyed k JOIN fams f ON f.h = k.h
        |GROUP BY k.source""".stripMargin
  )
}
