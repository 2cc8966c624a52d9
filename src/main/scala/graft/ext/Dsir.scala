package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023):
  * pick pool documents whose hashed n-gram profile looks like a small
  * trusted TARGET corpus, by per-document importance weights under a
  * bag-of-hashed-bigrams bucket model. The public recipe behind
  * "select web text that looks like Wikipedia" — the distributional
  * complement to [[NbFilter]]'s learned quality filter (which needs
  * labels) and [[BackoffLm]]'s perplexity bands (which need a trained
  * LM): DSIR needs only the two corpora themselves.
  *
  * Model (all integer-exact so DuckDB replays it bit for bit):
  * word bigrams hash into `Buckets` buckets via the md5 convention
  * ([[Sampling]]'s `conv(substring(md5(x),1,6),16,10)` ↔ DuckDB
  * `('0x' || substr(md5(x),1,6))::BIGINT`, 24 bits, mod `Buckets`).
  * With Laplace +1 smoothing, a bucket's log importance ratio in
  * MILLIBITS ([[NbFilter.mlog2]] discipline) is
  *
  *   weight_mb[b] = mlog2(n_t[b]+1) − mlog2(N_t+B)
  *                − mlog2(n_r[b]+1) + mlog2(N_r+B)
  *
  * and a document's log weight is the sum over its bigram OCCURRENCES.
  * Target = the corpus's `en` documents (the trusted-distribution
  * proxy, the CCNet casting); raw = the whole pool, so every scored
  * bigram bucket is observed on the raw side and the scoring join is
  * complete by construction.
  *
  * 100 TB shape: the model is ONE bucket-keyed aggregate over a single
  * evaluation of the bigram stream — the raw count and the target
  * count fold together as a conditional sum, since the lang evidence
  * rides the row (in-row transform + explode, the [[BackoffLm]] pair
  * discipline — no window, no self-join, no stream-sized doc_id join;
  * map-side combine collapses the exchange to partitions ×
  * `Buckets` rows), and the model table
  * is `Buckets`-bounded — broadcast to the scorer, so scoring is a
  * stateless projection + one doc-keyed aggregate. Selection runs the
  * exact global rank through the two-phase
  * [[graft.ops.Offsets.globalPosition]] idiom (range repartition +
  * broadcast bucket offsets — no single-partition window), with the
  * corpus count broadcast as ONE row. Headroom: a doc's |score| is
  * ≤ n_bigrams · mlog2-range ≈ n_bigrams · 10⁵ millibits — ~9·10¹⁰
  * bigrams per document before the BIGINT bound.
  */
object Dsir {

  /** Hashed-feature alphabet size. 2¹⁰ keeps the bucket table
    * broadcast-sized at any corpus scale (the model is alphabet-bounded
    * by construction — corpus growth changes counts, never width).
    */
  private val Buckets = 1024L

  /** Selection quota: keep the top `QuotaPct`% of the pool by weight. */
  private val QuotaPct = 25

  /** (doc_id, source, lang, b) — one row per bigram occurrence, bucket
    * (and the target-membership evidence) in the row. In-row transform
    * over the token array (the [[BackoffLm]] guard: docs with < 2
    * tokens are filtered before `sequence`, which would otherwise
    * count DOWN, and re-added by the finishers' LEFT joins).
    */
  private def bigramBuckets(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"), col("lang"),
        TextAnalysis.tokens(col("text")).as("ts"))
      .where(size(col("ts")) >= 2)
      .select(col("doc_id"), col("source"), col("lang"),
        explode(expr(
          "transform(sequence(1, size(ts) - 1), " +
            "i -> concat(ts[i - 1], ' ', ts[i]))")).as("bg"))
      .select(col("doc_id"), col("source"), col("lang"),
        (conv(substring(md5(col("bg")), 1, 6), 16, 10).cast("long")
          % lit(Buckets)).as("b"))

  /** The trained model: per observed bucket, target / raw occurrence
    * counts and the smoothed log importance weight in millibits.
    * `Buckets`-bounded (≤ 1024 rows) — the broadcast side of scoring.
    * Both counts fold in ONE bucket-keyed aggregate over a single
    * evaluation of the bigram stream (the target count is a
    * conditional sum — the lang evidence rides the row, so no second
    * stream pass and no stream-sized doc_id join exist anywhere).
    */
  def bucketWeights(docs: DataFrame): DataFrame = {
    val counts = bigramBuckets(docs)
      .groupBy(col("b"))
      .agg(count(lit(1)).as("n_raw"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_target"))
      // ≤1024 rows, referenced TWICE (the totals aggregate + the weight
      // projection) — unpersisted, each reference re-ran the whole
      // bigram tokenize/md5/explode corpus pass
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = counts.agg(sum(col("n_raw")).as("nr_tot"),
      sum(col("n_target")).as("nt_tot"))
    counts.crossJoin(broadcast(totals))
      .select(col("b"), col("n_target"), col("n_raw"),
        (NbFilter.mlog2("n_target + 1") -
          NbFilter.mlog2(s"nt_tot + $Buckets") -
          NbFilter.mlog2("n_raw + 1") +
          NbFilter.mlog2(s"nr_tot + $Buckets")).cast("long").as("weight_mb"))
  }

  /** Per-document importance scores: (doc_id, source, n_feats,
    * logw_mb). Docs with < 2 tokens carry no evidence and score 0 —
    * LEFT-joined back so the table always covers the corpus (the
    * [[Curriculum.docScores]] discipline).
    */
  def docScores(docs: DataFrame): DataFrame = {
    val w = bucketWeights(docs).select(col("b"), col("weight_mb"))
    val scored = bigramBuckets(docs)
      .join(broadcast(w), "b")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"), sum(col("weight_mb")).as("logw_mb"))
    docs.select(col("doc_id"), col("source"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("logw_mb"), lit(0L)).as("logw_mb"))
  }

  /** Per-source importance readout over bigram OCCURRENCES: (source,
    * n_feats, logw_mb, mb_per_feat) — which sources look target-like
    * before any per-doc cut. Aggregating the feature stream (not docs)
    * keeps the face a single stateless projection + keyed aggregate,
    * which is exactly what lets the STREAMING intake monitor maintain
    * it in complete mode against the same oracle (`streaming_dsir_
    * monitor`): the model side is static, the stream side never needs
    * a second aggregation level. Sources with no 2-token documents
    * carry no feature evidence and are absent (documented, matching
    * the stream semantics). Both engines truncate integer division
    * toward zero, so the possibly-negative mean is portable.
    */
  def sourceScoresAgainst(docs: DataFrame, weights: DataFrame): DataFrame =
    bigramBuckets(docs)
      .join(broadcast(weights.select(col("b"), col("weight_mb"))), "b")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_feats"), sum(col("weight_mb")).as("logw_mb"))
      .withColumn("mb_per_feat", expr("logw_mb div n_feats"))

  def sourceScores(docs: DataFrame): DataFrame =
    sourceScoresAgainst(docs, bucketWeights(docs))

  /** Apply DSIR at the quota: keep exactly the top `QuotaPct`% of the
    * pool by (importance desc, doc_id asc) and report the kept set per
    * source — raw docs, kept docs, kept char mass, and the kept rate in
    * ppm. The exact rank rides [[graft.ops.Offsets.globalPosition]];
    * the pool count is broadcast as ONE row.
    */
  def selectQuota(docs: DataFrame): DataFrame = {
    // doc-sized, 4 narrow columns; read three times (the pool count,
    // the range-partitioner's sampling pass, and the position join)
    val sc = docScores(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nAll = sc.agg(count(lit(1)).as("n_all"))
    val kept = graft.ops.Offsets.globalPosition(
        sc, Seq(col("logw_mb").desc, col("doc_id")), "pos")
      .crossJoin(broadcast(nAll))
      .where(col("pos") < expr(s"n_all * $QuotaPct div 100"))
    kept.join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("kept_chars"))
      .join(docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs")),
        Seq("source"), "right")
      .select(col("source"), col("n_docs"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_chars"), lit(0L)).as("kept_chars"))
      .withColumn("kept_ppm", expr("n_kept * 1000000L div n_docs"))
  }

  /** Per-doc DSIR keep decision at the quota — (doc_id, dsir_keep),
    * the flag form of [[selectQuota]]'s cut for agreement audits.
    */
  def keepFlags(docs: DataFrame): DataFrame = {
    // persisted for the same three-reader reason as [[selectQuota]]
    val sc = docScores(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nAll = sc.agg(count(lit(1)).as("n_all"))
    graft.ops.Offsets.globalPosition(
        sc, Seq(col("logw_mb").desc, col("doc_id")), "pos")
      .crossJoin(broadcast(nAll))
      .select(col("doc_id"),
        (col("pos") < expr(s"n_all * $QuotaPct div 100")).as("dsir_keep"))
  }

  /** Do the two selection philosophies agree? DSIR's distributional
    * "looks like the target" cut vs the [[NbFilter]] learned quality
    * cut, as ONE row: the 2×2 cell counts and Cohen's kappa in
    * truncating ppm (the [[FilterEnsemble.filterKappa]] discipline —
    * kappa ≡ 0 at the pe = 1 degenerate case; headroom n ≤ ~3M scored
    * docs before n² meets the ×10⁶). The two keep sets measure
    * DIFFERENT things by design — low kappa here is the argument for
    * running both stages, not a defect in either.
    */
  def vsNbAgreement(docs: DataFrame): DataFrame = {
    val d = keepFlags(docs)
    val nb = NbFilter.scored(docs, lit(true))
      .select(col("doc_id"), (col("score_mbits") >= 0L).as("nb_keep"))
    d.join(nb, "doc_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("dsir_keep") && col("nb_keep"), 1L).otherwise(0L)).as("n_both"),
        sum(when(col("dsir_keep") && !col("nb_keep"), 1L).otherwise(0L)).as("n_dsir_only"),
        sum(when(!col("dsir_keep") && col("nb_keep"), 1L).otherwise(0L)).as("n_nb_only"),
        sum(when(!col("dsir_keep") && !col("nb_keep"), 1L).otherwise(0L)).as("n_neither"))
      .select(col("n_docs"), col("n_both"), col("n_dsir_only"),
        col("n_nb_only"), col("n_neither"),
        expr("n_both + n_dsir_only").as("a1"),
        expr("n_both + n_nb_only").as("a2"),
        expr("n_both + n_neither").as("agree"))
      .select(col("n_docs"), col("n_both"), col("n_dsir_only"),
        col("n_nb_only"), col("n_neither"),
        expr("CASE WHEN n_docs * n_docs = a1 * a2 + (n_docs - a1) * (n_docs - a2) " +
          "THEN CAST(0 AS BIGINT) " +
          "ELSE (agree * n_docs - (a1 * a2 + (n_docs - a1) * (n_docs - a2))) " +
          "* 1000000L div (n_docs * n_docs - (a1 * a2 + (n_docs - a1) * (n_docs - a2))) END")
          .as("kappa_ppm"))
  }

  val queries: Map[String, Q] = Map(
    "dsir_bucket_weights" -> ((s, dir) =>
      bucketWeights(Tables.documents(s, dir))),
    "dsir_doc_scores" -> ((s, dir) =>
      docScores(Tables.documents(s, dir))),
    "dsir_select_quota" -> ((s, dir) =>
      selectQuota(Tables.documents(s, dir))),
    "dsir_source_scores" -> ((s, dir) =>
      sourceScores(Tables.documents(s, dir))),
    "dsir_vs_nb_agreement" -> ((s, dir) =>
      vsNbAgreement(Tables.documents(s, dir)))
  )

  // ---- oracle side: the identical integer program in DuckDB ----

  private def mlog2Duck(x: String): String = NbFilter.mlog2DuckSql(x)

  /** Shared CTE chain: bigram buckets → raw/target counts → weights. */
  private val modelCtes: String =
    s"""toks AS (
       |  SELECT doc_id, source,
       |    list_filter(string_split_regex(text, '\\s+'), x -> x != '') AS ts
       |  FROM documents),
       |bg AS MATERIALIZED (
       |  SELECT doc_id, source,
       |    CAST(('0x' || substr(md5(ts[i] || ' ' || ts[i + 1]), 1, 6)) AS BIGINT)
       |      % $Buckets AS b
       |  FROM toks, LATERAL unnest(range(1, len(ts))) AS r(i)
       |  WHERE len(ts) >= 2),
       |raw AS (SELECT b, CAST(count(*) AS BIGINT) AS n_raw FROM bg GROUP BY b),
       |tgt AS (
       |  SELECT bg.b, CAST(count(*) AS BIGINT) AS n_target
       |  FROM bg JOIN documents d ON d.doc_id = bg.doc_id
       |  WHERE d.lang = 'en' GROUP BY bg.b),
       |tot AS (
       |  SELECT (SELECT sum(n_raw) FROM raw) AS nr_tot,
       |         (SELECT sum(n_target) FROM tgt) AS nt_tot),
       |wts AS (
       |  SELECT raw.b, CAST(coalesce(tgt.n_target, 0) AS BIGINT) AS n_target,
       |    raw.n_raw,
       |    CAST(${mlog2Duck("coalesce(tgt.n_target, 0) + 1")}
       |       - ${mlog2Duck(s"tot.nt_tot + $Buckets")}
       |       - ${mlog2Duck("raw.n_raw + 1")}
       |       + ${mlog2Duck(s"tot.nr_tot + $Buckets")} AS BIGINT) AS weight_mb
       |  FROM raw LEFT JOIN tgt ON tgt.b = raw.b CROSS JOIN tot)""".stripMargin

  private val scoreCtes: String =
    s"""$modelCtes,
       |sc AS (
       |  SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
       |    CAST(sum(wts.weight_mb) AS BIGINT) AS logw_mb
       |  FROM bg JOIN wts ON wts.b = bg.b GROUP BY bg.doc_id),
       |score AS (
       |  SELECT d.doc_id, d.source,
       |    CAST(coalesce(sc.n_feats, 0) AS BIGINT) AS n_feats,
       |    CAST(coalesce(sc.logw_mb, 0) AS BIGINT) AS logw_mb
       |  FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "dsir_bucket_weights" ->
      s"WITH $modelCtes\nSELECT b, n_target, n_raw, weight_mb FROM wts",
    "dsir_doc_scores" ->
      s"WITH $scoreCtes\nSELECT doc_id, source, n_feats, logw_mb FROM score",
    "dsir_source_scores" ->
      s"""WITH $modelCtes
         |SELECT bg.source, CAST(count(*) AS BIGINT) AS n_feats,
         |  CAST(sum(wts.weight_mb) AS BIGINT) AS logw_mb,
         |  CAST(sum(wts.weight_mb) // count(*) AS BIGINT) AS mb_per_feat
         |FROM bg JOIN wts ON wts.b = bg.b
         |GROUP BY bg.source""".stripMargin,
    // the DSIR chain re-stated with d-prefixed CTE names so it composes
    // beside NbFilter.scoreCtes (whose flags/feat/.../score names it
    // must not shadow); kappa per the FilterEnsemble discipline
    "dsir_vs_nb_agreement" ->
      s"""WITH dtoks AS (
         |  SELECT doc_id, source,
         |    list_filter(string_split_regex(text, '\\s+'), x -> x != '') AS ts
         |  FROM documents),
         |dbg AS MATERIALIZED (
         |  SELECT doc_id, source,
         |    CAST(('0x' || substr(md5(ts[i] || ' ' || ts[i + 1]), 1, 6)) AS BIGINT)
         |      % $Buckets AS b
         |  FROM dtoks, LATERAL unnest(range(1, len(ts))) AS r(i)
         |  WHERE len(ts) >= 2),
         |draw AS (SELECT b, CAST(count(*) AS BIGINT) AS n_raw FROM dbg GROUP BY b),
         |dtgt AS (
         |  SELECT dbg.b, CAST(count(*) AS BIGINT) AS n_target
         |  FROM dbg JOIN documents d ON d.doc_id = dbg.doc_id
         |  WHERE d.lang = 'en' GROUP BY dbg.b),
         |dtot AS (
         |  SELECT (SELECT sum(n_raw) FROM draw) AS nr_tot,
         |         (SELECT sum(n_target) FROM dtgt) AS nt_tot),
         |dwts AS (
         |  SELECT draw.b,
         |    CAST(${mlog2Duck("coalesce(dtgt.n_target, 0) + 1")}
         |       - ${mlog2Duck(s"dtot.nt_tot + $Buckets")}
         |       - ${mlog2Duck("draw.n_raw + 1")}
         |       + ${mlog2Duck(s"dtot.nr_tot + $Buckets")} AS BIGINT) AS weight_mb
         |  FROM draw LEFT JOIN dtgt ON dtgt.b = draw.b CROSS JOIN dtot),
         |dsc AS (
         |  SELECT dbg.doc_id, CAST(sum(dwts.weight_mb) AS BIGINT) AS logw_mb
         |  FROM dbg JOIN dwts ON dwts.b = dbg.b GROUP BY dbg.doc_id),
         |dscore AS (
         |  SELECT d.doc_id, CAST(coalesce(dsc.logw_mb, 0) AS BIGINT) AS logw_mb
         |  FROM documents d LEFT JOIN dsc ON dsc.doc_id = d.doc_id),
         |dn AS (SELECT CAST(count(*) AS BIGINT) AS n_all FROM dscore),
         |dkeep AS (
         |  SELECT doc_id,
         |    row_number() OVER (ORDER BY logw_mb DESC, doc_id)
         |      <= (SELECT n_all * $QuotaPct // 100 FROM dn) AS dsir_keep
         |  FROM dscore),
         |${NbFilter.scoreCtes("TRUE")},
         |cells AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(CASE WHEN k.dsir_keep AND s.score_mbits >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
         |    CAST(sum(CASE WHEN k.dsir_keep AND s.score_mbits < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_dsir_only,
         |    CAST(sum(CASE WHEN NOT k.dsir_keep AND s.score_mbits >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nb_only,
         |    CAST(sum(CASE WHEN NOT k.dsir_keep AND s.score_mbits < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neither
         |  FROM dkeep k JOIN score s ON s.doc_id = k.doc_id)
         |SELECT n_docs, n_both, n_dsir_only, n_nb_only, n_neither,
         |  CAST(CASE WHEN n_docs * n_docs =
         |      (n_both + n_dsir_only) * (n_both + n_nb_only)
         |        + (n_docs - n_both - n_dsir_only) * (n_docs - n_both - n_nb_only)
         |    THEN 0
         |    ELSE ((n_both + n_neither) * n_docs
         |        - ((n_both + n_dsir_only) * (n_both + n_nb_only)
         |           + (n_docs - n_both - n_dsir_only) * (n_docs - n_both - n_nb_only)))
         |      * 1000000
         |      // (n_docs * n_docs
         |        - ((n_both + n_dsir_only) * (n_both + n_nb_only)
         |           + (n_docs - n_both - n_dsir_only) * (n_docs - n_both - n_nb_only)))
         |  END AS BIGINT) AS kappa_ppm
         |FROM cells""".stripMargin,

    "dsir_select_quota" ->
      s"""WITH $scoreCtes,
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n_all FROM score),
         |r AS (
         |  SELECT s.doc_id, s.source,
         |    row_number() OVER (ORDER BY logw_mb DESC, doc_id) AS rn
         |  FROM score s),
         |kept AS (
         |  SELECT r.doc_id, r.source FROM r, n
         |  WHERE r.rn <= n.n_all * $QuotaPct // 100),
         |per AS (
         |  SELECT k.source, CAST(count(*) AS BIGINT) AS n_kept,
         |    CAST(sum(d.n_chars) AS BIGINT) AS kept_chars
         |  FROM kept k JOIN documents d ON d.doc_id = k.doc_id
         |  GROUP BY k.source)
         |SELECT a.source, CAST(a.n_docs AS BIGINT) AS n_docs,
         |  CAST(coalesce(per.n_kept, 0) AS BIGINT) AS n_kept,
         |  CAST(coalesce(per.kept_chars, 0) AS BIGINT) AS kept_chars,
         |  CAST(coalesce(per.n_kept, 0) * 1000000 // a.n_docs AS BIGINT) AS kept_ppm
         |FROM (SELECT source, count(*) AS n_docs FROM documents GROUP BY source) a
         |LEFT JOIN per ON per.source = a.source""".stripMargin
  )
}
