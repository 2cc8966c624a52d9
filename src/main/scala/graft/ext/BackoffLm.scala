package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stupid-backoff bigram LM perplexity filtering — the CCNet recipe
  * proper (Wenzek et al. 2020 train a KenLM on trusted text, score every
  * document, and cut the corpus into head/middle/tail perplexity bands
  * per language). The engine's earlier faces approximate the score
  * without context ([[Quality]] unigram surprisal) or measure bigram
  * MASS rather than a likelihood ([[Quality.bigramNovelty]]); this
  * module is the contextual model itself: a bigram LM with stupid
  * backoff (Brants et al. 2007) trained on the even-doc_id split and
  * scored over the whole corpus, all in the integer-exact MILLIBIT
  * log2 discipline of [[NbFilter]] so the DuckDB oracle reproduces
  * every score bit for bit.
  *
  * Scoring convention (documented, deterministic): every token v with
  * context u (position 1 takes the `chr(1)` sentinel context, the <s>
  * convention, and sentinel bigrams are trained like any other, so
  * there is no special first-token branch anywhere):
  *   - bigram hit (n_uv > 0 in train):   mlog2(n_ctx) − mlog2(n_uv)
  *   - unigram backoff (v in train):     1000 + mlog2(N) − mlog2(n_v)
  *   - OOV (v unseen in train):          2000 + mlog2(N)
  * The +1000 millibit terms are the backoff penalty α = 1/2 (one exact
  * bit per backoff level) — integer-exact where Brants' α = 0.4 would
  * force floats. Costs are ≥ 0 because n_uv ≤ n_ctx and n_v ≤ N.
  *
  * 100 TB shape: pair construction is an in-row transform + explode
  * (stateless — no window, no self-join; the context is carried inside
  * the row); the trained model is three keyed aggregates over the pair
  * stream (map-side combine collapses each exchange to partitions ×
  * alphabet rows) plus one vocabulary-keyed equi-join to attach context
  * totals; scoring is two token-keyed equi-joins (Catalyst broadcasts
  * the model while it is small, shuffled-hash/SMJ when a web-scale
  * vocabulary outgrows the threshold — the [[Quality.unigramModel]]
  * stats-driven discipline) and a doc-keyed aggregate. The scalar N
  * is collected driver-side (1 row — the k-means-centroid convention),
  * so no cross join reaches the plan. The CCNet band assignment uses
  * exact per-language percentile thresholds broadcast as #langs rows
  * ([[Curriculum.phaseManifest]]'s discipline) — never a global sort.
  */
object BackoffLm {

  /** Sentinel context for position 1 — chr(1), a control character no
    * clean token stream contains (a literal U+0001 inside a token would
    * alias it; text_normalize strips control bytes upstream, and the
    * convention is documented rather than hidden).
    */
  private val Sentinel = "\u0001"

  private def mlog2(x: String): Column = NbFilter.mlog2(x)
  private def mlog2Duck(x: String): String = NbFilter.mlog2DuckSql(x)

  /** (doc_id, source, u, v) pair stream: one row per token, context in
    * the row. In-row `transform(sequence(1, n), …)` — the
    * [[Quality.bigrams]] guard style (sequence(1, 0) would count DOWN,
    * so token-less docs are filtered before the transform and re-added
    * by the finishers' LEFT joins).
    */
  def pairs(docs: DataFrame): DataFrame = {
    val t = TextAnalysis.tokens(col("text"))
    docs.select(col("doc_id"), col("source"), t.as("t"))
      .where(size(col("t")) >= 1)
      .select(col("doc_id"), col("source"),
        explode(transform(sequence(lit(1), size(col("t"))),
          i => struct(
            when(i === 1, lit(Sentinel)).otherwise(element_at(col("t"), i - 1)).as("u"),
            element_at(col("t"), i).as("v")))).as("p"))
      .select(col("doc_id"), col("source"), col("p.u").as("u"), col("p.v").as("v"))
  }

  /** The trained model: (bgm, uni, n) — bigram rows (u, v, n_uv, n_ctx),
    * unigram rows (v, n_v), and the scalar train-token count N. Both
    * frames are PERSISTED (vocabulary-sized, referenced once per
    * scoring join but their lineage shares the train pair scan — the
    * round-14 MM/EM lineage-recompute lesson), and N is collected
    * driver-side so the score path carries it as a literal.
    */
  def train(docs: DataFrame): (DataFrame, DataFrame, Long) = {
    val tp = pairs(docs).where(col("doc_id") % 2 === 0)
    // ONE corpus-sized pass: the (u, v) pair counts. Every other model
    // quantity is EXACTLY derivable from bg because the pair stream has
    // one row per token: n_ctx(u) = Σ_v n_uv, n_v = Σ_u n_uv, N = Σ n_uv
    // — so ctx/uni/N ride the VOCABULARY-sized bg table instead of
    // re-evaluating the tokenize+explode chain (the old form ran the
    // corpus pass FOUR times: the bg/ctx/uni aggregates plus the N
    // collect; guide §2.3 aggregate-early + the §5 recompute
    // discipline). Identical counts, bit for bit.
    val bg = tp.groupBy(col("u"), col("v")).agg(count(lit(1)).as("n_uv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ctx = bg.groupBy(col("u")).agg(sum(col("n_uv")).as("n_ctx"))
    val bgm = bg.join(ctx, "u")
      .select(col("u"), col("v"), col("n_uv"), col("n_ctx"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val uni = bg.groupBy(col("v")).agg(sum(col("n_uv")).as("n_v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the collect doubles as bg's materializer; coalesce keeps the old
    // count()-over-empty semantics (0, not null) for degenerate corpora
    val n = bg.agg(coalesce(sum(col("n_uv")), lit(0L))).collect()(0).getLong(0)
    (bgm, uni, n)
  }

  /** STATELESS scoring path over a (doc_id, source, u, v) pair stream:
    * two model equi-joins + a per-row CASE — no per-doc state, so the
    * identical code scores a Structured Streaming pair stream
    * (stream-static joins; streaming_backoff_monitor) and the batch
    * faces alike.
    */
  def costsOf(p: DataFrame, bgm: DataFrame, uni: DataFrame, n: Long): DataFrame = {
    require(n >= 1, "backoff LM needs at least one training token")
    p.join(bgm.withColumnRenamed("u", "_bu").withColumnRenamed("v", "_bv"),
      col("u") === col("_bu") && col("v") === col("_bv"), "left")
      .join(uni.withColumnRenamed("v", "_uv"), col("v") === col("_uv"), "left")
      .select(col("doc_id"), col("source"),
        when(col("n_uv").isNotNull, lit("hit"))
          .when(col("n_v").isNotNull, lit("backoff"))
          .otherwise(lit("oov")).as("kind"),
        when(col("n_uv").isNotNull, mlog2("n_ctx") - mlog2("n_uv"))
          .when(col("n_v").isNotNull, lit(1000L) + lit(mlog2Long(n)) - mlog2("n_v"))
          .otherwise(lit(2000L) + lit(mlog2Long(n))).cast("long").as("mbits"))
  }

  /** Per-token millibit costs over ALL docs under the even-split model:
    * (doc_id, source, kind, mbits) with kind ∈ {hit, backoff, oov}.
    */
  def tokenCosts(docs: DataFrame): DataFrame = {
    val (bgm, uni, n) = train(docs)
    costsOf(pairs(docs), bgm, uni, n)
  }

  /** Scala-side mlog2 for the driver-collected scalar N. */
  private def mlog2Long(x: Long): Long = {
    val msb = 63 - java.lang.Long.numberOfLeadingZeros(x)
    msb * 1000L + (x - (1L << msb)) * 1000L / (1L << msb)
  }

  /** Per-doc scores (doc_id, source, n_tok, total_mbits, mbits_per_tok)
    * — LEFT-joined from the docs side so token-less documents appear
    * with zeros (the round-13 Curriculum ADVICE lesson).
    */
  def docPpl(docs: DataFrame): DataFrame = {
    val perDoc = tokenCosts(docs).groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"), sum(col("mbits")).as("total_mbits"))
    docs.select(col("doc_id"), col("source"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        coalesce(col("n_tok"), lit(0L)).as("n_tok"),
        coalesce(col("total_mbits"), lit(0L)).as("total_mbits"),
        when(coalesce(col("n_tok"), lit(0L)) > 0,
          expr("total_mbits div n_tok")).otherwise(lit(0L))
          .as("mbits_per_tok"))
  }

  /** Per-source model-coverage audit: how much of each source's token
    * stream the trained model explains at each backoff level, plus the
    * mean millibit cost — the readout that says whether the "trusted
    * split" model actually transfers to a source before anyone cuts on
    * its perplexity. #sources rows.
    */
  def coverage(docs: DataFrame): DataFrame =
    tokenCosts(docs).groupBy(col("source"))
      .agg(count(lit(1)).as("n_tok"),
        sum(when(col("kind") === "hit", 1L).otherwise(0L)).as("n_hit"),
        sum(when(col("kind") === "backoff", 1L).otherwise(0L)).as("n_backoff"),
        sum(when(col("kind") === "oov", 1L).otherwise(0L)).as("n_oov"),
        sum(col("mbits")).as("total_mbits"))
      .select(col("source"), col("n_tok"), col("n_hit"), col("n_backoff"),
        col("n_oov"),
        expr("n_oov * 1000000L div n_tok").as("oov_ppm"),
        expr("total_mbits div n_tok").as("mbits_per_tok"))

  /** CCNet's head/middle/tail cut: per (lang, band) doc counts, char
    * mass, and the score range, where the band thresholds are the EXACT
    * per-language tertiles of mbits_per_tok (quantile_cont semantics on
    * both engines). Thresholds are #langs rows broadcast back — the
    * [[Curriculum.phaseManifest]] discipline; assignment is a per-row
    * comparison fold, never a global sort. band 0 = head (most
    * model-like), 2 = tail.
    */
  def pplBands(docs: DataFrame): DataFrame = {
    val scored = docPpl(docs)
      .join(docs.select(col("doc_id"), col("lang"), col("n_chars")), "doc_id")
    val bnds = scored.groupBy(col("lang"))
      .agg(percentile(col("mbits_per_tok"),
        array(lit(1.0 / 3), lit(2.0 / 3))).as("bnds"))
    scored.join(broadcast(bnds), "lang")
      .select(col("lang"), col("n_chars"), col("mbits_per_tok"),
        aggregate(col("bnds"), lit(0),
          (acc, b) => acc + when(col("mbits_per_tok").cast("double") > b, 1)
            .otherwise(0)).as("band"))
      .groupBy(col("lang"), col("band"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("char_mass"),
        min(col("mbits_per_tok")).as("mbits_lo"),
        max(col("mbits_per_tok")).as("mbits_hi"))
  }

  val queries: Map[String, Q] = Map(
    // per-doc contextual perplexity proxy — the score CCNet cuts on
    "lm_backoff_doc_ppl" -> ((s, dir) =>
      docPpl(Tables.documents(s, dir))),

    // per-source hit/backoff/OOV composition — does the model transfer
    "lm_backoff_coverage" -> ((s, dir) =>
      coverage(Tables.documents(s, dir))),

    // the head/middle/tail corpus cut, per language
    "lm_backoff_ppl_bands" -> ((s, dir) =>
      pplBands(Tables.documents(s, dir)))
  )

  // ---- oracle side: the identical chain in DuckDB SQL. `pairs` and
  // `train` are referenced more than once → AS MATERIALIZED per the
  // round-14 CTE convention (DuckDB re-inlines by default).
  private def costCtes: String =
    s"""toks AS (
       |  SELECT doc_id, source,
       |    list_filter(string_split_regex(text, '\\s+'), x -> x != '') AS t
       |  FROM documents),
       |pairs AS MATERIALIZED (
       |  SELECT doc_id, source, p.u AS u, p.v AS v FROM (
       |    SELECT doc_id, source,
       |      unnest(list_transform(generate_series(1, len(t)), i ->
       |        struct_pack(u := CASE WHEN i = 1 THEN chr(1) ELSE t[i-1] END,
       |                    v := t[i]))) AS p
       |    FROM toks WHERE len(t) >= 1)),
       |train AS MATERIALIZED (SELECT u, v FROM pairs WHERE doc_id % 2 = 0),
       |bg AS (SELECT u, v, CAST(count(*) AS BIGINT) AS n_uv
       |       FROM train GROUP BY u, v),
       |ctx AS (SELECT u, CAST(count(*) AS BIGINT) AS n_ctx
       |        FROM train GROUP BY u),
       |uni AS (SELECT v, CAST(count(*) AS BIGINT) AS n_v
       |        FROM train GROUP BY v),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM train),
       |cost AS (
       |  SELECT p.doc_id, p.source,
       |    CASE WHEN b.n_uv IS NOT NULL THEN 'hit'
       |         WHEN un.n_v IS NOT NULL THEN 'backoff'
       |         ELSE 'oov' END AS kind,
       |    CAST(CASE
       |      WHEN b.n_uv IS NOT NULL
       |        THEN ${mlog2Duck("c.n_ctx")} - ${mlog2Duck("b.n_uv")}
       |      WHEN un.n_v IS NOT NULL
       |        THEN 1000 + ${mlog2Duck("nn.n")} - ${mlog2Duck("un.n_v")}
       |      ELSE 2000 + ${mlog2Duck("nn.n")} END AS BIGINT) AS mbits
       |  FROM pairs p
       |  LEFT JOIN bg b ON b.u = p.u AND b.v = p.v
       |  LEFT JOIN ctx c ON c.u = p.u
       |  LEFT JOIN uni un ON un.v = p.v
       |  CROSS JOIN nn)""".stripMargin

  private[ext] def perDocCtes: String =
    s"""$costCtes,
       |perdoc AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
       |    CAST(sum(mbits) AS BIGINT) AS total_mbits
       |  FROM cost GROUP BY doc_id),
       |docppl AS (
       |  SELECT d.doc_id, d.source,
       |    CAST(coalesce(p.n_tok, 0) AS BIGINT) AS n_tok,
       |    CAST(coalesce(p.total_mbits, 0) AS BIGINT) AS total_mbits,
       |    CAST(CASE WHEN coalesce(p.n_tok, 0) > 0
       |      THEN p.total_mbits // p.n_tok ELSE 0 END AS BIGINT) AS mbits_per_tok
       |  FROM documents d LEFT JOIN perdoc p ON d.doc_id = p.doc_id)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "lm_backoff_doc_ppl" ->
      s"""WITH $perDocCtes
         |SELECT doc_id, source, n_tok, total_mbits, mbits_per_tok
         |FROM docppl""".stripMargin,
    "lm_backoff_coverage" ->
      s"""WITH $costCtes
         |SELECT source, CAST(count(*) AS BIGINT) AS n_tok,
         |  CAST(sum(CASE WHEN kind = 'hit' THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
         |  CAST(sum(CASE WHEN kind = 'backoff' THEN 1 ELSE 0 END) AS BIGINT) AS n_backoff,
         |  CAST(sum(CASE WHEN kind = 'oov' THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
         |  CAST(sum(CASE WHEN kind = 'oov' THEN 1 ELSE 0 END) * 1000000
         |    // count(*) AS BIGINT) AS oov_ppm,
         |  CAST(sum(mbits) // count(*) AS BIGINT) AS mbits_per_tok
         |FROM cost GROUP BY source""".stripMargin,
    "lm_backoff_ppl_bands" ->
      s"""WITH $perDocCtes,
         |scored AS (
         |  SELECT dp.mbits_per_tok, d.lang, d.n_chars
         |  FROM docppl dp JOIN documents d ON d.doc_id = dp.doc_id),
         |b AS (SELECT lang, quantile_cont(mbits_per_tok, [1.0/3, 2.0/3]) AS bnds
         |      FROM scored GROUP BY lang)
         |SELECT s.lang,
         |  CAST(len(list_filter(b.bnds, x -> CAST(s.mbits_per_tok AS DOUBLE) > x))
         |    AS INTEGER) AS band,
         |  count(*) AS n_docs,
         |  CAST(sum(s.n_chars) AS BIGINT) AS char_mass,
         |  min(s.mbits_per_tok) AS mbits_lo,
         |  max(s.mbits_per_tok) AS mbits_hi
         |FROM scored s JOIN b ON b.lang = s.lang
         |GROUP BY 1, 2""".stripMargin
  )
}
