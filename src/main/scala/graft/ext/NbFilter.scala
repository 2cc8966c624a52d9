package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Learned quality-classifier filtering — the step a production corpus
  * pipeline runs AFTER rule-based triage: train a Naive-Bayes classifier
  * on weak labels (here the [[Quality.gopherRules]] verdicts on the even
  * doc_id split), score held-out documents, and keep the top-scoring
  * fraction. This is the fasttext-style quality-filter recipe
  * (classifier trained on a trusted/untrusted split, corpus filtered by
  * score) re-expressed relationally, with the train/score/select stages
  * each a first-class operator.
  *
  * Features are QUANTIZED doc statistics, not raw tokens: the floor-log2
  * word-count bucket, integer mean word length, capped stopword count,
  * and the alphabetic-word decile — a fixed feature alphabet (≤ ~60
  * (feature, value) cells), so the trained model is a broadcastable
  * constant no matter the corpus size. Likelihoods use a piecewise-linear
  * integer log2 in MILLIBITS: mlog2(x) = 1000·⌊log2 x⌋ + 1000·(x − 2^msb)
  * div 2^msb — monotone, max interpolation error ~0.086 bits, and exactly
  * reproducible in any engine with `bin`/shifts (the floor-log2 idiom of
  * [[Quality]]/[[StoragePlan]] with 1000× more resolution, which the
  * additive NB score needs — at 1-bit resolution most per-feature weights
  * quantize to zero and the classifier collapses to the prior; measured
  * 43.6% vs 86.8% held-out accuracy at sf0.01).
  *
  * 100 TB shape: feature extraction is a stateless projection; training
  * is one keyed aggregate on the feature alphabet (map-side combine
  * collapses the exchange to partitions × alphabet rows); scoring is a
  * BROADCAST join of the model + a doc-keyed aggregate; top-p% selection
  * is the two-phase exact-rank idiom ([[graft.ops.Offsets.globalPosition]]
  * — range repartition + broadcast bucket offsets, no global window).
  * Scoring itself is STATELESS ([[scoreFlags]]): features live as
  * columns, not exploded rows, so the score is a 4-term sum after four
  * alphabet-sized broadcast lookups — no per-doc aggregate, which also
  * lets the identical code run as a Structured Streaming stage
  * (streaming_nb_quality). No UDFs anywhere.
  */
object NbFilter {

  /** Millibit piecewise-linear log2 of a (strictly positive) integer SQL
    * expression: 1000·msb + 1000·(x − 2^msb) div 2^msb. Spark SQL form;
    * [[mlog2DuckSql]] is the byte-identical DuckDB spelling.
    */
  private[ext] def mlog2(x: String): Column = expr(
    s"((length(bin($x)) - 1) * 1000 + (($x) - shiftleft(1L, length(bin($x)) - 1)) * 1000 " +
      s"div shiftleft(1L, length(bin($x)) - 1))")

  private[ext] def mlog2DuckSql(x: String): String =
    s"((length(bin($x)) - 1) * 1000 + (($x) - (CAST(1 AS BIGINT) << (length(bin($x)) - 1))) " +
      s"* 1000 // (CAST(1 AS BIGINT) << (length(bin($x)) - 1)))"

  /** Per-doc quantized feature rows (doc_id, source, pass, feat, val):
    * four categorical features per document over the [[Quality.gopherRules]]
    * stats. Pure projection + a 4-way explode — row count is 4× docs,
    * width is three small columns.
    */
  def features(docs: DataFrame): DataFrame =
    Quality.gopherRules(docs)
      .select(col("doc_id"), col("source"), col("pass"),
        explode(array(
          struct(lit("len").as("feat"),
            (length(bin(greatest(col("n_words"), lit(1L)))) - 1).cast("long").as("val")),
          struct(lit("mwl").as("feat"),
            expr("mean_word_len_x100 div 100").cast("long").as("val")),
          struct(lit("stop").as("feat"),
            least(col("n_stopwords"), lit(8L)).cast("long").as("val")),
          struct(lit("alpha").as("feat"),
            expr("n_alpha_words * 10 div greatest(n_words, 1)").cast("long").as("val"))
        )).as("fv"))
      .select(col("doc_id"), col("source"), col("pass"),
        col("fv.feat").as("feat"), col("fv.val").as("val"))

  /** Per-(feature, value) class counts on the TRAIN split (even doc_id):
    * the entire trained model. Feature-alphabet-sized — broadcastable.
    */
  def model(feats: DataFrame): DataFrame =
    feats.where(col("doc_id") % 2 === 0)
      .groupBy(col("feat"), col("val"))
      .agg(sum(when(col("pass"), 1L).otherwise(0L)).as("n_pass"),
        sum(when(col("pass"), 0L).otherwise(1L)).as("n_fail"))

  /** The model dump face: per-cell counts plus the millibit NB weight
    * w = [mlog2(n_pass+1) − mlog2(tot_pass+V)] − [mlog2(n_fail+1) −
    * mlog2(tot_fail+V)] (Laplace-smoothed log-likelihood-ratio of the
    * cell) — the feature-importance readout an operator inspects before
    * trusting the filter.
    */
  def modelWeights(docs: DataFrame): DataFrame = {
    val m = model(features(docs))
    val ftot = m.groupBy(col("feat"))
      .agg(sum(col("n_pass")).as("tn1"), sum(col("n_fail")).as("tn0"),
        count(lit(1)).as("v"))
    m.join(broadcast(ftot), "feat")
      .select(col("feat"), col("val"), col("n_pass"), col("n_fail"),
        (mlog2("n_pass + 1") - mlog2("n_fail + 1")
          + mlog2("tn0 + v") - mlog2("tn1 + v")).as("w_mbits"))
  }

  /** The five scalar scoring constants: the four per-feature
    * unseen-value fallback weights plus the class-prior millibits —
    * collected driver-side (one row, five longs: the bounded-collect
    * discipline of the k-means centroids), so the score path carries
    * them as literals and NO cross join ever reaches the plan.
    */
  final case class NbConsts(w0Len: Long, w0Mwl: Long, w0Stop: Long,
                            w0Alpha: Long, priorMbits: Long)

  /** The scoring model trained on the even split of `modelDocs`: the
    * per-(feat, val) millibit weight table (≤ ~60 rows, broadcastable)
    * and the scalar [[NbConsts]].
    */
  def trainedWeights(modelDocs: DataFrame): (DataFrame, NbConsts) = {
    // PERSISTED: weights and consts both derive from the model counts,
    // and scoreFlags broadcasts `weights` four times (one per feature)
    // — unpersisted lineage would re-run the whole train-side
    // tokenize/explode/aggregate chain once per reader (the round-14
    // MM/EM lineage-recompute lesson; measured 3.6× on the confusion
    // face at sf0.1). The frame is feature-alphabet-sized.
    val m = model(features(modelDocs))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ftot = m.groupBy(col("feat"))
      .agg(sum(col("n_pass")).as("tn1"), sum(col("n_fail")).as("tn0"),
        count(lit(1)).as("v"))
    val weights = m.join(ftot, "feat")
      .select(col("feat"), col("val"),
        (mlog2("n_pass + 1") - mlog2("n_fail + 1")
          + mlog2("tn0 + v") - mlog2("tn1 + v")).as("w_mbits"))
    // the class prior is EXACTLY readable off the alphabet-sized ftot:
    // every train doc contributes one (feat, val) row per feature, so
    // any single feature's (tn1, tn0) are the per-class train doc counts
    // — the old form re-ran the whole gopherRules corpus pass just for
    // these two scalars (the aggregate keeps the old 1-row/null-on-empty
    // semantics)
    val prior = ftot
      .agg(max(when(col("feat") === "len", col("tn1"))).as("d1"),
        max(when(col("feat") === "len", col("tn0"))).as("d0"))
    val w0 = mlog2("tn0 + v") - mlog2("tn1 + v") // the pure-smoothing fallback
    val c = ftot
      .agg(max(when(col("feat") === "len", w0)).as("w0_len"),
        max(when(col("feat") === "mwl", w0)).as("w0_mwl"),
        max(when(col("feat") === "stop", w0)).as("w0_stop"),
        max(when(col("feat") === "alpha", w0)).as("w0_alpha"))
      .crossJoin(prior)
      .select(col("w0_len").cast("long"), col("w0_mwl").cast("long"),
        col("w0_stop").cast("long"), col("w0_alpha").cast("long"),
        (mlog2("d1 + 1") - mlog2("d0 + 1")).cast("long").as("prior_mbits"))
      .collect()(0)
    (weights,
      NbConsts(c.getLong(0), c.getLong(1), c.getLong(2), c.getLong(3), c.getLong(4)))
  }

  /** STATELESS per-doc NB scores over one-row-per-doc flag rows: the
    * four feature values are computed as columns, each looked up in the
    * broadcast weight table by a per-feature left equi-join (fallback =
    * the smoothing constant), and the score is a plain 4-term sum — no
    * per-doc aggregate anywhere, so the whole scoring path is
    * projection + alphabet-sized broadcast joins. That is what lets the
    * identical code run as a Structured Streaming stage (stream-static
    * equi-joins, zero per-doc state) and keeps the batch plan free of
    * any data-sized exchange until the caller's own finisher.
    */
  def scoreFlags(flags: DataFrame, weights: DataFrame, consts: NbConsts): DataFrame = {
    def wSide(feat: String) = broadcast(
      weights.where(col("feat") === feat)
        .select(col("val").as(s"_v_$feat"), col("w_mbits").as(s"w_$feat")))
    flags
      .withColumn("f_len", (length(bin(greatest(col("n_words"), lit(1L)))) - 1).cast("long"))
      .withColumn("f_mwl", expr("mean_word_len_x100 div 100").cast("long"))
      .withColumn("f_stop", least(col("n_stopwords"), lit(8L)).cast("long"))
      .withColumn("f_alpha", expr("n_alpha_words * 10 div greatest(n_words, 1)").cast("long"))
      .join(wSide("len"), col("f_len") === col("_v_len"), "left")
      .join(wSide("mwl"), col("f_mwl") === col("_v_mwl"), "left")
      .join(wSide("stop"), col("f_stop") === col("_v_stop"), "left")
      .join(wSide("alpha"), col("f_alpha") === col("_v_alpha"), "left")
      .select(col("doc_id"), col("source"), col("pass"),
        (coalesce(col("w_len"), lit(consts.w0Len))
          + coalesce(col("w_mwl"), lit(consts.w0Mwl))
          + coalesce(col("w_stop"), lit(consts.w0Stop))
          + coalesce(col("w_alpha"), lit(consts.w0Alpha))
          + lit(consts.priorMbits)).as("score_mbits"))
  }

  /** Per-doc NB scores (millibits, ≥ 0 ⇒ predicted pass) for the docs
    * selected by `scoreSplit`, under the model trained on the even
    * split — the [[scoreFlags]] stateless path over the gopher flag
    * projection.
    */
  def scored(docs: DataFrame, scoreSplit: Column): DataFrame = {
    val (weights, consts) = trainedWeights(docs)
    scoreFlags(Quality.gopherRules(docs).where(scoreSplit), weights, consts)
  }

  /** Per-feature ablation audit: the held-out confusion/accuracy of the
    * full model beside four leave-one-feature-out variants — which
    * feature the filter actually leans on (and whether any is dead
    * weight). ONE scoring pass computes the four per-feature millibit
    * contributions as columns; a 5-way in-row explode then fans each
    * doc into (variant, score) pairs, and the finisher is one
    * variant×confusion-cell bounded aggregate — the ablation sweep
    * costs one extra explode, not five scoring passes.
    */
  def ablationAudit(docs: DataFrame): DataFrame = {
    val (weights, consts) = trainedWeights(docs)
    def wSide(feat: String) = broadcast(
      weights.where(col("feat") === feat)
        .select(col("val").as(s"_v_$feat"), col("w_mbits").as(s"w_$feat")))
    val parts = Quality.gopherRules(docs).where(col("doc_id") % 2 === 1)
      .withColumn("f_len", (length(bin(greatest(col("n_words"), lit(1L)))) - 1).cast("long"))
      .withColumn("f_mwl", expr("mean_word_len_x100 div 100").cast("long"))
      .withColumn("f_stop", least(col("n_stopwords"), lit(8L)).cast("long"))
      .withColumn("f_alpha", expr("n_alpha_words * 10 div greatest(n_words, 1)").cast("long"))
      .join(wSide("len"), col("f_len") === col("_v_len"), "left")
      .join(wSide("mwl"), col("f_mwl") === col("_v_mwl"), "left")
      .join(wSide("stop"), col("f_stop") === col("_v_stop"), "left")
      .join(wSide("alpha"), col("f_alpha") === col("_v_alpha"), "left")
      .select(col("pass"),
        coalesce(col("w_len"), lit(consts.w0Len)).as("t_len"),
        coalesce(col("w_mwl"), lit(consts.w0Mwl)).as("t_mwl"),
        coalesce(col("w_stop"), lit(consts.w0Stop)).as("t_stop"),
        coalesce(col("w_alpha"), lit(consts.w0Alpha)).as("t_alpha"))
      .withColumn("total",
        col("t_len") + col("t_mwl") + col("t_stop") + col("t_alpha")
          + lit(consts.priorMbits))
    parts
      .select(col("pass"), explode(array(
        struct(lit("full").as("variant"), col("total").as("s")),
        struct(lit("no_len").as("variant"), (col("total") - col("t_len")).as("s")),
        struct(lit("no_mwl").as("variant"), (col("total") - col("t_mwl")).as("s")),
        struct(lit("no_stop").as("variant"), (col("total") - col("t_stop")).as("s")),
        struct(lit("no_alpha").as("variant"), (col("total") - col("t_alpha")).as("s"))
      )).as("v"))
      .select(col("v.variant").as("variant"), (col("v.s") >= 0).as("pred"), col("pass"))
      .groupBy(col("variant"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("pred") && col("pass"), 1L).otherwise(0L)).as("tp"),
        sum(when(col("pred") && !col("pass"), 1L).otherwise(0L)).as("fp"),
        sum(when(!col("pred") && col("pass"), 1L).otherwise(0L)).as("fn"),
        sum(when(!col("pred") && !col("pass"), 1L).otherwise(0L)).as("tn"))
      .select(col("variant"), col("n_test"), col("tp"), col("fp"), col("fn"), col("tn"),
        expr("(tp + tn) * 1000000L div n_test").as("accuracy_ppm"))
  }

  /** Held-out confusion matrix (odd doc_id split) of the NB prediction
    * against the weak labels — ONE row: the go/no-go readout for
    * deploying the filter. Measured 86.8% accuracy / 95.8% precision at
    * sf0.01 — learned, not replayed: the scored split never enters
    * training.
    */
  def confusion(docs: DataFrame): DataFrame =
    scored(docs, col("doc_id") % 2 === 1)
      .select((col("score_mbits") >= 0).as("pred"), col("pass"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("pred") && col("pass"), 1L).otherwise(0L)).as("tp"),
        sum(when(col("pred") && !col("pass"), 1L).otherwise(0L)).as("fp"),
        sum(when(!col("pred") && col("pass"), 1L).otherwise(0L)).as("fn"),
        sum(when(!col("pred") && !col("pass"), 1L).otherwise(0L)).as("tn"))
      .select(col("n_test"), col("tp"), col("fp"), col("fn"), col("tn"),
        expr("(tp + tn) * 1000000L div n_test").as("accuracy_ppm"))

  /** Per-source predicted keep rates on the held-out split, beside the
    * weak-label rate — the drift alarm between the learned filter and
    * the rules it was trained on, per source. #sources rows.
    */
  def sourceRates(docs: DataFrame): DataFrame =
    scored(docs, col("doc_id") % 2 === 1)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("score_mbits") >= 0, 1L).otherwise(0L)).as("n_pred_pass"),
        sum(when(col("pass"), 1L).otherwise(0L)).as("n_weak_pass"))
      .select(col("source"), col("n_docs"), col("n_pred_pass"), col("n_weak_pass"),
        expr("n_pred_pass * 1000000L div n_docs").as("pred_pass_ppm"))

  /** Apply the filter at a token budget: keep exactly the top `pct`% of
    * ALL documents by (NB score desc, doc_id asc) — the exact global
    * rank runs through the two-phase [[graft.ops.Offsets.globalPosition]]
    * idiom (range repartition + broadcast bucket offsets; no
    * single-partition window), and the kept-set summary is a source-keyed
    * aggregate with the char mass fetched by a doc-keyed equi-join.
    */
  def filterTopPct(docs: DataFrame, pct: Int): DataFrame = {
    // doc-sized, narrow; read three times (the pool count, the range
    // partitioner's sampling pass, the position join) — unpersisted,
    // each reader re-ran the whole scoring chain
    val sc = scored(docs, lit(true))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nAll = sc.agg(count(lit(1)).as("n_all"))
    val ranked = graft.ops.Offsets.globalPosition(
      sc, Seq(col("score_mbits").desc, col("doc_id")), "pos")
    ranked.crossJoin(broadcast(nAll))
      .where(col("pos") < expr(s"n_all * $pct div 100"))
      .join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("kept_chars"))
  }

  val queries: Map[String, Q] = Map(
    "quality_nb_model" -> ((s, dir) => modelWeights(Tables.documents(s, dir))),
    "quality_nb_confusion" -> ((s, dir) => confusion(Tables.documents(s, dir))),
    "quality_nb_ablation" -> ((s, dir) => ablationAudit(Tables.documents(s, dir))),
    "quality_nb_source_rates" -> ((s, dir) => sourceRates(Tables.documents(s, dir))),
    "quality_filter_topk_pct" -> ((s, dir) =>
      filterTopPct(Tables.documents(s, dir), pct = 25))
  )

  // ---- oracle side: the identical chain in DuckDB SQL. The flag CTEs
  // come from Quality.gopherFlagCtes (one definition, no drift); the
  // feature/model/score CTEs are shared across the four oracles below.
  private def featModelCtes: String =
    s"""${Quality.gopherFlagCtes},
       |feat AS (
       |  SELECT doc_id, source, pass, f.fn AS feat, f.fv AS val FROM flags,
       |  LATERAL (VALUES
       |    ('len',   CAST(length(bin(greatest(n_words, 1))) - 1 AS BIGINT)),
       |    ('mwl',   mean_word_len_x100 // 100),
       |    ('stop',  least(n_stopwords, 8)),
       |    ('alpha', n_alpha_words * 10 // greatest(n_words, 1))) f(fn, fv)),
       |model AS (
       |  SELECT feat, val,
       |    CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       |    CAST(sum(CASE WHEN pass THEN 0 ELSE 1 END) AS BIGINT) AS n_fail
       |  FROM feat WHERE doc_id % 2 = 0 GROUP BY feat, val),
       |ftot AS (
       |  SELECT feat, CAST(sum(n_pass) AS BIGINT) AS tn1,
       |    CAST(sum(n_fail) AS BIGINT) AS tn0,
       |    CAST(count(*) AS BIGINT) AS v
       |  FROM model GROUP BY feat),
       |prior AS (
       |  SELECT CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS d1,
       |    CAST(sum(CASE WHEN pass THEN 0 ELSE 1 END) AS BIGINT) AS d0
       |  FROM flags WHERE doc_id % 2 = 0)""".stripMargin

  private[ext] def scoreCtes(splitPred: String): String =
    s"""$featModelCtes,
       |w AS (
       |  SELECT f.doc_id, f.source, f.pass,
       |    ${mlog2DuckSql("coalesce(m.n_pass, 0) + 1")}
       |      - ${mlog2DuckSql("coalesce(m.n_fail, 0) + 1")}
       |      + ${mlog2DuckSql("ft.tn0 + ft.v")}
       |      - ${mlog2DuckSql("ft.tn1 + ft.v")} AS wb
       |  FROM feat f LEFT JOIN model m ON m.feat = f.feat AND m.val = f.val
       |  JOIN ftot ft ON ft.feat = f.feat
       |  WHERE $splitPred),
       |score AS (
       |  SELECT w.doc_id, w.source, w.pass,
       |    CAST(sum(wb) + max(${mlog2DuckSql("p.d1 + 1")}
       |      - ${mlog2DuckSql("p.d0 + 1")}) AS BIGINT) AS score_mbits
       |  FROM w, prior p GROUP BY w.doc_id, w.source, w.pass)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "quality_nb_model" ->
      s"""WITH $featModelCtes
         |SELECT m.feat, m.val, m.n_pass, m.n_fail,
         |  CAST(${mlog2DuckSql("m.n_pass + 1")} - ${mlog2DuckSql("m.n_fail + 1")}
         |    + ${mlog2DuckSql("ft.tn0 + ft.v")}
         |    - ${mlog2DuckSql("ft.tn1 + ft.v")} AS BIGINT) AS w_mbits
         |FROM model m JOIN ftot ft ON ft.feat = m.feat""".stripMargin,
    "quality_nb_confusion" ->
      s"""WITH ${scoreCtes("f.doc_id % 2 = 1")},
         |ev AS (SELECT score_mbits >= 0 AS pred, pass FROM score)
         |SELECT CAST(count(*) AS BIGINT) AS n_test,
         |  CAST(sum(CASE WHEN pred AND pass THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         |  CAST(sum(CASE WHEN pred AND NOT pass THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         |  CAST(sum(CASE WHEN NOT pred AND pass THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         |  CAST(sum(CASE WHEN NOT pred AND NOT pass THEN 1 ELSE 0 END) AS BIGINT) AS tn,
         |  CAST((sum(CASE WHEN pred AND pass THEN 1 ELSE 0 END)
         |      + sum(CASE WHEN NOT pred AND NOT pass THEN 1 ELSE 0 END))
         |    * 1000000 // count(*) AS BIGINT) AS accuracy_ppm
         |FROM ev""".stripMargin,
    "quality_nb_ablation" ->
      s"""WITH $featModelCtes,
         |w AS (
         |  SELECT f.doc_id, f.pass, f.feat,
         |    CAST(${mlog2DuckSql("coalesce(m.n_pass, 0) + 1")}
         |      - ${mlog2DuckSql("coalesce(m.n_fail, 0) + 1")}
         |      + ${mlog2DuckSql("ft.tn0 + ft.v")}
         |      - ${mlog2DuckSql("ft.tn1 + ft.v")} AS BIGINT) AS wb
         |  FROM feat f LEFT JOIN model m ON m.feat = f.feat AND m.val = f.val
         |  JOIN ftot ft ON ft.feat = f.feat
         |  WHERE f.doc_id % 2 = 1),
         |tot AS (
         |  SELECT w.doc_id, w.pass,
         |    CAST(sum(wb) + max(${mlog2DuckSql("p.d1 + 1")}
         |      - ${mlog2DuckSql("p.d0 + 1")}) AS BIGINT) AS total
         |  FROM w, prior p GROUP BY w.doc_id, w.pass),
         |variants AS (
         |  SELECT pass, 'full' AS variant, total AS s FROM tot
         |  UNION ALL
         |  SELECT w.pass, 'no_' || w.feat AS variant, t.total - w.wb AS s
         |  FROM w JOIN tot t ON t.doc_id = w.doc_id),
         |ev AS (SELECT variant, s >= 0 AS pred, pass FROM variants)
         |SELECT variant, CAST(count(*) AS BIGINT) AS n_test,
         |  CAST(sum(CASE WHEN pred AND pass THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         |  CAST(sum(CASE WHEN pred AND NOT pass THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         |  CAST(sum(CASE WHEN NOT pred AND pass THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         |  CAST(sum(CASE WHEN NOT pred AND NOT pass THEN 1 ELSE 0 END) AS BIGINT) AS tn,
         |  CAST((sum(CASE WHEN pred AND pass THEN 1 ELSE 0 END)
         |      + sum(CASE WHEN NOT pred AND NOT pass THEN 1 ELSE 0 END))
         |    * 1000000 // count(*) AS BIGINT) AS accuracy_ppm
         |FROM ev GROUP BY variant""".stripMargin,
    "quality_nb_source_rates" ->
      s"""WITH ${scoreCtes("f.doc_id % 2 = 1")}
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN score_mbits >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pred_pass,
         |  CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_weak_pass,
         |  CAST(sum(CASE WHEN score_mbits >= 0 THEN 1 ELSE 0 END) * 1000000
         |    // count(*) AS BIGINT) AS pred_pass_ppm
         |FROM score GROUP BY source""".stripMargin,
    "quality_filter_topk_pct" ->
      s"""WITH ${scoreCtes("TRUE")},
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n_all FROM score),
         |r AS (
         |  SELECT s.doc_id, s.source,
         |    row_number() OVER (ORDER BY score_mbits DESC, doc_id) AS rn
         |  FROM score s),
         |kept AS (SELECT r.doc_id, r.source FROM r, n WHERE r.rn <= n.n_all * 25 // 100)
         |SELECT k.source, CAST(count(*) AS BIGINT) AS n_kept,
         |  CAST(sum(d.n_chars) AS BIGINT) AS kept_chars
         |FROM kept k JOIN documents d ON d.doc_id = k.doc_id
         |GROUP BY k.source""".stripMargin
  )
}
