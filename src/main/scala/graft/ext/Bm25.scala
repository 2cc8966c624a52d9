package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval (Robertson & Spärck Jones probabilistic
  * relevance, the Okapi BM25 form with k1 = 1.2, b = 0.75) in exact
  * fixed-point integer arithmetic, so the ranking is reproducible
  * bit-for-bit by any engine — no float summation order, no libm.
  *
  * Per (doc, term): the tf-normalization term
  *   S = tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
  * is an exact rational in (tf, dl, T, N) once avgdl = T/N is
  * substituted: S = 44·tf·T / (20·tf·T + 6·T + 18·dl·N); it is emitted
  * as ⌊1e6·S⌋ by BIGINT floor division. The idf is the RSJ weight
  * WITHOUT the logarithm — ⌊1e3·(N−df+0.5)/(df+0.5)⌋ =
  * ⌊1000·(2(N−df)+1)/(2df+1)⌋ — which preserves BM25's
  * rarer-term-weighs-more ordering exactly (log is monotone); on a
  * production cluster the float log-idf is a one-line parameter swap,
  * traded here for an oracle that replays every value in BIGINTs.
  * The document score is the integer sum Σ idf_fp·S_fp — order-free.
  *
  * 100 TB shape: tf/df/dl are the same map-side-combining aggregates
  * the TF-IDF operator shuffles (keyed on term / doc_id); the query
  * term list and the (N, T) globals are 1-to-5-row broadcasts; scoring
  * is a broadcast semi-join of the posting stream against the query
  * terms (only matching postings survive the scan stage), and the
  * top-k is a TakeOrderedAndProject — no global sort, no collect.
  */
object Bm25 {

  /** Top-k documents for the disjunctive query `queryTerms(term)`,
    * scored by fixed-point BM25 over `docs(doc_id, text)`.
    * Emits (rank, doc_id, score_fp), rank by (score desc, doc_id).
    */
  def bm25TopK(docs: DataFrame, queryTerms: DataFrame, k: Int): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val globals = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("t_total"))
    val dfx = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))

    val scored = tf
      .join(broadcast(queryTerms.select(col("term")).distinct()), "term")
      .join(dfx, "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(globals))
      .select(col("doc_id"),
        expr("(1000L * (2 * (n_docs - df) + 1) div (2 * df + 1)) * " +
          "(1000000L * 44 * tf * t_total div " +
          "(20 * tf * t_total + 6 * t_total + 18 * dl * n_docs))").as("part"))
      .groupBy(col("doc_id")).agg(sum(col("part")).as("score_fp"))
      .orderBy(col("score_fp").desc, col("doc_id")).limit(k)

    // rank over the k collected-size rows (bounded window input)
    scored.withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("score_fp").desc, col("doc_id"))).cast("int"))
      .select(col("rank"), col("doc_id"), col("score_fp"))
  }

  /** RM3-style pseudo-relevance-feedback expansion: take the BM25
    * top-`fbK` documents as the feedback set, weight every term in
    * them by Σ_fb (tf·10⁶ div dl) · (score_fp div 10⁶) — the relevance-
    * model estimate P(t|d)·P(d|q) in fixed point (the score factor is
    * pre-truncated to milli-scale so the per-term sum holds to ~10¹⁵
    * feedback postings) — drop the original query terms (anti-join on
    * the ≤5-row broadcast), and emit the top-`nTerms` expansion
    * candidates. 100 TB shape: the feedback set is a k-row broadcast,
    * so the posting scan survives one equi-join against it; everything
    * downstream is term-keyed with map-side combine + TakeOrdered.
    */
  def prfExpansion(docs: DataFrame, queryTerms: DataFrame,
                   fbK: Int, nTerms: Int): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val fb = bm25TopK(docs, queryTerms, fbK)
      .select(col("doc_id"), col("score_fp"))
    tf.join(broadcast(fb), "doc_id")
      .join(dl, "doc_id")
      .join(broadcast(queryTerms.select(col("term")).distinct()), Seq("term"), "left_anti")
      .select(col("term"), col("doc_id"),
        expr("(1000000L * tf div dl) * (score_fp div 1000000L)").as("wpart"))
      .groupBy(col("term"))
      .agg(sum(col("wpart")).as("w_fp"),
        countDistinct(col("doc_id")).as("n_fb_docs"))
      .orderBy(col("w_fp").desc, col("term")).limit(nTerms)
  }

  /** Deterministic query: the 5 rarest corpus terms by (df, term). */
  private def rarestTerms(docs: DataFrame, n: Int): DataFrame =
    docs.select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .orderBy(col("df"), col("term")).limit(n)

  val queries: Map[String, Q] = Map(
    "bm25_topk" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      bm25TopK(docs, rarestTerms(docs, 5), k = 20)
    }),
    // top-10 feedback docs → top-15 expansion terms
    "bm25_prf_expansion" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      prfExpansion(docs, rarestTerms(docs, 5), fbK = 10, nTerms = 15)
    })
  )

  val oracleSql: Map[String, String] = Map(
    "bm25_topk" ->
      """WITH p AS (SELECT doc_id,
        |    unnest(list_filter(string_split_regex(text, '\s+'), x -> x != '')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM p GROUP BY doc_id, term),
        |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
        |g AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS t_total FROM dl),
        |dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |qt AS (SELECT term FROM dfx ORDER BY df, term LIMIT 5),
        |scored AS (
        |  SELECT t.doc_id, CAST(sum(
        |    (1000 * (2 * (g.n_docs - d.df) + 1) // (2 * d.df + 1)) *
        |    (1000000 * 44 * t.tf * g.t_total //
        |     (20 * t.tf * g.t_total + 6 * g.t_total + 18 * l.dl * g.n_docs))
        |  ) AS BIGINT) AS score_fp
        |  FROM tf t JOIN qt USING (term) JOIN dfx d USING (term)
        |       JOIN dl l USING (doc_id) CROSS JOIN g
        |  GROUP BY t.doc_id)
        |SELECT CAST(ROW_NUMBER() OVER (ORDER BY score_fp DESC, doc_id) AS INTEGER) AS rank,
        |  doc_id, score_fp
        |FROM scored ORDER BY score_fp DESC, doc_id LIMIT 20""".stripMargin,

    "bm25_prf_expansion" ->
      """WITH p AS (SELECT doc_id,
        |    unnest(list_filter(string_split_regex(text, '\s+'), x -> x != '')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM p GROUP BY doc_id, term),
        |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
        |g AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS t_total FROM dl),
        |dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |qt AS (SELECT term FROM dfx ORDER BY df, term LIMIT 5),
        |fb AS (
        |  SELECT t.doc_id, CAST(sum(
        |    (1000 * (2 * (g.n_docs - d.df) + 1) // (2 * d.df + 1)) *
        |    (1000000 * 44 * t.tf * g.t_total //
        |     (20 * t.tf * g.t_total + 6 * g.t_total + 18 * l.dl * g.n_docs))
        |  ) AS BIGINT) AS score_fp
        |  FROM tf t JOIN qt USING (term) JOIN dfx d USING (term)
        |       JOIN dl l USING (doc_id) CROSS JOIN g
        |  GROUP BY t.doc_id
        |  ORDER BY score_fp DESC, t.doc_id LIMIT 10)
        |SELECT t.term,
        |  CAST(sum((1000000 * t.tf // l.dl) * (fb.score_fp // 1000000)) AS BIGINT) AS w_fp,
        |  CAST(count(DISTINCT t.doc_id) AS BIGINT) AS n_fb_docs
        |FROM tf t JOIN fb ON fb.doc_id = t.doc_id
        |JOIN dl l ON l.doc_id = t.doc_id
        |ANTI JOIN qt ON qt.term = t.term
        |GROUP BY t.term
        |ORDER BY w_fp DESC, t.term LIMIT 15""".stripMargin
  )
}
