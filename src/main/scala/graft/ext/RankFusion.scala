package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid retrieval by Reciprocal Rank Fusion (Cormack et al.,
  * SIGIR'09): fuse two rankings of the same corpus by summing
  * 1/(60 + rank) per list — formulated INTEGER-EXACT
  * (`SCALE div (60 + rank)`, SCALE = 10⁶) so the fused ordering is
  * bit-reproducible on any engine. Here the two lists are the exact
  * quantized-dot ranking (SimSearch.bruteForceTopK) and the
  * PQ-compressed ADC ranking (ProductQuant.pqTopK) — the realistic
  * hybrid-retrieval shape where a cheap compressed index and an exact
  * scorer vote jointly.
  *
  * 100 TB shape: both inputs are per-query top-N lists (N = 50), so the
  * fusion join carries |queries|·N rows per side — NEVER corpus-sized;
  * the full-outer join keys on (q_id, c_id) and the final top-k runs
  * through the TopKPerKey partial/final operator. Rank-absent documents
  * contribute 0 by coalesce, the standard RRF convention.
  */
object RankFusion {

  /** Fuse two (q_id, rank, c_id) rankings; emits per-query top-`k` by
    * descending integer RRF score (ties broken by c_id).
    */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int,
              rrfK: Int = 60, scale: Long = 1000000L): DataFrame = {
    val fa = a.select(col("q_id"), col("c_id"), col("rank").as("rank_a"))
    val fb = b.select(col("q_id"), col("c_id"), col("rank").as("rank_b"))
    val fused = fa.join(fb, Seq("q_id", "c_id"), "full_outer")
      .select(col("q_id"), col("c_id"),
        (coalesce(expr(s"$scale div ($rrfK + rank_a)"), lit(0L)) +
          coalesce(expr(s"$scale div ($rrfK + rank_b)"), lit(0L))).as("rrf_score"))
    graft.plans.TopKPerKey.topKPerKey(fused, Seq("q_id"),
        Seq(("rrf_score", true), ("c_id", false)), k)
      .select(col("q_id"), col("rank"), col("c_id"), col("rrf_score"))
  }

  /** NDCG@5 of an approximate ranking against the exact top-5 relevance
    * set, INTEGER-EXACT: the log2 discount is irrational, so the five
    * position weights ship as frozen integer constants
    * `round(1e5 / log2(r+1))` = [100000, 63093, 50000, 43068, 38685]
    * (ideal DCG = 294846) and the whole metric is integer sums and one
    * floor division — no float ever computed, unlike a literal NDCG
    * whose per-query float sum is addition-order-dependent.
    */
  def ndcgAt5(approx: DataFrame, exact: DataFrame): DataFrame = {
    val weight = expr("""CASE rank WHEN 1 THEN 100000L WHEN 2 THEN 63093L
      WHEN 3 THEN 50000L WHEN 4 THEN 43068L ELSE 38685L END""")
    approx.select(col("q_id"), col("rank"), col("c_id"))
      .join(exact.select(col("q_id"), col("c_id"), lit(1).as("rel")),
        Seq("q_id", "c_id"), "left")
      .groupBy(col("q_id"))
      .agg(sum(when(col("rel").isNotNull, weight).otherwise(0L))
        .as("dcg_scaled"))
      .withColumn("ndcg_x1e5", expr("dcg_scaled * 100000 div 294846"))
  }

  /** MRR of an approximate ranking against the exact top-k relevance
    * set: per query, `1e6 div rank` of the FIRST relevant hit (0 if
    * none in the list) — reciprocal rank is exactly representable in
    * scaled integers, so like [[ndcgAt5]] the metric is hash-exact.
    */
  def mrrCheck(approx: DataFrame, exact: DataFrame,
               scale: Long = 1000000L): DataFrame =
    approx.select(col("q_id"), col("rank"), col("c_id"))
      .join(exact.select(col("q_id"), col("c_id"), lit(1).as("rel")),
        Seq("q_id", "c_id"), "left")
      .groupBy(col("q_id"))
      .agg(min(when(col("rel").isNotNull, col("rank"))).as("first_rel_rank"))
      .select(col("q_id"), col("first_rel_rank"),
        coalesce(expr(s"$scale div first_rel_rank"), lit(0L)).as("mrr_x1e6"))

  /** Kendall's τ between two rankings of the same query, over the docs
    * BOTH rank (the top-k intersection): all C(n,2) doc pairs classified
    * concordant/discordant by the sign product of rank differences (no
    * ties — row_number ranks are unique), τ·10⁶ by floor division.
    * Queries with fewer than two common docs are excluded explicitly
    * (τ undefined; pins the engine-identical behavior instead of a
    * divide-by-zero NULL/error divergence). Pair fan-out is C(k,2) per
    * query — constant, never corpus-sized.
    */
  def kendallTau(a: DataFrame, b: DataFrame,
                 scale: Long = 1000000L): DataFrame = {
    val common = a.select(col("q_id"), col("c_id"), col("rank").as("ra"))
      .join(b.select(col("q_id"), col("c_id"), col("rank").as("rb")),
        Seq("q_id", "c_id"))
    val pairs = common.as("x").join(common.as("y"),
        col("x.q_id") === col("y.q_id") && col("x.c_id") < col("y.c_id"))
      .select(col("x.q_id").as("q_id"),
        ((col("x.ra") - col("y.ra")).cast("long") *
          (col("x.rb") - col("y.rb")).cast("long")).as("sgn"))
    pairs.groupBy(col("q_id"))
      .agg(sum(when(col("sgn") > 0, 1L).otherwise(0L)).as("concordant"),
        sum(when(col("sgn") < 0, 1L).otherwise(0L)).as("discordant"))
      .where(col("concordant") + col("discordant") > 0)
      .select(col("q_id"), col("concordant"), col("discordant"),
        expr(s"(concordant - discordant) * $scale div (concordant + discordant)")
          .as("tau_x1e6"))
  }

  val queries: Map[String, Q] = Map(
    // rank agreement between the exact and PQ top-5 lists
    "ann_kendall_tau" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      val qs = e.filter(col("vec_id") < 10)
      kendallTau(
        SimSearch.bruteForceTopK(qs, e, k = 5),
        ProductQuant.pqTopK(qs, e, shortlist = 50, k = 5))
    }),

    // first-relevant-hit reciprocal rank beside NDCG: same PQ-vs-exact
    // composition, integer-exact
    "ann_mrr_check" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      val qs = e.filter(col("vec_id") < 10)
      mrrCheck(
        ProductQuant.pqTopK(qs, e, shortlist = 50, k = 5),
        SimSearch.bruteForceTopK(qs, e, k = 5))
    }),

    // ranking QUALITY beside the recall companions: PQ-ADC top-5
    // scored against the exact top-5 with integer NDCG
    "ann_ndcg_check" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      val qs = e.filter(col("vec_id") < 10)
      ndcgAt5(
        ProductQuant.pqTopK(qs, e, shortlist = 50, k = 5),
        SimSearch.bruteForceTopK(qs, e, k = 5))
    }),

    // exact top-50 ∪ PQ-ADC top-50 → fused top-10 per query
    "hybrid_rank_fusion" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      val qs = e.filter(col("vec_id") < 10)
      rrfFuse(
        SimSearch.bruteForceTopK(qs, e, k = 50),
        ProductQuant.pqTopK(qs, e, shortlist = 50, k = 50),
        k = 10)
    })
  )

  val oracleSql: Map[String, String] = Map(
    // both chains WITH ranks; sign-product pair classification
    "ann_kendall_tau" ->
      (ProductQuant.oracleCtesFor(50, 5) + ",\n" +
      """bf_d AS (
        |  SELECT qa.vec_id AS q_id, c.vec_id AS c_id,
        |    CAST(list_sum(list_transform(generate_series(1, len(qa.embedding)),
        |      i -> CAST(round(CAST(qa.embedding[i] AS DOUBLE) * 1000) AS BIGINT)
        |         * CAST(round(CAST(c.embedding[i] AS DOUBLE) * 1000) AS BIGINT))) AS BIGINT) AS dot_q
        |  FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10) qa
        |  JOIN embeddings c ON qa.vec_id != c.vec_id),
        |bf AS (
        |  SELECT q_id, c_id,
        |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY dot_q DESC, c_id) AS INTEGER) AS ra
        |  FROM bf_d
        |  QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY dot_q DESC, c_id) <= 5),
        |common AS (
        |  SELECT bf.q_id, bf.c_id, bf.ra, pq.rank AS rb
        |  FROM bf JOIN pq ON pq.q_id = bf.q_id AND pq.c_id = bf.c_id),
        |pairs AS (
        |  SELECT x.q_id,
        |    CAST(x.ra - y.ra AS BIGINT) * CAST(x.rb - y.rb AS BIGINT) AS sgn
        |  FROM common x JOIN common y
        |    ON x.q_id = y.q_id AND x.c_id < y.c_id),
        |agg AS (
        |  SELECT q_id,
        |    CAST(sum(CASE WHEN sgn > 0 THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
        |    CAST(sum(CASE WHEN sgn < 0 THEN 1 ELSE 0 END) AS BIGINT) AS discordant
        |  FROM pairs GROUP BY q_id)
        |SELECT q_id, concordant, discordant,
        |  CAST((concordant - discordant) * 1000000 // (concordant + discordant)
        |    AS BIGINT) AS tau_x1e6
        |FROM agg WHERE concordant + discordant > 0""".stripMargin),

    // same spliced chains as the NDCG oracle; reciprocal rank in
    // scaled integers
    "ann_mrr_check" ->
      (ProductQuant.oracleCtesFor(50, 5) + ",\n" +
      """bf_d AS (
        |  SELECT qa.vec_id AS q_id, c.vec_id AS c_id,
        |    CAST(list_sum(list_transform(generate_series(1, len(qa.embedding)),
        |      i -> CAST(round(CAST(qa.embedding[i] AS DOUBLE) * 1000) AS BIGINT)
        |         * CAST(round(CAST(c.embedding[i] AS DOUBLE) * 1000) AS BIGINT))) AS BIGINT) AS dot_q
        |  FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10) qa
        |  JOIN embeddings c ON qa.vec_id != c.vec_id),
        |bf AS (
        |  SELECT q_id, c_id
        |  FROM bf_d
        |  QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY dot_q DESC, c_id) <= 5),
        |firsts AS (
        |  SELECT pq.q_id,
        |    min(CASE WHEN bf.c_id IS NOT NULL THEN pq.rank END) AS first_rel_rank
        |  FROM pq LEFT JOIN bf ON bf.q_id = pq.q_id AND bf.c_id = pq.c_id
        |  GROUP BY pq.q_id)
        |SELECT q_id, CAST(first_rel_rank AS INTEGER) AS first_rel_rank,
        |  CAST(COALESCE(1000000 // first_rel_rank, 0) AS BIGINT) AS mrr_x1e6
        |FROM firsts""".stripMargin),

    // PQ chain (shortlist 50, k 5) + exact top-5 + the frozen integer
    // discount weights — the identical arithmetic
    "ann_ndcg_check" ->
      (ProductQuant.oracleCtesFor(50, 5) + ",\n" +
      """bf_d AS (
        |  SELECT qa.vec_id AS q_id, c.vec_id AS c_id,
        |    CAST(list_sum(list_transform(generate_series(1, len(qa.embedding)),
        |      i -> CAST(round(CAST(qa.embedding[i] AS DOUBLE) * 1000) AS BIGINT)
        |         * CAST(round(CAST(c.embedding[i] AS DOUBLE) * 1000) AS BIGINT))) AS BIGINT) AS dot_q
        |  FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10) qa
        |  JOIN embeddings c ON qa.vec_id != c.vec_id),
        |bf AS (
        |  SELECT q_id, c_id
        |  FROM bf_d
        |  QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY dot_q DESC, c_id) <= 5),
        |scored AS (
        |  SELECT pq.q_id,
        |    CASE WHEN bf.c_id IS NOT NULL THEN
        |      CASE pq.rank WHEN 1 THEN 100000 WHEN 2 THEN 63093
        |        WHEN 3 THEN 50000 WHEN 4 THEN 43068 ELSE 38685 END
        |    ELSE 0 END AS w
        |  FROM pq LEFT JOIN bf ON bf.q_id = pq.q_id AND bf.c_id = pq.c_id)
        |SELECT q_id, CAST(sum(w) AS BIGINT) AS dcg_scaled,
        |  CAST(sum(w) * 100000 // 294846 AS BIGINT) AS ndcg_x1e5
        |FROM scored GROUP BY q_id""".stripMargin),

    // the brute-force chain + the full PQ chain (shortlist 50, k 50)
    // spliced into one WITH, fused by the same integer arithmetic
    "hybrid_rank_fusion" ->
      (ProductQuant.oracleCtesFor(50, 50) + ",\n" +
      """bf_d AS (
        |  SELECT qa.vec_id AS q_id, c.vec_id AS c_id,
        |    CAST(list_sum(list_transform(generate_series(1, len(qa.embedding)),
        |      i -> CAST(round(CAST(qa.embedding[i] AS DOUBLE) * 1000) AS BIGINT)
        |         * CAST(round(CAST(c.embedding[i] AS DOUBLE) * 1000) AS BIGINT))) AS BIGINT) AS dot_q
        |  FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10) qa
        |  JOIN embeddings c ON qa.vec_id != c.vec_id),
        |bf AS (
        |  SELECT q_id,
        |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY dot_q DESC, c_id) AS INTEGER) AS rank,
        |    c_id
        |  FROM bf_d
        |  QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY dot_q DESC, c_id) <= 50),
        |fused AS (
        |  SELECT COALESCE(bf.q_id, pq.q_id) AS q_id,
        |    COALESCE(bf.c_id, pq.c_id) AS c_id,
        |    COALESCE(1000000 // (60 + bf.rank), 0) +
        |      COALESCE(1000000 // (60 + pq.rank), 0) AS rrf_score
        |  FROM bf FULL OUTER JOIN pq
        |    ON pq.q_id = bf.q_id AND pq.c_id = bf.c_id)
        |SELECT q_id,
        |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY rrf_score DESC, c_id) AS INTEGER) AS rank,
        |  c_id, CAST(rrf_score AS BIGINT) AS rrf_score
        |FROM fused
        |QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY rrf_score DESC, c_id) <= 10""".stripMargin)
  )
}
