package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise-preference strength estimation — the Bradley–Terry model fit
  * by the classic minorization–maximization iteration (Hunter 2004,
  * "MM algorithms for generalized Bradley-Terry models"), the standard
  * primitive behind preference-data curation for RLHF: given decided
  * pairwise comparisons, estimate a per-item strength w such that
  * P(i beats j) = w_i / (w_i + w_j).
  *
  * Determinism discipline: everything is scaled-integer (strengths in
  * ppm of the initial weight; every division is the truncating `div`
  * both Spark and DuckDB implement identically), so the MM iterations
  * reproduce bit-for-bit in the oracle's unrolled CTE chain — the
  * KMeans/PageRank fixed-round pattern. BIGINT headroom: a term is
  * `n_ij · 10¹² div (w_i + w_j)` and an update `W_i · 10¹² div D_i`,
  * so per-item win totals up to ~9.2·10⁶ (≈ 10 TB of decided
  * comparisons per single item) fit; past that the same rank-bucket
  * rescale `spearman_bucketed` uses would apply.
  *
  * 100 TB shape: comparisons are generated per basket with the ordered
  * in-basket pair explode (the [[RecSys.pairScores]] discipline — fan-out
  * Σ|basket|², bounded by basket size, never catalogue size) and
  * aggregated ONCE to the (a, b) pair table; each MM round is two
  * pair-keyed equi-joins against the item-sized weight table, an
  * explode to per-item terms, and one item-keyed aggregate — the
  * exchange rides the PAIR table, constant per round, with map-side
  * combine on the item key. Rounds are fixed (3), not converged —
  * deterministic plan depth, the PageRank convention.
  */
object Preference {

  private val S = 1000000L           // strength scale (ppm)
  private val S2 = S * S             // term scale

  /** Decided pairwise comparisons from `(basket_id, item_id, score)`
    * rows: within each basket, every item pair with unequal total
    * scores yields one comparison won by the higher score. Returns the
    * aggregated pair table `(pa, pb, n, wins_a, wins_b)` with pa < pb.
    */
  private[ext] def comparisons(scored: DataFrame): DataFrame = {
    val bq = scored.groupBy(col("basket_id").as("ok"), col("item_id").as("pk"))
      .agg(sum(col("score")).as("q"))
    val perBasket = bq.groupBy(col("ok"))
      .agg(sort_array(collect_list(struct(col("pk"), col("q")))).as("items"))
    perBasket
      .select(posexplode(col("items")).as(Seq("i", "a")), col("items"))
      .select(col("a.pk").as("pa"), col("a.q").as("qa"),
        explode(slice(col("items"), col("i") + lit(2), size(col("items")))).as("b"))
      .where(col("qa") =!= col("b.q"))
      .groupBy(col("pa"), col("b.pk").as("pb"))
      .agg(count(lit(1)).as("n"),
        sum((col("qa") > col("b.q")).cast("long")).as("wins_a"),
        sum((col("b.q") > col("qa")).cast("long")).as("wins_b"))
  }

  /** Fixed-round Bradley–Terry MM over an aggregated pair table:
    * (item_id, n_comp, wins, winrate_ppm, strength_ppm), top-`k` by
    * strength (ties broken by item id).
    */
  def bradleyTerry(scored: DataFrame, iters: Int, k: Int): DataFrame = {
    val pairs = comparisons(scored)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val items = pairs.select(col("pa").as("pk"), col("wins_a").as("w"), col("n"))
      .unionAll(pairs.select(col("pb").as("pk"), col("wins_b").as("w"), col("n")))
      .groupBy(col("pk"))
      .agg(sum(col("w")).as("wins"), sum(col("n")).as("n_comp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var weights = items.select(col("pk"), lit(S).as("w"))
    (0 until iters).foreach { _ =>
      val joined = pairs
        .join(weights.select(col("pk").as("pa"), col("w").as("wa")), "pa")
        .join(weights.select(col("pk").as("pb"), col("w").as("wb")), "pb")
        .select(col("pa"), col("pb"), col("n"),
          expr(s"n * ${S2}L div greatest(wa + wb, 1L)").as("term"))
      val denom = joined
        .select(explode(array(
          struct(col("pa").as("pk"), col("term")),
          struct(col("pb").as("pk"), col("term")))).as("t"))
        .groupBy(col("t.pk").as("pk"))
        .agg(sum(col("t.term")).as("d"))
      weights = items.join(denom, "pk")
        .select(col("pk"), expr(s"wins * ${S2}L div greatest(d, 1L)").as("w"))
    }
    val out = items.join(weights, "pk")
      .select(col("pk").as("item_id"), col("n_comp"), col("wins"),
        expr("wins * 1000000 div n_comp").as("winrate_ppm"),
        col("w").as("strength_ppm"))
      .orderBy(col("strength_ppm").desc, col("item_id"))
      .limit(k)
    out
  }

  val queries: Map[String, Q] = Map(
    // parts as items, orders as baskets, quantity-cents as the decided
    // score — 3 MM rounds, top-100 strengths
    "bradley_terry_strength" -> ((s, dir) =>
      bradleyTerry(
        Tables.lineitem(s, dir).select(
          col("l_orderkey").as("basket_id"), col("l_partkey").as("item_id"),
          round(col("l_quantity") * 100).cast("long").as("score")),
        iters = 3, k = 100))
  )

  private def iterSql(prev: String, i: Int): String =
    s"""d$i AS (
       |  SELECT pk, CAST(SUM(term) AS BIGINT) AS d FROM (
       |    SELECT pa AS pk, n * 1000000000000 // greatest(wa.w + wb.w, 1) AS term
       |    FROM agg JOIN $prev wa ON wa.pk = agg.pa JOIN $prev wb ON wb.pk = agg.pb
       |    UNION ALL
       |    SELECT pb AS pk, n * 1000000000000 // greatest(wa.w + wb.w, 1) AS term
       |    FROM agg JOIN $prev wa ON wa.pk = agg.pa JOIN $prev wb ON wb.pk = agg.pb)
       |  GROUP BY pk),
       |w$i AS (
       |  SELECT items.pk, CAST(items.wins * 1000000000000 // greatest(d$i.d, 1) AS BIGINT) AS w
       |  FROM items JOIN d$i ON d$i.pk = items.pk)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "bradley_terry_strength" ->
      s"""WITH bq AS (
         |  SELECT l_orderkey AS ok, l_partkey AS pk,
         |    CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS q
         |  FROM lineitem GROUP BY 1, 2),
         |rawp AS (
         |  SELECT a.pk AS pa, b.pk AS pb,
         |    CASE WHEN a.q > b.q THEN 1 ELSE 0 END AS wa,
         |    CASE WHEN b.q > a.q THEN 1 ELSE 0 END AS wb
         |  FROM bq a JOIN bq b ON a.ok = b.ok AND a.pk < b.pk
         |  WHERE a.q <> b.q),
         |agg AS (
         |  SELECT pa, pb, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(wa) AS BIGINT) AS wins_a, CAST(sum(wb) AS BIGINT) AS wins_b
         |  FROM rawp GROUP BY 1, 2),
         |items AS (
         |  SELECT pk, CAST(sum(w) AS BIGINT) AS wins, CAST(sum(n) AS BIGINT) AS n_comp
         |  FROM (SELECT pa AS pk, wins_a AS w, n FROM agg
         |        UNION ALL SELECT pb, wins_b, n FROM agg)
         |  GROUP BY pk),
         |w0 AS (SELECT pk, CAST(1000000 AS BIGINT) AS w FROM items),
         |${iterSql("w0", 1)},
         |${iterSql("w1", 2)},
         |${iterSql("w2", 3)}
         |SELECT items.pk AS item_id, items.n_comp, items.wins,
         |  CAST(items.wins * 1000000 // items.n_comp AS BIGINT) AS winrate_ppm,
         |  w3.w AS strength_ppm
         |FROM items JOIN w3 ON w3.pk = items.pk
         |ORDER BY strength_ppm DESC, item_id
         |LIMIT 100""".stripMargin
  )
}
