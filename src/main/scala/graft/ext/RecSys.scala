package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Item-item collaborative filtering — per-item nearest neighbours by
  * Jaccard similarity of the baskets (orders) containing each item, the
  * classic "customers who bought X also bought Y" primitive.
  *
  * Scaled-integer Jaccard: js = (10⁶ · |A∩B|) div |A∪B| — the ranking
  * and the emitted score are both exact integers, no float comparison
  * anywhere (the KMeans/PageRank determinism discipline).
  *
  * 100 TB shape: the candidate join explodes pairs WITHIN each basket,
  * so its fan-out is Σ |basket|² — bounded by the largest basket (tens),
  * never by item popularity or catalogue size; the pair counts map-side
  * combine on the 16-byte (a, b) key; per-item basket counts are an
  * item-sized table joined twice; and the per-item top-k runs through
  * the TopKPerKey partial/final heap so only k rows per (partition,
  * item) reach the final shuffle. A pathological mega-basket (one order
  * containing 10⁵ items) is the one skew risk — cap basket size
  * upstream if the domain allows it.
  */
object RecSys {

  /** Canonical scored pair table (pa < pb): (pa, pb, n_common, js) for
    * every item pair co-occurring in ≥ 1 basket — the shared stage of
    * the list build, the coverage audit, and the ILD lookup. The basket
    * self-join here is the dominant cost of everything in this file, so
    * callers that need it twice persist THIS frame once.
    */
  private[ext] def pairScores(baskets: DataFrame,
                              scale: Long = 1000000L): DataFrame = {
    val b = baskets.select(col("basket_id").as("ok"), col("item_id").as("pk")).distinct()
    val sizes = b.groupBy(col("pk")).agg(count(lit(1)).as("n_baskets"))
    // Sizes ride the items INTO the pair generator (one item-keyed join
    // of the item-sized frame), so the Σ|basket|²-sized pair stream is
    // aggregated exactly once and never joined: the round-11/12 form
    // (basket self-join + two size joins of the pair table) paid two
    // extra exchanges and 2× the intermediates (SMJ emits |b|² matches
    // before the pa<pb filter; ordered generation emits |b|²/2).
    val perBasket = b.join(sizes, "pk")
      .groupBy(col("ok"))
      .agg(sort_array(collect_list(struct(col("pk"), col("n_baskets")))).as("items"))
    perBasket
      .select(posexplode(col("items")).as(Seq("i", "a")), col("items"))
      // slice is 1-based: positions i+2.. are exactly the items after a
      .select(col("a.pk").as("pa"), col("a.n_baskets").as("n_i"),
        explode(slice(col("items"), col("i") + lit(2), size(col("items")))).as("b"))
      .groupBy(col("pa"), col("b.pk").as("pb"))
      // n_i/n_o are functionally determined by pa/pb; min() is just the
      // deterministic way to carry them through the aggregate
      .agg(count(lit(1)).as("n_common"),
        min(col("n_i")).as("n_i"), min(col("b.n_baskets")).as("n_o"))
      .select(col("pa"), col("pb"), col("n_common"),
        expr(s"($scale * n_common) div (n_i + n_o - n_common)").as("js"))
  }

  /** Top-`k` lists from an already-built [[pairScores]] frame. */
  private[ext] def topKFromPairs(pairs: DataFrame, k: Int): DataFrame = {
    // symmetrize: each pair feeds both items' neighbour lists
    val scored = pairs.select(col("pa").as("item_id"), col("pb").as("other_id"),
        col("n_common"), col("js"))
      .unionAll(pairs.select(col("pb").as("item_id"), col("pa").as("other_id"),
        col("n_common"), col("js")))
    graft.plans.TopKPerKey.topKPerKey(scored, Seq("item_id"),
        Seq(("js", true), ("n_common", true), ("other_id", false)), k)
      .select(col("item_id"), col("rank"), col("other_id"), col("n_common"), col("js"))
  }

  /** Per-item top-`k` similar items over `baskets(basket_id, item_id)`:
    * (item_id, rank, other_id, n_common, js) with js the scaled-integer
    * Jaccard of the two items' basket sets.
    */
  def itemSimilarityTopK(baskets: DataFrame, k: Int,
                         scale: Long = 1000000L): DataFrame =
    topKFromPairs(pairScores(baskets, scale), k)

  /** Catalog coverage + concentration of the top-k recommendation
    * lists — the recommender-health readout beside accuracy: what
    * fraction of the catalog is ever recommended (low coverage = the
    * popularity trap), and how concentrated are the slots on the
    * single most-recommended item? The lists are the deterministic
    * [[itemSimilarityTopK]] output (pinned tie-breaks), so both counts
    * are exact. One row: (n_items, n_recommended, coverage_ppm,
    * n_slots, max_item_slots, top_share_ppm).
    *
    * 100 TB shape: the list build dominates (see itemSimilarityTopK);
    * the audit adds two distinct-count aggregates and a max over the
    * k·|items|-bounded list table, all map-side combined, joined as
    * 1-row broadcasts.
    */
  def catalogCoverage(baskets: DataFrame, k: Int): DataFrame = {
    // read by three aggregates; released by the harness's per-query
    // clearCache (the registry contract — see the Rle.scala note)
    val lists = itemSimilarityTopK(baskets, k)
      .select(col("other_id")).persist()
    val catalog = baskets.select(col("item_id")).distinct()
      .agg(count(lit(1)).as("n_items"))
    val reco = lists.distinct().agg(count(lit(1)).as("n_recommended"))
    val slots = lists.agg(count(lit(1)).as("n_slots"))
    val top = lists.groupBy(col("other_id")).agg(count(lit(1)).as("cnt"))
      .agg(max(col("cnt")).as("max_item_slots"))
    broadcast(catalog).crossJoin(broadcast(reco))
      .crossJoin(broadcast(slots)).crossJoin(broadcast(top))
      .select(col("n_items"), col("n_recommended"),
        expr("n_recommended * 1000000 div greatest(n_items, 1L)")
          .as("coverage_ppm"),
        col("n_slots"), col("max_item_slots"),
        expr("max_item_slots * 1000000 div greatest(n_slots, 1L)")
          .as("top_share_ppm"))
  }

  /** Intra-list diversity of the top-`k` lists — the redundancy audit
    * beside coverage: per list, the mean pairwise DISSIMILARITY
    * (10⁶ − js) of the recommended items, where js is the same basket
    * Jaccard the lists were ranked by (pairs that never co-occur score
    * js = 0, i.e. fully diverse). ILD near 0 means the list recommends
    * near-duplicates of each other. (item_id, n_pairs, ild_ppm).
    *
    * 100 TB shape: the dominant basket self-join runs ONCE — the
    * [[pairScores]] frame is persisted and feeds both the list build
    * and the similarity lookup (it was rebuilt twice before round 12,
    * the measured cause of the 2.54 probe ratio). The within-list pair
    * fan-out is k(k−1)/2 per list — bounded by the CONSTANT k, never by
    * catalogue or corpus size — and the lookup left-semi-restricts the
    * full pair table to pairs that actually appear in some list before
    * the (pa, pb)-keyed equi-join, so the probe side is k²·|items|-
    * bounded, not Σ basket²-bounded. Persisted frame released by the
    * harness's per-query clearCache (the registry contract — see the
    * catalogCoverage note).
    */
  def intraListDiversity(baskets: DataFrame, k: Int,
                         scale: Long = 1000000L): DataFrame = {
    val pairs = pairScores(baskets, scale).persist()
    // k·|items|-bounded; referenced twice by its own self-join below —
    // unpersisted, the whole top-k chain (symmetrize + partial/final
    // heap) re-ran per side
    val lists = topKFromPairs(pairs, k)
      .select(col("item_id"), col("other_id"))
      .persist()
    val listPairs = lists.as("x").join(lists.as("y"),
        col("x.item_id") === col("y.item_id") &&
          col("x.other_id") < col("y.other_id"))
      .select(col("x.item_id").as("item_id"),
        col("x.other_id").as("pa"), col("y.other_id").as("pb"))
    val needed = pairs.select(col("pa"), col("pb"), col("js"))
      .join(listPairs.select(col("pa"), col("pb")), Seq("pa", "pb"), "left_semi")
    listPairs
      .join(needed, Seq("pa", "pb"), "left")
      .groupBy(col("item_id"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(lit(scale) - coalesce(col("js"), lit(0L))).as("_dis"))
      .select(col("item_id"), col("n_pairs"),
        expr("_dis div n_pairs").as("ild_ppm"))
  }

  val queries: Map[String, Q] = Map(
    // parts as items, orders as baskets, top-10 neighbours per part
    "recsys_item_similarity" -> ((s, dir) =>
      itemSimilarityTopK(
        Tables.lineitem(s, dir).select(
          col("l_orderkey").as("basket_id"), col("l_partkey").as("item_id")),
        k = 10)),

    // coverage/concentration audit of the same top-10 lists
    "recsys_coverage" -> ((s, dir) =>
      catalogCoverage(
        Tables.lineitem(s, dir).select(
          col("l_orderkey").as("basket_id"), col("l_partkey").as("item_id")),
        k = 10)),

    // redundancy audit of the same top-10 lists
    "recsys_ild" -> ((s, dir) =>
      intraListDiversity(
        Tables.lineitem(s, dir).select(
          col("l_orderkey").as("basket_id"), col("l_partkey").as("item_id")),
        k = 10))
  )

  val oracleSql: Map[String, String] = Map(
    "recsys_item_similarity" ->
      """WITH b AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |sizes AS (SELECT pk, count(*) AS n_baskets FROM b GROUP BY pk),
        |coocc AS (
        |  SELECT a.pk AS pa, b2.pk AS pb, count(*) AS n_common
        |  FROM b a JOIN b b2 ON a.ok = b2.ok AND a.pk < b2.pk
        |  GROUP BY a.pk, b2.pk),
        |directed AS (
        |  SELECT pa AS item_id, pb AS other_id, n_common FROM coocc
        |  UNION ALL
        |  SELECT pb, pa, n_common FROM coocc),
        |scored AS (
        |  SELECT d.item_id, d.other_id, d.n_common,
        |    (1000000 * d.n_common) // (si.n_baskets + so.n_baskets - d.n_common) AS js
        |  FROM directed d
        |  JOIN sizes si ON si.pk = d.item_id
        |  JOIN sizes so ON so.pk = d.other_id)
        |SELECT item_id,
        |  CAST(row_number() OVER (PARTITION BY item_id
        |    ORDER BY js DESC, n_common DESC, other_id) AS INTEGER) AS rank,
        |  other_id, n_common, CAST(js AS BIGINT) AS js
        |FROM scored
        |QUALIFY row_number() OVER (PARTITION BY item_id
        |  ORDER BY js DESC, n_common DESC, other_id) <= 10""".stripMargin,

    "recsys_coverage" ->
      """WITH b AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |sizes AS (SELECT pk, count(*) AS n_baskets FROM b GROUP BY pk),
        |coocc AS (
        |  SELECT a.pk AS pa, b2.pk AS pb, count(*) AS n_common
        |  FROM b a JOIN b b2 ON a.ok = b2.ok AND a.pk < b2.pk
        |  GROUP BY a.pk, b2.pk),
        |directed AS (
        |  SELECT pa AS item_id, pb AS other_id, n_common FROM coocc
        |  UNION ALL
        |  SELECT pb, pa, n_common FROM coocc),
        |scored AS (
        |  SELECT d.item_id, d.other_id, d.n_common,
        |    (1000000 * d.n_common) // (si.n_baskets + so.n_baskets - d.n_common) AS js
        |  FROM directed d
        |  JOIN sizes si ON si.pk = d.item_id
        |  JOIN sizes so ON so.pk = d.other_id),
        |lists AS (
        |  SELECT other_id FROM scored
        |  QUALIFY row_number() OVER (PARTITION BY item_id
        |    ORDER BY js DESC, n_common DESC, other_id) <= 10),
        |cat AS (SELECT count(DISTINCT pk) AS n_items FROM b),
        |rec AS (SELECT count(DISTINCT other_id) AS n_recommended FROM lists),
        |slt AS (SELECT count(*) AS n_slots FROM lists),
        |top AS (SELECT max(cnt) AS max_item_slots FROM
        |  (SELECT other_id, count(*) AS cnt FROM lists GROUP BY other_id))
        |SELECT CAST(n_items AS BIGINT) AS n_items,
        |  CAST(n_recommended AS BIGINT) AS n_recommended,
        |  CAST(n_recommended * 1000000 // greatest(n_items, 1) AS BIGINT)
        |    AS coverage_ppm,
        |  CAST(n_slots AS BIGINT) AS n_slots,
        |  CAST(max_item_slots AS BIGINT) AS max_item_slots,
        |  CAST(max_item_slots * 1000000 // greatest(n_slots, 1) AS BIGINT)
        |    AS top_share_ppm
        |FROM cat, rec, slt, top""".stripMargin,

    "recsys_ild" ->
      """WITH b AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |sizes AS (SELECT pk, count(*) AS n_baskets FROM b GROUP BY pk),
        |coocc AS (
        |  SELECT a.pk AS pa, b2.pk AS pb, count(*) AS n_common
        |  FROM b a JOIN b b2 ON a.ok = b2.ok AND a.pk < b2.pk
        |  GROUP BY a.pk, b2.pk),
        |pair_sim AS (
        |  SELECT c.pa, c.pb,
        |    (1000000 * c.n_common) // (si.n_baskets + so.n_baskets - c.n_common) AS js
        |  FROM coocc c
        |  JOIN sizes si ON si.pk = c.pa
        |  JOIN sizes so ON so.pk = c.pb),
        |directed AS (
        |  SELECT pa AS item_id, pb AS other_id, n_common FROM coocc
        |  UNION ALL
        |  SELECT pb, pa, n_common FROM coocc),
        |scored AS (
        |  SELECT d.item_id, d.other_id, d.n_common,
        |    (1000000 * d.n_common) // (si.n_baskets + so.n_baskets - d.n_common) AS js
        |  FROM directed d
        |  JOIN sizes si ON si.pk = d.item_id
        |  JOIN sizes so ON so.pk = d.other_id),
        |lists AS (
        |  SELECT item_id, other_id FROM scored
        |  QUALIFY row_number() OVER (PARTITION BY item_id
        |    ORDER BY js DESC, n_common DESC, other_id) <= 10),
        |list_pairs AS (
        |  SELECT x.item_id, x.other_id AS pa, y.other_id AS pb
        |  FROM lists x JOIN lists y
        |    ON x.item_id = y.item_id AND x.other_id < y.other_id)
        |SELECT lp.item_id, count(*) AS n_pairs,
        |  CAST(sum(1000000 - coalesce(ps.js, 0)) AS BIGINT) // count(*) AS ild_ppm
        |FROM list_pairs lp
        |LEFT JOIN pair_sim ps ON ps.pa = lp.pa AND ps.pb = lp.pb
        |GROUP BY lp.item_id""".stripMargin
  )
}
