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

  /** Per-item top-`k` similar items over `baskets(basket_id, item_id)`:
    * (item_id, rank, other_id, n_common, js) with js the scaled-integer
    * Jaccard of the two items' basket sets.
    */
  def itemSimilarityTopK(baskets: DataFrame, k: Int,
                         scale: Long = 1000000L): DataFrame = {
    val b = baskets.select(col("basket_id").as("ok"), col("item_id").as("pk")).distinct()
    val sizes = b.groupBy(col("pk")).agg(count(lit(1)).as("n_baskets"))
    val coocc = b.as("a").join(b.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("pa"), col("b.pk").as("pb"))
      .agg(count(lit(1)).as("n_common"))
    // symmetrize: each pair feeds both items' neighbour lists
    val directed = coocc.select(col("pa").as("item_id"), col("pb").as("other_id"), col("n_common"))
      .unionAll(coocc.select(col("pb").as("item_id"), col("pa").as("other_id"), col("n_common")))
    val scored = directed
      .join(sizes.select(col("pk").as("item_id"), col("n_baskets").as("n_i")), "item_id")
      .join(sizes.select(col("pk").as("other_id"), col("n_baskets").as("n_o")), "other_id")
      .select(col("item_id"), col("other_id"), col("n_common"),
        expr(s"($scale * n_common) div (n_i + n_o - n_common)").as("js"))
    graft.plans.TopKPerKey.topKPerKey(scored, Seq("item_id"),
        Seq(("js", true), ("n_common", true), ("other_id", false)), k)
      .select(col("item_id"), col("rank"), col("other_id"), col("n_common"), col("js"))
  }

  val queries: Map[String, Q] = Map(
    // parts as items, orders as baskets, top-10 neighbours per part
    "recsys_item_similarity" -> ((s, dir) =>
      itemSimilarityTopK(
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
        |  ORDER BY js DESC, n_common DESC, other_id) <= 10""".stripMargin
  )
}
