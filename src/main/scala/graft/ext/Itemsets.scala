package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Frequent-itemset mining and association rules over market baskets —
  * the A-priori family (Agrawal & Srikant, VLDB'94) in relational form.
  * A training-data pipeline uses the same machinery for co-occurrence
  * mining over token sets / tag sets; here the baskets are orders and
  * the items are part brands (the classic brand-affinity workload).
  *
  * 100 TB shape: the A-priori restriction runs BEFORE any fan-out —
  * items below the relative support floor are dropped first (downward
  * closure: no frequent itemset contains an infrequent item), and the
  * floor is RELATIVE (ppm of basket count — the round-8 co-purchase
  * lesson: absolute floors re-admit the dense noise graph as data
  * grows), carried as a 1-row broadcast, never a collect. The frequent
  * item set is bounded INDEPENDENT of basket count (≤ avgBasket·1e6/ppm
  * items can clear a ppm floor), so it broadcasts at any scale.
  *
  * Itemset generation is the ARRAY form, not a self-join chain: one
  * groupBy(basket) builds the sorted frequent-item array, and pair /
  * triple candidates explode from in-row combination lambdas — one
  * shuffle for the array build plus one map-side-combining aggregate
  * per level, where the k-way self-join form pays a sorted exchange
  * per JOIN SIDE (measured 9.4 s → ~4 s on the sf0.1 board). Per-basket
  * fan-out is C(B, 3) over FREQUENT items only — bounded by the item
  * dictionary at coarse (brand/tag) granularity; for raw-SKU-grade
  * dictionaries keep the floor proportionally higher or add a basket
  * cap, exactly as A-priori implementations do.
  *
  * Integer-exact surface: support counts are BIGINTs; confidence and
  * lift are emitted in PPM via BIGINT floor-division, so the oracle
  * reproduces every value bit-exactly — no float leaves the operator.
  */
object Itemsets {

  /** Relative support threshold (1-row frame) from the basket table. */
  private def thresholdOf(baskets: DataFrame, floorPpm: Int): DataFrame =
    baskets.agg(countDistinct(col("bk")).as("n"))
      .select(greatest(lit(2L),
        ceil(col("n") * floorPpm / lit(1000000.0)).cast("long")).as("thr"))

  /** All ordered pairs (a[i], a[j]), i < j, of a sorted array column.
    * Guarded: `sequence(1, 0)` counts DOWN, not empty (the Quality
    * bigram lesson). The array is a materialized column, so the
    * element_at accesses are O(1) — no re-evaluated subexpressions.
    */
  private def pairCombos(a: Column): Column =
    when(size(a) >= 2,
      flatten(transform(sequence(lit(1), size(a) - 1), i =>
        transform(sequence(i + 1, size(a)), j =>
          struct(element_at(a, i).as("p1"), element_at(a, j).as("p2")))) ))
      .otherwise(array().cast("array<struct<p1:string,p2:string>>"))

  /** All ordered triples (a[i], a[j], a[l]), i < j < l. */
  private def tripleCombos(a: Column): Column =
    when(size(a) >= 3,
      flatten(flatten(transform(sequence(lit(1), size(a) - 2), i =>
        transform(sequence(i + 1, size(a) - 1), j =>
          transform(sequence(j + 1, size(a)), l =>
            struct(element_at(a, i).as("p1"), element_at(a, j).as("p2"),
              element_at(a, l).as("p3"))))))))
      .otherwise(array().cast("array<struct<p1:string,p2:string,p3:string>>"))

  /** Sorted per-basket arrays of FREQUENT items (A-priori level 1),
    * persisted (both candidate levels explode from it; harnesses
    * clearCache() per query), plus the frequent-item support table.
    */
  private def frequentArrays(baskets: DataFrame, floorPpm: Int): (DataFrame, DataFrame) = {
    val freq = baskets.groupBy(col("item")).agg(count(lit(1)).as("item_sup"))
      .crossJoin(broadcast(thresholdOf(baskets, floorPpm)))
      .where(col("item_sup") >= col("thr"))
      .select(col("item"), col("item_sup"))
    val arr = baskets.join(broadcast(freq.select(col("item"))), "item")
      .groupBy(col("bk")).agg(sort_array(collect_set(col("item"))).as("a"))
      .where(size(col("a")) >= 2)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (arr, freq)
  }

  /** Frequent triples ranked by support — the A-priori chain items →
    * pairs → triples with downward-closure pruning between every
    * level: triples keep only candidates whose (p1, p2) prefix pair is
    * itself frequent (the bounded frequent-pair set is a broadcast).
    */
  def topTriplesBySupport(baskets: DataFrame, floorPpm: Int, k: Int): DataFrame = {
    val bsk = baskets
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (arr, _) = frequentArrays(bsk, floorPpm)
    val fpairs = arr.select(explode(pairCombos(col("a"))).as("p"))
      .groupBy(col("p.p1").as("p1"), col("p.p2").as("p2"))
      .agg(count(lit(1)).as("sup"))
      .crossJoin(broadcast(thresholdOf(bsk, floorPpm)))
      .where(col("sup") >= col("thr"))
      .select(col("p1"), col("p2"))
    arr.select(explode(tripleCombos(col("a"))).as("t"))
      .select(col("t.p1").as("p1"), col("t.p2").as("p2"), col("t.p3").as("p3"))
      .join(broadcast(fpairs), Seq("p1", "p2"))
      .groupBy(col("p1"), col("p2"), col("p3"))
      .agg(count(lit(1)).as("sup"))
      .orderBy(col("sup").desc, col("p1"), col("p2"), col("p3"))
      .limit(k)
  }

  /** Association rules p1 → p2 over frequent pairs, ranked by lift.
    * conf_ppm = ⌊1e6·sup(p1,p2)/sup(p1)⌋, lift_ppm =
    * ⌊1e6·n·sup(p1,p2)/(sup(p1)·sup(p2))⌋ — BIGINT arithmetic only.
    * Both rule directions are emitted (confidence is asymmetric).
    */
  def associationRules(baskets: DataFrame, floorPpm: Int, k: Int): DataFrame = {
    val bsk = baskets
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (arr, freq) = frequentArrays(bsk, floorPpm)
    val n = bsk.agg(countDistinct(col("bk")).as("n"))
    val pairSup = arr.select(explode(pairCombos(col("a"))).as("p"))
      .groupBy(col("p.p1").as("p1"), col("p.p2").as("p2"))
      .agg(count(lit(1)).as("sup"))
    val rules = pairSup
      .unionAll(pairSup.select(col("p2").as("p1"), col("p1").as("p2"), col("sup")))
    rules
      .join(broadcast(freq.select(col("item").as("p1"), col("item_sup").as("sup1"))), "p1")
      .join(broadcast(freq.select(col("item").as("p2"), col("item_sup").as("sup2"))), "p2")
      .crossJoin(broadcast(n))
      .select(col("p1"), col("p2"), col("sup"),
        expr("1000000L * sup div sup1").as("conf_ppm"),
        expr("1000000L * sup * n div (sup1 * sup2)").as("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("p1"), col("p2"))
      .limit(k)
  }

  /** Order baskets at brand granularity: distinct (orderkey, brand). */
  private def brandBaskets(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).select(col("l_orderkey").as("bk"), col("l_partkey"))
      .join(Tables.part(s, dir).select(col("p_partkey").as("l_partkey"),
        col("p_brand").as("item")), "l_partkey")
      .select(col("bk"), col("item")).distinct()

  val queries: Map[String, Q] = Map(
    // top-50 brand triples by support, 2000 ppm floor, A-priori chain
    "itemset_top_triples" -> ((s, dir) =>
      topTriplesBySupport(brandBaskets(s, dir), floorPpm = 2000, k = 50)),

    // top-25 brand rules by lift (both directions), integer PPM values
    "assoc_rules_lift" -> ((s, dir) =>
      associationRules(brandBaskets(s, dir), floorPpm = 2000, k = 25))
  )

  private val basketCte =
    """bsk AS (SELECT DISTINCT l.l_orderkey AS bk, p.p_brand AS item
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
      |nb AS (SELECT count(DISTINCT bk) AS n FROM bsk),
      |thr AS (SELECT greatest(2, CAST(ceil(n * 2000 / 1000000.0) AS BIGINT)) AS thr FROM nb),
      |isup AS (SELECT item, count(*) AS item_sup FROM bsk GROUP BY item
      |         HAVING count(*) >= (SELECT thr FROM thr)),
      |fb AS (SELECT bsk.bk, bsk.item, isup.item_sup FROM bsk JOIN isup USING (item))""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "itemset_top_triples" ->
      (s"WITH $basketCte,\n" +
      """fpair AS (SELECT a.item AS p1, x.item AS p2
        |  FROM fb a JOIN fb x ON a.bk = x.bk AND a.item < x.item
        |  GROUP BY a.item, x.item HAVING count(*) >= (SELECT thr FROM thr)),
        |tri AS (SELECT a.item AS p1, x.item AS p2, y.item AS p3, count(*) AS sup
        |  FROM fb a JOIN fb x ON a.bk = x.bk AND a.item < x.item
        |            JOIN fb y ON a.bk = y.bk AND x.item < y.item
        |            JOIN fpair f ON f.p1 = a.item AND f.p2 = x.item
        |  GROUP BY a.item, x.item, y.item)
        |SELECT p1, p2, p3, sup FROM tri
        |ORDER BY sup DESC, p1, p2, p3 LIMIT 50""".stripMargin),
    "assoc_rules_lift" ->
      (s"WITH $basketCte,\n" +
      """pair AS (SELECT a.item AS p1, x.item AS p2, count(*) AS sup
        |  FROM fb a JOIN fb x ON a.bk = x.bk AND a.item < x.item
        |  GROUP BY a.item, x.item),
        |rules AS (SELECT p1, p2, sup FROM pair
        |          UNION ALL SELECT p2, p1, sup FROM pair)
        |SELECT b.p1, b.p2, b.sup,
        |  1000000 * b.sup // s1.item_sup AS conf_ppm,
        |  1000000 * b.sup * (SELECT n FROM nb) // (s1.item_sup * s2.item_sup) AS lift_ppm
        |FROM rules b JOIN isup s1 ON s1.item = b.p1 JOIN isup s2 ON s2.item = b.p2
        |ORDER BY lift_ppm DESC, b.p1, b.p2 LIMIT 25""".stripMargin)
  )
}
