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
  * 100 TB shape: the basket table never self-joins at raw-item
  * granularity without the A-priori restriction — items below the
  * relative support floor are removed BEFORE the pair fan-out, so the
  * quadratic term is over frequent items only (downward closure:
  * no frequent pair contains an infrequent item). The floor is
  * RELATIVE (ppm of basket count, the round-8 co-purchase lesson:
  * absolute floors re-admit the dense noise graph as data grows) and
  * is a 1-row broadcast, never a collect. Pair and triple counting are
  * map-side-combining aggregates keyed on the itemset; the final
  * top-k is a TakeOrderedAndProject (no global sort materializes).
  *
  * Integer-exact surface: support counts are BIGINTs; confidence and
  * lift are emitted in PPM via BIGINT floor-division, so the oracle
  * reproduces every value bit-exactly — no float leaves the operator.
  */
object Itemsets {

  /** Distinct (basket, item) pairs with items below `floorPpm` of the
    * basket count removed (A-priori level 1).
    */
  private def frequentBasketItems(baskets: DataFrame, floorPpm: Int): DataFrame = {
    val thr = baskets.agg(countDistinct(col("bk")).as("n"))
      .select(greatest(lit(2L),
        ceil(col("n") * floorPpm / lit(1000000.0)).cast("long")).as("thr"))
    val itemSup = baskets.groupBy(col("item")).agg(count(lit(1)).as("item_sup"))
      .crossJoin(broadcast(thr))
      .where(col("item_sup") >= col("thr"))
      .select(col("item"), col("item_sup"))
    baskets.join(itemSup, "item")
  }

  /** Frequent triples by the same relative floor, ranked by support —
    * the A-priori chain items → pairs → triples with downward-closure
    * pruning between every level: the triple count joins the basket
    * stream against the FREQUENT pair set on its (p1, p2) prefix, so
    * candidate triples inherit two frequent sub-pairs by construction
    * (the third is implied frequent at brand granularity; at raw-item
    * granularity the same join against pairs on (p2, p3) slots in as
    * one more semi-join without changing the shuffle count).
    */
  def topTriplesBySupport(baskets: DataFrame, floorPpm: Int, k: Int): DataFrame = {
    val b = frequentBasketItems(baskets, floorPpm)
    val thr = baskets.agg(countDistinct(col("bk")).as("n"))
      .select(greatest(lit(2L),
        ceil(col("n") * floorPpm / lit(1000000.0)).cast("long")).as("thr"))
    val pairs = b.as("a").join(b.as("x"),
        col("a.bk") === col("x.bk") && col("a.item") < col("x.item"))
      .groupBy(col("a.item").as("p1"), col("x.item").as("p2"))
      .agg(count(lit(1)).as("sup"))
      .crossJoin(broadcast(thr))
      .where(col("sup") >= col("thr"))
      .select(col("p1"), col("p2"))
    val tripleOcc = b.as("a").join(b.as("x"),
        col("a.bk") === col("x.bk") && col("a.item") < col("x.item"))
      .join(b.as("y"),
        col("a.bk") === col("y.bk") && col("x.item") < col("y.item"))
      .select(col("a.bk").as("bk"), col("a.item").as("p1"),
        col("x.item").as("p2"), col("y.item").as("p3"))
      .join(pairs, Seq("p1", "p2"))
    tripleOcc.groupBy(col("p1"), col("p2"), col("p3"))
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
    val b = frequentBasketItems(baskets, floorPpm)
    val n = baskets.agg(countDistinct(col("bk")).as("n"))
    val pairSup = b.as("a").join(b.as("x"),
        col("a.bk") === col("x.bk") && col("a.item") < col("x.item"))
      .groupBy(col("a.item").as("p1"), col("x.item").as("p2"))
      .agg(count(lit(1)).as("sup"))
    val itemSup = b.select(col("item"), col("item_sup")).distinct()
    val both = pairSup
      .unionAll(pairSup.select(col("p2").as("p1"), col("p1").as("p2"), col("sup")))
    both
      .join(itemSup.select(col("item").as("p1"), col("item_sup").as("sup1")), "p1")
      .join(itemSup.select(col("item").as("p2"), col("item_sup").as("sup2")), "p2")
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
