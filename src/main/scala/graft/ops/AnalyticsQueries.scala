package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Composite analytics queries (TPC-H Q3/Q5 analogues adapted to the
  * testdata schema): multi-way joins + filters + aggregation + ordering in
  * one plan — the end-to-end shapes a user actually runs, exercising join
  * reorder, pushdown through joins, partial aggregation and broadcast
  * selection together. Revenue uses the exact integer-cents formulation
  * (see q1_agg) so results are bit-identical to the oracle.
  */
object AnalyticsQueries {

  /** sum(extendedprice·(1−discount)) in exact 1e-4 units → double. */
  private def revenue: Column =
    (sum(round(col("l_extendedprice") * 100).cast("long")
      * round((lit(1) - col("l_discount")) * 100).cast("long")) / 10000.0).as("revenue")

  val queries: Map[String, Q] = Map(
    // Q3-style shipping priority: segment-filtered customers, date-banded
    // orders/lineitems, revenue per open order.
    "q3_shipping_priority" -> ((s, dir) => {
      val cutoff = lit("1998-06-01").cast("timestamp")
      val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, dir).filter(col("o_orderdate") < cutoff)
      val li = Tables.lineitem(s, dir).filter(col("l_shipdate") > cutoff)
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(li, o("o_orderkey") === li("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(revenue)
    }),

    // Q5-style local-supplier volume: customer and supplier in the same
    // nation, region-restricted, revenue per nation.
    "q5_local_supplier_volume" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      val li = Tables.lineitem(s, dir)
      val su = Tables.supplier(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir).filter(col("r_name").isin("ASIA", "EUROPE"))
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(li, o("o_orderkey") === li("l_orderkey"))
        .join(broadcast(su), li("l_suppkey") === su("s_suppkey")
          && c("c_nationkey") === su("s_nationkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(revenue, count(lit(1)).as("n_lines"))
    }),

    // Percent-of-parent rollup: each nation's order revenue as an
    // integer ppm share of its region — the hierarchical drill-down
    // staple. The nation-level aggregate happens FIRST (fact shuffle
    // keyed by custkey, dims broadcast); the region re-total is a
    // second aggregate over the 25-row nation table, joined back
    // broadcast — the parent share costs nothing extra at any scale.
    // The share numerator rides decimal(38,0) (the SetWindowOps moment
    // pattern), so rev_cents·10⁶ cannot wrap at any revenue scale.
    "share_of_parent" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      val byNation = o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long"))
          .as("rev_cents"))
      val byRegion = byNation.groupBy(col("r_name"))
        .agg(sum(col("rev_cents")).as("region_cents"))
      byNation.join(broadcast(byRegion), "r_name")
        .select(col("r_name"), col("n_name"), col("rev_cents"),
          col("region_cents"),
          expr("CAST(rev_cents AS DECIMAL(38,0)) * 1000000 div region_cents")
            .as("share_ppm"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |      * CAST(round((1 - l_discount) * 100) AS BIGINT)) / 10000.0 AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-01'
        |  AND l_shipdate > TIMESTAMP '1998-06-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority""".stripMargin,
    "q5_local_supplier_volume" ->
      """SELECT n_name,
        |  sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |      * CAST(round((1 - l_discount) * 100) AS BIGINT)) / 10000.0 AS revenue,
        |  count(*) AS n_lines
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name IN ('ASIA', 'EUROPE')
        |GROUP BY n_name""".stripMargin,
    "share_of_parent" ->
      """WITH by_nation AS (
        |  SELECT r_name, n_name,
        |    CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
        |      AS rev_cents
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY r_name, n_name),
        |by_region AS (
        |  SELECT r_name, CAST(sum(rev_cents) AS BIGINT) AS region_cents
        |  FROM by_nation GROUP BY r_name)
        |SELECT n.r_name, n.n_name, n.rev_cents, r.region_cents,
        |  CAST(CAST(n.rev_cents AS HUGEINT) * 1000000 // r.region_cents
        |    AS BIGINT) AS share_ppm
        |FROM by_nation n JOIN by_region r ON r.r_name = n.r_name""".stripMargin
  )
}
