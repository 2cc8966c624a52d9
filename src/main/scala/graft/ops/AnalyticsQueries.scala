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
        |GROUP BY n_name""".stripMargin
  )
}
