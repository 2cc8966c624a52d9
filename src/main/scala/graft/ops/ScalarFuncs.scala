package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** General scalar / date / array function surface (SURVEY.md §2.10 — the
  * reference's element-wise computations plus the string/date/array
  * built-ins the extended query surface needs). Pure projections; only
  * deterministic cross-engine-identical functions are used (no libm
  * transcendentals — `log`/`exp`/trig can differ in the last ulp between
  * JVM and C runtimes; `sqrt` is IEEE-exact so it's fine).
  */
object ScalarFuncs {

  val queries: Map[String, Q] = Map(
    "scalar_functions" -> ((s, dir) =>
      Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"),
        concat(col("l_returnflag"), lit("_"), col("l_linestatus")).as("flag_status"),
        lower(col("l_returnflag")).as("flag_lower"),
        (col("l_orderkey") % 7).as("mod7"),
        abs(col("l_quantity") - 25.0).as("qty_dev"),
        sqrt(col("l_quantity")).as("qty_sqrt"),
        ceil(col("l_extendedprice") / 1000.0).as("price_k"),
        coalesce(nullif(col("l_returnflag"), lit("N")), lit("none")).as("flag_or_none"),
        year(col("l_shipdate")).as("ship_year"),
        month(col("l_shipdate")).as("ship_month"),
        dayofmonth(col("l_shipdate")).as("ship_day"),
        date_trunc("month", col("l_shipdate")).as("ship_month_start"))),

    "array_functions" -> ((s, dir) =>
      Tables.embeddings(s, dir).select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).as("first_c"),
        element_at(col("embedding"), -1).as("last_c"),
        array_max(col("embedding")).as("max_c"),
        array_min(col("embedding")).as("min_c"),
        // head of the array projected to scalar columns (not array<float>):
        // the driver's pandas compare can't sort ndarray-valued columns
        element_at(col("embedding"), 1).as("h1"),
        element_at(col("embedding"), 2).as("h2"),
        element_at(col("embedding"), 3).as("h3"),
        size(filter(col("embedding"), x => x > 0)).as("n_positive")))
  )

  val oracleSql: Map[String, String] = Map(
    "scalar_functions" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_returnflag || '_' || l_linestatus AS flag_status,
        |  lower(l_returnflag) AS flag_lower,
        |  l_orderkey % 7 AS mod7,
        |  abs(l_quantity - 25.0) AS qty_dev,
        |  sqrt(l_quantity) AS qty_sqrt,
        |  CAST(ceil(l_extendedprice / 1000.0) AS BIGINT) AS price_k,
        |  coalesce(nullif(l_returnflag, 'N'), 'none') AS flag_or_none,
        |  CAST(year(l_shipdate) AS INTEGER) AS ship_year,
        |  CAST(month(l_shipdate) AS INTEGER) AS ship_month,
        |  CAST(day(l_shipdate) AS INTEGER) AS ship_day,
        |  CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS ship_month_start
        |FROM lineitem""".stripMargin,
    "array_functions" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS INTEGER) AS dim,
        |  embedding[1] AS first_c,
        |  embedding[-1] AS last_c,
        |  list_max(embedding) AS max_c,
        |  list_min(embedding) AS min_c,
        |  embedding[1] AS h1,
        |  embedding[2] AS h2,
        |  embedding[3] AS h3,
        |  CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_positive
        |FROM embeddings""".stripMargin
  )
}
