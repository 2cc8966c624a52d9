package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering key — the data-layout operator for
  * multi-dimensional scan locality at 100 TB: sorting/range-partitioning
  * by the interleaved key co-locates rows that are close in BOTH
  * dimensions, so parquet min/max row-group stats prune scans for
  * predicates on either column (a single-column sort only prunes its
  * own column).
  *
  * The key is pure bitwise arithmetic (magic-number bit spreading) on
  * built-in codegen'd expressions — no UDF, no custom Expression — and
  * the identical arithmetic runs in the DuckDB oracle.
  */
object ZOrder {

  /** Spread the low 16 bits of `x` to even bit positions (0,2,4,…30). */
  def spread16(x: Column): Column = {
    val v0 = x.bitwiseAND(lit(0xFFFFL))
    val v1 = (v0.bitwiseOR(shiftleft(v0, 8))).bitwiseAND(lit(0x00FF00FFL))
    val v2 = (v1.bitwiseOR(shiftleft(v1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val v3 = (v2.bitwiseOR(shiftleft(v2, 2))).bitwiseAND(lit(0x33333333L))
    (v3.bitwiseOR(shiftleft(v3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton key interleaving the low 16 bits of `a` (even bits)
    * and `b` (odd bits).
    */
  def zkey(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Cluster `df` for (a, b) locality: stamp the Morton key and
    * range-partition + sort by it — the write-side layout step.
    */
  def cluster(df: DataFrame, a: Column, b: Column): DataFrame =
    df.withColumn("zkey", zkey(a, b))
      .repartitionByRange(col("zkey"))
      .sortWithinPartitions(col("zkey"))

  val queries: Map[String, Q] = Map(
    "zorder_layout" -> ((s, dir) =>
      cluster(
        Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey")),
        pmod(col("l_suppkey"), lit(65536)), pmod(col("l_linenumber"), lit(65536))))
  )

  val oracleSql: Map[String, String] = Map(
    "zorder_layout" ->
      """WITH s AS (
        |  SELECT l_orderkey, l_linenumber, l_suppkey,
        |    l_suppkey % 65536 AS a0, l_linenumber % 65536 AS b0
        |  FROM lineitem),
        |sp AS (
        |  SELECT *,
        |    ((a0 | (a0 << 8)) & 16711935) AS a1, ((b0 | (b0 << 8)) & 16711935) AS b1
        |  FROM s),
        |sp2 AS (
        |  SELECT *,
        |    ((a1 | (a1 << 4)) & 252645135) AS a2, ((b1 | (b1 << 4)) & 252645135) AS b2
        |  FROM sp),
        |sp3 AS (
        |  SELECT *,
        |    ((a2 | (a2 << 2)) & 858993459) AS a3, ((b2 | (b2 << 2)) & 858993459) AS b3
        |  FROM sp2),
        |sp4 AS (
        |  SELECT *,
        |    ((a3 | (a3 << 1)) & 1431655765) AS a4, ((b3 | (b3 << 1)) & 1431655765) AS b4
        |  FROM sp3)
        |SELECT l_orderkey, l_linenumber, l_suppkey, (a4 | (b4 << 1)) AS zkey
        |FROM sp4""".stripMargin
  )
}
