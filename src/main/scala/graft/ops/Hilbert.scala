package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hilbert-curve clustering key — the second space-filling-curve layout
  * beside [[ZOrder]]: the Hilbert index visits every cell of the 2^16 ×
  * 2^16 grid with UNIT steps (adjacent indexes are adjacent cells), so
  * range-partitioning by it gives strictly better worst-case locality
  * than Morton order, whose bit-interleave takes long diagonal jumps at
  * power-of-two seams — the reason table formats that optimize
  * multi-dimensional clustering offer Hilbert alongside z-order.
  *
  * The index is the classic per-bit state machine (Hilbert 1891;
  * Warren, Hacker's Delight §16): for each bit plane s from high to
  * low, the quadrant (rx, ry) contributes s²·((3·rx) XOR ry), then the
  * frame rotates/reflects so the next plane walks ITS quadrant in
  * curve order. Computed by the [[graft.functions.HilbertKey]] codegen
  * expression (a 16-iteration generated loop — see [[withHkey]] for
  * why the built-in-expression formulations lose); the oracle runs the
  * identical 16 planes as chained CTEs generated from the same loop
  * bounds, so the key is hash-exact across engines.
  */
object Hilbert {

  private val Bits = 16
  private val N = 1 << Bits // 65536: both coordinates must be in [0, N)

  /** Stamp the Hilbert index of (`a`, `b`) on the 65536×65536 grid as
    * column `out`; inputs must already be reduced mod 65536.
    *
    * Backed by the [[graft.functions.HilbertKey]] codegen expression —
    * the third formulation tried, and the measured lesson in the
    * expression-ladder preference order: ONE nested column expression
    * grows ~5× per bit plane (4^16 nodes, OOMs the analyzer); one
    * PROJECTION per plane analyzes fine but fuses into an enormous
    * generated method (8.2 s for the sf0.1 lineitem layout where
    * z-order costs 0.55 s — codegen size, not arithmetic); the custom
    * expression emits the 16-iteration loop directly and runs at
    * scalar cost. The DuckDB oracle keeps the unrolled-CTE
    * formulation, so engine-exactness is unchanged.
    */
  def withHkey(df: DataFrame, a: Column, b: Column, out: String = "hkey"): DataFrame =
    df.withColumn(out,
      graft.functions.HilbertKey.hilbertKey(a.cast("long"), b.cast("long")))

  /** Reference scalar implementation — delegates to the expression's
    * own interpreter so the two can never drift.
    */
  def hkeyScalar(x0: Long, y0: Long): Long = graft.functions.HilbertKey.index(x0, y0)

  /** Cluster `df` for (a, b) locality: stamp the Hilbert key and
    * range-partition + sort by it — the write-side layout step.
    */
  def cluster(df: DataFrame, a: Column, b: Column): DataFrame =
    withHkey(df, a, b)
      .repartitionByRange(col("hkey"))
      .sortWithinPartitions(col("hkey"))

  val queries: Map[String, Q] = Map(
    "hilbert_layout" -> ((s, dir) =>
      cluster(
        Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey")),
        pmod(col("l_suppkey"), lit(65536)), pmod(col("l_linenumber"), lit(65536))))
  )

  /** The oracle unrolls the same 16 bit planes as chained CTEs —
    * generated from the same loop bounds, so the two sides cannot
    * drift.
    */
  val oracleSql: Map[String, String] = Map(
    // Fresh x<k>/y<k>/d<k> names per stage (no alias-shadowing
    // ambiguity), and the quadrant digit (3·rx) XOR ry written
    // arithmetically (rx=1 → 3−ry, else ry) so only portable & > − +
    // operators appear.
    "hilbert_layout" -> {
      val stages = new StringBuilder
      stages.append(
        """WITH s0 AS (
          |  SELECT l_orderkey, l_linenumber, l_suppkey,
          |    CAST(l_suppkey % 65536 AS BIGINT) AS x0, CAST(l_linenumber % 65536 AS BIGINT) AS y0,
          |    CAST(0 AS BIGINT) AS d0
          |  FROM lineitem)""".stripMargin)
      var s = N / 2
      var k = 0
      while (s > 0) {
        val n1 = (N - 1).toLong
        val (x, y, d) = (s"x$k", s"y$k", s"d$k")
        stages.append(s""",
          |s${k + 1} AS (
          |  SELECT l_orderkey, l_linenumber, l_suppkey,
          |    CASE WHEN ($y & $s) > 0 THEN $x
          |         WHEN ($x & $s) > 0 THEN $n1 - $y ELSE $y END AS x${k + 1},
          |    CASE WHEN ($y & $s) > 0 THEN $y
          |         WHEN ($x & $s) > 0 THEN $n1 - $x ELSE $x END AS y${k + 1},
          |    $d + ${s.toLong * s} * (CASE WHEN ($x & $s) > 0
          |        THEN 3 - (CASE WHEN ($y & $s) > 0 THEN 1 ELSE 0 END)
          |        ELSE (CASE WHEN ($y & $s) > 0 THEN 1 ELSE 0 END) END) AS d${k + 1}
          |  FROM s$k)""".stripMargin)
        s /= 2
        k += 1
      }
      stages.append(s"\nSELECT l_orderkey, l_linenumber, l_suppkey, d$k AS hkey FROM s$k")
      stages.toString
    }
  )
}
