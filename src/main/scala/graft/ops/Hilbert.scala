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
  * curve order. 16 unrolled planes of branch-free bitwise/conditional
  * arithmetic on built-in codegen'd expressions — no UDF, no custom
  * Expression — and the oracle runs the IDENTICAL 16 stages as chained
  * CTEs generated from the same loop, so the key is hash-exact across
  * engines.
  */
object Hilbert {

  private val Bits = 16
  private val N = 1 << Bits // 65536: both coordinates must be in [0, N)

  /** Stamp the Hilbert index of (`a`, `b`) on the 65536×65536 grid as
    * column `out`; inputs must already be reduced mod 65536.
    *
    * Staged as one PROJECTION PER BIT PLANE, not one nested column
    * expression: each plane reads the previous plane's x/y/d several
    * times, so a single expression tree grows ~5× per level — 4^16
    * nodes by the last plane, which OOMs Catalyst's analyzer (measured
    * here). With a projection per plane every reference is a plain
    * attribute; CollapseProject keeps the stages separate (it refuses
    * to duplicate non-cheap conditionals) and whole-stage codegen fuses
    * them into one pass anyway — the same shape as the oracle's chained
    * CTEs.
    */
  def withHkey(df: DataFrame, a: Column, b: Column, out: String = "hkey"): DataFrame = {
    var cur = df.withColumn("_hx", a.cast("long"))
      .withColumn("_hy", b.cast("long"))
      .withColumn("_hd", lit(0L))
    var s = N / 2
    while (s > 0) {
      val mask = lit(s.toLong)
      cur = cur
        .withColumn("_rx", when(col("_hx").bitwiseAND(mask) > 0, lit(1L)).otherwise(lit(0L)))
        .withColumn("_ry", when(col("_hy").bitwiseAND(mask) > 0, lit(1L)).otherwise(lit(0L)))
        .withColumn("_hd",
          col("_hd") + lit(s.toLong * s) * (col("_rx") * 3).bitwiseXOR(col("_ry")))
        // rotate: ry == 1 keeps the frame, else swap axes, reflecting
        // both coordinates first when rx == 1
        .withColumn("_nx",
          when(col("_ry") === 1, col("_hx"))
            .when(col("_rx") === 1, lit((N - 1).toLong) - col("_hy"))
            .otherwise(col("_hy")))
        .withColumn("_ny",
          when(col("_ry") === 1, col("_hy"))
            .when(col("_rx") === 1, lit((N - 1).toLong) - col("_hx"))
            .otherwise(col("_hx")))
        .withColumn("_hx", col("_nx"))
        .withColumn("_hy", col("_ny"))
      s /= 2
    }
    cur.withColumn(out, col("_hd"))
      .drop("_hx", "_hy", "_hd", "_rx", "_ry", "_nx", "_ny")
  }

  /** Reference scalar implementation (the same algorithm on Longs) —
    * the test oracle for the column form.
    */
  def hkeyScalar(x0: Long, y0: Long): Long = {
    var x = x0; var y = y0; var d = 0L
    var s = N / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s.toLong * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = (N - 1) - x; y = (N - 1) - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

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
