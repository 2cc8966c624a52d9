package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** I5 `merge_intervals` — per key, merge overlapping *and adjacent*
  * half-open `[start, end)` intervals (reference `_regroupNodeRanges`,
  * src/index/index.cpp:142-153, which repairs RLE runs split across rank
  * boundaries).
  *
  * Spark-first: the classic running-max island formulation — a new island
  * starts when `start` exceeds the running max of all previous `end`s
  * within the key. One shuffle on the key; the window sort is per-key, and
  * the follow-up groupBy reuses the partitioning. No `collect_list` — state
  * per row is O(1), so a skewed key with millions of intervals streams
  * through the window operator (spilling if needed) instead of
  * materializing an array.
  */
object Intervals {

  def merge(df: DataFrame, keyCol: String,
            startCol: String = "range_start", endCol: String = "range_end"): DataFrame = {
    val order = Window.partitionBy(col(keyCol)).orderBy(col(startCol), col(endCol))
    val runningMaxPrevEnd = max(col(endCol))
      .over(order.rowsBetween(Window.unboundedPreceding, -1))
    val break = when(col(startCol) > coalesce(runningMaxPrevEnd, lit(Long.MinValue)), 1)
      .otherwise(0)
    df.withColumn("_brk", break)
      .withColumn("_island", sum(col("_brk")).over(order.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("_island"))
      .agg(min(col(startCol)).as(startCol), max(col(endCol)).as(endCol))
      .drop("_island")
  }

  /** Alternative formulation for heavy skew: streaming merge over
    * per-key SORTED groups (`flatMapSortedGroups`) — O(1) state per key
    * regardless of interval count, no window operator, no array
    * materialization. Same results as `merge` (property-tested); the
    * window form wins when keys are small, this one when a single key
    * holds millions of intervals (the reference's `_regroupNodeRanges`
    * is this exact streaming merge, index.cpp:142-153).
    */
  def mergeSorted(df: DataFrame, keyCol: String,
                  startCol: String = "range_start", endCol: String = "range_end"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val projected = df.select(col(keyCol).cast("long"), col(startCol).cast("long"), col(endCol).cast("long"))
    projected.as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col(startCol), col(endCol)) { (key, it) =>
        new Iterator[(Long, Long, Long)] {
          private var cur: Option[(Long, Long)] = None
          private var out: Option[(Long, Long, Long)] = None
          private def advance(): Unit = {
            while (out.isEmpty && it.hasNext) {
              val (_, s, e) = it.next()
              cur match {
                case None => cur = Some((s, e))
                case Some((cs, ce)) if s <= ce => cur = Some((cs, math.max(ce, e)))
                case Some((cs, ce)) => out = Some((key, cs, ce)); cur = Some((s, e))
              }
            }
            if (out.isEmpty && !it.hasNext && cur.isDefined) {
              out = Some((key, cur.get._1, cur.get._2)); cur = None
            }
          }
          def hasNext: Boolean = { if (out.isEmpty) advance(); out.isDefined }
          def next(): (Long, Long, Long) = {
            if (out.isEmpty) advance()
            val r = out.get; out = None; r
          }
        }
      }
      .toDF(keyCol, startCol, endCol)
  }

  val queries: Map[String, Q] = Map(
    // Synthetic sparse intervals over lineitem: start = 5×orderkey leaves
    // gaps; end = start + quantity (1..50) produces a genuine mix of
    // overlapping, adjacent, and disjoint intervals per supplier.
    "merge_intervals" -> ((s, dir) => {
      val iv = Tables.lineitem(s, dir).select(
        col("l_suppkey").as("k"),
        (col("l_orderkey") * 5).as("range_start"),
        (col("l_orderkey") * 5 + floor(col("l_quantity")).cast("long")).as("range_end"))
      merge(iv, "k")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "merge_intervals" ->
      """WITH iv AS (
        |  SELECT l_suppkey AS k, l_orderkey * 5 AS range_start,
        |         l_orderkey * 5 + CAST(floor(l_quantity) AS BIGINT) AS range_end
        |  FROM lineitem),
        |m AS (
        |  SELECT k, range_start, range_end,
        |    CASE WHEN range_start > COALESCE(MAX(range_end) OVER (
        |           PARTITION BY k ORDER BY range_start, range_end
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |         -9223372036854775808) THEN 1 ELSE 0 END AS brk
        |  FROM iv),
        |isl AS (
        |  SELECT k, range_start, range_end,
        |    SUM(brk) OVER (PARTITION BY k ORDER BY range_start, range_end
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM m)
        |SELECT k, min(range_start) AS range_start, max(range_end) AS range_end
        |FROM isl GROUP BY k, island""".stripMargin
  )
}
