package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed fixtures for the round-9 analytics wave: attribution
  * (last-touch window + linear split arithmetic), RFM quartile grid,
  * winsorize rank bounds, unpivot sums, and autocorrelation moments.
  */
class AnalyticsWaveSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark

  private def events(rows: Seq[(Long, Long, Long, String, Double)]) = {
    import spark.implicits._
    rows.toDF("user_id", "ts_us", "event_id", "event_type", "value")
  }

  test("last-touch: window boundary, same-ts tie rule, no-touch exclusion") {
    val day = 86400000000L
    val ev = events(Seq(
      // user 1: click then view then purchase → view wins
      (1L, 1000L, 1L, "click", 0.0),
      (1L, 2000L, 2L, "view", 0.0),
      (1L, 3000L, 3L, "purchase", 10.00),
      // user 2: touch is 8 days before the purchase → outside lookback
      (2L, 5000L, 4L, "click", 0.0),
      (2L, 5000L + 8 * day, 5L, "purchase", 99.00),
      // user 3: click and view at the SAME ts → higher channel code (view)
      (3L, 100L, 6L, "click", 0.0),
      (3L, 100L, 7L, "view", 0.0),
      (3L, 200L, 8L, "purchase", 5.00),
      // user 4: plain click attribution
      (4L, 10L, 9L, "click", 0.0),
      (4L, 20L, 10L, "purchase", 2.50),
      // user 5: purchase with no preceding touch at all
      (5L, 50L, 11L, "purchase", 7.00)))
    val got = ext.Attribution.lastTouch(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("view", 2L, 1500L), ("click", 1L, 250L)), got)
  }

  test("linear attribution: strict-before touches, truncating equal split") {
    val ev = events(Seq(
      (1L, 1L, 1L, "click", 0.0),
      (1L, 2L, 2L, "view", 0.0),
      (1L, 3L, 3L, "click", 0.0),
      (1L, 10L, 4L, "purchase", 1.00), // 100 cents over 3 touches
      (1L, 10L, 5L, "view", 0.0)))     // same-ts touch: strict <, excluded
    val got = ext.Attribution.linear(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // 100 * 1e6 div 3 = 33_333_333 per credit (truncated)
    assert(got == Set(("click", 2L, 66666666L), ("view", 1L, 33333333L)), got)
  }

  test("RFM: one customer per quartile on all three axes") {
    import spark.implicits._
    // cust i: i orders, each $i, all on day 10*i after 1992-01-01 →
    // f-quartile = i, m-quartile = i, recency-quartile = 5 - i
    val rows = for {
      i <- 1 to 4
      j <- 1 to i
    } yield (i.toLong, i * 10000L + j,
      java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(1992, 1, 1).plusDays(10L * i).atStartOfDay()),
      i.toDouble)
    val orders = rows.toDF("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    val got = ext.Rfm.segments(orders).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      ("4-1-1", 1L, 100L), ("3-2-2", 1L, 400L),
      ("2-3-3", 1L, 900L), ("1-4-4", 1L, 1600L)), got)
  }

  test("winsorize: exact rank bounds clip one row on each side") {
    import spark.implicits._
    // 20 values: 1..19 cents plus an outlier 100 → lo bound = 2 (gpos 1),
    // hi bound = 19 (gpos 18); winsorized sum = 189 + 2 + 19 = 210
    val vals = (1 to 19).map(_.toLong) :+ 100L
    val li = vals.zipWithIndex.map { case (v, i) =>
      ("A", v.toDouble / 100.0, i.toLong, 1) }
      .toDF("l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber")
    val got = ops.Reshape.winsorize(li).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ("A", 20L, 1L, 1L, 210L), r)
    spark.catalog.clearCache()
  }

  test("winsorize: groups below the 20-row floor are excluded, not NULL-clipped") {
    import spark.implicits._
    val vals = ((1 to 19).map(_.toLong) :+ 100L).map(("A", _)) ++
      (1 to 5).map(i => ("B", i.toLong)) // 5 rows: no well-defined p95 rank
    val li = vals.zipWithIndex.map { case ((g, v), i) =>
      (g, v.toDouble / 100.0, i.toLong, 1) }
      .toDF("l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber")
    val got = ops.Reshape.winsorize(li).collect()
    assert(got.map(_.getString(0)).toSet == Set("A"), got.mkString(","))
    spark.catalog.clearCache()
  }

  test("unpivot: four metrics with exact integer encodings") {
    import spark.implicits._
    val li = Seq(
      ("A", 1.00, 2.00, 0.05, 0.01),
      ("A", 3.00, 4.00, 0.10, 0.02))
      .toDF("l_returnflag", "l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val got = ops.Reshape.unpivotMeasures(li).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(
      ("quantity_cents", 2L, 400L), ("price_cents", 2L, 600L),
      ("discount_bp", 2L, 1500L), ("tax_bp", 2L, 300L)), got)
  }

  test("autocorr moments: exact lag-1 values and the zero-variance null guard") {
    import spark.implicits._
    // daily counts 1, 2, 3 on consecutive days (one input row per event)
    val days = Seq(1L, 2L, 2L, 3L, 3L, 3L).toDF("day")
    val got = ext.Timeseries.autocorrMoments(days, maxLag = 2).collect()
      .map(r => r.getLong(0) -> r).toMap
    val l1 = got(1L)
    assert((l1.getLong(1), l1.getLong(2), l1.getLong(3), l1.getLong(4),
      l1.getLong(5), l1.getLong(6)) == (2L, 5L, 3L, 8L, 13L, 5L), l1)
    assert(l1.getDouble(7) == 1.0, l1)
    // lag 2 has a single pair → both variance terms are 0 → r is null
    val l2 = got(2L)
    assert(l2.getLong(1) == 1L && l2.isNullAt(7), l2)
  }
}
