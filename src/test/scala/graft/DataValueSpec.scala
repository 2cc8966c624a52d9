package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Leave-one-source-out data valuation over the bigram backoff model. */
class DataValueSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark

  private def docs(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "source")
  }

  test("redundant sources score zero uplift; unique content pays the exact LOO price") {
    // A and B both carry the one-token doc "x": each one's LOO model
    // still knows (<s>, x) from the other, so uplift is exactly 0.
    // C alone carries "z": its LOO model never saw z → the OOV tier.
    // Hand arithmetic (mlog2: 2→1000, 3→1500):
    //   A full = mlog2(3) − mlog2(2) = 500;  A loo = mlog2(2) − mlog2(1) = 1000
    //   C full = mlog2(3) − mlog2(1) = 1500; C loo = 2000 + mlog2(2) = 3000
    val d = docs(Seq(
      (0L, "x", "A"), (1L, "x", "B"), (2L, "z", "C")))
    val rows = graft.ext.DataValue.looSourceValue(d).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows("A") == (1L, 500L, 1000L, 500L))
    assert(rows("B") == (1L, 500L, 1000L, 500L))
    assert(rows("C") == (1L, 1500L, 3000L, 1500L))
    assert(rows("C")._4 > rows("A")._4,
      "unique content must out-value shared content")
  }

  test("a fully duplicated source carries zero uplift across all tiers") {
    // two sources with IDENTICAL multi-token docs: every (u,v) type
    // survives either source's removal with positive count, so both
    // uplifts equal the same count-shift value and neither is OOV
    val d = docs(Seq(
      (0L, "a b a", "s1"), (1L, "a b a", "s2")))
    val rows = graft.ext.DataValue.looSourceValue(d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(4))).toMap
    assert(rows("s1") == rows("s2"), "symmetric sources must value equally")
    assert(rows("s1")._1 == 3L)
  }
}
