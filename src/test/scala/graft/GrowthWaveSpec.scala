package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed fixtures for growth accounting, TWAP, and the
  * trigram continuation arithmetic.
  */
class GrowthWaveSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark
  private val weekUs = 7L * 86400000000L

  test("growth accounting: new/retained/resurrected/churned classification") {
    import spark.implicits._
    // u1 active w0,w1,w2; u2 active w0 only; u3 active w0,w2
    val ev = Seq(
      (1L, 0L * weekUs + 1), (1L, 1L * weekUs + 1), (1L, 2L * weekUs + 1),
      (2L, 0L * weekUs + 2),
      (3L, 0L * weekUs + 3), (3L, 2L * weekUs + 3))
      .toDF("user_id", "ts_us")
    val got = ext.Growth.growthAccounting(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == Set(
      (0L, 3L, 0L, 0L, 0L),
      (1L, 0L, 1L, 0L, 2L),
      (2L, 0L, 1L, 1L, 0L),
      (3L, 0L, 0L, 0L, 2L)), got)
  }

  test("TWAP: interval weights and truncating division") {
    import spark.implicits._
    val data = Seq(
      ("m", 0L, 1L, 100L), ("m", 1000L, 2L, 200L), ("m", 3000L, 3L, 999L))
      .toDF("event_type", "ts_us", "event_id", "cents")
    val got = ext.Timeseries.twapByKey(data, "event_type").collect()
    assert(got.length == 1)
    val r = got.head
    // dt_ms = 1 and 2; twap = (100·1 + 200·2) div 3 = 166
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ("m", 2L, 3L, 166L), r)
  }

  test("session trigrams: support floor and prefix continuation ppm") {
    import spark.implicits._
    val ev = (0 until 6).map(i =>
      (1L, i.toLong * 10, i.toLong, Seq("a", "b", "c")(i % 3)))
      .toDF("user_id", "ts_us", "event_id", "event_type")
    val got = ext.Markov.trigramPatterns(ev, minSupport = 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    // only (a,b,c) survives: n=2, prefix (a,b) total 2 → cont 1e6
    assert(got == Set(("a", "b", "c", 2L, 2L, 1000000L)), got)
  }
}
