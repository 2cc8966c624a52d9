package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Group-relative reward prep: GRPO advantage histogram and best-of-n
  * gain bands.
  */
class RewardOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark

  private def events(rows: Seq[(Long, String, Double)]) = {
    import spark.implicits._
    rows.toDF("user_id", "event_type", "value")
  }

  test("grpo advantage: mean-centered signs/magnitudes, singleton at (0,0)") {
    val e = events(Seq(
      (1L, "purchase", 1.00), (1L, "purchase", 3.00), // mean 200c: adv -100/+100
      (2L, "purchase", 5.00),                          // singleton: adv 0
      (3L, "click", 9.99)))                            // not a reward sample
    val got = graft.ext.RewardOps.grpoAdvantageHistogram(e).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // |adv| = 100 cents -> band floor(log2(101)) = 6
    assert(got((1, 6L)) == (1L, 100L))
    assert(got((-1, 6L)) == (1L, 100L))
    assert(got((0, 0L)) == (1L, 0L))
    assert(got.size == 3)
  }

  test("best-of-n gain: argmax lead over the group mean, banded by size") {
    val e = events(Seq(
      (1L, "purchase", 1.00), (1L, "purchase", 3.00), // n=2: best 300, gain 100.000
      (2L, "purchase", 5.00)))                         // n=1: gain 0
    val got = graft.ext.RewardOps.bestOfNGain(e).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == (1L, 300L, 100000L)) // band floor(log2 2)=1
    assert(got(0L) == (1L, 500L, 0L))      // band floor(log2 1)=0
  }

  test("advantage numerators are exact: histogram masses balance per group") {
    // within one group sum(positive mag·n) == sum(negative mag·n) up to
    // truncation; with n | adv_num exact here, the masses balance exactly
    val e = events(Seq(
      (7L, "purchase", 1.00), (7L, "purchase", 2.00), (7L, "purchase", 3.00)))
    val rows = graft.ext.RewardOps.grpoAdvantageHistogram(e).collect()
    val pos = rows.filter(_.getInt(0) == 1).map(_.getLong(3)).sum
    val neg = rows.filter(_.getInt(0) == -1).map(_.getLong(3)).sum
    assert(pos == neg && pos == 100L)
  }
}
