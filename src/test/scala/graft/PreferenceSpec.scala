package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Bradley–Terry MM: hand-checked comparison extraction, agreement with
  * an independent BigInt reference implementation of the scaled-integer
  * MM iteration, dominance sanity, and partition invariance.
  */
class PreferenceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark

  private def scored(rows: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("basket_id", "item_id", "score")
  }

  test("comparisons: within-basket decided pairs, ties dropped, scores summed") {
    // basket 1: items 1 (q=5), 2 (q=3), 3 (q=5) → pairs (1,2) 1 beats 2,
    // (1,3) tie dropped, (2,3) 3 beats 2
    // basket 2: item 1 split across two rows (2+1=3) vs item 2 (q=4) → 2 beats 1
    val df = scored(Seq(
      (1L, 1L, 5L), (1L, 2L, 3L), (1L, 3L, 5L),
      (2L, 1L, 2L), (2L, 1L, 1L), (2L, 2L, 4L)))
    val m = graft.ext.Preference.bradleyTerry(df, iters = 0, k = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // item → (n_comp, wins): 1 → 2 comps, 1 win; 2 → 3 comps, 1 win; 3 → 1 comp, 1 win
    assert(m == Map(1L -> (2L, 1L), 2L -> (3L, 1L), 3L -> (1L, 1L)))
  }

  test("MM iterations agree with an independent BigInt reference") {
    // fixed comparison structure over 4 items, mixed baskets
    val df = scored(Seq(
      (1L, 1L, 9L), (1L, 2L, 4L), (1L, 3L, 2L),
      (2L, 1L, 7L), (2L, 4L, 8L),
      (3L, 2L, 5L), (3L, 3L, 6L), (3L, 4L, 1L),
      (4L, 1L, 3L), (4L, 2L, 8L),
      (5L, 3L, 4L), (5L, 4L, 4L))) // tie → dropped
    val got = graft.ext.Preference.bradleyTerry(df, iters = 3, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(4))).toMap

    // independent reference: aggregate pairs, then 3 scaled-integer MM
    // rounds with BigInt arithmetic (truncating division)
    val S2 = BigInt("1000000000000")
    // (a, b) -> (n, winsA, winsB) with a < b, from the same basket logic
    val pairsFixed = Map(
      (1L, 2L) -> (2L, 1L, 1L),  // basket 1: 9>4; basket 4: 3<8
      (1L, 3L) -> (1L, 1L, 0L),  // basket 1: 9>2
      (1L, 4L) -> (1L, 0L, 1L),  // basket 2: 7<8
      (2L, 3L) -> (2L, 1L, 1L),  // basket 1: 4>2; basket 3: 5<6
      (2L, 4L) -> (1L, 1L, 0L),  // basket 3: 5>1
      (3L, 4L) -> (1L, 1L, 0L))  // basket 3: 6>1 (basket 5 tie dropped)
    val items = Seq(1L, 2L, 3L, 4L)
    val wins = items.map(i => i -> pairsFixed.collect {
      case ((a, _), (_, wa, _)) if a == i => wa
      case ((_, b), (_, _, wb)) if b == i => wb
    }.sum).toMap
    var w = items.map(i => i -> BigInt(1000000)).toMap
    (0 until 3).foreach { _ =>
      val d = items.map { i =>
        i -> pairsFixed.collect {
          case ((a, b), (n, _, _)) if a == i || b == i =>
            BigInt(n) * S2 / (w(a) + w(b))
        }.sum
      }.toMap
      w = items.map(i => i -> BigInt(wins(i)) * S2 / d(i).max(BigInt(1))).toMap
    }
    items.foreach { i =>
      assert(got(i) == w(i).toLong, s"item $i: got ${got(i)}, ref ${w(i)}")
    }
  }

  test("an undefeated item ranks first; strengths are partition-invariant") {
    val base = Seq(
      (1L, 10L, 9L), (1L, 20L, 1L),
      (2L, 10L, 8L), (2L, 30L, 2L),
      (3L, 20L, 5L), (3L, 30L, 4L),
      (4L, 10L, 7L), (4L, 20L, 3L))
    val a = graft.ext.Preference.bradleyTerry(scored(base), 3, 10).collect()
    assert(a.head.getLong(0) == 10L, "undefeated item must rank first")
    val b = graft.ext.Preference.bradleyTerry(
      scored(base).repartition(7), 3, 10).collect()
    assert(a.map(_.toSeq.toList).toList == b.map(_.toSeq.toList).toList,
      "result must not depend on partitioning")
  }

  test("dpoPairs orients chosen/rejected, filters margin, enforces the per-item budget") {
    // basket 1: 10 (q=9) vs 20 (q=1) margin 8; 10 vs 30 (q=6) margin 3
    //           20 vs 30 margin 5
    // basket 2: 10 (q=9) vs 40 (q=2) margin 7
    // basket 3: 10 (q=9) vs 50 (q=8) margin 1
    val df = scored(Seq(
      (1L, 10L, 9L), (1L, 20L, 1L), (1L, 30L, 6L),
      (2L, 10L, 9L), (2L, 40L, 2L),
      (3L, 10L, 9L), (3L, 50L, 8L)))
    // minMargin 3 drops the (10,50) margin-1 pair; budget 2 keeps item
    // 10's TWO largest margins (8 then 7), dropping its margin-3 pair
    val got = graft.ext.Preference.dpoPairs(df, minMargin = 3L, perItemBudget = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(
      (1L, 10L, 20L, 8L),   // item 10's largest margin
      (2L, 10L, 40L, 7L),   // its second — budget reached
      (1L, 30L, 20L, 5L)))  // 30 beat 20 (6 > 1)
  }

  test("marginDistribution buckets by floor-log2 and counts exactly") {
    // margins: 8 (bucket 3), 3 (bucket 1), 5 (bucket 2), 7 (bucket 2), 1 (bucket 0)
    val df = scored(Seq(
      (1L, 10L, 9L), (1L, 20L, 1L), (1L, 30L, 6L),
      (2L, 10L, 9L), (2L, 40L, 2L),
      (3L, 10L, 9L), (3L, 50L, 8L)))
    val m = graft.ext.Preference.marginDistribution(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(m(3L) == (1L, 8L, 8L, 8L))
    assert(m(2L) == (2L, 5L, 7L, 6L))   // margins 5, 7 → mean 6
    assert(m(1L) == (1L, 3L, 3L, 3L))
    assert(m(0L) == (1L, 1L, 1L, 1L))
  }

  test("raterAgreement: unanimous and split pairs land in their bands") {
    // pair (1,2): 1 beats 2 twice → decisiveness 1e6, band 10
    // pair (3,4): split 1-1 → wait, ties on TOTAL are dropped per
    // basket; two baskets with opposite outcomes → dec 500000, band 5
    val df = scored(Seq(
      (1L, 1L, 5L), (1L, 2L, 3L),
      (2L, 1L, 5L), (2L, 2L, 3L),
      (3L, 3L, 9L), (3L, 4L, 1L),
      (4L, 3L, 1L), (4L, 4L, 9L)))
    val m = graft.ext.Preference.raterAgreement(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(m(10L) == (1L, 2L, 1000000L))
    assert(m(5L) == (1L, 2L, 500000L))
  }

  test("transitivityAudit counts the rock-paper-scissors cycle once") {
    // majority edges: 1→2, 2→3, 3→1 (a perfect Condorcet cycle) plus a
    // transitive pair 1→4, 2→4 (no cycle)
    val df = scored(Seq(
      (1L, 1L, 9L), (1L, 2L, 1L),
      (2L, 2L, 9L), (2L, 3L, 1L),
      (3L, 3L, 9L), (3L, 1L, 1L),
      (4L, 1L, 9L), (4L, 4L, 1L),
      (5L, 2L, 9L), (5L, 4L, 1L)))
    val r = graft.ext.Preference.transitivityAudit(df).collect().head
    assert(r.getLong(0) == 5L, "majority edges")
    assert(r.getLong(1) == 1L, "exactly one directed 3-cycle")
  }

  test("transitivityAudit: a consistent total order has zero cycles") {
    val df = scored(Seq(
      (1L, 1L, 9L), (1L, 2L, 5L), (1L, 3L, 1L),
      (2L, 1L, 9L), (2L, 3L, 1L)))
    val r = graft.ext.Preference.transitivityAudit(df).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 0L)
  }

  test("strengthCalibration bands cover the pairs and gap is |obs - pred|") {
    val df = scored(Seq(
      (1L, 1L, 9L), (1L, 2L, 4L), (1L, 3L, 2L),
      (2L, 1L, 7L), (2L, 4L, 8L),
      (3L, 2L, 5L), (3L, 3L, 6L), (3L, 4L, 1L),
      (4L, 1L, 3L), (4L, 2L, 8L)))
    val rows = graft.ext.Preference.strengthCalibration(df, iters = 3).collect()
    assert(rows.forall(r => r.getLong(0) >= 0L && r.getLong(0) <= 10L))
    // every aggregated comparison lands in exactly one band
    assert(rows.map(_.getLong(1)).sum == 8L)
    rows.foreach { r =>
      assert(r.getLong(4) == math.abs(r.getLong(2) - r.getLong(3)))
      assert(r.getLong(2) >= 0L && r.getLong(2) <= 1000000L)
    }
  }
}
