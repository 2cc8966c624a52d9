package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Integer PageRank: hand-computed values on a tiny graph, partition
  * invariance (the determinism claim the oracle relies on), and rank
  * ordering by in-link mass.
  */
class PageRankSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark

  private def ranksOf(edges: Seq[(Long, Long)], iters: Int,
                      parts: Int = 4): Map[Long, Long] = {
    import spark.implicits._
    val df = edges.toDF("src", "dst").repartition(parts)
    val (r, unpersist) = graft.ext.PageRank.pageRankIntStamped(df, iters)
    val out = r.collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    unpersist()
    out
  }

  test("one iteration matches the hand-computed integer arithmetic") {
    // 1→2, 1→3, 2→3; N=3, scale=1e6: r0 = 333333 each,
    // base = (15e6 div 100) div 3 = 50000
    // rank(1) = 50000 (no in-links)
    // rank(2) = 50000 + 85*(333333 div 2) div 100 = 50000 + 141666 = 191666
    // rank(3) = 50000 + 85*(166666 + 333333) div 100 = 50000 + 424999 = 474999
    val r = ranksOf(Seq((1L, 2L), (1L, 3L), (2L, 3L)), iters = 1)
    assert(r == Map(1L -> 50000L, 2L -> 191666L, 3L -> 474999L), r.toString)
  }

  test("results are partition-invariant (integer arithmetic has no merge-order ambiguity)") {
    // 7 iterations also crosses the every-5-rounds lineage checkpoint
    val edges = (1L to 40L).map(i => (i, i % 7 + 100L)) ++ Seq((100L, 101L), (101L, 102L))
    val a = ranksOf(edges, iters = 7, parts = 1)
    val b = ranksOf(edges, iters = 7, parts = 13)
    assert(a == b)
  }

  test("a node with strictly more in-link mass outranks its peer") {
    // many sources point at 100; one points at 200
    val edges = (1L to 10L).map(i => (i, 100L)) :+ (11L, 200L)
    val r = ranksOf(edges, iters = 2)
    assert(r(100L) > r(200L), r.toString)
    assert(r(200L) > r(1L), r.toString) // any in-link beats none
  }
}
