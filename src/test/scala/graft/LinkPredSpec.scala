package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Link prediction: hand-computed scores on a 4-cycle, adjacency
  * exclusion, and input canonicalization (orientation/duplicates).
  */
class LinkPredSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark

  private def scores(edges: Seq[(Long, Long)]): Map[(Long, Long), (Long, Long, Long)] = {
    import spark.implicits._
    graft.ext.LinkPred.linkPredictionScores(edges.toDF("u", "v"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
  }

  test("4-cycle: the two diagonals score cn=2, ra=1e6, jaccard=1e6") {
    // 1-2-3-4-1: non-adjacent pairs (1,3) and (2,4) share two degree-2
    // neighbours each: ra = 2*(1e6 div 2), jaccard = 2e6 div (2+2-2)
    val r = scores(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)))
    assert(r == Map(
      (1L, 3L) -> ((2L, 1000000L, 1000000L)),
      (2L, 4L) -> ((2L, 1000000L, 1000000L))), r.toString)
  }

  test("an existing edge is never predicted") {
    // close one diagonal: (1,3) becomes an edge and must vanish; (2,4)
    // keeps its two common neighbours (now degree 3 each on 1 and 3)
    val r = scores(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L)))
    assert(!r.contains((1L, 3L)), r.toString)
    // deg(1)=deg(3)=3, deg(2)=deg(4)=2: ra = 2*(1e6 div 3) = 666666,
    // jaccard = 2e6 div (2+2-2) = 1e6
    assert(r((2L, 4L)) == ((2L, 666666L, 1000000L)), r.toString)
  }

  test("orientation and duplicate edges do not change the result") {
    val base = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val noisy = base.map { case (u, v) => (v, u) } ++ base ++ Seq((2L, 2L))
    assert(scores(base) == scores(noisy))
  }

  test("pairs below minCommon are dropped") {
    // path 1-2-3: (1,3) has exactly one common neighbour -> below 2
    val r = scores(Seq((1L, 2L), (2L, 3L)))
    assert(r.isEmpty, r.toString)
  }

  private def walks(edges: Seq[(Long, Long)], sources: Seq[Long], steps: Int,
                    parts: Int = 4): Seq[(Long, Long, Long)] = {
    import spark.implicits._
    graft.ext.RandomWalk.deterministicWalks(
        edges.toDF("u", "v").repartition(parts),
        sources.toDF("node_id"), steps)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
  }

  test("walks traverse only real edges and are partition-invariant") {
    val edges = (1L to 30L).flatMap(i => Seq((i, i % 7 + 100L), (i, i % 5 + 200L)))
    val es = edges.flatMap { case (u, v) => Seq((u, v), (v, u)) }.toSet
    val a = walks(edges, Seq(1L, 2L, 3L), steps = 5, parts = 1)
    val b = walks(edges, Seq(1L, 2L, 3L), steps = 5, parts = 13)
    assert(a.toSet == b.toSet) // md5 argmin has no merge-order ambiguity
    for (w <- a.map(_._1).distinct) {
      val path = a.filter(_._1 == w).sortBy(_._2).map(_._3)
      path.sliding(2).foreach {
        case Seq(x, y) => assert(es.contains((x, y)), s"walk $w hopped $x->$y")
        case _ =>
      }
    }
  }

  test("a walk at an isolated source emits only its step-0 row") {
    val r = walks(Seq((1L, 2L)), Seq(99L), steps = 3)
    assert(r == Seq((99L, 0L, 99L)), r.toString)
  }

  test("adamic-adar: bit-log weights, hand-computed on the 4-cycle") {
    import spark.implicits._
    // 4-cycle: centers have deg 2 -> floor_log2 = 1 -> each wedge
    // contributes the full 1e6 (AA > RA's 1e6 div 2 per wedge here)
    val r4 = graft.ext.LinkPred.adamicAdarScores(
        Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("u", "v"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(r4 == Map((1L, 3L) -> ((2L, 2000000L)),
      (2L, 4L) -> ((2L, 2000000L))), r4.toString)
    // close the (1,3) diagonal: centers 1 and 3 now have deg 3 ->
    // floor_log2(3) = 1 still; 2,4 keep weight 1e6 per wedge. Add a
    // pendant to push deg(1) to 4 -> floor_log2 = 2 -> 1e6 div 2.
    val r5 = graft.ext.LinkPred.adamicAdarScores(
        Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L), (1L, 9L))
          .toDF("u", "v"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // (2,4): centers 1 (deg 4 -> 500000) and 3 (deg 3 -> 1000000)
    assert(r5((2L, 4L)) == ((2L, 1500000L)), r5.toString)
  }
}
