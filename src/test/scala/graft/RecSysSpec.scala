package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** RankFusion RRF arithmetic and RecSys item-item Jaccard: hand-computed
  * ground truths, absence handling, partition invariance.
  */
class RecSysSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark

  test("RRF: shared docs sum both reciprocals, single-list docs get one") {
    import spark.implicits._
    // query 1: list A ranks docs 10,11; list B ranks 11,12
    val a = Seq((1L, 1, 10L), (1L, 2, 11L)).toDF("q_id", "rank", "c_id")
    val b = Seq((1L, 1, 11L), (1L, 2, 12L)).toDF("q_id", "rank", "c_id")
    val got = graft.ext.RankFusion.rrfFuse(a, b, k = 10).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    // scores: doc10 = 1e6 div 61 = 16393; doc12 = 1e6 div 62 = 16129
    // doc11 = 1e6 div 62 + 1e6 div 61 = 32522 → order 11, 10, 12
    assert(got.toSeq == Seq((1L, 1, 11L, 32522L), (1L, 2, 10L, 16393L),
      (1L, 3, 12L, 16129L)))
  }

  test("RRF of a list with itself doubles scores and preserves order") {
    import spark.implicits._
    val a = (1 to 5).map(r => (1L, r, 100L + r)).toDF("q_id", "rank", "c_id")
    val got = graft.ext.RankFusion.rrfFuse(a, a, k = 5).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    (1 to 5).foreach { r =>
      val row = got.find(_._1 == r).get
      assert(row._2 == 100L + r && row._3 == 2L * (1000000L / (60 + r)))
    }
  }

  test("item similarity: hand-computed Jaccard on three baskets") {
    import spark.implicits._
    // baskets: {1,2}, {1,2}, {1,3} → orders(1)=3, orders(2)=2, orders(3)=1
    // J(1,2) = 2/3, J(1,3) = 1/3, J(2,3) = 0 shared baskets (no pair row)
    val b = Seq((10L, 1L), (10L, 2L), (20L, 1L), (20L, 2L), (30L, 1L), (30L, 3L))
      .toDF("basket_id", "item_id")
    val got = graft.ext.RecSys.itemSimilarityTopK(b, k = 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    val js12 = 2000000L / 3 // (1e6*2) div (3+2-2)
    val js13 = 1000000L / 3
    assert(got == Set(
      (1L, 1, 2L, 2L, js12), (1L, 2, 3L, 1L, js13),
      (2L, 1, 1L, 2L, js12), (3L, 1, 1L, 1L, js13)))
  }

  test("item similarity is partition-invariant and duplicate-line tolerant") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(400)((rnd.nextInt(40).toLong, rnd.nextInt(25).toLong))
    val dup = rows ++ rows.take(50) // duplicate lines must not change basket sets
    def run(parts: Int) = {
      val df = dup.toDF("basket_id", "item_id").repartition(parts)
      graft.ext.RecSys.itemSimilarityTopK(df, k = 3).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    }
    assert(run(1) == run(7))
  }

  test("intra-list diversity: identical-basket recs score ILD 0, disjoint 1e6") {
    import spark.implicits._
    // items 1,2,3 always together -> each list is the other two with
    // js = 1e6 between them -> ILD = 0. Item 7 co-occurs once with 1
    // and once with 4 (4 never with 1): list(7) = {1, 4}, js(1,4) = 0
    // -> ILD = 1e6.
    val b = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (20L, 1L), (20L, 2L), (20L, 3L),
      (30L, 7L), (30L, 1L), (30L, 2L), (30L, 3L),
      (40L, 7L), (40L, 4L))
      .toDF("basket_id", "item_id")
    val got = graft.ext.RecSys.intraListDiversity(b, k = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(7L)._2 > 0L, got.toString)
    // item 1's top-2 are 2 and 3 (js ties broken by id): both pairs in
    // identical baskets -> dissimilarity = 1e6 - js(2,3)
    val js23 = 1000000L * 3L / 3L // {10,20,30} all shared
    assert(got(1L) == ((1L, 1000000L - js23)), got.toString)
  }
}
