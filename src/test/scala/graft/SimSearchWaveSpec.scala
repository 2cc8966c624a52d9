package graft

import graft.ext.SimSearch
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 embedding-audit wave: matryoshka prefix-ranking overlap and
  * mutual-kNN symmetry — closed-form geometric fixtures.
  */
class SimSearchWaveSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark

  test("matryoshkaOverlap: zero-tail corpus is prefix-perfect; tail-heavy corpus diverges") {
    import spark.implicits._
    // tails are all zero => prefix(2) ranking == full(4) ranking
    val flat = (0L until 20L).map(i =>
      (i, Array((20 - i).toFloat, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val m = SimSearch.matryoshkaOverlap(flat, prefixDims = 2, k = 5).collect()
    assert(m.length == 10)
    m.foreach { r =>
      assert(r.getAs[Long]("n_overlap") == 5L, r.toString)
      assert(r.getAs[Long]("overlap_ppm") == 1000000L)
    }
    // query 0 carries tail signal the prefix cannot see: full top-1 is
    // the tail-aligned candidate, prefix top-1 the head-aligned one
    val twisted = Seq(
      (0L, Array(1f, 0f, 1f, 0f)),   // the query
      (10L, Array(1f, 0f, 0f, 0f)),  // prefix winner (head match)
      (11L, Array(0f, 0f, 2f, 0f))   // full winner (tail match)
    ).toDF("vec_id", "embedding")
    val t = SimSearch.matryoshkaOverlap(twisted, prefixDims = 2, k = 1)
      .collect().head
    assert(t.getAs[Long]("n_overlap") == 0L)
    assert(t.getAs[Long]("overlap_ppm") == 0L)
  }

  test("mutualKnnRate: a hub vector breaks symmetry exactly once") {
    import spark.implicits._
    // dot-NN: v0<->v1 mutual; v2 -> v0 unreciprocated (v0's NN is v1)
    val emb = Seq(
      (0L, Array(10f)), (1L, Array(9f)), (2L, Array(1f)))
      .toDF("vec_id", "embedding")
    val r = SimSearch.mutualKnnRate(emb, auditSize = 3, k = 1).collect().head
    assert(r.getAs[Long]("n_directed") == 3L)
    assert(r.getAs[Long]("n_mutual") == 2L)
    assert(r.getAs[Long]("mutual_ppm") == 666666L)
  }
}
