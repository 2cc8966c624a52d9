package graft

import graft.ext.KMeans
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KMeansSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("two well-separated directions cluster apart, co-directional vectors together") {
    import spark.implicits._
    // axis-e1 cone vs axis-e2 cone in 4 dims, unit-ish vectors
    def v(main: Int, eps: Float): Array[Float] = {
      val a = Array.fill(4)(eps); a(main) = 0.99f; a
    }
    val docs = (1L to 10L).map(i => (i, v(0, 0.01f * (i % 3)))) ++
      (11L to 20L).map(i => (i, v(1, 0.01f * (i % 3))))
    val got = KMeans.kmeansAssign2(docs.toDF("vec_id", "embedding"), 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val g1 = (1L to 10L).map(got).toSet
    val g2 = (11L to 20L).map(got).toSet
    assert(g1.size == 1 && g2.size == 1 && g1 != g2,
      s"each cone must land in one cluster: $got")
  }

  test("assignment is invariant to input partitioning") {
    val e = Tables.embeddings(spark, sf)
    val a = KMeans.kmeansAssign2(e, 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val b = KMeans.kmeansAssign2(e.repartition(13), 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(a == b)
    spark.catalog.clearCache()
  }

  test("every vector is assigned exactly once and to a live centroid") {
    val e = Tables.embeddings(spark, sf)
    val out = KMeans.kmeansAssign2(e, 8)
    val n = e.count()
    assert(out.count() == n)
    assert(out.select("vec_id").distinct().count() == n)
    assert(out.select("cluster_id").distinct().count() <= 8)
    spark.catalog.clearCache()
  }
}
