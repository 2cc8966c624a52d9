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

  test("semanticDedup: survivors + dropped partition the corpus by the keep rule") {
    import graft.functions.QuantizedDot.{quantize, quantizedDot}
    val e = Tables.embeddings(spark, sf)
    val tau = 0.4
    val kept = ext.SemDedup.semanticDedup(e, k = 8, threshold = tau)
    // ground truth, computed the slow way: same-cluster pairs above the
    // threshold, drop the larger id of each
    val asg = KMeans.kmeansAssign2(e, 8).select(col("vec_id"), col("cluster_id"))
    val m = asg.join(e.select(col("vec_id"), quantize(col("embedding")).as("qv")), "vec_id")
    val droppedTruth = m.as("a").join(m.as("b"),
        col("a.cluster_id") === col("b.cluster_id") && col("a.vec_id") < col("b.vec_id"))
      .filter(quantizedDot(col("a.qv"), col("b.qv")) >= math.round(tau * 1e6))
      .select(col("b.vec_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    val keptIds = kept.collect().map(_.getLong(0)).toSet
    val allIds = e.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(keptIds == allIds -- droppedTruth,
      s"survivors must be exactly corpus minus dropped (dropped=${droppedTruth.size})")
    // the keep rule always retains the minimal id of any duplicate pair,
    // so no cluster empties out
    assert(kept.select("cluster_id").distinct().count() ==
      asg.select("cluster_id").distinct().count())
    spark.catalog.clearCache()
  }
}
