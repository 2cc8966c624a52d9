package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** AQE must never change RESULTS, only plans — pinned for the
  * session's most plan-sensitive operators (grouped selection, the
  * position-scan ranking, the shifted-activity self-join, HITS'
  * persisted half-steps): each runs with adaptive execution disabled
  * and re-enabled, and the row multisets must match exactly.
  */
class AqeEquivalenceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def rows(name: String): Seq[String] = {
    val df = SparkEntry.queries(name)(spark, sf)
    val out = df.collect().map(_.toString).sorted.toSeq
    spark.catalog.clearCache()
    out
  }

  test("AQE on/off produces identical rows for the plan-sensitive operators") {
    val targets = Seq("winsorize_by_group", "rfm_segments",
      "growth_accounting", "graph_hits", "grouped_median_exact",
      // round-10 position-scan consumers: deciles and ranks must not
      // shift if AQE coalesces the range exchange differently
      "lift_gains_deciles", "gini_coefficient", "quantile_normalize",
      // round-11 join-heavy media ops: the aHash banded candidate join
      // + two-sided hamming fetch, the md5-family double aggregate, and
      // the fused single-shuffle CSR route (partition-id arithmetic
      // must survive whatever AQE does around the persisted layout)
      "multimodal_image_ahash_pairs", "multimodal_dedup_exact",
      "csr_secondary_index",
      // continuation-session wave: the two-phase Zipf rank + bounded
      // lag window (rank positions must not shift under AQE exchange
      // coalescing), the type-join KN table, the list self-join ILD
      // chain, and the persisted-moments PCA iteration
      "lm_zipf_bitlog", "lm_kn_continuation", "recsys_ild",
      "embedding_pca_power")
    val saved = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      val withAqe = targets.map(n => n -> rows(n)).toMap
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      targets.foreach { n =>
        assert(rows(n) == withAqe(n), s"$n drifted with AQE off")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", saved)
  }
}
