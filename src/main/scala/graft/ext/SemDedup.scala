package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic deduplication: cluster the embedding corpus, then prune
  * near-duplicate vectors WITHIN each cluster — the published
  * SemDeDup recipe (Abbas et al. 2023, arXiv:2303.09540): k-means the
  * embeddings, compare pairs only inside a cluster (near-dups land in
  * the same cell, so the n² pair space collapses to Σ|cluster|²), and
  * keep one representative per duplicate neighborhood.
  *
  * Everything is INTEGER-EXACT so the full program hash-matches DuckDB:
  *
  *  - clustering is [[KMeans.kmeansAssign2]] (md5 seeds, quantized-dot
  *    argmax, integer centroid update — already oracled);
  *  - the within-cluster pair test is the codegen quantized dot vs
  *    `round(τ·1e6)` on unit vectors (cos ≈ dot_q/1e6), ties impossible
  *    by the strict `vec_id <` ordering;
  *  - the keep rule is deterministic: a vector is DROPPED iff some
  *    same-cluster vector with a SMALLER vec_id clears the cosine
  *    threshold against it — so each duplicate neighborhood survives
  *    through its minimal id, engine-portably.
  *
  * Scale shape: assignment never shuffles the corpus (literal
  * centroids, argmax in the scan stage); the only data-sized exchange
  * is the cluster-keyed self-join, whose cost is Σ|cluster|²·d — the
  * SemDeDup contract is that k grows with n (k ≈ √n at 100 TB) so
  * clusters stay bounded; `k` is the knob. The drop set rides a
  * broadcast-sized distinct (bounded by the duplicate count), and the
  * final anti-join is broadcast.
  */
object SemDedup {

  import graft.functions.QuantizedDot.{quantize, quantizedDot}

  /** Surviving (vec_id, cluster_id) after dropping every vector with a
    * smaller-id same-cluster neighbor at cosine ≥ `threshold`.
    */
  def semanticDedup(vectors: DataFrame, k: Int = 8,
                    threshold: Double = 0.4): DataFrame = {
    val asg = KMeans.kmeansAssign2(vectors, k)
      .select(col("vec_id"), col("cluster_id"))
    val q = vectors.select(col("vec_id"), quantize(col("embedding")).as("qv"))
    val m = asg.join(q, "vec_id")
    val dropped = m.as("a").join(m.as("b"),
        col("a.cluster_id") === col("b.cluster_id") &&
          col("a.vec_id") < col("b.vec_id"))
      .filter(quantizedDot(col("a.qv"), col("b.qv")) >= math.round(threshold * 1e6))
      .select(col("b.vec_id").as("vec_id")).distinct()
    asg.join(dropped, Seq("vec_id"), "left_anti")
  }

  val queries: Map[String, Q] = Map(
    "dedup_semantic" -> ((s, dir) =>
      semanticDedup(Tables.embeddings(s, dir), k = 8, threshold = 0.4))
  )

  val oracleSql: Map[String, String] = Map(
    // The shared kmeans CTE chain + the same pair/anti-join program.
    "dedup_semantic" ->
      (KMeans.oracleCtes + """,
        |pairs AS (
        |  SELECT b.vec_id AS dropped
        |  FROM asg a JOIN asg b
        |    ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
        |  JOIN q qa ON qa.vec_id = a.vec_id
        |  JOIN q qb ON qb.vec_id = b.vec_id
        |  WHERE CAST(list_sum(list_transform(generate_series(1, len(qa.qv)),
        |    i -> qa.qv[i] * qb.qv[i])) AS BIGINT) >= 400000)
        |SELECT vec_id, cluster_id FROM asg
        |WHERE vec_id NOT IN (SELECT dropped FROM pairs)""".stripMargin)
  )
}
