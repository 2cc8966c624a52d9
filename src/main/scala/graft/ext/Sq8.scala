package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SQ8 scalar quantization of the embedding corpus — the standard
  * 4×-compression tier between full floats and PQ codes (FAISS's
  * `ScalarQuantizer(QT_8bit)`): per DIMENSION, learn (min, max) over
  * the corpus, encode each component as an 8-bit code
  * `c = (x − min)·255 div (max − min)`, and report the reconstruction
  * error the codebook would pay.
  *
  * All arithmetic is on the 1e3-quantized integer grid (the
  * [[graft.functions.QuantizedDot]] convention), so codes and errors
  * are integer-exact and the whole table hash-checks: codes and
  * reconstructions are nonneg integer ops (`div` = floor on both
  * engines).
  *
  * 100 TB shape: per-dim ranges are ONE map-side-combined aggregate
  * (dim-bounded rows — the `embedding_dim_stats` plan); the encode +
  * error pass re-reads the corpus with the dim-bounded range table
  * broadcast. No data-sized structure ever sits on the driver.
  */
object Sq8 {

  import graft.functions.QuantizedDot.quantize

  /** (dim, mn_q, mx_q, n, sum_abs_err, max_abs_err) — the SQ8 codebook
    * parameters per dimension plus the corpus reconstruction error on
    * the 1e3 grid.
    */
  def sq8DimStats(vectors: DataFrame): DataFrame = {
    val ex = vectors
      .select(col("vec_id"), posexplode(quantize(col("embedding"))).as(Seq("dim", "x")))
    val ranges = ex.groupBy(col("dim"))
      .agg(min(col("x")).as("mn_q"), max(col("x")).as("mx_q"))
    ex.join(broadcast(ranges), "dim")
      .withColumn("c",
        expr("(x - mn_q) * 255 div greatest(mx_q - mn_q, 1L)"))
      .withColumn("recon",
        expr("mn_q + c * (mx_q - mn_q) div 255"))
      .groupBy(col("dim"))
      .agg(min(col("mn_q")).as("mn_q"), min(col("mx_q")).as("mx_q"),
        count(lit(1)).as("n"),
        sum(abs(col("x") - col("recon"))).as("sum_abs_err"),
        max(abs(col("x") - col("recon"))).as("max_abs_err"))
  }

  /** Upper-triangular second-moment table of the embedding corpus —
    * the input to covariance/whitening/PCA preprocessing: per dim pair
    * (i ≤ j), exact integer (n, Σxᵢ, Σxⱼ, Σxᵢxⱼ) on the 1e3 grid
    * (cov = Σxᵢxⱼ/n − ΣxᵢΣxⱼ/n² downstream). The pair expansion is a
    * NESTED EXPLODE over each vector's own array — map-side only, no
    * self-join — and partial aggregation shrinks the shuffle to
    * d(d+1)/2 rows per task regardless of corpus size. Σxᵢxⱼ stays in
    * int64 to ~10¹² rows at |x| ≤ 2e3.
    */
  def covarianceMoments(vectors: DataFrame): DataFrame = {
    vectors.select(quantize(col("embedding")).as("qv"))
      .select(col("qv"), posexplode(col("qv")).as(Seq("i", "xi")))
      .select(col("i"), col("xi"),
        posexplode(expr("slice(qv, i + 1, size(qv) - i)")).as(Seq("dj", "xj")))
      .select(col("i"), (col("i") + col("dj")).as("j"), col("xi"), col("xj"))
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n"), sum(col("xi")).as("s_i"),
        sum(col("xj")).as("s_j"), sum(col("xi") * col("xj")).as("s_ij"))
  }

  /** Dominant principal direction of the embedding covariance by
    * 3 rounds of POWER ITERATION in exact integer arithmetic — the
    * PageRank/HITS discipline applied to a numerical-linear-algebra
    * primitive: the covariance is n²-normalized onto the grid-variance
    * scale (`c_ij = (n·Σxixj − Σxi·Σxj) div n²`, decimal(38,0) inside,
    * BIGINT out), v₀ = 1e6·𝟙, and each round is one matvec over the
    * d²-bounded matrix followed by L1 normalization back to the 1e6
    * scale (no sqrt — L1 keeps everything integer; covariance is PSD
    * so the iterate cannot oscillate sign). Every engine-visible
    * number is a truncating div on both sides.
    *
    * 100 TB shape: the corpus is touched ONCE (the covarianceMoments
    * nested explode, map-side partial agg to d(d+1)/2 rows); the
    * iteration runs on dim-bounded tables with the 64-row vector
    * broadcast each round. Range audit: |c| ≤ grid², |w| ≤ d·grid²·1e6
    * ≈ 2.6e14, l1 ≤ d·|w| — in int64 at any corpus size; only
    * normalization lifts to decimal.
    */
  def pcaPowerIteration(vectors: DataFrame, rounds: Int = 3,
                        scale: Long = 1000000L): DataFrame = {
    val tri = covarianceMoments(vectors)
      .select(col("i"), col("j"),
        expr("""CAST((n * CAST(s_ij AS DECIMAL(38,0))
               - CAST(s_i AS DECIMAL(38,0)) * s_j)
               div (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)""").as("c"))
      .persist() // d(d+1)/2 rows; read by the mirror and every round
    val m = tri.unionAll(tri.where(col("i") =!= col("j"))
      .select(col("j").as("i"), col("i").as("j"), col("c")))
    var v = tri.where(col("i") === col("j"))
      .select(col("i").as("dim"), lit(scale).as("v"))
    for (_ <- 1 to rounds) {
      val w = m.join(broadcast(v.select(col("dim").as("j"), col("v"))), "j")
        .groupBy(col("i")).agg(sum(col("c") * col("v")).as("w"))
        // d rows, read twice (the L1 total + the normalize) — an
        // unpersisted chain re-ran the matvec 2^rounds times (each
        // re-run a separate broadcast-build job)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val l1 = w.agg(sum(abs(col("w"))).as("l1"))
      v = w.crossJoin(broadcast(l1))
        .select(col("i").as("dim"),
          expr(s"CAST(CAST(w AS DECIMAL(38,0)) * ${scale}L " +
            "div greatest(l1, 1L) AS BIGINT)").as("v"))
    }
    v.select(col("dim").cast("long").as("dim"), col("v").as("v_x1e6"))
  }

  val queries: Map[String, Q] = Map(
    "embedding_sq8_stats" -> ((s, dir) =>
      sq8DimStats(Tables.embeddings(s, dir))),
    "embedding_covariance" -> ((s, dir) =>
      covarianceMoments(Tables.embeddings(s, dir))),
    "embedding_pca_power" -> ((s, dir) =>
      pcaPowerIteration(Tables.embeddings(s, dir)))
  )

  val oracleSql: Map[String, String] = Map(
    "embedding_sq8_stats" ->
      """WITH q AS (
        |  SELECT vec_id, i - 1 AS dim,
        |    CAST(round(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT) AS x
        |  FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(i)),
        |r AS (
        |  SELECT dim, min(x) AS mn_q, max(x) AS mx_q FROM q GROUP BY dim),
        |e AS (
        |  SELECT q.dim, q.x, r.mn_q, r.mx_q,
        |    (q.x - r.mn_q) * 255 // greatest(r.mx_q - r.mn_q, 1) AS c
        |  FROM q JOIN r USING (dim))
        |SELECT dim, min(mn_q) AS mn_q, min(mx_q) AS mx_q, count(*) AS n,
        |  CAST(sum(abs(x - (mn_q + c * (mx_q - mn_q) // 255))) AS BIGINT) AS sum_abs_err,
        |  CAST(max(abs(x - (mn_q + c * (mx_q - mn_q) // 255))) AS BIGINT) AS max_abs_err
        |FROM e GROUP BY dim""".stripMargin,

    "embedding_covariance" ->
      """WITH q AS (
        |  SELECT list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |p AS (
        |  SELECT ti.i - 1 AS i, tj.j - 1 AS j, qv[ti.i] AS xi, qv[tj.j] AS xj
        |  FROM q,
        |    UNNEST(generate_series(1, len(qv))) AS ti(i),
        |    UNNEST(generate_series(1, len(qv))) AS tj(j)
        |  WHERE tj.j >= ti.i)
        |SELECT i, j, count(*) AS n,
        |  CAST(sum(xi) AS BIGINT) AS s_i, CAST(sum(xj) AS BIGINT) AS s_j,
        |  CAST(sum(xi * xj) AS BIGINT) AS s_ij
        |FROM p GROUP BY i, j""".stripMargin,

    // the 3 power-iteration rounds unrolled as CTEs over the same
    // moment chain — matvec + L1 normalization per round, every
    // division truncating on both engines
    "embedding_pca_power" ->
      """WITH q AS (
        |  SELECT list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |p AS (
        |  SELECT ti.i - 1 AS i, tj.j - 1 AS j, qv[ti.i] AS xi, qv[tj.j] AS xj
        |  FROM q,
        |    UNNEST(generate_series(1, len(qv))) AS ti(i),
        |    UNNEST(generate_series(1, len(qv))) AS tj(j)
        |  WHERE tj.j >= ti.i),
        |mom AS (
        |  SELECT i, j, count(*) AS n,
        |    CAST(sum(xi) AS BIGINT) AS s_i, CAST(sum(xj) AS BIGINT) AS s_j,
        |    CAST(sum(xi * xj) AS BIGINT) AS s_ij
        |  FROM p GROUP BY i, j),
        |tri AS (
        |  SELECT i, j, CAST((n * CAST(s_ij AS HUGEINT)
        |    - CAST(s_i AS HUGEINT) * s_j)
        |    // (CAST(n AS HUGEINT) * n) AS BIGINT) AS c
        |  FROM mom),
        |m AS (
        |  SELECT i, j, c FROM tri
        |  UNION ALL SELECT j, i, c FROM tri WHERE i <> j),
        |v0 AS (SELECT i AS dim, CAST(1000000 AS BIGINT) AS v
        |       FROM tri WHERE i = j),
        |w1 AS (SELECT m.i AS dim, CAST(sum(m.c * v0.v) AS BIGINT) AS w
        |       FROM m JOIN v0 ON v0.dim = m.j GROUP BY m.i),
        |l1 AS (SELECT CAST(sum(abs(w)) AS BIGINT) AS l FROM w1),
        |v1 AS (SELECT dim, CAST(CAST(w AS HUGEINT) * 1000000
        |         // greatest(l, 1) AS BIGINT) AS v FROM w1, l1),
        |w2 AS (SELECT m.i AS dim, CAST(sum(m.c * v1.v) AS BIGINT) AS w
        |       FROM m JOIN v1 ON v1.dim = m.j GROUP BY m.i),
        |l2 AS (SELECT CAST(sum(abs(w)) AS BIGINT) AS l FROM w2),
        |v2 AS (SELECT dim, CAST(CAST(w AS HUGEINT) * 1000000
        |         // greatest(l, 1) AS BIGINT) AS v FROM w2, l2),
        |w3 AS (SELECT m.i AS dim, CAST(sum(m.c * v2.v) AS BIGINT) AS w
        |       FROM m JOIN v2 ON v2.dim = m.j GROUP BY m.i),
        |l3 AS (SELECT CAST(sum(abs(w)) AS BIGINT) AS l FROM w3),
        |v3 AS (SELECT dim, CAST(CAST(w AS HUGEINT) * 1000000
        |         // greatest(l, 1) AS BIGINT) AS v FROM w3, l3)
        |SELECT dim, v AS v_x1e6 FROM v3""".stripMargin
  )
}
