package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact distributed k-means assignment over the embedding corpus — the
  * clustering primitive under semantic diversity sampling and
  * cluster-balanced curation. Unlike the IVF Lloyd step (ext/SimSearch,
  * float means + renormalization, rows-only), this formulation is
  * INTEGER-EXACT end to end so the full two-round computation
  * hash-matches DuckDB:
  *
  *  - seeds: the k vectors smallest in md5(vec_id) order — the same
  *    engine-portable "deterministic random" as [[Sampling]];
  *  - assignment: argmax of the codegen quantized dot (1e3-scale ints)
  *    against a LITERAL centroid array, ties to the smallest centroid
  *    id — a zero-shuffle projection inside the scan stage;
  *  - update: per-(cluster, dim) integer sums via posexplode (map-side
  *    combined, the `embedding_dim_stats` plan shape), new centroid
  *    components by FLOOR division promoted to 1e6 scale —
  *    `(s·1000 − pmod(s·1000, n)) div n` — so round 2 is again a pure
  *    integer argmax, reproducible in any engine with integer ops.
  *
  * Scale shape: centroids are k·dim longs — driver-collected (bounded
  * by the k parameter, never by data) and inlined per round; the
  * corpus is read from one persisted quantized projection and never
  * shuffles for assignment. The only data-sized exchange in the whole
  * program is the centroid-update partial-sum, whose shuffle rows are
  * bounded by partitions·k·dim.
  */
object KMeans {

  import graft.functions.QuantizedDot.{quantize, quantizedDot}

  /** (vec_id, cluster_id, dot_q) after seed-assign → integer centroid
    * update → re-assign. `cluster_id` is the seed's vec_id (stable
    * across runs and engines); `dot_q` is the winning round-2 dot at
    * 1e9 scale (qv 1e3 × centroid 1e6).
    */
  def kmeansAssign2(vectors: DataFrame, k: Int = 8): DataFrame =
    kmeansAssign2Stamped(vectors, k)._1

  /** [[kmeansAssign2]] plus the thunk releasing the persisted quantized
    * corpus (same contract as `Dedup.embeddingCosineLshPairsStamped`;
    * the plain form is for harnesses that `clearCache()` per query).
    */
  def kmeansAssign2Stamped(vectors: DataFrame, k: Int = 8): (DataFrame, () => Unit) = {
    val (out, _, release) = chainStamped(vectors, k)
    (out.select(col("vec_id"), col("cid").as("cluster_id"),
      col("dot").as("dot_q")), release)
  }

  /** The shared two-round chain: returns the round-2 assignment WITH
    * the quantized vector ((vec_id, qv, cid, dot)), the final centroid
    * table (cid, cv), and the release thunk.
    */
  private def chainStamped(vectors: DataFrame, k: Int)
      : (DataFrame, DataFrame, () => Unit) = {
    val q = vectors.select(col("vec_id"), quantize(col("embedding")).as("qv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val seeds = q
      .withColumn("_h", md5(col("vec_id").cast("string")))
      .orderBy(col("_h"), col("vec_id")).limit(k)
      .select(col("vec_id").as("cid"), col("qv").as("cv"))
    // Assignment is a PURE PROJECTION: the k centroids are collected
    // (bounded by the k parameter — the same driver-summary regime as
    // RangeRle's per-partition exchange) and inlined as a literal
    // array, so the per-vector argmax runs inside the scan stage with
    // ZERO shuffle — no join, no grouping, no exchange of the corpus.
    // Tie-break: array_max on struct(dot, -cid) is lexicographic, so
    // equal dots resolve to the SMALLEST centroid id.
    def assign(cents: DataFrame): DataFrame = {
      val centLit = array(cents.collect().map { r =>
        struct(lit(r.getLong(0)).as("cid"),
          array(r.getSeq[Long](1).map(lit): _*).as("cv"))
      }.toIndexedSeq: _*)
      q.withColumn("best", array_max(transform(centLit,
          c => struct(quantizedDot(col("qv"), c.getField("cv")).as("d"),
            (-c.getField("cid")).as("ncid")))))
        .select(col("vec_id"), col("qv"),
          (-col("best.ncid")).as("cid"), col("best.d").as("dot"))
    }
    val cents2 = assign(seeds)
      .select(col("cid"), posexplode(col("qv")).as(Seq("pos", "x")))
      .groupBy(col("cid"), col("pos"))
      .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
      // floor division in integers: pmod is the nonnegative remainder,
      // so the numerator is an exact multiple of n — `div` is exact,
      // no double arithmetic anywhere
      .withColumn("c", expr("(s * 1000 - pmod(s * 1000, n)) div n"))
      .groupBy(col("cid"))
      .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("a"))
      .select(col("cid"), expr("transform(a, x -> x.c)").as("cv"))
    (assign(cents2), cents2, () => { q.unpersist(); () })
  }

  /** Per-cluster inertia — the k-means quality metric, INTEGER-EXACT at
    * a common 1e12 scale: dist²(v,c) = |v|² − 2⟨v,c⟩ + |c|² with qv at
    * 1e3 and centroids at 1e6, so `v2·1e6 − 2·dot·1e3 + c2` lands every
    * term on 1e12. Per-vector terms fit longs (~1e15); the per-cluster
    * Σ rides decimal(38,0) (60k vectors × 1e15 passes 2⁶³). Same plan
    * as the assignment (zero-shuffle argmax projection) plus one
    * broadcast join of the k-row centroid-norm table and a keyed sum.
    * The Σ rides decimal(38,0) INTERNALLY only; the output column is
    * cast back to BIGINT (max inertia ≈ 6.8e13 at sf0.1 — >10⁵×
    * headroom) because the driver's hash canonicalizes DECIMAL output
    * columns differently from its value compare (round-9 finding).
    */
  def kmeansInertia(vectors: DataFrame, k: Int = 8): DataFrame = {
    val (a, cents2, _) = chainStamped(vectors, k)
    val cn = cents2.select(col("cid"),
      quantizedDot(col("cv"), col("cv")).as("c2"))
    a.withColumn("v2", quantizedDot(col("qv"), col("qv")))
      .join(broadcast(cn), "cid")
      .select(col("cid"),
        (col("v2").cast("decimal(38,0)") * 1000000
          - col("dot").cast("decimal(38,0)") * 2000
          + col("c2").cast("decimal(38,0)")).as("d2"))
      .groupBy(col("cid").as("cluster_id"))
      .agg(count(lit(1)).as("n_vectors"),
        sum(col("d2")).cast("long").as("inertia_x1e12"))
  }

  /** Per-cluster SIMPLIFIED silhouette (Kaufman–Rousseeuw's centroid
    * variant, on SQUARED distances — the pinned flavor): per vector
    * a² = dist²(v, own centroid), b² = min over OTHER centroids, and
    * s = (b²−a²)/max(a²,b²) as an integer ppm. The whole per-vector
    * computation is again a zero-shuffle projection against the
    * literal centroid array (k·dim longs); the only exchange is the
    * k-row final aggregate.
    *
    * Exactness discipline: a²/b² are first scaled down by 1e6, keeping
    * `(b²−a²)·10⁶` inside int64 with ~10³ headroom; the ratio and the
    * per-cluster mean are plain `div` — Spark's `div` and DuckDB's
    * `//` BOTH truncate toward zero (PLANS.md round-9; negative
    * silhouettes confirmed this empirically), so no floor identity is
    * needed or wanted.
    */
  def kmeansSilhouette(vectors: DataFrame, k: Int = 8): DataFrame =
    silhouettePerVector(vectors, k)
      .groupBy(col("cid").as("cluster_id"))
      .agg(count(lit(1)).as("n_vectors"), sum(col("s_ppm")).as("_s"))
      .select(col("cluster_id"), col("n_vectors"),
        expr("_s div n_vectors").as("mean_silhouette_ppm"))

  private[graft] def silhouettePerVector(vectors: DataFrame, k: Int): DataFrame = {
    val (a, cents2, _) = chainStamped(vectors, k)
    val centLit = array(cents2.collect().map { r =>
      struct(lit(r.getLong(0)).as("ccid"),
        array(r.getSeq[Long](1).map(lit): _*).as("cv"))
    }.toIndexedSeq: _*)
    a.withColumn("v2", quantizedDot(col("qv"), col("qv")))
      .withColumn("ds", transform(centLit, c => struct(
        (col("v2") * lit(1000000L)
          - quantizedDot(col("qv"), c.getField("cv")) * lit(2000L)
          + quantizedDot(c.getField("cv"), c.getField("cv"))).as("d2"),
        c.getField("ccid").as("ccid"))))
      .withColumn("a2",
        expr("element_at(filter(ds, x -> x.ccid = cid), 1).d2 div 1000000"))
      .withColumn("b2",
        expr("array_min(transform(filter(ds, x -> x.ccid != cid), x -> x.d2)) div 1000000"))
      // plain `div`: both Spark's div and DuckDB's // TRUNCATE toward
      // zero (PLANS.md round-9, re-confirmed empirically this round —
      // a pmod "floor" identity here was off by 1 on negative ratios)
      .withColumn("s_ppm",
        expr("(b2 - a2) * 1000000 div greatest(greatest(a2, b2), 1L)"))
      .select(col("vec_id"), col("cid"), col("a2"), col("b2"), col("s_ppm"))
  }

  val queries: Map[String, Q] = Map(
    "embedding_kmeans_assign" -> ((s, dir) =>
      kmeansAssign2(Tables.embeddings(s, dir), 8)),

    // Topic-mix audit: the k-means pseudo-topics joined back to the
    // document catalogue (vec_id aligns with doc_id in the corpus) —
    // per (source, topic) counts + within-source share, the balance
    // report a data-mixture recipe reads before setting source weights.
    // One id-keyed equi-join + a keyed aggregate; the share window is
    // source-alphabet-bounded.
    "topic_mix_by_source" -> ((s, dir) => {
      val asg = kmeansAssign2(Tables.embeddings(s, dir), 8)
        .select(col("vec_id"), col("cluster_id"))
      Tables.documents(s, dir).select(col("doc_id"), col("source"))
        .join(asg, col("doc_id") === col("vec_id"))
        .groupBy(col("source"), col("cluster_id"))
        .agg(count(lit(1)).as("n"))
        .withColumn("src_total",
          sum(col("n")).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("source"))))
        .select(col("source"), col("cluster_id"), col("n"),
          expr("n * 1000000 div src_total").as("share_ppm"))
    }),
    "kmeans_inertia" -> ((s, dir) =>
      kmeansInertia(Tables.embeddings(s, dir), 8)),
    "kmeans_silhouette" -> ((s, dir) =>
      kmeansSilhouette(Tables.embeddings(s, dir), 8)),

    // IVF capacity-planning audit (round 13): per-cell occupancy of the
    // same assignment the IVF index buckets by — share of the corpus
    // per cell and the max-cell/mean-cell imbalance that decides what
    // nProbe buys and whether cells need splitting. The cell table is
    // k-bounded; the summary is a 1-row broadcast scalar (never a
    // data-sized window), so the plan is the assignment projection +
    // one keyed aggregate.
    "ann_ivf_cell_stats" -> ((s, dir) => {
      val cells = kmeansAssign2(Tables.embeddings(s, dir), 8)
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_vectors"))
      val tot = cells.agg(sum(col("n_vectors")).as("total"),
        max(col("n_vectors")).as("max_cell"),
        count(lit(1)).as("n_cells"))
      cells.crossJoin(broadcast(tot))
        .select(col("cluster_id"), col("n_vectors"),
          expr("n_vectors * 1000000 div total").as("share_ppm"),
          expr("max_cell * n_cells * 1000000 div total").as("imbalance_ppm"))
    })
  )

  /** The two-round integer k-means as a DuckDB CTE chain, shared with
    * the [[SemDedup]] oracle: defines `q` (quantized corpus) and `asg`
    * (final (vec_id, cluster_id, dot_q) assignment). HUGEINT sums cast
    * back, `//` on an exact multiple matches Spark's `div`,
    * `list(... ORDER BY pos)` rebuilds the centroid arrays in
    * dimension order.
    */
  private[ext] val oracleCtes: String =
    """WITH q AS (
      |  SELECT vec_id, list_transform(embedding,
      |    x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
      |  FROM embeddings),
      |seeds AS (
      |  SELECT vec_id AS cid, qv AS cv FROM q
      |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8),
      |a1 AS (
      |  SELECT q.vec_id, q.qv, s.cid,
      |    CAST(list_sum(list_transform(generate_series(1, len(q.qv)),
      |      i -> q.qv[i] * s.cv[i])) AS BIGINT) AS dot
      |  FROM q CROSS JOIN seeds s),
      |b1 AS (
      |  SELECT vec_id, qv, cid FROM a1
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid ASC) = 1),
      |sums AS (
      |  SELECT cid, i AS pos, CAST(sum(qv[i]) AS BIGINT) AS s, count(*) AS n
      |  FROM b1, UNNEST(generate_series(1, len(qv))) AS t(i)
      |  GROUP BY cid, i),
      |cent2 AS (
      |  SELECT cid,
      |    list((s * 1000 - ((s * 1000) % n + n) % n) // n ORDER BY pos) AS cv
      |  FROM sums GROUP BY cid),
      |a2 AS (
      |  SELECT q.vec_id, c.cid,
      |    CAST(list_sum(list_transform(generate_series(1, len(q.qv)),
      |      i -> q.qv[i] * c.cv[i])) AS BIGINT) AS dot
      |  FROM q CROSS JOIN cent2 c),
      |asg AS (
      |  SELECT vec_id, cid AS cluster_id, dot AS dot_q FROM a2
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid ASC) = 1)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // The identical integer program, via the shared CTE chain.
    "embedding_kmeans_assign" ->
      (oracleCtes + "\nSELECT vec_id, cluster_id, dot_q FROM asg"),

    "topic_mix_by_source" -> (oracleCtes +
      """,
        |j AS (
        |  SELECT d.source, a.cluster_id
        |  FROM documents d JOIN asg a ON d.doc_id = a.vec_id),
        |c AS (SELECT source, cluster_id, CAST(count(*) AS BIGINT) AS n
        |      FROM j GROUP BY source, cluster_id)
        |SELECT source, cluster_id, n,
        |  n * 1000000 // CAST(SUM(n) OVER (PARTITION BY source) AS BIGINT) AS share_ppm
        |FROM c""".stripMargin),

    // same chain + vector/centroid norms; the 1e12-scale distance
    // algebra mirrors the Spark side term for term
    "kmeans_inertia" ->
      (oracleCtes +
        """,
          |vn AS (
          |  SELECT vec_id,
          |    CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS v2
          |  FROM q),
          |cn AS (
          |  SELECT cid,
          |    CAST(list_sum(list_transform(cv, x -> x*x)) AS BIGINT) AS c2
          |  FROM cent2)
          |SELECT a.cluster_id, count(*) AS n_vectors,
          |  CAST(sum(CAST(vn.v2 AS HUGEINT) * 1000000
          |     - CAST(a.dot_q AS HUGEINT) * 2000
          |     + CAST(cn.c2 AS HUGEINT)) AS BIGINT) AS inertia_x1e12
          |FROM asg a
          |JOIN vn ON vn.vec_id = a.vec_id
          |JOIN cn ON cn.cid = a.cluster_id
          |GROUP BY a.cluster_id""".stripMargin),

    // same chain + the full vector×centroid distance matrix (k rows per
    // vector); a²/b² scaled down by 1e6 before the ratio; `//` and
    // Spark's `div` both truncate toward zero, so they mirror directly
    "kmeans_silhouette" ->
      (oracleCtes +
        """,
          |vn AS (
          |  SELECT vec_id,
          |    CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS v2
          |  FROM q),
          |cn AS (
          |  SELECT cid,
          |    CAST(list_sum(list_transform(cv, x -> x*x)) AS BIGINT) AS c2
          |  FROM cent2),
          |dmat AS (
          |  SELECT a.vec_id, a.cluster_id, c.cid,
          |    (CAST(vn.v2 AS HUGEINT) * 1000000
          |      - 2000 * CAST(list_sum(list_transform(generate_series(1, len(q.qv)),
          |          i -> q.qv[i] * c.cv[i])) AS HUGEINT)
          |      + cn.c2) AS d2
          |  FROM asg a
          |  JOIN q ON q.vec_id = a.vec_id
          |  JOIN vn ON vn.vec_id = a.vec_id
          |  CROSS JOIN cent2 c
          |  JOIN cn ON cn.cid = c.cid),
          |ab AS (
          |  SELECT vec_id, cluster_id,
          |    CAST(max(CASE WHEN cid = cluster_id THEN d2 END) // 1000000 AS BIGINT) AS a2,
          |    CAST(min(CASE WHEN cid != cluster_id THEN d2 END) // 1000000 AS BIGINT) AS b2
          |  FROM dmat GROUP BY vec_id, cluster_id),
          |sp AS (
          |  SELECT cluster_id,
          |    (b2 - a2) * 1000000 // greatest(greatest(a2, b2), 1) AS s_ppm
          |  FROM ab)
          |SELECT cluster_id, count(*) AS n_vectors,
          |  CAST(CAST(sum(s_ppm) AS BIGINT) // count(*) AS BIGINT) AS mean_silhouette_ppm
          |FROM sp GROUP BY cluster_id""".stripMargin),

    "ann_ivf_cell_stats" ->
      (oracleCtes +
        """,
          |cells AS (
          |  SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_vectors
          |  FROM asg GROUP BY cluster_id),
          |tot AS (
          |  SELECT CAST(sum(n_vectors) AS BIGINT) AS total,
          |    CAST(max(n_vectors) AS BIGINT) AS max_cell,
          |    CAST(count(*) AS BIGINT) AS n_cells
          |  FROM cells)
          |SELECT cluster_id, n_vectors,
          |  n_vectors * 1000000 // total AS share_ppm,
          |  max_cell * n_cells * 1000000 // total AS imbalance_ppm
          |FROM cells CROSS JOIN tot""".stripMargin)
  )
}
