package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`Array[Float]`, unit-normalized, dim 64).
  *
  *  - Brute-force cosine top-k: the exactness baseline. Scores are
  *    computed as QUANTIZED INTEGER dot products (`round(x*1000)` per
  *    component) so ranking is total-ordered integer arithmetic — no
  *    float-associativity ambiguity against the oracle, and SIMD-friendly.
  *    Cost is |queries|·|corpus|·d: fine for a bounded query set; the plan
  *    broadcasts the small query side so the corpus never shuffles.
  *  - Sign-LSH (random hyperplane) bucketing: the 100 TB path. Vectors
  *    bucket by the sign pattern of d′ pseudo-random projections; search
  *    touches only same-bucket candidates. Hyperplanes derive
  *    deterministically from `xxhash64` (no RNG, reproducible across runs
  *    and executors).
  */
object SimSearch {

  import graft.functions.QuantizedDot.{quantize, quantizedDot}

  /** Brute-force top-k neighbors for `queries` against `corpus`
    * (both (id, embedding)); self-pairs excluded; ranked by
    * (dot_q desc, candidate id). Vectors quantized once per row; the
    * per-pair dot is the codegen'd QuantizedDot expression.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val joined = broadcast(
        queries.select(col("vec_id").as("q_id"), quantize(col("embedding")).as("q_emb")))
      .join(corpus.select(col("vec_id").as("c_id"), quantize(col("embedding")).as("c_emb")),
        col("q_id") =!= col("c_id"))
      .withColumn("dot_q", quantizedDot(col("q_emb"), col("c_emb")))
    // top-k via the custom partial+final heap operator: only ≤ k rows per
    // (partition, query) reach the shuffle, vs every scored pair under a
    // window formulation
    graft.plans.TopKPerKey.topKPerKey(joined, Seq("q_id"),
        Seq(("dot_q", true), ("c_id", false)), k)
      .select(col("q_id"), col("rank"), col("c_id"), col("dot_q"))
  }

  /** IVF (inverted-file) ANN — the centroid-cell scale path the
    * reference-free ANN literature pairs with LSH: vectors partition
    * into cells by nearest centroid; a query probes only its `nProbe`
    * nearest cells. Everything is deterministic and shuffle-lean:
    *
    *  - centroids are md5-hash-sampled vectors (engine-portable choice,
    *    no RNG, no iterative training — one Lloyd step could refine them
    *    via `embedding_dim_stats`-style integer sums, same plan shape);
    *  - centroids BROADCAST to both assignment joins (cells ≪ corpus —
    *    the corpus never shuffles for assignment);
    *  - the probe join keys on cell id (shuffle bounded by cell sizes),
    *    and the exact quantized dot ranks candidates through the
    *    partial/final top-k operator.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, nCells: Int,
              nProbe: Int, k: Int, lloydSteps: Int = 0): DataFrame = {
    val corpusQ = corpus.select(col("vec_id").as("c_id"), quantize(col("embedding")).as("c_qv"))
    def assignCells(cents: DataFrame): DataFrame = {
      val assign = corpusQ
        .join(broadcast(cents), col("c_id") =!= lit(-1L))
        .withColumn("d", quantizedDot(col("c_qv"), col("cent_qv")))
      graft.plans.TopKPerKey.topKPerKey(assign, Seq("c_id"),
          Seq(("d", true), ("cent_id", false)), 1)
        .select(col("c_id"), col("c_qv"), col("cent_id").as("cell"))
    }
    var cents = corpus
      .withColumn("_h", md5(col("vec_id").cast("string")))
      .orderBy(col("_h")).limit(nCells)
      .select(col("vec_id").as("cent_id"), quantize(col("embedding")).as("cent_qv"))
    var cells = assignCells(cents)
    // Lloyd refinement, spherical-k-means style: per-(cell, dim) integer
    // sums over the assignments (the `embedding_dim_stats` plan shape —
    // map-side combine bounds the shuffle at partitions·cells·dim), mean
    // per dim, centroid renormalized to the quantized unit scale so the
    // dot-product assignment stays a cosine argmax. Cell count is tiny,
    // so the array rebuild (collect_list over dims) is centroid-sized
    // work, never data-sized.
    for (_ <- 0 until lloydSteps) {
      cents = cells
        .select(col("cell"), posexplode(col("c_qv")).as(Seq("dim", "q")))
        .groupBy(col("cell"), col("dim"))
        .agg(sum(col("q")).as("sum_q"), count(lit(1)).as("n"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("dim"),
          (col("sum_q") / col("n")).as("m")))).as("a"))
        .select(col("cell").as("cent_id"), expr("transform(a, x -> x.m)").as("m"))
        .withColumn("norm",
          greatest(sqrt(expr("aggregate(m, 0D, (acc, v) -> acc + v * v)")), lit(1e-9)))
        .select(col("cent_id"),
          expr("transform(m, v -> cast(round(v * 1000 / norm) as bigint))").as("cent_qv"))
      cells = assignCells(cents)
    }
    val probes = graft.plans.TopKPerKey.topKPerKey(
        queries.select(col("vec_id").as("q_id"), quantize(col("embedding")).as("q_qv"))
          .join(broadcast(cents), col("q_id") =!= lit(-1L))
          .withColumn("d", quantizedDot(col("q_qv"), col("cent_qv"))),
        Seq("q_id"), Seq(("d", true), ("cent_id", false)), nProbe)
      .select(col("q_id"), col("q_qv"), col("cent_id").as("cell"))
    val cand = probes.join(cells, Seq("cell"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("dot_q", quantizedDot(col("q_qv"), col("c_qv")))
    graft.plans.TopKPerKey.topKPerKey(cand, Seq("q_id"),
        Seq(("dot_q", true), ("c_id", false)), k)
      .select(col("q_id"), col("rank"), col("c_id"), col("dot_q"))
  }

  /** Occupancy-adaptive planes-per-band: `rows` such that the expected
    * RANDOM-pair collisions per band bucket stay near `targetOccupancy`
    * vectors — the sign-LSH face of the relative support floor
    * (GraphOps.copurchaseEdges): a FIXED `rows` admits a constant
    * FRACTION of all n² pairs as candidates (p_rand = 2^-rows per
    * band), which the 10× probe measured as a 22× runtime ratio; rows
    * growing with log2(n) keeps per-bucket occupancy — and thus
    * candidate work per vector — scale-invariant. The corpus count is
    * ONE bounded driver scalar (the kmeans driver-summary regime).
    * Recall trades down as rows grow; the gate-scale corpus keeps
    * rows = 4 (measured recall@5 = 0.70), and the scale path for
    * high-recall top-k is IVF/PQ/IVFPQ, not sign-LSH.
    */
  def adaptiveRows(vectors: DataFrame, targetOccupancy: Long = 125L): Int = {
    val n = vectors.count()
    math.max(4, math.ceil(math.log(math.max(1.0, n.toDouble / targetOccupancy))
      / math.log(2.0)).toInt)
  }

  /** Bucketed ANN: candidates restricted to vectors sharing at least
    * one of `bands` sign-LSH band keys (`rows` hyperplanes per band —
    * the codegen'd `SignLshBuckets` expression, same hyperplane family
    * as [[Dedup.embeddingCosineLshPairs]]). The banded OR is what makes
    * the recall tunable: a single wide bucket (the previous
    * formulation) had measured recall@5 of 0.02 on the test corpus
    * because top-k neighbors rarely agree on all planes at once, while
    * `bands` independent chances at `rows` planes each put recall at
    * `1-(1-(1-θ/π)^rows)^bands` — 0.8+ at the corpus' neighbor
    * contrast for (4, 8).
    *
    * Plan shape mirrors the cosine-LSH dedup path: only
    * (vec_id, bucket) rows enter the band shuffle (never the vector
    * payload), candidate id pairs dedup as 16-byte keys, and the
    * quantized vectors are fetched by two equi-joins against the
    * narrow persisted base — so a pair sharing b bands costs ONE dot
    * product. The final top-k rides the partial/final heap operator.
    */
  def lshTopK(vectors: DataFrame, rows: Int, bands: Int, k: Int): DataFrame =
    lshTopKStamped(vectors, rows, bands, k)._1

  /** [[lshTopK]] plus the thunk releasing the persisted quantized base
    * (same caller contract as [[Dedup.embeddingCosineLshPairsStamped]];
    * the plain form is for harnesses that `clearCache()` per query).
    */
  def lshTopKStamped(vectors: DataFrame, rows: Int, bands: Int, k: Int): (DataFrame, () => Unit) = {
    import graft.functions.SignLshBuckets.signLshBuckets
    val base = vectors.select(col("vec_id"), quantize(col("embedding")).as("qv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ex = base.select(col("vec_id"),
      explode(signLshBuckets(col("qv"), rows, bands)).as("bucket"))
    val cand = ex.as("q").join(ex.as("c"),
        col("q.bucket") === col("c.bucket") && col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("q_id"), col("c.vec_id").as("c_id"))
      .dropDuplicates("q_id", "c_id")
    val pairs = cand
      .join(base.select(col("vec_id").as("q_id"), col("qv").as("q_qv")), "q_id")
      .join(base.select(col("vec_id").as("c_id"), col("qv").as("c_qv")), "c_id")
      .select(col("q_id"), col("c_id"), quantizedDot(col("q_qv"), col("c_qv")).as("dot_q"))
    val result = graft.plans.TopKPerKey.topKPerKey(pairs, Seq("q_id"),
        Seq(("dot_q", true), ("c_id", false)), k)
      .select(col("q_id"), col("rank"), col("c_id"), col("dot_q"))
    (result, () => { base.unpersist(); () })
  }

  /** Matryoshka truncation audit — "how much of the full-dimension
    * ranking does a PREFIX of the embedding already recover?": top-k
    * neighbor sets under the full vector vs its first `prefixDims`
    * dimensions (MRL-style representations are trained so prefixes are
    * usable embeddings; on any corpus this measures the cost of the
    * truncation a cheaper index would use), emitted per query as the
    * exact overlap count and ppm. Deterministic ends to end: both
    * rankings use the quantized integer dot with the (dot desc, c_id)
    * tie-break, so the sets — and the overlap — are engine-portable.
    *
    * 100 TB shape: two [[bruteForceTopK]] passes (queries broadcast,
    * corpus never shuffles — the prefix pass reads prefixDims/dim of
    * the vector bytes, which is the point of the technique), then
    * k-bounded per-query joins. At corpus scale the prefix pass is the
    * IVF/LSH shortlist's scoring arm; the audit shape is unchanged.
    */
  def matryoshkaOverlap(emb: DataFrame, prefixDims: Int, k: Int): DataFrame = {
    val queries = emb.filter(col("vec_id") < 10)
    val full = bruteForceTopK(queries, emb, k)
      .select(col("q_id"), col("c_id"))
    val prefQ = queries.select(col("vec_id"),
      slice(col("embedding"), 1, prefixDims).as("embedding"))
    val prefC = emb.select(col("vec_id"),
      slice(col("embedding"), 1, prefixDims).as("embedding"))
    val pref = bruteForceTopK(prefQ, prefC, k)
      .select(col("q_id"), col("c_id"))
    val overlap = full.join(pref, Seq("q_id", "c_id"))
      .groupBy(col("q_id")).agg(count(lit(1)).as("n_overlap"))
    full.select(col("q_id")).distinct()
      .join(overlap, Seq("q_id"), "left_outer")
      .select(col("q_id"), lit(k).cast("long").as("k"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        expr(s"coalesce(n_overlap, 0L) * 1000000 div $k").as("overlap_ppm"))
  }

  /** Mutual-kNN rate over the audit set — the symmetry diagnostic a
    * kNN-graph consumer (graph clustering, SemDedup, UMAP-style
    * layouts) checks first: of the directed kNN edges inside the audit
    * set, how many are reciprocated? Asymmetric edges mark hub vectors
    * (everyone's neighbor, nobody's mutual) — the hubness pathology of
    * high-dimensional similarity. One brute-force pass + a self-join on
    * the k-bounded edge list.
    */
  def mutualKnnRate(emb: DataFrame, auditSize: Int, k: Int): DataFrame = {
    val audit = emb.filter(col("vec_id") < auditSize)
    val edges = bruteForceTopK(audit, audit, k)
      .select(col("q_id").as("src"), col("c_id").as("dst"))
    val mutual = edges.as("e").join(
      edges.select(col("src").as("dst"), col("dst").as("src")).as("r"),
      Seq("src", "dst"), "left_semi")
    edges.agg(count(lit(1)).as("n_directed"))
      .crossJoin(broadcast(mutual.agg(count(lit(1)).as("n_mutual"))))
      .select(col("n_directed"), col("n_mutual"),
        expr("n_mutual * 1000000 div greatest(n_directed, 1L)")
          .as("mutual_ppm"))
  }

  /** Eval-set contamination screen over the embedding space: every
    * corpus vector (id ≥ `nAnchors`) gets its nearest EVAL anchor
    * (id < `nAnchors`) and an integer cosine² verdict —
    * `contaminated = dot > 0 ∧ dot²·10⁶ ≥ thrPpm·‖a‖²·‖c‖²` (cos² ≥
    * thrPpm/10⁶), cross-multiplied on DECIMAL(38,0) so no sqrt and no
    * overflow (the ksBinned discipline). The anchor set broadcasts
    * (eval sets are small by definition); the corpus never shuffles —
    * one broadcast probe + a k=1 per-candidate heap.
    */
  def semanticDecontaminate(emb: DataFrame, nAnchors: Int,
                            thrPpm: Long = 900000L): DataFrame = {
    val q = emb.select(col("vec_id"), quantize(col("embedding")).as("qv"))
      .withColumn("n2", quantizedDot(col("qv"), col("qv")))
    // limit(nAnchors) is a no-op on the ≤ nAnchors filtered rows but
    // makes the bound MECHANICAL (logical maxRows) for the plan sweep
    val anchors = broadcast(q.filter(col("vec_id") < nAnchors).limit(nAnchors)
      .select(col("vec_id").as("q_id"), col("qv").as("q_emb"), col("n2").as("na2")))
    val scored = anchors
      .join(q.filter(col("vec_id") >= nAnchors)
          .select(col("vec_id").as("c_id"), col("qv").as("c_emb"), col("n2").as("nc2")),
        lit(true))
      .withColumn("dot_q", quantizedDot(col("q_emb"), col("c_emb")))
    graft.plans.TopKPerKey.topKPerKey(scored.drop("q_emb", "c_emb"),
        Seq("c_id"), Seq(("dot_q", true), ("q_id", false)), 1)
      .select(col("c_id"), col("q_id").as("best_q"), col("dot_q").as("max_dot_q"),
        expr(s"""CAST(CASE WHEN dot_q > 0 AND
                   CAST(dot_q AS DECIMAL(38,0)) * dot_q * 1000000 >=
                   CAST($thrPpm AS DECIMAL(38,0)) * na2 * nc2
                 THEN 1 ELSE 0 END AS INTEGER)""").as("contaminated"))
  }

  /** Hard-negative mining WITHOUT labels — the unlabeled-corpus
    * sibling of [[NegMining.hardNegatives]] (which requires a real
    * `label` column): pseudo-labels come from the deterministic
    * 2-round k-means assignment ([[KMeans.kmeansAssign2]]), and each
    * anchor (id < `nAnchors`) gets its top-`k` most similar candidates
    * from a DIFFERENT cluster — near in embedding space yet
    * pseudo-labeled apart, the pairs that move a contrastive loss when
    * no supervision exists. The cluster-mismatch filter rides the
    * broadcast-anchor probe join — the same bounded shape as
    * [[bruteForceTopK]].
    */
  def hardNegatives(emb: DataFrame, nAnchors: Int, k: Int): DataFrame = {
    val asg = graft.ext.KMeans.kmeansAssign2(emb, 8)
      .select(col("vec_id"), col("cluster_id"))
    val q = emb.select(col("vec_id"), quantize(col("embedding")).as("qv"))
      .join(asg, Seq("vec_id"))
    // limit(nAnchors): mechanical maxRows bound for the plan sweep
    val anchors = broadcast(q.filter(col("vec_id") < nAnchors).limit(nAnchors)
      .select(col("vec_id").as("q_id"), col("qv").as("q_emb"),
        col("cluster_id").as("q_cluster")))
    val scored = anchors
      .join(q.select(col("vec_id").as("c_id"), col("qv").as("c_emb"),
          col("cluster_id").as("c_cluster")),
        col("q_id") =!= col("c_id") && col("q_cluster") =!= col("c_cluster"))
      .withColumn("dot_q", quantizedDot(col("q_emb"), col("c_emb")))
    graft.plans.TopKPerKey.topKPerKey(scored.drop("q_emb", "c_emb", "q_cluster"),
        Seq("q_id"), Seq(("dot_q", true), ("c_id", false)), k)
      .select(col("q_id"), col("rank"), col("c_id"), col("c_cluster"), col("dot_q"))
  }

  val queries: Map[String, Q] = Map(
    "decontaminate_semantic" -> ((s, dir) =>
      semanticDecontaminate(
        Tables.embeddings(s, dir).select(col("vec_id"), col("embedding")), 10)),

    "ann_hard_negatives" -> ((s, dir) =>
      hardNegatives(
        Tables.embeddings(s, dir).select(col("vec_id"), col("embedding")),
        nAnchors = 10, k = 5)),

    // recall of the 16-dim prefix ranking against the full 64-dim
    // ranking, per query — the dimension-truncation tradeoff, measured
    "ann_matryoshka_recall" -> ((s, dir) =>
      matryoshkaOverlap(
        Tables.embeddings(s, dir).select(col("vec_id"), col("embedding")),
        prefixDims = 16, k = 5)),

    // how symmetric is the 5-NN graph on the audit set?
    "knn_graph_mutual" -> ((s, dir) =>
      mutualKnnRate(
        Tables.embeddings(s, dir).select(col("vec_id"), col("embedding")),
        auditSize = 100, k = 5)),

    // Per-label centroid statistics in EXACT integer arithmetic:
    // quantized components explode to (label, dim) and aggregate
    // map-side — sums and counts instead of float means, so any engine
    // reproduces the bits (centroid = sum_q / n / 1000 downstream).
    "embedding_dim_stats" -> ((s, dir) =>
      Tables.embeddings(s, dir)
        .select(col("label"),
          posexplode(graft.functions.QuantizedDot.quantize(col("embedding")))
            .as(Seq("dim", "q")))
        .groupBy(col("label"), col("dim"))
        .agg(count(lit(1)).as("n"), sum(col("q")).as("sum_q"))),

    "ann_bruteforce_topk" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      bruteForceTopK(e.filter(col("vec_id") < 10), e, k = 5)
    }),

    // Embedding-space outlier scores — the noisy-sample/contamination
    // screen (SemDedup's pruning criterion inverted): a vector whose
    // 5th-nearest neighbor is FAR (low dot) sits in no semantic
    // cluster. Exact for the bounded audit set (vec_id < 50) via the
    // brute-force heap operator; the corpus-wide scale path is the IVF
    // shortlist feeding the same rank-5 selection.
    "embedding_outlier_score" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      bruteForceTopK(e.filter(col("vec_id") < 50), e, k = 5)
        .where(col("rank") === 5)
        .select(col("q_id").as("vec_id"), col("dot_q").as("knn5_dot_q"))
    }),
    // Banded sign-LSH ANN (xxhash64-seeded hyperplanes → rows-only;
    // the oracled `ann_lsh_recall` companion below is the driver
    // guard). Planes per band scale with log2(corpus) so candidate
    // work per vector stays bounded — rows = 4 at every gate/board
    // scale (500-2000 vectors), 8 at the 10× probe's 20000.
    "ann_lsh_bucketed" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      lshTopK(e, rows = adaptiveRows(e), bands = 8, k = 5)
    }),
    // IVF cell-probe ANN with one Lloyd refinement step (rows-only:
    // approximate; recall vs brute force asserted in ScalaTest).
    // 32 cells: refinement only pays off once cells are fine-grained
    // enough that quantization structure — not arbitrary boundary
    // placement — decides recall (measured 0.64→0.66 at 32 cells vs
    // 0.60→0.56 at 16 on the 500-vector corpus).
    "ann_ivf_topk" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      ivfTopK(e.filter(col("vec_id") < 10), e, nCells = 32, nProbe = 8, k = 5,
        lloydSteps = 1)
    }),
    // ORACLED companion for the approximate path: recall@k of the IVF
    // result against the brute-force truth, computed INSIDE Spark (a
    // semi-join on (q_id, c_id) + two scalar counts), then collapsed to
    // a floor assertion. The oracle reproduces n_exact with its own
    // brute-force count and pins meets_floor=true — so an IVF recall
    // regression below the documented 0.5 floor flips the boolean and
    // fails the driver's hash compare, giving the rows-only
    // `ann_ivf_topk` a hash-checkable guard. Both inputs are fully
    // deterministic (md5-sampled centroids, integer dots, total-order
    // tie-breaks), so the boolean is stable across runs and engines.
    // ORACLED companion for the sign-LSH path (same pattern as
    // `ann_ivf_recall`): recall@5 of the bucketed result against the
    // brute-force truth for the bounded query set, computed INSIDE
    // Spark and collapsed to a floor assertion the oracle reproduces
    // with its own brute-force count. Gives the rows-only
    // `ann_lsh_bucketed` a driver-checkable guard: a bucketing or
    // projection regression that drops true neighbors below the floor
    // flips the boolean and fails the hash compare. All inputs are
    // deterministic (xxhash64 hyperplanes, integer dots, total-order
    // tie-breaks), so the boolean is stable across runs. Floor 0.5 is
    // conservative: measured recall@5 is 0.70 at sf0.01 and 0.62 at
    // sf0.1 for (rows=4, bands=8).
    "ann_lsh_recall" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      val q = e.filter(col("vec_id") < 10)
      val exact = bruteForceTopK(q, e, k = 5).select(col("q_id"), col("c_id"))
      val lsh = lshTopK(e, rows = adaptiveRows(e), bands = 8, k = 5)
        .filter(col("q_id") < 10).select(col("q_id"), col("c_id"))
      val nExact = exact.agg(count(lit(1)).as("n_exact"))
      val nHits = lsh.join(exact, Seq("q_id", "c_id"), "left_semi")
        .agg(count(lit(1)).as("n_hits"))
      // 1-row × 1-row cross join — two scalars, never data-sized
      nExact.crossJoin(nHits)
        .select(col("n_exact"), lit(0.5).as("recall_floor"),
          (col("n_hits") >= col("n_exact") * lit(0.5)).as("meets_floor"))
    }),

    "ann_ivf_recall" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      val q = e.filter(col("vec_id") < 10)
      val exact = bruteForceTopK(q, e, k = 5).select(col("q_id"), col("c_id"))
      val ivf = ivfTopK(q, e, nCells = 32, nProbe = 8, k = 5, lloydSteps = 1)
        .select(col("q_id"), col("c_id"))
      val nExact = exact.agg(count(lit(1)).as("n_exact"))
      val nHits = ivf.join(exact, Seq("q_id", "c_id"), "left_semi")
        .agg(count(lit(1)).as("n_hits"))
      // 1-row × 1-row cross join — two scalars, never data-sized
      nExact.crossJoin(nHits)
        .select(col("n_exact"), lit(0.5).as("recall_floor"),
          (col("n_hits") >= col("n_exact") * lit(0.5)).as("meets_floor"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    // cosine² verdict cross-multiplied on HUGEINT — no sqrt, no float;
    // best anchor by (dot desc, q_id asc) like every ANN ranking here
    "decontaminate_semantic" ->
      """WITH q AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |n AS (
        |  SELECT vec_id, qv,
        |    CAST(list_sum(list_transform(generate_series(1, len(qv)),
        |      i -> qv[i] * qv[i])) AS BIGINT) AS n2
        |  FROM q),
        |a AS (SELECT vec_id AS q_id, qv AS q_emb, n2 AS na2 FROM n WHERE vec_id < 10),
        |c AS (SELECT vec_id AS c_id, qv AS c_emb, n2 AS nc2 FROM n WHERE vec_id >= 10),
        |d AS (
        |  SELECT c_id, q_id, na2, nc2,
        |    CAST(list_sum(list_transform(generate_series(1, len(q_emb)),
        |      i -> q_emb[i] * c_emb[i])) AS BIGINT) AS dot_q
        |  FROM a CROSS JOIN c)
        |SELECT c_id, q_id AS best_q, dot_q AS max_dot_q,
        |  CAST(CASE WHEN dot_q > 0 AND
        |    CAST(dot_q AS HUGEINT) * dot_q * 1000000 >=
        |    CAST(900000 AS HUGEINT) * na2 * nc2 THEN 1 ELSE 0 END AS INTEGER)
        |    AS contaminated
        |FROM d
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY c_id ORDER BY dot_q DESC, q_id) = 1""".stripMargin,

    // the k-means CTE chain (asg) + the brute-force dot program, with
    // the cluster-mismatch filter riding the probe join
    "ann_hard_negatives" -> (graft.ext.KMeans.oracleCtes +
      """,
        |qa AS (
        |  SELECT q.vec_id AS q_id, q.qv AS q_emb, a.cluster_id AS q_cluster
        |  FROM q JOIN asg a USING (vec_id) WHERE q.vec_id < 10),
        |qc AS (
        |  SELECT q.vec_id AS c_id, q.qv AS c_emb, a.cluster_id AS c_cluster
        |  FROM q JOIN asg a USING (vec_id)),
        |d AS (
        |  SELECT q_id, c_id, c_cluster,
        |    CAST(list_sum(list_transform(generate_series(1, len(q_emb)),
        |      i -> q_emb[i] * c_emb[i])) AS BIGINT) AS dot_q
        |  FROM qa JOIN qc ON q_id != c_id AND q_cluster != c_cluster)
        |SELECT q_id,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY dot_q DESC, c_id) AS INTEGER) AS rank,
        |  c_id, c_cluster, dot_q
        |FROM d
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY dot_q DESC, c_id) <= 5""".stripMargin),

    // both rankings replayed with the quantized-dot formula (the
    // ann_bruteforce_topk replica), the prefix one over dims 1..16
    "ann_matryoshka_recall" ->
      """WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
        |df AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
        |    CAST(list_sum(list_transform(generate_series(1, len(q.embedding)),
        |      i -> CAST(round(CAST(q.embedding[i] AS DOUBLE) * 1000) AS BIGINT)
        |         * CAST(round(CAST(c.embedding[i] AS DOUBLE) * 1000) AS BIGINT))) AS BIGINT) AS dot_q
        |  FROM q JOIN embeddings c ON q.vec_id != c.vec_id),
        |fulltop AS (
        |  SELECT q_id, c_id FROM df
        |  QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY dot_q DESC, c_id) <= 5),
        |dp AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
        |    CAST(list_sum(list_transform(generate_series(1, 16),
        |      i -> CAST(round(CAST(q.embedding[i] AS DOUBLE) * 1000) AS BIGINT)
        |         * CAST(round(CAST(c.embedding[i] AS DOUBLE) * 1000) AS BIGINT))) AS BIGINT) AS dot_q
        |  FROM q JOIN embeddings c ON q.vec_id != c.vec_id),
        |preftop AS (
        |  SELECT q_id, c_id FROM dp
        |  QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY dot_q DESC, c_id) <= 5),
        |ov AS (
        |  SELECT q_id, count(*) AS n_overlap
        |  FROM fulltop JOIN preftop USING (q_id, c_id) GROUP BY q_id)
        |SELECT q_id, CAST(5 AS BIGINT) AS k,
        |  CAST(coalesce(n_overlap, 0) AS BIGINT) AS n_overlap,
        |  CAST(coalesce(n_overlap, 0) * 1000000 // 5 AS BIGINT) AS overlap_ppm
        |FROM (SELECT DISTINCT q_id FROM fulltop) LEFT JOIN ov USING (q_id)""".stripMargin,

    "knn_graph_mutual" ->
      """WITH a AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 100),
        |d AS (
        |  SELECT q.vec_id AS src, c.vec_id AS dst,
        |    CAST(list_sum(list_transform(generate_series(1, len(q.embedding)),
        |      i -> CAST(round(CAST(q.embedding[i] AS DOUBLE) * 1000) AS BIGINT)
        |         * CAST(round(CAST(c.embedding[i] AS DOUBLE) * 1000) AS BIGINT))) AS BIGINT) AS dot_q
        |  FROM a q JOIN a c ON q.vec_id != c.vec_id),
        |edges AS (
        |  SELECT src, dst FROM d
        |  QUALIFY row_number() OVER (PARTITION BY src ORDER BY dot_q DESC, dst) <= 5),
        |m AS (
        |  SELECT count(*) AS n_mutual FROM edges e
        |  WHERE EXISTS (SELECT 1 FROM edges r
        |    WHERE r.src = e.dst AND r.dst = e.src)),
        |t AS (SELECT count(*) AS n_directed FROM edges)
        |SELECT CAST(n_directed AS BIGINT) AS n_directed,
        |  CAST(n_mutual AS BIGINT) AS n_mutual,
        |  CAST(n_mutual * 1000000 // greatest(n_directed, 1) AS BIGINT)
        |    AS mutual_ppm
        |FROM t, m""".stripMargin,

    // sum(BIGINT) is HUGEINT in DuckDB — cast back
    "embedding_dim_stats" ->
      """SELECT label, CAST(i - 1 AS INTEGER) AS dim, count(*) AS n,
        |  CAST(sum(CAST(round(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT)) AS BIGINT) AS sum_q
        |FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(i)
        |GROUP BY label, i""".stripMargin,
    "ann_bruteforce_topk" ->
      """WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
        |d AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
        |    CAST(list_sum(list_transform(generate_series(1, len(q.embedding)),
        |      i -> CAST(round(CAST(q.embedding[i] AS DOUBLE) * 1000) AS BIGINT)
        |         * CAST(round(CAST(c.embedding[i] AS DOUBLE) * 1000) AS BIGINT))) AS BIGINT) AS dot_q
        |  FROM q JOIN embeddings c ON q.vec_id != c.vec_id)
        |SELECT q_id,
        |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY dot_q DESC, c_id) AS INTEGER) AS rank,
        |  c_id, dot_q
        |FROM d
        |QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY dot_q DESC, c_id) <= 5""".stripMargin,
    // the 5th-NN similarity per audit vector (rank 5 of the same
    // brute-force program) — low dot = embedding-space outlier
    "embedding_outlier_score" ->
      """WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 50),
        |d AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
        |    CAST(list_sum(list_transform(generate_series(1, len(q.embedding)),
        |      i -> CAST(round(CAST(q.embedding[i] AS DOUBLE) * 1000) AS BIGINT)
        |         * CAST(round(CAST(c.embedding[i] AS DOUBLE) * 1000) AS BIGINT))) AS BIGINT) AS dot_q
        |  FROM q JOIN embeddings c ON q.vec_id != c.vec_id)
        |SELECT q_id AS vec_id, dot_q AS knn5_dot_q
        |FROM d
        |QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY dot_q DESC, c_id) = 5""".stripMargin,

    // same contract as ann_ivf_recall below: the oracle reproduces
    // n_exact with its own brute-force top-k and PINS meets_floor —
    // DuckDB cannot run the xxhash64-seeded LSH, so the approximate
    // side is graded as "did Spark's recall clear the documented floor"
    "ann_lsh_recall" ->
      """WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
        |d AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
        |    CAST(list_sum(list_transform(generate_series(1, len(q.embedding)),
        |      i -> CAST(round(CAST(q.embedding[i] AS DOUBLE) * 1000) AS BIGINT)
        |         * CAST(round(CAST(c.embedding[i] AS DOUBLE) * 1000) AS BIGINT))) AS BIGINT) AS dot_q
        |  FROM q JOIN embeddings c ON q.vec_id != c.vec_id),
        |t AS (SELECT q_id, c_id FROM d
        |  QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY dot_q DESC, c_id) <= 5)
        |SELECT CAST(count(*) AS BIGINT) AS n_exact, CAST(0.5 AS DOUBLE) AS recall_floor,
        |  CAST(TRUE AS BOOLEAN) AS meets_floor
        |FROM t""".stripMargin,
    // the oracle reproduces the exact-neighbor count with its own
    // brute-force top-k and PINS meets_floor — DuckDB cannot run IVF,
    // so the approximate side is graded as "did Spark's recall clear
    // the documented floor", which is exactly the invariant we ship
    "ann_ivf_recall" ->
      """WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
        |d AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
        |    CAST(list_sum(list_transform(generate_series(1, len(q.embedding)),
        |      i -> CAST(round(CAST(q.embedding[i] AS DOUBLE) * 1000) AS BIGINT)
        |         * CAST(round(CAST(c.embedding[i] AS DOUBLE) * 1000) AS BIGINT))) AS BIGINT) AS dot_q
        |  FROM q JOIN embeddings c ON q.vec_id != c.vec_id),
        |t AS (SELECT q_id, c_id FROM d
        |  QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY dot_q DESC, c_id) <= 5)
        |SELECT CAST(count(*) AS BIGINT) AS n_exact, CAST(0.5 AS DOUBLE) AS recall_floor,
        |  CAST(TRUE AS BOOLEAN) AS meets_floor
        |FROM t""".stripMargin
  )
}
