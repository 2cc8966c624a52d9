package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization ANN (Jégou et al. 2011, "Product Quantization
  * for Nearest Neighbor Search") — THE embedding-scale compression
  * path: each 64-dim vector splits into `m`=8 contiguous 8-dim
  * subvectors, each subvector is encoded as the id of its nearest
  * codeword in a per-subspace codebook of `c`=16 entries, and search
  * scores candidates by ADC (asymmetric distance computation): the
  * query's exact subvectors against the candidates' CODEWORDS, via a
  * per-query lookup table. The encoded corpus is m·log2(c) = 48 bits
  * per vector vs 2048 bits of float32 — a 42× compression — and ADC
  * scoring never touches raw vectors, which is what makes 100 TB of
  * embeddings searchable from a table that fits in page cache; only
  * the final rerank fetches the |queries|·shortlist raw rows.
  *
  * Everything is INTEGER-EXACT (the first fully hash-oracled PQ):
  *
  *  - corpus quantized at 1e3 scale ([[graft.functions.QuantizedDot]]);
  *  - initial codebooks: the subvectors of the 16 md5-smallest vec_ids
  *    (the engine's standard portable "deterministic random");
  *  - one integer Lloyd round per subspace: per-(sub, code, pos) sums,
  *    floor-division promotion to 1e6 scale — the
  *    `embedding_kmeans_assign` update, applied per subspace;
  *  - all distances are squared L2 expanded as a·a − 2a·b + b·b with
  *    the codegen quantized dot (no float sqrt anywhere); ties break to
  *    the smallest code/candidate id.
  *
  * Plan shape: codebooks and the ADC lookup table are parameter-sized
  * (m·c and nq·m·c rows) and BROADCAST; the corpus appears only as
  * (vec_id, sub, code) triples after encode; the ADC join is an
  * equi-join on (sub, code) followed by one map-side-combined sum per
  * (query, candidate). Nothing data-sized is ever nested-looped.
  */
object ProductQuant {

  import graft.functions.QuantizedDot.{quantize, quantizedDot}

  /** Squared L2 distance of two quantized vectors, via three codegen
    * dot products: |a−b|² = a·a − 2·a·b + b·b.
    */
  private def l2sq(a: Column, b: Column): Column =
    quantizedDot(a, a) - lit(2L) * quantizedDot(a, b) + quantizedDot(b, b)

  /** ADC shortlist: the `shortlist` nearest candidates per query by PQ
    * squared distance, ascending, ties to the smaller vec_id.
    * `m`·`dsub` must equal the embedding dimension.
    */
  private def subvectorsOf(df: DataFrame, m: Int, dsub: Int): DataFrame =
    df.select(col("vec_id"), quantize(col("embedding")).as("qv"))
      .select(col("vec_id"), explode(transform(sequence(lit(0), lit(m - 1)),
        s => struct(s.cast("int").as("sub"),
          slice(col("qv"), s * lit(dsub) + lit(1), lit(dsub)).as("sv")))).as("e"))
      .select(col("vec_id"), col("e.sub").as("sub"), col("e.sv").as("sv"))

  /** PQ-encoded corpus + the Lloyd-refined codebooks:
    * ((vec_id, sub, code), (sub, code, cw)) — the seed/assign/update/
    * encode chain shared by [[pqShortlist]] and [[ivfpqTopK]].
    */
  private def encodedCorpus(corpus: DataFrame, m: Int, dsub: Int,
                            c: Int): (DataFrame, DataFrame) = {
    val sv = subvectorsOf(corpus, m, dsub)
    val seeds = corpus
      .withColumn("_h", md5(col("vec_id").cast("string")))
      .orderBy(col("_h"), col("vec_id")).limit(c)
      .select(col("vec_id"))
    val cb0 = sv.join(broadcast(seeds), "vec_id")
      .select(col("sub"), col("vec_id").as("code"), col("sv").as("cw"))
    def encode(cb: DataFrame, promote: Long): DataFrame = {
      val svp = if (promote == 1L) col("sv")
        else transform(col("sv"), x => x * lit(promote))
      val scored = sv.withColumn("svp", svp)
        .join(broadcast(cb), Seq("sub"))
        .withColumn("d", l2sq(col("svp"), col("cw")))
      graft.plans.TopKPerKey.topKPerKey(scored, Seq("vec_id", "sub"),
          Seq(("d", false), ("code", false)), 1)
        .select(col("vec_id"), col("sub"), col("code"))
    }
    val e1 = encode(cb0, 1L)
    val cb2 = e1.join(sv, Seq("vec_id", "sub"))
      .select(col("sub"), col("code"), posexplode(col("sv")).as(Seq("pos", "x")))
      .groupBy(col("sub"), col("code"), col("pos"))
      .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
      .withColumn("cv", expr("(s * 1000 - pmod(s * 1000, n)) div n"))
      .groupBy(col("sub"), col("code"))
      .agg(array_sort(collect_list(struct(col("pos"), col("cv")))).as("a"))
      .select(col("sub"), col("code"), expr("transform(a, x -> x.cv)").as("cw"))
    (encode(cb2, 1000L), cb2)
  }

  /** ADC lookup table for the bounded query set: nq·m·c rows,
    * broadcast-sized — the query's exact (promoted) subvectors against
    * every refined codeword.
    */
  private def adcLut(queries: DataFrame, cb2: DataFrame, m: Int, dsub: Int): DataFrame =
    subvectorsOf(queries, m, dsub)
      .withColumn("svp", transform(col("sv"), x => x * lit(1000L)))
      .join(broadcast(cb2), Seq("sub"))
      .select(col("vec_id").as("q_id"), col("sub"), col("code"),
        l2sq(col("svp"), col("cw")).as("d"))

  def pqShortlist(queries: DataFrame, corpus: DataFrame,
                  m: Int = 8, dsub: Int = 8, c: Int = 64,
                  shortlist: Int = 50): DataFrame = {
    val (enc, cb2) = encodedCorpus(corpus, m, dsub, c)
    val lut = adcLut(queries, cb2, m, dsub)
    val adc = enc.join(broadcast(lut), Seq("sub", "code"))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(col("d")).as("adist"))
    graft.plans.TopKPerKey.topKPerKey(adc, Seq("q_id"),
        Seq(("adist", false), ("vec_id", false)), shortlist)
      .select(col("q_id"), col("rank"), col("vec_id").as("c_id"), col("adist"))
  }

  /** PQ top-k with exact rerank — the published ADC-then-rerank shape
    * (IVFADC-R): the PQ shortlist bounds the exact work to
    * |queries|·`shortlist` dot products (an equi-join fetch of just the
    * shortlisted raw vectors — at 100 TB the only stage that touches
    * uncompressed data), and the final ranking is the exact quantized
    * dot, descending, so PQ approximation error can only cost recall
    * (shortlist misses), never mis-rank what it did retrieve.
    * Measured on the test corpus: recall@5 = 0.90 vs brute force.
    */
  def pqTopK(queries: DataFrame, corpus: DataFrame,
             m: Int = 8, dsub: Int = 8, c: Int = 64,
             shortlist: Int = 50, k: Int = 5): DataFrame = {
    val short = pqShortlist(queries, corpus, m, dsub, c, shortlist)
      .select(col("q_id"), col("c_id"))
    val qvC = corpus.select(col("vec_id").as("c_id"),
      quantize(col("embedding")).as("qv_c"))
    val qvQ = queries.select(col("vec_id").as("q_id"),
      quantize(col("embedding")).as("qv_q"))
    val rer = short
      .join(broadcast(qvQ), "q_id")
      .join(qvC, "c_id")
      .select(col("q_id"), col("c_id"),
        quantizedDot(col("qv_q"), col("qv_c")).as("dot_q"))
    graft.plans.TopKPerKey.topKPerKey(rer, Seq("q_id"),
        Seq(("dot_q", true), ("c_id", false)), k)
      .select(col("q_id"), col("rank"), col("c_id"), col("dot_q"))
  }

  /** IVF + PQ — the published IVFADC composition, the actual 100 TB
    * recipe: a coarse quantizer (md5-seeded centroids, dot-product
    * argmax — NO Lloyd step here, keeping the whole program
    * integer-exact and hash-oracleable) routes every corpus vector to
    * one cell; a query probes its `nProbe` best cells and ADC-scores
    * ONLY the vectors in those cells; the shortlist reranks exact.
    * vs [[pqTopK]]: the ADC join is restricted by the candidate pair
    * set, so scored pairs drop from |queries|·|corpus| to
    * |queries|·(nProbe/nCells)·|corpus| — the multiplier that makes
    * the page-cache-resident code table searchable at all when the
    * corpus no longer is.
    *
    * Plan shape: centroids broadcast to both assignment joins (the
    * corpus never shuffles to be assigned), candidate pairs are an
    * equi-join on the cell id, the LUT is broadcast, and the ADC sum
    * is one map-side-combining aggregate keyed (q_id, c_id).
    */
  def ivfpqTopK(queries: DataFrame, corpus: DataFrame,
                nCells: Int = 32, nProbe: Int = 8,
                m: Int = 8, dsub: Int = 8, c: Int = 64,
                shortlist: Int = 50, k: Int = 5): DataFrame = {
    val cents = corpus
      .withColumn("_h", md5(col("vec_id").cast("string")))
      .orderBy(col("_h"), col("vec_id")).limit(nCells)
      .select(col("vec_id").as("cent_id"), quantize(col("embedding")).as("cent_qv"))
    def assign(df: DataFrame, idCol: String, n: Int): DataFrame = {
      val scored = df
        .select(col("vec_id").as(idCol), quantize(col("embedding")).as("qv"))
        .join(broadcast(cents), col(idCol) =!= lit(-1L))
        .withColumn("dc", quantizedDot(col("qv"), col("cent_qv")))
      graft.plans.TopKPerKey.topKPerKey(scored, Seq(idCol),
          Seq(("dc", true), ("cent_id", false)), n)
        .select(col(idCol), col("cent_id").as("cell"))
    }
    val cells = assign(corpus, "c_id", 1)
    val probes = assign(queries, "q_id", nProbe)
    val cand = probes.join(cells, Seq("cell"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"))

    val (enc, cb2) = encodedCorpus(corpus, m, dsub, c)
    val lut = adcLut(queries, cb2, m, dsub)
    val adc = cand
      .join(enc.withColumnRenamed("vec_id", "c_id"), "c_id")
      .join(broadcast(lut), Seq("q_id", "sub", "code"))
      .groupBy(col("q_id"), col("c_id"))
      .agg(sum(col("d")).as("adist"))
    val short = graft.plans.TopKPerKey.topKPerKey(adc, Seq("q_id"),
        Seq(("adist", false), ("c_id", false)), shortlist)
      .select(col("q_id"), col("c_id"))
    val qvC = corpus.select(col("vec_id").as("c_id"), quantize(col("embedding")).as("qv_c"))
    val qvQ = queries.select(col("vec_id").as("q_id"), quantize(col("embedding")).as("qv_q"))
    val rer = short
      .join(broadcast(qvQ), "q_id")
      .join(qvC, "c_id")
      .select(col("q_id"), col("c_id"),
        quantizedDot(col("qv_q"), col("qv_c")).as("dot_q"))
    graft.plans.TopKPerKey.topKPerKey(rer, Seq("q_id"),
        Seq(("dot_q", true), ("c_id", false)), k)
      .select(col("q_id"), col("rank"), col("c_id"), col("dot_q"))
  }

  val queries: Map[String, Q] = Map(
    "ann_pq_topk" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      pqTopK(e.filter(col("vec_id") < 10), e)
    }),
    // Exact recall@5 vs brute force: both sides are deterministic
    // integer programs, so the hit COUNT itself is oracle-exact (the
    // 0.90 in the Scaladoc is this number, hash-guarded every round).
    "ann_pq_recall" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      val queries = e.filter(col("vec_id") < 10)
      val exact = SimSearch.bruteForceTopK(queries, e, k = 5)
        .select(col("q_id"), col("c_id"))
      val pq = pqTopK(queries, e).select(col("q_id"), col("c_id"))
      val nExact = exact.agg(count(lit(1)).as("n_exact"))
      val nHits = pq.join(exact, Seq("q_id", "c_id"), "left_semi")
        .agg(count(lit(1)).as("n_hits"))
      // 1-row × 1-row cross join — two scalars, never data-sized
      nExact.crossJoin(nHits)
    }),

    // IVF + PQ (IVFADC): the full composed program is integer-exact —
    // coarse cells have NO Lloyd step, so the oracle replays every
    // stage and the result is hash-exact like ann_pq_topk
    "ann_ivfpq_topk" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      ivfpqTopK(e.filter(col("vec_id") < 10), e)
    }),
    // exact recall@5 vs brute force (integer hit count, oracle-exact) —
    // quantifies what the cell restriction costs vs full-corpus ADC
    "ann_ivfpq_recall" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      val qs = e.filter(col("vec_id") < 10)
      val exact = SimSearch.bruteForceTopK(qs, e, k = 5)
        .select(col("q_id"), col("c_id"))
      val ivfpq = ivfpqTopK(qs, e).select(col("q_id"), col("c_id"))
      val nExact = exact.agg(count(lit(1)).as("n_exact"))
      val nHits = ivfpq.join(exact, Seq("q_id", "c_id"), "left_semi")
        .agg(count(lit(1)).as("n_hits"))
      // 1-row × 1-row cross join — two scalars, never data-sized
      nExact.crossJoin(nHits)
    })
  )

  /** The full PQ program as a DuckDB CTE chain ending in `pq`
    * (q_id, rank, c_id, dot_q — the reranked top-`k`), shared by the
    * top-k oracle, the exact recall companion, and RankFusion's hybrid
    * oracle. `lead` lets a composing query supply its own WITH and
    * splice this chain mid-list; `adcCte` lets [[ivfpqTopK]]'s oracle
    * swap the full-corpus ADC for the candidate-restricted one (any
    * CTEs it needs may precede the `adc` definition inside the string).
    */
  private[ext] def oracleCtesFor(shortlist: Int, k: Int,
                                 lead: String = "WITH ",
                                 adcCte: String = defaultAdcCte): String =
      (lead +
      """q AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |sv AS (
        |  SELECT vec_id, CAST(s AS INTEGER) AS sub,
        |    list_slice(qv, s * 8 + 1, s * 8 + 8) AS sv
        |  FROM q, UNNEST(generate_series(0, 7)) AS t(s)),
        |seeds AS (
        |  SELECT vec_id FROM q
        |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 64),
        |cb0 AS (
        |  SELECT sub, sv.vec_id AS code, sv.sv AS cw
        |  FROM sv JOIN seeds ON sv.vec_id = seeds.vec_id),
        |a1 AS (
        |  SELECT sv.vec_id, sv.sub, cb0.code,
        |    CAST(list_sum(list_transform(generate_series(1, 8),
        |      i -> (sv.sv[i] - cb0.cw[i]) * (sv.sv[i] - cb0.cw[i]))) AS BIGINT) AS d
        |  FROM sv JOIN cb0 ON sv.sub = cb0.sub),
        |e1 AS (
        |  SELECT vec_id, sub, code FROM a1
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY d, code) = 1),
        |sums AS (
        |  SELECT e1.sub, e1.code, i AS pos,
        |    CAST(sum(sv.sv[i]) AS BIGINT) AS s, count(*) AS n
        |  FROM e1 JOIN sv ON sv.vec_id = e1.vec_id AND sv.sub = e1.sub,
        |    UNNEST(generate_series(1, 8)) AS t(i)
        |  GROUP BY e1.sub, e1.code, i),
        |cb2 AS (
        |  SELECT sub, code,
        |    list((s * 1000 - ((s * 1000) % n + n) % n) // n ORDER BY pos) AS cw
        |  FROM sums GROUP BY sub, code),
        |a2 AS (
        |  SELECT sv.vec_id, sv.sub, cb2.code,
        |    CAST(list_sum(list_transform(generate_series(1, 8),
        |      i -> (sv.sv[i] * 1000 - cb2.cw[i]) * (sv.sv[i] * 1000 - cb2.cw[i]))) AS BIGINT) AS d
        |  FROM sv JOIN cb2 ON sv.sub = cb2.sub),
        |enc AS (
        |  SELECT vec_id, sub, code FROM a2
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY d, code) = 1),
        |lut AS (
        |  SELECT qs.vec_id AS q_id, qs.sub, cb2.code,
        |    CAST(list_sum(list_transform(generate_series(1, 8),
        |      i -> (qs.sv[i] * 1000 - cb2.cw[i]) * (qs.sv[i] * 1000 - cb2.cw[i]))) AS BIGINT) AS d
        |  FROM (SELECT * FROM sv WHERE vec_id < 10) qs
        |  JOIN cb2 ON qs.sub = cb2.sub),
        |ADC_CTE
        |short AS (
        |  SELECT q_id, c_id FROM adc
        |  QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY adist, c_id) <= SHORTLIST_N),
        |rer AS (
        |  SELECT s.q_id, s.c_id,
        |    CAST(list_sum(list_transform(generate_series(1, len(qa.qv)),
        |      i -> qa.qv[i] * qc.qv[i])) AS BIGINT) AS dot_q
        |  FROM short s
        |  JOIN q qa ON qa.vec_id = s.q_id
        |  JOIN q qc ON qc.vec_id = s.c_id),
        |pq AS (
        |  SELECT q_id,
        |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY dot_q DESC, c_id) AS INTEGER) AS rank,
        |    c_id, dot_q
        |  FROM rer
        |  QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY dot_q DESC, c_id) <= TOPK_N)""".stripMargin)
        .replace("ADC_CTE", adcCte)
        .replace("SHORTLIST_N", shortlist.toString)
        .replace("TOPK_N", k.toString)

  private val defaultAdcCte: String =
    """adc AS (
      |  SELECT lut.q_id, enc.vec_id AS c_id, CAST(sum(lut.d) AS BIGINT) AS adist
      |  FROM enc JOIN lut ON enc.sub = lut.sub AND enc.code = lut.code
      |  WHERE enc.vec_id != lut.q_id
      |  GROUP BY lut.q_id, enc.vec_id),""".stripMargin

  /** The IVF coarse layer + candidate-restricted ADC: centroids are
    * the md5-smallest NCELLS vectors, assignment/probing is the
    * quantized dot argmax (ties to the smaller cent_id), and `adc`
    * aggregates only pairs routed through a probed cell — the same
    * restriction [[ivfpqTopK]]'s candidate join applies.
    */
  private def ivfAdcCte(nCells: Int, nProbe: Int): String =
    """cents AS (
      |  SELECT vec_id AS cent_id, qv AS cent_qv FROM q
      |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT NCELLS),
      |cdots AS (
      |  SELECT c.vec_id, cents.cent_id,
      |    CAST(list_sum(list_transform(generate_series(1, len(c.qv)),
      |      i -> c.qv[i] * cents.cent_qv[i])) AS BIGINT) AS dc
      |  FROM q c CROSS JOIN cents),
      |cells AS (
      |  SELECT vec_id AS c_id, cent_id AS cell FROM cdots
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dc DESC, cent_id) = 1),
      |probes AS (
      |  SELECT vec_id AS q_id, cent_id AS cell FROM cdots
      |  WHERE vec_id < 10
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dc DESC, cent_id) <= NPROBE),
      |cand AS (
      |  SELECT p.q_id, cl.c_id FROM probes p JOIN cells cl ON p.cell = cl.cell
      |  WHERE cl.c_id != p.q_id),
      |adc AS (
      |  SELECT cand.q_id, cand.c_id, CAST(sum(lut.d) AS BIGINT) AS adist
      |  FROM cand
      |  JOIN enc ON enc.vec_id = cand.c_id
      |  JOIN lut ON lut.q_id = cand.q_id AND lut.sub = enc.sub AND lut.code = enc.code
      |  GROUP BY cand.q_id, cand.c_id),""".stripMargin
      .replace("NCELLS", nCells.toString)
      .replace("NPROBE", nProbe.toString)

  private val oracleCtes: String = oracleCtesFor(50, 5)

  private val ivfpqOracleCtes: String =
    oracleCtesFor(50, 5, adcCte = ivfAdcCte(32, 8))

  val oracleSql: Map[String, String] = Map(
    // The identical integer program: subspace as data (UNNEST over sub),
    // the same seed/assign/update/encode/ADC chain, HUGEINT sums cast
    // back, `//` floor division on exact multiples ≡ Spark's `div`.
    "ann_pq_topk" ->
      (oracleCtes + "\nSELECT q_id, rank, c_id, dot_q FROM pq"),
    // Recall@5 vs brute force as EXACT integers — unlike the IVF
    // companion's pinned floor boolean, BOTH sides here are
    // deterministic integer programs, so the oracle recomputes the
    // recall itself and the driver hash-checks the exact hit count.
    "ann_pq_recall" ->
      (oracleCtes + """,
        |exact AS (
        |  SELECT qa.vec_id AS q_id, qc.vec_id AS c_id,
        |    CAST(list_sum(list_transform(generate_series(1, len(qa.qv)),
        |      i -> qa.qv[i] * qc.qv[i])) AS BIGINT) AS dot
        |  FROM (SELECT * FROM q WHERE vec_id < 10) qa
        |  JOIN q qc ON qa.vec_id != qc.vec_id
        |  QUALIFY row_number() OVER (PARTITION BY qa.vec_id ORDER BY dot DESC, qc.vec_id) <= 5)
        |SELECT CAST((SELECT count(*) FROM exact) AS BIGINT) AS n_exact,
        |  CAST((SELECT count(*) FROM pq JOIN exact USING (q_id, c_id)) AS BIGINT) AS n_hits""".stripMargin),

    // the same chain with the candidate-restricted ADC (cells/probes/
    // cand CTEs spliced in place of the full-corpus adc)
    "ann_ivfpq_topk" ->
      (ivfpqOracleCtes + "\nSELECT q_id, rank, c_id, dot_q FROM pq"),
    "ann_ivfpq_recall" ->
      (ivfpqOracleCtes + """,
        |exact AS (
        |  SELECT qa.vec_id AS q_id, qc.vec_id AS c_id,
        |    CAST(list_sum(list_transform(generate_series(1, len(qa.qv)),
        |      i -> qa.qv[i] * qc.qv[i])) AS BIGINT) AS dot
        |  FROM (SELECT * FROM q WHERE vec_id < 10) qa
        |  JOIN q qc ON qa.vec_id != qc.vec_id
        |  QUALIFY row_number() OVER (PARTITION BY qa.vec_id ORDER BY dot DESC, qc.vec_id) <= 5)
        |SELECT CAST((SELECT count(*) FROM exact) AS BIGINT) AS n_exact,
        |  CAST((SELECT count(*) FROM pq JOIN exact USING (q_id, c_id)) AS BIGINT) AS n_hits""".stripMargin)
  )
}
