package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binary (1-bit-per-dimension) embedding quantization — the most
  * aggressive point on the compression ladder beside [[Sq8]] (8-bit
  * scalar) and [[ProductQuant]] (codebook): each dimension collapses to
  * its sign bit, a 64-dim float vector becomes ONE 64-bit word, and
  * similarity becomes Hamming distance = `bit_count(xor)` — two machine
  * instructions per comparison. The modern retrieval recipe is
  * BQ-shortlist → exact-dot rerank: scan the 32×-smaller bit corpus for
  * a generous candidate list, then rescore only the shortlist at full
  * precision.
  *
  * Unlike sign-LSH ([[SimSearch.lshTopK]]), which buckets by random
  * hyperplane signs and can MISS neighbors outside the probed buckets,
  * BQ ranks the FULL corpus by Hamming distance — deterministic,
  * data-independent, and fully SQL-expressible, so both queries here
  * carry EXACT DuckDB oracles (no recall-floor indirection): the bit
  * codes, the Hamming ranking, the rerank, and the recall arithmetic
  * reproduce bit-for-bit.
  *
  * 100 TB shape: code construction is a stateless projection (the
  * corpus compresses 32× before anything moves); the scan broadcasts
  * the bounded query side so the corpus never shuffles; the rerank
  * joins the shortlist (|Q|·shortlist rows) back to the corpus on
  * vec_id — an equi-join whose probe side is candidate-sized, not
  * corpus-sized. Everything is codegen'd built-ins (HOF aggregate,
  * xor, bit_count); integer-exact throughout.
  */
object BinaryQuant {

  /** Bit codes for a 64-dim embedding as two 32-bit halves (`c_lo`
    * dims 1-32, `c_hi` dims 33-64) packed little-endian (bit j = dim
    * lo+j non-negative). Halves of 32 keep every partial sum positive
    * in both engines — summing distinct powers of two is the bitwise
    * OR without sign-bit hazards. SQL HOF form, shared with the oracle.
    */
  def withCodes(e: DataFrame, embCol: String = "embedding"): DataFrame = {
    def code(lo: Int): Column = expr(
      s"""aggregate(sequence($lo, ${lo + 31}),
         |  0L,
         |  (acc, i) -> acc + CASE WHEN element_at($embCol, CAST(i + 1 AS INT)) >= 0
         |    THEN shiftleft(1L, i - $lo) ELSE 0L END)""".stripMargin)
    e.withColumn("c_lo", code(0)).withColumn("c_hi", code(32))
  }

  private def hamming(al: Column, ah: Column, bl: Column, bh: Column): Column =
    (bit_count(al.bitwiseXOR(bl)) + bit_count(ah.bitwiseXOR(bh))).cast("int")

  /** Full-corpus Hamming top-k for the bounded query set: codes on both
    * sides, query side broadcast, ranked (hamming asc, c_id asc) through
    * the partial/final heap operator — ≤ k rows per (partition, query)
    * reach the shuffle.
    */
  def bqTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = withCodes(queries)
      .select(col("vec_id").as("q_id"), col("c_lo").as("q_lo"), col("c_hi").as("q_hi"))
    val c = withCodes(corpus)
      .select(col("vec_id").as("c_id"), col("c_lo"), col("c_hi"))
    val scored = broadcast(q).join(c, col("q_id") =!= col("c_id"))
      .withColumn("hamming", hamming(col("q_lo"), col("q_hi"), col("c_lo"), col("c_hi")))
    graft.plans.TopKPerKey.topKPerKey(scored, Seq("q_id"),
        Seq(("hamming", false), ("c_id", false)), k)
      .select(col("q_id"), col("rank"), col("c_id"), col("hamming"))
  }

  /** BQ-shortlist → exact rerank: Hamming top-`shortlist` per query,
    * rescored by the exact quantized dot (the [[SimSearch]] integer
    * discipline), re-ranked (dot desc, c_id asc), top-`k`.
    */
  def bqRerankTopK(queries: DataFrame, corpus: DataFrame,
                   shortlist: Int, k: Int): DataFrame = {
    import graft.functions.QuantizedDot.{quantize, quantizedDot}
    val short = bqTopK(queries, corpus, shortlist).select(col("q_id"), col("c_id"))
    val scored = short
      .join(broadcast(queries.select(col("vec_id").as("q_id"),
        quantize(col("embedding")).as("q_emb"))), "q_id")
      .join(corpus.select(col("vec_id").as("c_id"),
        quantize(col("embedding")).as("c_emb")), "c_id")
      .withColumn("dot_q", quantizedDot(col("q_emb"), col("c_emb")))
    graft.plans.TopKPerKey.topKPerKey(scored, Seq("q_id"),
        Seq(("dot_q", true), ("c_id", false)), k)
      .select(col("q_id"), col("rank"), col("c_id"), col("dot_q"))
  }

  val queries: Map[String, Q] = Map(
    // full-corpus Hamming ranking over the packed sign bits — exact
    // oracle (deterministic and SQL-expressible end to end)
    "ann_bq_topk" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      bqTopK(e.filter(col("vec_id") < 10), e, k = 5)
    }),
    // the production recipe: BQ shortlist (top-20 Hamming) → exact-dot
    // rerank to top-5, then recall@5 against the brute-force truth as
    // an EXACT ppm — the oracle recomputes the whole chain, so a
    // single lost neighbor moves recall_ppm and fails the hash compare
    "ann_bq_rerank_recall" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      val q = e.filter(col("vec_id") < 10)
      val exact = SimSearch.bruteForceTopK(q, e, k = 5).select(col("q_id"), col("c_id"))
      val rr = bqRerankTopK(q, e, shortlist = 20, k = 5).select(col("q_id"), col("c_id"))
      val nExact = exact.agg(count(lit(1)).as("n_exact"))
      val nHits = rr.join(exact, Seq("q_id", "c_id"), "left_semi")
        .agg(count(lit(1)).as("n_hits"))
      // 1-row × 1-row cross join — two scalars, never data-sized
      nExact.crossJoin(nHits)
        .select(col("n_exact"), col("n_hits"),
          expr("n_hits * 1000000L div n_exact").as("recall_ppm"))
    })
  )

  private val codeSql =
    """SELECT vec_id,
      |  CAST(list_sum(list_transform(generate_series(1, 32),
      |    i -> CASE WHEN embedding[i] >= 0
      |      THEN CAST(1 AS BIGINT) << (i - 1) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS c_lo,
      |  CAST(list_sum(list_transform(generate_series(33, 64),
      |    i -> CASE WHEN embedding[i] >= 0
      |      THEN CAST(1 AS BIGINT) << (i - 33) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS c_hi
      |FROM embeddings""".stripMargin

  private val hamSql =
    s"""code AS ($codeSql),
       |ham AS (
       |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
       |    CAST(bit_count(xor(q.c_lo, c.c_lo)) + bit_count(xor(q.c_hi, c.c_hi)) AS INTEGER) AS hamming
       |  FROM code q JOIN code c ON q.vec_id < 10 AND q.vec_id != c.vec_id)""".stripMargin

  private val dotSql =
    """CAST(list_sum(list_transform(generate_series(1, len(q.embedding)),
      |      i -> CAST(round(CAST(q.embedding[i] AS DOUBLE) * 1000) AS BIGINT)
      |         * CAST(round(CAST(c.embedding[i] AS DOUBLE) * 1000) AS BIGINT))) AS BIGINT)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "ann_bq_topk" ->
      s"""WITH $hamSql
         |SELECT q_id,
         |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY hamming, c_id) AS INTEGER) AS rank,
         |  c_id, hamming
         |FROM ham
         |QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY hamming, c_id) <= 5""".stripMargin,
    "ann_bq_rerank_recall" ->
      s"""WITH $hamSql,
         |short AS (
         |  SELECT q_id, c_id FROM ham
         |  QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY hamming, c_id) <= 20),
         |rr AS (
         |  SELECT s.q_id, s.c_id,
         |    $dotSql AS dot_q
         |  FROM short s
         |  JOIN embeddings q ON q.vec_id = s.q_id
         |  JOIN embeddings c ON c.vec_id = s.c_id),
         |rr5 AS (
         |  SELECT q_id, c_id FROM rr
         |  QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY dot_q DESC, c_id) <= 5),
         |d AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
         |    $dotSql AS dot_q
         |  FROM embeddings q JOIN embeddings c
         |    ON q.vec_id < 10 AND q.vec_id != c.vec_id),
         |exact AS (
         |  SELECT q_id, c_id FROM d
         |  QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY dot_q DESC, c_id) <= 5),
         |hits AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_hits
         |  FROM rr5 SEMI JOIN exact ON rr5.q_id = exact.q_id AND rr5.c_id = exact.c_id),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_exact FROM exact)
         |SELECT tot.n_exact, hits.n_hits,
         |  CAST(hits.n_hits * 1000000 // tot.n_exact AS BIGINT) AS recall_ppm
         |FROM tot, hits""".stripMargin
  )
}
