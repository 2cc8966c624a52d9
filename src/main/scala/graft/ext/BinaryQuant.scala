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

  /** Byte-band table over the bit codes: 8 bands of 8 bits per vector
    * (band_idx 0-3 slice c_lo, 4-7 slice c_hi). The banding discipline
    * of [[Dedup]] applied to sign bits: two vectors within Hamming
    * distance h agree on at least ⌈8·(1 − h/64)⌉ expected bands, so any
    * shared band is the candidate trigger.
    */
  def withBandTable(codes: DataFrame): DataFrame = {
    val bandCols = (0 until 8).map { i =>
      val src = if (i < 4) "c_lo" else "c_hi"
      expr(s"shiftright($src, ${(i % 4) * 8}) & 255L")
    }
    codes.select(col("vec_id"),
      posexplode(array(bandCols: _*)).as(Seq("band_idx", "band_val")))
  }

  /** BQ-banded near-dup pair mining — the [[Dedup]] banded-LSH shape
    * over bit codes: candidates are pairs sharing ANY (band_idx,
    * band_val) bucket; candidates are verified by exact Hamming ≤ `tau`.
    * The candidate path is NARROW (bare id pairs through the distinct
    * exchange; codes re-fetched by two equi-joins — the
    * Dedup.scala:329-388 discipline). Collision volume is bounded by the
    * band alphabet: at 8-bit bands buckets saturate quadratically as the
    * corpus outgrows 256·#bands cells, so the production knob is band
    * WIDTH — widen to ⌈log2 n⌉+c bits as the corpus grows (the
    * occupancy-adaptive rule the sign-LSH face uses); 8-bit bands here
    * exercise the semantics at test scale where 16-bit bands are too
    * selective to yield any candidate (measured: 10 candidates / 0 pairs
    * at sf0.01).
    */
  def bqBandedPairs(e: DataFrame, tau: Int): DataFrame = {
    val codes = withCodes(e).select(col("vec_id"), col("c_lo"), col("c_hi"))
    val bands = withBandTable(codes)
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"))
      .distinct()
    cand
      .join(codes.select(col("vec_id").as("a_id"),
        col("c_lo").as("a_lo"), col("c_hi").as("a_hi")), "a_id")
      .join(codes.select(col("vec_id").as("b_id"),
        col("c_lo").as("b_lo"), col("c_hi").as("b_hi")), "b_id")
      .withColumn("hamming", hamming(col("a_lo"), col("a_hi"), col("b_lo"), col("b_hi")))
      .where(col("hamming") <= tau)
      .select(col("a_id"), col("b_id"), col("hamming"))
  }

  /** The OCCUPANCY-ADAPTIVE variant of [[bqBandedPairs]] — the
    * production form of the band-width knob the fixed-width face
    * documents: band width w = min(16, ⌊log2 n⌋ + 2) bits (derived from
    * the corpus count, a 1-row broadcast scalar), four bands sampling
    * the low w bits of each 16-bit lane. Collision volume per band is
    * ~n²/2^w, so growing w with log2 n pins expected bucket occupancy
    * and keeps the candidate set near-linear (measured: 502 → 1,969
    * candidates for 10× data, vs 3,878 → 61,645 at fixed 8-bit bands)
    * — at the price of recall decaying as bands widen (the honest LSH
    * frontier; the fixed-width face + its recall companion score the
    * other end). Emits the one-row audit (w_bits, n_candidates,
    * n_pairs) rather than the pairs so the face is scale-stable.
    */
  def bqBandedAdaptive(e: DataFrame, tau: Int): DataFrame = {
    val codes = withCodes(e).select(col("vec_id"), col("c_lo"), col("c_hi"))
    val nn = codes.agg(count(lit(1)).as("n"))
      .select(least(lit(16L), (length(bin(col("n"))) - 1).cast("long") + 2L).as("w"))
    val bandCols = (0 until 4).map { i =>
      val src = if (i < 2) "c_lo" else "c_hi"
      expr(s"shiftright($src, ${(i % 2) * 16}) & (shiftleft(1L, w) - 1L)")
    }
    val bands = codes.crossJoin(broadcast(nn))
      .select(col("vec_id"), col("w"),
        posexplode(array(bandCols: _*)).as(Seq("band_idx", "band_val")))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nCand = cand.agg(count(lit(1)).as("n_candidates"))
    val nPairs = cand
      .join(codes.select(col("vec_id").as("a_id"),
        col("c_lo").as("a_lo"), col("c_hi").as("a_hi")), "a_id")
      .join(codes.select(col("vec_id").as("b_id"),
        col("c_lo").as("b_lo"), col("c_hi").as("b_hi")), "b_id")
      .where(hamming(col("a_lo"), col("a_hi"), col("b_lo"), col("b_hi")) <= tau)
      .agg(count(lit(1)).as("n_pairs"))
    // three scalar frames — 1-row cross joins
    nn.select(col("w").as("w_bits")).crossJoin(nCand).crossJoin(nPairs)
  }

  /** Recall of the banded miner against the full-pair Hamming truth —
    * a gate-scale exact companion (the truth side is Θ(n²) BY DESIGN,
    * the dedup_simhash_recall convention): banded pairs are a subset of
    * the truth (same τ filter), so recall_ppm alone scores the banding.
    */
  def bqBandedRecall(e: DataFrame, tau: Int): DataFrame = {
    val codes = withCodes(e).select(col("vec_id"), col("c_lo"), col("c_hi"))
    val truth = codes.as("a").join(codes.as("b"), col("a.vec_id") < col("b.vec_id"))
      .where(hamming(col("a.c_lo"), col("a.c_hi"), col("b.c_lo"), col("b.c_hi")) <= tau)
      .agg(count(lit(1)).as("n_truth"))
    val found = bqBandedPairs(e, tau).agg(count(lit(1)).as("n_found"))
    // 1-row × 1-row cross join — two scalars
    truth.crossJoin(found)
      .select(col("n_truth"), col("n_found"),
        expr("n_found * 1000000L div greatest(n_truth, 1L)").as("recall_ppm"))
  }

  val queries: Map[String, Q] = Map(
    // full-corpus Hamming ranking over the packed sign bits — exact
    // oracle (deterministic and SQL-expressible end to end)
    "ann_bq_topk" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      bqTopK(e.filter(col("vec_id") < 10), e, k = 5)
    }),
    // banded near-dup pair mining over the bit codes (exact oracle:
    // banding + Hamming verify are both deterministic integer chains)
    "dedup_bq_banded_pairs" -> ((s, dir) =>
      bqBandedPairs(Tables.embeddings(s, dir).select(col("vec_id"), col("embedding")),
        tau = 18)),
    // recall of the banded miner vs the full-pair truth at gate scale
    "dedup_bq_banded_recall" -> ((s, dir) =>
      bqBandedRecall(Tables.embeddings(s, dir).select(col("vec_id"), col("embedding")),
        tau = 18)),
    // the occupancy-adaptive width audit (the production knob, measured)
    "dedup_bq_banded_adaptive" -> ((s, dir) =>
      bqBandedAdaptive(Tables.embeddings(s, dir).select(col("vec_id"), col("embedding")),
        tau = 18)),
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

  private val bandSql =
    """bands AS (
      |  SELECT vec_id, b.i AS band_idx,
      |    CASE WHEN b.i < 4 THEN (c_lo >> (CAST(b.i AS INTEGER) * 8)) & 255
      |         ELSE (c_hi >> ((CAST(b.i AS INTEGER) - 4) * 8)) & 255 END AS band_val
      |  FROM code, (SELECT unnest(generate_series(0, 7)) AS i) b),
      |cand AS (
      |  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
      |  FROM bands a JOIN bands b
      |    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
      |   AND a.vec_id < b.vec_id),
      |banded AS (
      |  SELECT c.a_id, c.b_id,
      |    CAST(bit_count(xor(ca.c_lo, cb.c_lo))
      |       + bit_count(xor(ca.c_hi, cb.c_hi)) AS INTEGER) AS hamming
      |  FROM cand c
      |  JOIN code ca ON ca.vec_id = c.a_id
      |  JOIN code cb ON cb.vec_id = c.b_id
      |  WHERE bit_count(xor(ca.c_lo, cb.c_lo))
      |      + bit_count(xor(ca.c_hi, cb.c_hi)) <= 18)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "dedup_bq_banded_pairs" ->
      s"""WITH code AS ($codeSql),
         |$bandSql
         |SELECT a_id, b_id, hamming FROM banded""".stripMargin,
    "dedup_bq_banded_adaptive" ->
      s"""WITH code AS ($codeSql),
         |nn AS (
         |  SELECT least(16, CAST(length(bin(count(*))) - 1 AS BIGINT) + 2) AS w
         |  FROM code),
         |bands AS (
         |  SELECT vec_id, b.i AS band_idx,
         |    CASE WHEN b.i < 2
         |      THEN (c_lo >> (CAST(b.i AS INTEGER) * 16))
         |           & ((CAST(1 AS BIGINT) << CAST(w AS INTEGER)) - 1)
         |      ELSE (c_hi >> ((CAST(b.i AS INTEGER) - 2) * 16))
         |           & ((CAST(1 AS BIGINT) << CAST(w AS INTEGER)) - 1) END AS band_val
         |  FROM code, nn, (SELECT unnest(generate_series(0, 3)) AS i) b),
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
         |  FROM bands a JOIN bands b
         |    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
         |   AND a.vec_id < b.vec_id),
         |nc AS (SELECT CAST(count(*) AS BIGINT) AS n_candidates FROM cand),
         |np AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_pairs
         |  FROM cand c
         |  JOIN code ca ON ca.vec_id = c.a_id
         |  JOIN code cb ON cb.vec_id = c.b_id
         |  WHERE bit_count(xor(ca.c_lo, cb.c_lo))
         |      + bit_count(xor(ca.c_hi, cb.c_hi)) <= 18)
         |SELECT CAST(nn.w AS BIGINT) AS w_bits, nc.n_candidates, np.n_pairs
         |FROM nn, nc, np""".stripMargin,
    "dedup_bq_banded_recall" ->
      s"""WITH code AS ($codeSql),
         |$bandSql,
         |truth AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_truth
         |  FROM code a JOIN code b ON a.vec_id < b.vec_id
         |  WHERE bit_count(xor(a.c_lo, b.c_lo))
         |      + bit_count(xor(a.c_hi, b.c_hi)) <= 18),
         |found AS (SELECT CAST(count(*) AS BIGINT) AS n_found FROM banded)
         |SELECT t.n_truth, f.n_found,
         |  CAST(f.n_found * 1000000 // greatest(t.n_truth, 1) AS BIGINT) AS recall_ppm
         |FROM truth t, found f""".stripMargin,
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
