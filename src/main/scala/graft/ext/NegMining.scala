package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Negative mining for contrastive / metric-learning training sets —
  * the two standard recipes:
  *
  *  - '''random negatives''': k deterministic pseudo-random partners
  *    per anchor via the engine-portable md5 draw (the [[Sampling]]
  *    discipline — never `rand()`), mapped to actual documents through
  *    a dense position table so nothing assumes id density;
  *  - '''hard negatives''': the nearest embeddings by quantized cosine
  *    that carry a DIFFERENT label — the pairs that actually move a
  *    contrastive loss; exact brute-force over the broadcast query
  *    set, ranked through the TopKPerKey partial/final heaps.
  *
  * 100 TB shape: random negatives cost one position scan (the
  * two-phase distributed rank, no single-partition window) + one
  * pos-keyed equi-join of the k·n candidate table; hard negatives
  * inherit the `ann_bruteforce_topk` plan (query side broadcast,
  * corpus never shuffles, ≤ k rows per (partition, query) reach the
  * heap merge) — swap in the IVF/PQ path for corpus-scale query sets.
  */
object NegMining {

  import graft.functions.QuantizedDot.{quantize, quantizedDot}

  /** (doc_id, neg_rank, neg_doc_id): `k` md5-drawn negatives per
    * anchor; self-collisions filtered (deterministically, both
    * engines), so an anchor can carry k−1 rows.
    */
  def randomNegatives(docs: DataFrame, k: Int): DataFrame = {
    val ids = docs.select(col("doc_id"))
    val pos = graft.ops.Offsets.globalPosition(ids, Seq(col("doc_id")), "pos")
      .select(col("pos").as("cand_pos"), col("doc_id").as("neg_doc_id"))
    val n = ids.agg(count(lit(1)).as("n_docs"))
    ids
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("n_docs"),
        explode(sequence(lit(1), lit(k))).as("neg_rank"))
      .withColumn("cand_pos",
        expr("conv(substring(md5(concat(cast(doc_id AS STRING), ':', " +
          "cast(neg_rank AS STRING))), 1, 15), 16, 10)").cast("long") % col("n_docs"))
      .join(pos, "cand_pos")
      .where(col("neg_doc_id") =!= col("doc_id"))
      .select(col("doc_id"), col("neg_rank").cast("long").as("neg_rank"),
        col("neg_doc_id"))
  }

  /** (q_id, rank, c_id, dot_q): top-`k` different-label neighbors per
    * query vector — exact quantized-dot ranking, ties to smaller c_id.
    */
  def hardNegatives(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val joined = broadcast(queries.select(col("vec_id").as("q_id"),
        col("label").as("q_label"), quantize(col("embedding")).as("q_emb")))
      .join(corpus.select(col("vec_id").as("c_id"),
          col("label").as("c_label"), quantize(col("embedding")).as("c_emb")),
        col("q_id") =!= col("c_id") && col("q_label") =!= col("c_label"))
      .withColumn("dot_q", quantizedDot(col("q_emb"), col("c_emb")))
    graft.plans.TopKPerKey.topKPerKey(joined, Seq("q_id"),
        Seq(("dot_q", true), ("c_id", false)), k)
      .select(col("q_id"), col("rank"), col("c_id"), col("dot_q"))
  }

  val queries: Map[String, Q] = Map(
    "contrastive_negative_sampling" -> ((s, dir) =>
      randomNegatives(Tables.documents(s, dir), k = 4)),
    "hard_negative_mining" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label"), col("embedding"))
      hardNegatives(e.filter(col("vec_id") < 10), e, k = 5)
    })
  )

  val oracleSql: Map[String, String] = Map(
    "contrastive_negative_sampling" ->
      """WITH ids AS (SELECT doc_id FROM documents),
        |pos AS (
        |  SELECT row_number() OVER (ORDER BY doc_id) - 1 AS cand_pos,
        |    doc_id AS neg_doc_id
        |  FROM ids),
        |n AS (SELECT count(*) AS n_docs FROM ids),
        |cand AS (
        |  SELECT i.doc_id, t.k AS neg_rank,
        |    CAST(('0x' || substr(md5(CAST(i.doc_id AS VARCHAR) || ':' ||
        |      CAST(t.k AS VARCHAR)), 1, 15)) AS BIGINT) % n.n_docs AS cand_pos
        |  FROM ids i
        |  CROSS JOIN (SELECT unnest(range(1, 5)) AS k) t
        |  CROSS JOIN n)
        |SELECT c.doc_id, CAST(c.neg_rank AS BIGINT) AS neg_rank, p.neg_doc_id
        |FROM cand c JOIN pos p ON p.cand_pos = c.cand_pos
        |WHERE p.neg_doc_id != c.doc_id""".stripMargin,

    "hard_negative_mining" ->
      """WITH q AS (
        |  SELECT vec_id, label, embedding FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id, label, embedding FROM embeddings),
        |d AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
        |    CAST(list_sum(list_transform(generate_series(1, len(q.embedding)),
        |      i -> CAST(round(CAST(q.embedding[i] AS DOUBLE) * 1000) AS BIGINT)
        |         * CAST(round(CAST(c.embedding[i] AS DOUBLE) * 1000) AS BIGINT)))
        |      AS BIGINT) AS dot_q
        |  FROM q JOIN c ON q.vec_id != c.vec_id AND q.label != c.label)
        |SELECT q_id,
        |  CAST(row_number() OVER (PARTITION BY q_id
        |    ORDER BY dot_q DESC, c_id) AS INTEGER) AS rank,
        |  c_id, dot_q
        |FROM d
        |QUALIFY row_number() OVER (PARTITION BY q_id
        |  ORDER BY dot_q DESC, c_id) <= 5""".stripMargin
  )
}
