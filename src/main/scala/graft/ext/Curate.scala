package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The end-to-end curation pipeline — the composition a training run
  * actually consumes, built entirely from the operators this package
  * already defines (each independently oracle-exact):
  *
  *   training split (md5 bucket) →
  *   near-dup clustering over the TRAINING pair graph
  *     (keep only each cluster's min-doc_id representative) →
  *   benchmark decontamination (drop docs sharing an 8-gram with the
  *     held-out split) →
  *   repetition-quality gate (Gopher-style), in INTEGER cross-multiplied
  *     form so no float threshold can flip between engines.
  *
  * Plan shape: every stage is a keyed join/aggregate against `doc_id`;
  * the only wide payloads in motion are (doc_id, shingle) streams; the
  * eval-gram set broadcasts; the cluster-label table is sized by the
  * deduped fraction. One query, but the same physical work as running
  * the stages separately — Catalyst fuses the doc_id-keyed joins into
  * one exchange chain.
  */
object Curate {

  /** The kept corpus: canonical, uncontaminated, quality-passing
    * training documents with their cluster sizes.
    */
  def curateCorpus(docs: DataFrame, evalSide: Column,
                   minTokens: Int = 20, maxRepPct: Int = 68,
                   maxTopUnigramPct: Int = 20): DataFrame = {
    val train = docs.filter(!evalSide)
    val lab = DedupCluster.clusterAssignments(train,
      Dedup.ngramJaccardPairs(train, 0.12))
    val sizes = lab.groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_size"))
    val contaminated = Quality.decontaminationReport(docs, evalSide)
      .select(col("doc_id"))
    // unigram profile only — the gate never reads the bigram columns,
    // and the full profile would pay the bigram explode/aggregate pass
    val rep = Quality.unigramProfile(train)
    train
      .join(sizes, train("doc_id") === sizes("cluster_id")) // canonical reps only
      .join(contaminated, Seq("doc_id"), "left_anti")
      .join(rep, "doc_id")
      .filter(col("n_tokens") >= minTokens &&
        (col("n_tokens") - col("n_uniq_tokens")) * 100 <= col("n_tokens") * maxRepPct &&
        col("top_unigram_count") * 100 <= col("n_tokens") * maxTopUnigramPct)
      .select(col("doc_id"), col("lang"), col("source"), col("n_tokens"),
        col("cluster_size"))
  }

  /** The data-card funnel: one row per curation stage — corpus → train
    * split → canonical dedup representatives → decontaminated → quality
    * kept — with surviving doc and char mass. This is the audit table a
    * corpus release publishes next to the recipe; every count is the
    * exact cardinality of the SAME staged frames [[curateCorpus]]
    * consumes (the id-frames are persisted once and read by the later
    * stages, the lineage-persist discipline, so the funnel costs one
    * chain evaluation + five id-keyed count joins, not five chain
    * replays).
    */
  def curationFunnelAudit(docs: DataFrame, evalSide: Column,
                          minTokens: Int = 20, maxRepPct: Int = 68,
                          maxTopUnigramPct: Int = 20): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val train = docs.filter(!evalSide)
    val reps = DedupCluster.clusterAssignments(train,
        Dedup.ngramJaccardPairs(train, 0.12))
      .groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_size"))
      .select(col("cluster_id").as("doc_id"))
      .persist(MEMORY_AND_DISK)
    val contaminated = Quality.decontaminationReport(docs, evalSide)
      .select(col("doc_id")).persist(MEMORY_AND_DISK)
    val canonical = train.select(col("doc_id")).join(reps, "doc_id")
      .persist(MEMORY_AND_DISK)
    val decon = canonical.join(contaminated, Seq("doc_id"), "left_anti")
      .persist(MEMORY_AND_DISK)
    val rep = Quality.unigramProfile(train)
    val kept = decon.join(rep, "doc_id")
      .filter(col("n_tokens") >= minTokens &&
        (col("n_tokens") - col("n_uniq_tokens")) * 100 <= col("n_tokens") * maxRepPct &&
        col("top_unigram_count") * 100 <= col("n_tokens") * maxTopUnigramPct)
      .select(col("doc_id"))
    val chars = docs.select(col("doc_id"), col("n_chars"))
    def stage(idx: Int, name: String, ids: DataFrame): DataFrame =
      ids.join(chars, "doc_id")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
        .select(lit(idx).as("stage_idx"), lit(name).as("stage"),
          col("n_docs"), col("n_chars"))
    stage(0, "corpus", docs.select(col("doc_id")))
      .unionAll(stage(1, "train_split", train.select(col("doc_id"))))
      .unionAll(stage(2, "dedup_canonical", canonical))
      .unionAll(stage(3, "decontaminated", decon))
      .unionAll(stage(4, "quality_kept", kept))
  }

  private def bucketPred(c: String, op: String) =
    s"CAST(('0x' || substr(md5(CAST($c AS VARCHAR)), 1, 4)) AS BIGINT) $op 6554"
  private val trainPred = bucketPred("doc_id", ">=")
  private val evalPred = bucketPred("doc_id", "<")

  val queries: Map[String, Q] = Map(
    "pipeline_curate_corpus" -> ((s, dir) =>
      curateCorpus(Tables.documents(s, dir),
        Sampling.hashBucket(col("doc_id")) < 6554)),
    "curation_funnel_audit" -> ((s, dir) =>
      curationFunnelAudit(Tables.documents(s, dir),
        Sampling.hashBucket(col("doc_id")) < 6554))
  )

  val oracleSql: Map[String, String] = Map(
    // The same composition in one statement: the pair/closure CTEs are
    // instantiated TRAIN-ONLY (pred pushed into the shared chain), the
    // 8-gram contamination CTEs run over all docs with their own names,
    // and the quality gate repeats the integer cross-multiplication.
    "pipeline_curate_corpus" ->
      (s"WITH RECURSIVE ${Dedup.ngramCtesFor(trainPred)},\n" +
        s"${DedupCluster.closureCtesFor(bucketPred("d.doc_id", ">="))},\n" +
        s"${Quality.gram8Ctes("toks8")},\n" +
      s"""csizes AS (
        |  SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY cluster_id),
        |bench8 AS (SELECT DISTINCT shingle FROM sh8 WHERE $evalPred),
        |contaminated AS (
        |  SELECT DISTINCT s.doc_id FROM sh8 s JOIN bench8 USING (shingle)
        |  WHERE $trainPred),
        |uni AS (
        |  SELECT doc_id, tok, count(*) AS c
        |  FROM (SELECT doc_id, unnest(t) AS tok FROM toks) GROUP BY doc_id, tok),
        |ustat AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |    count(*) AS n_uniq_tokens, CAST(max(c) AS BIGINT) AS top_unigram_count
        |  FROM uni GROUP BY doc_id)
        |SELECT d.doc_id, d.lang, d.source, u.n_tokens, cs.cluster_size
        |FROM documents d
        |JOIN csizes cs ON d.doc_id = cs.cluster_id
        |JOIN ustat u ON u.doc_id = d.doc_id
        |WHERE d.doc_id NOT IN (SELECT doc_id FROM contaminated)
        |  AND u.n_tokens >= 20
        |  AND (u.n_tokens - u.n_uniq_tokens) * 100 <= u.n_tokens * 68
        |  AND u.top_unigram_count * 100 <= u.n_tokens * 20""".stripMargin),
    "curation_funnel_audit" ->
      (s"WITH RECURSIVE ${Dedup.ngramCtesFor(trainPred)},\n" +
        s"${DedupCluster.closureCtesFor(bucketPred("d.doc_id", ">="))},\n" +
        s"${Quality.gram8Ctes("toks8")},\n" +
      s"""csizes AS (
        |  SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY cluster_id),
        |bench8 AS (SELECT DISTINCT shingle FROM sh8 WHERE $evalPred),
        |contaminated AS (
        |  SELECT DISTINCT s.doc_id FROM sh8 s JOIN bench8 USING (shingle)
        |  WHERE $trainPred),
        |uni AS (
        |  SELECT doc_id, tok, count(*) AS c
        |  FROM (SELECT doc_id, unnest(t) AS tok FROM toks) GROUP BY doc_id, tok),
        |ustat AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |    count(*) AS n_uniq_tokens, CAST(max(c) AS BIGINT) AS top_unigram_count
        |  FROM uni GROUP BY doc_id),
        |canonical AS (
        |  SELECT d.doc_id FROM documents d JOIN csizes ON d.doc_id = csizes.cluster_id),
        |decon AS (
        |  SELECT doc_id FROM canonical
        |  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
        |kept AS (
        |  SELECT dn.doc_id FROM decon dn JOIN ustat u ON u.doc_id = dn.doc_id
        |  WHERE u.n_tokens >= 20
        |    AND (u.n_tokens - u.n_uniq_tokens) * 100 <= u.n_tokens * 68
        |    AND u.top_unigram_count * 100 <= u.n_tokens * 20)
        |SELECT 0 AS stage_idx, 'corpus' AS stage,
        |  CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars
        |FROM documents
        |UNION ALL
        |SELECT 1, 'train_split', CAST(count(*) AS BIGINT), CAST(sum(n_chars) AS BIGINT)
        |FROM documents WHERE $trainPred
        |UNION ALL
        |SELECT 2, 'dedup_canonical', CAST(count(*) AS BIGINT), CAST(sum(d.n_chars) AS BIGINT)
        |FROM documents d JOIN canonical c ON c.doc_id = d.doc_id
        |UNION ALL
        |SELECT 3, 'decontaminated', CAST(count(*) AS BIGINT), CAST(sum(d.n_chars) AS BIGINT)
        |FROM documents d JOIN decon dn ON dn.doc_id = d.doc_id
        |UNION ALL
        |SELECT 4, 'quality_kept', CAST(count(*) AS BIGINT), CAST(sum(d.n_chars) AS BIGINT)
        |FROM documents d JOIN kept k ON k.doc_id = d.doc_id""".stripMargin)
  )
}
