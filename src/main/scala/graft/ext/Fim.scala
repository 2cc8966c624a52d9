package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fill-in-the-middle (FIM) transformation (Bavarian et al. 2022,
  * "Efficient Training of Language Models to Fill in the Middle"): a
  * deterministic share of documents is rewritten into the PSM order
  * `<PRE> prefix <SUF> suffix <MID> middle`, teaching an autoregressive
  * model to infill — the standard pretraining transform for code (and
  * increasingly text) corpora.
  *
  * Everything is DETERMINISTIC MODULAR ARITHMETIC on doc_id (the PII
  * augmentation discipline): the apply decision is `doc_id % 2 = 0`
  * (the paper's 50% FIM rate) and the two cut points are independent
  * affine hashes of doc_id reduced mod (len−1), so both engines derive
  * byte-identical splits with no RNG. Documents shorter than 2 chars
  * pass through. Multipliers stay ≤ 31 so `doc_id · 31` holds to
  * ~3·10¹⁷ ids — no overflow at any realistic corpus size.
  *
  * 100 TB shape: pure stateless projection (substring arithmetic per
  * row, no exchange at all); the audit face adds one source-keyed
  * aggregate with map-side combine. The transform column is
  * `binary`-safe string concat — nothing data-sized moves except the
  * rewritten text itself, which is the operator's output by
  * definition.
  */
object Fim {

  private def cut(mult: Int, add: Int): Column =
    lit(1) + ((col("doc_id") * mult + add) % greatest(length(col("text")) - 1, lit(1)))
      .cast("int")

  /** The cut points materialized once as columns, keeping the substring
    * expressions readable.
    */
  private def withCuts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"), col("text"),
      cut(31, 7).as("c1x"), cut(17, 3).as("c2x"))

  /** Bounded byte-exact sample of the PSM rewrite (doc_id < 40). */
  def transformDocs(docs: DataFrame): DataFrame = {
    val applied = col("doc_id") % 2 === 0 && length(col("text")) >= 2
    withCuts(docs.where(col("doc_id") < 40))
      .select(col("doc_id"),
        applied.as("fim_applied"),
        when(applied, concat(
          lit("<PRE>"), expr("substring(text, 1, least(c1x, c2x))"),
          lit("<SUF>"), expr("substring(text, greatest(c1x, c2x) + 1)"),
          lit("<MID>"), expr("substring(text, least(c1x, c2x) + 1, " +
            "greatest(c1x, c2x) - least(c1x, c2x))")))
          .otherwise(col("text")).as("text_out"))
  }

  /** Corpus-wide split audit: per source, how many docs were FIM'd and
    * the exact character mass of each segment — segment masses must sum
    * back to the original corpus chars (the hash-pinned conservation
    * invariant: a substring-arithmetic bug breaks the sum).
    */
  def splitAudit(docs: DataFrame): DataFrame = {
    val applied = col("doc_id") % 2 === 0 && length(col("text")) >= 2
    withCuts(docs)
      .select(col("source"), applied.as("app"),
        length(col("text")).cast("long").as("len"),
        when(applied, least(col("c1x"), col("c2x"))).otherwise(lit(0))
          .cast("long").as("np"),
        when(applied, greatest(col("c1x"), col("c2x")) - least(col("c1x"), col("c2x")))
          .otherwise(lit(0)).cast("long").as("nm"),
        when(applied, length(col("text")) - greatest(col("c1x"), col("c2x")))
          .otherwise(lit(0)).cast("long").as("ns"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("app").cast("long")).as("n_fim"),
        sum(col("np")).as("prefix_chars"),
        sum(col("nm")).as("middle_chars"),
        sum(col("ns")).as("suffix_chars"),
        sum(when(col("app"), lit(0L)).otherwise(col("len"))).as("passthrough_chars"),
        (sum(col("np")) + sum(col("nm")) + sum(col("ns")) +
          sum(when(col("app"), lit(0L)).otherwise(col("len")))).as("total_chars"))
  }

  val queries: Map[String, Q] = Map(
    "fim_transform_docs" -> ((s, dir) => transformDocs(Tables.documents(s, dir))),
    "fim_split_audit" -> ((s, dir) => splitAudit(Tables.documents(s, dir)))
  )

  private val appliedSql = "doc_id % 2 = 0 AND length(text) >= 2"
  private val c1Sql = "1 + (doc_id * 31 + 7) % greatest(length(text) - 1, 1)"
  private val c2Sql = "1 + (doc_id * 17 + 3) % greatest(length(text) - 1, 1)"

  val oracleSql: Map[String, String] = Map(
    "fim_transform_docs" ->
      s"""WITH c AS (
         |  SELECT doc_id, text,
         |    CAST($c1Sql AS INTEGER) AS c1x, CAST($c2Sql AS INTEGER) AS c2x
         |  FROM documents WHERE doc_id < 40)
         |SELECT doc_id, $appliedSql AS fim_applied,
         |  CASE WHEN $appliedSql THEN
         |    '<PRE>' || substring(text, 1, least(c1x, c2x)) ||
         |    '<SUF>' || substring(text, greatest(c1x, c2x) + 1) ||
         |    '<MID>' || substring(text, least(c1x, c2x) + 1,
         |                greatest(c1x, c2x) - least(c1x, c2x))
         |  ELSE text END AS text_out
         |FROM c""".stripMargin,
    "fim_split_audit" ->
      s"""WITH c AS (
         |  SELECT source, doc_id, text, length(text) AS len,
         |    $appliedSql AS app,
         |    CAST($c1Sql AS BIGINT) AS c1x, CAST($c2Sql AS BIGINT) AS c2x
         |  FROM documents),
         |seg AS (
         |  SELECT source, app, len,
         |    CASE WHEN app THEN least(c1x, c2x) ELSE 0 END AS np,
         |    CASE WHEN app THEN greatest(c1x, c2x) - least(c1x, c2x) ELSE 0 END AS nm,
         |    CASE WHEN app THEN len - greatest(c1x, c2x) ELSE 0 END AS ns
         |  FROM c)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN app THEN 1 ELSE 0 END) AS BIGINT) AS n_fim,
         |  CAST(sum(np) AS BIGINT) AS prefix_chars,
         |  CAST(sum(nm) AS BIGINT) AS middle_chars,
         |  CAST(sum(ns) AS BIGINT) AS suffix_chars,
         |  CAST(sum(CASE WHEN app THEN 0 ELSE len END) AS BIGINT) AS passthrough_chars,
         |  CAST(sum(np) + sum(nm) + sum(ns) +
         |    sum(CASE WHEN app THEN 0 ELSE len END) AS BIGINT) AS total_chars
         |FROM seg GROUP BY source""".stripMargin
  )
}
