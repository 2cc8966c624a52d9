package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII accounting and redaction audit — the compliance face of corpus
  * curation. [[TextAnalysis.redactPii]] already scrubs inside the
  * cleaning composition; what a pipeline operator additionally owes its
  * operators is the AUDIT: how much PII of which class sits in which
  * source (the go/no-go input for source-level quarantine), and a
  * verifiable guarantee that redaction removed every match.
  *
  * The synthetic corpus carries no organic PII, so the audited column is
  * a DETERMINISTIC augmentation of `documents.text` (modular doc_id
  * rules append an email / phone / IPv4 token) computed identically by
  * Spark and the DuckDB oracle — the same in-query fixture discipline
  * the multimodal codecs use for blobs. Patterns are restricted to the
  * Java-regex/RE2 common subset (no backrefs, no lookaround, explicit
  * classes), the [[TextAnalysis]] convention, so both engines match
  * byte-identically.
  *
  * 100 TB shape: every query is one stateless projection over the
  * corpus followed by a keyed aggregate on `source` (cardinality =
  * #sources, tiny) — map-side combine collapses the shuffle to
  * partitions × sources rows; nothing data-sized moves. The redaction
  * face is pure projection. No UDFs: `regexp_extract_all` /
  * `regexp_replace` / length arithmetic are codegen'd expressions.
  */
object Pii {

  /** PII classes as (name, pattern, placeholder). Patterns are anchored
    * to the augmentation shapes (and realistic formats) while staying in
    * the RE2 ∩ Java subset; email reuses the [[TextAnalysis]] pattern.
    */
  val emailPat = TextAnalysis.emailPattern
  val phonePat = "555-[0-9]{4}"
  val ipPat    = "10\\.0\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** Deterministic PII augmentation of the corpus: modular doc_id rules
    * append one token of each class (doc_id ≡ 0 mod 3 → email, mod 5 →
    * phone, mod 7 → IPv4), so ~55% of documents carry at least one PII
    * token and doc_id 0 carries all three. Pure projection.
    */
  def augmented(docs: DataFrame): DataFrame = docs.select(
    col("doc_id"), col("source"),
    concat(
      col("text"),
      when(col("doc_id") % 3 === 0,
        concat(lit(" reach user"), col("doc_id"), lit("@mail.example.com")))
        .otherwise(lit("")),
      when(col("doc_id") % 5 === 0,
        concat(lit(" call 555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
        .otherwise(lit("")),
      when(col("doc_id") % 7 === 0,
        concat(lit(" host 10.0."), (col("doc_id") % 256).cast("string"),
          lit("."), ((col("doc_id") * 7) % 256).cast("string")))
        .otherwise(lit(""))
    ).as("text"))

  private def nMatches(pat: String): Column =
    size(regexp_extract_all(col("text"), lit(pat), lit(0))).cast("long")

  /** Matched-character mass of `pat` via replace-and-measure length
    * arithmetic — integer exact, no extraction materialized.
    */
  private def matchChars(pat: String): Column =
    (length(col("text")) - length(regexp_replace(col("text"), pat, ""))).cast("long")

  /** Per-source PII prevalence: document and match counts per class,
    * docs with any PII, and total matched characters — the source-level
    * quarantine signal (a source whose pii_chars share spikes gets cut
    * before training, the Gopher-rules discipline applied to risk).
    */
  def detectCounts(docs: DataFrame): DataFrame =
    augmented(docs)
      .select(col("source"),
        nMatches(emailPat).as("ne"), nMatches(phonePat).as("np"), nMatches(ipPat).as("ni"),
        (matchChars(emailPat) + matchChars(phonePat) + matchChars(ipPat)).as("mc"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum((col("ne") + col("np") + col("ni") > 0).cast("long")).as("docs_with_pii"),
        sum(col("ne")).as("n_emails"),
        sum(col("np")).as("n_phones"),
        sum(col("ni")).as("n_ips"),
        sum(col("mc")).as("pii_chars"))

  /** Typed redaction: email → phone → IPv4, each class replaced by its
    * placeholder token (order fixed; the tight class patterns are
    * mutually non-overlapping so the composition is order-insensitive,
    * but the fixed order keeps the audit reproducible).
    */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailPat, "<EMAIL>"),
        phonePat, "<PHONE>"),
      ipPat, "<IP>")

  /** Redaction audit: per-source proof that redaction converged — zero
    * residual matches of any class after one redaction pass, plus the
    * byte delta (chars removed minus placeholder chars inserted). The
    * residual columns are the hash-checked invariant: a pattern/replace
    * mismatch (or a placeholder that re-triggers a pattern) flips a
    * residual from 0 and fails the driver compare.
    */
  def redactAudit(docs: DataFrame): DataFrame =
    augmented(docs)
      .select(col("source"), col("text"), redact(col("text")).as("red"))
      .select(col("source"),
        (length(col("text")) - length(col("red"))).cast("long").as("delta"),
        size(regexp_extract_all(col("red"), lit(emailPat), lit(0))).cast("long").as("re"),
        size(regexp_extract_all(col("red"), lit(phonePat), lit(0))).cast("long").as("rp"),
        size(regexp_extract_all(col("red"), lit(ipPat), lit(0))).cast("long").as("ri"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("delta")).as("chars_delta"),
        sum(col("re")).as("residual_emails"),
        sum(col("rp")).as("residual_phones"),
        sum(col("ri")).as("residual_ips"))

  /** Source-level quarantine: sources whose total PII character mass
    * sits strictly above the cross-source mean are blocklisted, and the
    * corpus is filtered by a BROADCAST ANTI-JOIN on source (the
    * blocklist is #sources-sized — KB against any corpus). Emits ONE
    * row per source — the explicit `quarantined` verdict plus the
    * surviving doc/char counts (zeroed for blocklisted sources) — so
    * the hash compare pins both the blocklist decision and the
    * filtered corpus mass directly (round-13 ADVICE: blocklisted
    * sources used to be visible only by absence). The mean threshold
    * is exact integer arithmetic (sum·1 vs mean cross-multiplied:
    * pii_chars·n_sources > total_pii) — no division, engine-identical.
    */
  def sourceQuarantine(docs: DataFrame): DataFrame = {
    val per = detectCounts(docs)
      .select(col("source"), col("pii_chars"))
    val tot = per.agg(sum(col("pii_chars")).as("total_pii"),
      count(lit(1)).as("n_sources"))
    val verdict = per.crossJoin(broadcast(tot))
      .select(col("source"),
        (col("pii_chars") * col("n_sources") > col("total_pii")).as("quarantined"))
    val block = verdict.where(col("quarantined")).select(col("source"))
    val kept = docs.join(broadcast(block), Seq("source"), "left_anti")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("kept_docs"),
        sum(length(col("text"))).as("kept_chars"))
    verdict.join(kept, Seq("source"), "left")
      .select(col("source"), col("quarantined"),
        coalesce(col("kept_docs"), lit(0L)).as("n_docs_kept"),
        coalesce(col("kept_chars"), lit(0L)).as("chars_kept"))
  }

  val queries: Map[String, Q] = Map(
    "pii_detect_counts" -> ((s, dir) => detectCounts(Tables.documents(s, dir))),
    "pii_source_quarantine" -> ((s, dir) =>
      sourceQuarantine(Tables.documents(s, dir))),
    "pii_redact_audit" -> ((s, dir) => redactAudit(Tables.documents(s, dir))),
    // bounded sample of the redacted text itself — direct string
    // equality against the oracle's regexp_replace chain, the strongest
    // possible check on the byte-level redaction semantics
    "pii_redact_docs" -> ((s, dir) =>
      augmented(Tables.documents(s, dir))
        .where(col("doc_id") < 40)
        .select(col("doc_id"), redact(col("text")).as("redacted")))
  )

  // the oracle recomputes the augmentation inline; DuckDB regexp_* are
  // RE2 — patterns stay in the common subset so matches are identical
  // NOTE: continuation lines must not START with `||` — the enclosing
  // oracle strings interpolate this fragment before THEIR stripMargin,
  // which would eat the first pipe of a leading `||`.
  private val augSql =
    """SELECT doc_id, source,
      |  text ||
      |  CASE WHEN doc_id % 3 = 0
      |       THEN ' reach user' || doc_id || '@mail.example.com' ELSE '' END ||
      |  CASE WHEN doc_id % 5 = 0
      |       THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END ||
      |  CASE WHEN doc_id % 7 = 0
      |       THEN ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR) ||
      |            '.' || CAST((doc_id * 7) % 256 AS VARCHAR) ELSE '' END
      |  AS text
      |FROM documents""".stripMargin

  private val emailSql = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val phoneSql = "555-[0-9]{4}"
  private val ipSql    = "10\\.0\\.[0-9]{1,3}\\.[0-9]{1,3}"

  val oracleSql: Map[String, String] = Map(
    "pii_detect_counts" ->
      s"""WITH aug AS ($augSql),
         |per AS (
         |  SELECT source,
         |    CAST(len(regexp_extract_all(text, '$emailSql')) AS BIGINT) AS ne,
         |    CAST(len(regexp_extract_all(text, '$phoneSql')) AS BIGINT) AS np,
         |    CAST(len(regexp_extract_all(text, '$ipSql')) AS BIGINT) AS ni,
         |    CAST(length(text) - length(regexp_replace(text, '$emailSql', '', 'g'))
         |       + length(text) - length(regexp_replace(text, '$phoneSql', '', 'g'))
         |       + length(text) - length(regexp_replace(text, '$ipSql', '', 'g')) AS BIGINT) AS mc
         |  FROM aug)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN ne + np + ni > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
         |  CAST(sum(ne) AS BIGINT) AS n_emails,
         |  CAST(sum(np) AS BIGINT) AS n_phones,
         |  CAST(sum(ni) AS BIGINT) AS n_ips,
         |  CAST(sum(mc) AS BIGINT) AS pii_chars
         |FROM per GROUP BY source""".stripMargin,
    "pii_source_quarantine" ->
      s"""WITH aug AS ($augSql),
         |per AS (
         |  SELECT source,
         |    CAST(sum(length(text) - length(regexp_replace(text, '$emailSql', '', 'g'))
         |       + length(text) - length(regexp_replace(text, '$phoneSql', '', 'g'))
         |       + length(text) - length(regexp_replace(text, '$ipSql', '', 'g'))) AS BIGINT) AS pii_chars
         |  FROM aug GROUP BY source),
         |tot AS (
         |  SELECT CAST(sum(pii_chars) AS BIGINT) AS total_pii,
         |    CAST(count(*) AS BIGINT) AS n_sources FROM per),
         |verdict AS (
         |  SELECT per.source,
         |    per.pii_chars * tot.n_sources > tot.total_pii AS quarantined
         |  FROM per, tot),
         |kept AS (
         |  SELECT d.source, count(*) AS kd,
         |    CAST(sum(length(d.text)) AS BIGINT) AS kc
         |  FROM documents d
         |  ANTI JOIN (SELECT source FROM verdict WHERE quarantined) b
         |    ON b.source = d.source
         |  GROUP BY d.source)
         |SELECT v.source, v.quarantined,
         |  CAST(coalesce(k.kd, 0) AS BIGINT) AS n_docs_kept,
         |  CAST(coalesce(k.kc, 0) AS BIGINT) AS chars_kept
         |FROM verdict v LEFT JOIN kept k ON k.source = v.source""".stripMargin,
    "pii_redact_audit" ->
      s"""WITH aug AS ($augSql),
         |red AS (
         |  SELECT source, text,
         |    regexp_replace(regexp_replace(regexp_replace(text,
         |      '$emailSql', '<EMAIL>', 'g'),
         |      '$phoneSql', '<PHONE>', 'g'),
         |      '$ipSql', '<IP>', 'g') AS red
         |  FROM aug)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(length(text) - length(red)) AS BIGINT) AS chars_delta,
         |  CAST(sum(len(regexp_extract_all(red, '$emailSql'))) AS BIGINT) AS residual_emails,
         |  CAST(sum(len(regexp_extract_all(red, '$phoneSql'))) AS BIGINT) AS residual_phones,
         |  CAST(sum(len(regexp_extract_all(red, '$ipSql'))) AS BIGINT) AS residual_ips
         |FROM red GROUP BY source""".stripMargin,
    "pii_redact_docs" ->
      s"""WITH aug AS ($augSql)
         |SELECT doc_id,
         |  regexp_replace(regexp_replace(regexp_replace(text,
         |    '$emailSql', '<EMAIL>', 'g'),
         |    '$phoneSql', '<PHONE>', 'g'),
         |    '$ipSql', '<IP>', 'g') AS redacted
         |FROM aug WHERE doc_id < 40""".stripMargin
  )
}
