package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
  * SIGMOD'03 — the MOSS algorithm): hash every character k-gram, slide
  * a window of w consecutive hashes, and select the minimum hash per
  * window (rightmost occurrence on ties). The selected (position, hash)
  * set is the document's fingerprint — the guarantee is that any shared
  * substring of length ≥ k + w − 1 between two documents produces at
  * least one shared selected fingerprint, at an expected density of
  * 2/(w+1) — the span-granular near-dup primitive (plagiarism /
  * contamination detection) beside the whole-doc simhash/minhash family.
  *
  * Engine-portable determinism: the gram hash is the first 10 hex
  * digits of md5 (40 bits — the same md5-prefix device as the hash
  * bucket sampler), and the (hash asc, pos desc) selection comparator
  * is ENCODED IN ONE BIGINT — key = h·2²¹ + (2²¹ − pos) — so the
  * whole selection is a plain `min` over a row-frame window in any
  * engine (a struct-valued argmin over a frame is not portable SQL).
  * Documents are bounded at 2²¹−1 chars by contract (chunk first —
  * chunk_documents exists for exactly that); the guard is explicit.
  *
  * 100 TB shape: one explode to (doc_id, pos, key) — linear in corpus
  * chars — then a doc-partitioned ordered window with an O(w) frame,
  * then distinct. No shuffle other than the doc_id repartition the
  * window needs; selected density 2/(w+1) bounds the output.
  */
object Winnow {

  private val PosBits = 21

  /** Selected fingerprints (doc_id, pos, fp) for char-k-gram hashing
    * with window w; pos is the 1-based gram start, fp the 40-bit hash.
    */
  def winnowFingerprints(docs: DataFrame, k: Int, w: Int): DataFrame = {
    require(k >= 1 && w >= 2, s"winnow: need k >= 1, w >= 2, got k=$k w=$w")
    val lim = (1 << PosBits) - 1
    val base = docs.select(col("doc_id"), col("text"),
        length(col("text")).as("len"))
      .where(col("len") >= k)
    // contract guard: fail loudly rather than mis-encode the comparator
    val guarded = base.withColumn("len",
      when(col("len") < lim, col("len"))
        .otherwise(raise_error(concat(lit(s"winnow: document longer than $lim chars — chunk first (doc_id "),
          col("doc_id"), lit(")")))))

    val keys = guarded.select(col("doc_id"), explode(
        transform(sequence(lit(1), col("len") - (k - 1)),
          i => struct(i.as("pos"),
            (conv(substring(md5(col("text").substr(i, lit(k))), 1, 10), 16, 10)
              .cast("long") * (1L << PosBits) + (lit(1L << PosBits) - i))
              .as("key"))))
        .as("g"))
      .select(col("doc_id"), col("g.pos").as("pos"), col("g.key").as("key"))

    val frame = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(0, w - 1)
    keys
      .withColumn("sel", min(col("key")).over(frame))
      .withColumn("wn", count(lit(1)).over(frame))
      .where(col("wn") === w)
      .select(col("doc_id"),
        (lit(1L << PosBits) - col("sel") % (1L << PosBits)).as("pos"),
        expr(s"sel div ${1L << PosBits}").as("fp"))
      .distinct()
  }

  val queries: Map[String, Q] = Map(
    // 8-char grams, window 4 — fingerprint density ~2/5 of positions
    "fingerprint_winnow" -> ((s, dir) =>
      winnowFingerprints(Tables.documents(s, dir), k = 8, w = 4))
  )

  val oracleSql: Map[String, String] = Map(
    "fingerprint_winnow" ->
      """WITH g AS (SELECT doc_id, i AS pos,
        |    CAST(('0x' || substr(md5(substr(text, i, 8)), 1, 10)) AS BIGINT) * 2097152
        |      + (2097152 - i) AS key
        |  FROM documents, UNNEST(generate_series(1, length(text) - 7)) AS u(i)),
        |w AS (SELECT doc_id,
        |    min(key) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS sel,
        |    count(*) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wn
        |  FROM g)
        |SELECT DISTINCT doc_id, 2097152 - (sel % 2097152) AS pos, sel // 2097152 AS fp
        |FROM w WHERE wn = 4""".stripMargin
  )
}
