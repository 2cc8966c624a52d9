package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level duplication diagnostics — the two numbers a curation
  * run reports BEFORE deciding how hard to dedup:
  *
  *  - '''duplication rate''': what fraction of all word 10-grams are
  *    repeats of an already-seen 10-gram (total − distinct, as ppm) —
  *    the corpus-level boilerplate/copy pressure that per-pair dedup
  *    operators then localize;
  *  - '''source overlap''': for every PAIR of ingestion sources, the
  *    Jaccard overlap of their distinct-shingle sets — which feeds
  *    drop the same content (mirror sites, re-crawls), answered
  *    without any doc×doc work: one distinct (shingle, source) table,
  *    a shingle-keyed self-join bounded by |sources|² per shingle, and
  *    per-source distinct counts for the denominator.
  *
  * Both exact-integer end to end (counts and ppm divisions only);
  * shingles ride as md5 strings of the joined words so the oracle
  * reproduces the keys byte-identically.
  *
  * 100 TB shape: everything is shingle-keyed aggregation with map-side
  * combine; the self-join output is bounded by distinct-shingle count
  * × |sources|², never corpus². The duplication rate is two global
  * scalars from one aggregate.
  */
object CorpusStats {

  /** Word n-grams as md5 keys: (doc_id, source, gram). */
  private def grams(docs: DataFrame, n: Int): DataFrame = {
    val toks = filter(split(col("text"), "\\s+"), w => w =!= "")
    docs.select(col("doc_id"), col("source"), toks.as("t"))
      .where(size(col("t")) >= n)
      .select(col("doc_id"), col("source"),
        explode(transform(sequence(lit(0), size(col("t")) - n),
          i => md5(concat_ws(" ", slice(col("t"), i + 1, lit(n)))))).as("gram"))
  }

  /** One row: (n_grams, n_distinct, dup_ppm). */
  def duplicationRate(docs: DataFrame, n: Int = 10): DataFrame =
    grams(docs, n)
      .agg(count(lit(1)).as("n_grams"),
        countDistinct(col("gram")).as("n_distinct"))
      .select(col("n_grams"), col("n_distinct"),
        expr("(n_grams - n_distinct) * 1000000 div n_grams").as("dup_ppm"))

  /** (source_a, source_b, n_common, n_a, n_b, jaccard_ppm) per source
    * pair (a < b lexicographically).
    */
  def sourceOverlap(docs: DataFrame, n: Int = 10): DataFrame = {
    val sh = grams(docs, n).select(col("gram"), col("source")).distinct()
    val perSource = sh.groupBy(col("source")).agg(count(lit(1)).as("n_sh"))
    val pairs = sh.as("x").join(sh.as("y"), "gram")
      .where(col("x.source") < col("y.source"))
      .groupBy(col("x.source").as("source_a"), col("y.source").as("source_b"))
      .agg(count(lit(1)).as("n_common"))
    pairs
      .join(broadcast(perSource.select(col("source").as("source_a"),
        col("n_sh").as("n_a"))), "source_a")
      .join(broadcast(perSource.select(col("source").as("source_b"),
        col("n_sh").as("n_b"))), "source_b")
      .select(col("source_a"), col("source_b"), col("n_common"),
        col("n_a"), col("n_b"),
        expr("n_common * 1000000 div (n_a + n_b - n_common)").as("jaccard_ppm"))
  }

  val queries: Map[String, Q] = Map(
    "corpus_duplication_rate" -> ((s, dir) =>
      duplicationRate(Tables.documents(s, dir), 10)),
    "source_overlap_jaccard" -> ((s, dir) =>
      sourceOverlap(Tables.documents(s, dir), 10))
  )

  private val gramCte =
    """WITH toks AS (
      |  SELECT doc_id, source,
      |    list_filter(string_split_regex(text, '\s+'), x -> x != '') AS t
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, source,
      |    md5(array_to_string(t[i:i+9], ' ')) AS gram
      |  FROM toks, UNNEST(generate_series(1, len(t) - 9)) AS u(i)
      |  WHERE len(t) >= 10)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "corpus_duplication_rate" -> (gramCte +
      """
        |SELECT count(*) AS n_grams,
        |  CAST(count(DISTINCT gram) AS BIGINT) AS n_distinct,
        |  (count(*) - count(DISTINCT gram)) * 1000000 // count(*) AS dup_ppm
        |FROM g""".stripMargin),

    "source_overlap_jaccard" -> (gramCte +
      """,
        |sh AS (SELECT DISTINCT gram, source FROM g),
        |ps AS (SELECT source, count(*) AS n_sh FROM sh GROUP BY source),
        |p AS (
        |  SELECT x.source AS source_a, y.source AS source_b,
        |    count(*) AS n_common
        |  FROM sh x JOIN sh y ON x.gram = y.gram AND x.source < y.source
        |  GROUP BY 1, 2)
        |SELECT source_a, source_b, n_common,
        |  a.n_sh AS n_a, b.n_sh AS n_b,
        |  CAST(n_common * 1000000 // (a.n_sh + b.n_sh - n_common) AS BIGINT)
        |    AS jaccard_ppm
        |FROM p
        |JOIN ps a ON a.source = p.source_a
        |JOIN ps b ON b.source = p.source_b""".stripMargin)
  )
}
