package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance similarity self-join — all pairs of strings within
  * Levenshtein distance d — via q-gram prefix filtering (the Ed-Join
  * scheme of Xiao, Wang & Lin, VLDB'08): a pair within distance d
  * (a) differs in length by at most d, and (b) shares at least one
  * q-gram among the first q·d+1 q-gram occurrences of EACH side under
  * a global rarest-first ordering. (b) is the multiset prefix-filter
  * bound: d edits destroy at most q·d gram occurrences, so the overlap
  * is ≥ max(|G(s)|,|G(t)|) − q·d, and a shared element must appear in
  * both (q·d+1)-prefixes; joining on the gram VALUE is a superset of
  * the occurrence-matched condition, hence lossless. (Ed-Join's
  * per-occurrence POSITION predicate is deliberately NOT used as a join
  * filter: with repeated grams, the prefix theorem's witness pair need
  * not be a position-aligned occurrence pair, so |Δpos| ≤ d over single
  * occurrences can reject true pairs — EditDistJoinSpec pins the
  * equivalence against brute force instead.)
  *
  * 100 TB shape: signatures are ≤ q·d+1 rows per string, so the
  * candidate join shuffles O(q·d·n) rows keyed by gram; the rarest-first
  * prefix keeps high-df grams out of the signature, bounding per-key
  * fan-out on natural corpora. Verification is the threshold-banded
  * Levenshtein (O(d·len) per pair, codegen'd `levenshtein(l, r, d)`),
  * applied only to distinct candidate pairs. The brute-force quadratic
  * never appears at any stage.
  */
object EditDistJoin {

  /** All unordered pairs of `strs(id, s)` with levenshtein ≤ d.
    * Emits (id_a, id_b, dist), id_a < id_b, exact distance.
    */
  def editDistanceSelfJoin(strs: DataFrame, d: Int, q: Int): DataFrame = {
    val prefixLen = q * d + 1
    val base = strs.select(col("id"), col("s"), length(col("s")).as("len"))

    // q-gram occurrences with positions (strings shorter than q yield
    // none and are handled by the short-string block below)
    val grams = base.where(col("len") >= q)
      .select(col("id"), col("len"), explode(
        transform(sequence(lit(1), col("len") - (q - 1)),
          i => struct(i.as("pos"), col("s").substr(i, lit(q)).as("gram"))))
        .as("g"))
      .select(col("id"), col("len"), col("g.pos").as("pos"), col("g.gram").as("gram"))

    val df = grams.select(col("id"), col("gram")).distinct()
      .groupBy(col("gram")).agg(count(lit(1)).as("df"))

    // rarest-first prefix: first q·d+1 occurrences by (df, gram, pos).
    // Persisted: the self-join below references it twice, and each
    // reference would otherwise re-run the grams⋈df join + the ranking
    // window. ≤ prefixLen rows per string; harnesses clearCache() per
    // query (the Verify/Bench contract).
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("df"), col("gram"), col("pos"))
    val sig = grams.join(df, "gram")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= prefixLen)
      .select(col("id"), col("len"), col("gram"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val candLong = sig.as("a").join(sig.as("b"),
        col("a.gram") === col("b.gram") && col("a.id") < col("b.id") &&
          abs(col("a.len") - col("b.len")) <= d)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()

    // strings with < q chars have no grams: pair them against every
    // string within d of their length (len < q + d on the other side).
    // The length band is made an EQUI-join by exploding the candidate
    // lengths on one side — no nested-loop plan, and the block is
    // bounded by the (degenerate at title granularity) sub-q-char
    // population.
    val short = base.where(col("len") < q)
    val candShort = short.as("a").join(
        base.where(col("len") < q + d)
          .select(col("id").as("b_id"),
            explode(sequence(greatest(col("len") - d, lit(0)), col("len") + d))
              .as("len")),
        Seq("len"))
      .where(col("a.id") =!= col("b_id"))
      .select(least(col("a.id"), col("b_id")).as("id_a"),
        greatest(col("a.id"), col("b_id")).as("id_b"))
      .distinct()

    candLong.unionAll(candShort).distinct()
      .join(base.select(col("id").as("id_a"), col("s").as("sa")), "id_a")
      .join(base.select(col("id").as("id_b"), col("s").as("sb")), "id_b")
      .select(col("id_a"), col("id_b"),
        levenshtein(col("sa"), col("sb"), d).as("dist"))
      .where(col("dist") =!= -1)
  }

  /** Document "titles": the first 8 whitespace tokens re-joined — the
    * fuzzy-dedup-by-title key a curation pipeline blocks on.
    */
  private[ext] def titles(docs: DataFrame): Column = {
    val t = TextAnalysis.tokens(col("text"))
    array_join(slice(t, 1, 8), " ")
  }

  val queries: Map[String, Q] = Map(
    // near-identical title pairs (levenshtein <= 3) across the corpus
    "fuzzy_title_pairs" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      editDistanceSelfJoin(
        docs.select(col("doc_id").as("id"), titles(docs).as("s")),
        d = 3, q = 7)
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"), col("dist"))
    })
  )

  // brute force with the (lossless) length band — the oracle runs at
  // gate scale only, where n² is trivial for DuckDB
  val oracleSql: Map[String, String] = Map(
    "fuzzy_title_pairs" ->
      """WITH t AS (SELECT doc_id,
        |    array_to_string(list_filter(string_split_regex(text, '\s+'), x -> x != '')[1:8], ' ') AS title
        |  FROM documents)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(levenshtein(a.title, b.title) AS INTEGER) AS dist
        |FROM t a JOIN t b
        |  ON a.doc_id < b.doc_id AND abs(length(a.title) - length(b.title)) <= 3
        |WHERE levenshtein(a.title, b.title) <= 3""".stripMargin
  )
}
