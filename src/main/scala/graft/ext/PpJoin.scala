package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PPJoin — the POSITIONAL upgrade of the prefix-filter threshold
  * Jaccard join (Xiao, Wang, Lin, Yu: "Efficient Similarity Joins for
  * Near Duplicate Detection", WWW'08 / TODS'11 §4): prefix filtering
  * ([[Dedup.prefixJaccardPairs]]) admits any pair sharing ONE prefix
  * token; PPJoin additionally bounds the achievable overlap from the
  * POSITIONS of the shared prefix tokens and drops pairs whose bound
  * can't reach the threshold — same exact result set, strictly fewer
  * verified candidates.
  *
  * The bound: tokens of each doc are numbered 1..n in the global
  * (df, token) order, so for a token shared at positions (i, j), every
  * other common token sorts strictly before it in BOTH docs or strictly
  * after it in BOTH docs. Hence
  *
  *   overlap ≤ min(i, j) + min(n_a − i, n_b − j)   (before + this + after)
  *
  * and the tightest such bound over the pair's shared prefix tokens
  * must still satisfy the threshold's overlap requirement
  * o ≥ ⌈τ/(1+τ)·(n_a+n_b)⌉, applied integer-exactly as
  * (100+p)·ubound ≥ p·(n_a+n_b).
  *
  * 100 TB shape: identical to the prefix-filter plan — the candidate
  * join still touches only prefix tokens (the rarest ~(1−τ) slice of
  * each doc) — plus ONE map-side-combining min per candidate pair
  * BEFORE the verification fetch; the pruned pairs never pull their
  * shingle arrays across the verify joins, which is where the win is:
  * the positional aggregate rides the candidate shuffle already being
  * paid, and verification I/O drops by the prune rate.
  */
object PpJoin {

  /** Exact Jaccard-threshold pairs over 3-gram shingle sets, PPJoin
    * candidate generation. Same output contract as
    * [[Dedup.prefixJaccardPairs]].
    */
  def ppjoinPairs(docs: DataFrame, thresholdPct: Int): DataFrame =
    ppjoinPairsStamped(docs, thresholdPct)._1

  /** [[ppjoinPairs]] plus the release thunk for the persisted index. */
  def ppjoinPairsStamped(docs: DataFrame,
                         thresholdPct: Int): (DataFrame, () => Unit) = {
    require(thresholdPct > 0 && thresholdPct <= 100,
      s"thresholdPct must be in (0, 100], got $thresholdPct")
    val p = thresholdPct
    val toks = docs
      .select(col("doc_id"), explode(Dedup.shingles(col("text"))).as("tok"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfreq = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("df"), col("tok"))
    val allByDoc = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
    val positioned = toks.join(dfreq, "tok")
      .withColumn("pos", row_number().over(byDoc).cast("long"))
      .withColumn("n", count(lit(1)).over(allByDoc))
    val prefix = positioned
      .where(col("pos") <= col("n") - expr(s"(($p * n) + 99) div 100") + 1)
      .select(col("doc_id"), col("tok"), col("pos"), col("n"),
        xxhash64(col("tok")).as("h"))
    // per shared prefix token: the positional overlap upper bound;
    // per pair: its MINIMUM — one combine-enabled aggregate on the
    // candidate key, then the integer threshold test
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.h") === col("b.h") && col("a.tok") === col("b.tok") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (least(col("a.pos"), col("b.pos")) +
          least(col("a.n") - col("a.pos"), col("b.n") - col("b.pos"))).as("ub"),
        col("a.n").as("n_a"), col("b.n").as("n_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(min(col("ub")).as("ubound"), first(col("n_a")).as("n_a"),
        first(col("n_b")).as("n_b"))
      .where(lit(100L + p) * col("ubound") >= lit(p.toLong) * (col("n_a") + col("n_b")))
      .select(col("doc_a"), col("doc_b"))
    val arrays = toks.groupBy(col("doc_id"))
      .agg(collect_list(col("tok")).as("toks"), count(lit(1)).as("n"))
    val verified = cand
      .join(arrays.select(col("doc_id").as("doc_a"), col("toks").as("ta"),
        col("n").as("n_a")), "doc_a")
      .join(arrays.select(col("doc_id").as("doc_b"), col("toks").as("tb"),
        col("n").as("n_b")), "doc_b")
      .withColumn("n_common", size(array_intersect(col("ta"), col("tb"))).cast("long"))
      .where(lit(100L) * col("n_common") >=
        lit(p.toLong) * (col("n_a") + col("n_b") - col("n_common")))
      .select(col("doc_a"), col("doc_b"), col("n_common"), col("n_a"), col("n_b"),
        round(col("n_common") / (col("n_a") + col("n_b") - col("n_common")), 6).as("jaccard"))
    (verified, () => { toks.unpersist(); () })
  }

  val queries: Map[String, Q] = Map(
    // exact threshold join at tau = 0.85 with positional pruning
    "dedup_ppjoin" -> ((s, dir) =>
      ppjoinPairs(Tables.documents(s, dir), thresholdPct = 85))
  )

  val oracleSql: Map[String, String] = Map(
    // brute force over ALL shingle-sharing pairs — PPJoin is exact, so
    // its output must equal the unfiltered join at the same threshold
    "dedup_ppjoin" ->
      """WITH t0 AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), x -> x != '') AS t
        |  FROM documents),
        |toks AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(t) >= 3 THEN list_transform(generate_series(1, len(t) - 2),
        |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) ELSE [] END)) AS tok
        |  FROM t0),
        |sizes AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
        |  FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id)
        |SELECT doc_a, doc_b, n_common, sa.n AS n_a, sb.n AS n_b,
        |  round(n_common / (sa.n + sb.n - n_common), 6) AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = doc_a
        |JOIN sizes sb ON sb.doc_id = doc_b
        |WHERE 100 * n_common >= 85 * (sa.n + sb.n - n_common)""".stripMargin
  )
}
