package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Storage-layout planning audits — the decisions a 100 TB lakehouse
  * makes BEFORE rewriting or shuffling data: which columns
  * dictionary-encode well (value entropy vs plain width), and how big
  * and how skewed a join's output will be before the shuffle is paid.
  *
  * Determinism discipline: entropy uses the floor-log2 surprisal idiom
  * (`length(bin(x)) - 1`, exact integer bits — the [[Quality]]
  * convention) rather than float logs, so the planning numbers
  * hash-compare exactly. Both audits are keyed aggregates over
  * value/key alphabets: nothing data-sized shuffles beyond the
  * per-value counts the estimates are made of (map-side combine
  * collapses those to partitions × alphabet rows).
  */
object StoragePlan {

  /** Per-column dictionary-encoding audit: row count, distinct values,
    * the floor-log2 surprisal "entropy" in milli-bits per value
    * (Σ n_v·(⌊log2 N⌋ − ⌊log2 n_v⌋)·1000 div N — an integer proxy that
    * ORDERS columns like H does: 0 for a constant column, ~⌈log2 N⌉·1000
    * for an all-distinct one), the dictionary index width
    * ⌈log2 distinct⌉ bits, and projected plain vs dictionary byte
    * sizes at 8-byte plain cells — the per-column encode/don't-encode
    * readout. One unpivot projection + two value-keyed aggregates;
    * the per-value table is the only exchange and it rides each
    * column's value alphabet.
    */
  def encodingEntropyAudit(df: DataFrame, auditCols: Seq[String]): DataFrame = {
    val stacked = df.select(
      explode(array(auditCols.map(c =>
        struct(lit(c).as("col_name"), col(c).cast("string").as("v"))): _*)).as("s"))
      .select(col("s.col_name").as("col_name"), col("s.v").as("v"))
    val perValue = stacked.groupBy(col("col_name"), col("v"))
      .agg(count(lit(1)).as("n_v"))
    val totals = perValue.groupBy(col("col_name"))
      .agg(sum(col("n_v")).as("n_rows"), count(lit(1)).as("n_distinct"))
    val entropy = perValue.join(totals.select(col("col_name"), col("n_rows")), "col_name")
      .select(col("col_name"), col("n_rows"),
        (col("n_v") * ((length(bin(col("n_rows"))) - 1) - (length(bin(col("n_v"))) - 1))
          * lit(1000L)).as("surp"))
      .groupBy(col("col_name"))
      .agg(expr("sum(surp) div max(n_rows)").as("entropy_mbits"))
    totals.join(entropy, "col_name")
      .select(col("col_name"), col("n_rows"), col("n_distinct"), col("entropy_mbits"),
        when(col("n_distinct") <= 1, lit(0L))
          .otherwise((length(bin(col("n_distinct") - 1))).cast("long")).as("dict_index_bits"))
      .select(col("col_name"), col("n_rows"), col("n_distinct"), col("entropy_mbits"),
        col("dict_index_bits"),
        (col("n_rows") * 8).as("plain_bytes"),
        (expr("(n_rows * dict_index_bits + 7) div 8") + col("n_distinct") * 8)
          .as("dict_bytes"))
  }

  /** Pre-shuffle join-cardinality forecast: from the two sides' key
    * histograms, the exact output size Σ_k c_a(k)·c_b(k), the matching
    * key count, the single heaviest key's contribution, and its ratio
    * to the mean (×10³) — the pre-flight that decides whether a join
    * needs salting BEFORE the exchange is paid (a self-join forecast is
    * exactly the pair-explosion bound the dedup/recsys operators
    * reason about). Two key-keyed aggregates + one equi-join on the
    * key alphabet; one summary row out.
    */
  def joinCardinalityForecast(left: DataFrame, right: DataFrame,
                              leftKey: String, rightKey: String): DataFrame = {
    val ca = left.groupBy(col(leftKey).as("k")).agg(count(lit(1)).as("ca"))
    val cb = right.groupBy(col(rightKey).as("k")).agg(count(lit(1)).as("cb"))
    ca.join(cb, "k")
      .select(col("k"), (col("ca") * col("cb")).as("contrib"))
      .agg(sum(col("contrib")).as("est_rows"),
        count(lit(1)).as("n_matching_keys"),
        max(col("contrib")).as("max_key_rows"))
      .select(col("est_rows"), col("n_matching_keys"), col("max_key_rows"),
        expr("max_key_rows * n_matching_keys * 1000L div greatest(est_rows, 1L)")
          .as("skew_ratio_x1e3"))
  }

  val queries: Map[String, Q] = Map(
    "encoding_entropy_audit" -> ((s, dir) =>
      encodingEntropyAudit(Tables.lineitem(s, dir),
        Seq("l_returnflag", "l_linestatus", "l_linenumber", "l_quantity", "l_partkey"))),
    // the pair-explosion pre-flight: lineitem self-joined on part key
    "join_cardinality_forecast" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      joinCardinalityForecast(li, li, "l_partkey", "l_partkey")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "encoding_entropy_audit" ->
      """WITH stacked AS (
        |  SELECT col_name, v FROM (
        |    SELECT 'l_returnflag' AS col_name, CAST(l_returnflag AS VARCHAR) AS v FROM lineitem
        |    UNION ALL SELECT 'l_linestatus', CAST(l_linestatus AS VARCHAR) FROM lineitem
        |    UNION ALL SELECT 'l_linenumber', CAST(l_linenumber AS VARCHAR) FROM lineitem
        |    UNION ALL SELECT 'l_quantity', CAST(l_quantity AS VARCHAR) FROM lineitem
        |    UNION ALL SELECT 'l_partkey', CAST(l_partkey AS VARCHAR) FROM lineitem)),
        |pv AS (SELECT col_name, v, count(*) AS n_v FROM stacked GROUP BY 1, 2),
        |tot AS (SELECT col_name, CAST(sum(n_v) AS BIGINT) AS n_rows,
        |               count(*) AS n_distinct FROM pv GROUP BY 1),
        |ent AS (
        |  SELECT pv.col_name,
        |    CAST(sum(pv.n_v * ((length(bin(t.n_rows)) - 1)
        |                     - (length(bin(pv.n_v)) - 1)) * 1000)
        |         // max(t.n_rows) AS BIGINT) AS entropy_mbits
        |  FROM pv JOIN tot t ON t.col_name = pv.col_name
        |  GROUP BY pv.col_name),
        |d AS (
        |  SELECT t.col_name, t.n_rows, CAST(t.n_distinct AS BIGINT) AS n_distinct,
        |    e.entropy_mbits,
        |    CAST(CASE WHEN t.n_distinct <= 1 THEN 0
        |         ELSE length(bin(t.n_distinct - 1)) END AS BIGINT) AS dict_index_bits
        |  FROM tot t JOIN ent e ON e.col_name = t.col_name)
        |SELECT col_name, n_rows, n_distinct, entropy_mbits, dict_index_bits,
        |  CAST(n_rows * 8 AS BIGINT) AS plain_bytes,
        |  CAST((n_rows * dict_index_bits + 7) // 8 + n_distinct * 8 AS BIGINT) AS dict_bytes
        |FROM d""".stripMargin,
    "join_cardinality_forecast" ->
      """WITH ca AS (SELECT l_partkey AS k, count(*) AS ca FROM lineitem GROUP BY 1),
        |cb AS (SELECT l_partkey AS k, count(*) AS cb FROM lineitem GROUP BY 1),
        |j AS (SELECT ca.k, CAST(ca.ca * cb.cb AS BIGINT) AS contrib
        |      FROM ca JOIN cb ON cb.k = ca.k)
        |SELECT CAST(sum(contrib) AS BIGINT) AS est_rows,
        |  count(*) AS n_matching_keys,
        |  CAST(max(contrib) AS BIGINT) AS max_key_rows,
        |  CAST(max(contrib) * count(*) * 1000 // greatest(sum(contrib), 1) AS BIGINT)
        |    AS skew_ratio_x1e3
        |FROM j""".stripMargin
  )
}
