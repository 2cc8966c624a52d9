package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed table digests — the anti-entropy primitive for comparing
  * two 100 TB replicas WITHOUT moving either: each side computes
  * (bucket, n_rows, xor-of-row-hashes) over the same canonical row
  * serialization; equal tables produce equal digests, and a mismatch
  * names the bucket to drill into (recurse with a finer modulus inside
  * the bucket — the Merkle descent — until the differing keys fall
  * out). The pattern of Cassandra/Dynamo anti-entropy and
  * pt-table-checksum, as one relational aggregate.
  *
  * Design for exact cross-engine agreement:
  *   - The row hash is the PORTABLE md5 path (the
  *     [[graft.functions.CountMinAgg]] argument): first 15 hex chars →
  *     60-bit long, computable verbatim in any engine with md5 — no
  *     xxhash64 dependency.
  *   - The combiner is BIT_XOR, not SUM: commutative, associative,
  *     self-inverse, and immune to both overflow and merge order —
  *     the canonical replica-digest fold. (A sum would wrap in a long
  *     on one engine and widen on another.)
  *   - Serialization pins every value to a canonical string form
  *     (cents for money) joined on , so type formatting can't
  *     drift between engines.
  *
  * One scan, one map-side-combining aggregate on a 64-way key: the
  * digest costs a single pass and shuffles 64 rows.
  */
object Checksum {

  /** The per-row (bucket, h) projection both the batch and streaming
    * digests share: `keyCol` routes the bucket (md5, 8 hex → mod
    * `buckets`), `payload` is the canonical serialization.
    */
  def hashedRows(df: DataFrame, keyCol: String,
                 payloadCols: Seq[String], buckets: Int = 64): DataFrame = {
    val payload = concat_ws("", payloadCols.map(c => col(c).cast("string")): _*)
    df.select(
      (conv(substring(md5(col(keyCol).cast("string")), 1, 8), 16, 10)
        .cast("long") % buckets).as("bucket"),
      conv(substring(md5(payload), 1, 15), 16, 10).cast("long").as("h"))
  }

  /** 64-bucket digest of a frame. */
  def bucketDigest(df: DataFrame, keyCol: String,
                   payloadCols: Seq[String], buckets: Int = 64): DataFrame =
    hashedRows(df, keyCol, payloadCols, buckets)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"), bit_xor(col("h")).as("xor_digest"))

  val queries: Map[String, Q] = Map(
    // orders replica digest: 64 buckets over the canonical row form
    "table_checksum" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .withColumn("price_c", round(col("o_totalprice") * 100).cast("long"))
      bucketDigest(o, "o_orderkey",
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "price_c"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "table_checksum" ->
      """WITH o AS (SELECT o_orderkey, o_custkey, o_orderstatus,
        |             CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
        |           FROM orders),
        |h AS (SELECT
        |        CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT) % 64 AS bucket,
        |        CAST(('0x' || substr(md5(
        |          CAST(o_orderkey AS VARCHAR) || chr(1) ||
        |          CAST(o_custkey AS VARCHAR) || chr(1) ||
        |          o_orderstatus || chr(1) ||
        |          CAST(price_c AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
        |      FROM o)
        |SELECT bucket, count(*) AS n_rows, bit_xor(hv) AS xor_digest
        |FROM h GROUP BY bucket""".stripMargin
  )
}
