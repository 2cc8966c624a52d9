package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Core scan / projection / scalar / aggregation surface.
  *
  * Re-expresses (Spark-first, not a port) the reference operators:
  *  - S3 `scan_parquet_dir`  (src/circuit/parquet_reader.cpp:60-130)
  *  - P1 `project_rename_flatten` (src/touches/parquet_writer.cpp:189-296)
  *  - P2 `bit_unpack_branch_type` (src/touches/parquet_writer.h:63-69)
  *  - P3 `cast_narrow` (src/touches/parquet_writer.cpp:34-53)
  *  - P4 `validate_range` (src/touches/parquet_writer.cpp:207-219)
  *  - P6 `drop_columns` (src/circuit/sonata_writer.cpp:29,76-78)
  *  - A1-A4 counts / global sums / max / per-key histogram
  *    (src/circuit/parquet_reader.cpp:30-34, src/parquet2hdf5.cpp:89-95,
  *     src/index/index.cpp:208-218)
  *
  * Every query is a narrow scan→project chain or a single hash aggregate;
  * filters and column selections reach the parquet scan (PushedFilters /
  * ReadSchema), so at 100 TB each of these is an embarrassingly parallel
  * single stage (plus one shuffle for the groupBys).
  */
object CoreOps {

  /** Field-level survivorship over `(user_id, event_id, ts_us, cents,
    * k)`: overall-latest cents, latest NON-NULL k (a later null never
    * erases an earlier value), first/last-seen bounds — each rule one
    * conditional struct-max on a single map-side-combining aggregate.
    */
  def goldenRecord(ev: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    ev.groupBy(col("user_id"))
      .agg(
        max(struct(col("ts_us"), col("event_id"), col("cents"))).as("lv"),
        max(when(col("k").isNotNull,
          struct(col("ts_us"), col("event_id"), col("k")))).as("lk"),
        min(col("ts_us")).as("first_seen_us"),
        max(col("ts_us")).as("last_seen_us"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("lv.cents").as("latest_cents"),
        col("lk.k").as("latest_k"), col("first_seen_us"),
        col("last_seen_us"), col("n_events"))

  val queries: Map[String, Q] = Map(
    // Flagship TPC-H-Q1-style aggregate: map-side partial agg + 1 shuffle
    // on a tiny key space; sums rounded (both sides) to absorb fp
    // association order.
    "q1_agg" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          // quantities are integral doubles (< 2^53): their sum is exact in
          // any order; money columns go through exact integer cents / 1e-4
          // units so the result is bit-identical to the oracle regardless
          // of aggregation order (no half-cent rounding flips).
          sum(col("l_quantity")).as("sum_qty"),
          (sum(round(col("l_extendedprice") * 100).cast("long")) / 100.0).as("sum_base_price"),
          (sum(round(col("l_extendedprice") * 100).cast("long")
            * round((lit(1) - col("l_discount")) * 100).cast("long")) / 10000.0).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    }),

    // S3: multi-file parquet scan with predicate + projection pushdown.
    "scan_parquet_dir" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_orderkey") % 10 === 0)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    }),

    // P1: projection with rename + array flattening (float[3] -> 3 columns),
    // the efferent/afferent rename shape of parquet_writer.cpp:302-374.
    "project_rename_flatten" -> ((s, dir) => {
      Tables.embeddings(s, dir).select(
        col("vec_id").as("id"),
        col("label").as("cls"),
        element_at(col("embedding"), 1).as("e0"),
        element_at(col("embedding"), 2).as("e1"),
        element_at(col("embedding"), 3).as("e2"))
    }),

    // P2: one packed byte -> two int8 nibbles, +1 offset (soma convention).
    "bit_unpack_branch_type" -> ((s, dir) => {
      val packed = col("l_linenumber")
      Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"),
        (shiftright(packed, 4).bitwiseAND(15) + 1).cast("tinyint").as("pre_branch_type"),
        (packed.bitwiseAND(15) + 1).cast("tinyint").as("post_branch_type"))
    }),

    // P3: logical narrowing casts (int32->int16, double->int32 via floor —
    // floor on both sides because Spark truncates and DuckDB rounds).
    "cast_narrow" -> ((s, dir) => {
      Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_linenumber").cast("smallint").as("ln16"),
        floor(col("l_quantity")).cast("int").as("qty32"))
    }),

    // P4: range validation as a flag column (the raise_error trip path is
    // unit-tested; a verify query must not abort the whole dump).
    "validate_range" -> ((s, dir) => {
      Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_partkey") <= 32767).cast("int").as("in_range"))
    }),

    // P6: column pruning by skip-set.
    "drop_columns" -> ((s, dir) => {
      Tables.lineitem(s, dir).drop("l_tax", "l_discount", "l_comment", "l_shipdate")
    }),

    // A1: total record count (answered from parquet footers, zero data read).
    "count_records" -> ((s, dir) => {
      Tables.lineitem(s, dir).agg(count(lit(1)).as("n_rows"))
    }),

    // A2: cluster-wide sum — partial+final agg replaces MPI_Allreduce(SUM).
    "global_sum" -> ((s, dir) => {
      Tables.lineitem(s, dir).agg(
        round(sum(col("l_quantity")), 2).as("total_qty"),
        count(lit(1)).as("n"))
    }),

    // A3: max node id + 1 — replaces MPI_Allreduce(MAX) (index.cpp:208-213).
    "global_max" -> ((s, dir) => {
      Tables.orders(s, dir).agg((max(col("o_custkey")) + 1).as("node_count"))
    }),

    // A4: per-key histogram — hash aggregate with map-side combine.
    "histogram_by_key" -> ((s, dir) => {
      Tables.orders(s, dir).groupBy(col("o_custkey").as("node_id"))
        .agg(count(lit(1)).as("n"))
    }),

    // S4: parquet sink round-trip with the reference writer's physical
    // knobs (SNAPPY, dictionary off, ~20 MB row groups,
    // src/touches/parquet_writer.cpp:105-163) — identity on values, so
    // fully oracle-checkable.
    "sink_parquet" -> ((s, dir) => {
      val out = graft.io.TempDirs.create("sink_parquet")
      graft.io.ParquetMeta.writeWithMeta(
        Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
            col("l_returnflag")),
        out,
        kv = Map("touch2parquet_version" -> graft.BuildInfo.version),
        options = Map(
          "compression" -> "snappy",
          "parquet.enable.dictionary" -> "false",
          "parquet.block.size" -> (20 * 1024 * 1024).toString))
      s.read.parquet(out)
    }),

    // JSONL sink round-trip — the corpus interchange format a training
    // pipeline actually emits/consumes (one JSON object per line,
    // gzip-splittable at file granularity). Identity on values through
    // JSON string escaping and number formatting, so fully
    // oracle-checkable; an explicit read schema (from the writer's own
    // frame) keeps long/double types stable instead of re-inferred.
    "sink_jsonl_roundtrip" -> ((s, dir) => {
      val out = graft.io.TempDirs.create("sink_jsonl")
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
      docs.write.mode("overwrite").json(out)
      s.read.schema(docs.schema).json(out)
    }),

    // ORC sink round-trip — the second columnar container Spark ships
    // natively; same values through a different encoder/footer stack.
    "sink_orc_roundtrip" -> ((s, dir) => {
      val out = graft.io.TempDirs.create("sink_orc")
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
        .write.mode("overwrite").orc(out)
      s.read.orc(out)
    }),

    // CSV sink round-trip: quoted/escaped text survives commas, quotes,
    // and newlines (multiLine on the read side for embedded newlines).
    // The WRITER trims leading/trailing whitespace by default — turned
    // off explicitly or '  padded  ' text would round-trip as 'padded'.
    // (Known format limit, not worked around: CSV cannot distinguish an
    // empty string from null on read-back.)
    "sink_csv_roundtrip" -> ((s, dir) => {
      val out = graft.io.TempDirs.create("sink_csv")
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
      docs.write.mode("overwrite").option("header", "true")
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .csv(out)
      s.read.schema(docs.schema)
        .option("header", "true").option("multiLine", "true").csv(out)
    }),

    // L1 `limit_n`: deterministic cap — ordered by a unique key so the
    // kept row set is well-defined (a bare limit is partitioning-dependent
    // and could never hash-match an oracle).
    "limit_n" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .orderBy(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice")) // (ok, ln) not unique at sf>=0.1
        .limit(1000)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    }),

    // A5/sketches: exact distinct (expand + two-phase hash agg)…
    "count_distinct" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"))
    }),

    // …and the HLL sketch variant via the custom TypedImperativeAggregate
    // (rows-only: approximate results can't hash-match an exact oracle;
    // error bounds + partitioning-invariance are asserted in ScalaTest).
    "approx_distinct_hll" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(graft.functions.HllSketchAgg.hllDistinct(col("l_partkey"), 12).as("approx_parts"))
    }),

    // ORACLED companion for the HLL path (the ann_ivf_recall pattern):
    // per-group estimate vs exact distinct, collapsed to a within-5%
    // boolean. p=12 → 4096 registers → σ ≈ 1.6%, so 5% is ~3σ; the
    // oracle reproduces the exact counts and pins within_bound=true, so
    // a sketch regression fails the hash compare.
    "hll_distinct_check" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("exact_parts"),
          graft.functions.HllSketchAgg.hllDistinct(col("l_partkey"), 12).as("est"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("est") - col("exact_parts")) <= col("exact_parts") * lit(0.05))
            .as("within_bound"))),

    // Sketch-TABLE rollup (the mergeable-summaries warehouse pattern,
    // Agarwal et al. PODS'12): build per-group hll_sketch REGISTER
    // tables, roll them up with hll_merge, and pin that the rollup
    // estimate EQUALS the direct global sketch's — exact equality, not
    // a tolerance, because register max-merge is associative, so
    // per-group-then-merge produces identical registers. At 100 TB this
    // is the pattern that matters: the raw-data pass runs once per
    // partition, every later cross-partition distinct is a merge of
    // 4 KiB sketches. Exact distinct + within-5% bound come along as in
    // hll_distinct_check.
    "hll_rollup_check" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val perGroup = li.groupBy(col("l_returnflag"))
        .agg(graft.functions.HllSketchAgg.hllSketch(col("l_partkey"), 12).as("sk"))
      val rollup = perGroup
        .agg(graft.functions.HllSketchAgg.hllMerge(col("sk")).as("est_rollup"))
      val direct = li
        .agg(graft.functions.HllSketchAgg.hllDistinct(col("l_partkey"), 12).as("est_direct"))
      val exact = li.agg(countDistinct(col("l_partkey")).as("exact_parts"))
      exact.crossJoin(broadcast(rollup)).crossJoin(broadcast(direct)) // 1-row sides
        .select(col("exact_parts"),
          (col("est_rollup") === col("est_direct")).as("rollup_equals_direct"),
          (abs(col("est_direct") - col("exact_parts")) <= col("exact_parts") * lit(0.05))
            .as("within_bound"))
    }),

    // CDC upsert: base ∪ changes → latest version per key, as ONE
    // map-side-combining aggregate (`max(struct(version, payload))` —
    // lexicographic struct max picks the newest row), not a per-key
    // window: partial aggregation collapses duplicates before the
    // shuffle, so the exchange carries ~|keys| rows however many
    // change batches pile up.
    "upsert_latest" -> ((s, dir) => {
      val cents = round(col("o_totalprice") * 100).cast("long")
      val base = Tables.orders(s, dir)
        .select(col("o_orderkey"), lit(0).as("version"), cents.as("price_c"))
      val changes = Tables.orders(s, dir)
        .filter(pmod(col("o_orderkey"), lit(10)) === 0)
        .select(col("o_orderkey"), lit(1).as("version"), (cents + 100L).as("price_c"))
      base.unionByName(changes)
        .groupBy(col("o_orderkey"))
        .agg(max(struct(col("version"), col("price_c"))).as("latest"))
        .select(col("o_orderkey"),
          col("latest.version").as("version"), col("latest.price_c").as("price_c"))
    }),

    // Field-level SURVIVORSHIP (the "golden record" of MDM pipelines):
    // where upsert_latest keeps the latest whole ROW, this merges each
    // entity's best value PER FIELD — the overall-latest amount, the
    // latest NON-NULL enrichment field (a later event with a missing
    // field must not erase an earlier value), and first/last-seen
    // bounds. Every rule is one conditional struct-max riding a single
    // map-side-combining aggregate on the entity key — adding a
    // survivorship rule adds an aggregate expression, not a pass.
    "golden_record_survivorship" -> ((s, dir) =>
      goldenRecord(Tables.events(s, dir).select(col("user_id"), col("event_id"),
        col("ts_us"), round(col("value") * 100).cast("long").as("cents"),
        get_json_object(col("props"), "$.k").cast("long").as("k")))),

    // Snapshot diff — the table-compare every incremental pipeline runs
    // between runs: added / removed / changed rows via ONE full-outer
    // join co-partitioned on the key; payloads compare as md5 of the
    // canonicalized columns so arbitrarily wide rows diff on one 32-byte
    // value. Both "versions" are derived deterministically from orders
    // (old = keys outside a dropped md5 bucket; new = all keys with a
    // deterministic subset repriced) so the oracle sees the same tables.
    "snapshot_diff" -> ((s, dir) => {
      val cents = round(col("o_totalprice") * 100).cast("long")
      // multi-column payload hashed to one 32-byte value — the point of
      // the hash: however many payload columns the table grows, the
      // full-outer join carries one fixed-width compare column
      // \u0001 unit-separator delimiter: concatenation without one
      // would let a boundary shift ("10"+"0X" vs "100"+"X") fake
      // payload equality. (Was previously a literal 0x01 byte inside the
      // quotes, which review tools render as an empty string — spelled as
      // an escape so the invariant is visible.)
      def payloadHash =
        md5(concat_ws("\u0001", col("price_c").cast("string"), col("o_orderpriority")))
      val old = Tables.orders(s, dir)
        .filter(graft.ext.Sampling.hashBucket(col("o_orderkey")) >= 2000)
        .select(col("o_orderkey"), cents.as("price_c"), col("o_orderpriority"))
      val nw = Tables.orders(s, dir)
        .select(col("o_orderkey"),
          when(pmod(col("o_orderkey"), lit(7)) === 0, cents + 100L)
            .otherwise(cents).as("price_c"),
          col("o_orderpriority"))
      val oldH = old.select(col("o_orderkey"), payloadHash.as("h_old"))
      val newH = nw.select(col("o_orderkey"), payloadHash.as("h_new"))
      oldH.join(newH, Seq("o_orderkey"), "full_outer")
        .withColumn("status",
          when(col("h_old").isNull, "added")
            .when(col("h_new").isNull, "removed")
            .when(col("h_old") =!= col("h_new"), "changed")
            .otherwise("same"))
        .filter(col("status") =!= "same")
        .select(col("o_orderkey"), col("status"))
    }),

    // Data-quality profile: per-column row/present counts, min/max, and
    // integer-cents sums in ONE pass via stack (unpivot) + a single
    // grouped aggregate — the profiling scan every ingestion step runs;
    // at 100 TB it is one map-side-combining aggregate over one read.
    "dq_profile" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .selectExpr("stack(3, 'l_quantity', l_quantity, " +
          "'l_extendedprice', l_extendedprice, 'l_discount', l_discount) " +
          "as (col_name, v)")
        .groupBy(col("col_name"))
        .agg(count(lit(1)).as("n"), count(col("v")).as("n_present"),
          min(col("v")).as("min_v"), max(col("v")).as("max_v"),
          sum(round(col("v") * 100).cast("long")).as("sum_c"))),

    // I1 `partition_uniform`: round-robin repartition balances rows
    // across tasks — per-partition counts surfaced for inspection
    // (rows-only: partition layout is engine-internal; near-uniformity
    // asserted in ScalaTest).
    "partition_uniform" -> ((s, dir) => {
      Tables.lineitem(s, dir).repartition(8)
        .groupBy(spark_partition_id().as("partition_id"))
        .agg(count(lit(1)).as("n"))
    }),

    // L1/top-k: deterministic limit = global sort + limit (TakeOrdered —
    // per-partition top-k then merge on the driver, no full sort at scale).
    "topk_orders" -> ((s, dir) => {
      Tables.orders(s, dir)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
        .select(col("o_orderkey"), col("o_totalprice"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "golden_record_survivorship" ->
      """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |              CAST(round(value * 100) AS BIGINT) AS cents,
        |              CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |            FROM events),
        |lv AS (SELECT user_id, cents AS latest_cents FROM (
        |         SELECT user_id, cents, row_number() OVER (PARTITION BY user_id
        |           ORDER BY ts_us DESC, event_id DESC) AS rn FROM ev) t WHERE rn = 1),
        |lk AS (SELECT user_id, k AS latest_k FROM (
        |         SELECT user_id, k, row_number() OVER (PARTITION BY user_id
        |           ORDER BY ts_us DESC, event_id DESC) AS rn
        |         FROM ev WHERE k IS NOT NULL) t WHERE rn = 1),
        |b AS (SELECT user_id, min(ts_us) AS first_seen_us,
        |        max(ts_us) AS last_seen_us, count(*) AS n_events
        |      FROM ev GROUP BY user_id)
        |SELECT b.user_id, lv.latest_cents, lk.latest_k,
        |  b.first_seen_us, b.last_seen_us, b.n_events
        |FROM b JOIN lv USING (user_id) LEFT JOIN lk USING (user_id)""".stripMargin,

    "upsert_latest" ->
      """WITH all_rows AS (
        |  SELECT o_orderkey, 0 AS version,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
        |  FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, 1 AS version,
        |    CAST(round(o_totalprice * 100) AS BIGINT) + 100 AS price_c
        |  FROM orders WHERE o_orderkey % 10 = 0)
        |SELECT o_orderkey, version, price_c FROM all_rows
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY version DESC) = 1""".stripMargin,
    "snapshot_diff" ->
      """WITH old AS (
        |  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
        |  FROM orders
        |  WHERE CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4)) AS BIGINT) >= 2000),
        |nw AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 7 = 0
        |         THEN CAST(round(o_totalprice * 100) AS BIGINT) + 100
        |         ELSE CAST(round(o_totalprice * 100) AS BIGINT) END AS price_c
        |  FROM orders)
        |SELECT o_orderkey, status FROM (
        |  SELECT COALESCE(old.o_orderkey, nw.o_orderkey) AS o_orderkey,
        |    CASE WHEN old.o_orderkey IS NULL THEN 'added'
        |         WHEN nw.o_orderkey IS NULL THEN 'removed'
        |         WHEN old.price_c <> nw.price_c THEN 'changed'
        |         ELSE 'same' END AS status
        |  FROM old FULL OUTER JOIN nw ON old.o_orderkey = nw.o_orderkey)
        |WHERE status <> 'same'""".stripMargin,
    // sum(BIGINT) is HUGEINT in DuckDB — cast back
    "dq_profile" -> Seq("l_quantity", "l_extendedprice", "l_discount").map(c =>
      s"""SELECT '$c' AS col_name, count(*) AS n, count($c) AS n_present,
         |  min($c) AS min_v, max($c) AS max_v,
         |  CAST(sum(CAST(round($c * 100) AS BIGINT)) AS BIGINT) AS sum_c
         |FROM lineitem""".stripMargin).mkString("\nUNION ALL\n"),
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS sum_base_price,
        |  sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |      * CAST(round((1 - l_discount) * 100) AS BIGINT)) / 10000.0 AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "scan_parquet_dir" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_orderkey % 10 = 0",
    "project_rename_flatten" ->
      """SELECT vec_id AS id, label AS cls,
        |  embedding[1] AS e0, embedding[2] AS e1, embedding[3] AS e2
        |FROM embeddings""".stripMargin,
    "bit_unpack_branch_type" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(((l_linenumber >> 4) & 15) + 1 AS TINYINT) AS pre_branch_type,
        |  CAST((l_linenumber & 15) + 1 AS TINYINT) AS post_branch_type
        |FROM lineitem""".stripMargin,
    "cast_narrow" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(l_linenumber AS SMALLINT) AS ln16,
        |  CAST(floor(l_quantity) AS INTEGER) AS qty32
        |FROM lineitem""".stripMargin,
    "validate_range" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(l_partkey <= 32767 AS INTEGER) AS in_range
        |FROM lineitem""".stripMargin,
    "drop_columns" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
        |  l_extendedprice, l_returnflag, l_linestatus
        |FROM lineitem""".stripMargin,
    "count_records" -> "SELECT count(*) AS n_rows FROM lineitem",
    "sink_parquet" ->
      "SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem",
    "sink_jsonl_roundtrip" ->
      "SELECT doc_id, text, lang, n_chars FROM documents",
    "sink_orc_roundtrip" ->
      "SELECT doc_id, text, lang, n_chars FROM documents",
    "sink_csv_roundtrip" ->
      "SELECT doc_id, text, lang, n_chars FROM documents",
    "global_sum" ->
      "SELECT round(sum(l_quantity), 2) AS total_qty, count(*) AS n FROM lineitem",
    "global_max" -> "SELECT max(o_custkey) + 1 AS node_count FROM orders",
    "histogram_by_key" ->
      "SELECT o_custkey AS node_id, count(*) AS n FROM orders GROUP BY o_custkey",
    "topk_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "limit_n" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |LIMIT 1000""".stripMargin,
    "count_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    // exact counts reproduced by the oracle; within_bound pinned TRUE —
    // a sketch whose estimate drifts past 5% flips the boolean
    "hll_distinct_check" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
        |  CAST(TRUE AS BOOLEAN) AS within_bound
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    // exact distinct from the oracle; both booleans pinned TRUE — the
    // rollup-equality is exact by merge associativity, so any drift in
    // the sketch-table path flips the hash
    "hll_rollup_check" ->
      """SELECT count(DISTINCT l_partkey) AS exact_parts,
        |  CAST(TRUE AS BOOLEAN) AS rollup_equals_direct,
        |  CAST(TRUE AS BOOLEAN) AS within_bound
        |FROM lineitem""".stripMargin
  )
}
