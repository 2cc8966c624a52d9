package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout management — the two levers that decide whether a
  * 100 TB table is cheap or ruinous to read back:
  *
  *  - **Compaction**: converters and streaming sinks emit files sized by
  *    task count, not by content (the reference writes one file per MPI
  *    rank regardless of volume, src/touch2parquet.cpp:84 — 4 ranks give
  *    4 files whether the run produced 4 MB or 4 TB). Downstream scan
  *    cost is driven by file count (footer reads, listing, scheduler
  *    overhead), so the layout op every pipeline needs is "rewrite to
  *    files of ~N bytes", with the file count derived from the MEASURED
  *    compressed input size, not guessed.
  *
  *  - **Bucketing**: a table that will be joined on the same key by
  *    every consumer should pay the partitioning shuffle ONCE, at write
  *    time. Two tables bucketed into the same number of buckets on their
  *    join key then join with ZERO exchanges on either side — at 100 TB
  *    the bucketed layout turns the nightly fact-to-fact join from a
  *    full network shuffle of both tables into a local merge per bucket.
  *    (Catalyst elides the Exchange because the bucketed scan already
  *    reports `HashPartitioning` on the join key; PlanSpec pins that.)
  */
object Layout {

  /** Rewrite `df`'s backing files into files of ~`targetBytes` each,
    * range-laid-out on `orderCols` (so the rewritten files carry useful
    * min/max footer stats for pruning, like the z-order sibling). The
    * output file count comes from the measured on-disk input size — the
    * standard compaction heuristic: compressed bytes are the only size
    * signal that exists without reading the data. (Count is an upper
    * bound: a range partition left empty — possible only when the data
    * has fewer rows or distinct range keys than computed files — writes
    * no file.)
    *
    * Input sizing lists each distinct PARENT directory once
    * (`listStatus`) instead of one `getFileStatus` round trip per file —
    * compaction targets exactly the many-small-files layouts where
    * per-file driver RPCs would dominate.
    */
  def compactTo(df: DataFrame, orderCols: Seq[String], targetBytes: Long,
                outDir: String): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val hconf = df.sparkSession.sparkContext.hadoopConfiguration
    val inputs = df.inputFiles.map(new org.apache.hadoop.fs.Path(_)).toSeq
    val wanted = inputs.map(_.toUri.getPath).toSet
    val totalBytes = inputs.groupBy(_.getParent).iterator.map { case (dir, _) =>
      dir.getFileSystem(hconf).listStatus(dir).iterator
        .filter(st => st.isFile && wanted.contains(st.getPath.toUri.getPath))
        .map(_.getLen).sum
    }.sum
    val nFiles = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    df.repartitionByRange(nFiles, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
      .write.mode("overwrite").parquet(outDir)
    df.sparkSession.read.parquet(outDir)
  }

  /** Write `df` as a bucketed table: hash-partitioned into `buckets` on
    * `bucketCol` at write time, each bucket sorted on the same key so
    * joins can merge without even a local sort when files-per-bucket is 1.
    * External table at `path`; the (session-scoped, in-memory) catalog
    * entry carries the bucket spec that later scans report as their
    * output partitioning.
    */
  def writeBucketed(df: DataFrame, bucketCol: String, buckets: Int,
                    table: String, path: String): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.write.format("parquet")
      .bucketBy(buckets, bucketCol).sortBy(bucketCol)
      .option("path", path).mode("overwrite")
      .saveAsTable(table)
  }

  /** The co-located fact-to-fact join over two same-bucketed tables —
    * both sides scan their bucket files in place; no Exchange appears on
    * either side of the SortMergeJoin (PlanSpec asserts this with
    * broadcast disabled).
    */
  def bucketedJoin(spark: SparkSession, dir: String, buckets: Int = 8): DataFrame = {
    val base = graft.io.TempDirs.create("bucketed")
    // run-scoped table names: the (session-local, in-memory) catalog
    // entries point at per-run temp dirs, so a fixed name would race
    // concurrent suites and leave entries aimed at a dead directory.
    // The returned join is LAZY (callers pin its executedPlan), so this
    // run's two tables must outlive the call — instead, garbage-collect
    // STALE runs' entries here, bounding the catalog growth. The name
    // tag is the creating call's nanoTime, so GC can skip entries
    // younger than the grace window: a CONCURRENT same-session caller
    // between its writeBucketed and spark.table() keeps its tables
    // (round-7 advice: the unconditional drop re-introduced exactly
    // the race the run-scoped names were created to avoid).
    val graceNanos = 10L * 60 * 1_000_000_000L
    val cutoff = System.nanoTime() - graceNanos
    spark.catalog.listTables().collect()
      .map(_.name).filter(_.startsWith("graft_bkt_"))
      .filter { t =>
        // tag = trailing hex nanoTime; unparseable names are legacy → drop
        scala.util.Try(java.lang.Long.parseUnsignedLong(
          t.substring(t.lastIndexOf('_') + 1), 16)).toOption
          .forall(_ < cutoff)
      }
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val tag = java.lang.Long.toHexString(System.nanoTime())
    val (tOrders, tLineitem) = (s"graft_bkt_orders_$tag", s"graft_bkt_lineitem_$tag")
    writeBucketed(Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority")),
      "o_orderkey", buckets, tOrders, s"$base/orders")
    writeBucketed(Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice")),
      "l_orderkey", buckets, tLineitem, s"$base/lineitem")
    spark.table(tLineitem)
      .join(spark.table(tOrders),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey").as("orderkey"), col("l_linenumber"),
        col("l_quantity"), col("o_custkey"), col("o_orderpriority"))
  }

  /** Hive-style partitioned layout + partition-pruned read-back: the
    * third layout lever next to bucketing and z-order. A predicate on
    * the partition column never touches non-matching directories — the
    * scan's `PartitionFilters` prune at FILE LISTING time, before any
    * footer or page is read (PlanSpec-asserted). At 100 TB, partitioning
    * by a low-cardinality routing column (language, date, source) is
    * what turns "scan the corpus" into "scan the slice".
    */
  def writePartitioned(df: DataFrame, partitionCol: String, outDir: String): DataFrame = {
    df.write.partitionBy(partitionCol).mode("overwrite").parquet(outDir)
    df.sparkSession.read.parquet(outDir)
  }

  val queries: Map[String, Q] = Map(
    // Small-file fixture built inline (64 task-sized shards of the
    // documents table — the shape a 64-rank converter leaves behind),
    // then compacted to ~256 KiB files. The oracle checks CONTENT
    // identity through the rewrite; the file-count arithmetic and size
    // bounds are ScalaTest's (LayoutSpec).
    "compact_small_files" -> ((s, dir) => {
      val base = graft.io.TempDirs.create("compact")
      Tables.documents(s, dir).repartition(64)
        .write.mode("overwrite").parquet(s"$base/shards")
      compactTo(s.read.parquet(s"$base/shards"),
          Seq("doc_id"), 256L * 1024, s"$base/compacted")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    }),

    "join_bucketed" -> ((s, dir) => bucketedJoin(s, dir)),

    // lang-partitioned rewrite, then a partition-pruned slice scan; the
    // partition column round-trips through the directory encoding
    // (values become path segments), which the content oracle checks
    "partitioned_scan_prune" -> ((s, dir) => {
      val base = graft.io.TempDirs.create("partitioned")
      writePartitioned(Tables.documents(s, dir), "lang", s"$base/by_lang")
        .filter(col("lang") === "en")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "compact_small_files" ->
      "SELECT doc_id, lang, source, n_chars FROM documents",
    "join_bucketed" ->
      """SELECT l_orderkey AS orderkey, l_linenumber, l_quantity,
        |  o_custkey, o_orderpriority
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin,
    "partitioned_scan_prune" ->
      "SELECT doc_id, lang, source, n_chars FROM documents WHERE lang = 'en'"
  )
}
