package graft.pipelines

import graft.{Q, Tables}
import graft.ops.Offsets
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pipeline B (S3 → P6 → O5 → I1-I7 → S5): Parquet edge directory →
  * SONATA-shaped output (reference: src/parquet2hdf5.cpp:171-251 +
  * src/index/index.cpp:309-324).
  *
  * The reference's physical sink is MPI-IO HDF5; the HDF5 container itself
  * is out of relational scope (SURVEY.md §2.1 S5), so the sink here is a
  * parquet directory MIRRORING the SONATA layout:
  *
  *   out/edges/                 — ordered edge table, `edge_id` = global
  *                                row position (the distributed exclusive
  *                                prefix sum, O5), skip-set columns dropped
  *   out/indices/source_to_target/{primary,secondary}/
  *   out/indices/target_to_source/{primary,secondary}/
  *
  * Every computation feeding the sink — offsets, RLE, range shuffle,
  * interval merge, dense sequence join, CSR layout — is the same Spark
  * dataflow the reference runs as MPI collectives; only the final
  * container format differs.
  */
object EdgesToSonata {

  private val SkipColumns = Seq("synapse_id", "__index_level_0__")

  /** Run the full pipeline; returns the ordered (enum-coded) edge frame
    * backed by a STILL-PERSISTED cache — the caller's next action reads
    * the cache instead of re-deriving the sort. With `enumCols` the
    * returned frame is a broadcast join OVER the cached frame, so its
    * own `unpersist()` would be a no-op: release through
    * `convertStamped`'s cleanup thunk (or the session's `clearCache`,
    * which the Verify/Bench harnesses call per query).
    *
    * Orchestration, not dataflow, dominated the first cut of this
    * pipeline (6+ serial actions × per-job overhead), so the structure
    * minimizes the serial job chain:
    *
    *  1. edge positions stamped once; the edge WRITE both materializes
    *     the cache and carries the population bounds as `observe()`
    *     metrics (MPI_Allreduce(MAX) analogue,
    *     src/parquet2hdf5.cpp:171-185) — no separate bounds action;
    *  2. BOTH index directions' range lists are RLE'd AND globally
    *     numbered by `RangeRle.numberedRanges` in ONE fused range
    *     shuffle (per-partition imperative RLE + driver-side boundary
    *     merge + prefix-sum numbering — the reference's exact MPI
    *     design, index.cpp:114-153/272-280) — vs a hash-shuffle window
    *     RLE plus a range-shuffle position stamp per direction;
    *  3. the stamped range table is materialized once, then the four
    *     index files write CONCURRENTLY from the cache.
    */
  def convert(spark: SparkSession, edges: DataFrame,
              sourceCol: String, targetCol: String, outDir: String,
              tiebreak: Seq[String] = Seq.empty,
              enumCols: Seq[String] = Seq.empty): DataFrame =
    convertStamped(spark, edges, sourceCol, targetCol, outDir, tiebreak, enumCols)._1

  /** `convert` plus the cleanup thunk that releases the pipeline's edge
    * cache — the handle callers outside a clearCache-per-query harness
    * must invoke once their actions on the returned frame complete
    * (same pattern as `CsrIndex.buildStamped`).
    */
  def convertStamped(spark: SparkSession, edges: DataFrame,
              sourceCol: String, targetCol: String, outDir: String,
              tiebreak: Seq[String] = Seq.empty,
              enumCols: Seq[String] = Seq.empty): (DataFrame, () => Unit) = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    require(!enumCols.contains(sourceCol) && !enumCols.contains(targetCol),
      "node-id columns cannot be dictionary-encoded")
    val pruned = edges.drop(SkipColumns: _*)
    val (ordered0, stampedE) = Offsets.globalPositionStamped(
      pruned, (Seq(sourceCol, targetCol) ++ tiebreak).map(col), "edge_id")
    // persisted: the index builds, the enum encode, and the returned
    // frame all read it
    val ordered = ordered0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // enum columns → integer codes in the edge table + an
    // `@library/<col>` values dataset each (sonata_writer.cpp:102-111);
    // dictionaries are enum-small → broadcast encode, no extra shuffle
    val (encoded, libraries) = enumCols.foldLeft(
      (ordered, Seq.empty[(String, DataFrame)])) { case ((df, acc), c) =>
        val (coded, lib) = graft.ops.EnumLibrary.encode(df, c, c)
        (coded, acc :+ (c, lib))
    }
    // population bounds ride the write action as observed metrics —
    // an empty edge table observes nulls → zero-sized populations.
    // cast("long"): node-id columns may arrive as any integer width
    val obs = org.apache.spark.sql.Observation()
    encoded.observe(obs,
        max(col(sourceCol)).cast("long").as("ms"),
        max(col(targetCol)).cast("long").as("mt"))
      .write.mode("overwrite").parquet(s"$outDir/edges")
    stampedE.unpersist() // ordered's cache is built; the internal one is dead
    def nodeCountOf(metric: String): Long =
      Option(obs.get(metric)).map(_.asInstanceOf[Long] + 1).getOrElse(0L)

    // BOTH directions' range lists, RLE'd AND numbered in ONE range
    // shuffle: each edge explodes into a (dir, node, pos) pair per
    // direction, and `RangeRle.numberedRanges` does the reference's
    // per-rank RLE + boundary merge + prefix-sum numbering
    // (index.cpp:114-153, 272-280) in a single fused pass. The source
    // direction's contiguity (edge table sorted by source) falls out
    // for free — its runs are simply maximal.
    val (numbered0, doneR) = graft.ops.RangeRle.numberedRanges(
      ordered.select(
        explode(array(
          struct(lit(0).as("dir"), col(sourceCol).cast("long").as("node_id")),
          struct(lit(1).as("dir"), col(targetCol).cast("long").as("node_id")))).as("k"),
        col("edge_id").as("pos"))
        .select(col("k.dir").as("dir"), col("k.node_id").as("node_id"), col("pos")))
    val numbered = numbered0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def writeIndex(dirTag: Int, nodeCount: Long, dir: String): Seq[Future[Unit]] = {
      implicit val ec: ExecutionContext = ExecutionContext.global
      val nd = numbered.filter(col("dir") === dirTag)
      val secondary = nd.select(col("range_pos"),
        col("range_start").as("edge_start"), col("range_end").as("edge_end"))
      val counts = nd.groupBy(col("node_id"))
        .agg(count(lit(1)).as("cnt"), min(col("range_pos")).as("first_range"))
      val primary = spark.range(0, nodeCount).toDF("node_id")
        .join(counts, Seq("node_id"), "left_outer")
        .select(col("node_id"),
          coalesce(col("first_range"), lit(0L)).as("range_start"),
          coalesce(col("first_range") + col("cnt"), lit(0L)).as("range_end"))
      Seq(
        Future(secondary.write.mode("overwrite").parquet(s"$outDir/indices/$dir/secondary")),
        Future(primary.write.mode("overwrite").parquet(s"$outDir/indices/$dir/primary")))
    }
    try {
      numbered.count() // materialize ONCE; the 4+ writes below read caches
      doneR()          // numbered's cache is built; the internal one is dead
      implicit val ec: ExecutionContext = ExecutionContext.global
      Await.result(Future.sequence(
        writeIndex(0, nodeCountOf("ms"), "source_to_target") ++
          writeIndex(1, nodeCountOf("mt"), "target_to_source") ++
          libraries.map { case (c, lib) => Future(
            lib.write.mode("overwrite").parquet(s"$outDir/@library/$c")) }),
        Duration.Inf)
    } catch { case e: Throwable => ordered.unpersist(); throw e }
    finally { doneR(); numbered.unpersist() }
    (encoded, () => { ordered.unpersist(); () })
  }

  val queries: Map[String, Q] = Map(
    // lineitem as the edge table (orderkey → suppkey edges); oracle checks
    // the ordered, pruned, position-stamped edge output, including the
    // dictionary-coded enum column (codes = sorted-value ranks, which the
    // oracle reproduces as a dense rank over the string values).
    "edges_to_sonata" -> ((s, dir) => {
      val out = graft.io.TempDirs.create("sonata")
      val edges = Tables.lineitem(s, dir).select(
        col("l_orderkey").as("source_node_id"),
        col("l_suppkey").as("target_node_id"),
        col("l_linenumber").as("edge_type_id"),
        col("l_quantity").as("my_attribute"),
        col("l_returnflag").as("my_label"))
      // the tiebreak completes the total order — without it, rows sharing
      // (source, target) could swap positions and their payload columns
      // would disagree with the oracle
      convert(s, edges, "source_node_id", "target_node_id", out,
        tiebreak = Seq("edge_type_id", "my_attribute", "my_label"),
        enumCols = Seq("my_label"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "edges_to_sonata" ->
      """SELECT l_orderkey AS source_node_id, l_suppkey AS target_node_id,
        |  l_linenumber AS edge_type_id, l_quantity AS my_attribute,
        |  CAST(DENSE_RANK() OVER (ORDER BY l_returnflag) - 1 AS INTEGER) AS my_label,
        |  ROW_NUMBER() OVER (ORDER BY l_orderkey, l_suppkey, l_linenumber, l_quantity, l_returnflag) - 1 AS edge_id
        |FROM lineitem""".stripMargin
  )
}
