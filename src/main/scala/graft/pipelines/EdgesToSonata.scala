package graft.pipelines

import graft.{Q, Tables}
import graft.ops.{CsrIndex, Offsets}
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

  /** Run the full pipeline; returns the written edge table (read back from
    * the sink — the pipeline's caches are all released before returning).
    *
    * Orchestration, not dataflow, dominated the first cut of this pipeline
    * (6 serial actions × per-job overhead), so the structure is:
    * positions stamped ONCE (materialized by the edge write, then every
    * internal cache released as soon as its successor is materialized),
    * population bounds from the cached frame, and the two index directions
    * submitted as CONCURRENT Spark jobs — they are independent DAGs over
    * the same cached input, exactly the reference's two MPI communicator
    * passes (src/index/index.cpp:309-324) minus the serialization.
    * The source-side index uses the `contiguous` fast path: the edge table
    * is sorted by (source, target, …), so per-source positions are one run.
    */
  def convert(spark: SparkSession, edges: DataFrame,
              sourceCol: String, targetCol: String, outDir: String,
              tiebreak: Seq[String] = Seq.empty): DataFrame = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pruned = edges.drop(SkipColumns: _*)
    val (ordered0, stamped) = Offsets.globalPositionStamped(
      pruned, (Seq(sourceCol, targetCol) ++ tiebreak).map(col), "edge_id")
    // persisted: both index builds and the bounds agg read it
    val ordered = ordered0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    ordered.write.mode("overwrite").parquet(s"$outDir/edges")
    stamped.unpersist() // ordered's cache is built; the internal one is dead

    // one pass for both population sizes (MPI_Allreduce(MAX) analogue);
    // an empty edge table aggregates to nulls → zero-sized populations.
    // cast("long"): node-id columns may arrive as any integer width
    val bounds = ordered.agg(
      max(col(sourceCol)).cast("long").as("ms"),
      max(col(targetCol)).cast("long").as("mt")).first()
    def maxOr(i: Int): Long = if (bounds.isNullAt(i)) -1L else bounds.getLong(i)
    def writeIndex(nodeCol: String, nodeCount: Long, dir: String,
                   contiguous: Boolean): Unit = {
      val (primary, secondary, done) = CsrIndex.buildStamped(
        ordered.select(col(nodeCol).as("node_id"), col("edge_id").as("pos")),
        "node_id", "pos", nodeCount, contiguous)
      secondary.write.mode("overwrite").parquet(s"$outDir/indices/$dir/secondary")
      primary.write.mode("overwrite").parquet(s"$outDir/indices/$dir/primary")
      done()
    }
    implicit val ec: ExecutionContext = ExecutionContext.global
    Await.result(Future.sequence(Seq(
      Future(writeIndex(sourceCol, maxOr(0) + 1, "source_to_target", contiguous = true)),
      Future(writeIndex(targetCol, maxOr(1) + 1, "target_to_source", contiguous = false)))),
      Duration.Inf)
    ordered.unpersist()
    spark.read.parquet(s"$outDir/edges")
  }

  val queries: Map[String, Q] = Map(
    // lineitem as the edge table (orderkey → suppkey edges); oracle checks
    // the ordered, pruned, position-stamped edge output.
    "edges_to_sonata" -> ((s, dir) => {
      val out = java.nio.file.Files.createTempDirectory("sonata").toString
      val edges = Tables.lineitem(s, dir).select(
        col("l_orderkey").as("source_node_id"),
        col("l_suppkey").as("target_node_id"),
        col("l_linenumber").as("edge_type_id"),
        col("l_quantity").as("my_attribute"))
      // edge_type_id (= linenumber) completes the total order — without a
      // tiebreaker, rows sharing (source, target) could swap positions and
      // their payload columns would disagree with the oracle
      convert(s, edges, "source_node_id", "target_node_id", out,
        tiebreak = Seq("edge_type_id", "my_attribute"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "edges_to_sonata" ->
      """SELECT l_orderkey AS source_node_id, l_suppkey AS target_node_id,
        |  l_linenumber AS edge_type_id, l_quantity AS my_attribute,
        |  ROW_NUMBER() OVER (ORDER BY l_orderkey, l_suppkey, l_linenumber, l_quantity) - 1 AS edge_id
        |FROM lineitem""".stripMargin
  )
}
