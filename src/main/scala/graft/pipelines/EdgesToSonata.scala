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

  /** Run the full pipeline; returns the ordered edge DataFrame. */
  def convert(spark: SparkSession, edges: DataFrame,
              sourceCol: String, targetCol: String, outDir: String,
              tiebreak: Seq[String] = Seq.empty): DataFrame = {
    val pruned = edges.drop(SkipColumns: _*)
    // persisted: the edge sink, both index builds, and the returned frame
    // all read it — recomputing the position-stamping shuffle four times
    // would dominate the pipeline
    val ordered = Offsets.globalPosition(
        pruned, (Seq(sourceCol, targetCol) ++ tiebreak).map(col), "edge_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    ordered.write.mode("overwrite").parquet(s"$outDir/edges")

    // one pass for both population sizes (MPI_Allreduce(MAX) analogue);
    // an empty edge table aggregates to nulls → zero-sized populations
    val bounds = ordered.agg(
      max(col(sourceCol)).as("ms"), max(col(targetCol)).as("mt")).first()
    def maxOr(i: Int): Long = if (bounds.isNullAt(i)) -1L else bounds.getLong(i)
    def writeIndex(nodeCol: String, nodeCount: Long, dir: String): Unit = {
      val (primary, secondary) = CsrIndex.build(
        ordered.select(col(nodeCol).as("node_id"), col("edge_id").as("pos")),
        "node_id", "pos", nodeCount)
      primary.write.mode("overwrite").parquet(s"$outDir/indices/$dir/primary")
      secondary.write.mode("overwrite").parquet(s"$outDir/indices/$dir/secondary")
    }
    writeIndex(sourceCol, maxOr(0) + 1, "source_to_target")
    writeIndex(targetCol, maxOr(1) + 1, "target_to_source")
    ordered
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
