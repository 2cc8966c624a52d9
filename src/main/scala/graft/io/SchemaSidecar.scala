package graft.io

import graft.{Q, Tables}
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.parquet.ParquetToSparkSchemaConverter
import org.apache.spark.sql.functions._

/** `_metadata` sidecar schema preference — the reference prefers the
  * schema from a directory's `_metadata` summary file over sniffing the
  * first data file (src/parquet2hdf5.cpp:205-218; old parquet-mr
  * writers emitted these summaries, and circuits built with them rely
  * on the sidecar being authoritative).
  *
  * Spark-first: the sidecar footer parses with parquet-hadoop, converts
  * through Spark's own parquet→Catalyst schema converter, and is handed
  * to the reader as an explicit schema — so the scan plans with the
  * SIDECAR's columns/types (missing columns read as null, exactly the
  * reference's "schema superset" semantics) while the underscore file
  * itself stays invisible to data scans, at any directory size.
  */
object SchemaSidecar {

  /** Read a parquet directory, preferring the `_metadata` sidecar's
    * schema when present; plain directory read otherwise.
    */
  def readParquetDir(spark: SparkSession, dir: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val metaPath = new Path(dir, "_metadata")
    if (metaPath.getFileSystem(conf).exists(metaPath)) {
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(metaPath, conf))
      val msgType =
        try reader.getFooter.getFileMetaData.getSchema
        finally reader.close()
      val schema = new ParquetToSparkSchemaConverter(
        org.apache.spark.sql.internal.SQLConf.get).convert(msgType)
      spark.read.schema(schema).parquet(dir)
    } else spark.read.parquet(dir)
  }

  /** Fixture: a lineitem projection as the data file plus a `_metadata`
    * sidecar declaring a SUPERSET schema (one extra double column), so
    * the sidecar-preferred read is observably different from a plain
    * directory read. The sidecar is an empty parquet file carrying the
    * schema in its footer.
    */
  private def sidecarFixture(spark: SparkSession, dir: String): String = {
    val tmp = java.nio.file.Paths.get(TempDirs.create("sidecar"))
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .write.mode("overwrite").parquet(tmp.toString)
    val empty = tmp.resolve("_empty_tmp")
    spark.range(0).select(
        col("id").as("l_orderkey"),
        lit(0).as("l_linenumber"),
        lit(0.0d).as("l_quantity"),
        lit(0.0d).cast("double").as("sidecar_extra"))
      .write.parquet(empty.toString)
    val listing = java.nio.file.Files.list(empty)
    val part =
      try listing.filter(p =>
        p.getFileName.toString.endsWith(".parquet")).findFirst.get
      finally listing.close()
    java.nio.file.Files.move(part, tmp.resolve("_metadata"))
    java.nio.file.Files.walk(empty)
      .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(p => java.nio.file.Files.delete(p))
    tmp.toString
  }

  val queries: Map[String, Q] = Map(
    "scan_metadata_sidecar" -> ((s, dir) =>
      readParquetDir(s, sidecarFixture(s, dir))),

    // The scan-level face of schema evolution (the union-level face is
    // `union_schema_evolution`): a directory whose files were written
    // before and after a column was added, read with `mergeSchema` so
    // the union of the file schemas becomes the table schema and
    // old-file rows null-fill the new column. This is the opposite
    // semantics of the sidecar/first-file scan above — the reference
    // takes first-file (parquet2hdf5.cpp:205-218), a long-lived corpus
    // directory needs the merge.
    "scan_merge_schema" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val out = graft.io.TempDirs.create("mergeschema")
      val orders = graft.Tables.orders(s, dir)
      orders.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_custkey"))
        .write.mode("overwrite").parquet(s"$out/v=1")
      orders.filter(col("o_orderkey") % 2 =!= 0)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
        .write.mode("overwrite").parquet(s"$out/v=2")
      s.read.option("mergeSchema", "true").parquet(s"$out/v=1", s"$out/v=2")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    // the sidecar's extra column reads as NULL for every data row
    "scan_metadata_sidecar" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  CAST(NULL AS DOUBLE) AS sidecar_extra
        |FROM lineitem""".stripMargin,
    "scan_merge_schema" ->
      """SELECT o_orderkey, o_custkey,
        |  CASE WHEN o_orderkey % 2 = 0 THEN NULL ELSE o_orderpriority END
        |    AS o_orderpriority
        |FROM orders""".stripMargin
  )
}
