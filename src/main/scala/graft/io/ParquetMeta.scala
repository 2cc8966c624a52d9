package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{Metadata, MetadataBuilder}

/** File-level KV metadata on parquet sinks — the reference stamps its
  * converter provenance into the parquet footer
  * (`touchdetector_version` / `touch2parquet_version`,
  * src/touches/parquet_writer.cpp:115-120).
  *
  * Spark's parquet writer owns the footer, and its one file-level KV
  * entry is the schema JSON (`org.apache.spark.sql.parquet.row.
  * metadata`), which embeds per-field `Metadata`. So the KV pairs ride
  * as a nested metadata map on the FIRST schema field under the
  * `graft.file_meta` key: they land physically in every footer, survive
  * a write→read round trip through any Spark reader, and stay invisible
  * to value-level comparison.
  */
object ParquetMeta {

  val MetaKey = "graft.file_meta"

  /** Write `df` with the given footer KV pairs (merged into the first
    * field's existing metadata) and any parquet writer options.
    */
  def writeWithMeta(df: DataFrame, path: String, kv: Map[String, String],
                    options: Map[String, String] = Map.empty): Unit = {
    require(df.columns.nonEmpty, "cannot stamp metadata on a zero-column frame")
    val inner = kv.foldLeft(new MetadataBuilder()) {
      case (b, (k, v)) => b.putString(k, v)
    }.build()
    val first = df.columns.head
    val merged = new MetadataBuilder()
      .withMetadata(df.schema.head.metadata)
      .putMetadata(MetaKey, inner)
      .build()
    df.withMetadata(first, merged)
      .write.mode("overwrite").options(options).parquet(path)
  }

  /** The file-meta map read back from a parquet sink (empty metadata if
    * the sink carries none).
    */
  def readMeta(spark: SparkSession, path: String): Metadata = {
    val withMeta = spark.read.parquet(path).schema.fields
      .find(_.metadata.contains(MetaKey))
    withMeta.map(_.metadata.getMetadata(MetaKey)).getOrElse(Metadata.empty)
  }
}
