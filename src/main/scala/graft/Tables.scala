package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * All tables are plain parquet; Spark's vectorized reader gives
  * row-group-granular partitions and footer-stat pruning for free
  * (reference: multi-file scan at src/circuit/parquet_reader.cpp:60-130
  * re-expressed as `spark.read.parquet`).
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")

  /** `events.ts` has shipped as two different physical types across
    * driver testdata generations — TIMESTAMP(NANOS) (unrepresentable in
    * Spark's micros TimestampType; readable only as raw longs via
    * `nanosAsLong`) and plain `timestamp[us]` (read as TIMESTAMP_NTZ) —
    * so the loader adapts on the FILE schema and normalizes both to the
    * same surface: exact micros `ts_us` (what every operator keys on and
    * every oracle recomputes via DuckDB `epoch_us(ts)`), `ts_ns`
    * (micros-exact nanos for the legacy consumers), and a TimestampType
    * `ts` for window/streaming operators.
    *
    * `nanosAsLong` is deliberately session-global: it must still be set
    * when the lazy DataFrame EXECUTES, so it cannot be set-and-restored
    * around the `read` call. The NTZ branch is exact because every
    * session in this engine pins `spark.sql.session.timeZone=UTC`, making
    * the NTZ→LTZ cast the identity on the wall clock — the same
    * naive-as-UTC reading DuckDB's `epoch_us` uses.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = apply(spark, dir, "events")
    val normalized = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // legacy TIMESTAMP(NANOS)
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts_us", expr("ts_ns div 1000"))
          .withColumn("ts", timestamp_micros(col("ts_us")))
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType => // timestamp[us]
        raw.withColumn("ts_us",
            unix_micros(col("ts").cast(org.apache.spark.sql.types.TimestampType)))
          .withColumn("ts_ns", col("ts_us") * 1000)
          .withColumn("ts", timestamp_micros(col("ts_us")))
      case other => // fail loudly: a silent cast would yield nulls/wrong micros
        throw new IllegalArgumentException(
          s"events.ts: unsupported physical type $other — expected legacy " +
            "nanos LongType or timestamp[us] (NTZ/LTZ); update Tables.events " +
            "for the new testdata generation")
    }
    // one canonical column order regardless of which branch ran — the
    // branches otherwise place ts/ts_ns in generation-dependent slots
    val others = raw.columns.filterNot(_ == "ts")
    normalized.select((others ++ Seq("ts", "ts_us", "ts_ns")).map(col): _*)
  }
}
