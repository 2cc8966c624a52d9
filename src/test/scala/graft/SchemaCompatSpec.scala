package graft

import graft.io.SchemaSidecar
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema-compatibility semantics carried over from the reference:
  * unsigned-type widening (sonata_writer.cpp:153-160) and `_metadata`
  * sidecar schema preference (parquet2hdf5.cpp:205-218).
  */
class SchemaCompatSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark

  test("unsigned parquet types widen to the reference's signed map") {
    // fixture written by DuckDB with genuine UINT_8/16/32/64 parquet
    // logical types (Spark itself cannot write unsigned parquet)
    val df = spark.read.parquet(getClass.getResource("/unsigned_types.parquet").getPath)
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    // the reference widens u8→i16, u16→i32, u32→i64, u64→decimal(20,0)
    // (sonata_writer.cpp:153-160); the engine's scan applies the same map
    assert(types("u8") == ShortType, types.toString)
    assert(types("u16") == IntegerType, types.toString)
    assert(types("u32") == LongType, types.toString)
    assert(types("u64") == DecimalType(20, 0), types.toString)
    // values survive the widening: max row is (199, 19900, 19900000, 199e10)
    val r = df.agg(max(col("u8")), max(col("u16")), max(col("u32")),
      max(col("u64")).cast("string")).collect()(0)
    assert(r.getShort(0) == 199 && r.getInt(1) == 19900 && r.getLong(2) == 19900000L)
    assert(r.getString(3) == "1990000000000")
  }

  test("_metadata sidecar schema is authoritative, not merely merged") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sidecar_unit")
    Seq((1L, "x"), (2L, "y")).toDF("k", "v").write.mode("overwrite").parquet(dir.toString)
    // sidecar declares (k, w double) — drops v, adds w. Spark's own
    // inference may UNION summary and data-file schemas; the reference
    // semantics are "the sidecar IS the schema" (parquet2hdf5.cpp:205-218)
    val empty = dir.resolve("_e")
    spark.range(0).select(col("id").as("k"), lit(0.0d).as("w"))
      .write.parquet(empty.toString)
    val part = java.nio.file.Files.list(empty).filter(p =>
      p.getFileName.toString.endsWith(".parquet")).findFirst.get
    java.nio.file.Files.move(part, dir.resolve("_metadata"))

    val preferred = SchemaSidecar.readParquetDir(spark, dir.toString)
    assert(preferred.columns.toSeq == Seq("k", "w"),
      "sidecar schema must be used verbatim — no union with data files")
    val rows = preferred.orderBy(col("k")).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(rows.forall(_.isNullAt(1)), "sidecar-only column must read as null")

    // no sidecar → plain read path
    java.nio.file.Files.delete(dir.resolve("_metadata"))
    assert(SchemaSidecar.readParquetDir(spark, dir.toString).columns.toSeq == Seq("k", "v"))
  }
}
