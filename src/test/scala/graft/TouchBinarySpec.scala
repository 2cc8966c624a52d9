package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files

import graft.io.TouchBinary
import graft.model.TouchModel
import graft.pipelines.TouchToParquet
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class TouchBinarySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark

  test("version sniffing matches the reference rules") {
    import TouchModel._
    assert(sniffVersion("6.0.0") == V3)
    assert(sniffVersion("5.4.1") == V3)
    assert(sniffVersion("5.0.0") == V2)
    assert(sniffVersion("4.99.0") == V2)
    assert(sniffVersion("4.98.0") == V1)
    assert(sniffVersion("b210b8b") == V1) // git hash
    assert(sniffVersion("1.0.0") == V1)
    assert(sniffVersion("5.") == V1)  // trailing empty component rejects
    assert(sniffVersion("5.x") == V1) // unparsable component rejects
  }

  test("fixture row counts: v1=82, v2=1104, v3=62") {
    assert(TouchBinary.readProjected(spark, TouchToParquet.fixturePath(1)).count() == 82)
    assert(TouchBinary.readProjected(spark, TouchToParquet.fixturePath(2)).count() == 1104)
    assert(TouchBinary.readProjected(spark, TouchToParquet.fixturePath(3)).count() == 62)
  }

  test("schema widths per version: 11 / 22 / 28 columns") {
    assert(TouchBinary.readProjected(spark, TouchToParquet.fixturePath(1)).columns.length == 11)
    assert(TouchBinary.readProjected(spark, TouchToParquet.fixturePath(2)).columns.length == 22)
    assert(TouchBinary.readProjected(spark, TouchToParquet.fixturePath(3)).columns.length == 28)
  }

  test("v1 decode golden-matches the reference's testCircuit.parquet") {
    val golden = spark.read
      .parquet(getClass.getResource("/testCircuit.parquet").getPath)
    val ours = TouchBinary.readProjected(spark, TouchToParquet.fixturePath(1))
      .drop("synapse_id")
    assert(ours.columns.toSeq == golden.columns.toSeq)
    // order-insensitive compare on full rows (unique enough for 82 rows)
    val g = golden.collect().map(_.toSeq.mkString("|")).sorted
    val o = ours.collect().map(_.toSeq.mkString("|")).sorted
    assert(o.toSeq == g.toSeq)
  }

  test("synapse ids: (gid << 24) + ordinal, contiguous from the shift") {
    import spark.implicits._
    val ds = TouchBinary.read(spark, TouchToParquet.fixturePath(2))
    val rows = ds.select($"synapse_id", $"source_node_id").collect()
    assert(rows.length == 1104)
    val gid = rows.head.getInt(1)
    assert(gid == 28) // single-neuron fixture, id 28 in touches.0
    val ids = rows.map(_.getLong(0)).sorted
    assert(ids.head == (gid.toLong << 24))
    assert(ids.last == (gid.toLong << 24) + 1103)
    assert(ids.distinct.length == 1104)
  }

  test("v2 unpacks branch-type nibbles into section types in [1,16]") {
    import spark.implicits._
    val df = TouchBinary.readProjected(spark, TouchToParquet.fixturePath(2))
    val types = df.select($"efferent_section_type".cast("int"), $"afferent_section_type".cast("int"))
      .collect().flatMap(r => Seq(r.getInt(0), r.getInt(1)))
    assert(types.forall(t => t >= 1 && t <= 16))
  }

  test("big-endian input decodes identically (reference would corrupt v2/v3)") {
    // Byte-swap the little-endian v2 fixture into a synthetic BE pair and
    // expect identical decoded values.
    def swapFile(src: String, dst: String, words32: Boolean): Unit = {
      val in = Files.readAllBytes(java.nio.file.Paths.get(src))
      val out = new Array[Byte](in.length)
      if (words32) {
        // data file: swap each aligned 32-bit word; the lone byte field
        // (branch_type @76 in each 80-byte record) must stay put, so swap
        // word-wise except the 76..79 word, which holds bytes — swap
        // whole-word is wrong there. Instead: per record, swap 19 words
        // then copy 76..79 verbatim.
        val rec = 80
        for (r <- 0 until in.length / rec; w <- 0 until rec / 4) {
          val base = r * rec + w * 4
          if (w == 19) {
            System.arraycopy(in, base, out, base, 4)
          } else {
            out(base) = in(base + 3); out(base + 1) = in(base + 2)
            out(base + 2) = in(base + 1); out(base + 3) = in(base)
          }
        }
      } else {
        // index file: header double(8) + long(8) + 16 ASCII bytes, then
        // (i32, u32, i64) records
        def rev(off: Int, len: Int): Unit =
          for (i <- 0 until len) out(off + i) = in(off + len - 1 - i)
        rev(0, 8); rev(8, 8)
        System.arraycopy(in, 16, out, 16, 16)
        var off = 32
        while (off + 16 <= in.length) {
          rev(off, 4); rev(off + 4, 4); rev(off + 8, 8); off += 16
        }
      }
      Files.write(java.nio.file.Paths.get(dst), out)
    }
    val dir = Files.createTempDirectory("be_touches").toString
    swapFile(TouchToParquet.fixturePath(2), s"$dir/touchesData.0", words32 = true)
    swapFile(TouchBinary.indexFileFor(TouchToParquet.fixturePath(2)), s"$dir/touches.0", words32 = false)
    val le = TouchBinary.readProjected(spark, TouchToParquet.fixturePath(2))
    val be = TouchBinary.readProjected(spark, s"$dir/touchesData.0")
    // string-compare: the data contains NaNs, and NaN != NaN under Seq equality
    val a = le.collect().map(_.toSeq.mkString("|")).sorted
    val b = be.collect().map(_.toSeq.mkString("|")).sorted
    assert(a.toSeq == b.toSeq)
  }

  test("touch2parquet end-to-end round trip preserves all values") {
    val out = Files.createTempDirectory("t2p_test").toString
    val result = TouchToParquet.convert(spark, TouchToParquet.fixturePath(3), out)
    val direct = TouchBinary.readProjected(spark, TouchToParquet.fixturePath(3))
    assert(result.count() == 62)
    // compare names+types; Spark reads parquet back nullable even though the
    // file's fields are REQUIRED (written from a non-nullable Dataset)
    assert(result.schema.map(f => (f.name, f.dataType)) ==
      direct.schema.map(f => (f.name, f.dataType)))
    val a = direct.collect().map(_.toSeq.mkString("|")).sorted
    val b = result.collect().map(_.toSeq.mkString("|")).sorted
    assert(a.toSeq == b.toSeq)
  }

  test("validation guards TRIP on malformed data (both scan paths)") {
    // craft a v1 pair: index declares one neuron; data holds one record
    // with pre_section = 0x8000 (> 0x7fff → endianness-damage guard,
    // parquet_writer.cpp:207-219)
    def writeFixture(dir: java.nio.file.Path, preSection: Int, offset: Long): String = {
      val idx = ByteBuffer.allocate(48).order(ByteOrder.LITTLE_ENDIAN)
      idx.putDouble(1.001).putLong(1)
      idx.put("1.0.0".getBytes("US-ASCII")); idx.position(32)
      idx.putInt(7).putInt(1).putLong(offset)
      Files.write(dir.resolve("touches.0"), idx.array())
      val rec = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
      rec.putInt(7).putInt(preSection).putInt(0)
      rec.putInt(8).putInt(1).putInt(0)
      rec.putInt(1).putFloat(1f).putFloat(0f).putFloat(0f)
      Files.write(dir.resolve("touchesData.0"), rec.array())
      dir.resolve("touchesData.0").toString
    }
    val bad = writeFixture(Files.createTempDirectory("badsec"), 0x8000, 0L)
    for (df <- Seq(TouchBinary.readProjected(spark, bad),
                   spark.read.format("touchbin").load(bad))) {
      val e = intercept[org.apache.spark.SparkException](df.collect())
      assert(e.getMessage.contains("Invalid pre_section") ||
        Option(e.getCause).exists(_.getMessage.contains("Invalid pre_section")), e.getMessage)
    }
    // 2^24-touches-per-gid overflow: a negative index offset makes
    // global_row − shift reach 2^24 with a single record
    val over = writeFixture(Files.createTempDirectory("overflow"), 3, -(1L << 24) * 40)
    for (df <- Seq(TouchBinary.readProjected(spark, over),
                   spark.read.format("touchbin").load(over))) {
      val e = intercept[org.apache.spark.SparkException](df.select("synapse_id").collect())
      assert(e.getMessage.contains("2^24") ||
        Option(e.getCause).exists(_.getMessage.contains("2^24")), e.getMessage)
    }
    // non-trip: the valid fixture decodes fine (exercised throughout)
  }

  test("converter stamps footer KV provenance that round-trips write+read") {
    val out = Files.createTempDirectory("t2p_meta").toString
    TouchToParquet.convert(spark, TouchToParquet.fixturePath(3), out)
    // Spark-level round trip
    val meta = graft.io.ParquetMeta.readMeta(spark, out)
    assert(meta.getString("touchdetector_version") == "6.0.0")
    assert(meta.getString("touch2parquet_version") == graft.BuildInfo.version)
    // raw footer: the KVs must be physically present in the parquet
    // file's key-value metadata (inside Spark's schema JSON entry)
    val part = Files.list(java.nio.file.Paths.get(out)).filter(p =>
      p.getFileName.toString.endsWith(".parquet")).findFirst.get
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(part.toString),
      spark.sparkContext.hadoopConfiguration)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val kv = reader.getFooter.getFileMetaData.getKeyValueMetaData
      val schemaJson = kv.get("org.apache.spark.sql.parquet.row.metadata")
      assert(schemaJson != null, s"footer KVs: $kv")
      assert(schemaJson.contains("touchdetector_version"))
      assert(schemaJson.contains("6.0.0"))
      assert(schemaJson.contains("touch2parquet_version"))
    } finally reader.close()
  }

  test("recordRangeFor clamps one-sided and out-of-domain bounds (no wrap)") {
    val idx = TouchBinary.TouchIndex(littleEndian = true, "1.0.0",
      graft.model.TouchModel.sniffVersion("1.0.0"), firstGid = 100,
      shifts = Array(0L, 10L, 20L), counts = Array(10L, 10L, 10L))
    // upper-bound-only: lo = Long.MinValue wrapped before the round-8 fix
    assert(idx.recordRangeFor(Long.MinValue, 101L) == Some((0L, 20L)))
    // lower-bound-only: hi = Long.MaxValue
    assert(idx.recordRangeFor(101L, Long.MaxValue) == Some((10L, 30L)))
    // fully out-of-domain on either side → provably empty
    assert(idx.recordRangeFor(Long.MinValue, 99L) == Some((0L, 0L)))
    assert(idx.recordRangeFor(103L, Long.MaxValue) == Some((0L, 0L)))
    // degenerate inverted interval
    assert(idx.recordRangeFor(Long.MaxValue, Long.MinValue) == Some((0L, 0L)))
  }

  test("recordRangesFor merges overlapping ranges from non-monotone offsets") {
    // gids 100..103 with NON-MONOTONE record offsets: gid 100 at records
    // [30,40), 101 at [0,10), 102 at [35,45), 103 at [10,20). Two gid
    // intervals whose record ranges OVERLAP must come back merged
    // disjoint — a duplicate split would emit duplicate rows (the
    // residual filter passes them twice).
    val idx = TouchBinary.TouchIndex(littleEndian = true, "1.0.0",
      graft.model.TouchModel.sniffVersion("1.0.0"), firstGid = 100,
      shifts = Array(30L, 0L, 35L, 10L), counts = Array(10L, 10L, 10L, 10L))
    // [100,100] → [30,40); [102,102] → [35,45): overlap at [35,40)
    assert(idx.recordRangesFor(Seq((100L, 100L), (102L, 102L))) ==
      Some(Seq((30L, 45L))))
    // touching record ranges merge into one contiguous range
    assert(idx.recordRangesFor(Seq((101L, 101L), (103L, 103L))) ==
      Some(Seq((0L, 20L))))
    // genuinely disjoint record ranges stay separate
    assert(idx.recordRangesFor(Seq((101L, 101L), (100L, 100L))) ==
      Some(Seq((0L, 10L), (30L, 40L))))
    // an empty interval contributes nothing
    assert(idx.recordRangesFor(Seq((100L, 100L), (500L, 600L))) ==
      Some(Seq((30L, 40L))))
    // all-empty → provably no records
    assert(idx.recordRangesFor(Seq((1L, 2L))) == Some(Seq.empty))
  }
}
