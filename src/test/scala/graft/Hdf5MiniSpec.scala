package graft

import graft.io.Hdf5Mini
import graft.io.Hdf5Mini._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/** Byte-level + round-trip specs for the minimal HDF5 container codec.
  * No independent HDF5 implementation exists in this offline environment
  * (audited: no libhdf5, no h5py, no jar), so the gate is (a) structural
  * asserts pinned DIRECTLY to the public HDF5 File Format Specification
  * constants — signature, superblock v0 field offsets, TREE/HEAP/SNOD
  * magics, symbol-table-entry layout — written against the spec text, not
  * against the writer, plus (b) writer→reader round-trips over the full
  * SONATA shape (reference: src/circuit/sonata_file.cpp:26-79), and (c)
  * strict-mode failure paths.
  */
class Hdf5MiniSpec extends AnyFunSuite {

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory("h5spec")
    d.toFile.deleteOnExit()
    d.resolve(name).toString
  }

  /** The SONATA edge-container shape the pipeline emits. */
  private def sonataTree: GroupSpec = {
    val library = GroupSpec("@library",
      datasets = Seq(DatasetSpec("label", FixedStr(8), Seq(3))))
    val props = GroupSpec("0",
      groups = Seq(library),
      datasets = Seq(DatasetSpec("weight", F64, Seq(4)),
                     DatasetSpec("label", I32, Seq(4))))
    def indexDir(name: String) = GroupSpec(name, datasets = Seq(
      DatasetSpec("node_id_to_ranges", U64, Seq(3, 2)),
      DatasetSpec("range_to_edge_id", U64, Seq(2, 2))))
    val indices = GroupSpec("indices",
      groups = Seq(indexDir("source_to_target"), indexDir("target_to_source")))
    val pop = GroupSpec("pop",
      groups = Seq(props, indices),
      datasets = Seq(
        DatasetSpec("source_node_id", I64, Seq(4),
          attrs = Seq("node_population" -> "nodes_src")),
        DatasetSpec("target_node_id", I64, Seq(4),
          attrs = Seq("node_population" -> "nodes_dst")),
        DatasetSpec("edge_type_id", I32, Seq(4))),
      attrs = Seq("parquet2hdf5_version" -> "graft-0.12"))
    GroupSpec("", groups = Seq(GroupSpec("edges", groups = Seq(pop))))
  }

  private def le(bytes: Array[Byte]): ByteBuffer =
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)

  private def fillLongs(path: String, r: DataRegion, xs: Array[Long]): Unit = {
    val bb = ByteBuffer.allocate(xs.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    xs.foreach(bb.putLong)
    Hdf5Mini.fill(path, r, 0L, bb.array())
  }
  private def fillInts(path: String, r: DataRegion, xs: Array[Int]): Unit = {
    val bb = ByteBuffer.allocate(xs.length * 4).order(ByteOrder.LITTLE_ENDIAN)
    xs.foreach(bb.putInt)
    Hdf5Mini.fill(path, r, 0L, bb.array())
  }
  private def fillDoubles(path: String, r: DataRegion, xs: Array[Double]): Unit = {
    val bb = ByteBuffer.allocate(xs.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    xs.foreach(bb.putDouble)
    Hdf5Mini.fill(path, r, 0L, bb.array())
  }
  private def fillStrs(path: String, r: DataRegion, w: Int, xs: Array[String]): Unit = {
    val bb = ByteBuffer.allocate(xs.length * w)
    xs.foreach { s =>
      val b = s.getBytes("US-ASCII")
      bb.put(java.util.Arrays.copyOf(b, w))
    }
    Hdf5Mini.fill(path, r, 0L, bb.array())
  }

  private def writeSonataFixture(path: String): Map[String, DataRegion] = {
    val regions = Hdf5Mini.write(path, sonataTree)
    fillLongs(path, regions("/edges/pop/source_node_id"), Array(0L, 0L, 1L, 2L))
    fillLongs(path, regions("/edges/pop/target_node_id"), Array(1L, 2L, 2L, 0L))
    fillInts(path, regions("/edges/pop/edge_type_id"), Array(7, 7, 8, 9))
    fillDoubles(path, regions("/edges/pop/0/weight"), Array(0.5, 1.25, -3.0, 42.0))
    fillInts(path, regions("/edges/pop/0/label"), Array(0, 2, 1, 0))
    fillStrs(path, regions("/edges/pop/0/@library/label"), 8,
      Array("alpha", "beta", "gamma"))
    fillLongs(path, regions("/edges/pop/indices/source_to_target/node_id_to_ranges"),
      Array(0L, 1L, 1L, 2L, 2L, 2L))
    fillLongs(path, regions("/edges/pop/indices/source_to_target/range_to_edge_id"),
      Array(0L, 2L, 2L, 4L))
    fillLongs(path, regions("/edges/pop/indices/target_to_source/node_id_to_ranges"),
      Array(0L, 1L, 1L, 2L, 2L, 2L))
    fillLongs(path, regions("/edges/pop/indices/target_to_source/range_to_edge_id"),
      Array(3L, 4L, 0L, 3L))
    regions
  }

  test("superblock v0 bytes match the public spec field-for-field") {
    val p = tmp("sb.h5")
    Hdf5Mini.write(p, sonataTree)
    val bytes = Files.readAllBytes(Paths.get(p))
    // format signature (spec §II): \x89 H D F \r \n \x1a \n
    assert(bytes.take(8).sameElements(
      Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1A, '\n')))
    assert(bytes(8) == 0, "superblock version 0")
    assert(bytes(9) == 0 && bytes(10) == 0, "free-space + root-STE versions 0")
    assert(bytes(13) == 8 && bytes(14) == 8, "offsets and lengths are 8 bytes")
    val bb = le(bytes)
    assert(bb.getShort(16) > 0, "group leaf node K > 0")
    assert(bb.getShort(18) > 0, "group internal node K > 0")
    assert(bb.getLong(24) == 0L, "base address 0")
    assert(bb.getLong(32) == -1L, "free-space address undefined")
    assert(bb.getLong(40) == bytes.length.toLong, "EOF address == file length")
    assert(bb.getLong(48) == -1L, "driver info undefined")
    // root symbol-table entry: name offset 0, cache type 1 with B-tree +
    // heap in scratch (spec §III.C)
    assert(bb.getLong(56) == 0L)
    val rootOh = bb.getLong(64)
    assert(rootOh == 96L, "root object header directly after the superblock")
    assert(bb.getInt(72) == 1, "root STE cache type 1")
    val btreeAddr = bb.getLong(80)
    val heapAddr = bb.getLong(88)
    assert(new String(bytes.slice(btreeAddr.toInt, btreeAddr.toInt + 4)) == "TREE")
    assert(new String(bytes.slice(heapAddr.toInt, heapAddr.toInt + 4)) == "HEAP")
  }

  test("group machinery magics and invariants hold at every level") {
    val p = tmp("magic.h5")
    val regions = writeSonataFixture(p)
    val bytes = Files.readAllBytes(Paths.get(p))
    val all = new String(bytes, "ISO-8859-1")
    // 8 groups in the tree (root, edges, pop, 0, @library, indices, ×2
    // directions) → 8 TREE + 8 HEAP + 8 SNOD blocks
    assert("TREE".r.findAllIn(all).size == 8)
    assert("HEAP".r.findAllIn(all).size == 8)
    assert("SNOD".r.findAllIn(all).size == 8)
    // every dataset data region is 8-aligned and inside the file
    regions.values.foreach { r =>
      assert(r.address % 8 == 0)
      assert(r.address + r.byteSize <= bytes.length)
    }
    // data regions are mutually disjoint
    val sorted = regions.values.toSeq.sortBy(_.address)
    sorted.sliding(2).foreach {
      case Seq(a, b) => assert(a.address + a.byteSize <= b.address)
      case _ =>
    }
  }

  test("round-trip: the full SONATA shape reads back value-exact") {
    val p = tmp("rt.h5")
    writeSonataFixture(p)
    val f = Hdf5Mini.read(p)
    assert(f.longs("/edges/pop/source_node_id").sameElements(Array(0L, 0L, 1L, 2L)))
    assert(f.longs("/edges/pop/target_node_id").sameElements(Array(1L, 2L, 2L, 0L)))
    assert(f.longs("/edges/pop/edge_type_id").sameElements(Array(7L, 7L, 8L, 9L)))
    assert(f.doubles("/edges/pop/0/weight").sameElements(Array(0.5, 1.25, -3.0, 42.0)))
    assert(f.longs("/edges/pop/0/label").sameElements(Array(0L, 2L, 1L, 0L)))
    assert(f.strings("/edges/pop/0/@library/label")
      .sameElements(Array("alpha", "beta", "gamma")))
    assert(f.longs("/edges/pop/indices/source_to_target/node_id_to_ranges")
      .sameElements(Array(0L, 1L, 1L, 2L, 2L, 2L)))
    assert(f.longs("/edges/pop/indices/target_to_source/range_to_edge_id")
      .sameElements(Array(3L, 4L, 0L, 3L)))
    // dims, dtypes, attributes survive
    val src = f.datasets("/edges/pop/source_node_id")
    assert(src.dims == Seq(4L) && src.dtype == I64)
    assert(src.attrs == Map("node_population" -> "nodes_src"))
    val idx = f.datasets("/edges/pop/indices/source_to_target/node_id_to_ranges")
    assert(idx.dims == Seq(3L, 2L) && idx.dtype == U64)
    assert(f.groupAttrs("/edges/pop") == Map("parquet2hdf5_version" -> "graft-0.12"))
    assert(f.groupAttrs("/") == Map.empty)
  }

  test("unfilled regions read as zeros (fill-value semantics)") {
    val p = tmp("zero.h5")
    Hdf5Mini.write(p, sonataTree)
    val f = Hdf5Mini.read(p)
    assert(f.longs("/edges/pop/source_node_id").forall(_ == 0L))
    assert(f.doubles("/edges/pop/0/weight").forall(_ == 0.0))
  }

  test("concurrent disjoint-slice fills (the executor pwrite model) land exactly") {
    val p = tmp("par.h5")
    val regions = Hdf5Mini.write(p, GroupSpec("",
      datasets = Seq(DatasetSpec("x", I64, Seq(1000)))))
    val r = regions("/x")
    val slices = (0 until 10).map(i => (i * 100L, (i * 100 until (i + 1) * 100).map(_.toLong)))
    import scala.concurrent.{Await, Future, ExecutionContext}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    Await.result(Future.sequence(slices.map { case (off, xs) => Future {
      val bb = ByteBuffer.allocate(xs.length * 8).order(ByteOrder.LITTLE_ENDIAN)
      xs.foreach(bb.putLong)
      Hdf5Mini.fill(p, r, off, bb.array())
    }}), Duration.Inf)
    val f = Hdf5Mini.read(p)
    assert(f.longs("/x").sameElements(Array.tabulate(1000)(_.toLong)))
  }

  test("strict failure paths: oversize group, overrun fill, bad signature") {
    // round 13 lifted the single-SNOD 64-member cap to the level-0
    // B-tree bound of 32 SNODs x 64 symbols = 2048 (Hdf5PropertySpec
    // fuzzes 65/129/300); past THAT is still a loud error
    val wide = GroupSpec("", datasets =
      (1 to 2049).map(i => DatasetSpec(f"d$i%04d", I64, Seq(1))))
    val e1 = intercept[IllegalArgumentException](Hdf5Mini.write(tmp("wide.h5"), wide))
    assert(e1.getMessage.contains("2049 members"))
    val p = tmp("over.h5")
    val r = Hdf5Mini.write(p, GroupSpec("",
      datasets = Seq(DatasetSpec("x", I64, Seq(2)))))("/x")
    intercept[IllegalArgumentException](Hdf5Mini.fill(p, r, 1L, new Array[Byte](16)))
    val bad = tmp("bad.h5")
    Files.write(Paths.get(bad), Array.fill[Byte](200)(0x42))
    intercept[IllegalArgumentException](Hdf5Mini.read(bad))
  }

  test("member names are stored sorted (the classic-group B-tree contract)") {
    val p = tmp("sorted.h5")
    // declaration order deliberately unsorted; @library (0x40) < "0"? no:
    // '0' = 0x30 < '@' = 0x40 — byte order, not alphabetical intuition
    Hdf5Mini.write(p, GroupSpec("",
      datasets = Seq(DatasetSpec("zeta", I64, Seq(1)),
                     DatasetSpec("@lib", I64, Seq(1)),
                     DatasetSpec("0", I64, Seq(1)),
                     DatasetSpec("alpha", I64, Seq(1)))))
    val f = Hdf5Mini.read(p)
    assert(f.datasets.keySet == Set("/zeta", "/@lib", "/0", "/alpha"))
    // reader walks the SNOD in stored order; LinkedHashMap preserves it
    assert(f.datasets.keys.toSeq == Seq("/0", "/@lib", "/alpha", "/zeta"))
  }
}
