package graft

import graft.io.Hdf5Mini
import graft.io.Hdf5Mini.{DatasetSpec, GroupSpec}

/** Generator for the committed golden HDF5 byte fixture
  * (`src/test/resources/golden_sonata.h5`) that
  * [[Hdf5ConformanceSpec]] validates with the INDEPENDENT spec-derived
  * checker (`tools/h5check.py`). Deterministic by construction: fixed
  * tree, fixed data, no timestamps — regenerating must reproduce the
  * committed bytes exactly (the conformance spec asserts this, pinning
  * the writer's byte layout against silent drift).
  *
  * Shape mirrors a miniature SONATA edge container (reference:
  * src/circuit/sonata_file.cpp:26-79) and exercises every dtype the
  * codec supports: all integer widths both signednesses, both floats,
  * fixed strings, group + dataset attributes, a 2-D index dataset, and
  * an empty-dims edge case.
  */
object MakeGoldenH5 {
  def build(path: String): Unit = {
    val tree = GroupSpec("", groups = Seq(GroupSpec("edges", groups = Seq(
      GroupSpec("pop",
        groups = Seq(
          GroupSpec("0",
            datasets = Seq(
              DatasetSpec("dist", Hdf5Mini.F32, Seq(6L)),
              DatasetSpec("weight", Hdf5Mini.F64, Seq(6L)),
              DatasetSpec("kind_code", Hdf5Mini.I8, Seq(6L)),
              DatasetSpec("delay_steps", Hdf5Mini.I16, Seq(6L)),
              DatasetSpec("seg", Hdf5Mini.I32, Seq(6L)),
              DatasetSpec("stamp", Hdf5Mini.I64, Seq(6L)),
              DatasetSpec("flags", Hdf5Mini.U8, Seq(6L)),
              DatasetSpec("bucket", Hdf5Mini.U16, Seq(6L)),
              DatasetSpec("crc", Hdf5Mini.U32, Seq(6L))),
            groups = Seq(GroupSpec("@library", datasets = Seq(
              DatasetSpec("kind", Hdf5Mini.FixedStr(6), Seq(3L)))))),
          GroupSpec("indices", groups = Seq(
            GroupSpec("source_to_target", datasets = Seq(
              DatasetSpec("node_id_to_ranges", Hdf5Mini.U64, Seq(3L, 2L)),
              DatasetSpec("range_to_edge_id", Hdf5Mini.U64, Seq(4L, 2L))))))),
        datasets = Seq(
          DatasetSpec("source_node_id", Hdf5Mini.I64, Seq(6L),
            attrs = Seq("node_population" -> "nodes_A")),
          DatasetSpec("target_node_id", Hdf5Mini.I64, Seq(6L),
            attrs = Seq("node_population" -> "nodes_B")),
          DatasetSpec("edge_type_id", Hdf5Mini.I32, Seq(6L)),
          DatasetSpec("empty_marker", Hdf5Mini.I32, Seq(0L))),
        attrs = Seq("parquet2hdf5_version" -> "graft-golden-1",
          "source_population_name" -> "nodes_A",
          "target_population_name" -> "nodes_B"))))))
    val regions = Hdf5Mini.write(path, tree)

    def le(n: Int)(put: java.nio.ByteBuffer => Unit): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(n).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      put(bb); bb.array()
    }
    val base = "/edges/pop"
    Hdf5Mini.fill(path, regions(s"$base/source_node_id"), 0,
      le(48)(bb => Seq(0L, 0L, 1L, 1L, 2L, 2L).foreach(bb.putLong)))
    Hdf5Mini.fill(path, regions(s"$base/target_node_id"), 0,
      le(48)(bb => Seq(1L, 2L, 0L, 2L, 0L, 1L).foreach(bb.putLong)))
    Hdf5Mini.fill(path, regions(s"$base/edge_type_id"), 0,
      le(24)(bb => Seq(10, 11, 10, 12, 11, 10).foreach(bb.putInt)))
    Hdf5Mini.fill(path, regions(s"$base/0/dist"), 0,
      le(24)(bb => Seq(0.5f, 1.5f, 2.5f, 3.5f, 4.5f, 5.5f).foreach(bb.putFloat)))
    Hdf5Mini.fill(path, regions(s"$base/0/weight"), 0,
      le(48)(bb => Seq(0.25, 1.25, 2.25, 3.25, 4.25, 5.25).foreach(bb.putDouble)))
    Hdf5Mini.fill(path, regions(s"$base/0/kind_code"), 0,
      Array[Byte](0, 1, 2, 0, 1, 2))
    Hdf5Mini.fill(path, regions(s"$base/0/delay_steps"), 0,
      le(12)(bb => Seq(100, 200, 300, 400, 500, 600).foreach(s => bb.putShort(s.toShort))))
    Hdf5Mini.fill(path, regions(s"$base/0/seg"), 0,
      le(24)(bb => Seq(7, 8, 9, 10, 11, 12).foreach(bb.putInt)))
    Hdf5Mini.fill(path, regions(s"$base/0/stamp"), 0,
      le(48)(bb => Seq(1000L, 2000L, 3000L, 4000L, 5000L, 6000L).foreach(bb.putLong)))
    Hdf5Mini.fill(path, regions(s"$base/0/flags"), 0,
      Array[Byte](0, 1, 127, -128, -1, 64)) // u8 values 0,1,127,128,255,64
    Hdf5Mini.fill(path, regions(s"$base/0/bucket"), 0,
      le(12)(bb => Seq(0, 1, 32767, 32768, 65535, 42).foreach(v => bb.putShort(v.toShort))))
    Hdf5Mini.fill(path, regions(s"$base/0/crc"), 0,
      le(24)(bb => Seq(0L, 1L, 2147483647L, 2147483648L, 4294967295L, 99L)
        .foreach(v => bb.putInt(v.toInt))))
    val lib = regions(s"$base/0/@library/kind")
    val libBytes = new Array[Byte](3 * 6)
    Seq("axonal", "dend", "soma").zipWithIndex.foreach { case (s, i) =>
      val b = s.getBytes("US-ASCII"); System.arraycopy(b, 0, libBytes, i * 6, b.length)
    }
    Hdf5Mini.fill(path, lib, 0, libBytes)
    Hdf5Mini.fill(path, regions(s"$base/indices/source_to_target/node_id_to_ranges"), 0,
      le(48)(bb => Seq(0L, 1L, 1L, 3L, 3L, 4L).foreach(bb.putLong)))
    Hdf5Mini.fill(path, regions(s"$base/indices/source_to_target/range_to_edge_id"), 0,
      le(64)(bb => Seq(0L, 2L, 2L, 3L, 3L, 4L, 4L, 6L).foreach(bb.putLong)))
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("src/test/resources/golden_sonata.h5")
    build(out)
    println(s"wrote $out (${java.nio.file.Files.size(java.nio.file.Paths.get(out))} bytes)")
  }
}
