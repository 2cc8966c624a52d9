package graft.model

/** Touch data model — the versioned record schema of TouchDetector binary
  * output, re-expressed as one flat case class (Spark `Dataset[Touch]`)
  * plus per-version column projections.
  *
  * Reference layout: struct inheritance v1 ⊂ v2 ⊂ v3
  * (src/touches/touch_defs.h:19-92); raw record widths incl. C padding are
  * 40 / 80 / 104 bytes. Output column names follow the writer schema at
  * src/touches/parquet_writer.cpp:21-102 (pre/post → efferent/afferent
  * rename, float[3] arrays flattened, branch-type nibbles unpacked —
  * SURVEY.md §1.5.3-4).
  */
object TouchModel {

  sealed abstract class Version(val ordinal: Int, val recordSize: Int)
  case object V1 extends Version(1, 40)
  case object V2 extends Version(2, 80)
  case object V3 extends Version(3, 104)

  /** Version sniff from the index-file version string
    * (src/touches/touch_reader.cpp:95-117): `>=6` or `>=5.4` → V3,
    * `>=5` or `>=4.99` → V2, anything non-numeric (git hashes) → V1.
    * Mimics C++ `std::stoi` (parses a leading integer, throws only if none).
    */
  def sniffVersion(versionString: String): Version = {
    val clean = versionString.takeWhile(_ != '\u0000')
    def stoi(s: String): Option[Int] = {
      val m = "^[+-]?\\d+".r.findFirstIn(s.trim)
      m.map(_.toInt)
    }
    // -1 keeps trailing empty components: "5." must yield ["5", ""] so
    // the empty component rejects the string to V1 exactly like the
    // reference's throwing stoi on its trailing empty range
    val parts = clean.split("\\.", -1).toSeq.map(stoi)
    // the reference materializes every stoi BEFORE comparing, so one
    // unparsable component (e.g. "5.x") rejects the WHOLE string → V1
    // (touch_reader.cpp:99-116's catch-all) — not just the parsed prefix
    if (parts.isEmpty || parts.exists(_.isEmpty)) V1
    else {
      val vs = parts.map(_.get)
      if (vs(0) >= 6 || (vs.size >= 2 && vs(0) >= 5 && vs(1) >= 4)) V3
      else if (vs(0) >= 5 || (vs.size >= 2 && vs(0) >= 4 && vs(1) >= 99)) V2
      else V1
    }
  }

  /** Fully decoded touch row (v3 superset; v1/v2 reads leave the defaults
    * from touch_defs.h:36-40 — spine_length = -1, branch_type = 255 i.e.
    * section types 16/16 after unpack — but those columns are projected
    * away for v1 anyway).
    */
  final case class Touch(
      synapse_id: Long,
      source_node_id: Int,
      target_node_id: Int,
      efferent_section_id: Short,
      efferent_segment_id: Short,
      afferent_section_id: Short,
      afferent_segment_id: Short,
      efferent_segment_offset: Float,
      afferent_segment_offset: Float,
      distance_soma: Float,
      branch_order: Byte,
      efferent_section_pos: Float,
      afferent_section_pos: Float,
      efferent_surface_x: Float,
      efferent_surface_y: Float,
      efferent_surface_z: Float,
      afferent_center_x: Float,
      afferent_center_y: Float,
      afferent_center_z: Float,
      spine_length: Float,
      efferent_section_type: Byte,
      afferent_section_type: Byte,
      efferent_center_x: Float,
      efferent_center_y: Float,
      efferent_center_z: Float,
      afferent_surface_x: Float,
      afferent_surface_y: Float,
      afferent_surface_z: Float)

  val v1Columns: Seq[String] = Seq(
    "synapse_id", "source_node_id", "target_node_id",
    "efferent_section_id", "efferent_segment_id",
    "afferent_section_id", "afferent_segment_id",
    "efferent_segment_offset", "afferent_segment_offset",
    "distance_soma", "branch_order")

  val v2Columns: Seq[String] = v1Columns ++ Seq(
    "efferent_section_pos", "afferent_section_pos",
    "efferent_surface_x", "efferent_surface_y", "efferent_surface_z",
    "afferent_center_x", "afferent_center_y", "afferent_center_z",
    "spine_length", "efferent_section_type", "afferent_section_type")

  val v3Columns: Seq[String] = v2Columns ++ Seq(
    "efferent_center_x", "efferent_center_y", "efferent_center_z",
    "afferent_surface_x", "afferent_surface_y", "afferent_surface_z")

  def columnsFor(v: Version): Seq[String] = v match {
    case V1 => v1Columns
    case V2 => v2Columns
    case V3 => v3Columns
  }
}
