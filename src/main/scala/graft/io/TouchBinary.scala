package graft.io

import java.nio.{ByteBuffer, ByteOrder}

import graft.model.TouchModel
import graft.model.TouchModel._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** S1 `scan_touch_binary` + S2 `scan_touch_index` + W1 faithful synapse-id:
  * distributed decode of TouchDetector fixed-width binary files.
  *
  * Spark-first design: `sc.binaryRecords(path, recordSize)` splits the data
  * file into fixed-length records across executors (the reference's
  * ceil-div record partitioning, src/touch2parquet.cpp:110-115, for free);
  * `zipWithIndex` assigns the deterministic global row position (one extra
  * count-only job — the O5 idiom); the tiny index header is decoded once on
  * the driver and broadcast as the `shifts` array, exactly the reference's
  * replicated-lookup join (src/touches/touch_reader.cpp:119-144, 275-288).
  * At 100 TB: the scan is an embarrassingly parallel narrow stage — no
  * shuffle anywhere.
  *
  * Endianness: the index magic double 1.001 decides byte order
  * (touch_reader.cpp:14, 89). Unlike the reference — which swaps only the
  * first 10 words and silently corrupts big-endian v2/v3 floats
  * (touch_reader.cpp:261-273, SURVEY.md §1.5.5) — we decode every field
  * through a `ByteBuffer` carrying the detected order, so all versions are
  * correct under either endianness.
  */
object TouchBinary {

  private val ArchitectureIdentifier = 1.001

  final case class TouchIndex(
      littleEndian: Boolean, // ByteOrder itself is not Serializable
      versionString: String,
      version: Version,
      firstGid: Int,
      shifts: Array[Long],
      /** Per-gid record counts (parallel to `shifts`), from the index's
        * (id, count, offset) entries — 0 for gids absent from the index.
        */
      counts: Array[Long] = Array.empty,
      /** True when the header declared more neurons than the file holds
        * (the short-read zero-pad case): the entries cannot be trusted
        * for record-range pruning, only for the shift lookup's defined
        * fallback.
        */
      truncated: Boolean = false) {
    /** First global row of `gid`'s contiguous block. For gids absent from
      * the index the reference indexes its shifts vector out of bounds
      * (undefined behavior, touch_reader.cpp:276 — the v1 fixture triggers
      * it); we define that case as shift 0.
      */
    def shiftOf(gid: Int): Long = {
      val pos = gid - firstGid
      if (pos >= 0 && pos < shifts.length) shifts(pos) else 0L
    }

    /** Record range [start, end) covering every indexed gid in
      * [lo, hi] — the Spark face of the reference's per-neuron
      * `seek(pos)` (touch_reader.cpp:196-228, offsets decoded at
      * :136-144). Bounds are min/max over PRESENT entries (count > 0),
      * so no monotonicity of offsets across gids is assumed; `None`
      * means "cannot prune" (truncated or empty index), `Some((0, 0))`
      * means provably no records. Like the reference's seek, pruning
      * trusts the index to describe the data file — callers keep the
      * gid predicate as a post-scan residual, so a lying index can only
      * lose rows the reference would also mis-seek, never emit wrong
      * ones.
      */
    def recordRangeFor(lo: Long, hi: Long): Option[(Long, Long)] = {
      if (truncated || shifts.isEmpty || counts.length != shifts.length) return None
      var start = Long.MaxValue
      var end = 0L
      // clamp both bounds into the index's gid domain BEFORE subtracting
      // firstGid: lo is Long.MinValue for upper-bound-only predicates
      // (hi Long.MaxValue for lower-bound-only), where the raw
      // subtraction wraps and `.toInt` truncates to a bogus index
      val loC = math.min(math.max(lo, firstGid.toLong), firstGid.toLong + shifts.length)
      val hiC = math.min(math.max(hi, firstGid.toLong - 1), firstGid.toLong + shifts.length - 1)
      var pos = (loC - firstGid).toInt
      val maxPos = (hiC - firstGid).toInt
      while (pos <= maxPos) {
        if (counts(pos) > 0) {
          start = math.min(start, shifts(pos))
          end = math.max(end, shifts(pos) + counts(pos))
        }
        pos += 1
      }
      if (start == Long.MaxValue) Some((0L, 0L)) else Some((start, end))
    }

    /** Record ranges for a UNION of gid intervals — one range per
      * interval via [[recordRangeFor]], then sorted and merged so the
      * planner never emits overlapping splits (offsets need not be
      * monotone across gids, so two gid intervals CAN map to
      * overlapping record ranges; a duplicate split would duplicate
      * rows because the residual filter passes them twice). This is
      * the multi-neuron face of the reference's per-neuron `seek(pos)`
      * loop (touch_reader.cpp:196-228): scattered gids prune to their
      * own blocks instead of one [min,max] hull. `None` = cannot
      * prune; `Some(Nil)` = provably no records.
      */
    def recordRangesFor(intervals: Seq[(Long, Long)]): Option[Seq[(Long, Long)]] = {
      if (truncated || shifts.isEmpty || counts.length != shifts.length) return None
      val raw = intervals.flatMap { case (lo, hi) => recordRangeFor(lo, hi) }
        .filter { case (s, e) => e > s }
        .sortBy(_._1)
      val merged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      raw.foreach { case (s, e) =>
        if (merged.nonEmpty && s <= merged.last._2) {
          val (ps, pe) = merged.remove(merged.length - 1)
          merged += ((ps, math.max(pe, e)))
        } else merged += ((s, e))
      }
      Some(merged.toSeq)
    }
  }

  /** Index filename = data filename with the last "Data" removed
    * (touch_reader.cpp:80-84): `touchesData.0` → `touches.0`.
    */
  def indexFileFor(dataFile: String): String = {
    val idx = dataFile.lastIndexOf("Data")
    require(idx >= 0, s"Cannot determine index for file $dataFile")
    dataFile.substring(0, idx) + dataFile.substring(idx + 4)
  }

  /** Whole-file read through the Hadoop FileSystem API (session conf
    * when a session is active), so index decoding works on any
    * Hadoop-supported store, not just local paths. Index files are
    * 32 B + 16 B/neuron — always driver-sized.
    */
  private def readAllBytesFs(path: String): Array[Byte] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val conf = SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    val fs = p.getFileSystem(conf)
    val len = fs.getFileStatus(p).getLen
    require(len <= Int.MaxValue, s"$path: implausibly large touch index ($len bytes)")
    val bytes = new Array[Byte](len.toInt)
    val in = fs.open(p)
    try in.readFully(0, bytes, 0, bytes.length) finally in.close()
    bytes
  }

  /** Driver-side decode of the companion index file (header: magic double,
    * neuron count, 16-byte version string; then per-neuron
    * (id:i32, count:u32, offset:i64) records). Replicates the reference's
    * short-read semantics — a header claiming more neurons than the file
    * holds yields zero records (the v1 fixture depends on this) — and its
    * duplicate-empty-entry skip rule (touch_reader.cpp:131-143).
    */
  def readIndex(indexPath: String): TouchIndex = {
    val bytes = readAllBytesFs(indexPath)
    val le = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val order =
      if (le.getDouble(0) == ArchitectureIdentifier) ByteOrder.LITTLE_ENDIAN
      else {
        val be = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
        require(be.getDouble(0) == ArchitectureIdentifier,
          s"$indexPath: bad architecture identifier (not 1.001 in either byte order)")
        ByteOrder.BIG_ENDIAN
      }
    val buf = ByteBuffer.wrap(bytes).order(order)
    val nNeurons = buf.getLong(8)
    val vsBytes = new Array[Byte](16)
    buf.position(16); buf.get(vsBytes)
    val versionString = new String(vsBytes.takeWhile(_ != 0), "US-ASCII")
    val version = TouchModel.sniffVersion(versionString)

    // short read → missing trailing records are all-zero (C++ reads into a
    // zero-backed vector and ignores the stream failure)
    val avail = math.max(0L, (bytes.length - 32L) / 16L)
    val n = math.min(nNeurons, avail).toInt
    val zeroPad = nNeurons > avail
    case class Rec(id: Int, count: Long, offset: Long)
    val recs = (0 until n).map { i =>
      val base = 32 + i * 16
      Rec(buf.getInt(base), buf.getInt(base + 4).toLong & 0xffffffffL, buf.getLong(base + 8))
    } ++ (if (zeroPad) Seq(Rec(0, 0L, 0L)) else Seq.empty)

    if (recs.isEmpty) // header may legitimately declare zero neurons
      return TouchIndex(order == ByteOrder.LITTLE_ENDIAN, versionString, version, 0, Array.empty)
    val firstGid = recs.map(_.id).min
    val maxGid = recs.map(_.id).max
    val shifts = new Array[Long](maxGid - firstGid + 1)
    val counts = new Array[Long](maxGid - firstGid + 1)
    recs.foreach { r =>
      val pos = r.id - firstGid
      if (shifts(pos) > 0 && r.offset == 0 && r.count == 0) {
        // duplicate empty entry — keep the real one (touch_reader.cpp:136-139)
      } else {
        shifts(pos) = r.offset / version.recordSize
        counts(pos) = r.count
      }
    }
    TouchIndex(order == ByteOrder.LITTLE_ENDIAN, versionString, version, firstGid,
      shifts, counts, truncated = zeroPad)
  }

  /** Decode one raw record (without synapse id). Field offsets follow the
    * C struct layout (touch_defs.h:19-63; v2 pads to 80, v3 appends at 80).
    */
  private def decodeRecord(bytes: Array[Byte], order: ByteOrder, version: Int): Touch = {
    val b = ByteBuffer.wrap(bytes).order(order)
    val preNeuron = b.getInt(0); val preSection = b.getInt(4); val preSegment = b.getInt(8)
    val postNeuron = b.getInt(12); val postSection = b.getInt(16); val postSegment = b.getInt(20)
    val branch = b.getInt(24)
    val distanceSoma = b.getFloat(28); val preOffset = b.getFloat(32); val postOffset = b.getFloat(36)
    // hard guard from parquet_writer.cpp:207-219 (likely endianness damage)
    if (preSection > 0x7fff)
      throw new IllegalStateException(
        s"Invalid pre_section $preSection for gid $preNeuron — check endianness")
    var preSectionFraction = 0f; var postSectionFraction = 0f
    var px = 0f; var py = 0f; var pz = 0f; var qx = 0f; var qy = 0f; var qz = 0f
    var spineLength = -1f; var branchType = 255
    var pcx = 0f; var pcy = 0f; var pcz = 0f; var qsx = 0f; var qsy = 0f; var qsz = 0f
    if (version >= 2) {
      preSectionFraction = b.getFloat(40); postSectionFraction = b.getFloat(44)
      px = b.getFloat(48); py = b.getFloat(52); pz = b.getFloat(56)
      qx = b.getFloat(60); qy = b.getFloat(64); qz = b.getFloat(68)
      spineLength = b.getFloat(72)
      branchType = b.get(76).toInt & 0xff
    }
    if (version >= 3) {
      pcx = b.getFloat(80); pcy = b.getFloat(84); pcz = b.getFloat(88)
      qsx = b.getFloat(92); qsy = b.getFloat(96); qsz = b.getFloat(100)
    }
    Touch(
      synapse_id = 0L, // filled by caller
      source_node_id = preNeuron, target_node_id = postNeuron,
      efferent_section_id = preSection.toShort, efferent_segment_id = preSegment.toShort,
      afferent_section_id = postSection.toShort, afferent_segment_id = postSegment.toShort,
      efferent_segment_offset = preOffset, afferent_segment_offset = postOffset,
      distance_soma = distanceSoma, branch_order = branch.toByte,
      efferent_section_pos = preSectionFraction, afferent_section_pos = postSectionFraction,
      efferent_surface_x = px, efferent_surface_y = py, efferent_surface_z = pz,
      afferent_center_x = qx, afferent_center_y = qy, afferent_center_z = qz,
      spine_length = spineLength,
      // nibble unpack + MorphIO +1 soma offset (parquet_writer.h:63-69)
      efferent_section_type = (((branchType >> 4) & 0xf) + 1).toByte,
      afferent_section_type = ((branchType & 0xf) + 1).toByte,
      efferent_center_x = pcx, efferent_center_y = pcy, efferent_center_z = pcz,
      afferent_surface_x = qsx, afferent_surface_y = qsy, afferent_surface_z = qsz)
  }

  /** Distributed scan+decode of one touch data file into `Dataset[Touch]`
    * with faithful synapse ids:
    * `synapse_id = (gid << 24) + (global_row − shifts[gid])`, erroring past
    * 2^24 touches per gid (touch_reader.cpp:275-288).
    */
  def read(spark: SparkSession, dataPath: String): Dataset[Touch] = {
    import spark.implicits._
    val index = readIndex(indexFileFor(dataPath))
    val version = index.version
    val orderIsLE = index.littleEndian
    val bcast = spark.sparkContext.broadcast(index)
    val records = spark.sparkContext.binaryRecords(dataPath, version.recordSize)
    val vOrd = version.ordinal
    records.zipWithIndex.map { case (bytes, globalRow) =>
      val order = if (orderIsLE) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
      val t = decodeRecord(bytes, order, vOrd)
      val gid = t.source_node_id
      val k = globalRow - bcast.value.shiftOf(gid)
      if (k >= (1L << 24))
        throw new IllegalStateException(
          s"gid $gid has more than 2^24 touches, can't assign unique synapse indices")
      t.copy(synapse_id = (gid.toLong << 24) + k)
    }.toDS()
  }

  /** Version-appropriate projection (the DataFrame a user of the reference
    * would see for this file's schema version).
    */
  def readProjected(spark: SparkSession, dataPath: String): DataFrame = {
    val index = readIndex(indexFileFor(dataPath))
    val cols = TouchModel.columnsFor(index.version)
    read(spark, dataPath).toDF().select(cols.head, cols.tail: _*)
  }
}
