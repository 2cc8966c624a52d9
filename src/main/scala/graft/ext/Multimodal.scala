package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and run decode / feature-extract
  * as partition-local batch functions over `Dataset[Blob]`.
  *
  * Since round 11 the decode path is REAL: [[graft.io.MediaCodec]] is a
  * pure-JVM encoder/decoder for BMP (24-bit BI_RGB, padded bottom-up BGR
  * rows), PPM (binary P6), and WAV (RIFF chunk walk, PCM-16). The
  * `multimodal_decode_*` / `multimodal_thumbnail_bmp` /
  * `multimodal_wav_frames` queries below synthesize genuine container
  * bytes per document, push them through the decoder, and emit
  * pixel/sample statistics whose oracle recomputes the SAME values from
  * the generating formula in SQL — a decoder bug (padding, BGR order,
  * chunk offsets) flips the hash. The byte-level helpers
  * (`byteFeatures`, `resizeStub`, `frameSampleStub`) remain for OPAQUE
  * payloads whose codec is unknown — that fallback is the only
  * non-decode path left.
  *
  * The batch shape is `mapPartitions` throughout, so codec init
  * amortizes per partition (the moral equivalent of `mapInPandas`
  * batches).
  *
  * At 100 TB: blobs dominate row size, so the layout matters — keep blobs
  * in their own column (parquet column pruning skips them for
  * metadata-only queries), size partitions by `maxPartitionBytes`, and
  * never groupBy/shuffle a blob column (all aggregates below key on ids).
  */
object Multimodal {

  final case class Blob(doc_id: Long, mime: String, payload: Array[Byte])
  final case class BlobFeatures(
      doc_id: Long, mime: String, byte_len: Int,
      first_byte: Int, last_byte: Int, byte_sum: Long, stub_channels: Int)

  /** Byte-level channel heuristic for OPAQUE payloads (no recognized
    * container magic). Recognized containers go through
    * [[graft.io.MediaCodec.sniff]] + the real decoders instead.
    */
  def decodeStub(payload: Array[Byte]): Int =
    if (payload.isEmpty) 0 else ((payload(0) & 0xff) % 3) + 1

  /** Partition-local feature extraction over blob batches. */
  def extractFeatures(blobs: Dataset[Blob]): Dataset[BlobFeatures] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      // per-partition init would open the codec once here
      it.map { b =>
        var sum = 0L
        var i = 0
        while (i < b.payload.length) { sum += b.payload(i) & 0xff; i += 1 }
        BlobFeatures(
          b.doc_id, b.mime, b.payload.length,
          if (b.payload.isEmpty) -1 else b.payload(0) & 0xff,
          if (b.payload.isEmpty) -1 else b.payload(b.payload.length - 1) & 0xff,
          sum, decodeStub(b.payload))
      }
    }
  }

  /** documents.text reinterpreted as a binary payload column (the testdata
    * carries no real media; the bytes are what they are — opaque).
    */
  def blobTable(spark: SparkSession, dir: String): Dataset[Blob] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), lit("text/plain").as("mime"),
        to_binary(col("text"), lit("utf-8")).as("payload"))
      .as[Blob]
  }

  final case class Thumb(doc_id: Long, thumb: Array[Byte])
  final case class FrameStats(doc_id: Long, n_frames: Int, frame_sums: Array[Long])

  /** STUB resize — stands in for image thumbnailing: deterministic strided
    * byte sampling down to `size` bytes (a real codec would decode +
    * bilinear-resample; partitioning/batching identical).
    */
  def resizeStub(blobs: Dataset[Blob], size: Int): Dataset[Thumb] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      it.map { b =>
        val n = b.payload.length
        val out = new Array[Byte](math.min(size, math.max(n, 0)))
        val stride = math.max(1, n / math.max(1, out.length))
        var i = 0
        while (i < out.length && i * stride < n) { out(i) = b.payload(i * stride); i += 1 }
        Thumb(b.doc_id, out)
      }
    }
  }

  /** STUB frame sampling — stands in for video keyframe extraction: split
    * the payload into `nFrames` chunks and checksum each (a real
    * implementation would demux + decode keyframes per chunk).
    */
  def frameSampleStub(blobs: Dataset[Blob], nFrames: Int): Dataset[FrameStats] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      it.map { b =>
        val n = b.payload.length
        val per = math.max(1, n / nFrames)
        val sums = (0 until nFrames).map { f =>
          var s = 0L
          var i = f * per
          val end = if (f == nFrames - 1) n else math.min(n, (f + 1) * per)
          while (i < end) { s += b.payload(i) & 0xff; i += 1 }
          s
        }.toArray
        FrameStats(b.doc_id, nFrames, sums)
      }
    }
  }

  // ------------------------------------------------------------------
  // Real-decode queries: synthesize a genuine container per document
  // (dims/amplitudes derived deterministically from doc_id/n_chars),
  // ENCODE it to real bytes, DECODE it back with MediaCodec, and emit
  // integer pixel/sample statistics. The oracle recomputes the same
  // stats from the generating formula — the encode→decode round trip
  // (headers, row padding, BGR order, bottom-up rows, chunk walk) is
  // what's under test. `pix_wsum = Σ i·pᵢ` is ORDER-SENSITIVE, so a
  // decoder that mangles row order or channel order fails the hash even
  // though the plain sum would survive.
  // ------------------------------------------------------------------

  final case class ImgStats(doc_id: Long, width: Int, height: Int,
      channels: Int, n_bytes: Int, pix_sum: Long, pix_min: Int,
      pix_max: Int, pix_wsum: Long)
  final case class WavStats(doc_id: Long, channels: Int, sample_rate: Int,
      n_samples: Int, amp_sum: Long, amp_min: Int, amp_max: Int,
      amp_wsum: Long)
  final case class ThumbStats(doc_id: Long, width: Int, height: Int,
      thumb_sum: Long, thumb_wsum: Long)
  final case class WavFrames(doc_id: Long, n_samples: Int,
      frame_sq_0: Long, frame_sq_1: Long, frame_sq_2: Long, frame_sq_3: Long)

  /** pixels[i] = (a + i) % 256 — position-dependent, so any reordering
    * by the codec is visible in the weighted checksum.
    */
  private def synthPixels(a: Int, n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) { out(i) = ((a + i) % 256).toByte; i += 1 }
    out
  }

  private def imgStats(docId: Long, img: graft.io.MediaCodec.ImagePixels): ImgStats = {
    var sum = 0L; var wsum = 0L; var mn = 255; var mx = 0
    var i = 0
    while (i < img.pixels.length) {
      val v = img.pixels(i) & 0xff
      sum += v; wsum += i.toLong * v
      if (v < mn) mn = v
      if (v > mx) mx = v
      i += 1
    }
    ImgStats(docId, img.width, img.height, img.channels, img.pixels.length,
      sum, mn, mx, wsum)
  }

  private def docDims(spark: SparkSession, dir: String): Dataset[(Long, Long)] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars").cast("long")).as[(Long, Long)]
  }

  /** documents → synthetic 24-bit BMP → decode → pixel stats. */
  def bmpRoundTrip(spark: SparkSession, dir: String): Dataset[ImgStats] = {
    import spark.implicits._
    docDims(spark, dir).mapPartitions(_.map { case (docId, nChars) =>
      val w = (1 + nChars % 17).toInt
      val h = (1 + nChars % 13).toInt
      val a = ((docId * 7) % 256).toInt
      val encoded = graft.io.MediaCodec.encodeBmp24(w, h, synthPixels(a, w * h * 3))
      imgStats(docId, graft.io.MediaCodec.decodeBmp(encoded))
    })
  }

  /** documents → synthetic P6 PPM → decode → pixel stats. */
  def ppmRoundTrip(spark: SparkSession, dir: String): Dataset[ImgStats] = {
    import spark.implicits._
    docDims(spark, dir).mapPartitions(_.map { case (docId, nChars) =>
      val w = (1 + nChars % 11).toInt
      val h = (1 + nChars % 7).toInt
      val a = ((docId * 13) % 256).toInt
      val encoded = graft.io.MediaCodec.encodePpmP6(w, h, synthPixels(a, w * h * 3))
      imgStats(docId, graft.io.MediaCodec.decodePpm(encoded))
    })
  }

  /** documents → synthetic PCM-16 WAV (mono/stereo alternating by
    * doc_id) → chunk-walk decode → amplitude stats.
    */
  def wavRoundTrip(spark: SparkSession, dir: String): Dataset[WavStats] = {
    import spark.implicits._
    docDims(spark, dir).mapPartitions(_.map { case (docId, nChars) =>
      val ch = (1 + docId % 2).toInt
      val n = ((64 + nChars % 50) * ch).toInt
      val a = ((docId * 11) % 256).toInt
      val samples = new Array[Short](n)
      var k = 0
      while (k < n) { samples(k) = (((a + 3 * k) % 256) - 128).toShort; k += 1 }
      val decoded = graft.io.MediaCodec.decodeWav(
        graft.io.MediaCodec.encodeWavPcm16(ch, 16000, samples))
      var sum = 0L; var wsum = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
      var i = 0
      while (i < decoded.samples.length) {
        val v = decoded.samples(i).toInt
        sum += v; wsum += i.toLong * v
        if (v < mn) mn = v
        if (v > mx) mx = v
        i += 1
      }
      WavStats(docId, decoded.channels, decoded.sampleRate,
        decoded.samples.length, sum, mn, mx, wsum)
    })
  }

  /** BMP round trip + real nearest-neighbour 8×8 thumbnail. */
  def bmpThumbnail(spark: SparkSession, dir: String): Dataset[ThumbStats] = {
    import spark.implicits._
    docDims(spark, dir).mapPartitions(_.map { case (docId, nChars) =>
      val w = (1 + nChars % 17).toInt
      val h = (1 + nChars % 13).toInt
      val a = ((docId * 7) % 256).toInt
      val encoded = graft.io.MediaCodec.encodeBmp24(w, h, synthPixels(a, w * h * 3))
      val thumb = graft.io.MediaCodec.resizeNearest(
        graft.io.MediaCodec.decodeBmp(encoded), 8, 8)
      var sum = 0L; var wsum = 0L
      var i = 0
      while (i < thumb.pixels.length) {
        val v = thumb.pixels(i) & 0xff
        sum += v; wsum += i.toLong * v
        i += 1
      }
      ThumbStats(docId, thumb.width, thumb.height, sum, wsum)
    })
  }

  /** Mono WAV round trip + 4-frame split with per-frame energy
    * (Σ amplitude², exact integers) — real frame sampling on DECODED
    * samples, the audio analogue of video keyframe statistics.
    */
  def wavFrameEnergy(spark: SparkSession, dir: String): Dataset[WavFrames] = {
    import spark.implicits._
    docDims(spark, dir).mapPartitions(_.map { case (docId, nChars) =>
      val n = (64 + nChars % 50).toInt
      val a = ((docId * 17) % 256).toInt
      val samples = new Array[Short](n)
      var k = 0
      while (k < n) { samples(k) = (((a + 3 * k) % 256) - 128).toShort; k += 1 }
      val dec = graft.io.MediaCodec.decodeWav(
        graft.io.MediaCodec.encodeWavPcm16(1, 16000, samples))
      val per = math.max(1, dec.samples.length / 4)
      val sq = new Array[Long](4)
      var f = 0
      while (f < 4) {
        var s = 0L
        var i = f * per
        val end = if (f == 3) dec.samples.length
                  else math.min(dec.samples.length, (f + 1) * per)
        while (i < end) { val v = dec.samples(i).toLong; s += v * v; i += 1 }
        sq(f) = s
        f += 1
      }
      WavFrames(docId, dec.samples.length, sq(0), sq(1), sq(2), sq(3))
    })
  }

  final case class ChannelStats(doc_id: Long, r_sum: Long, g_sum: Long,
      b_sum: Long, r_max: Int, g_max: Int, b_max: Int)

  /** BMP round trip + per-channel statistics — the channel split is
    * where a BGR/RGB order bug becomes visible even when the total sum
    * survives (the complement of the weighted checksum).
    */
  def bmpChannelStats(spark: SparkSession, dir: String): Dataset[ChannelStats] = {
    import spark.implicits._
    docDims(spark, dir).mapPartitions(_.map { case (docId, nChars) =>
      val w = (1 + nChars % 17).toInt
      val h = (1 + nChars % 13).toInt
      val a = ((docId * 7) % 256).toInt
      val img = graft.io.MediaCodec.decodeBmp(
        graft.io.MediaCodec.encodeBmp24(w, h, synthPixels(a, w * h * 3)))
      val sums = new Array[Long](3); val maxs = new Array[Int](3)
      var i = 0
      while (i < img.pixels.length) {
        val v = img.pixels(i) & 0xff; val c = i % 3
        sums(c) += v; if (v > maxs(c)) maxs(c) = v
        i += 1
      }
      ChannelStats(docId, sums(0), sums(1), sums(2), maxs(0), maxs(1), maxs(2))
    })
  }

  /** Exact dedup over the BINARY media column: md5 the encoded
    * container bytes, group identical payloads into families, emit the
    * family-size distribution. The synthesized image depends only on
    * (n_chars mod 17, n_chars mod 13, doc_id·7 mod 256), so distinct
    * documents genuinely collide into dup families; the oracle derives
    * the SAME distribution from that parameter triple — any encoder
    * nondeterminism (a stray timestamp, an uninitialized pad byte)
    * splits a family and flips the hash. The md5 itself never crosses
    * an engine boundary, so the check stays exact. 100 TB shape: one
    * map-side md5 projection + two keyed aggregates; payload bytes
    * never shuffle (only the 16-byte digest does).
    */
  def mediaDedupExact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // COARSE parameter space (5·3·16 = 240 classes) so genuine dup
    // families exist at every scale — a dedup query whose input has no
    // duplicates verifies nothing (the round-9 interval-overlap lesson)
    val hashed = docDims(spark, dir).mapPartitions(_.map { case (docId, nChars) =>
      val w = (1 + nChars % 5).toInt
      val h = (1 + nChars % 3).toInt
      val a = ((docId % 16) * 16).toInt
      val payload = graft.io.MediaCodec.encodeBmp24(w, h, synthPixels(a, w * h * 3))
      val md = java.security.MessageDigest.getInstance("MD5").digest(payload)
      (docId, md.map("%02x".format(_)).mkString)
    }).toDF("doc_id", "payload_md5")
    hashed.groupBy(col("payload_md5")).agg(count(lit(1)).as("family_size"))
      .groupBy(col("family_size")).agg(count(lit(1)).as("n_families"))
  }

  // ------------------------------------------------------------------
  // Image perceptual near-dup: average-hash (aHash) over decoded
  // thumbnails, banded like SimHash. The synth corpus has genuine
  // near-dup structure: images share a base class (coarse params) with
  // a small per-doc pixel perturbation, so same-class pairs land at
  // hamming 0-8 while cross-class hashes are pseudo-random (the pixel
  // formula multiplies by 131 mod 251 — a RAMP would give every image
  // the same half-set hash and explode the pair graph into n²).
  //
  // 100 TB shape: identical to dedup_simhash — per-doc decode is
  // map-side; only (doc_id, band, value) rows enter the bucket join;
  // candidates are collision-bounded; hamming verify reads four 16-bit
  // bands, never pixels.
  // ------------------------------------------------------------------

  /** Pixel generator for the aHash corpus. MULTIPLICATIVE in the class
    * parameter `a` — an additive formula (`a + noise(i)`) shifts every
    * pixel by the same constant, and aHash is SHIFT-INVARIANT (gray and
    * mean move together), so all 256 a-classes of a given (w,h)
    * collapsed into one hash bucket and the pair graph went quadratic
    * (measured: 5M pairs at 10× on the density-stable corpus).
    */
  private def ahashPixel(a: Int, tweak: Int, i: Int): Int = {
    val base = ((a + 3) * ((i * 131) % 251 + 1)) % 256
    if (i < 3 * tweak) 255 - base else base
  }

  /** 64-bit aHash as four 16-bit bands from a decoded 8×8 thumbnail:
    * gray(cell) = mean of RGB, bit = gray > mean-of-64.
    */
  private[graft] def ahashBands(img: graft.io.MediaCodec.ImagePixels): Array[Int] = {
    val t = graft.io.MediaCodec.resizeNearest(img, 8, 8)
    val grays = new Array[Int](64)
    var c = 0
    while (c < 64) {
      grays(c) = ((t.pixels(c * 3) & 0xff) + (t.pixels(c * 3 + 1) & 0xff) +
        (t.pixels(c * 3 + 2) & 0xff)) / 3
      c += 1
    }
    val mean = grays.sum / 64
    val bands = new Array[Int](4)
    c = 0
    while (c < 64) {
      if (grays(c) > mean) bands(c / 16) |= 1 << (c % 16)
      c += 1
    }
    bands
  }

  /** (doc_a, doc_b, hamming ≤ maxHamming) candidate pairs sharing a
    * 16-bit aHash band, verified on the four bands.
    *
    * Corpus construction is DENSITY-STABLE (the 10× probe caught the
    * first version measuring an artifact: a FIXED 360-class space made
    * family sizes grow linearly with the corpus and the pair graph
    * quadratically — 7M pairs at 10×, the exact trap the ScaleProbe
    * word-tagging note documents): the family count now scales with
    * the corpus (`nFam = max(240, n_docs/14)`), every image parameter
    * derives from the family id, and each family splits into 3 tweak
    * variants — so docs-per-family, and therefore pairs-per-doc, are
    * scale-invariant and the pair graph grows LINEARLY like a real
    * corpus's near-dup structure. The 1-row `count()` is the standard
    * bounded driver scalar.
    */
  def imageAhashPairs(spark: SparkSession, dir: String,
                      maxHamming: Int = 8): DataFrame = {
    import spark.implicits._
    val nFam = math.max(240L, Tables.documents(spark, dir).count() / 14)
    val hashed = docDims(spark, dir).mapPartitions(_.map { case (docId, _) =>
      val f = docId % nFam
      val w = (4 + f % 5).toInt
      val h = (4 + f % 3).toInt
      val a = ((f * 53) % 256).toInt
      val tweak = ((docId / nFam) % 3).toInt
      val px = new Array[Byte](w * h * 3)
      var i = 0
      while (i < px.length) { px(i) = ahashPixel(a, tweak, i).toByte; i += 1 }
      val img = graft.io.MediaCodec.decodeBmp(
        graft.io.MediaCodec.encodeBmp24(w, h, px))
      val b = ahashBands(img)
      (docId, b(0), b(1), b(2), b(3))
    }).toDF("doc_id", "b0", "b1", "b2", "b3")
      // released by the harness's per-query clearCache (the registry
      // contract; see the Rle.scala note) — read by the band explode
      // and both sides of the hamming verify
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = hashed.select(col("doc_id"),
      posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
        .as(Seq("band", "value")))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.value") === col("y.value") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(hashed.select(col("doc_id").as("doc_a"), col("b0").as("a0"),
        col("b1").as("a1"), col("b2").as("a2"), col("b3").as("a3")), "doc_a")
      .join(hashed.select(col("doc_id").as("doc_b"), col("b0").as("c0"),
        col("b1").as("c1"), col("b2").as("c2"), col("b3").as("c3")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (bit_count(col("a0").bitwiseXOR(col("c0"))) +
          bit_count(col("a1").bitwiseXOR(col("c1"))) +
          bit_count(col("a2").bitwiseXOR(col("c2"))) +
          bit_count(col("a3").bitwiseXOR(col("c3")))).cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  final case class SilenceRun(doc_id: Long, run_start: Int, run_end: Int)

  /** Silence-run detection over DECODED audio — the connectome RLE
    * (gaps-and-islands) reused on a media column: synth mono WAV whose
    * sample stream alternates silent blocks (amplitude 0) with loud
    * blocks (amplitude ≥ 100), decode, flag |s| < 50, collapse
    * consecutive silent samples into half-open runs. Per-doc window
    * keyed on doc_id — the exchange is doc-keyed, run state is O(1).
    */
  def wavSilenceRuns(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val samples = docDims(spark, dir).flatMap { case (docId, nChars) =>
      val n = (64 + nChars % 50).toInt
      val a = ((docId * 19) % 100).toInt
      val arr = new Array[Short](n)
      var k = 0
      while (k < n) {
        arr(k) = if ((k / 8) % 3 == 0) 0 else (100 + (a + 5 * k) % 100).toShort
        k += 1
      }
      val dec = graft.io.MediaCodec.decodeWav(
        graft.io.MediaCodec.encodeWavPcm16(1, 16000, arr))
      dec.samples.iterator.zipWithIndex.map { case (s, k2) => (docId, k2, s.toInt) }
    }.toDF("doc_id", "k", "amp")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("k"))
    samples.filter(abs(col("amp")) < 50)
      .withColumn("_island", col("k") - row_number().over(w))
      .groupBy(col("doc_id"), col("_island"))
      .agg(min(col("k")).as("run_start"), (max(col("k")) + 1).as("run_end"))
      .select(col("doc_id"), col("run_start").cast("int"),
        col("run_end").cast("int"))
  }

  /** BMP stats through a PARQUET BINARY-COLUMN round trip — the
    * storage leg of the media pipeline: encoded containers land in a
    * parquet `binary` column (their own column, so pruning skips them
    * for metadata-only reads), get read back, and only then decoded.
    * Registered under the IDENTICAL oracle as `multimodal_decode_bmp`
    * (the rle/sessionize side-by-side pattern): any byte the
    * parquet writer/reader mangles in a blob flips the same hash the
    * in-memory round trip pins.
    */
  def bmpParquetRoundTrip(spark: SparkSession, dir: String): Dataset[ImgStats] = {
    import spark.implicits._
    val out = graft.io.TempDirs.create("blobrt")
    docDims(spark, dir).mapPartitions(_.map { case (docId, nChars) =>
      val w = (1 + nChars % 17).toInt
      val h = (1 + nChars % 13).toInt
      val a = ((docId * 7) % 256).toInt
      (docId, graft.io.MediaCodec.encodeBmp24(w, h, synthPixels(a, w * h * 3)))
    }).toDF("doc_id", "payload")
      .write.mode("overwrite").parquet(s"$out/blobs")
    spark.read.parquet(s"$out/blobs")
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (docId, payload) =>
        imgStats(docId, graft.io.MediaCodec.decodeBmp(payload))
      })
  }

  /** WAV decimation resample (16 kHz → 8 kHz by dropping every other
    * frame) with a full re-encode: decode → decimate → encode at the
    * new rate → decode again → stats. The oracle keeps only even k of
    * the generating formula, so both the decimation arithmetic and the
    * second container round trip sit inside the hash gate.
    */
  def wavResample(spark: SparkSession, dir: String): Dataset[WavStats] = {
    import spark.implicits._
    docDims(spark, dir).mapPartitions(_.map { case (docId, nChars) =>
      val n = (64 + nChars % 50).toInt
      val a = ((docId * 11) % 256).toInt
      val samples = Array.tabulate[Short](n)(k => (((a + 3 * k) % 256) - 128).toShort)
      val src = graft.io.MediaCodec.decodeWav(
        graft.io.MediaCodec.encodeWavPcm16(1, 16000, samples))
      val half = Array.tabulate[Short]((src.samples.length + 1) / 2)(j =>
        src.samples(2 * j))
      val out = graft.io.MediaCodec.decodeWav(
        graft.io.MediaCodec.encodeWavPcm16(1, src.sampleRate / 2, half))
      var sum = 0L; var wsum = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
      var i = 0
      while (i < out.samples.length) {
        val v = out.samples(i).toInt
        sum += v; wsum += i.toLong * v
        if (v < mn) mn = v
        if (v > mx) mx = v
        i += 1
      }
      WavStats(docId, out.channels, out.sampleRate, out.samples.length,
        sum, mn, mx, wsum)
    })
  }

  /** Media shard packing — the training-data packer applied to BINARY
    * payloads: shards budgeted by BYTES (256 KiB) instead of tokens,
    * assignment by the same exclusive weighted prefix scan
    * ([[graft.ops.Offsets.globalWeightedPrefix]]) in md5 shuffle
    * order. Emits the per-shard manifest (doc count, byte total, fill
    * ppm). The weights are the encoders' EXACT container sizes, so the
    * oracle recomputes the whole packing analytically — and at 100 TB
    * the scan's only data-sized structure is the per-partition running
    * sum (the blobs themselves never shuffle; the manifest carries
    * ids + sizes).
    */
  def mediaPackShards(spark: SparkSession, dir: String,
                      budgetBytes: Long = 262144L): DataFrame = {
    import spark.implicits._
    val sized = docDims(spark, dir).mapPartitions(_.map { case (docId, nChars) =>
      val payload: Array[Byte] = (docId % 3) match {
        case 0 =>
          val w = (1 + nChars % 17).toInt; val h = (1 + nChars % 13).toInt
          graft.io.MediaCodec.encodeBmp24(w, h,
            synthPixels(((docId * 7) % 256).toInt, w * h * 3))
        case 1 =>
          val n = (64 + nChars % 50).toInt
          val a = ((docId * 11) % 256).toInt
          graft.io.MediaCodec.encodeWavPcm16(1, 16000,
            Array.tabulate[Short](n)(k => (((a + 3 * k) % 256) - 128).toShort))
        case _ => new Array[Byte](nChars.toInt)
      }
      (docId, payload.length.toLong)
    }).toDF("doc_id", "n_bytes")
    graft.ops.Offsets.globalWeightedPrefix(sized,
        Seq(md5(col("doc_id").cast("string")), col("doc_id")),
        "n_bytes", "cum_bytes")
      .withColumn("shard_id", expr(s"cum_bytes div $budgetBytes"))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_bytes")).as("bytes"))
      .select(col("shard_id"), col("n_docs"), col("bytes"),
        expr(s"bytes * 1000000 div $budgetBytes").as("fill_ppm"))
  }

  /** Image-feature similarity — the bridge from the media column into
    * the ANN stack: decoded 8×8 thumbnail grays projected through a
    * FIXED deterministic ±3 projection matrix (R(c,j) = ((c·131 +
    * j·37) mod 7) − 3 — the integer stand-in for a learned encoder;
    * swapping in real model features changes only this function) into
    * a 16-dim integer vector, then exact top-k by integer dot through
    * the same broadcast-queries + TopKPerKey shape as
    * `ann_bruteforce_topk`. The corpus never shuffles; the dot runs as
    * the codegen'd zip_with/aggregate HOF pair.
    */
  def imageEmbedTopK(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import spark.implicits._
    val feats = docDims(spark, dir).mapPartitions(_.map { case (docId, nChars) =>
      val w = (1 + nChars % 17).toInt
      val h = (1 + nChars % 13).toInt
      val a = ((docId * 7) % 256).toInt
      val img = graft.io.MediaCodec.decodeBmp(
        graft.io.MediaCodec.encodeBmp24(w, h, synthPixels(a, w * h * 3)))
      val t = graft.io.MediaCodec.resizeNearest(img, 8, 8)
      val grays = Array.tabulate(64)(c =>
        ((t.pixels(c * 3) & 0xff) + (t.pixels(c * 3 + 1) & 0xff) +
          (t.pixels(c * 3 + 2) & 0xff)) / 3)
      val feat = Array.tabulate(16) { j =>
        var s = 0L; var c = 0
        while (c < 64) { s += grays(c).toLong * (((c * 131 + j * 37) % 7) - 3); c += 1 }
        s
      }
      (docId, feat)
    }).toDF("doc_id", "feat")
      // queries and corpus both read it; released by the harness's
      // per-query clearCache (registry contract)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val q = broadcast(feats.filter(col("doc_id") < 10)
      .select(col("doc_id").as("q_id"), col("feat").as("q_feat")))
    val joined = q.join(
        feats.select(col("doc_id").as("c_id"), col("feat").as("c_feat")),
        col("q_id") =!= col("c_id"))
      .withColumn("dot_q", expr(
        "aggregate(zip_with(q_feat, c_feat, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"))
      .select(col("q_id"), col("c_id"), col("dot_q"))
    graft.plans.TopKPerKey.topKPerKey(joined, Seq("q_id"),
        Seq(("dot_q", true), ("c_id", false)), k)
      .select(col("q_id"), col("rank"), col("c_id"), col("dot_q"))
  }

  /** Decode-error quarantine — the robustness leg every production
    * media pipeline needs: a deterministic subset of payloads arrives
    * CORRUPTED (doc_id ≡ 0 mod 7 gets its magic bytes zeroed), the
    * strict decoder raises, and the pipeline routes the failure into a
    * quarantine verdict instead of killing the job. Emits one row per
    * document (status ∈ ok|quarantined + the recovered pixel sum, −1
    * for quarantined) — the oracle knows the corrupt set analytically,
    * so BOTH failure routing and the survivors' decode stay in the
    * hash gate. A decoder that "recovers" garbage from a corrupt
    * header (instead of raising) flips status AND sum.
    */
  def decodeQuarantine(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    docDims(spark, dir).mapPartitions(_.map { case (docId, nChars) =>
      val w = (1 + nChars % 17).toInt
      val h = (1 + nChars % 13).toInt
      val a = ((docId * 7) % 256).toInt
      val payload = graft.io.MediaCodec.encodeBmp24(w, h, synthPixels(a, w * h * 3))
      if (docId % 7 == 0) { payload(0) = 0; payload(1) = 0 } // corrupt magic
      try {
        val img = graft.io.MediaCodec.decodeBmp(payload)
        var sum = 0L; var i = 0
        while (i < img.pixels.length) { sum += img.pixels(i) & 0xff; i += 1 }
        (docId, "ok", sum)
      } catch {
        case _: IllegalArgumentException => (docId, "quarantined", -1L)
      }
    }).toDF("doc_id", "status", "pix_sum")
  }

  /** Mixed-corpus media catalog — the first query a lake of opaque
    * blobs answers: per DETECTED container type (magic-byte sniff, not
    * trusted metadata), document count and total payload bytes. The
    * synth corpus routes doc_id mod 3 → BMP / WAV / raw text, so the
    * sniffer's verdicts and the encoders' exact container sizes
    * (headers + row padding + chunk layout) are both under the oracle:
    * a padding miscount of ONE byte per row shifts total_bytes.
    */
  def mediaCatalog(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    docDims(spark, dir).mapPartitions(_.map { case (docId, nChars) =>
      val payload: Array[Byte] = (docId % 3) match {
        case 0 =>
          val w = (1 + nChars % 17).toInt; val h = (1 + nChars % 13).toInt
          graft.io.MediaCodec.encodeBmp24(w, h,
            synthPixels(((docId * 7) % 256).toInt, w * h * 3))
        case 1 =>
          val n = (64 + nChars % 50).toInt
          val a = ((docId * 11) % 256).toInt
          val samples = Array.tabulate[Short](n)(k => (((a + 3 * k) % 256) - 128).toShort)
          graft.io.MediaCodec.encodeWavPcm16(1, 16000, samples)
        case _ =>
          new Array[Byte](nChars.toInt) // opaque payload, no magic
      }
      val kind = graft.io.MediaCodec.sniff(payload).getOrElse("opaque")
      (docId, kind, payload.length.toLong)
    }).toDF("doc_id", "kind", "n_bytes")
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_bytes")).as("total_bytes"))
  }

  val queries: Map[String, Q] = Map(
    "multimodal_features" -> ((s, dir) =>
      extractFeatures(blobTable(s, dir)).toDF()),
    "multimodal_channel_stats" -> ((s, dir) => bmpChannelStats(s, dir).toDF()),
    "multimodal_dedup_exact" -> ((s, dir) => mediaDedupExact(s, dir)),
    "multimodal_image_ahash_pairs" -> ((s, dir) => imageAhashPairs(s, dir)),
    "multimodal_wav_silence_runs" -> ((s, dir) => wavSilenceRuns(s, dir)),
    "multimodal_catalog" -> ((s, dir) => mediaCatalog(s, dir)),
    "multimodal_blob_roundtrip" -> ((s, dir) => bmpParquetRoundTrip(s, dir).toDF()),
    "multimodal_wav_resample" -> ((s, dir) => wavResample(s, dir).toDF()),
    "multimodal_pack_shards" -> ((s, dir) => mediaPackShards(s, dir)),
    "multimodal_decode_quarantine" -> ((s, dir) => decodeQuarantine(s, dir)),
    "multimodal_image_embed_topk" -> ((s, dir) => imageEmbedTopK(s, dir)),
    "multimodal_decode_bmp" -> ((s, dir) => bmpRoundTrip(s, dir).toDF()),
    "multimodal_decode_ppm" -> ((s, dir) => ppmRoundTrip(s, dir).toDF()),
    "multimodal_decode_wav" -> ((s, dir) => wavRoundTrip(s, dir).toDF()),
    "multimodal_thumbnail_bmp" -> ((s, dir) => bmpThumbnail(s, dir).toDF()),
    "multimodal_wav_frames" -> ((s, dir) => wavFrameEnergy(s, dir).toDF()),
    // frame_sums projected to one scalar column per frame (nFrames is a
    // constant 4): the driver's pandas compare can't sort ndarray columns,
    // and scalar columns give it a full hash check instead of rows-only.
    "multimodal_frame_sample" -> ((s, dir) =>
      frameSampleStub(blobTable(s, dir), nFrames = 4).toDF()
        .select(Seq(col("doc_id"), col("n_frames")) ++
          (0 until 4).map(f => element_at(col("frame_sums"), f + 1).as(s"frame_sum_$f")): _*))
  )

  // Oracle (text is pure ASCII in the testdata, so char codepoints ==
  // byte values; verified before relying on it). The decode-round-trip
  // oracles recompute the generating formulas in SQL: the Spark side
  // went pixels → real container bytes → decoder → stats, so agreement
  // means the codec round-tripped every byte in order.
  /** Shared by `multimodal_decode_bmp` AND `multimodal_blob_roundtrip`
    * (identical semantics; only the physical route differs — in-memory
    * vs through a parquet binary column).
    */
  private val bmpStatsOracle: String =
    """WITH p AS (
      |  SELECT doc_id, 1 + (n_chars % 17) AS w, 1 + (n_chars % 13) AS h,
      |    (doc_id * 7) % 256 AS a
      |  FROM documents),
      |e AS (SELECT doc_id, w, h, w * h * 3 AS n, a FROM p),
      |s AS (SELECT doc_id, w, h, n, a,
      |  list_transform(generate_series(0, n - 1), i -> (a + i) % 256) AS px
      |  FROM e)
      |SELECT doc_id,
      |  CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
      |  CAST(3 AS INTEGER) AS channels, CAST(n AS INTEGER) AS n_bytes,
      |  CAST(list_sum(px) AS BIGINT) AS pix_sum,
      |  CAST(list_aggregate(px, 'min') AS INTEGER) AS pix_min,
      |  CAST(list_aggregate(px, 'max') AS INTEGER) AS pix_max,
      |  CAST(list_sum(list_transform(generate_series(0, n - 1),
      |    i -> i * ((a + i) % 256))) AS BIGINT) AS pix_wsum
      |FROM s""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "multimodal_blob_roundtrip" -> bmpStatsOracle,
    // full aHash replica: pixel list → 64 thumbnail grays (1-based list
    // indexing; J = source byte offset of cell c) → integer mean →
    // four 16-bit bands → OR-banded candidate pairs → banded hamming
    "multimodal_image_ahash_pairs" ->
      """WITH nf AS (SELECT greatest(240, count(*) // 14) AS nfam FROM documents),
        |p AS (
        |  SELECT doc_id, 4 + ((doc_id % nfam) % 5) AS w,
        |    4 + ((doc_id % nfam) % 3) AS h,
        |    ((doc_id % nfam) * 53) % 256 AS a,
        |    (doc_id // nfam) % 3 AS tweak
        |  FROM documents, nf),
        |px AS (
        |  SELECT doc_id, w, h,
        |    list_transform(generate_series(0, w * h * 3 - 1), x ->
        |      CASE WHEN x < 3 * tweak
        |        THEN 255 - (((a + 3) * ((x * 131) % 251 + 1)) % 256)
        |        ELSE ((a + 3) * ((x * 131) % 251 + 1)) % 256 END) AS pxl
        |  FROM p),
        |g AS (
        |  SELECT doc_id,
        |    list_transform(generate_series(0, 63), c ->
        |      (pxl[(((c // 8) * h) // 8) * w * 3 + (((c % 8) * w) // 8) * 3 + 1]
        |     + pxl[(((c // 8) * h) // 8) * w * 3 + (((c % 8) * w) // 8) * 3 + 2]
        |     + pxl[(((c // 8) * h) // 8) * w * 3 + (((c % 8) * w) // 8) * 3 + 3]) // 3)
        |      AS grays
        |  FROM px),
        |m AS (SELECT doc_id, grays, list_sum(grays) // 64 AS mean FROM g),
        |hsh AS (
        |  SELECT doc_id,
        |    CAST(list_sum(list_transform(generate_series(0, 15), c ->
        |      CASE WHEN grays[c + 1] > mean THEN (1 << c) ELSE 0 END)) AS INTEGER) AS b0,
        |    CAST(list_sum(list_transform(generate_series(0, 15), c ->
        |      CASE WHEN grays[c + 17] > mean THEN (1 << c) ELSE 0 END)) AS INTEGER) AS b1,
        |    CAST(list_sum(list_transform(generate_series(0, 15), c ->
        |      CASE WHEN grays[c + 33] > mean THEN (1 << c) ELSE 0 END)) AS INTEGER) AS b2,
        |    CAST(list_sum(list_transform(generate_series(0, 15), c ->
        |      CASE WHEN grays[c + 49] > mean THEN (1 << c) ELSE 0 END)) AS INTEGER) AS b3
        |  FROM m)
        |SELECT doc_a, doc_b, hamming FROM (
        |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
        |    CAST(bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
        |       + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3))
        |      AS INTEGER) AS hamming
        |  FROM hsh x JOIN hsh y ON x.doc_id < y.doc_id
        |    AND (x.b0 = y.b0 OR x.b1 = y.b1 OR x.b2 = y.b2 OR x.b3 = y.b3))
        |WHERE hamming <= 8""".stripMargin,

    // the feature pipeline replayed: synth pixels → 8×8 nearest
    // resample → integer grays → fixed ±3 projection → exact dot top-5
    "multimodal_image_embed_topk" ->
      """WITH p AS (
        |  SELECT doc_id, 1 + (n_chars % 17) AS w, 1 + (n_chars % 13) AS h,
        |    (doc_id * 7) % 256 AS a
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    list_transform(generate_series(0, 63), c ->
        |      ((a + ((((c // 8) * h) // 8) * w + (((c % 8) * w) // 8)) * 3) % 256
        |     + (a + ((((c // 8) * h) // 8) * w + (((c % 8) * w) // 8)) * 3 + 1) % 256
        |     + (a + ((((c // 8) * h) // 8) * w + (((c % 8) * w) // 8)) * 3 + 2) % 256) // 3)
        |      AS grays
        |  FROM p),
        |f AS (
        |  SELECT doc_id,
        |    list_transform(generate_series(0, 15), j ->
        |      list_sum(list_transform(generate_series(0, 63), c ->
        |        grays[c + 1] * (((c * 131 + j * 37) % 7) - 3)))) AS feat
        |  FROM g),
        |d AS (
        |  SELECT q.doc_id AS q_id, c.doc_id AS c_id,
        |    CAST(list_sum(list_transform(generate_series(1, 16),
        |      t -> q.feat[t] * c.feat[t])) AS BIGINT) AS dot_q
        |  FROM f q JOIN f c ON q.doc_id < 10 AND q.doc_id != c.doc_id)
        |SELECT q_id,
        |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY dot_q DESC, c_id) AS INTEGER) AS rank,
        |  c_id, dot_q
        |FROM d
        |QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY dot_q DESC, c_id) <= 5""".stripMargin,

    // corrupt set is analytic (doc_id mod 7); survivors reuse the
    // pixel-sum formula of the bmp round trip
    "multimodal_decode_quarantine" ->
      """WITH p AS (
        |  SELECT doc_id, 1 + (n_chars % 17) AS w, 1 + (n_chars % 13) AS h,
        |    (doc_id * 7) % 256 AS a
        |  FROM documents),
        |e AS (SELECT doc_id, w * h * 3 AS n, a FROM p)
        |SELECT doc_id,
        |  CASE WHEN doc_id % 7 = 0 THEN 'quarantined' ELSE 'ok' END AS status,
        |  CASE WHEN doc_id % 7 = 0 THEN -1
        |  ELSE CAST(list_sum(list_transform(generate_series(0, n - 1),
        |    i -> (a + i) % 256)) AS BIGINT) END AS pix_sum
        |FROM e""".stripMargin,

    // decimation keeps source even indices: output j = s(2j) =
    // ((a + 6j) % 256) − 128 over m = (n+1)//2 samples at half rate
    "multimodal_wav_resample" ->
      """WITH p AS (
        |  SELECT doc_id, 64 + n_chars % 50 AS n, (doc_id * 11) % 256 AS a
        |  FROM documents),
        |q AS (SELECT doc_id, a, (n + 1) // 2 AS m FROM p),
        |s AS (SELECT doc_id, m, a,
        |  list_transform(generate_series(0, m - 1),
        |    j -> ((a + 6 * j) % 256) - 128) AS sm
        |  FROM q)
        |SELECT doc_id, CAST(1 AS INTEGER) AS channels,
        |  CAST(8000 AS INTEGER) AS sample_rate,
        |  CAST(m AS INTEGER) AS n_samples,
        |  CAST(list_sum(sm) AS BIGINT) AS amp_sum,
        |  CAST(list_aggregate(sm, 'min') AS INTEGER) AS amp_min,
        |  CAST(list_aggregate(sm, 'max') AS INTEGER) AS amp_max,
        |  CAST(list_sum(list_transform(generate_series(0, m - 1),
        |    j -> j * (((a + 6 * j) % 256) - 128))) AS BIGINT) AS amp_wsum
        |FROM s""".stripMargin,

    // the packer replayed analytically: exact container sizes as
    // weights, md5-order exclusive prefix, byte-budget shards
    "multimodal_pack_shards" ->
      """WITH sized AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN
        |      54 + (((1 + n_chars % 17) * 3 + 3) // 4) * 4 * (1 + n_chars % 13)
        |    WHEN doc_id % 3 = 1 THEN 44 + 2 * (64 + n_chars % 50)
        |    ELSE n_chars END AS n_bytes
        |  FROM documents),
        |cum AS (
        |  SELECT doc_id, n_bytes,
        |    CAST(COALESCE(SUM(n_bytes) OVER (
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS cum_bytes
        |  FROM sized)
        |SELECT cum_bytes // 262144 AS shard_id,
        |  count(*) AS n_docs, CAST(sum(n_bytes) AS BIGINT) AS bytes,
        |  CAST(sum(n_bytes) AS BIGINT) * 1000000 // 262144 AS fill_ppm
        |FROM cum GROUP BY 1""".stripMargin,

    // exact container-size arithmetic: BMP = 54 + padded-row·h
    // (row = ((w·3+3)//4)·4), WAV = 44 + 2·n_samples, opaque = n_chars
    "multimodal_catalog" ->
      """WITH k AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'bmp'
        |         WHEN doc_id % 3 = 1 THEN 'wav'
        |         ELSE 'opaque' END AS kind,
        |    CASE WHEN doc_id % 3 = 0 THEN
        |      54 + (((1 + n_chars % 17) * 3 + 3) // 4) * 4 * (1 + n_chars % 13)
        |    WHEN doc_id % 3 = 1 THEN 44 + 2 * (64 + n_chars % 50)
        |    ELSE n_chars END AS n_bytes
        |  FROM documents)
        |SELECT kind, count(*) AS n_docs,
        |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes
        |FROM k GROUP BY kind""".stripMargin,

    // silent blocks are analytic: blocks m ≡ 0 (mod 3) of width 8,
    // truncated at n — the decode+RLE must recover exactly these runs
    "multimodal_wav_silence_runs" ->
      """WITH p AS (
        |  SELECT doc_id, 64 + n_chars % 50 AS n FROM documents)
        |SELECT doc_id, CAST(8 * m AS INTEGER) AS run_start,
        |  CAST(least(n, 8 * m + 8) AS INTEGER) AS run_end
        |FROM p, UNNEST(generate_series(0, (n - 1) // 8)) AS t(m)
        |WHERE m % 3 = 0""".stripMargin,

    // channel c holds pixel indices i ≡ c (mod 3); value (a + i) % 256
    "multimodal_channel_stats" ->
      """WITH p AS (
        |  SELECT doc_id, 1 + (n_chars % 17) AS w, 1 + (n_chars % 13) AS h,
        |    (doc_id * 7) % 256 AS a
        |  FROM documents),
        |e AS (SELECT doc_id, w * h * 3 AS n, a FROM p),
        |s AS (SELECT doc_id, n, a,
        |  list_transform(generate_series(0, n - 1), i -> (a + i) % 256) AS px
        |  FROM e)
        |SELECT doc_id,
        |  CAST(list_sum(list_transform(generate_series(0, n - 1),
        |    i -> CASE WHEN i % 3 = 0 THEN (a + i) % 256 ELSE 0 END)) AS BIGINT) AS r_sum,
        |  CAST(list_sum(list_transform(generate_series(0, n - 1),
        |    i -> CASE WHEN i % 3 = 1 THEN (a + i) % 256 ELSE 0 END)) AS BIGINT) AS g_sum,
        |  CAST(list_sum(list_transform(generate_series(0, n - 1),
        |    i -> CASE WHEN i % 3 = 2 THEN (a + i) % 256 ELSE 0 END)) AS BIGINT) AS b_sum,
        |  CAST(list_aggregate(list_transform(generate_series(0, n - 1),
        |    i -> CASE WHEN i % 3 = 0 THEN (a + i) % 256 ELSE -1 END), 'max') AS INTEGER) AS r_max,
        |  CAST(list_aggregate(list_transform(generate_series(0, n - 1),
        |    i -> CASE WHEN i % 3 = 1 THEN (a + i) % 256 ELSE -1 END), 'max') AS INTEGER) AS g_max,
        |  CAST(list_aggregate(list_transform(generate_series(0, n - 1),
        |    i -> CASE WHEN i % 3 = 2 THEN (a + i) % 256 ELSE -1 END), 'max') AS INTEGER) AS b_max
        |FROM s""".stripMargin,

    // families are exactly the (w, h, a) parameter classes — identical
    // parameters produce byte-identical containers, distinct parameters
    // produce differing first pixels/headers, so the distribution over
    // md5-equality (Spark side) equals the distribution over the triple
    "multimodal_dedup_exact" ->
      """WITH fam AS (
        |  SELECT 1 + (n_chars % 5) AS w, 1 + (n_chars % 3) AS h,
        |    (doc_id % 16) * 16 AS a, count(*) AS family_size
        |  FROM documents GROUP BY 1, 2, 3)
        |SELECT family_size, count(*) AS n_families
        |FROM fam GROUP BY family_size""".stripMargin,

    "multimodal_decode_bmp" -> bmpStatsOracle,

    "multimodal_decode_ppm" ->
      """WITH p AS (
        |  SELECT doc_id, 1 + (n_chars % 11) AS w, 1 + (n_chars % 7) AS h,
        |    (doc_id * 13) % 256 AS a
        |  FROM documents),
        |e AS (SELECT doc_id, w, h, w * h * 3 AS n, a FROM p),
        |s AS (SELECT doc_id, w, h, n, a,
        |  list_transform(generate_series(0, n - 1), i -> (a + i) % 256) AS px
        |  FROM e)
        |SELECT doc_id,
        |  CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
        |  CAST(3 AS INTEGER) AS channels, CAST(n AS INTEGER) AS n_bytes,
        |  CAST(list_sum(px) AS BIGINT) AS pix_sum,
        |  CAST(list_aggregate(px, 'min') AS INTEGER) AS pix_min,
        |  CAST(list_aggregate(px, 'max') AS INTEGER) AS pix_max,
        |  CAST(list_sum(list_transform(generate_series(0, n - 1),
        |    i -> i * ((a + i) % 256))) AS BIGINT) AS pix_wsum
        |FROM s""".stripMargin,

    "multimodal_decode_wav" ->
      """WITH p AS (
        |  SELECT doc_id, CAST(1 + (doc_id % 2) AS INTEGER) AS ch,
        |    (64 + n_chars % 50) * (1 + doc_id % 2) AS n,
        |    (doc_id * 11) % 256 AS a
        |  FROM documents),
        |s AS (SELECT doc_id, ch, n, a,
        |  list_transform(generate_series(0, n - 1),
        |    k -> ((a + 3 * k) % 256) - 128) AS sm
        |  FROM p)
        |SELECT doc_id, ch AS channels, CAST(16000 AS INTEGER) AS sample_rate,
        |  CAST(n AS INTEGER) AS n_samples,
        |  CAST(list_sum(sm) AS BIGINT) AS amp_sum,
        |  CAST(list_aggregate(sm, 'min') AS INTEGER) AS amp_min,
        |  CAST(list_aggregate(sm, 'max') AS INTEGER) AS amp_max,
        |  CAST(list_sum(list_transform(generate_series(0, n - 1),
        |    k -> k * (((a + 3 * k) % 256) - 128))) AS BIGINT) AS amp_wsum
        |FROM s""".stripMargin,

    // nearest-neighbour mapping mirrored exactly: thumb index i over
    // 8x8x3 → ty=i//24, tx=(i%24)//3, c=i%3; source pixel
    // (ty*h//8, tx*w//8); value = (a + ((sy*w + sx)*3 + c)) % 256
    "multimodal_thumbnail_bmp" ->
      """WITH p AS (
        |  SELECT doc_id, 1 + (n_chars % 17) AS w, 1 + (n_chars % 13) AS h,
        |    (doc_id * 7) % 256 AS a
        |  FROM documents),
        |t AS (SELECT doc_id,
        |  list_transform(generate_series(0, 191), i ->
        |    (a + ((((i // 24) * h) // 8) * w
        |        + (((i % 24) // 3) * w) // 8) * 3 + (i % 3)) % 256) AS px
        |  FROM p)
        |SELECT doc_id, CAST(8 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
        |  CAST(list_sum(px) AS BIGINT) AS thumb_sum,
        |  CAST(list_sum(list_transform(generate_series(0, 191),
        |    i -> i * px[i + 1])) AS BIGINT) AS thumb_wsum
        |FROM t""".stripMargin,

    // frame bounds mirror wavFrameEnergy: per = max(1, n//4); frames
    // 0..2 cover [f*per, min(n,(f+1)*per)); frame 3 covers [3*per, n)
    "multimodal_wav_frames" ->
      """WITH p AS (
        |  SELECT doc_id, 64 + n_chars % 50 AS n, (doc_id * 17) % 256 AS a
        |  FROM documents),
        |b AS (SELECT doc_id, n, a, greatest(1, n // 4) AS per FROM p)
        |SELECT doc_id, CAST(n AS INTEGER) AS n_samples,
        |  CAST(COALESCE(list_sum(list_transform(
        |    generate_series(0, least(n, per) - 1),
        |    k -> (((a + 3 * k) % 256) - 128) * (((a + 3 * k) % 256) - 128))), 0)
        |    AS BIGINT) AS frame_sq_0,
        |  CAST(COALESCE(list_sum(list_transform(
        |    generate_series(per, least(n, 2 * per) - 1),
        |    k -> (((a + 3 * k) % 256) - 128) * (((a + 3 * k) % 256) - 128))), 0)
        |    AS BIGINT) AS frame_sq_1,
        |  CAST(COALESCE(list_sum(list_transform(
        |    generate_series(2 * per, least(n, 3 * per) - 1),
        |    k -> (((a + 3 * k) % 256) - 128) * (((a + 3 * k) % 256) - 128))), 0)
        |    AS BIGINT) AS frame_sq_2,
        |  CAST(COALESCE(list_sum(list_transform(
        |    generate_series(3 * per, n - 1),
        |    k -> (((a + 3 * k) % 256) - 128) * (((a + 3 * k) % 256) - 128))), 0)
        |    AS BIGINT) AS frame_sq_3
        |FROM b""".stripMargin,
    "multimodal_features" ->
      """SELECT doc_id, 'text/plain' AS mime,
        |  CAST(length(text) AS INTEGER) AS byte_len,
        |  CAST(ascii(text[1]) AS INTEGER) AS first_byte,
        |  CAST(ascii(text[-1]) AS INTEGER) AS last_byte,
        |  CAST(list_sum(list_transform(generate_series(1, length(text)),
        |    i -> ascii(text[i]))) AS BIGINT) AS byte_sum,
        |  CAST(ascii(text[1]) % 3 + 1 AS INTEGER) AS stub_channels
        |FROM documents""".stripMargin,
    // mirrors frameSampleStub: per = max(1, n/4); frames 0..2 cover
    // [f*per, min(n,(f+1)*per)); frame 3 covers [3*per, n). 1-indexed here.
    "multimodal_frame_sample" ->
      """WITH p AS (SELECT doc_id, length(text) AS n,
        |  greatest(1, length(text) // 4) AS per, text FROM documents)
        |SELECT doc_id, CAST(4 AS INTEGER) AS n_frames,
        |  CAST(COALESCE(list_sum(list_transform(generate_series(1, least(n, per)),
        |    i -> ascii(text[i]))), 0) AS BIGINT) AS frame_sum_0,
        |  CAST(COALESCE(list_sum(list_transform(generate_series(per + 1, least(n, 2 * per)),
        |    i -> ascii(text[i]))), 0) AS BIGINT) AS frame_sum_1,
        |  CAST(COALESCE(list_sum(list_transform(generate_series(2 * per + 1, least(n, 3 * per)),
        |    i -> ascii(text[i]))), 0) AS BIGINT) AS frame_sum_2,
        |  CAST(COALESCE(list_sum(list_transform(generate_series(3 * per + 1, n),
        |    i -> ascii(text[i]))), 0) AS BIGINT) AS frame_sum_3
        |FROM p""".stripMargin
  )
}
