package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and run decode / feature-extract
  * as partition-local batch functions over `Dataset[Blob]`.
  *
  * The Spark-side structure is real and tested — schema, partitioning,
  * batch shape (`mapPartitions`, so a real decoder could amortize codec
  * init per partition, the moral equivalent of `mapInPandas` batches).
  * The DECODER ITSELF IS A STUB: this container has no image/audio codecs,
  * so `decodeStub` derives deterministic fake "pixels" from the bytes.
  * Swapping in a real codec changes only that one function.
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

  /** STUB decode — stands in for an image/audio codec (deterministic fake:
    * header-derived channel count). A real implementation would parse the
    * container format here; nothing else in the pipeline changes.
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

  val queries: Map[String, Q] = Map(
    "multimodal_features" -> ((s, dir) =>
      extractFeatures(blobTable(s, dir)).toDF()),
    // frame_sums projected to one scalar column per frame (nFrames is a
    // constant 4): the driver's pandas compare can't sort ndarray columns,
    // and scalar columns give it a full hash check instead of rows-only.
    "multimodal_frame_sample" -> ((s, dir) =>
      frameSampleStub(blobTable(s, dir), nFrames = 4).toDF()
        .select(Seq(col("doc_id"), col("n_frames")) ++
          (0 until 4).map(f => element_at(col("frame_sums"), f + 1).as(s"frame_sum_$f")): _*))
  )

  // Oracle (text is pure ASCII in the testdata, so char codepoints ==
  // byte values; verified before relying on it).
  val oracleSql: Map[String, String] = Map(
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
