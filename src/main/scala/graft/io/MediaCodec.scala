package graft.io

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Pure-JVM media containers — real encode/decode for three public
  * uncompressed formats, `java.nio` only (the TouchBinary pattern;
  * reference precedent: versioned fixed-layout binary records with
  * endianness discipline, /root/reference/src/touches/touch_reader.cpp:
  * 241-289). This replaces the round-≤10 multimodal decode STUB: the
  * pixel/sample statistics the multimodal queries emit are now computed
  * from bytes that round-trip through genuine container layouts —
  * header parse, row padding, channel order, chunk walk — not from a
  * fake derived number.
  *
  *  - '''BMP''' (Windows bitmap): 24-bit uncompressed BI_RGB,
  *    little-endian headers, rows padded to 4 bytes, stored BOTTOM-UP
  *    in BGR channel order (top-down via negative height accepted on
  *    decode). The decoder normalizes to row-major top-down RGB.
  *  - '''PPM''' (Netpbm P6): ASCII header with `#` comments, binary
  *    RGB payload, maxval ≤ 255.
  *  - '''WAV''' (RIFF PCM): chunk walk (`fmt ` / `data`, unknown
  *    chunks skipped, odd-size chunks padded to even per RIFF),
  *    16-bit little-endian interleaved samples.
  *
  * Decoders are STRICT: malformed or unsupported containers raise with
  * a precise reason (the fail-fast discipline of the touch decoder)
  * rather than returning garbage stats.
  */
object MediaCodec {

  /** Row-major, top-down, RGB-interleaved 8-bit pixels. */
  final case class ImagePixels(width: Int, height: Int, channels: Int,
                               pixels: Array[Byte])

  /** Channel-interleaved 16-bit PCM samples. */
  final case class AudioSamples(channels: Int, sampleRate: Int,
                                samples: Array[Short])

  // ---------------------------------------------------------------- BMP

  private val BmpFileHeaderLen = 14
  private val BmpInfoHeaderLen = 40

  private def bmpRowSize(width: Int): Int = ((width * 3 + 3) / 4) * 4

  /** 24-bit BI_RGB bottom-up BMP from row-major top-down RGB pixels. */
  def encodeBmp24(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(pixels.length == width * height * 3,
      s"expected ${width * height * 3} RGB bytes, got ${pixels.length}")
    val rowSize = bmpRowSize(width)
    val dataSize = rowSize * height
    val buf = ByteBuffer.allocate(BmpFileHeaderLen + BmpInfoHeaderLen + dataSize)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
      .putInt(buf.capacity())          // bfSize
      .putInt(0)                       // bfReserved1/2
      .putInt(BmpFileHeaderLen + BmpInfoHeaderLen) // bfOffBits
    buf.putInt(BmpInfoHeaderLen)       // biSize
      .putInt(width).putInt(height)    // positive height = bottom-up
      .putShort(1)                     // biPlanes
      .putShort(24)                    // biBitCount
      .putInt(0)                       // biCompression = BI_RGB
      .putInt(dataSize)                // biSizeImage
      .putInt(2835).putInt(2835)       // 72 dpi
      .putInt(0).putInt(0)             // biClrUsed / biClrImportant
    var y = height - 1                 // bottom-up row order
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val p = (y * width + x) * 3
        // BGR on disk
        buf.put(pixels(p + 2)).put(pixels(p + 1)).put(pixels(p))
        x += 1
      }
      var pad = rowSize - width * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      y -= 1
    }
    buf.array()
  }

  /** Decode a 24-bit uncompressed BMP (bottom-up or top-down) to
    * row-major top-down RGB.
    */
  def decodeBmp(bytes: Array[Byte]): ImagePixels = {
    require(bytes.length >= BmpFileHeaderLen + BmpInfoHeaderLen,
      s"truncated BMP: ${bytes.length} bytes")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(buf.get(0) == 'B'.toByte && buf.get(1) == 'M'.toByte, "not a BMP (magic)")
    val dataOffset = buf.getInt(10)
    val biSize = buf.getInt(14)
    require(biSize >= BmpInfoHeaderLen, s"unsupported BMP header size $biSize")
    val width = buf.getInt(18)
    val rawHeight = buf.getInt(22)
    val bottomUp = rawHeight > 0
    val height = math.abs(rawHeight)
    val bitCount = buf.getShort(28).toInt
    val compression = buf.getInt(30)
    require(width > 0 && height > 0, s"bad dims ${width}x$rawHeight")
    // strict-decode contract: EVERY malformed input must raise
    // IllegalArgumentException (the quarantine path catches exactly
    // that) — so bound the header-supplied offset and the dimension
    // product BEFORE any array arithmetic, or a hostile header would
    // surface as an index/negative-size error and kill the job instead
    // of quarantining
    require(dataOffset >= BmpFileHeaderLen + BmpInfoHeaderLen &&
      dataOffset <= bytes.length,
      s"bad bfOffBits $dataOffset for a ${bytes.length}-byte file")
    require(width.toLong * height * 3 <= Int.MaxValue,
      s"pixel array ${width}x$height exceeds addressable size")
    require(bitCount == 24, s"unsupported biBitCount $bitCount (24 only)")
    require(compression == 0, s"unsupported biCompression $compression (BI_RGB only)")
    val rowSize = bmpRowSize(width)
    require(bytes.length >= dataOffset + rowSize.toLong * height,
      s"truncated BMP pixel array: need ${dataOffset + rowSize.toLong * height}, have ${bytes.length}")
    val out = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      val srcRow = if (bottomUp) height - 1 - y else y
      val rowStart = dataOffset + srcRow * rowSize
      var x = 0
      while (x < width) {
        val s = rowStart + x * 3
        val d = (y * width + x) * 3
        out(d) = bytes(s + 2)      // R (disk is BGR)
        out(d + 1) = bytes(s + 1)  // G
        out(d + 2) = bytes(s)      // B
        x += 1
      }
      y += 1
    }
    ImagePixels(width, height, 3, out)
  }

  // ---------------------------------------------------------------- PPM

  /** Binary Netpbm P6, maxval 255, from row-major top-down RGB. */
  def encodePpmP6(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(pixels.length == width * height * 3,
      s"expected ${width * height * 3} RGB bytes, got ${pixels.length}")
    val header = s"P6\n$width $height\n255\n".getBytes(StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(pixels, 0, out, header.length, pixels.length)
    out
  }

  /** Decode binary P6 with full Netpbm header rules: any whitespace
    * between tokens, `#` comments to end-of-line, exactly ONE
    * whitespace byte after maxval before the raster.
    */
  def decodePpm(bytes: Array[Byte]): ImagePixels = {
    require(bytes.length >= 2 && bytes(0) == 'P'.toByte && bytes(1) == '6'.toByte,
      "not a P6 PPM (magic)")
    var pos = 2
    def isWs(b: Byte) = b == ' ' || b == '\t' || b == '\n' || b == '\r'
    def nextToken(): Int = {
      // skip whitespace and comments
      var done = false
      while (!done) {
        while (pos < bytes.length && isWs(bytes(pos))) pos += 1
        if (pos < bytes.length && bytes(pos) == '#'.toByte)
          while (pos < bytes.length && bytes(pos) != '\n'.toByte) pos += 1
        else done = true
      }
      require(pos < bytes.length, "truncated PPM header")
      var v = 0
      while (pos < bytes.length && !isWs(bytes(pos))) {
        val c = bytes(pos)
        require(c >= '0'.toByte && c <= '9'.toByte, s"bad PPM header byte $c")
        v = v * 10 + (c - '0'.toByte)
        // strict-decode contract: a hostile header number must raise
        // here, not wrap int and corrupt the size arithmetic below
        require(v <= 100000000, "PPM header number too large")
        pos += 1
      }
      v
    }
    val width = nextToken()
    val height = nextToken()
    val maxval = nextToken()
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(width.toLong * height * 3 <= Int.MaxValue,
      s"pixel array ${width}x$height exceeds addressable size")
    require(maxval > 0 && maxval <= 255, s"unsupported maxval $maxval (8-bit only)")
    pos += 1 // exactly one whitespace byte after maxval
    val n = width * height * 3
    require(bytes.length >= pos + n,
      s"truncated PPM raster: need ${pos + n}, have ${bytes.length}")
    val out = new Array[Byte](n)
    System.arraycopy(bytes, pos, out, 0, n)
    ImagePixels(width, height, 3, out)
  }

  // ---------------------------------------------------------------- WAV

  /** Canonical RIFF/WAVE with one `fmt ` and one `data` chunk,
    * PCM 16-bit little-endian.
    */
  def encodeWavPcm16(channels: Int, sampleRate: Int,
                     samples: Array[Short]): Array[Byte] = {
    require(channels > 0, s"bad channel count $channels")
    require(samples.length % channels == 0,
      s"${samples.length} samples not divisible by $channels channels")
    val dataSize = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes(StandardCharsets.US_ASCII))
      .putInt(36 + dataSize)
      .put("WAVE".getBytes(StandardCharsets.US_ASCII))
    buf.put("fmt ".getBytes(StandardCharsets.US_ASCII))
      .putInt(16)
      .putShort(1)                                   // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2)             // byte rate
      .putShort((channels * 2).toShort)              // block align
      .putShort(16)                                  // bits per sample
    buf.put("data".getBytes(StandardCharsets.US_ASCII)).putInt(dataSize)
    var i = 0
    while (i < samples.length) { buf.putShort(samples(i)); i += 1 }
    buf.array()
  }

  /** Decode PCM-16 WAV via a proper RIFF chunk walk: unknown chunks
    * (LIST, fact, …) are skipped, chunk payloads are padded to even
    * length per the RIFF rule, `fmt ` must precede `data`.
    */
  def decodeWav(bytes: Array[Byte]): AudioSamples = {
    require(bytes.length >= 12, s"truncated WAV: ${bytes.length} bytes")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fourCC(off: Int): String =
      new String(bytes, off, 4, StandardCharsets.US_ASCII)
    require(fourCC(0) == "RIFF", "not a RIFF container (magic)")
    require(fourCC(8) == "WAVE", "not a WAVE form")
    var pos = 12
    var channels = -1; var sampleRate = -1; var bits = -1
    var samples: Array[Short] = null
    while (pos + 8 <= bytes.length && samples == null) {
      val id = fourCC(pos)
      val size = buf.getInt(pos + 4)
      require(size >= 0 && pos + 8 + size.toLong <= bytes.length,
        s"chunk '$id' overruns file (size $size at $pos)")
      id match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too small: $size")
          val audioFormat = buf.getShort(pos + 8).toInt
          require(audioFormat == 1, s"unsupported audio format $audioFormat (PCM only)")
          channels = buf.getShort(pos + 10).toInt
          sampleRate = buf.getInt(pos + 12)
          bits = buf.getShort(pos + 22).toInt
          require(channels > 0, s"bad channel count $channels")
          require(bits == 16, s"unsupported bits-per-sample $bits (16 only)")
        case "data" =>
          require(channels > 0, "data chunk before fmt chunk")
          require(size % 2 == 0, s"odd PCM-16 data size $size")
          val n = size / 2
          val out = new Array[Short](n)
          var i = 0
          while (i < n) { out(i) = buf.getShort(pos + 8 + i * 2); i += 1 }
          samples = out
        case _ => // skip unknown chunk
      }
      pos += 8 + size + (size & 1) // RIFF pads odd chunks to even
    }
    require(samples != null, "no data chunk found")
    AudioSamples(channels, sampleRate, samples)
  }

  // -------------------------------------------------------------- sniff

  /** Container detection by magic bytes: Some("bmp"|"ppm"|"wav"). */
  def sniff(bytes: Array[Byte]): Option[String] =
    if (bytes.length >= 2 && bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte)
      Some("bmp")
    else if (bytes.length >= 2 && bytes(0) == 'P'.toByte && bytes(1) == '6'.toByte)
      Some("ppm")
    else if (bytes.length >= 12 &&
      new String(bytes, 0, 4, StandardCharsets.US_ASCII) == "RIFF" &&
      new String(bytes, 8, 4, StandardCharsets.US_ASCII) == "WAVE")
      Some("wav")
    else None

  /** Nearest-neighbour resample of decoded pixels to `tw`×`th` —
    * the real thumbnailing kernel (replaces the byte-stride stub).
    */
  def resizeNearest(img: ImagePixels, tw: Int, th: Int): ImagePixels = {
    require(tw > 0 && th > 0, s"bad target dims ${tw}x$th")
    val out = new Array[Byte](tw * th * img.channels)
    var ty = 0
    while (ty < th) {
      val sy = ty * img.height / th
      var tx = 0
      while (tx < tw) {
        val sx = tx * img.width / tw
        var c = 0
        while (c < img.channels) {
          out((ty * tw + tx) * img.channels + c) =
            img.pixels((sy * img.width + sx) * img.channels + c)
          c += 1
        }
        tx += 1
      }
      ty += 1
    }
    ImagePixels(tw, th, img.channels, out)
  }
}
