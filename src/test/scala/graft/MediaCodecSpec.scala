package graft

import graft.io.MediaCodec
import org.scalatest.funsuite.AnyFunSuite

/** Golden + round-trip specs for the pure-JVM media codecs. The fixture
  * files under src/test/resources/media were written by an INDEPENDENT
  * implementation (python struct), with pixel formula
  * `p(x,y,c) = (x·31 + y·17 + c·7) % 256` — the decoder must reproduce
  * it byte-exactly, including BGR→RGB reorder, row padding, bottom-up
  * vs top-down row order, PPM header comments, and the RIFF chunk walk
  * (a LIST chunk with odd size + pad byte sits before `data` in the
  * mono fixture).
  */
class MediaCodecSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/media/$name")
    require(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private def pix(x: Int, y: Int, c: Int): Int = (x * 31 + y * 17 + c * 7) % 256

  private def expectPixels(w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      out((y * w + x) * 3 + c) = pix(x, y, c).toByte
    out
  }

  test("golden: 7x5 bottom-up BMP decodes to the generating formula (padding + BGR)") {
    val img = MediaCodec.decodeBmp(fixture("bmp_7x5.bmp"))
    assert(img.width == 7 && img.height == 5 && img.channels == 3)
    assert(img.pixels.sameElements(expectPixels(7, 5)))
  }

  test("golden: BITMAPV5HEADER (124-byte info header) decodes via the data offset") {
    // real-world BMPs often carry V4/V5 headers; the decoder must trust
    // bfOffBits + biSize >= 40 rather than assume the 54-byte layout
    val img = MediaCodec.decodeBmp(fixture("bmp_v5_5x3.bmp"))
    assert(img.width == 5 && img.height == 3)
    assert(img.pixels.sameElements(expectPixels(5, 3)))
  }

  test("golden: negative-height BMP decodes top-down") {
    val img = MediaCodec.decodeBmp(fixture("bmp_topdown_3x2.bmp"))
    assert(img.width == 3 && img.height == 2)
    assert(img.pixels.sameElements(expectPixels(3, 2)))
  }

  test("golden: P6 PPM with header comment decodes exactly") {
    val img = MediaCodec.decodePpm(fixture("ppm_4x3.ppm"))
    assert(img.width == 4 && img.height == 3 && img.channels == 3)
    assert(img.pixels.sameElements(expectPixels(4, 3)))
  }

  test("golden: mono WAV with an odd-size LIST chunk before data decodes exactly") {
    val a = MediaCodec.decodeWav(fixture("wav_mono16.wav"))
    assert(a.channels == 1 && a.sampleRate == 8000)
    val expect = (0 until 20).map(k => (((k * 37) % 256 - 128) * 100).toShort)
    assert(a.samples.toSeq == expect)
  }

  test("golden: canonical stereo WAV decodes exactly") {
    val a = MediaCodec.decodeWav(fixture("wav_stereo16.wav"))
    assert(a.channels == 2 && a.sampleRate == 44100)
    val expect = (0 until 16).map(k =>
      ((if (k % 2 == 0) 1 else -1) * (k * 123 % 30000)).toShort)
    assert(a.samples.toSeq == expect)
  }

  test("round trip: BMP encode→decode is the identity across padding classes") {
    // widths 1..8 cover all four row-padding residues twice
    for (w <- 1 to 8; h <- Seq(1, 3, 5)) {
      val px = Array.tabulate(w * h * 3)(i => ((i * 131 + w * 17 + h) % 256).toByte)
      val back = MediaCodec.decodeBmp(MediaCodec.encodeBmp24(w, h, px))
      assert(back.width == w && back.height == h, s"${w}x$h")
      assert(back.pixels.sameElements(px), s"${w}x$h pixel mismatch")
    }
  }

  test("round trip: PPM encode→decode is the identity") {
    for (w <- Seq(1, 5, 13); h <- Seq(1, 4)) {
      val px = Array.tabulate(w * h * 3)(i => ((i * 37 + 5) % 256).toByte)
      val back = MediaCodec.decodePpm(MediaCodec.encodePpmP6(w, h, px))
      assert(back.width == w && back.height == h)
      assert(back.pixels.sameElements(px))
    }
  }

  test("round trip: WAV encode→decode is the identity (mono + stereo, full i16 range)") {
    for (ch <- Seq(1, 2)) {
      val s = Array.tabulate[Short](24 * ch)(k =>
        (Short.MinValue + (k * 5503) % 65536).toShort)
      val back = MediaCodec.decodeWav(MediaCodec.encodeWavPcm16(ch, 16000, s))
      assert(back.channels == ch && back.sampleRate == 16000)
      assert(back.samples.sameElements(s))
    }
  }

  test("sniff recognizes all three containers and rejects text") {
    assert(MediaCodec.sniff(fixture("bmp_7x5.bmp")).contains("bmp"))
    assert(MediaCodec.sniff(fixture("ppm_4x3.ppm")).contains("ppm"))
    assert(MediaCodec.sniff(fixture("wav_mono16.wav")).contains("wav"))
    assert(MediaCodec.sniff("hello world".getBytes).isEmpty)
  }

  test("strict decode: malformed containers raise with a reason, never return garbage") {
    val bmp = fixture("bmp_7x5.bmp")
    intercept[IllegalArgumentException](MediaCodec.decodeBmp(bmp.take(40)))    // truncated
    intercept[IllegalArgumentException](MediaCodec.decodeBmp("XXjunk".getBytes))
    intercept[IllegalArgumentException](MediaCodec.decodePpm("P6\n4 3\n65535\n".getBytes)) // 16-bit maxval
    // hostile headers must raise IAE (the quarantine contract), never
    // escape as index/negative-size errors: negative data offset,
    // overflowing dimension product, overflowing PPM header number
    val badOff = bmp.clone()
    java.nio.ByteBuffer.wrap(badOff).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(10, -1000)
    intercept[IllegalArgumentException](MediaCodec.decodeBmp(badOff))
    val hugeDims = bmp.clone()
    java.nio.ByteBuffer.wrap(hugeDims).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(18, 1 << 20).putInt(22, 1 << 20)
    intercept[IllegalArgumentException](MediaCodec.decodeBmp(hugeDims))
    intercept[IllegalArgumentException](
      MediaCodec.decodePpm("P6\n99999999999 3\n255\n".getBytes))
    val wav = fixture("wav_stereo16.wav")
    val nonPcm = wav.clone()
    nonPcm(20) = 3 // audioFormat = IEEE float
    intercept[IllegalArgumentException](MediaCodec.decodeWav(nonPcm))
  }

  test("resizeNearest maps the documented source pixel per target cell") {
    val w = 5; val h = 4
    val px = Array.tabulate(w * h * 3)(i => (i % 256).toByte)
    val t = MediaCodec.resizeNearest(MediaCodec.ImagePixels(w, h, 3, px), 8, 8)
    assert(t.width == 8 && t.height == 8)
    for (ty <- 0 until 8; tx <- 0 until 8; c <- 0 until 3) {
      val sy = ty * h / 8; val sx = tx * w / 8
      assert(t.pixels((ty * 8 + tx) * 3 + c) == px((sy * w + sx) * 3 + c),
        s"($tx,$ty,$c)")
    }
  }
}
