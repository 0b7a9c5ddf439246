package graft

import graft.multimodal.{Decoders, Media}
import java.nio.{ByteBuffer, ByteOrder}
import org.scalatest.funsuite.AnyFunSuite

/** Byte-level fixtures for the pure-JVM media decoders: WAVs and PPMs are
  * hand-assembled here (not via the synth helpers) so parser bugs cannot
  * self-verify.
  */
class DecodersSpec extends AnyFunSuite {

  private def handWav(samples: Array[Short], rate: Int): Array[Byte] = {
    val n = samples.length
    val buf = ByteBuffer.allocate(44 + 2 * n).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes); buf.putInt(36 + 2 * n); buf.put("WAVE".getBytes)
    buf.put("fmt ".getBytes); buf.putInt(16)
    buf.putShort(1); buf.putShort(1); buf.putInt(rate); buf.putInt(rate * 2)
    buf.putShort(2); buf.putShort(16)
    buf.put("data".getBytes); buf.putInt(2 * n)
    samples.foreach(buf.putShort)
    buf.array()
  }

  test("WAV: header parse, samples, duration, RMS and zero crossings") {
    // 800 samples of a ±16384 square wave with period 2 at 8 kHz = 100 ms
    val samples = Array.tabulate(800)(i => if (i % 2 == 0) 16384 else -16384).map(_.toShort)
    val bytes = handWav(samples, 8000)
    assert(Decoders.isWav(bytes))
    val (rate, channels, s) = Decoders.decodeWav(bytes)
    assert(rate == 8000 && channels == 1 && s.length == 800 && s(0) == 16384)
    val feat = Decoders.wavFeature(Media.MediaCell("d", 0, "audio", "r", bytes))
    assert(feat.duration_ms == 100)
    assert(math.abs(feat.feature(0) - 0.5f) < 1e-4)        // RMS = 16384/32768
    assert(math.abs(feat.feature(1) - 799f / 800f) < 1e-4) // sign flips every step
    assert(math.abs(feat.feature(3) - 0.5f) < 1e-4)        // peak
  }

  test("WAV: chunk walker skips unknown chunks before fmt/data") {
    // insert a junk chunk between WAVE and fmt
    val base = handWav(Array[Short](100, -100, 100, -100), 8000)
    val junk = ByteBuffer.allocate(base.length + 12).order(ByteOrder.LITTLE_ENDIAN)
    junk.put(base, 0, 12)
    junk.put("LIST".getBytes); junk.putInt(4); junk.putInt(0xdeadbeef)
    junk.put(base, 12, base.length - 12)
    val withJunk = junk.array()
    // patch RIFF size (not validated by the parser, but keep it honest)
    val (rate, _, s) = Decoders.decodeWav(withJunk)
    assert(rate == 8000 && s.toSeq == Seq[Short](100, -100, 100, -100))
  }

  test("PPM: parse with comment, exact channel means, resize") {
    // 2×2: red, green, blue, white — with a header comment
    val px = Array[Int](255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255).map(_.toByte)
    val bytes = "P6\n# test image\n2 2\n255\n".getBytes ++ px
    assert(Decoders.isPpm(bytes))
    val (w, h, rgb) = Decoders.decodePpm(bytes)
    assert(w == 2 && h == 2 && rgb.length == 12)
    val feat = Decoders.ppmFeature(Media.MediaCell("d", 0, "image", "r", bytes))
    assert(feat.width == 2 && feat.height == 2)
    // mean of each channel = (255+0+0+255)/4/255 = 0.5
    assert(math.abs(feat.feature(0) - 0.5f) < 1e-4)
    assert(math.abs(feat.feature(1) - 0.5f) < 1e-4)
    assert(math.abs(feat.feature(2) - 0.5f) < 1e-4)
    // resize 2×2→1×1: single cell = mean luma of the four pixels
    val lum = Decoders.resizeLuma(bytes, 1, 1)
    val want = (0.299 * 255 + 0.587 * 255 + 0.114 * 255 + // white
      0.299 * 255 + 0.587 * 255 + 0.114 * 255) / 4 / 255  // + red.r + green.g + blue.b
    assert(lum.length == 1 && math.abs(lum(0) - want) < 1e-3)
  }

  test("synth payloads are well-formed and route to the real decoders") {
    val wav = Decoders.synthWav("m://abc.wav")
    assert(Decoders.isWav(wav) && !Decoders.isPpm(wav))
    val (rate, _, s) = Decoders.decodeWav(wav)
    assert(rate == 8000 && s.length >= 1600)
    val ppm = Decoders.synthPpm("m://xyz.ppm")
    assert(Decoders.isPpm(ppm) && !Decoders.isWav(ppm))
    val (w, h, rgb) = Decoders.decodePpm(ppm)
    assert(w >= 8 && h >= 8 && rgb.length == w * h * 3)
  }
}
