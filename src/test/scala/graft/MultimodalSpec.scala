package graft

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO
import javax.sound.sampled.AudioSystem

import graft.io.MediaCodec
import org.scalatest.funsuite.AnyFunSuite

/** The multimodal column family's bytes are REAL: MediaCodec's PNG and
  * WAV output is decoded here by the JDK's own independent readers
  * (javax.imageio, javax.sound) — not by MediaCodec's parsers — and the
  * decoded dimensions, sample rates AND payload values must match the
  * encode parameters. This is what separates "a binary column shaped
  * like media" from actual media: a third-party decoder accepts the
  * bytes.
  */
class MultimodalSpec extends AnyFunSuite {

  test("encodePng emits a real PNG: javax.imageio decodes dims and every pixel") {
    for ((w, h, seed) <- Seq((1, 1, 0L), (5, 3, 7L), (16, 16, 123L))) {
      val bytes = MediaCodec.encodePng(w, h, seed)
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO rejected the ${w}x$h PNG")
      assert(img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w) {
        val expected = (((seed + x + y.toLong * w) * 37) % 256).toInt
        val gray = img.getRaster.getSample(x, y, 0)
        assert(gray == expected, s"pixel ($x,$y): got $gray, want $expected")
      }
    }
  }

  test("encodeWav emits a real WAV: javax.sound decodes format and every sample") {
    val (rate, n, seed) = (8500, 48, 11L)
    val bytes = MediaCodec.encodeWav(rate, n, seed)
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    val fmt = in.getFormat
    assert(fmt.getSampleRate.toInt == rate)
    assert(fmt.getChannels == 1 && fmt.getSampleSizeInBits == 16)
    assert(in.getFrameLength == n)
    val pcm = in.readAllBytes()
    assert(pcm.length == n * 2)
    for (i <- 0 until n) {
      val got = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort.toInt
      val expected = (((seed + i) * 2654435761L) % 65536L).toInt - 32768
      assert(got == expected, s"sample $i: got $got, want $expected")
    }
  }

  test("payload decoders match the JDK's independent readers byte for byte") {
    // pngPixels (zlib inflate + filter strip) and wavSamples (PCM
    // section read) are the decode half the checked feature queries
    // run — here they must agree with javax.imageio / javax.sound on
    // the SAME bytes, so the two in-repo decode paths can't share a
    // common misreading.
    val png = MediaCodec.encodePng(7, 5, 99L)
    val img = ImageIO.read(new ByteArrayInputStream(png))
    val mine = MediaCodec.pngPixels(png)
    for (y <- 0 until 5; x <- 0 until 7)
      assert(mine(y * 7 + x) == img.getRaster.getSample(x, y, 0),
        s"pixel ($x,$y) differs from ImageIO")
    val wav = MediaCodec.encodeWav(8000, 33, 5L)
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(wav))
    val pcm = in.readAllBytes()
    val samples = MediaCodec.wavSamples(wav)
    assert(samples.length == 33)
    for (i <- samples.indices)
      assert(samples(i) == ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort.toInt,
        s"sample $i differs from javax.sound")
  }

  test("parsers round-trip the encoder and reject non-media bytes loudly") {
    val p = MediaCodec.parsePng(MediaCodec.encodePng(9, 4, 42L))
    assert(p == MediaCodec.PngMeta(9, 4, 8, 0, crcOk = true))
    val wv = MediaCodec.parseWav(MediaCodec.encodeWav(11025, 10, 3L))
    assert(wv == MediaCodec.WavMeta(11025, 1, 16, 10, sizeOk = true))
    val junk = Array.tabulate[Byte](64)(i => (i * 31).toByte)
    intercept[IllegalArgumentException](MediaCodec.parsePng(junk))
    intercept[IllegalArgumentException](MediaCodec.parseWav(junk))
    // a bit flipped inside IHDR must be CAUGHT by the CRC check, not
    // silently decoded as wrong dimensions
    val png = MediaCodec.encodePng(9, 4, 42L)
    png(17) = (png(17) ^ 1).toByte // width byte
    assert(!MediaCodec.parsePng(png).crcOk)
  }
}
