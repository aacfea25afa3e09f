package graft.io

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater}

/** Pure-JVM media codec for the multimodal column family: emits REAL,
  * spec-valid PNG and WAV bytes (verified against the JDK's own
  * independent decoders — javax.imageio / javax.sound — in
  * MultimodalSpec) and parses metadata back OUT of the bytes, so the
  * binary-column pipeline exercises actual container formats instead of
  * synthesized metadata. The container has no native media libraries;
  * PNG (zlib is in the JDK) and WAV (uncompressed PCM) are the two real
  * formats a JVM can both write and read unaided — heavier codecs plug
  * into the same parse/decode slot.
  *
  * Parsers fail LOUDLY on malformed bytes (IllegalArgumentException):
  * at 100 TB a silent wrong-dimension read poisons every downstream
  * resize/crop; a thrown error fails the task and surfaces in the job.
  */
object MediaCodec {

  // ---------------------------------------------------------------- PNG

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    .map(_.toByte)

  private def chunk(out: ByteArrayOutputStream, typ: String, data: Array[Byte]): Unit = {
    def be32(v: Long): Array[Byte] =
      Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    out.write(be32(data.length.toLong))
    val tb = typ.getBytes("US-ASCII")
    val crc = new CRC32
    crc.update(tb); crc.update(data)
    out.write(tb); out.write(data); out.write(be32(crc.getValue))
  }

  /** Minimal valid 8-bit grayscale PNG: signature + IHDR + one IDAT
    * (deflate of filter-0-prefixed scanlines) + IEND. Pixel (x, y) =
    * (seed + x + y·width) · 37 mod 256 — deterministic, so tests can
    * assert decoded pixel values, not just dimensions.
    */
  def encodePng(width: Int, height: Int, seed: Long): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val out = new ByteArrayOutputStream()
    out.write(PngSig)
    val ihdr = new ByteArrayOutputStream()
    def be32(v: Int): Unit = {
      ihdr.write(v >>> 24); ihdr.write((v >>> 16) & 0xff)
      ihdr.write((v >>> 8) & 0xff); ihdr.write(v & 0xff)
    }
    be32(width); be32(height)
    ihdr.write(8)  // bit depth
    ihdr.write(0)  // color type: grayscale
    ihdr.write(0); ihdr.write(0); ihdr.write(0) // deflate / filter 0 / no interlace
    chunk(out, "IHDR", ihdr.toByteArray)
    val raw = new Array[Byte]((width + 1) * height)
    var y = 0
    while (y < height) {
      raw(y * (width + 1)) = 0 // filter type 0 (None) per scanline
      var x = 0
      while (x < width) {
        raw(y * (width + 1) + 1 + x) = (((seed + x + y.toLong * width) * 37) % 256).toByte
        x += 1
      }
      y += 1
    }
    val defl = new Deflater(Deflater.DEFAULT_COMPRESSION)
    defl.setInput(raw); defl.finish()
    val buf = new Array[Byte](raw.length + 64)
    val zout = new ByteArrayOutputStream()
    while (!defl.finished()) zout.write(buf, 0, defl.deflate(buf))
    defl.end()
    chunk(out, "IDAT", zout.toByteArray)
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Parsed PNG header (+ stored-vs-computed IHDR CRC check). */
  final case class PngMeta(width: Int, height: Int, bitDepth: Int,
      colorType: Int, crcOk: Boolean)

  def parsePng(b: Array[Byte]): PngMeta = {
    require(b.length >= 33 && PngSig.indices.forall(i => b(i) == PngSig(i)),
      "not a PNG: bad signature")
    def be32(o: Int): Int =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
        ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
    require(be32(8) == 13 && new String(b, 12, 4, "US-ASCII") == "IHDR",
      "not a PNG: first chunk is not IHDR")
    val crc = new CRC32
    crc.update(b, 12, 17) // type + 13 data bytes
    PngMeta(be32(16), be32(20), b(24) & 0xff, b(25) & 0xff,
      crcOk = crc.getValue == (be32(29).toLong & 0xffffffffL))
  }

  /** Decoded 8-bit grayscale pixels (row-major) — a REAL decode:
    * inflates the IDAT stream with the JDK's zlib and strips the
    * per-scanline filter bytes. Requires filter 0 (the only filter
    * encodePng emits); anything else fails loudly rather than
    * returning filtered bytes as pixels. */
  def pngPixels(b: Array[Byte]): Array[Int] = {
    val meta = parsePng(b)
    require(meta.bitDepth == 8 && meta.colorType == 0,
      s"expect 8-bit grayscale, got depth ${meta.bitDepth} type ${meta.colorType}")
    def be32(o: Int): Int =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
        ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
    val idat = new ByteArrayOutputStream()
    var o = 8
    var done = false
    while (!done && o + 8 <= b.length) {
      val len = be32(o)
      val typ = new String(b, o + 4, 4, "US-ASCII")
      if (typ == "IDAT") idat.write(b, o + 8, len)
      if (typ == "IEND") done = true
      o += 12 + len
    }
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    val raw = new Array[Byte]((meta.width + 1) * meta.height)
    var got = 0
    while (!inf.finished && got < raw.length) {
      val n = inf.inflate(raw, got, raw.length - got)
      require(n > 0 || inf.finished, "truncated IDAT stream")
      got += n
    }
    inf.end()
    require(got == raw.length, s"IDAT inflated to $got, expected ${raw.length}")
    val px = new Array[Int](meta.width * meta.height)
    var y = 0
    while (y < meta.height) {
      val rowOff = y * (meta.width + 1)
      require(raw(rowOff) == 0, "unsupported PNG filter type")
      var x = 0
      while (x < meta.width) {
        px(y * meta.width + x) = raw(rowOff + 1 + x) & 0xff
        x += 1
      }
      y += 1
    }
    px
  }

  // ---------------------------------------------------------------- WAV

  /** Minimal valid RIFF/WAVE: PCM mono 16-bit. Sample i =
    * ((seed + i) · 2654435761) mod 65536 − 32768 — deterministic, so the
    * audio test can assert decoded sample values.
    */
  def encodeWav(sampleRate: Int, nSamples: Int, seed: Long): Array[Byte] = {
    require(sampleRate > 0 && nSamples >= 0, s"bad wav params $sampleRate/$nSamples")
    val dataLen = nSamples * 2
    val out = new ByteArrayOutputStream()
    def ascii(sv: String): Unit = out.write(sv.getBytes("US-ASCII"))
    def le32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >>> 8) & 0xff)
      out.write((v >>> 16) & 0xff); out.write(v >>> 24)
    }
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    ascii("RIFF"); le32(36 + dataLen); ascii("WAVE")
    ascii("fmt "); le32(16)
    le16(1)              // PCM
    le16(1)              // mono
    le32(sampleRate)
    le32(sampleRate * 2) // byte rate
    le16(2)              // block align
    le16(16)             // bits per sample
    ascii("data"); le32(dataLen)
    var i = 0
    while (i < nSamples) {
      val v = (((seed + i) * 2654435761L) % 65536L).toInt - 32768
      le16(v & 0xffff)
      i += 1
    }
    out.toByteArray
  }

  /** Parsed WAV header (+ declared-vs-actual data length check). */
  final case class WavMeta(sampleRate: Int, nChannels: Int,
      bitsPerSample: Int, nSamples: Int, sizeOk: Boolean)

  def parseWav(b: Array[Byte]): WavMeta = {
    def tag(o: Int): String = new String(b, o, 4, "US-ASCII")
    require(b.length >= 44 && tag(0) == "RIFF" && tag(8) == "WAVE" &&
      tag(12) == "fmt " && tag(36) == "data", "not a canonical PCM WAV")
    def le32(o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    def le16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    require(le16(20) == 1, s"not PCM (format ${le16(20)})")
    val dataLen = le32(40)
    val bits = le16(34)
    val ch = le16(22)
    WavMeta(le32(24), ch, bits, dataLen / (ch * bits / 8),
      sizeOk = dataLen == b.length - 44 && le32(4) == b.length - 8)
  }

  /** 16-bit little-endian signed PCM samples of a canonical mono WAV —
    * the payload read, not just the header: feature extraction over
    * real media bytes starts here. */
  def wavSamples(b: Array[Byte]): Array[Int] = {
    val meta = parseWav(b)
    require(meta.bitsPerSample == 16 && meta.nChannels == 1,
      s"expect 16-bit mono PCM, got ${meta.bitsPerSample}-bit ${meta.nChannels}ch")
    Array.tabulate(meta.nSamples) { i =>
      val o = 44 + i * 2
      val raw = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
      if (raw >= 32768) raw - 65536 else raw
    }
  }

  /** Uppercase hex of the first n bytes — the format magic, surfaced as
    * a checked column so the oracle pins the actual byte content. */
  def magicHex(b: Array[Byte], n: Int): String =
    b.take(n).map(x => f"${x & 0xff}%02X").mkString
}
