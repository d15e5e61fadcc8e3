package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** A REAL (pure-JVM) audio codec for the multimodal pipeline: RIFF/WAVE
  * PCM parsing and synthesis, no native libraries. This replaces the
  * stubbed decode path for the audio modality — the container ships no
  * image/video codecs, but WAV is plain byte arithmetic, so the decode
  * stage of the pipeline can be exercised end-to-end with genuine parsing,
  * malformed-input failures included.
  *
  * Format notes: standard RIFF chunk stream (`RIFF<size>WAVE` then
  * `fmt ` / `data` chunks, little-endian); PCM integer samples, 8-bit
  * unsigned or 16-bit signed, any channel count. Odd-sized chunks are
  * padded to even offsets per the RIFF spec.
  */
object WavCodec {

  final case class WavInfo(
      sampleRate: Int, channels: Int, bitsPerSample: Int,
      nFrames: Long, durationUs: Long, rms: Double, peak: Int)

  final class MalformedWav(msg: String) extends RuntimeException(msg)

  /** Synthesize a PCM16LE mono WAV. */
  def synth(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("ASCII")).putInt(36 + dataLen).put("WAVE".getBytes("ASCII"))
    buf.put("fmt ".getBytes("ASCII")).putInt(16)
      .putShort(1.toShort)              // PCM
      .putShort(1.toShort)              // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)           // byte rate
      .putShort(2.toShort)              // block align
      .putShort(16.toShort)             // bits per sample
    buf.put("data".getBytes("ASCII")).putInt(dataLen)
    samples.foreach(s => buf.putShort(s))
    buf.array()
  }

  /** Validated header + data-chunk location shared by [[decode]] and
    * [[decodeSamples]]: (channels, sampleRate, bits, dataOff, dataLen).
    */
  private def parseChunks(bytes: Array[Byte]): (Int, Int, Int, Int, Int) = {
    def fail(msg: String) = throw new MalformedWav(msg)
    if (bytes.length < 12) fail(s"too short for a RIFF header: ${bytes.length} bytes")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def ascii(off: Int, n: Int) = new String(bytes, off, n, "ASCII")
    if (ascii(0, 4) != "RIFF" || ascii(8, 4) != "WAVE")
      fail(s"not RIFF/WAVE (got '${ascii(0, 4)}'/'${ascii(8, 4)}')")

    var pos = 12
    var fmt: Option[(Int, Int, Int)] = None // (channels, sampleRate, bits)
    var data: Option[(Int, Int)] = None     // (offset, length)
    while (pos + 8 <= bytes.length) {
      val id = ascii(pos, 4)
      val len = buf.getInt(pos + 4)
      // bound check in Long arithmetic: a hostile len near Int.MaxValue would
      // wrap `pos + 8 + len` negative and slip past an Int comparison
      if (len < 0 || pos.toLong + 8L + len > bytes.length)
        fail(s"chunk '$id' length $len overruns the payload at offset $pos")
      id match {
        case "fmt " =>
          if (len < 16) fail(s"fmt chunk too short: $len")
          val audioFormat = buf.getShort(pos + 8) & 0xffff
          if (audioFormat != 1) fail(s"not integer PCM (wFormatTag=$audioFormat)")
          fmt = Some((buf.getShort(pos + 10) & 0xffff, buf.getInt(pos + 12),
            buf.getShort(pos + 22) & 0xffff))
        case "data" => data = Some((pos + 8, len))
        case _ => // skip unknown chunks (LIST, fact, ...)
      }
      pos += 8 + len + (len & 1) // RIFF pads chunks to even boundaries
    }
    val (channels, rate, bits) = fmt.getOrElse(fail("missing fmt chunk"))
    val (off, len) = data.getOrElse(fail("missing data chunk"))
    if (channels <= 0 || rate <= 0) fail(s"bad fmt: channels=$channels rate=$rate")
    if (bits != 8 && bits != 16) fail(s"unsupported bit depth: $bits")
    val bytesPerFrame = channels * (bits / 8)
    if (len % bytesPerFrame != 0) fail(s"data length $len not a multiple of frame size $bytesPerFrame")
    (channels, rate, bits, off, len)
  }

  /** Parse a WAV payload and return the raw PCM samples as Ints (16-bit
    * signed or 8-bit offset-binary re-centered), channel-interleaved —
    * the decode seam for sample-level features (audio fingerprinting).
    * Same validation as [[decode]].
    */
  def decodeSamples(bytes: Array[Byte]): Array[Int] = {
    val (_, _, bits, off, len) = parseChunks(bytes)
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val nSamples = len / (bits / 8)
    Array.tabulate(nSamples)(i =>
      if (bits == 16) buf.getShort(off + i * 2).toInt
      else (bytes(off + i) & 0xff) - 128)
  }

  /** Parse a WAV payload and compute signal features (frame count,
    * duration, RMS, peak). Throws [[MalformedWav]] on anything that is not
    * a PCM RIFF/WAVE stream — a decode stage must FAIL on corrupt media,
    * not fabricate features (route failures to the dead-letter side).
    */
  def decode(bytes: Array[Byte]): WavInfo = {
    val (channels, rate, bits, off, len) = parseChunks(bytes)
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val nSamples = len / (bits / 8)
    var sumSq = 0L
    var peak = 0
    var i = 0
    while (i < nSamples) {
      val v = if (bits == 16) buf.getShort(off + i * 2).toInt
              else (bytes(off + i) & 0xff) - 128 // 8-bit WAV is unsigned
      sumSq += v.toLong * v
      if (math.abs(v) > peak) peak = math.abs(v)
      i += 1
    }
    val nFrames = nSamples / channels
    WavInfo(rate, channels, bits, nFrames,
      durationUs = nFrames * 1000000L / rate,
      rms = if (nSamples == 0) 0.0 else math.sqrt(sumSq.toDouble / nSamples),
      peak = peak)
  }
}
