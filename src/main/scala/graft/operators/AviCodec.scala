package graft.operators

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable.ArrayBuffer

/** A REAL (pure-JVM) video CONTAINER parser: RIFF/AVI — header metadata
  * (dimensions, frame timing, frame count) and the movi frame index, so
  * frame sampling slices actual container frames instead of fixed-size
  * byte windows. UNCOMPRESSED (`00db`) frame payloads are genuinely
  * pixel-decoded downstream via the shared DIB row machinery
  * ([[BmpCodec.dibFeatures]], driven by
  * [[graft.operators.MultimodalOps.decodeVideoPixels]]); COMPRESSED
  * (`00dc`) payloads stay opaque — decoding a compressed video codec is
  * not expressible in plain byte math, and those frames dead-letter at the
  * pixel stage rather than fake a decode.
  *
  * Layout handled: `RIFF..AVI ` / `LIST..hdrl` holding an `avih` main
  * header / `LIST..movi` holding `##dc`/`##db`/`##wb` frame chunks (padded
  * to even offsets per RIFF). Bounds are checked in Long arithmetic;
  * anything malformed throws [[MalformedAvi]] — corrupt media dead-letters.
  */
object AviCodec {

  final case class AviInfo(width: Int, height: Int, usPerFrame: Int,
                           nFrames: Int, durationUs: Long,
                           frames: Seq[(Int, Int)], // (offset, length) per video frame
                           codec: String = "") // strh fccHandler (e.g. "MJPG"), "" if absent

  final class MalformedAvi(msg: String) extends RuntimeException(msg)

  private val MaxFrames = 1 << 20

  /** Build a minimal spec-conforming AVI: avih main header + movi chunks.
    * `raw = true` writes `00db` (uncompressed DIB) frame chunks — the
    * variant whose payloads [[graft.operators.BmpCodec.dibFeatures]] can
    * genuinely pixel-decode; the default `00dc` marks compressed payloads.
    * A non-empty `fourcc` (e.g. "MJPG") also writes a `LIST strl`/`strh`
    * video stream header declaring the codec, as real muxers do.
    */
  def synth(width: Int, height: Int, usPerFrame: Int, frames: Seq[Array[Byte]],
            raw: Boolean = false, fourcc: String = ""): Array[Byte] = {
    require(width > 0 && height > 0 && usPerFrame > 0 && frames.nonEmpty)
    require(fourcc.isEmpty || fourcc.length == 4, s"fourcc must be 4 chars: '$fourcc'")
    def pad(n: Int) = n + (n & 1)
    val avihLen = 56
    val strhLen = 56
    val strlLen = if (fourcc.isEmpty) 0 else 8 + (4 + 8 + strhLen) // LIST hdr + 'strl' + strh
    val hdrlLen = 4 + 8 + avihLen + strlLen       // 'hdrl' + avih chunk [+ strl list]
    val moviLen = 4 + frames.map(f => 8 + pad(f.length)).sum
    val riffLen = 4 + (8 + hdrlLen) + (8 + moviLen)
    val buf = ByteBuffer.allocate(8 + riffLen).order(ByteOrder.LITTLE_ENDIAN)
    def tag(s: String) = buf.put(s.getBytes("ASCII"))
    tag("RIFF"); buf.putInt(riffLen); tag("AVI ")
    tag("LIST"); buf.putInt(hdrlLen); tag("hdrl")
    tag("avih"); buf.putInt(avihLen)
    buf.putInt(usPerFrame).putInt(0).putInt(0).putInt(0)
      .putInt(frames.length).putInt(0).putInt(1).putInt(0)
      .putInt(width).putInt(height).putInt(0).putInt(0).putInt(0).putInt(0)
    if (fourcc.nonEmpty) {
      tag("LIST"); buf.putInt(4 + 8 + strhLen); tag("strl")
      tag("strh"); buf.putInt(strhLen)
      tag("vids"); tag(fourcc)                    // fccType + fccHandler
      buf.putInt(0).putInt(0).putInt(0)           // flags, prio+lang, initialFrames
        .putInt(usPerFrame).putInt(1000000)       // scale/rate: rate/scale = fps
        .putInt(0).putInt(frames.length)          // start, length (frames)
        .putInt(0).putInt(-1).putInt(0)           // bufSize, quality, sampleSize
        .putInt(0).putInt(0)                      // rcFrame
    }
    tag("LIST"); buf.putInt(moviLen); tag("movi")
    frames.foreach { f =>
      tag(if (raw) "00db" else "00dc"); buf.putInt(f.length); buf.put(f)
      if ((f.length & 1) == 1) buf.put(0.toByte)
    }
    buf.array()
  }

  def decode(bytes: Array[Byte]): AviInfo = {
    def fail(msg: String) = throw new MalformedAvi(msg)
    if (bytes.length < 12) fail(s"too short for a RIFF header: ${bytes.length} bytes")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def ascii(off: Int, n: Int) = new String(bytes, off, n, "ASCII")
    if (ascii(0, 4) != "RIFF" || ascii(8, 4) != "AVI ")
      fail(s"not RIFF/AVI (got '${ascii(0, 4)}'/'${ascii(8, 4)}')")

    // ONE chunk walker for every RIFF level (top, hdrl, movi): id/len read,
    // Long-arithmetic overrun check, even-padding advance — the rules a
    // hostile file attacks, kept in a single place
    def walkChunks(from: Int, until: Int, ctx: String)(f: (String, Int, Int) => Unit): Unit = {
      var pos = from
      while (pos + 8 <= until) {
        val id = ascii(pos, 4)
        val len = buf.getInt(pos + 4)
        if (len < 0 || pos.toLong + 8L + len > until)
          fail(s"$ctx chunk '$id' length $len overruns at offset $pos")
        f(id, pos + 8, len)
        pos += 8 + len + (len & 1)
      }
    }

    var header: Option[(Int, Int, Int, Int)] = None // (usPerFrame, totalFrames, w, h)
    var codec = ""
    val frames = ArrayBuffer[(Int, Int)]()

    walkChunks(12, bytes.length, "top-level") {
      case ("LIST", dataOff, len) =>
        if (len < 4) fail(s"LIST chunk too short: $len")
        ascii(dataOff, 4) match {
          case "hdrl" =>
            walkChunks(dataOff + 4, dataOff + len, "hdrl") {
              case ("avih", hOff, hlen) if header.isEmpty =>
                if (hlen < 40) fail(s"avih too short: $hlen")
                header = Some((buf.getInt(hOff), buf.getInt(hOff + 16),
                  buf.getInt(hOff + 32), buf.getInt(hOff + 36)))
              case ("LIST", sOff, slen) if slen >= 4 && ascii(sOff, 4) == "strl" =>
                // stream header list: the VIDEO stream's fccHandler names
                // the frame codec (MJPG, DIB , ...), as real muxers write it
                walkChunks(sOff + 4, sOff + slen, "strl") {
                  case ("strh", hOff, hlen) if hlen >= 8 &&
                      ascii(hOff, 4) == "vids" && codec.isEmpty =>
                    codec = ascii(hOff + 4, 4).trim
                  case _ => ()
                }
              case _ => ()
            }
          case "movi" =>
            walkChunks(dataOff + 4, dataOff + len, "movi") {
              // video frame chunks: '##dc' (compressed), '##db' (raw)
              case (id, fOff, flen) if id.length == 4 && id(0).isDigit &&
                  id(1).isDigit && (id.endsWith("dc") || id.endsWith("db")) =>
                if (frames.size >= MaxFrames) fail(s"more than $MaxFrames frames")
                frames += ((fOff, flen))
              case _ => ()
            }
          case _ => // other lists skipped
        }
      case _ => // non-LIST top-level chunks (idx1, JUNK) skipped
    }

    val (usPerFrame, total, w, h) = header.getOrElse(fail("missing avih header"))
    if (w <= 0 || h <= 0 || usPerFrame <= 0) fail(s"bad avih: ${w}x$h @$usPerFrame us")
    if (total != frames.size)
      fail(s"avih declares $total frames but movi holds ${frames.size} — " +
        "a truncated or inconsistent file must not silently under-report")
    AviInfo(w, h, usPerFrame, frames.size,
      durationUs = frames.size.toLong * usPerFrame, frames = frames.toSeq,
      codec = codec)
  }

  /** Raw bytes of frame `k` (payload stays opaque — codec territory). */
  def frameBytes(bytes: Array[Byte], info: AviInfo, k: Int): Array[Byte] = {
    val (off, len) = info.frames(k)
    java.util.Arrays.copyOfRange(bytes, off, off + len)
  }
}
