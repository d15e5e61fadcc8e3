package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** A REAL (pure-JVM) image codec for the multimodal pipeline: uncompressed
  * 24-bit BMP parsing and synthesis — like [[WavCodec]], plain byte
  * arithmetic, no native libraries, so the image decode / feature-extract /
  * resize stages run genuinely instead of through the pseudo-feature stub.
  *
  * Decode extracts dimensions, mean luminance, and a `poolSize`² grayscale
  * thumbnail by integer average pooling (the deterministic "resize" step).
  * Handles bottom-up AND top-down (negative height) pixel order and the
  * 4-byte row padding rule; rejects everything else loudly
  * ([[MalformedBmp]]) — corrupt media must dead-letter, not fabricate.
  */
object BmpCodec {

  final case class BmpInfo(width: Int, height: Int, topDown: Boolean,
                           meanLum: Double, thumb: Array[Long])

  final class MalformedBmp(msg: String) extends RuntimeException(msg)

  private val FileHeader = 14
  private val InfoHeader = 40
  private val MaxDim = 1 << 15 // a hostile header must not drive allocation

  private def rowSize(width: Int): Int = (width * 3 + 3) & ~3

  /** Synthesize a 24-bit bottom-up BMP from a pixel function
    * (x, y) -> (r, g, b), y = 0 at the TOP of the image.
    */
  def synth(width: Int, height: Int, px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0 && width <= MaxDim && height <= MaxDim)
    val rs = rowSize(width)
    val dataLen = rs * height
    val buf = ByteBuffer.allocate(FileHeader + InfoHeader + dataLen)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
      .putInt(FileHeader + InfoHeader + dataLen)
      .putInt(0)                          // reserved
      .putInt(FileHeader + InfoHeader)    // pixel offset
    buf.putInt(InfoHeader).putInt(width).putInt(height)
      .putShort(1.toShort).putShort(24.toShort)
      .putInt(0)                          // BI_RGB (uncompressed)
      .putInt(dataLen).putInt(2835).putInt(2835).putInt(0).putInt(0)
    // bottom-up: file row 0 is the image's BOTTOM row
    for (fileRow <- 0 until height; x <- 0 until width) {
      val y = height - 1 - fileRow
      val (r, g, b) = px(x, y)
      val off = FileHeader + InfoHeader + fileRow * rs + x * 3
      buf.put(off, b.toByte).put(off + 1, g.toByte).put(off + 2, r.toByte)
    }
    buf.array()
  }

  def decode(bytes: Array[Byte], poolSize: Int = 4): BmpInfo = {
    def fail(msg: String) = throw new MalformedBmp(msg)
    if (bytes.length < FileHeader + InfoHeader) fail(s"too short: ${bytes.length} bytes")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    if (bytes(0) != 'B' || bytes(1) != 'M') fail("not a BMP (missing BM magic)")
    val pixelOff = buf.getInt(10)
    val infoSize = buf.getInt(14)
    if (infoSize < InfoHeader) fail(s"info header too small: $infoSize")
    val width = buf.getInt(18)
    val rawHeight = buf.getInt(22)
    val bpp = buf.getShort(28) & 0xffff
    val compression = buf.getInt(30)
    if (bpp != 24) fail(s"unsupported bit depth: $bpp (only 24bpp)")
    if (compression != 0) fail(s"unsupported compression: $compression")
    val topDown = rawHeight < 0
    // abs in Long: math.abs(Int.MinValue) stays negative and would sail
    // through every later check with a "successful" fabricated decode
    val heightL = math.abs(rawHeight.toLong)
    if (width <= 0 || heightL == 0 || width > MaxDim || heightL > MaxDim)
      fail(s"unreasonable dimensions ${width}x$rawHeight")
    val height = heightL.toInt
    val rs = rowSize(width)
    // all bounds in Long: hostile headers must not wrap Int arithmetic
    if (pixelOff < FileHeader + InfoHeader ||
        pixelOff.toLong + rs.toLong * height > bytes.length)
      fail(s"pixel data ${rs.toLong * height} bytes at $pixelOff overruns payload ${bytes.length}")

    require(poolSize > 0, "poolSize must be positive")
    val tSums = Array.ofDim[Long](poolSize * poolSize)
    val tCounts = Array.ofDim[Long](poolSize * poolSize)
    var lumSum = 0L
    var y = 0
    while (y < height) {
      val fileRow = if (topDown) y else height - 1 - y
      val rowOff = pixelOff + fileRow * rs
      var x = 0
      while (x < width) {
        val off = rowOff + x * 3
        val gray = (bytes(off) & 0xff) + (bytes(off + 1) & 0xff) + (bytes(off + 2) & 0xff)
        lumSum += gray
        val cell = math.min(y * poolSize / height, poolSize - 1) * poolSize +
          math.min(x * poolSize / width, poolSize - 1)
        tSums(cell) += gray
        tCounts(cell) += 1
        x += 1
      }
      y += 1
    }
    val n = width.toLong * height
    val thumb = Array.tabulate(poolSize * poolSize)(i =>
      if (tCounts(i) == 0) 0L else tSums(i) / tCounts(i))
    BmpInfo(width, height, topDown, lumSum.toDouble / (3.0 * n), thumb)
  }
}
