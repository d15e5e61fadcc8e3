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

  private[graft] def rowSize(width: Int): Int = (width * 3 + 3) & ~3

  /** Raw 24-bpp bottom-up DIB pixel data (4-byte-aligned BGR rows, no file
    * headers) from a pixel function (x, y) -> (r, g, b), y = 0 at the TOP.
    * This is the payload format shared by BMP files and uncompressed AVI
    * `00db` frame chunks — [[synth]] wraps it in BMP headers,
    * [[AviCodec.synth]] can embed it as frame payloads.
    */
  private[graft] def dibBytes(width: Int, height: Int,
                                  px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0 && width <= MaxDim && height <= MaxDim)
    val rs = rowSize(width)
    val out = new Array[Byte](rs * height)
    // bottom-up: file row 0 is the image's BOTTOM row
    for (fileRow <- 0 until height; x <- 0 until width) {
      val y = height - 1 - fileRow
      val (r, g, b) = px(x, y)
      val off = fileRow * rs + x * 3
      out(off) = b.toByte; out(off + 1) = g.toByte; out(off + 2) = r.toByte
    }
    out
  }

  /** Synthesize a 24-bit bottom-up BMP from a pixel function
    * (x, y) -> (r, g, b), y = 0 at the TOP of the image.
    */
  def synth(width: Int, height: Int, px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val data = dibBytes(width, height, px)
    val buf = ByteBuffer.allocate(FileHeader + InfoHeader + data.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
      .putInt(FileHeader + InfoHeader + data.length)
      .putInt(0)                          // reserved
      .putInt(FileHeader + InfoHeader)    // pixel offset
    buf.putInt(InfoHeader).putInt(width).putInt(height)
      .putShort(1.toShort).putShort(24.toShort)
      .putInt(0)                          // BI_RGB (uncompressed)
      .putInt(data.length).putInt(2835).putInt(2835).putInt(0).putInt(0)
    buf.put(data)
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

    val (meanLum, thumb) = dibFeatures(bytes, pixelOff, width, height, topDown, poolSize)
    BmpInfo(width, height, topDown, meanLum, thumb)
  }

  /** Feature-extract + average-pooled thumbnail over a raw 24-bpp DIB pixel
    * array at `pixelOff` — the row machinery shared by BMP files and
    * uncompressed AVI `00db` frames. Caller has validated bounds
    * (`pixelOff + rowSize(width)·height <= bytes.length`).
    */
  private[graft] def dibFeatures(bytes: Array[Byte], pixelOff: Int, width: Int,
                                     height: Int, topDown: Boolean,
                                     poolSize: Int): (Double, Array[Long]) = {
    require(poolSize > 0, "poolSize must be positive")
    val rs = rowSize(width)
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
    (lumSum.toDouble / (3.0 * n), thumb)
  }
}
