package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.JpegCodec
import graft.operators.JpegCodec.MalformedJpeg

class JpegCodecSpec extends AnyFunSuite {

  private def gray(img: JpegCodec.JpegImage, x: Int, y: Int): Int =
    img.rgb(y * img.width + x) & 0xff // grayscale: r == g == b

  test("per-8x8-block-constant grayscale roundtrips BIT-EXACTLY under unit quant") {
    // the fixture contract behind the q_video_mjpeg oracle: a constant
    // block's DCT is DC-only, the DC path is integer all the way, so
    // encode -> Huffman -> decode -> IDCT reproduces every pixel exactly
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 5) {
      val w = 8 * (2 + rnd.nextInt(4))
      val h = 8 * (1 + rnd.nextInt(4))
      val blocks = Array.fill((h / 8) * (w / 8))(rnd.nextInt(256))
      def px(x: Int, y: Int): Int = blocks((y / 8) * (w / 8) + (x / 8))
      val img = JpegCodec.decode(JpegCodec.encodeGray(w, h, px))
      assert(img.width == w && img.height == h && img.nComponents == 1)
      for (y <- 0 until h; x <- 0 until w)
        assert(gray(img, x, y) == px(x, y), s"trial $trial pixel ($x,$y)")
    }
  }

  test("general grayscale roundtrip stays within the quantization error bound") {
    val (w, h) = (40, 24) // non-MCU-aligned width exercises edge replication
    def px(x: Int, y: Int): Int =
      ((x * 255 / (w - 1)) + (if (((x / 2) + (y / 2)) % 2 == 0) 32 else 0)).min(255)
    val img = JpegCodec.decode(JpegCodec.encodeGray(w, h, px))
    assert(img.width == w && img.height == h)
    // unit quant: per-coefficient rounding error <= 0.5, worst-case spatial
    // error <= 0.5 * 64 * 0.25 = 8; in practice far below
    val errs = for (y <- 0 until h; x <- 0 until w) yield math.abs(gray(img, x, y) - px(x, y))
    assert(errs.max <= 8, s"max err ${errs.max}")
    assert(errs.sum.toDouble / errs.size <= 1.5, s"mean err ${errs.sum.toDouble / errs.size}")
  }

  test("4:4:4 color roundtrip recovers RGB within combined rounding bounds") {
    val (w, h) = (24, 16)
    def px(x: Int, y: Int): (Int, Int, Int) =
      ((x * 255 / (w - 1)).min(255), ((y * 255) / (h - 1)).min(255), (x * y) % 256)
    val img = JpegCodec.decode(JpegCodec.encodeColor(w, h, px))
    assert(img.nComponents == 3)
    val errs = for (y <- 0 until h; x <- 0 until w) yield {
      val p = img.rgb(y * img.width + x)
      val (r, g, b) = px(x, y)
      math.abs(((p >> 16) & 0xff) - r) max math.abs(((p >> 8) & 0xff) - g) max
        math.abs((p & 0xff) - b)
    }
    assert(errs.max <= 10, s"max channel err ${errs.max}")
  }

  test("4:2:0 subsampled roundtrip: solid color is near-exact, MCU geometry holds") {
    val (w, h) = (20, 12) // forces 2x2-sampled MCU padding on both axes
    val img = JpegCodec.decode(JpegCodec.encodeColor(w, h, (_, _) => (80, 160, 96),
      subsample420 = true))
    assert(img.width == w && img.height == h)
    for (y <- 0 until h; x <- 0 until w) {
      val p = img.rgb(y * img.width + x)
      assert(math.abs(((p >> 16) & 0xff) - 80) <= 3 &&
        math.abs(((p >> 8) & 0xff) - 160) <= 3 && math.abs((p & 0xff) - 96) <= 3,
        s"pixel ($x,$y) = 0x$p%06X")
    }
  }

  test("NON-UNIFORM quant table roundtrips within its quantization bound") {
    // Regression pin for the DQT zigzag bug: the stream carries quant
    // tables in zigzag order, and a decoder that forgets to de-zigzag
    // dequantizes AC coefficient k with Q[Zigzag(Zigzag(k))] instead of
    // Q[Zigzag(k)]. Unit quant is invariant under any permutation, so only
    // a non-uniform table catches it (observed maxErr ~226 with the bug).
    // Table: 1 at DC, growing with scan position — NOT zigzag-symmetric.
    val qt = Array.tabulate(64)(i => 1 + (i % 5) + i / 16)
    val (w, h) = (40, 24)
    def px(x: Int, y: Int): Int =
      ((x * 255 / (w - 1)) + (if (((x / 2) + (y / 2)) % 2 == 0) 32 else 0)).min(255)
    val img = JpegCodec.decode(JpegCodec.encodeGray(w, h, px, quant = qt))
    assert(img.width == w && img.height == h)
    val errs = for (y <- 0 until h; x <- 0 until w) yield math.abs(gray(img, x, y) - px(x, y))
    // per-coefficient error <= Q_k/2; the worst table entry here is 8, so
    // spatial error stays small — far below the ~226 the index bug produced
    assert(errs.max <= 20, s"max err ${errs.max}")
    // block-constant + non-uniform table with Q[DC]=1 stays BIT-exact: the
    // image is DC-only, so every AC entry of the table is irrelevant
    val bc = JpegCodec.decode(
      JpegCodec.encodeGray(32, 16, (x, y) => (x / 8) * 13 + (y / 8) * 40, quant = qt))
    for (y <- 0 until 16; x <- 0 until 32)
      assert(gray(bc, x, y) == (x / 8) * 13 + (y / 8) * 40, s"pixel ($x,$y)")
    // 4:2:0 color path shares the same dequant: solid color stays near-exact
    val col = JpegCodec.decode(
      JpegCodec.encodeColor(20, 12, (_, _) => (80, 160, 96), subsample420 = true, quant = qt))
    for (y <- 0 until 12; x <- 0 until 20) {
      val p = col.rgb(y * col.width + x)
      assert(math.abs(((p >> 16) & 0xff) - 80) <= 6 &&
        math.abs(((p >> 8) & 0xff) - 160) <= 6 && math.abs((p & 0xff) - 96) <= 6)
    }
  }

  test("restart markers: DRI + RSTn cycle decodes identically to the plain scan") {
    val (w, h) = (48, 16) // 6x2 blocks: the RST index wraps within one image
    def px(x: Int, y: Int): Int =
      ((x * 255 / (w - 1)) + (if ((x / 8 + y / 8) % 2 == 0) 16 else 0)).min(255)
    val plain = JpegCodec.decode(JpegCodec.encodeGray(w, h, px))
    for (interval <- Seq(1, 3)) {
      val rst = JpegCodec.decode(JpegCodec.encodeGray(w, h, px, restartInterval = interval))
      assert(rst.rgb.sameElements(plain.rgb),
        s"interval $interval decoded differently from the plain scan")
    }
    // block-constant + restarts stays bit-exact end to end
    val bc = JpegCodec.decode(
      JpegCodec.encodeGray(w, h, (x, y) => (x / 8) * 20 + (y / 8) * 50, restartInterval = 2))
    for (y <- 0 until h; x <- 0 until w)
      assert(gray(bc, x, y) == (x / 8) * 20 + (y / 8) * 50)
    // a MISSING restart marker (stream says DRI but no RST follows) fails
    // loudly instead of desynchronizing silently
    val broken = JpegCodec.encodeGray(w, h, px, restartInterval = 1)
    val rstPos = broken.indices.find(i => (broken(i) & 0xff) == 0xFF &&
      (broken(i + 1) & 0xff) >= 0xD0 && (broken(i + 1) & 0xff) <= 0xD7).get
    broken(rstPos + 1) = 0xD5.toByte // wrong sequence number (expected RST0)
    val e = intercept[MalformedJpeg](JpegCodec.decode(broken))
    assert(e.getMessage.contains("RST"))
  }

  test("progressive (SOF2) dead-letters instead of decoding") {
    val bytes = JpegCodec.encodeGray(16, 16, (_, _) => 100)
    // flip the SOF0 marker to SOF2: same payload, progressive declaration
    val idx = bytes.indices.find(i =>
      (bytes(i) & 0xff) == 0xFF && (bytes(i + 1) & 0xff) == 0xC0).get
    bytes(idx + 1) = 0xC2.toByte
    val e = intercept[MalformedJpeg](JpegCodec.decode(bytes))
    assert(e.getMessage.contains("progressive"))
  }

  test("truncated and corrupt payloads dead-letter") {
    val bytes = JpegCodec.encodeGray(32, 32, (x, y) => (x * y) % 256)
    intercept[MalformedJpeg](JpegCodec.decode(bytes.take(bytes.length / 2)))
    intercept[MalformedJpeg](JpegCodec.decode(Array[Byte](1, 2, 3, 4, 5)))
    intercept[MalformedJpeg](JpegCodec.decode(Array.fill[Byte](64)(0xFF.toByte)))
  }
}
