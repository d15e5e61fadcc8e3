package graft.operators

import java.io.ByteArrayOutputStream

/** A REAL (pure-JVM) baseline JPEG codec (ITU-T T.81 sequential DCT,
  * Huffman entropy coding) — closes the multimodal family's compressed-
  * video seam: AVI `00dc` MJPEG frame payloads pixel-decode through this
  * instead of dead-lettering (reference stores opaque media blobs,
  * influx_service.py:179-181; the engine's media columns decode for real).
  *
  * Decoder surface: SOI/APPn/COM/DQT/DRI/SOF0/SOF1/DHT/SOS/EOI; 1- or
  * 3-component scans, interleaved MCUs with sampling factors 1-2 on each
  * axis (4:4:4, 4:2:2, 4:2:0), restart markers, byte unstuffing, 8-bit
  * quant tables. Everything else — notably SOF2 progressive — throws
  * [[JpegCodec.MalformedJpeg]] so corrupt or unsupported media
  * DEAD-LETTERS rather than fabricating pixels.
  *
  * Encoder surface (fixture + roundtrip side): grayscale or YCbCr
  * (4:4:4 / 4:2:0) baseline with a caller-supplied quant table. With the
  * default unit quant table a per-8x8-block-constant image roundtrips
  * BIT-EXACTLY (the block's DCT is DC-only and the DC path is integer all
  * the way), which is what makes a closed-form SQL oracle possible for
  * MJPEG fixtures — same discipline as [[BmpCodec]]'s DIB frames.
  *
  * Huffman tables are canonical single-length tables generated in code
  * (12 DC categories at 8 bits, the 162 standard run/size symbols at
  * 9 bits): spec-valid (no all-ones code, decodable by any conforming
  * decoder), shared by both sides, and free of 162-entry transcription
  * risk. Compression ratio is irrelevant here — correctness is the gate.
  */
object JpegCodec {

  final class MalformedJpeg(msg: String) extends RuntimeException(msg)
  private def fail(msg: String): Nothing = throw new MalformedJpeg(msg)

  private val MaxDim = 1 << 15

  // zig-zag scan order: zigzag(k) = natural (row*8+col) index of the k-th
  // coefficient in scan order (T.81 Figure 5)
  private[operators] val Zigzag: Array[Int] = {
    val z = new Array[Int](64)
    var x = 0; var y = 0
    var up = true
    for (k <- 0 until 64) {
      z(k) = y * 8 + x
      if (up) {
        if (x == 7) { y += 1; up = false }
        else if (y == 0) { x += 1; up = false }
        else { x += 1; y -= 1 }
      } else {
        if (y == 7) { x += 1; up = true }
        else if (x == 0) { y += 1; up = true }
        else { x -= 1; y += 1 }
      }
    }
    z
  }

  /** Unit quant table: lossless for DC-only (per-block-constant) blocks. */
  val UnitQuant: Array[Int] = Array.fill(64)(1)

  // ---------- canonical Huffman tables (generated, single code length) ----

  /** (bits-per-length[1..16], symbol list): DC categories 0..11 at length
    * 8; AC run/size symbols (EOB, ZRL, then (r,s) for r 0..15, s 1..10)
    * at length 9.
    */
  private val DcSpec: (Array[Int], Array[Int]) = {
    val bits = new Array[Int](17); bits(8) = 12
    (bits, (0 to 11).toArray)
  }
  private val AcSpec: (Array[Int], Array[Int]) = {
    val bits = new Array[Int](17); bits(9) = 162
    val syms = Array(0x00, 0xF0) ++
      (for (r <- 0 to 15; s <- 1 to 10) yield (r << 4) | s)
    (bits, syms)
  }

  /** Canonical code assignment: (code, length) per symbol, in spec order. */
  private def buildCodes(bits: Array[Int], syms: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    for (len <- 1 to 16) {
      for (_ <- 0 until bits(len)) { out += syms(k) -> (code, len); code += 1; k += 1 }
      code <<= 1
    }
    out.result()
  }

  /** Decode tables in the T.81 F.2.2.3 form: per length, the min/max code
    * and the index of the first symbol of that length.
    */
  private final class HuffTable(bits: Array[Int], val syms: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      for (len <- 1 to 16) {
        if (bits(len) > 0) {
          valPtr(len) = k
          minCode(len) = code
          code += bits(len); k += bits(len)
          maxCode(len) = code - 1
        }
        code <<= 1
      }
      if (k != syms.length) fail(s"DHT declares $k codes for ${syms.length} symbols")
    }
  }

  // ---------- bit IO ----------

  private final class BitWriter(out: ByteArrayOutputStream) {
    private var acc = 0
    private var nBits = 0
    def write(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >>> i) & 1)
        nBits += 1
        if (nBits == 8) {
          out.write(acc)
          if (acc == 0xFF) out.write(0x00) // byte stuffing
          acc = 0; nBits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (nBits > 0) { // pad with 1s (T.81 F.1.2.3)
      acc = (acc << (8 - nBits)) | ((1 << (8 - nBits)) - 1)
      out.write(acc)
      if (acc == 0xFF) out.write(0x00)
      acc = 0; nBits = 0
    }
  }

  /** Entropy-segment reader: unstuffs FF00, stops at any real marker. */
  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nBits = 0
    def nextBit(): Int = {
      if (nBits == 0) {
        if (pos >= bytes.length) fail("entropy data ends mid-symbol")
        val b = bytes(pos) & 0xff
        if (b == 0xFF) {
          if (pos + 1 >= bytes.length) fail("dangling 0xFF at end of scan")
          val m = bytes(pos + 1) & 0xff
          if (m != 0x00) fail(f"marker 0xFF$m%02X inside an entropy segment")
          pos += 2
        } else pos += 1
        acc = b; nBits = 8
      }
      nBits -= 1
      (acc >>> nBits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | nextBit(); i += 1 }
      v
    }
    def decodeHuff(t: HuffTable): Int = {
      var code = nextBit()
      var len = 1
      while (len <= 16) {
        if (t.maxCode(len) >= 0 && code <= t.maxCode(len))
          return t.syms(t.valPtr(len) + code - t.minCode(len))
        code = (code << 1) | nextBit()
        len += 1
      }
      fail("invalid Huffman code (no symbol within 16 bits)")
    }
    /** Byte-align and consume an expected RSTn marker. */
    def restart(expected: Int): Unit = {
      nBits = 0
      if (pos + 1 >= bytes.length) fail("missing restart marker")
      if ((bytes(pos) & 0xff) != 0xFF || (bytes(pos + 1) & 0xff) != (0xD0 + expected))
        fail(f"expected RST$expected%d, got 0x${bytes(pos) & 0xff}%02X${bytes(pos + 1) & 0xff}%02X")
      pos += 2
    }
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  // ---------- DCT ----------

  // separable 8-point DCT basis: c(u) * cos((2x+1) u pi / 16) / 2
  private val Cos: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    0.5 * cu * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** In-place 2D IDCT of a natural-order coefficient block -> spatial. */
  private def idct(block: Array[Double]): Unit = {
    val tmp = new Array[Double](64)
    // rows: tmp(y,x) = sum_u F(y,u) * Cos(u,x)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += block(y * 8 + u) * Cos(u)(x); u += 1 }
        tmp(y * 8 + x) = s
        x += 1
      }
      y += 1
    }
    // cols: out(y,x) = sum_v tmp(v,x) * Cos(v,y)
    var x = 0
    while (x < 8) {
      var yy = 0
      while (yy < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += tmp(v * 8 + x) * Cos(v)(yy); v += 1 }
        block(yy * 8 + x) = s
        yy += 1
      }
      x += 1
    }
  }

  /** Forward 2D DCT of a level-shifted spatial block (natural order). */
  private def fdct(block: Array[Double]): Unit = {
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) { s += block(y * 8 + x) * Cos(u)(x); x += 1 }
        tmp(y * 8 + u) = s
        u += 1
      }
      y += 1
    }
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var yy = 0
        while (yy < 8) { s += tmp(yy * 8 + u) * Cos(v)(yy); yy += 1 }
        block(v * 8 + u) = s
        v += 1
      }
      u += 1
    }
  }

  // ---------- decoder ----------

  final case class JpegImage(width: Int, height: Int, nComponents: Int,
                             rgb: Array[Int]) // packed 0xRRGGBB, row-major

  private final case class Component(id: Int, h: Int, v: Int, tq: Int,
                                     var dcTable: Int = 0, var acTable: Int = 0)

  def decode(bytes: Array[Byte]): JpegImage = {
    if (bytes.length < 4) fail(s"too short for a JPEG: ${bytes.length} bytes")
    if ((bytes(0) & 0xff) != 0xFF || (bytes(1) & 0xff) != 0xD8)
      fail("not a JPEG (missing SOI)")
    var pos = 2
    def u8(i: Int): Int = {
      if (i >= bytes.length) fail("truncated JPEG header")
      bytes(i) & 0xff
    }
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)

    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var comps: Seq[Component] = Nil
    var width = 0; var height = 0
    var restartInterval = 0
    var sofSeen = false

    var scanStart = -1
    var scanComps: Seq[Component] = Nil
    while (scanStart < 0) {
      if (u8(pos) != 0xFF) fail(f"expected marker at offset $pos, got 0x${u8(pos)}%02X")
      val marker = u8(pos + 1)
      marker match {
        case 0xD8 => pos += 2 // stray SOI: tolerate
        case 0xD9 => fail("EOI before any scan data")
        case 0xC0 | 0xC1 => // baseline / extended sequential, Huffman
          val len = u16(pos + 2)
          val prec = u8(pos + 4)
          if (prec != 8) fail(s"unsupported sample precision $prec (only 8)")
          height = u16(pos + 5); width = u16(pos + 7)
          if (width <= 0 || height <= 0 || width > MaxDim || height > MaxDim)
            fail(s"unreasonable dimensions ${width}x$height")
          val n = u8(pos + 9)
          if (n != 1 && n != 3) fail(s"unsupported component count $n (1 or 3)")
          comps = (0 until n).map { i =>
            val off = pos + 10 + i * 3
            val hv = u8(off + 1)
            val c = Component(u8(off), hv >> 4, hv & 15, u8(off + 2))
            if (c.h < 1 || c.h > 2 || c.v < 1 || c.v > 2)
              fail(s"unsupported sampling ${c.h}x${c.v} (1-2 per axis)")
            c
          }
          sofSeen = true
          pos += 2 + len
        case 0xC2 => fail("progressive JPEG (SOF2) is not baseline — unsupported")
        case m if m >= 0xC3 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC =>
          fail(f"unsupported SOF marker 0xFF$m%02X (baseline only)")
        case 0xC4 => // DHT
          val len = u16(pos + 2)
          var p = pos + 4
          val end = pos + 2 + len
          while (p < end) {
            val tcTh = u8(p)
            val bits = new Array[Int](17)
            var total = 0
            for (l <- 1 to 16) { bits(l) = u8(p + l); total += bits(l) }
            if (total > 256) fail(s"DHT declares $total codes")
            val syms = Array.tabulate(total)(i => u8(p + 17 + i))
            val t = new HuffTable(bits, syms)
            if ((tcTh >> 4) == 0) dcTabs(tcTh & 15) = t else acTabs(tcTh & 15) = t
            p += 17 + total
          }
          pos += 2 + len
        case 0xDB => // DQT
          val len = u16(pos + 2)
          var p = pos + 4
          val end = pos + 2 + len
          while (p < end) {
            val pqTq = u8(p)
            if ((pqTq >> 4) != 0) fail("16-bit quant tables unsupported")
            // The stream carries the table in zigzag scan order (T.81 B.2.4.1);
            // de-zigzag here so qt is natural (row-major) order like the coef
            // indices at the use sites — qt(Zigzag(k)) then picks the entry for
            // scan position k.
            val tq = new Array[Int](64)
            for (i <- 0 until 64) tq(Zigzag(i)) = u8(p + 1 + i)
            quant(pqTq & 15) = tq
            p += 65
          }
          pos += 2 + len
        case 0xDD => // DRI
          restartInterval = u16(pos + 4)
          pos += 2 + u16(pos + 2)
        case 0xDA => // SOS
          if (!sofSeen) fail("SOS before SOF")
          val len = u16(pos + 2)
          val ns = u8(pos + 4)
          if (ns != comps.size)
            fail(s"scan has $ns components, frame has ${comps.size} (single interleaved scan only)")
          scanComps = (0 until ns).map { i =>
            val cid = u8(pos + 5 + i * 2)
            val tabs = u8(pos + 6 + i * 2)
            val c = comps.find(_.id == cid).getOrElse(fail(s"scan names unknown component $cid"))
            c.dcTable = tabs >> 4; c.acTable = tabs & 15
            c
          }
          scanStart = pos + 2 + len
        case m if (m >= 0xE0 && m <= 0xEF) || m == 0xFE => // APPn / COM
          pos += 2 + u16(pos + 2)
        case 0x01 => pos += 2 // TEM
        case m if m >= 0xD0 && m <= 0xD7 => pos += 2 // stray RST outside scan
        case m => fail(f"unexpected marker 0xFF$m%02X in header")
      }
    }

    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcuW = 8 * hMax; val mcuH = 8 * vMax
    val mcusX = (width + mcuW - 1) / mcuW
    val mcusY = (height + mcuH - 1) / mcuH

    // per-component sample planes, padded to whole MCUs
    val planeW = comps.map(c => mcusX * c.h * 8)
    val planeH = comps.map(c => mcusY * c.v * 8)
    val planes = comps.indices.map(i => new Array[Int](planeW(i) * planeH(i))).toArray

    val r = new BitReader(bytes, scanStart)
    val dcPred = new Array[Int](comps.size)
    val coef = new Array[Double](64)
    var rstCount = 0
    var rstIdx = 0
    // scan order -> frame (plane) index, by component id
    val frameIdx = scanComps.map(c => comps.indexWhere(_.id == c.id)).toArray

    def decodeBlock(ci: Int, bx: Int, by: Int): Unit = {
      val c = scanComps(ci)
      val fi = frameIdx(ci)
      val qt = quant(c.tq)
      if (qt == null) fail(s"component ${c.id} references undefined quant table ${c.tq}")
      val dcT = dcTabs(c.dcTable); val acT = acTabs(c.acTable)
      if (dcT == null || acT == null) fail(s"component ${c.id} references undefined Huffman table")
      java.util.Arrays.fill(coef, 0.0)
      val s = r.decodeHuff(dcT)
      if (s > 11) fail(s"DC category $s out of range")
      val diff = extend(r.receive(s), s)
      dcPred(ci) += diff
      coef(0) = dcPred(ci).toDouble * qt(0)
      var k = 1
      while (k < 64) {
        val rs = r.decodeHuff(acT)
        val run = rs >> 4; val size = rs & 15
        if (size == 0) {
          if (run == 15) k += 16 // ZRL
          else k = 64 // EOB
        } else {
          k += run
          if (k > 63) fail("AC run overflows the block")
          coef(Zigzag(k)) = extend(r.receive(size), size).toDouble * qt(Zigzag(k))
          k += 1
        }
      }
      idct(coef)
      val pw = planeW(fi)
      val px0 = bx * 8; val py0 = by * 8
      var yy = 0
      while (yy < 8) {
        var xx = 0
        while (xx < 8) {
          val v = math.round(coef(yy * 8 + xx)).toInt + 128
          planes(fi)((py0 + yy) * pw + (px0 + xx)) =
            if (v < 0) 0 else if (v > 255) 255 else v
          xx += 1
        }
        yy += 1
      }
    }

    var mcu = 0
    val totalMcus = mcusX * mcusY
    while (mcu < totalMcus) {
      if (restartInterval > 0 && rstCount == restartInterval) {
        r.restart(rstIdx)
        rstIdx = (rstIdx + 1) % 8
        rstCount = 0
        java.util.Arrays.fill(dcPred, 0)
      }
      val mx = mcu % mcusX; val my = mcu / mcusX
      var ci = 0
      while (ci < scanComps.size) {
        val c = scanComps(ci)
        var v = 0
        while (v < c.v) {
          var h = 0
          while (h < c.h) {
            decodeBlock(ci, mx * c.h + h, my * c.v + v)
            h += 1
          }
          v += 1
        }
        ci += 1
      }
      rstCount += 1
      mcu += 1
    }

    // upsample + color-convert into packed RGB
    val rgb = new Array[Int](width * height)
    if (comps.size == 1) {
      val p = planes(0); val pw = planeW(0)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val g = p(y * pw + x)
          rgb(y * width + x) = (g << 16) | (g << 8) | g
          x += 1
        }
        y += 1
      }
    } else {
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          def samp(i: Int): Int = {
            val c = comps(i)
            planes(i)((y * c.v / vMax) * planeW(i) + (x * c.h / hMax))
          }
          val yv = samp(0).toDouble
          val cb = samp(1) - 128.0
          val cr = samp(2) - 128.0
          def clamp(d: Double): Int = {
            val v = math.round(d).toInt
            if (v < 0) 0 else if (v > 255) 255 else v
          }
          val rr = clamp(yv + 1.402 * cr)
          val gg = clamp(yv - 0.344136 * cb - 0.714136 * cr)
          val bb = clamp(yv + 1.772 * cb)
          rgb(y * width + x) = (rr << 16) | (gg << 8) | bb
          x += 1
        }
        y += 1
      }
    }
    JpegImage(width, height, comps.size, rgb)
  }

  /** Mean luminance + average-pooled thumbnail with EXACTLY the
    * [[BmpCodec.dibFeatures]] math (gray = r+g+b, integer cell division),
    * so MJPEG frames flow through the same feature contract as DIB frames.
    */
  def features(img: JpegImage, poolSize: Int): (Double, Array[Long]) = {
    require(poolSize > 0, "poolSize must be positive")
    val tSums = new Array[Long](poolSize * poolSize)
    val tCounts = new Array[Long](poolSize * poolSize)
    var lumSum = 0L
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        val p = img.rgb(y * img.width + x)
        val gray = ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
        lumSum += gray
        val cell = math.min(y * poolSize / img.height, poolSize - 1) * poolSize +
          math.min(x * poolSize / img.width, poolSize - 1)
        tSums(cell) += gray
        tCounts(cell) += 1
        x += 1
      }
      y += 1
    }
    val n = img.width.toLong * img.height
    val thumb = Array.tabulate(poolSize * poolSize)(i =>
      if (tCounts(i) == 0) 0L else tSums(i) / tCounts(i))
    (lumSum.toDouble / (3.0 * n), thumb)
  }

  // ---------- encoder ----------

  private def writeMarkers(out: ByteArrayOutputStream, quantTables: Seq[Array[Int]],
                           width: Int, height: Int,
                           comps: Seq[(Int, Int, Int, Int)],
                           restartInterval: Int = 0): Unit = {
    def m(b: Int): Unit = { out.write(0xFF); out.write(b) }
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    m(0xD8) // SOI
    quantTables.zipWithIndex.foreach { case (qt, i) =>
      m(0xDB); u16(2 + 65); out.write(i) // Pq=0 (8-bit), Tq=i
      for (k <- 0 until 64) out.write(qt(Zigzag(k)))
    }
    if (restartInterval > 0) { m(0xDD); u16(4); u16(restartInterval) }
    m(0xC0); u16(8 + comps.size * 3); out.write(8); u16(height); u16(width)
    out.write(comps.size)
    comps.foreach { case (id, h, v, tq) =>
      out.write(id); out.write((h << 4) | v); out.write(tq)
    }
    def dht(tc: Int, th: Int, spec: (Array[Int], Array[Int])): Unit = {
      val (bits, syms) = spec
      m(0xC4); u16(2 + 1 + 16 + syms.length); out.write((tc << 4) | th)
      for (l <- 1 to 16) out.write(bits(l))
      syms.foreach(out.write)
    }
    dht(0, 0, DcSpec); dht(1, 0, AcSpec)
    if (comps.size > 1) { dht(0, 1, DcSpec); dht(1, 1, AcSpec) }
    m(0xDA); u16(6 + comps.size * 2); out.write(comps.size)
    comps.zipWithIndex.foreach { case ((id, _, _, _), i) =>
      out.write(id); out.write(if (i == 0) 0x00 else 0x11)
    }
    out.write(0); out.write(63); out.write(0) // Ss/Se/AhAl
  }

  private def encodeBlockCoefs(w: BitWriter, coefs: Array[Int], dcPred: Int,
                               codes: (Map[Int, (Int, Int)], Map[Int, (Int, Int)])): Int = {
    val (dcCodes, acCodes) = codes
    def category(v: Int): Int = {
      var s = 0; var a = math.abs(v)
      while (a > 0) { s += 1; a >>= 1 }
      s
    }
    def emit(c: Map[Int, (Int, Int)], sym: Int): Unit = {
      val (code, len) = c.getOrElse(sym, fail(s"symbol $sym has no code"))
      w.write(code, len)
    }
    val diff = coefs(0) - dcPred
    val s = category(diff)
    emit(dcCodes, s)
    if (s > 0) w.write(if (diff < 0) diff + (1 << s) - 1 else diff, s)
    var k = 1
    var run = 0
    while (k < 64) {
      val v = coefs(Zigzag(k))
      if (v == 0) run += 1
      else {
        while (run > 15) { emit(acCodes, 0xF0); run -= 16 }
        val sz = category(v)
        emit(acCodes, (run << 4) | sz)
        w.write(if (v < 0) v + (1 << sz) - 1 else v, sz)
        run = 0
      }
      k += 1
    }
    if (run > 0) emit(acCodes, 0x00) // EOB
    coefs(0)
  }

  /** Quantized coefficients of one 8x8 block of `plane` at (px0, py0),
    * edge-replicated past the plane bounds.
    */
  private def blockCoefs(plane: Array[Int], pw: Int, ph: Int, px0: Int, py0: Int,
                         qt: Array[Int]): Array[Int] = {
    val b = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        val sx = math.min(px0 + x, pw - 1)
        val sy = math.min(py0 + y, ph - 1)
        b(y * 8 + x) = plane(sy * pw + sx) - 128.0
        x += 1
      }
      y += 1
    }
    fdct(b)
    Array.tabulate(64)(i => math.round(b(i) / qt(i)).toInt)
  }

  /** Baseline grayscale JPEG from a pixel function (x, y) -> 0..255.
    * `restartInterval > 0` writes a DRI segment and inserts byte-aligned
    * RSTn markers every that-many MCUs with DC predictors reset (T.81
    * F.1.2.2.1) — exercises the decoder's restart machinery.
    */
  def encodeGray(width: Int, height: Int, px: (Int, Int) => Int,
                 quant: Array[Int] = UnitQuant, restartInterval: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0 && width <= MaxDim && height <= MaxDim)
    require(restartInterval >= 0 && restartInterval <= 0xffff)
    val plane = Array.tabulate(width * height)(i => px(i % width, i / width) & 0xff)
    val out = new ByteArrayOutputStream()
    writeMarkers(out, Seq(quant), width, height, Seq((1, 1, 1, 0)), restartInterval)
    val codes = (buildCodes(DcSpec._1, DcSpec._2), buildCodes(AcSpec._1, AcSpec._2))
    var w = new BitWriter(out)
    var dcPred = 0
    val bw = (width + 7) / 8; val bh = (height + 7) / 8
    var sinceRst = 0
    var rstIdx = 0
    var mcu = 0
    while (mcu < bw * bh) {
      if (restartInterval > 0 && sinceRst == restartInterval) {
        w.flush() // byte-align, then the marker
        out.write(0xFF); out.write(0xD0 + rstIdx)
        rstIdx = (rstIdx + 1) % 8
        sinceRst = 0
        dcPred = 0
        w = new BitWriter(out)
      }
      val bx = mcu % bw; val by = mcu / bw
      dcPred = encodeBlockCoefs(w,
        blockCoefs(plane, width, height, bx * 8, by * 8, quant), dcPred, codes)
      sinceRst += 1
      mcu += 1
    }
    w.flush()
    out.write(0xFF); out.write(0xD9) // EOI
    out.toByteArray
  }

  /** Baseline YCbCr JPEG from (x, y) -> (r, g, b); 4:4:4, or 4:2:0 with
    * box-averaged chroma when `subsample420`.
    */
  def encodeColor(width: Int, height: Int, px: (Int, Int) => (Int, Int, Int),
                  subsample420: Boolean = false,
                  quant: Array[Int] = UnitQuant): Array[Byte] = {
    require(width > 0 && height > 0 && width <= MaxDim && height <= MaxDim)
    val yP = new Array[Int](width * height)
    val cbF = new Array[Double](width * height)
    val crF = new Array[Double](width * height)
    for (y <- 0 until height; x <- 0 until width) {
      val (r, g, b) = px(x, y)
      val yv = 0.299 * r + 0.587 * g + 0.114 * b
      yP(y * width + x) = math.round(yv).toInt.max(0).min(255)
      cbF(y * width + x) = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
      crF(y * width + x) = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    }
    def subPlane(src: Array[Double], f: Int): (Array[Int], Int, Int) = {
      val sw = (width + f - 1) / f; val sh = (height + f - 1) / f
      val p = new Array[Int](sw * sh)
      for (sy <- 0 until sh; sx <- 0 until sw) {
        var s = 0.0; var n = 0
        for (dy <- 0 until f; dx <- 0 until f) {
          val x = sx * f + dx; val y = sy * f + dy
          if (x < width && y < height) { s += src(y * width + x); n += 1 }
        }
        p(sy * sw + sx) = math.round(s / n).toInt.max(0).min(255)
      }
      (p, sw, sh)
    }
    val f = if (subsample420) 2 else 1
    val (cbP, cw, ch) = subPlane(cbF, f)
    val (crP, _, _) = subPlane(crF, f)
    val ySamp = if (subsample420) 2 else 1
    val out = new ByteArrayOutputStream()
    writeMarkers(out, Seq(quant, quant), width, height,
      Seq((1, ySamp, ySamp, 0), (2, 1, 1, 1), (3, 1, 1, 1)))
    val codes = (buildCodes(DcSpec._1, DcSpec._2), buildCodes(AcSpec._1, AcSpec._2))
    val w = new BitWriter(out)
    val mcusX = (width + 8 * ySamp - 1) / (8 * ySamp)
    val mcusY = (height + 8 * ySamp - 1) / (8 * ySamp)
    val preds = new Array[Int](3)
    var mcu = 0
    while (mcu < mcusX * mcusY) {
      val mx = mcu % mcusX; val my = mcu / mcusX
      // Y blocks
      var v = 0
      while (v < ySamp) {
        var h = 0
        while (h < ySamp) {
          preds(0) = encodeBlockCoefs(w, blockCoefs(yP, width, height,
            (mx * ySamp + h) * 8, (my * ySamp + v) * 8, quant), preds(0), codes)
          h += 1
        }
        v += 1
      }
      preds(1) = encodeBlockCoefs(w,
        blockCoefs(cbP, cw, ch, mx * 8, my * 8, quant), preds(1), codes)
      preds(2) = encodeBlockCoefs(w,
        blockCoefs(crP, cw, ch, mx * 8, my * 8, quant), preds(2), codes)
      mcu += 1
    }
    w.flush()
    out.write(0xFF); out.write(0xD9)
    out.toByteArray
  }
}
