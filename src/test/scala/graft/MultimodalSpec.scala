package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.functions._
import graft.operators.{MultimodalOps, WavCodec}

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  test("WAV roundtrip: synth then decode recovers format and exact signal features") {
    val amp: Short = 3000
    val samples = Array.tabulate(1600)(i => if ((i / 4) % 2 == 0) amp else (-amp).toShort)
    val info = WavCodec.decode(WavCodec.synth(8000, samples))
    assert(info.sampleRate == 8000 && info.channels == 1 && info.bitsPerSample == 16)
    assert(info.nFrames == 1600 && info.durationUs == 200000L) // 0.2 s at 8 kHz
    assert(info.rms == 3000.0 && info.peak == 3000, "constant-magnitude wave: rms == peak == amp")
  }

  test("WAV decodeSamples: raw PCM roundtrips exactly; fingerprint separates clips, not copies") {
    val samples = Array.tabulate(400)(i => (((i * 37) % 2001) - 1000).toShort)
    val got = WavCodec.decodeSamples(WavCodec.synth(8000, samples))
    assert(got.toSeq == samples.map(_.toInt).toSeq, "sample-exact roundtrip")
    // fingerprint contract: identical bytes hash identically, different
    // synth parameters (period/amp/length) hash differently
    val rows = Seq(
      MultimodalOps.MediaRow(1L, MultimodalOps.synthWave(1L), "audio"),
      MultimodalOps.MediaRow(2L, MultimodalOps.synthWave(1L), "audio"), // copy of 1
      MultimodalOps.MediaRow(3L, MultimodalOps.synthWave(3L), "audio"))
    val fp = MultimodalOps.audioFingerprint(spark.createDataset(rows))
      .collect().sortBy(_.doc_id)
    assert(fp.forall(_.ok))
    assert(fp(0).afp == fp(1).afp, "byte-identical clips must collide")
    assert(fp(0).afp != fp(2).afp, "different synth parameters must separate")
  }

  test("WAV decode: 8-bit and multi-channel payloads parse correctly") {
    // hand-build a stereo PCM8 file: 4 frames, channels (L=128+x, R=128-x)
    val data = Array[Int](138, 118, 148, 108, 128, 128, 228, 28).map(_.toByte)
    val buf = ByteBuffer.allocate(44 + data.length).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("ASCII")).putInt(36 + data.length).put("WAVE".getBytes("ASCII"))
    buf.put("fmt ".getBytes("ASCII")).putInt(16).putShort(1).putShort(2)
      .putInt(4000).putInt(8000).putShort(2).putShort(8)
    buf.put("data".getBytes("ASCII")).putInt(data.length).put(data)
    val info = WavCodec.decode(buf.array())
    assert(info.channels == 2 && info.bitsPerSample == 8 && info.nFrames == 4)
    assert(info.peak == 100, "8-bit samples are unsigned, centered at 128")
  }

  test("WAV decode: malformed payloads fail loudly, never fabricate features") {
    val good = WavCodec.synth(8000, Array[Short](1, 2, 3, 4))
    def expectFail(bytes: Array[Byte], fragment: String): Unit = {
      val e = intercept[WavCodec.MalformedWav](WavCodec.decode(bytes))
      assert(e.getMessage.contains(fragment), s"'${e.getMessage}' !~ '$fragment'")
    }
    expectFail(Array[Byte](1, 2, 3), "too short")
    expectFail("JUNKxxxxJUNK".getBytes("ASCII"), "not RIFF/WAVE")
    expectFail(good.take(30), "overruns")
    // a data chunk whose length is not a frame multiple
    val odd = good.clone(); ByteBuffer.wrap(odd).order(ByteOrder.LITTLE_ENDIAN).putInt(40, 7)
    expectFail(odd, "not a multiple")
    // hostile chunk length near Int.MaxValue: the bounds check must not
    // wrap in Int arithmetic and walk off the buffer
    val hostile = good.clone()
    ByteBuffer.wrap(hostile).order(ByteOrder.LITTLE_ENDIAN).putInt(40, Int.MaxValue - 7)
    expectFail(hostile, "overruns")
  }

  test("BMP roundtrip: synth then decode recovers dims, exact mean and pooled thumbnail") {
    import graft.operators.BmpCodec
    // 8x8 image: left half black, right half white
    val info = BmpCodec.decode(
      BmpCodec.synth(8, 8, (x, _) => if (x < 4) (0, 0, 0) else (255, 255, 255)),
      poolSize = 2)
    assert(info.width == 8 && info.height == 8 && !info.topDown)
    assert(info.meanLum == 127.5)
    // 2x2 thumbnail (row-major, y-first): left cells 0, right cells 765
    assert(info.thumb.toSeq == Seq(0L, 765L, 0L, 765L))
  }

  test("BMP decode: row padding and top-down order handled; hostile headers fail loudly") {
    import graft.operators.BmpCodec
    // width 3 -> row size 12 (3 bytes padding per row): mean must ignore padding
    val padded = BmpCodec.synth(3, 2, (_, _) => (10, 20, 30))
    assert(BmpCodec.decode(padded).meanLum == 20.0)
    // top-down variant: flip the height sign; gradient row must land at y=0
    val bu = BmpCodec.synth(4, 2, (_, y) => if (y == 0) (255, 255, 255) else (0, 0, 0))
    val td = bu.clone()
    java.nio.ByteBuffer.wrap(td).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(22, -2) // declare top-down; file row 0 is now the TOP row
    val buInfo = BmpCodec.decode(bu, poolSize = 1)
    val tdInfo = BmpCodec.decode(td, poolSize = 1)
    assert(buInfo.meanLum == tdInfo.meanLum && tdInfo.topDown)
    def expectFail(bytes: Array[Byte], frag: String): Unit = {
      val e = intercept[BmpCodec.MalformedBmp](BmpCodec.decode(bytes))
      assert(e.getMessage.contains(frag), s"'${e.getMessage}' !~ '$frag'")
    }
    expectFail(Array[Byte](1, 2, 3), "too short")
    expectFail("XXnotabmp".padTo(60, 'x').getBytes("ASCII"), "missing BM magic")
    val hostile = padded.clone()
    java.nio.ByteBuffer.wrap(hostile).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(18, Int.MaxValue - 3) // width that would wrap Int row math
    expectFail(hostile, "unreasonable dimensions")
    val overrun = padded.clone()
    java.nio.ByteBuffer.wrap(overrun).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(22, 2000) // height larger than the actual pixel data
    expectFail(overrun, "overruns")
    // biHeight = Int.MinValue: math.abs stays negative in Int — must still fail
    val minH = padded.clone()
    java.nio.ByteBuffer.wrap(minH).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(22, Int.MinValue)
    expectFail(minH, "unreasonable dimensions")
  }

  test("AVI roundtrip: container headers and frame index recovered, payload bytes intact") {
    import graft.operators.AviCodec
    val frames = Seq("alpha".getBytes, "bee".getBytes, "gamma!!".getBytes, "dd".getBytes)
    val avi = AviCodec.synth(320, 240, 40000, frames)
    val info = AviCodec.decode(avi)
    assert(info.width == 320 && info.height == 240 && info.usPerFrame == 40000)
    assert(info.nFrames == 4 && info.durationUs == 160000L)
    // frame payloads (incl. odd-length ones behind RIFF padding) roundtrip
    frames.indices.foreach { k =>
      assert(AviCodec.frameBytes(avi, info, k).sameElements(frames(k)), s"frame $k")
    }
  }

  test("AVI decode: inconsistent or truncated containers fail loudly") {
    import graft.operators.AviCodec
    val good = AviCodec.synth(64, 48, 33333, Seq("f0".getBytes, "f1".getBytes))
    def expectFail(bytes: Array[Byte], frag: String): Unit = {
      val e = intercept[AviCodec.MalformedAvi](AviCodec.decode(bytes))
      assert(e.getMessage.contains(frag), s"'${e.getMessage}' !~ '$frag'")
    }
    expectFail(Array[Byte](1, 2), "too short")
    expectFail("RIFFxxxxWAVE".getBytes("ASCII"), "not RIFF/AVI")
    expectFail(good.take(40), "overruns")
    // header/index count mismatch must not silently under-report:
    // dwTotalFrames sits at 12 (RIFF) + 12 (LIST/hdrl) + 8 (avih hdr) + 16
    val lying = good.clone()
    ByteBuffer.wrap(lying).order(ByteOrder.LITTLE_ENDIAN).putInt(48, 9)
    expectFail(lying, "declares")
  }

  test("distributed video decode: frame index sampled per partition, corrupt rows dead-letter") {
    val media = Tables.documents(spark, sf).select(col("doc_id")).filter(col("doc_id") < 30)
      .as[Long]
      .map { id =>
        val payload = if (id == 4L) "RIFFbadbadbad".getBytes("ASCII")
          else MultimodalOps.synthVideo(id)
        MultimodalOps.MediaRow(id, payload, "video")
      }
    val decoded = MultimodalOps.decodeVideos(media, stride = 2).collect()
    val bad = decoded.filter(!_.ok)
    assert(bad.map(_.doc_id).toSeq == Seq(4L) && bad.head.err.contains("not RIFF/AVI"))
    val ok = decoded.filter(_.ok)
    assert(ok.nonEmpty && ok.forall(d => d.n_frames >= 3 &&
      d.sampled_hashes.length == (d.n_frames + 1) / 2))
    // frame hashes match a local decode of the same container
    val localInfo = graft.operators.AviCodec.decode(MultimodalOps.synthVideo(2L))
    val localHash = org.apache.commons.codec.digest.DigestUtils.md5Hex(
      graft.operators.AviCodec.frameBytes(MultimodalOps.synthVideo(2L), localInfo, 0))
    assert(ok.find(_.doc_id == 2L).get.sampled_hashes.head == localHash)
  }

  test("metadata path validates MJPEG frames through the real JPEG codec") {
    import graft.operators.{AviCodec, JpegCodec}
    // MJPEG fixture rows decode: container dims CONFIRMED by each sampled
    // frame's SOF, hashes present (the hash stays the content feature)
    val media = Tables.documents(spark, sf).select(col("doc_id")).filter(col("doc_id") < 12)
      .as[Long].map(id => MultimodalOps.MediaRow(id, MultimodalOps.synthVideoMjpeg(id), "video"))
    val decoded = MultimodalOps.decodeVideos(media, stride = 2).collect()
    assert(decoded.nonEmpty && decoded.forall(_.ok),
      decoded.filterNot(_.ok).map(d => s"${d.doc_id}: ${d.err}").mkString("; "))
    decoded.foreach { d =>
      val (w, h) = (8 * (2 + d.doc_id % 3).toInt, 8 * (2 + d.doc_id % 2).toInt)
      assert(d.width == w && d.height == h, s"doc ${d.doc_id} dims")
      assert(d.sampled_hashes.length == (d.n_frames + 1) / 2)
    }
    // a JPEG whose SOF contradicts the container header dead-letters the
    // row instead of fingerprinting an unplayable stream
    val good = JpegCodec.encodeGray(16, 16, (_, _) => 50)
    val contra = MultimodalOps.decodeVideos(
      Seq(MultimodalOps.MediaRow(2L, AviCodec.synth(32, 32, 33333, Seq(good)),
        "video")).toDS(), stride = 1).collect()
    assert(contra.length == 1 && !contra.head.ok &&
      contra.head.err.contains("container declares"))
    // a truncated JPEG frame dead-letters with the codec's error
    val trunc = MultimodalOps.decodeVideos(
      Seq(MultimodalOps.MediaRow(4L, AviCodec.synth(16, 16, 33333,
        Seq(java.util.Arrays.copyOf(good, good.length / 2))), "video")).toDS(),
      stride = 1).collect()
    assert(trunc.length == 1 && !trunc.head.ok && trunc.head.err.contains("MalformedJpeg"))
  }

  test("video frame-payload pixel decode: DIB frames decode, mismatched geometry dead-letters") {
    // a 2x2 single-frame DIB video with hand-computable pixels:
    // px(x,y) = (x*255, y*255, checker) -> gray values known in closed form
    val w = 2; val h = 2
    val dib = graft.operators.BmpCodec.dibBytes(w, h, (x, y) => (x * 255, y * 255, 0))
    val avi = graft.operators.AviCodec.synth(w, h, 33333, Seq(dib), raw = true)
    val one = MultimodalOps.decodeVideoPixels(
      Seq(MultimodalOps.MediaRow(1L, avi, "video")).toDS(), stride = 1).collect()
    assert(one.length == 1 && one.head.ok, one.head.err)
    // grays: (0,0)=0, (1,0)=255, (0,1)=255, (1,1)=510 -> mean = 1020/(3*4)
    assert(one.head.mean_lum == 1020.0 / 12.0)
    assert(one.head.frame_idx == 0 && one.head.width == w && one.head.height == h)

    // the deterministic fixture: every sampled frame of every doc decodes
    val media = Tables.documents(spark, sf).select(col("doc_id")).filter(col("doc_id") < 30)
      .as[Long].map(id => MultimodalOps.MediaRow(id, MultimodalOps.synthVideoDib(id), "video"))
    val decoded = MultimodalOps.decodeVideoPixels(media, stride = 2).collect()
    assert(decoded.nonEmpty && decoded.forall(_.ok),
      decoded.filterNot(_.ok).map(d => s"${d.doc_id}: ${d.err}").mkString("; "))
    assert(decoded.forall(d => d.thumb.nonEmpty && d.mean_lum > 0))

    // compressed (00dc) frames are NOT pixel-decodable: geometry mismatch
    // dead-letters per frame instead of fabricating pixels
    val compressed = MultimodalOps.decodeVideoPixels(
      Seq(MultimodalOps.MediaRow(9L, MultimodalOps.synthVideo(9L), "video")).toDS(),
      stride = 2).collect()
    assert(compressed.nonEmpty && compressed.forall(r => !r.ok && r.err.contains("DIB geometry")))
    // corrupt container: one dead-letter row for the whole payload
    val corrupt = MultimodalOps.decodeVideoPixels(
      Seq(MultimodalOps.MediaRow(10L, "RIFFbadbadbad".getBytes("ASCII"), "video")).toDS(),
      stride = 1).collect()
    assert(corrupt.length == 1 && !corrupt.head.ok && corrupt.head.frame_idx == -1)
  }

  test("video MJPEG (00dc) frames decode through the baseline-JPEG codec") {
    import graft.operators.{AviCodec, JpegCodec}
    // the deterministic fixture: every sampled frame of every doc decodes,
    // and the features equal the closed-form block arithmetic (the same
    // formula the q_video_mjpeg oracle computes in SQL)
    val media = Tables.documents(spark, sf).select(col("doc_id")).filter(col("doc_id") < 30)
      .as[Long].map(id => MultimodalOps.MediaRow(id, MultimodalOps.synthVideoMjpeg(id), "video"))
    val decoded = MultimodalOps.decodeVideoPixels(media, stride = 2).collect()
    assert(decoded.nonEmpty && decoded.forall(_.ok),
      decoded.filterNot(_.ok).map(d => s"${d.doc_id}: ${d.err}").mkString("; "))
    // the container's strh declares the codec like a real muxer; the DIB
    // fixture has no stream header and reports none
    assert(AviCodec.decode(MultimodalOps.synthVideoMjpeg(3L)).codec == "MJPG")
    assert(AviCodec.decode(MultimodalOps.synthVideoDib(3L)).codec == "")
    val d3 = decoded.find(d => d.doc_id == 3L && d.frame_idx == 2).get
    val (w3, h3) = (8 * (2 + 3 % 3), 8 * (2 + 3 % 2)) // doc 3: 16x24
    assert(d3.width == w3 && d3.height == h3)
    val grays = for (y <- 0 until h3; x <- 0 until w3)
      yield 3L * (((x / 8) * 37 + (y / 8) * 59 + 2 * 17 + 3 * 13) % 256)
    assert(d3.mean_lum == grays.sum.toDouble / (3.0 * w3 * h3))

    // a progressive frame dead-letters; the good frame beside it still decodes
    val good = JpegCodec.encodeGray(16, 16, (_, _) => 50)
    val prog = good.clone()
    val sof = prog.indices.find(i =>
      (prog(i) & 0xff) == 0xFF && (prog(i + 1) & 0xff) == 0xC0).get
    prog(sof + 1) = 0xC2.toByte
    val mixed = MultimodalOps.decodeVideoPixels(
      Seq(MultimodalOps.MediaRow(1L, AviCodec.synth(16, 16, 33333, Seq(good, prog)),
        "video")).toDS(), stride = 1).collect().sortBy(_.frame_idx)
    assert(mixed.length == 2)
    assert(mixed(0).ok && mixed(0).mean_lum == 50.0)
    assert(!mixed(1).ok && mixed(1).err.contains("progressive"))

    // a JPEG whose dimensions contradict the container header dead-letters
    val contra = MultimodalOps.decodeVideoPixels(
      Seq(MultimodalOps.MediaRow(2L, AviCodec.synth(32, 32, 33333, Seq(good)),
        "video")).toDS(), stride = 1).collect()
    assert(contra.length == 1 && !contra.head.ok &&
      contra.head.err.contains("container declares"))

    // a truncated JPEG frame dead-letters with the codec's error
    val trunc = MultimodalOps.decodeVideoPixels(
      Seq(MultimodalOps.MediaRow(4L, AviCodec.synth(16, 16, 33333,
        Seq(java.util.Arrays.copyOf(good, good.length / 2))), "video")).toDS(),
      stride = 1).collect()
    assert(trunc.length == 1 && !trunc.head.ok && trunc.head.err.contains("MalformedJpeg"))
  }

  test("distributed image decode: real parsing per partition, corrupt rows dead-letter") {
    val media = Tables.documents(spark, sf).select(col("doc_id")).filter(col("doc_id") < 40)
      .as[Long]
      .map { id =>
        val payload = if (id == 6L) Array[Byte]('B', 'M', 1) // corrupt
          else MultimodalOps.synthImage(id)
        MultimodalOps.MediaRow(id, payload, "image")
      }
    val decoded = MultimodalOps.decodeImages(media).collect()
    val bad = decoded.filter(!_.ok)
    assert(bad.map(_.doc_id).toSeq == Seq(6L) && bad.head.err.contains("too short"))
    val ok = decoded.filter(_.ok)
    assert(ok.nonEmpty && ok.forall(d => d.width >= 16 && d.height >= 16 && d.thumb.length == 16))
    // spot-check against a local decode of the same synthetic image
    val want = graft.operators.BmpCodec.decode(MultimodalOps.synthImage(3L))
    val got = ok.find(_.doc_id == 3L).get
    assert(got.mean_lum == want.meanLum && got.thumb == want.thumb.toSeq)
  }

  test("distributed audio decode: real parsing per partition, corrupt rows dead-letter") {
    val media = Tables.documents(spark, sf).select(col("doc_id")).filter(col("doc_id") < 60)
      .as[Long]
      .map { id =>
        val payload = if (id == 9L) Array[Byte](82, 73) // corrupt: truncated RIFF
          else MultimodalOps.synthWave(id)
        MultimodalOps.MediaRow(id, payload, "audio")
      }
    val decoded = MultimodalOps.decodeAudio(media).collect()
    val bad = decoded.filter(!_.ok)
    assert(bad.map(_.doc_id).toSeq == Seq(9L) && bad.head.err.contains("too short"))
    // a NULL payload (not just a malformed one) must dead-letter, not NPE the stage
    val withNull = spark.createDataset(Seq(
      MultimodalOps.MediaRow(1L, MultimodalOps.synthWave(1L), "audio"),
      MultimodalOps.MediaRow(2L, null, "audio")))
    val nullRow = MultimodalOps.decodeAudio(withNull).collect().find(_.doc_id == 2L).get
    assert(!nullRow.ok && nullRow.err.nonEmpty)
    val ok = decoded.filter(_.ok)
    assert(ok.nonEmpty && ok.forall(d => d.sample_rate == 8000 && d.bits == 16))
    // spot-check one row against a local decode of the same synth
    val want = WavCodec.decode(MultimodalOps.synthWave(3L))
    val got = ok.find(_.doc_id == 3L).get
    assert(got.n_frames == want.nFrames && got.rms == want.rms && got.peak == want.peak)
    // square waves: rms equals amplitude, amplitude varies by doc
    assert(ok.forall(d => d.rms == 1000.0 + d.doc_id % 9000))
  }

  test("buildPhashIndex txn fence: a replayed fold is skipped on both tables") {
    val idx = java.nio.file.Files.createTempDirectory("phash_fence").toString
    def media(ids: Long*) = spark.createDataset(ids.map(id =>
      MultimodalOps.MediaRow(id, MultimodalOps.synthImage(id), "image")))
    def counts() = Seq("hashes", "bands").map(t =>
      new graft.storage.TxLogTable(spark, s"$idx/$t").read().count())
    MultimodalOps.buildPhashIndex(media(1L, 2L), idx, Some(("fold", 0L)))
    val first = counts()
    assert(first == Seq(2L, 8L), s"2 hashes, 4 bands each: $first")
    // at-least-once replay of the same micro-batch: both appends fenced
    MultimodalOps.buildPhashIndex(media(1L, 2L), idx, Some(("fold", 0L)))
    assert(counts() == first, "replayed batch must not double-fold")
    // and a duplicate-free probe result even after the replay
    val pairs = MultimodalOps.phashProbe(media(101L), idx, maxHamming = 60)
    assert(pairs.count() == pairs.distinct().count())
    // the next batch (higher seq) passes the fence
    MultimodalOps.buildPhashIndex(media(3L), idx, Some(("fold", 1L)))
    assert(counts() == Seq(3L, 12L))
  }
}
