package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._

/** Multimodal columns: media payloads as opaque `BINARY` with typed
  * metadata, plus decode / feature-extract / frame-sample plumbing.
  *
  * The AUDIO and IMAGE decode paths are REAL: [[WavCodec]] parses RIFF/WAVE
  * PCM containers and [[BmpCodec]] parses uncompressed 24-bit BMPs with
  * integer average-pooled thumbnails (decode → feature-extract → resize) —
  * and VIDEO decode is REAL end to end: [[AviCodec]] parses RIFF/AVI
  * headers + the movi frame index (frame sampling slices true container
  * frames), uncompressed `00db` DIB frames pixel-decode through the BMP
  * row machinery, and MJPEG `00dc` frames pixel-decode through a
  * from-scratch ITU-T T.81 baseline-JPEG codec ([[JpegCodec]]) — all pure
  * JVM byte arithmetic, no native codecs, run per-partition with
  * dead-letter routing for corrupt payloads ([[decodeAudio]] /
  * [[decodeImages]] / [[decodeVideos]] / [[decodeVideoPixels]], unified in
  * [[decodeMeta]] which dispatches each row to ITS modality's real codec).
  * [[decodeVideos]] is the metadata/fingerprint path: its per-frame feature
  * is a content hash, but JPEG frames still decode for validation (their
  * SOF dimensions must match the container header). Other compressed
  * codecs (H.264 etc.) dead-letter rather than fake a decode. Everything
  * around the codecs is the same Spark shape — schema, per-partition
  * batched iteration (the Scala analogue of `mapInPandas`), columnar
  * metadata extraction — so adding a codec changes one function, exactly
  * as the WAV/BMP/AVI/JPEG paths demonstrate.
  *
  * Scale notes: payloads stay opaque bytes end-to-end (no driver collect);
  * decode is a narrow per-partition map, so it parallelizes with the scan
  * and pushes no shuffle. Partitioning by (modality, date) would bound task
  * payload sizes at 100 TB.
  */
object MultimodalOps {

  case class MediaRow(doc_id: Long, payload: Array[Byte], modality: String)

  /** Unified per-modality metadata, every field DECODER-derived (no
    * synthetic formulas): dimensions from the BMP/AVI headers, frame count
    * and duration from the WAV/AVI containers. `n_frames` is 1 for a still
    * image; `width`/`height` are 0 for audio; `duration_us` is 0 for a
    * still image.
    */
  case class MediaMeta(doc_id: Long, modality: String, ok: Boolean, err: String,
                       n_bytes: Long, width: Int, height: Int,
                       n_frames: Long, duration_us: Long)

  /** Attach an opaque binary payload + basic metadata to documents.
    * (Fixture: the utf-8 bytes of `text` stand in for media bytes; REAL
    * media metadata comes from [[decodeMeta]], never from formulas here.)
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs
      .withColumn("payload", col("text").cast("binary"))
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .withColumn("modality",
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")))
      .withColumn("meta", struct(
        col("n_bytes"),
        md5(col("payload")).as("checksum")))

  /** Deterministic media fixture for `docId`: REAL container bytes for the
    * document's modality — a 24-bit BMP, a PCM16 WAV, or an AVI with true
    * movi frame chunks — so a decode stage downstream does genuine parsing.
    */
  def synthMedia(docId: Long): MediaRow = (docId % 3) match {
    case 0 => MediaRow(docId, synthImage(docId), "image")
    case 1 => MediaRow(docId, synthWave(docId), "audio")
    case _ => MediaRow(docId, synthVideo(docId), "video")
  }

  /** Per-partition batched decode — the `mapInPandas` analogue: each row is
    * dispatched to ITS modality's REAL codec ([[BmpCodec]] / [[WavCodec]] /
    * [[AviCodec]]) and the container-derived metadata is normalized into
    * one schema. Corrupt payloads and unknown modalities dead-letter
    * (`ok = false` + error text), never fabricate features and never throw
    * — one bad file in a 100 TB scan must not fail the stage.
    */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    implicit val enc = Encoders.product[MediaMeta]
    media.mapPartitions { rows =>
      // per-partition: real codecs would be initialized once here
      rows.map { m =>
        try {
          m.modality match {
            case "image" =>
              val b = BmpCodec.decode(m.payload)
              MediaMeta(m.doc_id, m.modality, ok = true, err = "", m.payload.length,
                b.width, b.height, n_frames = 1L, duration_us = 0L)
            case "audio" =>
              val w = WavCodec.decode(m.payload)
              MediaMeta(m.doc_id, m.modality, ok = true, err = "", m.payload.length,
                width = 0, height = 0, w.nFrames, w.durationUs)
            case "video" =>
              val v = AviCodec.decode(m.payload)
              MediaMeta(m.doc_id, m.modality, ok = true, err = "", m.payload.length,
                v.width, v.height, v.nFrames.toLong, v.durationUs)
            case other =>
              MediaMeta(m.doc_id, other, ok = false, err = s"unknown modality '$other'",
                if (m.payload == null) 0L else m.payload.length.toLong, 0, 0, 0L, 0L)
          }
        } catch {
          case scala.util.control.NonFatal(e) =>
            MediaMeta(m.doc_id, m.modality, ok = false,
              err = s"${e.getClass.getSimpleName}: ${e.getMessage}",
              if (m.payload == null) 0L else m.payload.length.toLong, 0, 0, 0L, 0L)
        }
      }
    }
  }

  case class AudioDecoded(doc_id: Long, ok: Boolean, err: String,
                          sample_rate: Int, channels: Int, bits: Int,
                          n_frames: Long, duration_us: Long, rms: Double, peak: Int)

  /** Deterministic audio fixture: a PCM16 square wave whose length, period
    * and amplitude derive from `doc_id` — REAL WAV bytes (RIFF header +
    * samples) built by [[WavCodec.synth]], so the decode stage downstream
    * does genuine container parsing, not pseudo-features.
    */
  def synthWave(docId: Long): Array[Byte] = {
    val len = (800 + (docId % 23) * 37).toInt
    val period = (2 + docId % 50).toInt
    val amp = (1000 + docId % 9000).toShort
    val samples = Array.tabulate(len)(i =>
      if ((i / period) % 2 == 0) amp else (-amp).toShort)
    WavCodec.synth(8000, samples)
  }

  /** REAL audio decode over the payload column: per-partition batched WAV
    * parsing ([[WavCodec.decode]]). Corrupt payloads become `ok = false`
    * rows carrying the parse error — the dead-letter routing shape — never
    * fabricated features and never a job-killing throw (one bad file in a
    * 100 TB scan must not fail the stage; the caller filters/routes).
    */
  def decodeAudio(media: Dataset[MediaRow]): Dataset[AudioDecoded] = {
    implicit val enc = Encoders.product[AudioDecoded]
    media.mapPartitions { rows =>
      rows.map { m =>
        try {
          val w = WavCodec.decode(m.payload)
          AudioDecoded(m.doc_id, ok = true, err = "", w.sampleRate, w.channels,
            w.bitsPerSample, w.nFrames, w.durationUs, w.rms, w.peak)
        } catch {
          // NonFatal, not just MalformedWav: a null payload or a parser bug
          // must also dead-letter, never kill the stage
          case scala.util.control.NonFatal(e) =>
            AudioDecoded(m.doc_id, ok = false,
              err = s"${e.getClass.getSimpleName}: ${e.getMessage}", 0, 0, 0, 0L, 0L, 0.0, 0)
        }
      }
    }
  }

  case class ImageDecoded(doc_id: Long, ok: Boolean, err: String,
                          width: Int, height: Int, mean_lum: Double, thumb: Seq[Long])

  /** Deterministic image fixture: a gradient + id-seeded checker pattern as
    * REAL 24-bit BMP bytes ([[BmpCodec.synth]]).
    */
  def synthImage(docId: Long): Array[Byte] = {
    val w = (16 + docId % 17).toInt
    val h = (16 + docId % 13).toInt
    BmpCodec.synth(w, h, (x, y) => {
      val checker = if (((x / 4) + (y / 4) + docId) % 2 == 0) 64 else 0
      ((x * 255 / math.max(1, w - 1)) min 255,
        (y * 255 / math.max(1, h - 1)) min 255, checker)
    })
  }

  case class ImagePhash(doc_id: Long, ok: Boolean, phash: Long)

  /** Integer DCT-II cosine table, K(u,i) = round(8192·cos((2i+1)uπ/16)).
    * Hardcoded (not computed at runtime) so the Scala kernel and the DuckDB
    * oracle share the EXACT same constants — [[dctKSqlValues]] renders this
    * table into the oracle SQL, a single source of truth.
    */
  val DctK: Array[Array[Long]] = Array(
    Array(8192L, 8192L, 8192L, 8192L, 8192L, 8192L, 8192L, 8192L),
    Array(8035L, 6811L, 4551L, 1598L, -1598L, -4551L, -6811L, -8035L),
    Array(7568L, 3135L, -3135L, -7568L, -7568L, -3135L, 3135L, 7568L),
    Array(6811L, -1598L, -8035L, -4551L, 4551L, 8035L, 1598L, -6811L),
    Array(5793L, -5793L, -5793L, 5793L, 5793L, -5793L, -5793L, 5793L),
    Array(4551L, -8035L, 1598L, 6811L, -6811L, -1598L, 8035L, -4551L),
    Array(3135L, -7568L, 7568L, -3135L, -3135L, 7568L, -7568L, 3135L),
    Array(1598L, -4551L, 6811L, -8035L, 8035L, -6811L, 4551L, -1598L))

  /** The table as `(u, i, k)` SQL VALUES rows for the oracle. */
  def dctKSqlValues: String =
    (for (u <- 0 until 8; i <- 0 until 8) yield s"($u,$i,${DctK(u)(i)})").mkString(", ")

  /** 60-bit perceptual hash of an 8x8 average-pooled grayscale block: 2-D
    * integer DCT-II (the [[DctK]] table), coefficients 1..60 in row-major
    * order (DC excluded — it only encodes overall brightness), bit j set
    * iff coefficient j+1 exceeds the lower median (30th smallest) of the
    * 60. All-integer arithmetic, so bit-exact against the SQL oracle.
    * 60 bits = 4 bands x 15, the repo's SimHash banding shape.
    */
  def phash60(thumb8: Array[Long]): Long = {
    require(thumb8.length == 64, s"need an 8x8 block, got ${thumb8.length}")
    val vals = new Array[Long](60)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        val idx = u * 8 + v
        if (idx >= 1 && idx <= 60) {
          var s = 0L
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) { s += thumb8(y * 8 + x) * DctK(u)(y) * DctK(v)(x); x += 1 }
            y += 1
          }
          vals(idx - 1) = s
        }
        v += 1
      }
      u += 1
    }
    medianSignHash60(vals)
  }

  /** 60-bit sign hash of 60 integer feature values: bit j set iff value j
    * exceeds the lower median (30th smallest). Shared by the image pHash
    * and audio fingerprint; all-integer, so bit-exact against SQL oracles.
    */
  def medianSignHash60(vals: Array[Long]): Long = {
    require(vals.length == 60, s"need 60 values, got ${vals.length}")
    val med = vals.sorted.apply(29)
    var h = 0L
    var j = 0
    while (j < 60) { if (vals(j) > med) h |= 1L << j; j += 1 }
    h
  }

  case class AudioFp(doc_id: Long, ok: Boolean, afp: Long)

  /** Lower median (15th smallest) of a 30-value feature family. */
  private def lowerMedian30(vals: Array[Long]): Long = {
    require(vals.length == 30)
    vals.sorted.apply(14)
  }

  /** Acoustic fingerprint over the payload column: REAL WAV decode to raw
    * PCM ([[WavCodec.decodeSamples]]), then a 60-bit contour hash — 30
    * frame signed sums (the polarity/DC contour, bits 0-29) + 30 frame
    * lag-1 autocorrelations (the periodicity contour, bits 30-59; frame f
    * covers samples i with i·30/n = f, a pair (i, i+1) belongs to i's
    * frame). Each family compares against its OWN lower median — a global
    * median would let the always-larger autocorrelation family saturate
    * the threshold and collapse every clip to one hash. Same banded
    * near-dup shape as [[imagePhash]]: map-only hashing, candidates from a
    * (band index, band) equi-join, never audio-pairwise.
    */
  def audioFingerprint(media: Dataset[MediaRow]): Dataset[AudioFp] = {
    implicit val enc = Encoders.product[AudioFp]
    media.mapPartitions { rows =>
      rows.map { m =>
        try {
          val s = WavCodec.decodeSamples(m.payload)
          val n = s.length
          require(n >= 31, s"too few samples for a 30-frame contour: $n")
          val sums = new Array[Long](30)
          val corr = new Array[Long](30)
          var i = 0
          while (i < n) {
            val f = math.min(i * 30 / n, 29)
            sums(f) += s(i)
            if (i + 1 < n) corr(f) += s(i).toLong * s(i + 1)
            i += 1
          }
          val medS = lowerMedian30(sums)
          val medC = lowerMedian30(corr)
          var h = 0L
          var j = 0
          while (j < 30) {
            if (sums(j) > medS) h |= 1L << j
            if (corr(j) > medC) h |= 1L << (30 + j)
            j += 1
          }
          AudioFp(m.doc_id, ok = true, h)
        } catch {
          case scala.util.control.NonFatal(_) => AudioFp(m.doc_id, ok = false, 0L)
        }
      }
    }
  }

  /** Perceptual image fingerprint over the payload column: REAL BMP decode
    * to an 8x8 pooled grayscale, then [[phash60]]. Corrupt payloads
    * dead-letter (`ok = false`), same contract as [[decodeImages]]. The
    * fingerprint feeds the banded near-dup join (SimHash-style): map-only
    * here, one equi-join shuffle on (band index, band) downstream — never
    * an image-pairwise comparison.
    */
  def imagePhash(media: Dataset[MediaRow]): Dataset[ImagePhash] = {
    implicit val enc = Encoders.product[ImagePhash]
    media.mapPartitions { rows =>
      rows.map { m =>
        try ImagePhash(m.doc_id, ok = true, phash60(BmpCodec.decode(m.payload, 8).thumb))
        catch {
          case scala.util.control.NonFatal(_) => ImagePhash(m.doc_id, ok = false, 0L)
        }
      }
    }
  }

  /** 4x15-bit band rows `(doc_id, k, band)` of a `(doc_id, phash)` frame —
    * the blocking key surface shared by the one-shot banded join and the
    * persisted index.
    */
  def phashBands(hashed: DataFrame): DataFrame =
    hashed.select(col("doc_id"),
      explode(array((0 until 4).map(k => struct(lit(k).as("k"),
        shiftright(col("phash"), 15 * k).bitwiseAND(lit(32767L)).as("band"))): _*)).as("bk"))
      .select(col("doc_id"), col("bk.k").as("k"), col("bk.band").as("band"))

  /** Persist an image-fingerprint index under `path`: the corpus is decoded
    * and pHashed ONCE into two [[graft.storage.TxLogTable]]s (`hashes` =
    * (doc_id, phash), `bands` = exploded band rows). Calling again with a
    * later batch folds it in — decode + DCT cost is paid once per image
    * EVER, the property that makes image-dedup-at-ingest affordable on a
    * growing corpus (the alternative re-decodes the whole corpus per batch).
    */
  def buildPhashIndex(media: Dataset[MediaRow], path: String,
                      txn: Option[(String, Long)] = None): Unit = {
    val spark = media.sparkSession
    val hashed = imagePhash(media).toDF().filter(col("ok"))
      .select(col("doc_id"), col("phash")).persist()
    // Two tables, two commits — not atomic together, so the order and the
    // fence carry the crash-safety story:
    //   * `bands` commits FIRST. A crash between the commits leaves bands
    //     committed and hashes absent; the retry (or any unfenced rebuild
    //     driven by indexExists, which requires BOTH tables) re-appends
    //     bands — duplicate band rows are harmless because probe candidate
    //     generation ends in distinct(). `hashes`, whose duplicates WOULD
    //     duplicate probe output rows, is the single atomic commit point.
    //   * a streaming foreachBatch caller passes txn = (queryId, batchId):
    //     a replayed micro-batch is skipped by the TxLogTable fence on
    //     each table independently, so a crash-retry never double-folds.
    new graft.storage.TxLogTable(spark, s"$path/bands").append(phashBands(hashed), txn)
    new graft.storage.TxLogTable(spark, s"$path/hashes").append(hashed, txn)
    hashed.unpersist()
  }

  /** Near-dup pairs of a NEW image batch against a [[buildPhashIndex]]
    * index plus within the batch itself: `(doc_a, doc_b, hamming)` with
    * `doc_a < doc_b`, Hamming <= `maxHamming`, at least one side from the
    * batch. The indexed corpus is never re-decoded or re-hashed — its side
    * is two table reads; only the batch runs the codec + DCT, and
    * candidates come from the (band index, band) equi-join exactly like
    * the one-shot path. Ids must be disjoint from the indexed corpus.
    */
  def phashProbe(newMedia: Dataset[MediaRow], path: String,
                 maxHamming: Int): DataFrame = {
    val spark = newMedia.sparkSession
    val newHashed = imagePhash(newMedia).toDF().filter(col("ok"))
      .select(col("doc_id"), col("phash")).persist()
    val newBands = phashBands(newHashed)
    val idxBands = new graft.storage.TxLogTable(spark, s"$path/bands").read()
    val all = idxBands.unionByName(newBands)
    // =!= (not <): new-vs-old pairs must surface in both orders because
    // only the batch side drives the join; least/greatest canonicalizes,
    // distinct collapses new-vs-new double hits
    val candidates = newBands.as("a").join(all.as("b"),
        col("a.k") === col("b.k") && col("a.band") === col("b.band") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b")).distinct()
    val allHashes = new graft.storage.TxLogTable(spark, s"$path/hashes").read()
      .unionByName(newHashed)
    candidates
      .join(allHashes.select(col("doc_id").as("doc_a"), col("phash").as("ha")), Seq("doc_a"))
      .join(allHashes.select(col("doc_id").as("doc_b"), col("phash").as("hb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** REAL image decode + feature-extract + resize over the payload column:
    * per-partition BMP parsing with integer average-pooled thumbnails
    * ([[BmpCodec.decode]]). Corrupt payloads dead-letter (`ok = false`),
    * same contract as [[decodeAudio]].
    */
  def decodeImages(media: Dataset[MediaRow], poolSize: Int = 4): Dataset[ImageDecoded] = {
    implicit val enc = Encoders.product[ImageDecoded]
    media.mapPartitions { rows =>
      rows.map { m =>
        try {
          val b = BmpCodec.decode(m.payload, poolSize)
          ImageDecoded(m.doc_id, ok = true, err = "",
            b.width, b.height, b.meanLum, b.thumb.toSeq)
        } catch {
          case scala.util.control.NonFatal(e) =>
            ImageDecoded(m.doc_id, ok = false,
              err = s"${e.getClass.getSimpleName}: ${e.getMessage}", 0, 0, 0.0, Seq.empty)
        }
      }
    }
  }

  case class VideoDecoded(doc_id: Long, ok: Boolean, err: String,
                          width: Int, height: Int, n_frames: Int, duration_us: Long,
                          sampled_hashes: Seq[String])

  /** Deterministic video fixture: a REAL AVI container whose frame payloads
    * are md5-derived byte strings of (doc_id, frame index) — opaque to the
    * (stubbed) frame codec but closed-form recomputable by the oracle.
    */
  def synthVideo(docId: Long): Array[Byte] = {
    val n = (3 + docId % 5).toInt
    val frames = (0 until n).map { k =>
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s"f${docId}_$k").getBytes("ASCII")
    }
    AviCodec.synth(width = (64 + docId % 64).toInt, height = (48 + docId % 32).toInt,
      usPerFrame = 33333, frames = frames)
  }

  /** REAL video container decode: AVI header + movi frame index parsed
    * per-partition; every `stride`-th frame is sliced from the container
    * and content-hashed (the frame-sampling shape over true container
    * frames; the hash is the content FEATURE of this metadata path —
    * [[decodeVideoPixels]] is the pixel path). MJPEG frames (JPEG SOI
    * magic) additionally decode through [[JpegCodec]] for validation: a
    * frame whose SOF dimensions contradict the container header, or that
    * fails to decode, dead-letters the row instead of fingerprinting bytes
    * that no real decoder could play. Opaque payloads of OTHER codecs just
    * hash. Corrupt containers dead-letter (`ok = false`).
    */
  def decodeVideos(media: Dataset[MediaRow], stride: Int = 2): Dataset[VideoDecoded] = {
    require(stride > 0, "stride must be positive")
    implicit val enc = Encoders.product[VideoDecoded]
    media.mapPartitions { rows =>
      rows.map { m =>
        try {
          val info = AviCodec.decode(m.payload)
          val idxs = (0 until info.nFrames by stride).toSeq
          val badJpeg = idxs.iterator.map { k =>
            val (off, len) = info.frames(k)
            if (len >= 2 && (m.payload(off) & 0xff) == 0xFF &&
                (m.payload(off + 1) & 0xff) == 0xD8) {
              try {
                val img = JpegCodec.decode(
                  java.util.Arrays.copyOfRange(m.payload, off, off + len))
                if (img.width != info.width || img.height != info.height)
                  Some(s"frame $k JPEG is ${img.width}x${img.height}, " +
                    s"container declares ${info.width}x${info.height}")
                else None
              } catch {
                case e: JpegCodec.MalformedJpeg =>
                  Some(s"frame $k MalformedJpeg: ${e.getMessage}")
              }
            } else None
          }.collectFirst { case Some(msg) => msg }
          badJpeg match {
            case Some(msg) => VideoDecoded(m.doc_id, ok = false, err = msg,
              info.width, info.height, info.nFrames, info.durationUs, Seq.empty)
            case None =>
              val hashes = idxs.map(k =>
                org.apache.commons.codec.digest.DigestUtils.md5Hex(
                  AviCodec.frameBytes(m.payload, info, k)))
              VideoDecoded(m.doc_id, ok = true, err = "",
                info.width, info.height, info.nFrames, info.durationUs, hashes)
          }
        } catch {
          case scala.util.control.NonFatal(e) =>
            VideoDecoded(m.doc_id, ok = false,
              err = s"${e.getClass.getSimpleName}: ${e.getMessage}", 0, 0, 0, 0L, Seq.empty)
        }
      }
    }
  }

  case class VideoPixels(doc_id: Long, ok: Boolean, err: String,
                         width: Int, height: Int, frame_idx: Int,
                         mean_lum: Double, thumb: Seq[Long])

  /** Deterministic video fixture with REAL pixel payloads: an AVI whose
    * `00db` frame chunks are raw 24-bpp DIB pixel arrays (the uncompressed
    * format — [[BmpCodec.dibBytes]]) of a gradient + per-frame-shifted
    * checker, so the frame-payload decode downstream does genuine pixel
    * parsing, closed-form recomputable by the oracle.
    */
  def synthVideoDib(docId: Long): Array[Byte] = {
    val w = (16 + docId % 9).toInt
    val h = (12 + docId % 7).toInt
    val n = (3 + docId % 4).toInt
    val frames = (0 until n).map { k =>
      BmpCodec.dibBytes(w, h, (x, y) => {
        val checker = if (((x / 2) + (y / 2) + docId + k) % 2 == 0) 32 else 0
        ((x * 255 / (w - 1)) min 255, ((y + k) * 255 / (h - 1)) min 255, checker)
      })
    }
    AviCodec.synth(w, h, usPerFrame = 33333, frames = frames, raw = true)
  }

  /** Deterministic MJPEG video fixture: an AVI whose `00dc` frame chunks
    * are REAL baseline JPEGs ([[JpegCodec.encodeGray]], unit quant) of
    * per-8x8-block-constant frames — the one JPEG family whose decode is
    * bit-exact (DC-only blocks), so the pixel features downstream are
    * closed-form recomputable by the oracle like the DIB fixture's.
    */
  def synthVideoMjpeg(docId: Long): Array[Byte] = {
    val w = 8 * (2 + docId % 3).toInt
    val h = 8 * (2 + docId % 2).toInt
    val n = (3 + docId % 4).toInt
    val frames = (0 until n).map { k =>
      JpegCodec.encodeGray(w, h,
        (x, y) => (((x / 8) * 37 + (y / 8) * 59 + k * 17 + docId * 13) % 256).toInt)
    }
    // 00dc chunks with the real muxer shape: strh declares fccHandler MJPG
    AviCodec.synth(w, h, usPerFrame = 33333, frames = frames, fourcc = "MJPG")
  }

  /** REAL video frame-payload decode: the AVI container index locates every
    * `stride`-th frame and pixel-decodes the payload — uncompressed `00db`
    * DIB frames through the BMP row machinery, MJPEG `00dc` frames (JPEG
    * magic) through the baseline-JPEG codec ([[JpegCodec]]), with the
    * identical feature contract (gray = r+g+b, integer-pooled thumbnail).
    * Frames that are neither (other compressed codecs), JPEGs whose
    * dimensions contradict the container header, progressive JPEGs, and
    * corrupt payloads all DEAD-LETTER (`ok = false`) rather than fake a
    * decode. One output row per sampled frame.
    */
  def decodeVideoPixels(media: Dataset[MediaRow], stride: Int = 2,
                        poolSize: Int = 4): Dataset[VideoPixels] = {
    require(stride > 0, "stride must be positive")
    implicit val enc = Encoders.product[VideoPixels]
    media.mapPartitions { rows =>
      rows.flatMap { m =>
        try {
          val info = AviCodec.decode(m.payload)
          val rs = BmpCodec.rowSize(info.width)
          (0 until info.nFrames by stride).iterator.map { k =>
            val (off, len) = info.frames(k)
            def deadLetter(msg: String) = VideoPixels(m.doc_id, ok = false,
              err = msg, info.width, info.height, k, 0.0, Seq.empty)
            if (len == rs * info.height) {
              val (meanLum, thumb) = BmpCodec.dibFeatures(
                m.payload, off, info.width, info.height, topDown = false, poolSize)
              VideoPixels(m.doc_id, ok = true, err = "",
                info.width, info.height, k, meanLum, thumb.toSeq)
            } else if (len >= 2 && (m.payload(off) & 0xff) == 0xFF &&
                (m.payload(off + 1) & 0xff) == 0xD8) {
              try {
                val img = JpegCodec.decode(
                  java.util.Arrays.copyOfRange(m.payload, off, off + len))
                if (img.width != info.width || img.height != info.height)
                  deadLetter(s"frame $k JPEG is ${img.width}x${img.height}, " +
                    s"container declares ${info.width}x${info.height}")
                else {
                  val (meanLum, thumb) = JpegCodec.features(img, poolSize)
                  VideoPixels(m.doc_id, ok = true, err = "",
                    info.width, info.height, k, meanLum, thumb.toSeq)
                }
              } catch {
                case e: JpegCodec.MalformedJpeg =>
                  deadLetter(s"frame $k MalformedJpeg: ${e.getMessage}")
              }
            } else deadLetter(
              s"frame $k payload $len bytes: not DIB geometry ${rs * info.height}, not JPEG")
          }
        } catch {
          case scala.util.control.NonFatal(e) =>
            Iterator.single(VideoPixels(m.doc_id, ok = false,
              err = s"${e.getClass.getSimpleName}: ${e.getMessage}", 0, 0, -1, 0.0, Seq.empty))
        }
      }
    }
  }

  /** Frame sampling: cut the payload into fixed-size "frames" and emit one
    * row per sampled frame (every `stride`-th), binary-sliced — the video
    * analogue of token windows.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    media
      // ceil-div: an exact-multiple payload has len/frameBytes frames, not
      // one more; empty payloads have zero frames
      .withColumn("n_frames",
        expr(s"(octet_length(payload) + ${frameBytes - 1}) div $frameBytes"))
      .filter(col("n_frames") > 0)
      .select(col("doc_id"), col("modality"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))
      .withColumn("frame_offset", col("frame_idx") * frameBytes)
}
