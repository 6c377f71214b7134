package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling (EXT X5 — SURVEY §2.5): image/audio/video
  * payloads ride as opaque `binary` columns next to a typed metadata
  * struct; decode / feature-extraction runs batched per partition.
  *
  * Decode is REAL for uncompressed formats — [[Multimodal.decodePgm]]
  * (P5 grayscale images) and [[Multimodal.decodeWav]] (RIFF 16-bit PCM
  * audio) parse bytes with no codec library, and
  * [[Multimodal.resizePgm]] is a true nearest-neighbor pixel resize.
  * Compressed formats (JPEG/MP3/H.264) need codecs the container lacks,
  * so their kernel remains a clearly marked deterministic STUB; either
  * way everything Spark-side is real and load-bearing at scale: the
  * (payload binary, meta struct) schema, the `mapPartitions` batching
  * shape (one iterator per partition, the same contract a
  * vectorized/Arrow UDF batch has), and the feature schema out.
  * Swapping a kernel changes no plan shape.
  */
object Multimodal {

  /** The canonical multimodal record: opaque payload + typed metadata. */
  case class MediaRecord(doc_id: Long, payload: Array[Byte], fmt: String, lang: String)

  /** Extracted features: fixed-width vector + byte-level stats. */
  case class MediaFeatures(doc_id: Long, n_bytes: Long, fmt: String, feature: Array[Float])

  /** Pack a text column as a binary payload column with metadata — the
    * harness stand-in for reading image/audio bytes (production path:
    * `spark.read.format("binaryFile")` or a payload column in parquet). */
  def packBinary(df: DataFrame, id: String, text: String, lang: String, fmt: String): DataFrame =
    df.select(
      col(id).as("doc_id"),
      encode(col(text), "UTF-8").as("payload"),
      lit(fmt).as("fmt"),
      col(lang).as("lang"))

  /** Output width of [[stubDecodeFeatures]]. Public so the
    * `x5_features_stub` oracle derives its expected `feat_dim` from this
    * constant instead of hardcoding a mirror value. */
  val stubFeatureDim: Int = 8

  /** STUB decode kernel — deterministic fake "decoder": derives a
    * [[stubFeatureDim]]-wide feature vector from byte statistics. A real
    * pipeline would decode the payload (image → pixels, audio → samples)
    * here; the signature (bytes in, fixed-width float vector out) is the
    * real contract. */
  private def stubDecodeFeatures(payload: Array[Byte]): Array[Float] = {
    val n = payload.length
    val d = stubFeatureDim
    val feat = new Array[Float](d)
    var i = 0
    while (i < n) {
      feat(i % d) += (payload(i) & 0xFF) / 255.0f
      i += 1
    }
    if (n > 0) { var j = 0; while (j < d) { feat(j) /= n; j += 1 } }
    feat
  }

  /** Batched per-partition feature extraction — the Spark plumbing that
    * matters at 100 TB: no per-row task overhead, one iterator pass per
    * partition, typed output schema. This is where a vectorized decode
    * batch (Arrow / pandas-UDF equivalent) plugs in. */
  def extractFeatures(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.map { r =>
        MediaFeatures(r.doc_id, r.payload.length.toLong, r.fmt, stubDecodeFeatures(r.payload))
      }
    }
  }

  /** Resize analog — deterministic downsample STUB: keep every
    * `factor`-th byte (a real pipeline would pixel-resize / resample
    * audio here; bytes-in → smaller-bytes-out is the real contract).
    * Same batched mapPartitions shape as [[extractFeatures]]. */
  def resizePayloads(records: Dataset[MediaRecord], factor: Int): Dataset[MediaRecord] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.map { r =>
        val src = r.payload
        val out = new Array[Byte]((src.length + factor - 1) / factor)
        var i = 0
        while (i < out.length) { out(i) = src(i * factor); i += 1 }
        MediaRecord(r.doc_id, out, r.fmt, r.lang)
      }
    }
  }

  // -------------------------------------------------------------------
  // REAL decoders — uncompressed formats are pure byte arithmetic, so
  // they need no codec library: PGM (P5 binary grayscale) and WAV
  // (RIFF PCM 16-bit). The stub above remains the stand-in for
  // compressed formats (JPEG/MP3/H.264 need codecs the container lacks);
  // these kernels prove the decode boundary end-to-end — header walk,
  // dimension parse, pixel/sample statistics — through the same batched
  // mapPartitions shape.
  // -------------------------------------------------------------------

  /** Decoded grayscale image statistics. */
  case class PgmStats(doc_id: Long, width: Int, height: Int, maxval: Int,
      n_pixels: Long, px_sum: Long, px_min: Int, px_max: Int)

  /** Decoded PCM audio statistics (16-bit signed little-endian mono). */
  case class WavStats(doc_id: Long, sample_rate: Int, n_samples: Long,
      duration_micros: Long, sum_abs: Long, peak: Int)

  /** Build a P5 PGM payload (header + raw bytes). Fixture-side twin of
    * [[decodePgm]]; also the writer a real grayscale pipeline would use. */
  def encodePgm(width: Int, height: Int, maxval: Int,
      pixel: Int => Int): Array[Byte] = {
    val header = s"P5\n$width $height\n$maxval\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + width * height)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < width * height) {
      out(header.length + i) = (pixel(i) & 0xFF).toByte; i += 1
    }
    out
  }

  /** (width, height, maxval, raster offset) of a P5 header: magic,
    * whitespace-separated dims (with `#` comment lines, per the netpbm
    * spec), one whitespace byte after maxval, then the raster. */
  private def parsePgmHeader(payload: Array[Byte], docId: Long)
      : (Int, Int, Int, Int) = {
    require(payload.length >= 2 && payload(0) == 'P' && payload(1) == '5',
      s"not a P5 PGM payload (doc $docId)")
    var pos = 2
    def nextInt(): Int = {
      var inComment = false
      while (pos < payload.length &&
          (inComment || payload(pos).toChar.isWhitespace || payload(pos) == '#')) {
        if (payload(pos) == '#') inComment = true
        else if (payload(pos) == '\n') inComment = false
        pos += 1
      }
      var v = 0
      while (pos < payload.length && payload(pos) >= '0' && payload(pos) <= '9') {
        v = v * 10 + (payload(pos) - '0'); pos += 1
      }
      v
    }
    val (w, h, maxval) = (nextInt(), nextInt(), nextInt())
    pos += 1 // exactly one whitespace byte separates maxval from raster
    require(payload.length - pos >= w * h,
      s"truncated PGM raster: ${payload.length - pos} < ${w * h} (doc $docId)")
    (w, h, maxval, pos)
  }

  /** Parse a binary (P5) PGM and compute exact pixel statistics — pure
    * integer scanning, no library. */
  def decodePgm(docId: Long, payload: Array[Byte]): PgmStats = {
    val (w, h, maxval, off) = parsePgmHeader(payload, docId)
    var (sum, mn, mx) = (0L, 256, -1)
    var i = 0
    while (i < w * h) {
      val p = payload(off + i) & 0xFF
      sum += p; if (p < mn) mn = p; if (p > mx) mx = p
      i += 1
    }
    PgmStats(docId, w, h, maxval, w.toLong * h, sum,
      if (w * h == 0) 0 else mn, if (w * h == 0) 0 else mx)
  }

  /** REAL nearest-neighbor resize of a P5 PGM payload: output pixel
    * (x, y) samples source pixel (x·w0/w1, y·h0/h1) — integer div, the
    * standard NN mapping. Returns a valid PGM payload, so it composes
    * with [[decodePgm]] (the resize gate decodes its own output). */
  def resizePgm(payload: Array[Byte], newW: Int, newH: Int): Array[Byte] = {
    val (w0, h0, maxval, off) = parsePgmHeader(payload, -1L)
    encodePgm(newW, newH, maxval, i => {
      val (x, y) = (i % newW, i / newW)
      payload(off + (y.toLong * h0 / newH).toInt * w0 +
        (x.toLong * w0 / newW).toInt) & 0xFF
    })
  }

  /** Build a minimal RIFF/WAVE payload: 'fmt ' chunk (PCM, mono,
    * 16-bit little-endian) + 'data' chunk. Fixture-side twin of
    * [[decodeWav]]. */
  def encodeWav(sampleRate: Int, samples: Int => Int, nSamples: Int): Array[Byte] = {
    val dataBytes = nSamples * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2).putShort(2).putShort(16)
    out.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    var i = 0
    while (i < nSamples) { out.putShort(samples(i).toShort); i += 1 }
    out.array()
  }

  /** Walk RIFF chunks (generic — tolerates extra chunks before 'data'),
    * require 16-bit mono PCM, and compute sample statistics in exact
    * integers: duration in micros (`n·1e6 / rate`, integer div), Σ|s|,
    * and peak |s|. */
  def decodeWav(docId: Long, payload: Array[Byte]): WavStats = {
    val buf = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(fourcc() == "RIFF", s"not a RIFF payload (doc $docId)")
    buf.getInt // riff size
    require(fourcc() == "WAVE", s"not a WAVE payload (doc $docId)")
    var (rate, bits, channels) = (0, 0, 0)
    var stats: Option[(Long, Long, Int)] = None
    while (buf.remaining() >= 8 && stats.isEmpty) {
      val (id, size) = (fourcc(), buf.getInt)
      id match {
        case "fmt " =>
          val start = buf.position()
          require(buf.getShort() == 1, s"not PCM (doc $docId)")
          channels = buf.getShort(); rate = buf.getInt()
          buf.getInt; buf.getShort // byte rate, block align
          bits = buf.getShort()
          buf.position(start + size)
        case "data" =>
          require(bits == 16 && channels == 1,
            s"decoder handles 16-bit mono, got $bits-bit ×$channels (doc $docId)")
          val n = size / 2
          var (sumAbs, peak) = (0L, 0)
          var i = 0
          while (i < n) {
            val a = math.abs(buf.getShort().toInt)
            sumAbs += a; if (a > peak) peak = a
            i += 1
          }
          stats = Some((n.toLong, sumAbs, peak))
        case _ => buf.position(buf.position() + size) // skip unknown chunk
      }
    }
    val (n, sumAbs, peak) = stats.getOrElse(
      throw new IllegalArgumentException(s"no data chunk (doc $docId)"))
    WavStats(docId, rate, n, n * 1000000L / rate, sumAbs, peak)
  }

  /** Batched decode of a PGM payload column — same mapPartitions shape
    * as [[extractFeatures]]. */
  def decodePgmStats(records: Dataset[MediaRecord]): Dataset[PgmStats] = {
    import records.sparkSession.implicits._
    records.mapPartitions(it => it.map(r => decodePgm(r.doc_id, r.payload)))
  }

  /** Batched decode of a WAV payload column. */
  def decodeWavStats(records: Dataset[MediaRecord]): Dataset[WavStats] = {
    import records.sparkSession.implicits._
    records.mapPartitions(it => it.map(r => decodeWav(r.doc_id, r.payload)))
  }

  /** Frame-sampling analog: cut the payload into `frameBytes`-sized
    * frames and keep every `stride`-th one (as a real pipeline samples
    * video frames) — native substring arithmetic, no decode needed.
    * Returns array<binary>. */
  def sampleFrames(payload: org.apache.spark.sql.Column, frameBytes: Int, stride: Int): org.apache.spark.sql.Column = {
    val nFrames = ceil(length(payload).cast("double") / frameBytes).cast("int")
    transform(
      filter(sequence(lit(0), greatest(nFrames - 1, lit(0))), i => i % stride === 0),
      i => call_function("substring", payload, i * frameBytes + 1, lit(frameBytes)))
  }
}
