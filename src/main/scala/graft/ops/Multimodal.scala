package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling (EXT X5 — SURVEY §2.5): image/audio/video
  * payloads ride as opaque `binary` columns next to a typed metadata
  * struct; decode / feature-extraction runs batched per partition.
  *
  * The container has no media codecs, so the decode kernel is a clearly
  * marked deterministic STUB — but everything Spark-side is real and
  * load-bearing at scale: the (payload binary, meta struct) schema, the
  * `mapPartitions` batching shape (one iterator per partition, the same
  * contract a vectorized/Arrow UDF batch has), and the feature schema
  * out. Swapping the stub for a real decoder changes no plan shape.
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
