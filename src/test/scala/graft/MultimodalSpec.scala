package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal
import graft.ops.Multimodal.MediaRecord

/** X5 — multimodal plumbing: schema, batching shape, and the stub
  * kernels' VALUES (the oracle only gates doc_id/n_bytes/fmt plumbing and
  * the feature width; the numbers are pinned here). */
class MultimodalSpec extends AnyFunSuite with SparkTestBase {
  import Multimodal._

  private def records(rows: (Long, String)*) = {
    val s = spark; import s.implicits._
    packBinary(rows.toDF("doc_id", "text"), "doc_id", "text", lang = "text", fmt = "text/plain")
      .withColumn("lang", lit("en")).as[MediaRecord]
  }

  test("extractFeatures: width, byte count, and exact stub values") {
    val s = spark; import s.implicits._
    val out = extractFeatures(records((1L, "abcdefghij"), (2L, ""))).collect()
      .map(f => f.doc_id -> f).toMap
    assert(out(1L).n_bytes == 10L && out(1L).fmt == "text/plain")
    assert(out(1L).feature.length == stubFeatureDim)
    // "abcdefghij": slot j sums bytes at positions j, j+8, ... then /n.
    // slot 0 = ('a' + 'i')/255/10; slot 2..7 = single byte /255/10.
    val b = "abcdefghij".getBytes("UTF-8").map(_ & 0xFF)
    val expect = Array.tabulate(stubFeatureDim) { j =>
      (b.indices.filter(_ % stubFeatureDim == j).map(b(_) / 255.0f).sum / 10).toFloat
    }
    out(1L).feature.zip(expect).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-6f)
    }
    // empty payload: defined, all-zero vector (no div-by-zero)
    assert(out(2L).n_bytes == 0L && out(2L).feature.forall(_ == 0.0f))
  }

  test("resizePayloads keeps every factor-th byte, ceil length") {
    val s = spark; import s.implicits._
    val out = resizePayloads(records((1L, "abcdefghij")), factor = 4).collect().head
    assert(new String(out.payload, "UTF-8") == "aei") // ceil(10/4)=3: bytes 0,4,8
  }

  test("sampleFrames cuts frames and strides") {
    val s = spark; import s.implicits._
    val df = records((1L, "abcdefghij")).toDF()
    val frames = df.select(sampleFrames(col("payload"), frameBytes = 3, stride = 2).as("f"))
      .selectExpr("transform(f, x -> decode(x, 'UTF-8')) AS f")
      .as[Seq[String]].collect().head
    // frames of 3 bytes: abc, def, ghi, j — keep every 2nd: abc, ghi
    assert(frames == Seq("abc", "ghi"))
  }

  test("PGM decode: round trip, netpbm comment headers, truncation error") {
    // 3×2, pixels 10..15: stats by hand
    val p = encodePgm(3, 2, 255, i => 10 + i)
    val st = decodePgm(7L, p)
    assert(st == PgmStats(7L, 3, 2, 255, 6L, 75L, 10, 15))
    // a header with # comment lines (the formula gate never emits them)
    val commented = ("P5\n# made by hand\n3 2\n# maxval next\n255\n"
      .getBytes("US-ASCII") ++ p.drop(p.length - 6))
    assert(decodePgm(8L, commented) == st.copy(doc_id = 8L))
    // truncated raster fails loudly, not with garbage stats
    val e = intercept[IllegalArgumentException](decodePgm(9L, p.dropRight(1)))
    assert(e.getMessage.contains("truncated"))
    // non-PGM magic rejected
    intercept[IllegalArgumentException](decodePgm(9L, "JFIF".getBytes))
  }

  test("PGM resize: NN mapping by hand; identity resize preserves the raster") {
    // 4×2 source, pixel(i) = i: resize to 2×1 samples (0·4/2 + 0, 0·4/2 + 2) = px 0, 2
    val src = encodePgm(4, 2, 255, i => i)
    val half = decodePgm(1L, resizePgm(src, 2, 1))
    assert(half.width == 2 && half.height == 1 && half.px_sum == 0L + 2L)
    // identity resize: bit-equal payload (NN at same dims maps i -> i)
    assert(java.util.Arrays.equals(resizePgm(src, 4, 2), src))
    // upscale 4×2 → 8×2: each source pixel sampled twice per row
    val up = decodePgm(1L, resizePgm(src, 8, 2))
    assert(up.n_pixels == 16L && up.px_sum == 2L * (0 until 8).sum)
  }

  test("WAV decode: hand stats, unknown chunk skipped, non-PCM rejected") {
    // samples −3, 4, −5: Σ|s| = 12, peak 5; rate 8000 → 3 samples = 375 µs
    val w = encodeWav(8000, Seq(-3, 4, -5)(_), 3)
    assert(decodeWav(1L, w) == WavStats(1L, 8000, 3L, 375L, 12L, 5))
    // an extra chunk between fmt and data must be skipped, not parsed
    val (head, data) = w.splitAt(36)
    val extra = head ++ "LIST".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII") ++ data
    assert(decodeWav(2L, extra) == WavStats(2L, 8000, 3L, 375L, 12L, 5))
    // compressed (non-PCM audioFormat) rejected loudly
    val nonPcm = w.clone(); nonPcm(20) = 2 // audioFormat field
    val e = intercept[IllegalArgumentException](decodeWav(3L, nonPcm))
    assert(e.getMessage.contains("not PCM"))
  }

  test("GIF decode: hand-assembled LZW byte vector (decoder pinned independently of the encoder)") {
    // 3×1 image, pixels [1,1,2], 4-color palette, min code size 2:
    // codes CLEAR(4) 1 1 2 EOI(5) at 3 bits LSB-first = bytes 4C 54.
    // Hand-packed so a shared encoder/decoder bug cannot cancel out.
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    val handmade =
      "GIF89a".getBytes("US-ASCII") ++
      b(3, 0, 1, 0, 0x91, 0, 0) ++                 // LSD: 3×1, GCT 4 entries
      b(0, 0, 0, 0x55, 0x55, 0x55, 0xAA, 0xAA, 0xAA, 0xFF, 0xFF, 0xFF) ++
      b(0x2C, 0, 0, 0, 0, 3, 0, 1, 0, 0) ++        // image descriptor
      b(2) ++                                      // LZW min code size
      b(2, 0x4C, 0x54) ++                          // one 2-byte sub-block
      b(0, 0x3B)                                   // terminator, trailer
    val f = decodeGifFrame(1L, handmade)
    assert(f.width == 3 && f.height == 1 && f.nColors == 4)
    assert(f.raster.toSeq == Seq(1, 1, 2))
    // the encoder must produce these exact bytes from the same raster —
    // pinning BOTH directions to the spec's bit layout
    assert(java.util.Arrays.equals(encodeGif(3, 1, 2, Seq(1, 1, 2)(_)), handmade))
    // an extension block (e.g. graphic control) before the image
    // descriptor must be skipped, not parsed as raster
    val withExt =
      handmade.take(25) ++ b(0x21, 0xF9, 4, 0, 0, 0, 0, 0) ++ handmade.drop(25)
    assert(decodeGifFrame(2L, withExt).raster.toSeq == Seq(1, 1, 2))
  }

  test("GIF round trip: random rasters survive encode→decode bit-exactly, incl. the 12-bit dictionary cap") {
    val rng = new scala.util.Random(77)
    // small repetitive raster (dictionary stays narrow) …
    val small = Array.fill(500)(rng.nextInt(4))
    val smallGif = encodeGif(50, 10, 2, small(_))
    assert(decodeGifFrame(1L, smallGif).raster.toSeq == small.toSeq)
    // … and a large NOISE raster at 8 bpp: 40k random bytes push the
    // dictionary past 4096 entries, forcing the mid-stream CLEAR +
    // width reset path on both sides
    val noise = Array.fill(200 * 200)(rng.nextInt(256))
    val noiseGif = encodeGif(200, 200, 8, noise(_))
    assert(decodeGifFrame(2L, noiseGif).raster.toSeq == noise.toSeq)
    // run-length data must genuinely compress; noise must not explode
    val runs = Array.tabulate(10000)(i => (i / 50) % 16)
    val runsGif = encodeGif(100, 100, 4, runs(_))
    assert(decodeGif(3L, runsGif).n_code_bytes < 10000L / 3)
    // non-GIF payload rejected loudly
    intercept[IllegalArgumentException](decodeGifFrame(9L, "JFIF".getBytes))
  }
}
