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
}
