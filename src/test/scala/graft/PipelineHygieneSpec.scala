package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit gates for the training-data hygiene ops: decontamination,
  * repetition stats, PII redaction. */
class PipelineHygieneSpec extends AnyFunSuite with SparkTestBase {

  test("decontamination flags the leaked doc, not the clean one") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "completely unrelated text about spark execution plans here"),
      (3L, "partial leak the quick brown fox jumps appears here too")
    ).toDF("doc_id", "text")
    val probe = Seq("the quick brown fox jumps over a fence").toDF("text")
    val got = graft.ops.Dedup
      .decontaminationOverlap(corpus, "doc_id", "text", probe, "text", k = 5)
      .as[(Long, Long)].collect().toMap
    // doc 1 shares "the quick brown fox jumps" (one 5-shingle); doc 3 too
    assert(got.contains(1L) && got.contains(3L))
    assert(!got.contains(2L))
  }

  test("broadcast-free decontamination == broadcast form on identical inputs") {
    import spark.implicits._
    val docs = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
    val probe = docs.filter(col("doc_id") % 3 === 0)
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long)].collect().toMap
    val bcast = asMap(graft.ops.Dedup
      .decontaminationOverlap(docs, "doc_id", "text", probe, "text", k = 5))
    val joined = asMap(graft.ops.Dedup
      .decontaminationOverlapJoin(docs, "doc_id", "text", probe, "text", k = 5))
    assert(bcast == joined, "the two join strategies must agree exactly")
    assert(bcast.nonEmpty)
  }

  test("repetition stats: planted repetition is counted exactly") {
    import spark.implicits._
    val df = Seq(
      (1L, "a a a b"),        // top word 3x; bigrams: "a a","a a","a b" → 1 dup
      (2L, "x y z w")         // no repetition
    ).toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.repetitionStats(df, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("top_word_n"),
         r.getAs[Long]("n_bigrams"), r.getAs[Long]("dup_bigram_n"))).toMap
    assert(got(1L) == ((4L, 3L, 3L, 1L)))
    assert(got(2L) == ((4L, 1L, 3L, 0L)))
  }

  test("PII redaction replaces email, phone, and long ids, keeps prose") {
    import spark.implicits._
    val df = Seq(
      "write to jane.doe@corp.example.com or call +44 20 7946 0958 pin 123456 thanks"
    ).toDF("text")
    val out = df.select(graft.ops.TextAnalysis.redactPii(col("text"))).head().getString(0)
    assert(out.contains("<EMAIL>"))
    assert(out.contains("<PHONE>"))
    assert(out.contains("<ID>"))
    assert(!out.contains("jane"))
    assert(!out.contains("0958"))
    assert(!out.contains("123456"))
    assert(out.contains("write to") && out.contains("thanks"))
  }

  test("PII redaction is identity on clean text") {
    import spark.implicits._
    val clean = "short digits 123 and the year 2024 stay as-is"
    val df = Seq(clean).toDF("text")
    assert(df.select(graft.ops.TextAnalysis.redactPii(col("text"))).head().getString(0) == clean)
  }
}
