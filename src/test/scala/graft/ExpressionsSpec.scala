package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Custom Catalyst expressions: kernel/HOF equivalence (the codegen'd
  * kernels must compute the exact same values as the composable forms)
  * and the SQL registration surface. */
class ExpressionsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("DotProductFloat == HOF aggregate(zip_with) bit-for-bit") {
    val df = Seq(
      (Array(1.5f, -2.25f, 3.125f), Array(0.5f, 4.0f, -1.0f)),
      (Array(0.1f, 0.2f), Array(0.3f, 0.4f))
    ).toDF("a", "b")
    val rows = df.select(
      graft.expr.DotProductFloat(col("a"), col("b")).as("kernel"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("hof")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1))) // exact, not approx
  }

  test("DotProductFloatWide == double-cast HOF bit-for-bit; self-dot == sum of squares") {
    val df = Seq(
      (Array(1.5f, -2.25f, 3.125f), Array(0.5f, 4.0f, -1.0f)),
      // values whose float-product rounds differently than double-product,
      // so this test FAILS if dotFW regresses to float-multiply
      (Array(0.1f, 0.2f, 0.3f), Array(0.7f, 0.11f, 0.13f))
    ).toDF("a", "b")
    val rows = df.select(
      graft.expr.DotProductFloatWide(col("a"), col("b")).as("kernel"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v).as("hof"),
      graft.expr.DotProductFloatWide(col("a"), col("a")).as("selfdot"),
      aggregate(transform(col("a"), v => v.cast("double") * v.cast("double")),
        lit(0.0), (acc, v) => acc + v).as("sumsq"),
      graft.expr.DotProductFloat(col("a"), col("b")).as("narrow")).collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1)) // exact, not approx
      assert(r.getDouble(2) == r.getDouble(3))
    }
    // the second row's narrow (float-mul) kernel differs in low bits —
    // proves wide and narrow are genuinely distinct contracts
    assert(rows(1).getDouble(0) != rows(1).getDouble(4))
    // dimension mismatch fails loudly (dotI's stance) instead of
    // silently scoring the common prefix
    val mismatch = Seq((Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    assertThrows[Exception] {
      mismatch.select(graft.expr.DotProductFloatWide(col("a"), col("b"))).collect()
    }
  }

  test("SignProjectionBucket is deterministic and spreads vectors") {
    val df = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.5f)),
      (1L, Array(-1.0f, 0.2f, -0.3f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f, 0.5f)) // identical to 0
    ).toDF("id", "v")
    val b = df.select(col("id"), graft.expr.SignProjectionBucket(col("v"), 8).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b(0L) == b(2L))
    assert(b.values.forall(x => x >= 0 && x < 256))
  }

  test("SQL registration: functions callable from spark.sql") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT word_shingle_hashes('a b c d', 2, true) AS sh,
        |       dot_product_f(array(cast(1.0 as float), cast(2.0 as float)),
        |                     array(cast(3.0 as float), cast(4.0 as float))) AS d,
        |       sign_projection_bucket(array(cast(1.0 as float)), 4) AS bkt
        |""".stripMargin).collect().head
    assert(r.getSeq[Long](0).length == 3) // 'a b','b c','c d'
    assert(r.getDouble(1) == 11.0)
    assert(r.getLong(2) >= 0 && r.getLong(2) < 16)
    val r2 = spark.sql(
      """SELECT dot_product_i(array(1, -2, 3), array(4, 5, 6)) AS di,
        |       deletion_neighborhood_hashes('abc', 2) AS dn,
        |       dot_product_fw(array(cast(1.0 as float), cast(2.0 as float)),
        |                      array(cast(3.0 as float), cast(4.0 as float))) AS dw
        |""".stripMargin).collect().head
    assert(r2.getLong(0) == 4L - 10L + 18L)
    assert(r2.getDouble(2) == 11.0)
    // 'abc' ≤2-deletions: abc, ab, ac, bc, a, b, c → 7 distinct variants
    assert(r2.getSeq[Long](1).length == 7)
    // type misuse fails at ANALYSIS, not with garbage results
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT dot_product_i(array(1.5, 2.5), array(1.5, 2.5))").collect()
    }
    assert(err.getMessage.toLowerCase.contains("type"))
  }

  test("SimHash64 kernel equals the explode + 64-sum-slot aggregate form") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the the the repeated token stream the the"),
      (3L, "x"),
      (4L, "Mixed CASE Tokens mixed case tokens"),
      (5L, "")
    ).toDF("id", "t")
    val kernel = docs.select(col("id"), graft.expr.SimHash64(col("t")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference: the previous aggregate formulation, bit for bit
    val tok = docs.select(col("id"),
      explode(graft.expr.WordShingleHashes(col("t"), 1, distinct = false)).as("_h"))
    val bitAggs = (0 until 64).map(j =>
      sum(call_function("shiftright", col("_h"), lit(j)).bitwiseAND(lit(1L))).as(s"_c$j"))
    val counted = tok.groupBy(col("id")).agg(count(lit(1)).as("_n"), bitAggs: _*)
    val fpExpr = (0 until 64).map(j =>
      when(col(s"_c$j") * 2 > col("_n"), lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ bitwiseOR _)
    val agg = counted.select(col("id"), fpExpr.as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kernel == agg)
    assert(kernel(2L) != 0L) // single token: fingerprint is the token's bits
  }

  test("WordShingleHashes: null text -> null, short text -> one shingle") {
    val df = Seq(Some("one two"), None).toDF("t")
    val out = df.select(graft.expr.WordShingleHashes(col("t"), 3, distinct = true).as("h")).collect()
    assert(out(0).getSeq[Long](0).length == 1)
    assert(out(1).isNullAt(0))
  }

  test("UnicodeNormalize: NFC composes, NFKC compatibility-folds, idempotent, SQL surface, null") {
    // e + combining acute (U+0301) -> U+00E9; A + combining ring
    // (U+030A) -> U+00C5; NFKC additionally folds circled-one U+2460
    // -> "1", parenthesized-two U+2475 -> "(2)", fi-ligature U+FB01
    // -> "fi"
    val decomposed = "cafe\u0301 A\u030A \u2460\u2475 \uFB01n"
    val df = Seq(Some(decomposed), Some("plain ascii"), None).toDF("t")
    val out = df.select(
      graft.expr.UnicodeNormalize(col("t"), "NFC").as("nfc"),
      graft.expr.UnicodeNormalize(col("t"), "NFKC").as("nfkc")).collect()
    assert(out(0).getString(0) == "caf\u00E9 \u00C5 \u2460\u2475 \uFB01n")
    assert(out(0).getString(1) == "caf\u00E9 \u00C5 1(2) fin")
    // ASCII short-circuits unchanged; null propagates
    assert(out(1).getString(0) == "plain ascii" && out(1).getString(1) == "plain ascii")
    assert(out(2).isNullAt(0) && out(2).isNullAt(1))
    // idempotence + agreement with the JDK reference on mixed probes
    val probe = Seq("e\u0301\u0301x", "\uFF21\uFF22c", "no\u0308el", "")
      .map(Some(_)).toDF("t")
    val got = probe.select(col("t"),
      graft.expr.UnicodeNormalize(col("t"), "NFKC").as("n1"),
      graft.expr.UnicodeNormalize(
        graft.expr.UnicodeNormalize(col("t"), "NFKC"), "NFKC").as("n2")).collect()
    got.foreach { r =>
      val want = java.text.Normalizer.normalize(r.getString(0),
        java.text.Normalizer.Form.NFKC)
      assert(r.getString(1) == want && r.getString(2) == want)
    }
    // registered SQL surface
    GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT unicode_normalize('cafe\u0301', 'NFC')").collect().head.getString(0)
    assert(viaSql == "caf\u00E9")
    // bad form rejected loudly at the Column API
    intercept[IllegalArgumentException](
      graft.expr.UnicodeNormalize(col("t"), "NFX"))
  }

  test("URL canonicalization: case, default ports, dup slashes, " +
      "fragments, tracking params, param sort; schemeless is NULL; " +
      "non-default ports and encodings pass through") {
    import spark.implicits._
    val in = Seq(
      "HTTP://Example.COM:80//a//b?utm_source=x&b=2&a=1#frag",
      "https://example.com:443/",
      "https://example.com:8443/x?gclid=1",
      "http://example.com",
      "http://example.com/p?a=1&A=2", // case-sensitive params kept, sorted bytewise
      "example.com/no-scheme",
      "http://example.com/p%20q?x=%2F" // percent-encoding untouched (boundary)
    ).toDF("url")
    val out = in.select(
        graft.ops.TextAnalysis.canonicalizeUrl(col("url")).as("c"))
      .collect().map(r => Option(r.getString(0)))
    assert(out(0).contains("http://example.com/a/b?a=1&b=2"))
    assert(out(1).contains("https://example.com/"))
    assert(out(2).contains("https://example.com:8443/x"))
    assert(out(3).contains("http://example.com/"))
    assert(out(4).contains("http://example.com/p?A=2&a=1"))
    assert(out(5).isEmpty)
    assert(out(6).contains("http://example.com/p%20q?x=%2F"))
  }
}
