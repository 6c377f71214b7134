package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SeqPattern

class SeqPatternSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
  private def t(s: Int) = new java.sql.Timestamp(ts0.getTime + s * 1000L)

  test("sequenceStrings: total (ts, id) order, partition-invariant") {
    // same-ts rows must fall back to event_id for a total order
    val rows = Seq(
      (1L, t(3), 30L, "c"), (1L, t(1), 10L, "s"), (1L, t(2), 21L, "v"),
      (1L, t(2), 20L, "p"), (2L, t(5), 50L, "v"))
    for (parts <- Seq(1, 5)) {
      val got = SeqPattern.sequenceStrings(
          rows.toDF("k", "ts", "id", "sym").repartition(parts),
          "k", Seq(col("ts"), col("id")), col("sym"))
        .as[(Long, String)].collect().toMap
      assert(got == Map(1L -> "spvc", 2L -> "v"))
    }
  }

  test("motifCount: non-overlapping leftmost, literal (regex chars count literally)") {
    val df = Seq("vvvv", "vvv", "cpcp", "", "a.b.a.b").toDF("seq")
    def counts(m: String) =
      df.select(SeqPattern.motifCount(col("seq"), m)).as[Long].collect().toSeq
    assert(counts("vv") == Seq(2L, 1L, 0L, 0L, 0L))
    assert(counts("cp") == Seq(0L, 0L, 2L, 0L, 0L))
    assert(counts(".b") == Seq(0L, 0L, 0L, 0L, 2L)) // '.' is literal
  }

  test("containsSubsequence: gaps allowed, order required, symbols escaped") {
    val df = Seq(("x", "svcvp"), ("y", "pcs"), ("z", "a.c*b")).toDF("id", "seq")
    val got = df.select(col("id"),
        SeqPattern.containsSubsequence(col("seq"), "scp").as("m"))
      .as[(String, Boolean)].collect().toMap
    assert(got == Map("x" -> true, "y" -> false, "z" -> false))
    // regex metachars in the SUBSEQUENCE are literal: ".*" must not match "ab"
    val esc = Seq("ab", "a.*b").toDF("seq")
      .select(SeqPattern.containsSubsequence(col("seq"), ".*").as("m"))
      .as[Boolean].collect().toSeq
    assert(esc == Seq(false, true))
  }
}
