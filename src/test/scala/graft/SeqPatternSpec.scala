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

  test("markovTransitions: per-key adjacency, no cross-key bleed, trunc-micro rows") {
    // user 1: a→b→a→b  (pairs ab, ba, ab); user 2: b→c (pair bc);
    // user 3: single event — contributes nothing. If streams bled
    // across keys in user_id order, a spurious (b, b) or (b, a) pair
    // would appear between users.
    val rows = Seq(
      (1L, t(1), 10L, "a"), (1L, t(2), 11L, "b"), (1L, t(3), 12L, "a"),
      (1L, t(4), 13L, "b"), (2L, t(1), 20L, "b"), (2L, t(2), 21L, "c"),
      (3L, t(9), 30L, "z"))
    for (parts <- Seq(1, 4)) {
      val got = SeqPattern.markovTransitions(
          rows.toDF("k", "ts", "id", "st").repartition(parts),
          "k", Seq(col("ts"), col("id")), col("st"))
        .as[(String, String, Long, Long)].collect().toSet
      // from 'a': 2×(a→b) of total 2 → p = 1.0; from 'b': (b→a) once
      // (user 1, t2→t3) and (b→c) once (user 2) of total 2 → 0.5 each.
      // User 1's trailing 'b' and user 3's lone 'z' emit nothing.
      assert(got == Set(
        ("a", "b", 2L, 1000000L),
        ("b", "a", 1L, 500000L),
        ("b", "c", 1L, 500000L)))
    }
  }

  test("markovTransitions: truncation dust — row probs sum to ≤ 1e6") {
    // from 'x': three distinct successors once each → 333333×3 = 999999
    val rows = Seq(
      (1L, t(1), 1L, "x"), (1L, t(2), 2L, "a"),
      (2L, t(1), 3L, "x"), (2L, t(2), 4L, "b"),
      (3L, t(1), 5L, "x"), (3L, t(2), 6L, "c"))
    val got = SeqPattern.markovTransitions(
        rows.toDF("k", "ts", "id", "st"),
        "k", Seq(col("ts"), col("id")), col("st"))
      .as[(String, String, Long, Long)].collect()
    assert(got.map(_._4).toSet == Set(333333L))
    assert(got.map(_._4).sum == 999999L)
  }
}
