package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.lit
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Merge

/** S8/W4 upsert-as-merge (FIXTURES §2.3): last-write-wins, incoming
  * beats existing, idempotence, and window/agg form agreement. */
class MergeSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def existing: DataFrame = Seq(
    (101L, "old-email", 1L), (102L, "b@x", 1L)
  ).toDF("lms_user_id", "email", "ver")

  private def incoming: DataFrame = Seq(
    (101L, "new-email", 2L), (103L, "c@x", 2L)
  ).toDF("lms_user_id", "email", "ver")

  private def asMap(df: DataFrame): Map[Long, String] =
    df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("upsert: incoming wins on conflict, both sides' unmatched rows kept") {
    val out = Merge.upsertLww(existing, incoming, Seq("lms_user_id"), Seq("ver"))
    assert(asMap(out) == Map(101L -> "new-email", 102L -> "b@x", 103L -> "c@x"))
  }

  test("upsert: incoming wins even on EQUAL recency (ON CONFLICT DO UPDATE)") {
    val tied = incoming.withColumn("ver", org.apache.spark.sql.functions.lit(1L))
    val out = Merge.upsertLww(existing, tied, Seq("lms_user_id"), Seq("ver"))
    assert(asMap(out)(101L) == "new-email")
  }

  test("upsert is idempotent: merge(merge(t,b),b) == merge(t,b)") {
    val once = Merge.upsertLww(existing, incoming, Seq("lms_user_id"), Seq("ver"))
    val twice = Merge.upsertLww(once, incoming, Seq("lms_user_id"), Seq("ver"))
    assert(asMap(once) == asMap(twice))
  }

  test("agg form and window form agree") {
    val w = Merge.upsertLww(existing, incoming, Seq("lms_user_id"), Seq("ver"))
    val a = Merge.upsertLwwAgg(existing, incoming, Seq("lms_user_id"), Seq("ver"))
    assert(asMap(w) == asMap(a))
  }

  test("applyCdc: newest op wins, D deletes, I inserts, idempotent") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "bal")
    val log = Seq(
      (2L, "b2", 21.0, "U", 1L), (2L, "b3", 22.0, "U", 2L), // latest U wins
      (3L, "c", 30.0, "D", 1L),                             // delete
      (4L, "d", 40.0, "I", 1L),                             // insert new key
      (5L, "e", 50.0, "I", 1L), (5L, "e", 50.0, "D", 2L)    // insert then delete
    ).toDF("k", "name", "bal", "op", "seq")
    val out = Merge.applyCdc(base, log, Seq("k"), Seq("seq"))
    def asMap2(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    val m = asMap2(out)
    assert(m == Map(1L -> ("a", 10.0), 2L -> ("b3", 22.0), 4L -> ("d", 40.0)))
    assert(asMap2(Merge.applyCdc(out, log, Seq("k"), Seq("seq"))) == m) // idempotent
  }

  test("scd2History collapses runs into intervals with correct validity") {
    val log = Seq(
      // user 1: a,a,b,b,a — three intervals
      (1L, 10L, "a"), (1L, 20L, "a"), (1L, 30L, "b"), (1L, 40L, "b"), (1L, 50L, "a"),
      // user 2: single value — one open interval
      (2L, 5L, "x"),
      // user 3: null run then value — null-safe change detection
      (3L, 1L, null), (3L, 2L, null), (3L, 3L, "y")
    ).toDF("user_id", "ts", "attr")
    val out = Merge.scd2History(log, "user_id", "attr", "ts")
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)) ->
        (Option(r.get(1)).map(_.toString), if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))
      .toMap
    assert(out((1L, 10L)) == (Some("a"), Some(30L), false))
    assert(out((1L, 30L)) == (Some("b"), Some(50L), false))
    assert(out((1L, 50L)) == (Some("a"), None, true))
    assert(out((2L, 5L)) == (Some("x"), None, true))
    assert(out((3L, 1L)) == (None, Some(3L), false)) // null run is one interval
    assert(out((3L, 3L)) == (Some("y"), None, true))
    assert(out.size == 6)
  }

  test("latestByKey and latestByKeyAgg agree on a log with ties broken by id") {
    val log = Seq(
      (1L, "a", 10L, 100L), (1L, "a", 20L, 101L), (1L, "a", 20L, 102L),
      (2L, "b", 5L, 103L)
    ).toDF("user_id", "etype", "ts", "event_id")
    val w = Merge.latestByKey(log, Seq("user_id", "etype"), Seq("ts"), Seq("event_id"))
    val a = Merge.latestByKeyAgg(log, Seq("user_id", "etype"), Seq("ts"), Seq("event_id"))
    val wm = w.collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(3)).toMap
    val am = a.collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(3)).toMap
    assert(wm == am)
    assert(wm((1L, "a")) == 102L) // tie on ts=20 resolved to larger event_id
  }

  test("snapshotDiff classifies added/removed/changed/unchanged; nulls compare null-safe") {
    val prev = Seq(
      (1L, Some("a"), Some(1.0)), // unchanged
      (2L, Some("b"), Some(2.0)), // changed value
      (3L, Option.empty[String], Some(3.0)), // null attr, unchanged (null-safe)
      (4L, Some("d"), Some(4.0)), // removed
      (5L, Some("e"), Option.empty[Double]) // null -> value = changed
    ).toDF("id", "name", "v")
    val next = Seq(
      (1L, Some("a"), Some(1.0)),
      (2L, Some("b"), Some(9.0)),
      (3L, Option.empty[String], Some(3.0)),
      (5L, Some("e"), Some(5.0)),
      (6L, Some("f"), Some(6.0)) // added
    ).toDF("id", "name", "v")
    val got = Merge.snapshotDiff(prev, next, Seq("id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "unchanged",
      4L -> "removed", 5L -> "changed", 6L -> "added"))
  }

  test("snapshotDiff ignores columns only one side has (schema evolution)") {
    import org.apache.spark.sql.functions._
    val prev = Seq((1L, "a")).toDF("id", "name")
    val next = Seq((1L, "a")).toDF("id", "name").withColumn("extra", lit(99))
    val got = Merge.snapshotDiff(prev, next, Seq("id")).select("change").head().getString(0)
    assert(got == "unchanged", "uncomparable column must not force 'changed'")
  }

  test("snapshotDiff on keys-only snapshots: membership diff, no empty-struct crash") {
    val prev = Seq(Tuple1(1L), Tuple1(2L)).toDF("id")
    val next = Seq(Tuple1(2L), Tuple1(3L)).toDF("id")
    val got = Merge.snapshotDiff(prev, next, Seq("id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged", 3L -> "added"))
  }

  test("scd2AsOf: half-open intervals — successor owns its valid_from instant") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // key 1: A @10:00 → B @11:00 (current); key 2 first seen 12:00
    val src = Seq(
      (1L, ts("2024-01-01 10:00:00"), "A"),
      (1L, ts("2024-01-01 11:00:00"), "B"),
      (2L, ts("2024-01-01 12:00:00"), "C")).toDF("k", "ts", "attr")
    val hist = Merge.scd2History(src, "k", "attr", "ts")
    def at(s: String): Map[Long, String] =
      Merge.scd2AsOf(hist, lit(s).cast("timestamp"))
        .select("k", "attr").as[(Long, String)].collect().toMap
    // strictly inside the first interval
    assert(at("2024-01-01 10:30:00") == Map(1L -> "A"))
    // exactly AT the boundary: the new version owns the instant
    assert(at("2024-01-01 11:00:00") == Map(1L -> "B"))
    // exactly AT a key's first valid_from: the version is live
    assert(at("2024-01-01 10:00:00") == Map(1L -> "A"))
    // before any version of key 1: empty
    assert(at("2024-01-01 09:59:59") == Map.empty[Long, String])
    // after key 2 appears: one current row per key, no duplicates
    assert(at("2024-01-01 12:00:00") == Map(1L -> "B", 2L -> "C"))
  }

  test("pitJoin: per-fact version lookup — boundary, pre-history NULL, unknown key NULL") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val hist = Merge.scd2History(Seq(
        (1L, ts("2024-01-01 10:00:00"), "A"),
        (1L, ts("2024-01-01 11:00:00"), "B")).toDF("k", "ts", "attr"),
      "k", "attr", "ts").withColumnRenamed("attr", "state")
    val facts = Seq(
      (100L, 1L, ts("2024-01-01 10:30:00")), // inside v1
      (101L, 1L, ts("2024-01-01 11:00:00")), // boundary → v2 owns it
      (102L, 1L, ts("2024-01-01 09:00:00")), // before history → NULL
      (103L, 9L, ts("2024-01-01 10:30:00"))  // unknown key → NULL
    ).toDF("event_id", "k", "fts")
    val got = Merge.pitJoin(facts, hist, "k", "fts")
      .select("event_id", "state").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got == Map(100L -> Some("A"), 101L -> Some("B"),
      102L -> None, 103L -> None))
    // fact-preserving: exactly one output row per fact
    assert(Merge.pitJoin(facts, hist, "k", "fts").count() == 4L)
  }

  test("columnDiff: null-safe cell compare, shared-columns-only, membership ignored") {
    val prev = Seq(
      (1L, Option("a"), Option(10L)), (2L, Option("b"), Option(20L)),
      (3L, Option.empty[String], Option(30L)), (9L, Option("z"), Option(90L)))
      .toDF("k", "s", "v")
    // key 1: s changed; key 2: v → NULL (change); key 3: NULL → NULL s
    // (NOT a change) and v same; key 7 only in next, 9 only in prev —
    // membership differences are snapshotDiff's story, excluded here
    val next = Seq(
      (1L, Option("A"), Option(10L)), (2L, Option("b"), Option.empty[Long]),
      (3L, Option.empty[String], Option(30L)), (7L, Option("q"), Option(70L)))
      .toDF("k", "s", "v")
    val got = Merge.columnDiff(prev, next, Seq("k"))
      .as[(String, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got == Map("s" -> ((1L, 3L)), "v" -> ((1L, 3L))))
    // column present in only one snapshot is not compared
    val withExtra = Merge.columnDiff(prev.withColumn("only_prev", lit(1)),
      next, Seq("k")).select("column_name").as[String].collect().toSet
    assert(withExtra == Set("s", "v"))
  }

  test("cdcCompact: all four net rules, last payload, born-and-died absent") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val t0 = ts("2024-01-01 10:00:00"); val t1 = ts("2024-01-01 11:00:00")
    val t2 = ts("2024-01-01 12:00:00")
    val cdc = Seq(
      (1L, "I", t0, 1L, "a"), (1L, "U", t1, 2L, "b"),            // I..U → I(b)
      (2L, "I", t0, 3L, "x"), (2L, "D", t1, 4L, "y"),            // I..D → gone
      (3L, "U", t0, 5L, "p"), (3L, "D", t1, 6L, "q"),            // U..D → D
      (4L, "U", t0, 7L, "m"), (4L, "U", t1, 8L, "n"),            // U..U → U(n)
      (5L, "I", t0, 9L, "s"),                                    // lone I → I(s)
      // same-ts churn: tie broken by event_id — last is op U id 11
      (6L, "I", t2, 10L, "g"), (6L, "U", t2, 11L, "h"))
      .toDF("k", "op", "ts", "eid", "payload")
    val got = Merge.cdcCompact(cdc, "k", "op", "ts", "payload", Seq("eid"))
      .select("k", "net_op", "payload", "n_events")
      .as[(Long, String, String, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(got == Map(
      1L -> (("I", "b", 2L)), 3L -> (("D", "q", 2L)),
      4L -> (("U", "n", 2L)), 5L -> (("I", "s", 1L)),
      6L -> (("I", "h", 2L))))
    assert(!got.contains(2L), "born-and-died key must be absent")
  }
}
