package graft

import org.apache.spark.sql.DataFrame
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
}
