package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.io.JdbcUpsert

/** S8 sink: upsert statement generation (mirrors the reference's
  * string-built ON CONFLICT form, rds:71-79) and the harness-side
  * parquet merge sink's LWW + idempotence. */
class JdbcUpsertSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("upsert statement matches the reference's ON CONFLICT shape") {
    val sql = JdbcUpsert.upsertStatement("department_members",
      Seq("lms_user_id", "first_name", "email"), Seq("lms_user_id"))
    assert(sql ==
      """INSERT INTO "department_members" ("lms_user_id", "first_name", "email") VALUES (?, ?, ?) """ +
        """ON CONFLICT ("lms_user_id") DO UPDATE SET "first_name" = EXCLUDED."first_name", "email" = EXCLUDED."email"""")
  }

  test("all-key upsert degrades to DO NOTHING") {
    val sql = JdbcUpsert.upsertStatement("t", Seq("k1", "k2"), Seq("k1", "k2"))
    assert(sql.endsWith("DO NOTHING"))
  }

  test("keys must be a subset of columns") {
    intercept[IllegalArgumentException] {
      JdbcUpsert.upsertStatement("t", Seq("a"), Seq("missing"))
    }
  }

  test("mergeIntoParquet: create, upsert, idempotent re-apply") {
    val path = Files.createTempDirectory("graft_merge").toString + "/table"
    val batch1 = Seq((101L, "old", 1L), (102L, "b", 1L)).toDF("k", "v", "ver")
    JdbcUpsert.mergeIntoParquet(spark, path, batch1, Seq("k"), Seq("ver"))
    val batch2 = Seq((101L, "new", 2L), (103L, "c", 2L)).toDF("k", "v", "ver")
    JdbcUpsert.mergeIntoParquet(spark, path, batch2, Seq("k"), Seq("ver"))
    def state() = spark.read.parquet(path).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(state() == Map(101L -> "new", 102L -> "b", 103L -> "c"))
    JdbcUpsert.mergeIntoParquet(spark, path, batch2, Seq("k"), Seq("ver"))
    assert(state() == Map(101L -> "new", 102L -> "b", 103L -> "c"))
  }
}
