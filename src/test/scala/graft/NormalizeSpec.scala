package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Normalize

/** P1-P4 (SURVEY §2.2): envelope strip, json_normalize-style flatten,
  * pandas-rename semantics, null-dropping JSON consolidation — including
  * the §4.3.4 trap (null entries omitted from the consolidated JSON). */
class NormalizeSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // FIXTURES.md §2.1-shaped envelope (reference lms_to_s3_lambda.py:79-83)
  private val envelopeJson =
    """{"totalItems": 2, "limit": 100, "offset": 0, "returnedItems": 2,
      | "users": [
      |  {"id": 101, "firstName": "Ada", "lastName": "Lovelace",
      |   "externalId": "E-7", "hasUsername": true,
      |   "customFields": {"cohort": "2020A", "badge": null, "mentor": "bob"}},
      |  {"id": 102, "firstName": "Mary", "lastName": "Shelley",
      |   "externalId": null, "hasUsername": false,
      |   "customFields": {"cohort": null, "badge": "gold", "mentor": null}}
      | ]}""".stripMargin.replaceAll("\n", " ")

  private def envelopeDf = spark.read.json(Seq(envelopeJson).toDS)

  test("P1 envelope strip drops pagination keys and explodes the payload") {
    val out = Normalize.stripEnvelope(envelopeDf, "users")
    assert(out.columns.toSeq == Seq("users"))
    assert(out.count() == 2)
  }

  test("P2 flatten expands nested structs to dotted columns like json_normalize") {
    val flat = Normalize.flatten(Normalize.stripEnvelope(envelopeDf, "users"))
    val cols = flat.columns.toSet
    assert(cols.contains("users.id"))
    assert(cols.contains("users.customFields.cohort"))
    assert(cols.contains("users.customFields.badge"))
    // scalars and arrays pass through un-expanded
    val row = flat.filter(col("`users.id`") === 101).collect().head
    assert(row.getAs[String]("users.customFields.mentor") == "bob")
  }

  test("P3 rename maps known columns, ignores unknown keys, passes others through") {
    val df = Seq((1L, "Ada", "x")).toDF("id", "firstName", "untouched")
    val out = Normalize.renameColumns(df,
      Map("id" -> "lms_user_id", "firstName" -> "first_name", "missing" -> "nope"))
    assert(out.columns.toSeq == Seq("lms_user_id", "first_name", "untouched"))
  }

  test("P3 reference rename table covers the 36 reference columns") {
    assert(Normalize.referenceRenames.size == 36)
    assert(Normalize.referenceRenames("id") == "lms_user_id")
    assert(Normalize.referenceRenames("externalId") == "illum_id")
    assert(Normalize.referenceRenames("hasUsername") == "has_user_name")
  }

  test("P4 consolidateToJson drops null entries per row (§4.3.4)") {
    val df = Seq(
      (101L, "2020A", null.asInstanceOf[String], "bob"),
      (102L, null.asInstanceOf[String], "gold", null.asInstanceOf[String])
    ).toDF("id", "customFields.cohort", "customFields.badge", "customFields.mentor")
    val out = Normalize.consolidateToJson(df,
      Seq("customFields.cohort", "customFields.badge", "customFields.mentor"), "custom_fields")
    assert(out.columns.toSeq == Seq("id", "custom_fields"))
    val m = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(101L) == """{"cohort":"2020A","mentor":"bob"}""")
    assert(m(102L) == """{"badge":"gold"}""")
  }

  test("P4 consolidateToMap keeps a queryable map with nulls removed") {
    val df = Seq((1L, "a", null.asInstanceOf[String])).toDF("id", "f.x", "f.y")
    val out = Normalize.consolidateToMap(df, Seq("f.x", "f.y"), "m")
    val m = out.collect().head.getAs[Map[String, String]]("m")
    assert(m == Map("x" -> "a"))
  }
}
