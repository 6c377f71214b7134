package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Tables
import graft.ops.{Coerce, Merge, Normalize}

/** FIXTURES §2.4 golden end-to-end: the reference's W1 (extract) + W2
  * (load) chain over a literal envelope — strip → flatten → rename →
  * consolidate → CSV round-trip → schema coercion → keyed merge —
  * checked against hand-computed expected rows. */
class GoldenPipelineSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val envelope =
    """{"totalItems": 2, "limit": 100, "offset": 0, "returnedItems": 2,
      | "users": [
      |  {"id": 101, "firstName": "Ada", "lastName": "Lovelace", "isAdmin": true,
      |   "employeeNumber": "42", "dateHired": "03-01-2020 09:00:00",
      |   "customFields": {"cohort": "2020A", "badge": null}},
      |  {"id": 103, "firstName": "Grace", "lastName": "Hopper", "isAdmin": false,
      |   "employeeNumber": null, "dateHired": "06-15-2024 12:30:00",
      |   "customFields": {"cohort": null, "badge": "gold"}}
      | ]}""".stripMargin.replaceAll("\n", " ")

  test("W1+W2: envelope → normalized CSV → coerced → merged (golden)") {
    // ---- W1: extract stage (lms_to_s3_lambda.py:192-212)
    val raw = spark.read.json(Seq(envelope).toDS)
    val flat = Normalize.flatten(Normalize.stripEnvelope(raw, "users"))
    val dropPrefix = flat.columns.map(c => col(s"`$c`").as(c.stripPrefix("users."))).toSeq
    val users = flat.select(dropPrefix: _*)
    val renamed = Normalize.renameColumns(users, Normalize.referenceRenames)
    val cfCols = renamed.columns.filter(_.startsWith("customFields.")).toSeq
    val consolidated = Normalize.consolidateToJson(renamed, cfCols, "custom_fields")

    // ---- CSV round trip (the stage boundary, lms:211 / rds:111)
    val tmp = Files.createTempDirectory("graft_golden").toString
    Tables.writeCsv(consolidated, s"$tmp/users_csv")
    val fromCsv = Tables.readCsv(spark, s"$tmp/users_csv")

    // ---- W2: load stage (s3_to_rds_lambda.py:132-150)
    val target = StructType(Seq(
      StructField("lms_user_id", LongType), StructField("first_name", StringType),
      StructField("last_name", StringType), StructField("is_admin", BooleanType),
      StructField("employee_number", LongType), StructField("date_hired", TimestampType),
      StructField("custom_fields", StringType)))
    val coerced = Coerce.toSchema(fromCsv, target)

    val existing = Seq(
      (101L, "Ada-OLD", "Lovelace-OLD", false, 41L, "01-01-2019 00:00:00", """{"cohort":"old"}"""),
      (102L, "Mary", "Shelley", false, 7L, "01-01-2018 00:00:00", """{"cohort":"2018"}""")
    ).toDF("lms_user_id", "first_name", "last_name", "is_admin", "employee_number", "date_hired", "custom_fields")
    val existingCoerced = Coerce.toSchema(existing, target)

    val merged = Merge.upsertLww(existingCoerced, coerced,
      Seq("lms_user_id"), Seq("date_hired"), Seq("first_name"))

    val rows = merged.orderBy("lms_user_id").collect()
    assert(rows.length == 3)
    val ada = rows(0)
    assert(ada.getLong(0) == 101L && ada.getString(1) == "Ada") // incoming won
    assert(ada.getLong(4) == 42L)
    assert(ada.getString(6) == """{"cohort":"2020A"}""") // null badge dropped
    assert(rows(1).getString(1) == "Mary") // untouched existing survives
    val grace = rows(2)
    assert(grace.getLong(0) == 103L && grace.isNullAt(4)) // null employee_number
    assert(grace.getString(6) == """{"badge":"gold"}""")
    assert(grace.getTimestamp(5).toString == "2024-06-15 12:30:00.0")
  }
}
