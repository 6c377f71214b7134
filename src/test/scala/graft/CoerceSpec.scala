package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Coerce

/** P5-P11 (SURVEY §2.2) + the §4.3 semantics traps: ANSI-safe
  * coerce-to-NULL, the ' ' string sentinel, the '.0' float-artifact
  * scrub, and the dual-format (US-style then ISO) timestamp parse. */
class CoerceSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("P5 float-artifact scrub: '101.0' -> '101', non-integral kept") {
    val df = Seq("101.0", "7.5", "42", "abc", null.asInstanceOf[String]).toDF("v")
    val out = df.select(Coerce.scrubFloatArtifact(col("v")).as("v")).collect().map(_.getString(0))
    assert(out.toSeq == Seq("101", "7.5", "42", "abc", null))
  }

  test("P6 numeric coercion: coerce-to-NULL, float artifacts land on the int") {
    val df = Seq("101.0", "42", "7.9", "N/A", "", null.asInstanceOf[String]).toDF("v")
    val out = df.select(Coerce.toLongCoerce(col("v")).as("v")).collect()
      .map(r => if (r.isNullAt(0)) null else r.getLong(0))
    // 7.9 routes through double then truncating long cast = 7 (pandas
    // Int64 astype truncates the same way)
    assert(out.toSeq == Seq(101L, 42L, 7L, null, null, null))
  }

  test("P7 string sentinel: missing and 'nan' become a single space, not NULL") {
    val df = Seq("x", "nan", "NaN", null.asInstanceOf[String]).toDF("v")
    val out = df.select(Coerce.toSentinelString(col("v")).as("v")).collect().map(_.getString(0))
    assert(out.toSeq == Seq("x", " ", " ", " "))
  }

  test("P8 boolean coercion is try-cast (garbage -> NULL, not error)") {
    val df = Seq("true", "false", "1", "0", "bogus").toDF("v")
    val out = df.select(Coerce.toBoolean(col("v")).as("v")).collect()
      .map(r => if (r.isNullAt(0)) null else r.getBoolean(0))
    assert(out.toSeq == Seq(true, false, true, false, null))
  }

  test("P9/P11 timestamp parse: US format first, ISO fallback, garbage -> NULL") {
    val df = Seq(
      "03-01-2020 09:00:00",       // reference format MM-dd-yyyy (§4.3.5)
      "2024-06-15T12:30:00",       // ISO (what stage 1 actually writes)
      "2024-06-15 12:30:00",
      "not-a-date"
    ).toDF("v")
    val out = df.select(Coerce.toTimestampUtc(col("v")).as("v")).collect()
      .map(r => if (r.isNullAt(0)) null else r.getTimestamp(0).toString)
    assert(out.toSeq == Seq(
      "2020-03-01 09:00:00.0", "2024-06-15 12:30:00.0", "2024-06-15 12:30:00.0", null))
  }

  test("W2 toSchema coerces a CSV-shaped frame to the target schema (FIXTURES §2.2)") {
    val df = Seq(
      ("101.0", "42.0", "Ada", "1", "True", "03-01-2020 09:00:00"),
      ("102", null, null, "0", "False", "not-a-date"),
      ("103", "7.5", "nan", "1", "True", "2024-06-15T12:30:00")
    ).toDF("lms_user_id", "employee_number", "first_name", "active_status", "is_admin", "date_hired")
    val target = StructType(Seq(
      StructField("lms_user_id", LongType),
      StructField("employee_number", LongType),
      StructField("first_name", StringType),
      StructField("active_status", LongType),
      StructField("is_admin", BooleanType),
      StructField("date_hired", TimestampType),
      StructField("not_in_input", StringType)))
    val out = Coerce.toSchema(df, target)
    assert(out.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      target.fields.map(f => (f.name, f.dataType)).toSeq)
    val rows = out.orderBy("lms_user_id").collect()
    assert(rows(0).getLong(0) == 101L && rows(0).getLong(1) == 42L)
    assert(rows(1).isNullAt(1))                       // missing -> NULL long
    assert(rows(1).getString(2) == " ")               // missing string -> sentinel
    assert(rows(2).getString(2) == " ")               // 'nan' -> sentinel
    assert(rows(1).isNullAt(5))                       // bad date -> NULL
    assert(rows(2).getTimestamp(5) == Timestamp.valueOf("2024-06-15 12:30:00"))
    assert(rows(0).getBoolean(4) && !rows(1).getBoolean(4))
    assert(rows.forall(_.getString(6) == " "))        // absent column -> typed sentinel
  }
}
