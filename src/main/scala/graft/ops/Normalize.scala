package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structural normalization: the Spark-native re-expression of the
  * reference's extract-stage shaping (`src/lms_to_s3_lambda.py`):
  *
  *  - envelope strip (P1, `lms_to_s3_lambda.py:78-80`)
  *  - `pd.json_normalize` nested-JSON flattening (P2, `:83`)
  *  - bulk camelCase→snake_case rename (P3, `:88-142`)
  *  - consolidation of sparse columns into one null-free JSON column
  *    (P4, `:145-163`)
  *
  * Everything here is pure DataFrame-API — projections and native JSON
  * expressions — so Catalyst keeps column pruning / pushdown and the whole
  * stage stays inside codegen (the reference's row-wise `.apply` at `:157`
  * is exactly the pattern this avoids).
  */
object Normalize {

  /** P1 — drop pagination/envelope keys, keep the payload. The reference
    * pops `totalItems/limit/offset/returnedItems` then selects `users`
    * (`lms_to_s3_lambda.py:78-83`). In Spark that is a projection; if the
    * payload is an array of records, explode it to rows. */
  def stripEnvelope(df: DataFrame, payload: String): DataFrame = {
    val exploded = df.schema(payload).dataType match {
      case _: ArrayType => df.select(explode(col(payload)).as(payload))
      case _            => df.select(col(payload))
    }
    exploded
  }

  /** P2 — recursive struct star-expansion with dotted names, matching
    * `pd.json_normalize` (`lms_to_s3_lambda.py:83`): nested structs become
    * `parent.child` columns; arrays and scalars pass through as-is. */
  def flatten(df: DataFrame, sep: String = "."): DataFrame = {
    def expand(dt: DataType, path: Column, name: String): Seq[(Column, String)] =
      dt match {
        case st: StructType =>
          st.fields.toSeq.flatMap(f => expand(f.dataType, path.getField(f.name), s"$name$sep${f.name}"))
        case _ => Seq(path -> name)
      }
    val cols = df.schema.fields.toSeq.flatMap { f =>
      f.dataType match {
        case st: StructType =>
          st.fields.toSeq.flatMap(g => expand(g.dataType, col(f.name).getField(g.name), s"${f.name}$sep${g.name}"))
        case _ => Seq(col(f.name) -> f.name)
      }
    }
    df.select(cols.map { case (c, n) => c.as(n) }: _*)
  }

  /** P3 — the reference's 36-entry extract-stage rename
    * (`lms_to_s3_lambda.py:99-137`), preserved verbatim. */
  val referenceRenames: Map[String, String] = Map(
    "id" -> "lms_user_id",
    "departmentId" -> "department_id",
    "firstName" -> "first_name",
    "middleName" -> "middle_name",
    "lastName" -> "last_name",
    "username" -> "user_name",
    "emailAddress" -> "email_address",
    "externalId" -> "illum_id",
    "ccEmailAddresses" -> "cc_email_addresses",
    "languageId" -> "language_id",
    "gender" -> "gender",
    "address" -> "address",
    "address2" -> "address2",
    "city" -> "city",
    "provinceId" -> "province_id",
    "countryId" -> "country_id",
    "postalCode" -> "postal_code",
    "phone" -> "phone",
    "employeeNumber" -> "employee_number",
    "location" -> "location",
    "jobTitle" -> "job_title",
    "referenceNumber" -> "reference_number",
    "dateHired" -> "date_hired",
    "dateTerminated" -> "date_terminated",
    "dateEdited" -> "date_edited",
    "dateAdded" -> "date_added",
    "lastLoginDate" -> "last_login_date",
    "notes" -> "notes",
    "roleIds" -> "role_ids",
    "activeStatus" -> "active_status",
    "isLearner" -> "is_learner",
    "isAdmin" -> "is_admin",
    "isInstructor" -> "is_instructor",
    "isManager" -> "is_manager",
    "supervisorId" -> "supervisor_id",
    "hasUsername" -> "has_user_name"
  )

  /** P3 — bulk rename with pandas `rename` semantics: mapped columns are
    * renamed, unknown mapping keys are ignored, unmapped columns pass
    * through untouched (`lms_to_s3_lambda.py:88-142`). */
  def renameColumns(df: DataFrame, renames: Map[String, String]): DataFrame = {
    val present = renames.filter { case (from, _) => df.columns.contains(from) }
    df.withColumnsRenamed(present)
  }

  /** P4 — consolidate a set of sparse columns into ONE JSON-string column,
    * dropping null entries per row, then drop the originals
    * (`lms_to_s3_lambda.py:145-163`). The reference does this with a
    * row-wise `row.dropna().to_dict()` apply; Spark's `to_json` omits null
    * fields by default (`spark.sql.jsonGenerator.ignoreNullFields=true`),
    * so a single native expression reproduces it inside codegen. */
  def consolidateToJson(df: DataFrame, cols: Seq[String], target: String): DataFrame = {
    val payload = struct(cols.map(c => quoted(c).as(stripPrefix(c))): _*)
    df.withColumn(target, to_json(payload)).drop(cols: _*)
  }

  /** Map form of P4: keep a queryable MapType column (null values removed)
    * instead of an opaque JSON string. */
  def consolidateToMap(df: DataFrame, cols: Seq[String], target: String): DataFrame = {
    val kvs = cols.flatMap(c => Seq(lit(stripPrefix(c)), quoted(c).cast(StringType)))
    val m = map_filter(map(kvs: _*), (_, v) => v.isNotNull)
    df.withColumn(target, m).drop(cols: _*)
  }

  /** Column ref by literal name — flattened columns contain dots, which
    * bare `col()` would parse as struct-field access. */
  private def quoted(c: String): Column = col(s"`$c`")

  /** `customFields.cohort` → `cohort`, matching the reference's
    * `col.split('.')[1]` key derivation (`lms_to_s3_lambda.py:153-156`). */
  private def stripPrefix(c: String): String = {
    val i = c.indexOf('.')
    if (i >= 0) c.substring(i + 1) else c
  }
}
