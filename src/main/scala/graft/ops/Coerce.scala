package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-driven type coercion: the Spark-native re-expression of the
  * reference's load stage (`src/s3_to_rds_lambda.py:38-65,116-130`), where
  * a CSV-inferred DataFrame is cast to the authoritative target (DB)
  * schema with pandas `errors='coerce'` semantics.
  *
  * Spark 4 defaults ANSI mode ON, so a plain `cast` would throw on
  * malformed input; every cast here is a `try_*` variant, which gives
  * exactly the reference's coerce-to-NULL behavior (SURVEY §4.3 item 1).
  * All expressions are native (codegen-friendly) — zero UDFs.
  */
object Coerce {

  /** P5 — the reference's float-artifact scrub (`s3_to_rds_lambda.py:40-43`):
    * CSV round-trips inflate ints to floats (`101` → `"101.0"`); the
    * reference string-replaces a trailing `.0`. Native form: if the value
    * is numerically integral, render it as the integer; otherwise keep the
    * original rendering. Applied to string-typed cells. */
  def scrubFloatArtifact(c: Column): Column = {
    val d = tryCast(c.cast(StringType), "double")
    when(d.isNotNull && d === d.cast(LongType).cast(DoubleType),
      d.cast(LongType).cast(StringType)).otherwise(c.cast(StringType))
  }

  /** P7 — string coercion with the reference's sentinel: missing strings
    * become a single space `" "`, NOT NULL, and the literal `"nan"` (the
    * pandas `astype(str)` artifact) is mapped to the same sentinel
    * (`s3_to_rds_lambda.py:52-55`). Deliberately preserved wart. */
  def toSentinelString(c: Column): Column = {
    val s = c.cast(StringType)
    when(s.isNull || s === "nan" || s === "NaN", lit(" ")).otherwise(s)
  }

  /** P8 — boolean coercion (`astype(bool)`, `s3_to_rds_lambda.py:56-57`).
    * Spark's cast semantics ("true"/"1"→true, invalid→NULL under try_cast)
    * are saner than pandas truthiness (`bool("False") == True`); SURVEY
    * §2.2 P8 documents the divergence as intentional. */
  def toBoolean(c: Column): Column = tryCast(c, "boolean")

  /** The reference's explicit timestamp format — US month-first, despite
    * its docstring claiming ISO (`s3_to_rds_lambda.py:120`; SURVEY §4.3.5). */
  val referenceTsFormat = "MM-dd-yyyy HH:mm:ss"

  /** P9/P11 — timestamp coercion (`pd.to_datetime(errors='coerce')` +
    * UTC normalize, `s3_to_rds_lambda.py:58-59,116-130`): try the
    * reference's explicit format first, fall back to ISO-8601 (what stage
    * 1 actually writes), unparseable → NULL. Session tz is UTC, so the
    * tz_localize('UTC') step is implicit. */
  def toTimestampUtc(c: Column): Column = {
    val s = c.cast(StringType)
    coalesce(
      try_to_timestamp(s, lit(referenceTsFormat)),
      try_to_timestamp(s)
    )
  }

  /** try_cast as an expression (Column.try_cast has no stable pre-4.x API
    * surface; the SQL function form is identical post-analysis). */
  def tryCast(c: Column, to: String): Column = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, EvalMode}
    import org.apache.spark.sql.graft.ColumnBridge
    val dt = org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parseDataType(to)
    ColumnBridge.toColumn(Cast(ColumnBridge.toExpr(c), dt, None, EvalMode.TRY))
  }

  /** P6 numeric route: string → double → long, so `"101.0"` → 101 and
    * garbage → NULL, matching `pd.to_numeric(errors='coerce')` +
    * nullable Int64 (`s3_to_rds_lambda.py:48-51`). */
  def toLongCoerce(c: Column): Column =
    tryCast(tryCast(c.cast(StringType), "double"), "bigint")

  /** W2's cast pipeline (`s3_to_rds_lambda.py:38-65`): coerce `df` to the
    * authoritative `target` schema, column by column, with the per-type
    * rules above. Columns absent from `df` come out as typed NULLs
    * (the reference would fail there; we're lenient). Column order and
    * names follow `target` — schema-on-write. */
  def toSchema(df: DataFrame, target: StructType): DataFrame = {
    val cols = target.fields.map { f =>
      val in: Column = if (df.columns.contains(f.name)) col(f.name) else lit(null)
      val out = f.dataType match {
        case LongType | IntegerType | ShortType => toLongCoerce(in).cast(f.dataType)
        case DoubleType | FloatType             => tryCast(in.cast(StringType), "double").cast(f.dataType)
        case StringType                         => toSentinelString(in)
        case BooleanType                        => toBoolean(in)
        case TimestampType                      => toTimestampUtc(in)
        case _: DecimalType                     => tryCast(in.cast(StringType), f.dataType.sql.toLowerCase)
        case _                                  => in.cast(f.dataType)
      }
      out.as(f.name)
    }
    df.select(cols.toSeq: _*)
  }
}
