package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.expr.{DeletionNeighborhoodHashes, DotProductFloat, DotProductFloatWide, DotProductInt, SignProjectionBucket, SimHash64, UnicodeNormalize, WordShingleHashes}

/** SQL surface for the custom expressions: `word_shingle_hashes(text, k,
  * distinct)`, `dot_product_f(a, b)`, `dot_product_i(a, b)`,
  * `dot_product_fw(a, b)`, `sign_projection_bucket(v, planes)`,
  * `simhash64(text)`, `deletion_neighborhood_hashes(text, maxDist)`,
  * `unicode_normalize(text, 'NFC'|'NFD'|'NFKC'|'NFKD')`.
  *
  * Two registration paths:
  *  - cluster/spark-submit: `--conf spark.sql.extensions=graft.GraftExtensions`
  *  - an existing session: `GraftExtensions.register(spark)`
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.registrations.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }

  private def boolArg(e: Expression, what: String): Boolean = e match {
    case Literal(v: Boolean, _) => v
    case other => throw new IllegalArgumentException(s"$what must be a boolean literal, got $other")
  }

  private[graft] val registrations: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("word_shingle_hashes",
      new ExpressionInfo(classOf[WordShingleHashes].getName, "word_shingle_hashes"),
      (args: Seq[Expression]) =>
        WordShingleHashes(args.head, intArg(args(1), "k"), boolArg(args(2), "distinct"))),
    ("dot_product_f",
      new ExpressionInfo(classOf[DotProductFloat].getName, "dot_product_f"),
      (args: Seq[Expression]) => DotProductFloat(args.head, args(1))),
    ("dot_product_i",
      new ExpressionInfo(classOf[DotProductInt].getName, "dot_product_i"),
      (args: Seq[Expression]) => DotProductInt(args.head, args(1))),
    ("dot_product_fw",
      new ExpressionInfo(classOf[DotProductFloatWide].getName, "dot_product_fw"),
      (args: Seq[Expression]) => DotProductFloatWide(args.head, args(1))),
    ("sign_projection_bucket",
      new ExpressionInfo(classOf[SignProjectionBucket].getName, "sign_projection_bucket"),
      (args: Seq[Expression]) => SignProjectionBucket(args.head, intArg(args(1), "planes"))),
    ("simhash64",
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => SimHash64(args.head)),
    ("deletion_neighborhood_hashes",
      new ExpressionInfo(classOf[DeletionNeighborhoodHashes].getName,
        "deletion_neighborhood_hashes"),
      (args: Seq[Expression]) =>
        DeletionNeighborhoodHashes(args.head, intArg(args(1), "maxDist"))),
    ("unicode_normalize",
      new ExpressionInfo(classOf[UnicodeNormalize].getName, "unicode_normalize"),
      (args: Seq[Expression]) => UnicodeNormalize(args.head, args(1) match {
        case Literal(v, _) if v != null => v.toString
        case other => throw new IllegalArgumentException(
          s"form must be a string literal, got $other")
      }))
  )

  /** Register on an already-built session (test/REPL path). */
  def register(spark: SparkSession): Unit =
    registrations.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
