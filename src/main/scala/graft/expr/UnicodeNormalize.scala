package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Unicode normalization (NFC / NFD / NFKC / NFKD) — the
  * text-pipeline preprocessing step Spark has no native function for:
  * the same user-visible string arrives from the web in composed and
  * decomposed encodings (é as U+00E9 or as e + U+0301), and every
  * hash-keyed op downstream — exact dedup, shingling, span dedup, BPE
  * vocabularies — silently treats them as DIFFERENT text unless a
  * normalization pass runs first. NFKC additionally folds
  * compatibility forms (①→1, ﬁ→fi, full-width→ASCII), the usual
  * choice before tokenizer training.
  *
  * Per-row scalar kernel (no shuffle, pipelines inside whole-stage
  * codegen with the scan); the JDK's `java.text.Normalizer` implements
  * the Unicode standard algorithm, and the kernel short-circuits on
  * `isNormalized` — true for ASCII-dominated corpora — so the common
  * case pays one scan, no allocation. The `form` argument is bound at
  * plan time (a literal, like the other kernels' int args).
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalizeKernel.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"""graft.expr.UnicodeNormalizeKernel.normalize($c, "$form")""")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)

  override def prettyName: String = "unicode_normalize"
}

object UnicodeNormalize {
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  /** Column-API entry point; `form` must be one of [[Forms]]. */
  def apply(text: Column, form: String = "NFC"): Column = {
    require(Forms(form), s"form must be one of $Forms, got $form")
    ColumnBridge.toColumn(UnicodeNormalize(ColumnBridge.toExpr(text), form))
  }
}

/** Static kernel invoked from both interpreted eval and generated code. */
object UnicodeNormalizeKernel {
  def normalize(text: UTF8String, form: String): UTF8String = {
    val f = java.text.Normalizer.Form.valueOf(form)
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, f)) text
    else UTF8String.fromString(java.text.Normalizer.normalize(s, f))
  }
}
