package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd 64-bit SimHash of a text column: lowercase,
  * whitespace-tokenize, xxhash64 each token (duplicates kept — SimHash
  * weights repeats), majority-vote each bit — one compiled pass per row,
  * emitting the fingerprint as a long.
  *
  * Why a custom Expression: the composable form exploded token hashes
  * and aggregated 64 sum() slots per doc — correct, but it shuffles one
  * row PER TOKEN (corpus-token cardinality at 100 TB) and the 64-slot
  * generated aggregate is large enough that its first-run compile cost
  * showed up in benchmarks. As a per-row kernel the fingerprint is
  * narrow (no explode, no shuffle, no agg): exactly the
  * [[WordShingleHashes]] k=1 hash stream folded inline. Bit-identical to
  * the aggregate form (same tokenizer, same seed, same majority rule —
  * asserted in ExpressionsSpec).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SimHashKernel.simhash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.SimHashKernel.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash64 {
  /** Column-API entry point. */
  def apply(text: Column): Column =
    ColumnBridge.toColumn(SimHash64(ColumnBridge.toExpr(text)))
}

/** Static kernel invoked from both interpreted eval and generated code. */
object SimHashKernel {
  def simhash64(text: UTF8String): Long = {
    // Same token-hash stream as WordShingleHashes(k=1, distinct=false).
    val hashes = ShingleKernel.hashShingles(text, 1, distinct = false)
    val n = hashes.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < 64) {
        counts(j) += ((h >>> j) & 1L).toInt
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) * 2 > n) fp |= (1L << j)
      j += 1
    }
    fp
  }
}
