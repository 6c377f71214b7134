package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd word-k-shingle hasher: lowercase, whitespace-split,
  * xxhash64 each k-token shingle, optionally dedupe — one compiled loop
  * per row, emitting array<bigint>.
  *
  * Why a custom Expression: the composable form
  * (`transform(sequence(...), i -> xxhash64(concat_ws(slice(...))))`)
  * routes every shingle through interpreted higher-order-function lambdas
  * (CodegenFallback) and builds the shingle string — ~30× slower per row.
  * The shingle *hash* is all MinHash/Jaccard pipelines consume, so the
  * string never needs to exist. Kernel semantics:
  * tokens = lowercase(text).split(whitespace); shingle_i = hash of
  * tokens[i..i+k-1] joined by ' '; texts with < k tokens produce one
  * shingle of all tokens (matching [[graft.ops.Dedup.wordShingles]]).
  */
case class WordShingleHashes(child: Expression, k: Int, distinct: Boolean)
    extends UnaryExpression {

  // Input must be a string column (AbstractDataType/ExpectsInputTypes is
  // private[sql] in Spark 4, so no declarative input-type contract here).
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleKernel.hashShingles(input.asInstanceOf[UTF8String], k, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.ShingleKernel.hashShingles($c, $k, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): WordShingleHashes =
    copy(child = newChild)

  override def prettyName: String = "word_shingle_hashes"
}

object WordShingleHashes {
  /** Column-API entry point. */
  def apply(text: Column, k: Int, distinct: Boolean): Column =
    ColumnBridge.toColumn(WordShingleHashes(ColumnBridge.toExpr(text), k, distinct))
}

/** xxhash64 of every ≤`maxDist`-deletion variant of the string — the
  * SymSpell candidate-generation kernel for edit-distance matching: if
  * lev(a, b) ≤ k then some ≤k-deletion of a equals some ≤k-deletion of
  * b, so two strings within distance k ALWAYS share a variant hash
  * (hash collisions only ADD candidates; the exact verify removes
  * them — completeness is unconditional). Only the 64-bit hashes are
  * emitted; the variant strings never materialize.
  *
  * Deletions are BYTE-level on the raw UTF-8 encoding: exact for
  * ASCII; for multibyte text a char edit spans several byte edits, so
  * completeness at char-distance k needs byte budget up to 4k (callers
  * matching non-ASCII short fields should pass the byte-level budget).
  * Output size is 1 + n + n(n-1)/2 hashes for maxDist=2 — quadratic in
  * STRING LENGTH, which is why this targets short fields. */
case class DeletionNeighborhoodHashes(child: Expression, maxDist: Int)
    extends UnaryExpression {
  require(maxDist >= 0 && maxDist <= 2,
    s"deletion neighborhood supported for maxDist 0..2, got $maxDist")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleKernel.deletionHashes(input.asInstanceOf[UTF8String], maxDist)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.ShingleKernel.deletionHashes($c, $maxDist)")

  override protected def withNewChildInternal(newChild: Expression): DeletionNeighborhoodHashes =
    copy(child = newChild)

  override def prettyName: String = "deletion_neighborhood_hashes"
}

object DeletionNeighborhoodHashes {
  def apply(text: Column, maxDist: Int): Column =
    ColumnBridge.toColumn(DeletionNeighborhoodHashes(ColumnBridge.toExpr(text), maxDist))
}

/** Static kernel invoked from both interpreted eval and generated code. */
object ShingleKernel {
  private val Seed = 42L

  /** xxhash64 of a UTF-8 byte slice (same kernel Spark's xxhash64 uses). */
  private def hashBytes(bytes: Array[Byte], off: Int, len: Int): Long =
    XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + off, len, Seed)

  def hashShingles(text: UTF8String, k: Int, distinct: Boolean): ArrayData = {
    // Lowercase once, keep UTF-8 bytes; tokens are (start, end) slices.
    val bytes = text.toLowerCase.getBytes
    val n = bytes.length
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var i = 0
    while (i < n) {
      while (i < n && isSpace(bytes(i))) i += 1
      if (i < n) {
        val s = i
        while (i < n && !isSpace(bytes(i))) i += 1
        starts.add(s); ends.add(i)
      }
    }
    val nTok = starts.size()
    val nShingles = if (nTok >= k) nTok - k + 1 else 1
    val out = new Array[Long](nShingles)
    val buf = new Array[Byte](n + k) // shingle bytes joined by ' '
    var w = 0
    while (w < nShingles) {
      val kk = math.min(k, nTok)
      var len = 0
      var j = 0
      while (j < kk && w + j < nTok) {
        if (j > 0) { buf(len) = ' '; len += 1 }
        val ts = starts.get(w + j); val te = ends.get(w + j)
        System.arraycopy(bytes, ts, buf, len, te - ts)
        len += te - ts
        j += 1
      }
      out(w) = hashBytes(buf, 0, len)
      w += 1
    }
    val result =
      if (distinct && nShingles > 1) {
        val seen = new java.util.LinkedHashSet[java.lang.Long]()
        var x = 0
        while (x < nShingles) { seen.add(out(x)); x += 1 }
        val arr = new Array[Long](seen.size())
        val it = seen.iterator(); var y = 0
        while (it.hasNext) { arr(y) = it.next(); y += 1 }
        arr
      } else out
    UnsafeArrayData.fromPrimitiveArray(result)
  }

  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f'

  /** Hashes of all ≤maxDist byte-deletion variants (incl. the string
    * itself), deduplicated, insertion-ordered. */
  def deletionHashes(text: UTF8String, maxDist: Int): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    seen.add(hashBytes(bytes, 0, n))
    if (maxDist >= 1 && n >= 1) {
      val buf = new Array[Byte](n)
      var i = 0
      while (i < n) {
        // delete byte i
        System.arraycopy(bytes, 0, buf, 0, i)
        System.arraycopy(bytes, i + 1, buf, i, n - i - 1)
        seen.add(hashBytes(buf, 0, n - 1))
        if (maxDist >= 2 && n >= 2) {
          // delete byte j > i from the (n-1)-length buffer; indices in
          // buf for original j are j-1, so iterate buf positions >= i
          val buf2 = new Array[Byte](n)
          var j = i
          while (j < n - 1) {
            System.arraycopy(buf, 0, buf2, 0, j)
            System.arraycopy(buf, j + 1, buf2, j, n - 1 - j - 1)
            seen.add(hashBytes(buf2, 0, n - 2))
            j += 1
          }
        }
        i += 1
      }
    }
    val arr = new Array[Long](seen.size())
    val it = seen.iterator(); var y = 0
    while (it.hasNext) { arr(y) = it.next(); y += 1 }
    UnsafeArrayData.fromPrimitiveArray(arr)
  }
}
