package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Codegen'd vector kernels for the similarity ops (X1e/X2).
  *
  * The composable form (`aggregate(zip_with(a,b,_*_), 0.0, _+_)`) routes
  * every element through interpreted lambda dispatch (higher-order
  * functions are CodegenFallback). These expressions compile to one tight
  * loop per row while preserving the cross-engine numeric contract:
  * element products in FLOAT (IEEE-identical everywhere), accumulation
  * in DOUBLE, strictly sequential — the exact arithmetic the DuckDB
  * oracle's `list_sum(list_transform(...))` performs, so results stay
  * bit-reproducible.
  */
case class DotProductFloat(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def dataType: DataType = DoubleType

  // analysis-time type gate: with the expression exposed to SQL, an
  // array<double>/array<bigint> argument would otherwise reinterpret raw
  // bytes via getFloat and return garbage instead of failing
  override def inputTypes: Seq[org.apache.spark.sql.graft.TypeBridge.AbstractType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernel.dotF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.VectorKernel.dotF($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProductFloat =
    copy(left = l, right = r)

  override def prettyName: String = "dot_product_f"
}

object DotProductFloat {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.toColumn(DotProductFloat(ColumnBridge.toExpr(a), ColumnBridge.toExpr(b)))
}

/** Integer dot product over int8-quantized vectors (stored as
  * array<int>): products and accumulation in LONG — exact, associative,
  * overflow-free for any realistic dim (|q|≤127 ⇒ |term|≤16129; 2⁶³/16129
  * ≈ 5.7e14 elements). The candidate-scoring kernel of the quantized ANN
  * path: 4× less memory traffic than float32, integer SIMD-friendly. */
case class DotProductInt(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def dataType: DataType = LongType

  override def inputTypes: Seq[org.apache.spark.sql.graft.TypeBridge.AbstractType] =
    Seq(ArrayType(IntegerType), ArrayType(IntegerType))

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernel.dotI(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.VectorKernel.dotI($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProductInt =
    copy(left = l, right = r)

  override def prettyName: String = "dot_product_i"
}

object DotProductInt {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.toColumn(DotProductInt(ColumnBridge.toExpr(a), ColumnBridge.toExpr(b)))
}

/** Widening (double-multiply) float dot product: each element is cast to
  * DOUBLE *before* the multiply, accumulation sequential in DOUBLE — the
  * exact arithmetic of the HOF form
  * `aggregate(zip_with(a, b, (x,y) -> CAST(x AS DOUBLE)*CAST(y AS DOUBLE)), 0D, +)`
  * and of DuckDB's `list_sum(list_transform(list_zip(a,b), CAST·*))`.
  * Distinct from [[DotProductFloat]], whose products round to FLOAT
  * first; the two differ in low-order bits, so an oracle written against
  * double-mul arithmetic must use THIS kernel. Self-application
  * `dot_fw(v, v)` is the squared L2 norm under the same contract. */
case class DotProductFloatWide(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def dataType: DataType = DoubleType

  override def inputTypes: Seq[org.apache.spark.sql.graft.TypeBridge.AbstractType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernel.dotFW(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.VectorKernel.dotFW($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProductFloatWide =
    copy(left = l, right = r)

  override def prettyName: String = "dot_product_fw"
}

object DotProductFloatWide {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.toColumn(DotProductFloatWide(ColumnBridge.toExpr(a), ColumnBridge.toExpr(b)))
}

/** Sign-random-projection LSH bucket id: bit p = sign of ⟨v, h_p⟩ where
  * hyperplane components are derived from xxhash64(p, dim) mapped to
  * [-1, 1) — deterministic, data-independent, no RNG state shipped. */
case class SignProjectionBucket(child: Expression, planes: Int) extends UnaryExpression {
  override def dataType: DataType = LongType

  override protected def nullSafeEval(v: Any): Any =
    VectorKernel.signBucket(v.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.expr.VectorKernel.signBucket($v, $planes)")

  override protected def withNewChildInternal(newChild: Expression): SignProjectionBucket =
    copy(child = newChild)

  override def prettyName: String = "sign_projection_bucket"
}

object SignProjectionBucket {
  def apply(vec: Column, planes: Int): Column =
    ColumnBridge.toColumn(SignProjectionBucket(ColumnBridge.toExpr(vec), planes))
}

object VectorKernel {
  /** Float-multiply / sequential-double-sum dot product (the contract —
    * do not reassociate or vectorize into a different summation order). */
  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i) * b.getFloat(i) // Float*Float, widened on add
      i += 1
    }
    acc
  }

  /** Double-multiply / sequential-double-sum dot product (the
    * [[DotProductFloatWide]] contract — elements widened BEFORE the
    * multiply, so products never round to FLOAT). Dimension mismatch
    * throws (like [[dotI]]): a truncated embedding scored on its prefix
    * would silently cross similarity thresholds, and the engines this
    * kernel claims bit-parity with don't even agree on mismatch
    * (zip_with null-pads to NULL; DuckDB list_sum skips NULLs). */
  def dotFW(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"dot_product_fw dimension mismatch: $n vs ${b.numElements()}")
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  /** Exact long-accumulated integer dot product (int8 range inputs).
    * Dimension mismatch is a data bug, not a prefix to score silently. */
  def dotI(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"dot_product_i dimension mismatch: $n vs ${b.numElements()}")
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getInt(i).toLong * b.getInt(i)
      i += 1
    }
    acc
  }

  /** Deterministic hyperplane component in [-1, 1): pmod(xxhash64 of
    * (plane, dim) with Spark's seed chain, 2000001)/1e6 - 1. Matches
    * graft.ops.Similarity's expression formula. */
  private def planeComponent(plane: Int, dim: Int): Double = {
    // Spark's xxhash64(lit(plane), lit(dim)) folds: hashInt(plane, 42)
    // then hashInt(dim, prev) — ints hash via hashInt.
    val h = XXH64.hashInt(dim, XXH64.hashInt(plane, 42L))
    val m = 2000001L
    val pmod = ((h % m) + m) % m
    (pmod.toDouble - 1000000.0) / 1000000.0
  }

  def signBucket(v: ArrayData, planes: Int): Long = {
    val n = v.numElements()
    var bucket = 0L
    var p = 0
    while (p < planes) {
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += v.getFloat(i) * planeComponent(p, i)
        i += 1
      }
      if (acc >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  /** Achlioptas sparse-projection fold (the
    * [[graft.ops.Similarity.projectArray]] contract): component j =
    * Σᵢ sign(i,j)·v[i] with sign from ((i·7 + j·13) mod 6 → +1/−1/0),
    * elements widened to DOUBLE, accumulation strictly sequential in i.
    * Skipping the sign-0 terms is IEEE-identical to the HOF's
    * `acc + v·0.0` (adding ±0.0 never changes a running double that
    * ascends from +0.0), so kernel output is bit-equal to the
    * interpreted form AND the oracle's list_sum — asserted in
    * `SemDedupSpec` and certified by the unchanged gate hash. */
  def projectSparse(v: ArrayData, outDim: Int): ArrayData = {
    val n = v.numElements()
    val out = new Array[Double](outDim)
    var j = 0
    while (j < outDim) {
      var acc = 0.0
      var i = 0
      while (i < n) {
        val r = (i * 7 + j * 13) % 6
        if (r == 0) acc += v.getFloat(i).toDouble
        else if (r == 1) acc -= v.getFloat(i).toDouble
        i += 1
      }
      out(j) = acc
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Codegen'd Achlioptas sparse projection: array<float> → array<double>
  * of `outDim` components in ONE pass over the input (the HOF form runs
  * outDim interpreted folds per row). */
case class SparseProjectF(child: Expression, outDim: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def inputTypes: Seq[org.apache.spark.sql.graft.TypeBridge.AbstractType] =
    Seq(ArrayType(FloatType))

  override protected def nullSafeEval(a: Any): Any =
    VectorKernel.projectSparse(a.asInstanceOf[ArrayData], outDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expr.VectorKernel.projectSparse($a, $outDim)")

  override protected def withNewChildInternal(newChild: Expression): SparseProjectF =
    copy(child = newChild)

  override def prettyName: String = "sparse_project_f"
}

object SparseProjectF {
  def apply(v: Column, outDim: Int): Column =
    ColumnBridge.toColumn(SparseProjectF(ColumnBridge.toExpr(v), outDim))
}
