package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge.{toCol, toExpr}
import org.apache.spark.sql.types._

/** Tight-loop array kernels as native codegen'd expressions.
  *
  * Spark's higher-order functions (`zip_with`/`aggregate`) interpret their
  * lambda per element — measured ~50× slower than a fused loop on the
  * 12.5M-pair × 64-dim workload of the dedup/ANN operators. These
  * expressions keep the whole pair pipeline inside whole-stage codegen
  * with one static call per row.
  */
object VectorRuntime {
  /** Σ aᵢ·bᵢ in double, left-to-right — same accumulation order as the
    * HOF formulation, so results are bit-identical to it. */
  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  def dotD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  def dotFD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getDouble(i); i += 1 }
    s
  }

  /** PQ encode: nearest codebook centroid per subspace (squared-L2,
    * lower index wins ties). `codebook` is flat [m][k][subDim] doubles;
    * returns the m int codes. One allocation (the output) per row. */
  def pqEncode(vec: ArrayData, codebook: ArrayData, m: Int, k: Int): ArrayData = {
    val dim = vec.numElements()
    val subDim = dim / m
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        val base = (j * k + c) * subDim
        var d2 = 0.0
        var d = 0
        while (d < subDim) {
          val diff = vec.getFloat(j * subDim + d).toDouble - codebook.getDouble(base + d)
          d2 += diff * diff
          d += 1
        }
        if (d2 < bestD) { bestD = d2; best = c }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }

  /** ADC dot product: q · x̂ where x̂ is the PQ reconstruction named by
    * `codes` — gathers each subspace's centroid and fuses the multiply-
    * accumulate, zero allocation. */
  def pqAdcDot(q: ArrayData, codes: ArrayData, codebook: ArrayData, k: Int): Double = {
    val m = codes.numElements()
    val subDim = q.numElements() / m
    var s = 0.0
    var j = 0
    while (j < m) {
      val base = (j * k + codes.getInt(j)) * subDim
      var d = 0
      while (d < subDim) {
        s += q.getFloat(j * subDim + d).toDouble * codebook.getDouble(base + d)
        d += 1
      }
      j += 1
    }
    s
  }

  /** ‖x̂‖² of a PQ reconstruction — centroid gather + square-accumulate. */
  def pqReconNorm2(codes: ArrayData, codebook: ArrayData, subDim: Int, k: Int): Double = {
    val m = codes.numElements()
    var s = 0.0
    var j = 0
    while (j < m) {
      val base = (j * k + codes.getInt(j)) * subDim
      var d = 0
      while (d < subDim) {
        val x = codebook.getDouble(base + d)
        s += x * x
        d += 1
      }
      j += 1
    }
    s
  }

  /** |A ∩ B| for two ascending-sorted long arrays — merge scan, O(n+m),
    * zero allocation. Inputs must be distinct-element sorted sets. */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

/** `dot_product(a, b)` over float/double arrays → double. */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  private def elem(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  private lazy val fn: String = (elem(left), elem(right)) match {
    case (FloatType, FloatType) => "dotF"
    case (DoubleType, DoubleType) => "dotD"
    case (FloatType, DoubleType) => "dotFD"
    case (a, b) => throw new IllegalArgumentException(
      s"dot_product needs float/double arrays, got $a / $b")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = fn match {
    case "dotF" => VectorRuntime.dotF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    case "dotD" => VectorRuntime.dotD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    case _ => VectorRuntime.dotFD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expr.VectorRuntime.$fn($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `sorted_intersect_count(a, b)` over sorted array<bigint> sets → int. */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorRuntime.sortedIntersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expr.VectorRuntime.sortedIntersectCount($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `pq_encode(vec, codebook)` → array<int> of m nearest-centroid codes. */
case class PqEncodeExpr(left: Expression, right: Expression, m: Int, k: Int)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override protected def nullSafeEval(v: Any, cb: Any): Any =
    VectorRuntime.pqEncode(v.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData], m, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cb) =>
      s"${ev.value} = graft.expr.VectorRuntime.pqEncode($v, $cb, $m, $k);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `pq_adc_dot(q, codes, codebook)`: query·reconstruction in one gather. */
case class PqAdcDotExpr(q: Expression, codes: Expression, codebook: Expression,
    k: Int) extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def first: Expression = q
  override def second: Expression = codes
  override def third: Expression = codebook
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    VectorRuntime.pqAdcDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      c.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) =>
      s"${ev.value} = graft.expr.VectorRuntime.pqAdcDot($a, $b, $c, $k);")
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression) = copy(q = a, codes = b, codebook = c)
}

/** `pq_recon_norm2(codes, codebook)`: squared norm of the reconstruction. */
case class PqReconNorm2Expr(left: Expression, right: Expression,
    subDim: Int, k: Int) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorRuntime.pqReconNorm2(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], subDim, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expr.VectorRuntime.pqReconNorm2($a, $b, $subDim, $k);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object vectorFunctions {
  def dot_product(a: Column, b: Column): Column =
    toCol(DotProductExpr(toExpr(a), toExpr(b)))
  def sorted_intersect_count(a: Column, b: Column): Column =
    toCol(SortedIntersectCountExpr(toExpr(a), toExpr(b)))
  def pq_encode(vec: Column, codebook: Column, m: Int, k: Int): Column =
    toCol(PqEncodeExpr(toExpr(vec), toExpr(codebook), m, k))
  def pq_adc_dot(q: Column, codes: Column, codebook: Column, k: Int): Column =
    toCol(PqAdcDotExpr(toExpr(q), toExpr(codes), toExpr(codebook), k))
  def pq_recon_norm2(codes: Column, codebook: Column, subDim: Int, k: Int): Column =
    toCol(PqReconNorm2Expr(toExpr(codes), toExpr(codebook), subDim, k))
}
