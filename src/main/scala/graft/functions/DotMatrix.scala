package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Constant-matrix dot-product kernels for the ANN paths.
  *
  * The higher-order-function formulation (`transform(sequence(...), j →
  * aggregate(zip_with(...)))`) is correct but its lambda expressions are
  * CodegenFallback in Spark — every vector pays interpreted eval plus a
  * boxed closure call per element, and the enclosing Project drops out
  * of whole-stage codegen. These two expressions keep the exact same
  * arithmetic (same f32→f64 widening, same index-order accumulation —
  * pinned ≡ the higher-order twin in spec) as tight primitive loops with
  * `doGenCode`, the matrix riding along as a codegen reference object:
  *
  *   - [[DotMatrix]]: embedding → array of one dot per matrix row
  *     (the LSH hyperplane projection / IVF probe-ranking kernel);
  *   - [[ArgMaxDot]]: embedding → index of the best matrix row, first
  *     index on exact ties (the IVF cell assignment, fused — no
  *     intermediate array, no second scan for the argmax).
  *
  * Both expect `array<float>` input (the embeddings schema); null
  * input → null output.
  */
case class DotMatrix(child: Expression, matrix: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    DotMatrix.checkFloatArray(child, prettyName)

  override protected def nullSafeEval(input: Any): Any =
    DotMatrix.dots(input.asInstanceOf[ArrayData], matrix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("dotMatrix", matrix, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.DotMatrix$$.MODULE$$.dots($c, $m)")
  }

  override protected def withNewChildInternal(newChild: Expression): DotMatrix =
    copy(child = newChild)
}

case class ArgMaxDot(child: Expression, matrix: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    DotMatrix.checkFloatArray(child, prettyName)

  override protected def nullSafeEval(input: Any): Any =
    DotMatrix.argMaxDot(input.asInstanceOf[ArrayData], matrix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("dotMatrix", matrix, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.DotMatrix$$.MODULE$$.argMaxDot($c, $m)")
  }

  override protected def withNewChildInternal(newChild: Expression): ArgMaxDot =
    copy(child = newChild)
}

object DotMatrix {

  def apply(c: Column, matrix: Seq[Seq[Double]]): Column =
    ColumnBridge.column(DotMatrix(ColumnBridge.expression(c),
      matrix.map(_.toArray).toArray))

  def argMax(c: Column, matrix: Seq[Seq[Double]]): Column =
    ColumnBridge.column(ArgMaxDot(ColumnBridge.expression(c),
      matrix.map(_.toArray).toArray))

  private[functions] def checkFloatArray(child: Expression, name: String)
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$name expects array<float>, got ${other.catalogString}")
    }

  /** Shared eval body — interpreted eval AND generated code (static
    * call, stays inside whole-stage codegen). Accumulation order and
    * f32→f64 widening match the higher-order twin exactly. A null
    * element (nullable array) contributes NaN — the twin's zip_with
    * yields null there instead; the engine's embeddings are
    * containsNull=false in practice and the spec pins the non-null
    * contract. */
  def dots(arr: ArrayData, m: Array[Array[Double]]): ArrayData = {
    val n = m.length
    val out = new Array[Double](n)
    val d = arr.numElements()
    var j = 0
    while (j < n) {
      val row = m(j)
      val lim = math.min(d, row.length)
      var s = 0.0
      var i = 0
      while (i < lim) { s += arr.getFloat(i).toDouble * row(i); i += 1 }
      out(j) = s
      j += 1
    }
    ArrayData.toArrayData(out)
  }

  /** First index of the maximum dot (strict `>` — exact ties keep the
    * earliest row, the same verdict as array_position(array_max)). */
  def argMaxDot(arr: ArrayData, m: Array[Array[Double]]): Int = {
    val n = m.length
    val d = arr.numElements()
    var best = Double.NegativeInfinity
    var bestJ = 0
    var j = 0
    while (j < n) {
      val row = m(j)
      val lim = math.min(d, row.length)
      var s = 0.0
      var i = 0
      while (i < lim) { s += arr.getFloat(i).toDouble * row(i); i += 1 }
      if (s > best) { best = s; bestJ = j }
      j += 1
    }
    bestJ
  }
}
