package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Single-precision cosine kernels replicating the reference engine's
  * `list_cosine_similarity` bit for bit (DuckDB 1.0, FLOAT lists):
  *
  *   dot += x*y; nx += x*x; ny += y*y   — sequential FLOAT accumulation
  *   sim = dot / (sqrtf(nx) * sqrtf(ny)) — separate single-precision
  *   sqrts, FLOAT multiply and divide — then widened to DOUBLE.
  *
  * Why this exists (round 6): the oracle-checked cosine queries
  * (q_embed_threshold / q_embed_topk_r4 / q_embed_neardup_exact /
  * q_ann_ivf_assign_r4) computed in f64, which is a DIFFERENT value in
  * the last ulps — harmless until a score lands on a round(.,4)
  * half-boundary, where the engines round to different 4th decimals and
  * the oracle hash diverges (observed on regenerated sf data:
  * 0.14864996 f64 vs 0.14865000 f32 → 0.1486 vs 0.1487). Replicating
  * the oracle's arithmetic makes the match structural instead of
  * data-lucky. Replication notes, each load-bearing:
  *   - Java float ops are IEEE-754 single precision, same as the C++
  *     loop (no FMA contraction: the reference binary accumulates with
  *     separate multiply+add — verified bitwise over 25 k pairs);
  *   - `(float) Math.sqrt(double)` equals C++ `sqrtf`: sqrt is
  *     correctly rounded and 53 ≥ 2·24+2, so the double→float double
  *     rounding is exact (Figueroa's theorem);
  *   - float multiplication is commutative bit-for-bit, so argument
  *     order (query first or second) cannot matter.
  *
  * Both kernels take `array<float>` input and keep the repo's
  * loud-null malformed-input contract (null input / null element /
  * length mismatch → null, never a silently-wrong score — same as
  * [[DotMatrix]]). Interpreted eval and generated code share one
  * static method; the call stays inside whole-stage codegen.
  *
  *   - [[CosineF32]]: cosine of two float-array COLUMNS (the pairwise
  *     audit-block join);
  *   - [[CosineToMatrixF32]]: embedding → array of one f32 cosine per
  *     constant matrix row, row order preserved (1-row matrix = the
  *     driver-known query vector; 16-row = the IVF-twin centroids —
  *     the per-row norm is accumulated once and reused, which is
  *     bit-identical to the reference computing it per call).
  */
case class CosineF32(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // null/malformed input → null

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val l = DotMatrix.checkFloatArray(left, prettyName)
    if (!l.isSuccess) l else DotMatrix.checkFloatArray(right, prettyName)
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineF32.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""java.lang.Double ${ev.value}_r = graft.functions.CosineF32$$.MODULE$$.cosine($a, $b);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.doubleValue(); }""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineF32 =
    copy(left = newLeft, right = newRight)
}

case class CosineToMatrixF32(child: Expression, matrix: Array[Array[Float]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    DotMatrix.checkFloatArray(child, prettyName)

  override protected def nullSafeEval(input: Any): Any =
    CosineF32.cosines(input.asInstanceOf[ArrayData], matrix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("cosMatrix", matrix, "float[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.CosineF32$$.MODULE$$.cosines($c, $m);
         |${ev.isNull} = (${ev.value} == null);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): CosineToMatrixF32 =
    copy(child = newChild)
}

object CosineF32 {

  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      CosineF32(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def toMatrix(c: Column, matrix: Seq[Seq[Float]]): Column = {
    require(matrix.nonEmpty, "CosineToMatrixF32: matrix must be non-empty")
    require(matrix.forall(_.length == matrix.head.length),
      s"CosineToMatrixF32: matrix must be rectangular, got row lengths ${matrix.map(_.length).distinct}")
    ColumnBridge.column(CosineToMatrixF32(
      ColumnBridge.expression(c), matrix.map(_.toArray).toArray))
  }

  private def wellFormed(arr: ArrayData, d: Int): Boolean = {
    if (arr.numElements() != d) return false
    var i = 0
    while (i < d) { if (arr.isNullAt(i)) return false; i += 1 }
    true
  }

  /** Plain-Scala reference of the f32 loop over two float arrays —
    * shared by both kernels and usable from specs as the independent
    * replay. */
  def cosineF32(x: Array[Float], y: Array[Float]): Double = {
    var dot = 0.0f; var nx = 0.0f; var ny = 0.0f
    var i = 0
    while (i < x.length) {
      val a = x(i); val b = y(i)
      dot += a * b; nx += a * a; ny += b * b
      i += 1
    }
    (dot / (math.sqrt(nx.toDouble).toFloat * math.sqrt(ny.toDouble).toFloat)).toDouble
  }

  /** Pairwise kernel body (null = malformed: length mismatch or null
    * element — LOUD, never silently wrong). */
  def cosine(a: ArrayData, b: ArrayData): java.lang.Double = {
    val d = a.numElements()
    if (!wellFormed(b, d) || !wellFormed(a, d)) return null
    var dot = 0.0f; var nx = 0.0f; var ny = 0.0f
    var i = 0
    while (i < d) {
      val x = a.getFloat(i); val y = b.getFloat(i)
      dot += x * y; nx += x * x; ny += y * y
      i += 1
    }
    java.lang.Double.valueOf(
      (dot / (math.sqrt(nx.toDouble).toFloat * math.sqrt(ny.toDouble).toFloat)).toDouble)
  }

  /** Matrix kernel body: one f32 cosine per matrix row, row order
    * preserved. The embedding's own norm accumulates once (the same
    * float value the reference reaches per call, so reuse is exact). */
  def cosines(arr: ArrayData, m: Array[Array[Float]]): ArrayData = {
    val n = m.length
    val dim = m(0).length
    if (!wellFormed(arr, dim)) return null
    var nx = 0.0f
    var i = 0
    while (i < dim) { val x = arr.getFloat(i); nx += x * x; i += 1 }
    val sqx = math.sqrt(nx.toDouble).toFloat
    val out = new Array[Double](n)
    var j = 0
    while (j < n) {
      val row = m(j)
      var dot = 0.0f; var ny = 0.0f
      var k = 0
      while (k < dim) {
        val x = arr.getFloat(k); val y = row(k)
        dot += x * y; ny += y * y
        k += 1
      }
      out(j) = (dot / (sqx * math.sqrt(ny.toDouble).toFloat)).toDouble
      j += 1
    }
    ArrayData.toArrayData(out)
  }
}
