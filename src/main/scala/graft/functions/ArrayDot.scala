package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: `array_dot(a, b)` = Σ aᵢ·bᵢ over two
  * `array<double>` columns — the inner loop of every similarity
  * operator (brute-force top-k, LSH signatures, IVF cell assignment,
  * cosine near-dup).
  *
  * The composed form `aggregate(zip_with(a, b, _*_), 0.0, _+_)`
  * materializes a zipped intermediate array per row-pair and walks it
  * through two higher-order-function interpreters; this expression is
  * one fused primitive loop over the unsafe array data, in whole-stage
  * codegen via a static helper. Null/length semantics mirror the
  * composed form: null input or length mismatch → null (zip_with pads
  * with null, which poisons the HOF sum the same way).
  */
case class ArrayDot(left: Expression, right: Expression)
  extends BinaryExpression {

  private def isDoubleArray(t: DataType) = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isDoubleArray(left.dataType) && isDoubleArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"array_dot requires (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "array_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else ArrayDotUtil.dot(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.ArrayDotUtil.dot($a, $b);
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

/** Static helper the generated Java calls. Assumes equal lengths
  * (checked by the caller) and non-null elements (embedding vectors —
  * a null element reads as 0.0 rather than poisoning the sum).
  */
object ArrayDotUtil {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }
}

object ArrayDot {
  /** Column-API entry point; resolves via the session function registry
    * (GraftExtensions — GraftSession carries it).
    */
  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("array_dot", a, b)
}
