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
  * composed form: null input, null element, or length mismatch → null
  * (zip_with pads with null and a null product poisons the HOF sum
  * the same way).
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

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayDotUtil.dotOrNull(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  /** Fully inline generated loop — no helper call, no boxing: this is
    * the per-(query, corpus)-pair hot loop the expression exists to
    * de-allocate, and a boxed-Double helper would reintroduce a per-row
    * allocation. The element null-scan is emitted only when either
    * input's array type admits null elements.
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mayHaveNullElements = Seq(left, right).exists(_.dataType match {
      case ArrayType(_, cn) => cn
      case _ => true
    })
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val nullScan =
        if (mayHaveNullElements)
          s"""if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"""
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullScan
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $s;
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

/** Static helper the generated Java calls. Mirrors the composed HOF
  * form exactly: length mismatch OR any null element → null (zip_with
  * pads with null and a null product poisons the aggregate sum).
  */
object ArrayDotUtil {
  def dotOrNull(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}

object ArrayDot {
  /** Column-API entry point; resolves via the session function registry
    * (GraftExtensions — GraftSession carries it).
    */
  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("array_dot", a, b)
}
