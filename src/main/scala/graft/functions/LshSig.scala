package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression: `lsh_sig(vec, dim, tables, bits)` = the
  * random-hyperplane LSH signature of an `array<double>` vector —
  * `tables` buckets, each the `bits`-bit sign pattern of the vector
  * against that table's hyperplanes, packed into a long
  * (bit i set ⇔ v · plane(t·bits+i) > 0).
  *
  * The composed form (`transform` over a plane-matrix literal + an
  * unrolled `when(element_at(sig,…))` OR-chain per table) generates
  * tables·bits expression nodes; past ~200 sign bits the generated
  * method exceeds janino's 64KB limit and the whole stage drops to
  * interpreted eval (measured 12s vs 0.5s at 24 tables × 14 bits).
  * This expression is one fused primitive loop — tables·bits·dim
  * multiply-adds per row against a plane matrix held as a codegen
  * reference object, constant generated-code size at any (tables,
  * bits).
  *
  * Hyperplanes are seed-pinned (Random(7), the exact generation order
  * of `Similarity.hyperplanesFlat`) so buckets are deterministic across
  * runs, executors, and the composed/native pair — LshSigSpec asserts
  * bit-equality against the composed twin.
  *
  * Null vector, a null element, or a length ≠ `dim` → null (the
  * malformed-embedding row drops out of the bucket join instead of
  * landing in a garbage bucket).
  */
case class LshSig(child: Expression, dim: Int, tables: Int, bits: Int)
  extends UnaryExpression {

  require(dim > 0 && tables > 0 && bits > 0 && bits <= 63,
    s"lsh_sig needs dim>0, tables>0, 0<bits<=63; got ($dim, $tables, $bits)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lsh_sig requires array<double>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lsh_sig"

  @transient private lazy val planes: Array[Double] =
    LshSigUtil.planes(dim, tables, bits)

  override protected def nullSafeEval(v: Any): Any =
    LshSigUtil.sig(v.asInstanceOf[ArrayData], planes, dim, tables, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("lshPlanes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("sig")
      s"""
         |ArrayData $r = graft.functions.LshSigUtil.sig(
         |  $v, $planesRef, $dim, $tables, $bits);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): LshSig =
    copy(child = newChild)
}

/** Static helpers the generated Java calls. */
object LshSigUtil {

  /** Flat plane matrix, plane p occupying [p·dim, (p+1)·dim). Same
    * Random(7) draw order as the composed form's nested-Seq literal
    * (`Seq.fill(tables·bits)(Seq.fill(dim)(nextGaussian))` fills
    * element-by-element), so signatures agree bit-for-bit.
    */
  def planes(dim: Int, tables: Int, bits: Int): Array[Double] = {
    val rnd = new scala.util.Random(7)
    Array.fill(tables * bits * dim)(rnd.nextGaussian())
  }

  def sig(v: ArrayData, planes: Array[Double], dim: Int, tables: Int,
          bits: Int): ArrayData = {
    if (v.numElements() != dim) return null
    val vec = new Array[Double](dim)
    var d = 0
    while (d < dim) {
      if (v.isNullAt(d)) return null
      vec(d) = v.getDouble(d)
      d += 1
    }
    val out = new Array[Long](tables)
    var p = 0
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var b = 0
      while (b < bits) {
        var s = 0.0
        val base = p * dim
        var i = 0
        while (i < dim) { s += vec(i) * planes(base + i); i += 1 }
        if (s > 0) bucket |= (1L << b)
        p += 1
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}
