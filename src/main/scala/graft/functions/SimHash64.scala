package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native per-ROW SimHash: `simhash64(hs)` folds an `array<bigint>` of
  * token hashes into the 64-bit fingerprint in ONE pass — the streaming
  * sibling of the `simhash_fp` aggregate (which folds a GROUP's rows).
  * The composed form it replaces evaluated 64 independent
  * `aggregate()` HOF folds over the array per row — O(64·tokens)
  * interpreted expression evals in the hot loop of a streaming ingest;
  * this is one fused primitive loop in whole-stage codegen.
  *
  * Semantics (spec-asserted bit-equal to `simhash_fp` and to the
  * composed fold): each hash votes ±1 per bit position, fingerprint
  * bit i = (votes_i > 0). Empty array → 0L (zero votes lose every
  * bit — matching the composed fold's value for a token-less row);
  * null array or null element → null.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<bigint>, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(v: Any): Any =
    SimHash64Util.fpOrNull(v.asInstanceOf[ArrayData])

  /** Generated code calls the static primitive helper — one invocation
    * per row (the loop body is the helper's, JIT-compiled once), no
    * boxing on the non-null path. The null-element scan is emitted only
    * when the array type admits null elements.
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mayHaveNullElements = child.dataType match {
      case ArrayType(_, cn) => cn
      case _ => true
    }
    val util = SimHash64Util.getClass.getName.stripSuffix("$") + ".MODULE$"
    nullSafeCodeGen(ctx, ev, a => {
      val nullScan =
        if (mayHaveNullElements)
          s"""if ($util.hasNullElement($a)) { ${ev.isNull} = true; } else """
        else ""
      s"""
         |$nullScan{
         |  ${ev.value} = $util.fp($a);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Static helpers the generated Java calls. */
object SimHash64Util {
  def hasNullElement(a: ArrayData): Boolean = {
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return true
      i += 1
    }
    false
  }

  /** Primitive fingerprint fold — caller guarantees no null elements. */
  def fp(a: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = a.numElements()
    var i = 0
    while (i < n) {
      val h = a.getLong(i)
      var b = 0
      while (b < 64) {
        votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      i += 1
    }
    var fpv = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) fpv |= (1L << b)
      b += 1
    }
    fpv
  }

  /** Boxed form for the interpreted path. */
  def fpOrNull(a: ArrayData): java.lang.Long =
    if (hasNullElement(a)) null else java.lang.Long.valueOf(fp(a))
}
