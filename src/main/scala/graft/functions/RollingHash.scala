package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: `rolling_hash(text)` = Karp-Rabin fold
  * `acc := (acc·31 + codepoint) mod 1e9+7` over the string's Unicode
  * code points — the content fingerprint of
  * `TextAnalysis.fingerprints` (t4) and the incremental-update-
  * friendly hash for shingling/streaming dedup.
  *
  * Replaces the composed form `aggregate(split(text, ''), ...)`, which
  * materializes one single-character STRING per character per row
  * before folding. Semantics are identical (differential-tested,
  * including multibyte and astral chars): Spark's `split(s, '')`
  * yields code-point elements and `ascii()` returns the full code
  * point, exactly what `String.codePoints()` iterates; the empty
  * string folds to the initial 0.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires a string, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(s: Any): Any =
    RollingHashUtil.hash(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHashUtil.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

/** Static helper the generated Java calls. One String materialization
  * per row (for the code-point walk), zero per-character allocation.
  */
object RollingHashUtil {
  private val P = 1000000007L

  def hash(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }
}
