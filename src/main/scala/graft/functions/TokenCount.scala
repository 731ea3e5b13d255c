package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: `token_count(text, token)` = how many
  * whitespace-delimited tokens of `text` equal `token` — the
  * per-OCCURRENCE counting primitive of the reference's wine query
  * (`mp3/src/mj_wine/wine_maple.go:14-22`, SURVEY §2.2 F3/G3).
  *
  * The composed form `size(filter(split(text,'\\s+'), w => w === tok))`
  * materializes the full token array per row; this expression scans the
  * UTF-8 bytes once with zero allocation, and participates in
  * whole-stage codegen via a static helper call (`doGenCode` below) —
  * the "(b) custom Expression beats UDF" rung of the builder brief's
  * preference order. Registered as a SQL function by GraftExtensions.
  */
case class TokenCount(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_count requires (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_count"

  override protected def nullSafeEval(text: Any, token: Any): Any =
    TokenCountUtil.count(text.asInstanceOf[UTF8String], token.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, k) => s"graft.functions.TokenCountUtil.count($t, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TokenCount =
    copy(left = newLeft, right = newRight)
}

/** Static helper the generated Java calls (Scala object methods become
  * static forwarders). Whitespace = Java regex `\s` over ASCII, the
  * same separator class `split(text, "\\s+")` and the DuckDB oracle's
  * `string_split_regex(text, '\s')` use.
  */
object TokenCountUtil {
  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0B

  def count(text: UTF8String, token: UTF8String): Long = {
    val bytes = text.getBytes
    val tok = token.getBytes
    var i = 0
    var n = 0L
    while (i < bytes.length) {
      while (i < bytes.length && isWs(bytes(i))) i += 1
      val start = i
      while (i < bytes.length && !isWs(bytes(i))) i += 1
      val len = i - start
      if (len == tok.length && len > 0) {
        var j = 0
        while (j < len && bytes(start + j) == tok(j)) j += 1
        if (j == len) n += 1
      }
    }
    n
  }
}

object TokenCount {
  /** Column-API entry point: `TokenCount($"text", lit("hash"))`.
    * Resolves through the session function registry, so the session
    * must carry GraftExtensions (GraftSession does).
    */
  def apply(text: Column, token: Column): Column =
    org.apache.spark.sql.functions.call_function("token_count", text, token)
}
