package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(filter, item)` — probe a serialized
  * `spark.util.sketch.BloomFilter` (the binary `writeTo` emits, as
  * built distributed by `df.stat.bloomFilter`) for string membership.
  *
  * This is the codegen'd replacement for the per-row Scala-UDF probe
  * the decontamination prefilter used to carry
  * (`udf(s => bloom.value.mightContainString(s))`): the UDF forced a
  * UTF8String→String conversion plus non-codegen eval on EVERY
  * train-side shingle — the hottest loop of the query, since train
  * shingles outnumber eval shingles by construction. Here the probe
  * rides whole-stage codegen and hashes the UTF-8 bytes directly,
  * which is bit-identical to `mightContainString`
  * (`BloomFilterBase.mightContainString` = `mightContainBinary(utf8
  * bytes)` — verified against the Spark 4.1.2 sketch jar).
  *
  * The filter argument must be FOLDABLE (a literal): the filter is
  * deserialized ONCE driver-side and shipped to executors inside the
  * codegen references array with the (broadcast) task binary — never
  * once per row, and never once per task beyond plan deserialization.
  * A non-literal filter column is rejected at analysis, because a
  * per-row deserialize of a multi-MB bit array is exactly the plan
  * this expression exists to prevent.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType | LongType) if left.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (BinaryType, StringType | LongType) =>
        TypeCheckResult.TypeCheckFailure(
          "bloom_might_contain requires the filter argument to be a " +
            "literal (foldable) — deserializing a bloom filter per row " +
            "is the anti-plan this expression replaces")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain requires (binary, string|bigint), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_might_contain"

  /** Deserialized once per expression instance (left is foldable, so
    * the bytes never change); null iff the literal itself is null.
    */
  @transient private lazy val filter: BloomFilter = {
    val bytes = left.eval().asInstanceOf[Array[Byte]]
    if (bytes == null) null
    else BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override protected def nullSafeEval(sk: Any, item: Any): Any =
    right.dataType match {
      case LongType => filter.mightContainLong(item.asInstanceOf[Long])
      case _ =>
        filter.mightContainBinary(item.asInstanceOf[UTF8String].getBytes)
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    if (filter == null) {
      // Null filter literal: nullIntolerant — constant-null result.
      val javaType = CodeGenerator.javaType(dataType)
      ev.copy(code = code"""
        boolean ${ev.isNull} = true;
        $javaType ${ev.value} = false;""")
    } else {
      val bloomRef = ctx.addReferenceObj("bloomFilter", filter, classOf[BloomFilter].getName)
      right.dataType match {
        case LongType =>
          defineCodeGen(ctx, ev,
            (_, item) => s"$bloomRef.mightContainLong($item)")
        case _ =>
          defineCodeGen(ctx, ev,
            (_, item) => s"$bloomRef.mightContainBinary($item.getBytes())")
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
