package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** Native SimHash aggregate: `simhash_fp(h)` folds the token hashes of
  * a group into the 64-bit SimHash fingerprint — each bit position of
  * each hash votes ±1 into a 64-counter buffer, fingerprint bit i =
  * sign of counter i. One imperative buffer update per row instead of
  * 64 conditional-sum aggregate columns.
  *
  * Bit-equal to the column formulation in
  * `operators.Dedup.simhashFingerprints` (spec-asserted) and to the
  * per-row streaming fold in `streaming.StreamingDedup.withSimhash`
  * (votes are associative/commutative sums).
  */
case class SimHashFp(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_fp"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash_fp requires a bigint input, got ${child.dataType.simpleString}")

  /** votes(0..63); votes(64) = row count (to distinguish the empty
    * group, which must yield null like the sum-column form).
    */
  override def createAggregationBuffer(): Array[Long] = new Array[Long](65)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < 64) {
        buf(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1)
        i += 1
      }
      buf(64) += 1
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 65) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any =
    if (buf(64) == 0) null
    else {
      var fp = 0L
      var i = 0
      while (i < 64) {
        if (buf(i) > 0) fp |= (1L << i)
        i += 1
      }
      fp
    }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashFp =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashFp =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashFp =
    copy(child = newChildren.head)
}
