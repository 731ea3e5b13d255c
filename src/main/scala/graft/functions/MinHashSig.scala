package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature aggregate: `minhash_sig(h, numHashes)`
  * folds the pre-hashed shingle values `h` of a group into the
  * `numHashes`-element signature min((a_i·h + b_i) mod p) in ONE
  * imperative buffer — a primitive long array updated with a tight
  * loop — instead of `numHashes` separate min-aggregate columns, each
  * of which costs an expression evaluation plus an UnsafeRow buffer
  * write per input row.
  *
  * The hash family is identical to `operators.Dedup.minhashParams`
  * (seed 42, p = 2^31−1): signatures are bit-equal to the 128-column
  * formulation (spec-asserted), deterministic across executors.
  * Mergeable (elementwise min), so partial aggregation still happens
  * map-side; spill serialization is the raw long array.
  */
case class MinHashSig(
    child: Expression,
    numHashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val P = MinHashFamily.P
  // same params as Dedup.minhashParams: a ∈ [1, p−1], b ∈ [0, p−1]
  private lazy val (as, bs) = MinHashFamily.params(numHashes)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires a bigint input, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      // Reduce into [0, p) first: the function is registered session-
      // wide, and a natural direct call passes raw xxhash64 values
      // whose h·a would overflow a long (silently negative mins). For
      // already-reduced inputs this is the identity, so the internal
      // Dedup path is unchanged bit-for-bit.
      val raw = v.asInstanceOf[Long]
      val h = ((raw % P) + P) % P
      var i = 0
      while (i < numHashes) {
        val m = (h * as(i) + bs(i)) % P
        if (m < buf(i)) buf(i) = m
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (b2(i) < b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  /** Empty group (all-null input) → null, matching min()'s behavior. */
  override def eval(buf: Array[Long]): Any =
    if (buf.forall(_ == Long.MaxValue)) null
    else new GenericArrayData(buf.clone()): ArrayData

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSig =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSig =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashSig =
    copy(child = newChildren.head)
}
