package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Per-ROW MinHash signature: `minhash_row(hs, numHashes)` computes the
  * signature min((a_i·h + b_i) mod p) over one row's array of shingle
  * hashes — the streaming sibling of the [[MinHashSig]] GROUP aggregate,
  * which can't run inside a stateless streaming projection. Same hash
  * family (seed 42, p = 2^31−1, [[MinHashFamily]]), same raw-hash
  * reduction, so for the same shingle set the two produce bit-equal
  * signatures (min is multiplicity-insensitive, so per-occurrence vs
  * distinct input makes no difference) — MinHashRowSpec asserts it.
  * That bit-equality is what lets a STREAM probe a [[graft.operators.DedupIndex]]
  * built by a batch job: band hashes derived from either signature
  * collide identically.
  *
  * Null array → null; null elements are skipped; no non-null element
  * (empty array) → null, matching the aggregate's empty-group result.
  */
case class MinHashRow(child: Expression, numHashes: Int)
  extends UnaryExpression {

  require(numHashes > 0, s"minhash_row needs numHashes>0, got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_row requires array<bigint>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_row"

  @transient private lazy val family = MinHashFamily.params(numHashes)

  override protected def nullSafeEval(hs: Any): Any =
    MinHashRowUtil.sig(hs.asInstanceOf[ArrayData], family._1, family._2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("mhAs", family._1, "long[]")
    val bsRef = ctx.addReferenceObj("mhBs", family._2, "long[]")
    nullSafeCodeGen(ctx, ev, hs => {
      val r = ctx.freshName("sig")
      s"""
         |ArrayData $r = graft.functions.MinHashRowUtil.sig($hs, $asRef, $bsRef);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashRow =
    copy(child = newChild)
}

object MinHashRowUtil {
  private val P = MinHashFamily.P

  def sig(hs: ArrayData, as: Array[Long], bs: Array[Long]): ArrayData = {
    val k = as.length
    val out = Array.fill(k)(Long.MaxValue)
    val n = hs.numElements()
    var any = false
    var i = 0
    while (i < n) {
      if (!hs.isNullAt(i)) {
        any = true
        val raw = hs.getLong(i)
        val h = ((raw % P) + P) % P
        var j = 0
        while (j < k) {
          val m = (h * as(j) + bs(j)) % P
          if (m < out(j)) out(j) = m
          j += 1
        }
      }
      i += 1
    }
    if (!any) null else new GenericArrayData(out)
  }
}

/** The seed-42 universal-hash family shared by the [[MinHashSig]]
  * aggregate, the per-row [[MinHashRow]] expression, and
  * `Dedup.minhashParams` — one draw order, so every formulation yields
  * the same signature.
  */
object MinHashFamily {
  val P: Long = 2147483647L // 2^31 − 1, Mersenne prime

  /** a_i ∈ [1, p−1], b_i ∈ [0, p−1], in Random(42) draw order
    * (a then b per i — the order minhashParams established).
    */
  def params(numHashes: Int): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(42)
    val a = new Array[Long](numHashes)
    val b = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      a(i) = 1L + rnd.nextInt((P - 1).toInt).toLong
      b(i) = rnd.nextInt(P.toInt).toLong
      i += 1
    }
    (a, b)
  }
}
