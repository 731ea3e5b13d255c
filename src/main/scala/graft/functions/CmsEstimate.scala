package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** `cms_estimate(sketch, item)` — probe a serialized count-min sketch
  * (the binary Spark's built-in `count_min_sketch` aggregate emits) for
  * an item's estimated count. Spark ships the mergeable CMS aggregate
  * but no SQL-level probe; this closes that gap so the whole
  * sketch-build → estimate path stays declarative.
  *
  * The probe hashes the item's UTF-8 bytes — the exact add-path the
  * aggregate uses for StringType input (`UTF8String.getBytes` →
  * `addBinary`), so estimates are consistent with how the sketch was
  * built.
  *
  * CodegenFallback is deliberate: the HOT side of a CMS workload is the
  * corpus-sized aggregate (codegen'd, imperative, map-side mergeable —
  * Spark's own); the probe side is a candidate set of k rows. The
  * deserialized sketch is cached across eval calls (identity, then
  * content compare) so a k-row probe pays one ~MB deserialization, not
  * k.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cms_estimate requires (binary, string), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cms_estimate"

  // The (bytes, sketch) pair is ONE immutable value behind a volatile
  // field, so a reader always sees a consistent pair even if the same
  // expression instance is ever evaluated from two threads (e.g.
  // driver-side constant folding + a local-mode task): the worst case
  // is a redundant deserialization, never an estimate from the wrong
  // sketch.
  @transient @volatile private var cached: CmsEstimate.Cached = _

  override protected def nullSafeEval(sk: Any, item: Any): Any = {
    val bytes = sk.asInstanceOf[Array[Byte]]
    var c = cached
    if (c == null || (!(bytes eq c.bytes) && !java.util.Arrays.equals(bytes, c.bytes))) {
      c = CmsEstimate.Cached(bytes,
        CountMinSketch.readFrom(new ByteArrayInputStream(bytes)))
      cached = c
    }
    c.sketch.estimateCount(item.asInstanceOf[UTF8String].getBytes)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

object CmsEstimate {
  /** Immutable (serialized bytes, deserialized sketch) pair — see the
    * volatile `cached` field above for why this is one value.
    */
  private final case class Cached(bytes: Array[Byte], sketch: CountMinSketch)
}
