package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout governance: multi-dimensional (Morton / Z-order)
  * clustering and target-size file assignment.
  *
  * Why this is a first-class 100 TB operator: parquet scan pruning is
  * only as good as the min/max envelopes files carry, and a corpus
  * sorted on ONE key gives the second predicate column full-range
  * envelopes in every file — `WHERE part = ? AND supp = ?` prunes
  * nothing on the supp dimension. Interleaving the bits of both keys
  * (Morton order, the standard interleaved space-filling curve; the
  * technique behind OPTIMIZE ... ZORDER in lakehouse table formats)
  * makes file envelopes approximate squares in (a, b) space, so BOTH
  * single-column predicates prune ~√files of the layout instead of
  * one pruning everything and the other nothing.
  *
  * Everything here is exact integer bit arithmetic (shift/mask
  * spreads), so a SQL oracle replays the layout bit-for-bit — no
  * sampled range boundaries, no partitioner luck. The file assignment
  * rides [[SequencePack.prefixSum]]'s two-level distributed prefix
  * sum: never a single-partition global window.
  */
object Layout {

  /** Spreads the low 16 bits of `x` to the even bit positions of a
    * 32-bit lane (the classic shift-or-mask Morton spread; public
    * bit-twiddling folklore, e.g. Stanford Bit Twiddling Hacks
    * "Interleave bits by Binary Magic Numbers").
    */
  private def spread16(x: Column): Column = {
    val a = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
    val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val c = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(0x33333333L))
    c.bitwiseOR(shiftleft(c, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit coordinates: `a`'s bits on the
    * even positions, `b`'s on the odd. Both inputs must already lie in
    * [0, 65536) — callers bucket wider domains (`pmod(col, 65536)` is
    * the catalog's choice; a production layout would range-bucket so
    * curve locality matches value locality).
    */
  def mortonZ(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1)).as("z")

  /** Assigns every row a `z` (Morton code of `a`, `b`) and a `file_id`
    * = its rank in (z, uid) order divided by `rowsPerFile` — the
    * write-plan of a Z-ordered layout with fixed-row-count files.
    *
    * `uidCol` breaks z ties into the total order the rank needs; it
    * must be unique and lie in [0, 2^30) so `z << 30 | uid` packs into
    * one sortable long (z < 2^32, so the packed key stays under 2^62).
    * The rank is the exclusive prefix COUNT via the distributed prefix
    * sum — the single-partition `row_number()` window this replaces is
    * exactly what cannot write a 100 TB layout.
    */
  def zorderAssign(df: DataFrame, a: Column, b: Column, uidCol: String,
                   rowsPerFile: Int): DataFrame = {
    require(rowsPerFile > 0, s"rowsPerFile must be positive, got $rowsPerFile")
    val keyed = df
      .withColumn("z", mortonZ(a, b))
      .withColumn("__okey", shiftleft(col("z"), 30).plus(col(uidCol)))
      .withColumn("__one", lit(1L))
    SequencePack.prefixSum(keyed, "__okey", "__one", outCol = "__rank")
      .withColumn("file_id", expr(s"__rank div $rowsPerFile"))
      .drop("__okey", "__one", "__rank")
  }
}
