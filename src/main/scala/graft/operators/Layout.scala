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
    // loud per-row contract check: a uid at/past 2^30 would silently
    // spill its high bits into z inside the packed key and misorder
    // the curve (the round-11 LayoutScale 30x row was measured on
    // exactly that perturbation). One codegen'd branch per row — no
    // extra job, and a violation fails the write plan instead of
    // quietly bending it.
    val uidChecked = when(col(uidCol).between(0L, (1L << 30) - 1), col(uidCol))
      .otherwise(raise_error(concat(
        lit(s"Layout.zorderAssign: $uidCol outside packing domain [0, 2^30): "),
        col(uidCol).cast("string"))))
    val keyed = df
      .withColumn("z", mortonZ(a, b))
      .withColumn("__okey", shiftleft(col("z"), 30).plus(uidChecked))
      .withColumn("__one", lit(1L))
    SequencePack.prefixSum(keyed, "__okey", "__one", outCol = "__rank")
      .withColumn("file_id", expr(s"__rank div $rowsPerFile"))
      .drop("__okey", "__one", "__rank")
  }

  /** Exact equi-depth (quantile) 16-bit coordinate: the row's RANK in
    * (`valueCol`, `uidCol`) order, scaled to [0, 65536). Rank-bucketing
    * is what makes the curve track VALUE ORDER rather than raw
    * magnitude: under `pmod(key, 65536)` two adjacent values 65535 and
    * 65536 land at opposite curve corners and a sparse or skewed key
    * domain leaves most of the coordinate space empty, so file
    * envelopes stop shrinking — while quantile coordinates fill the
    * space densely for ANY key distribution, which is why lakehouse
    * Z-order implementations cluster on range-bucketed ranks. The rank
    * is the distributed prefix COUNT over the composite (value, uid)
    * order ([[SequencePack.prefixSumBy]] — no single-partition window,
    * no (value<<30|uid) packing that would overflow on wide domains),
    * and `n` is the caller-supplied total row count, so the coordinate
    * `rank * 65536 div n` is exact integer arithmetic a SQL oracle
    * replays via `(row_number() - 1) * 65536 // n`.
    */
  def rankBucket16(df: DataFrame, valueCol: String, uidCol: String,
                   n: Long, outCol: String): DataFrame = {
    require(n > 0, s"n must be the positive total row count, got $n")
    SequencePack.prefixSumBy(df.withColumn("__rb1", lit(1L)),
        Seq(valueCol, uidCol), "__rb1", outCol = "__rbrank")
      .withColumn(outCol, expr(s"__rbrank * 65536L div ${n}L"))
      .drop("__rb1", "__rbrank")
  }

  /** [[zorderAssign]] over RANK-BUCKETED coordinates — the production
    * default for real (sparse, skewed) key domains: both dimensions
    * are first quantile-bucketed to exact 16-bit coordinates
    * ([[rankBucket16]]), then Morton-interleaved and ranked into
    * fixed-row files exactly as [[zorderAssign]]. Costs one count plus
    * two extra distributed rank passes over the write set — write-plan
    * budget, paid once per layout. `uidCol` must be unique and in
    * [0, 2^30) as in [[zorderAssign]] (it tie-breaks both dimension
    * ranks AND the final curve order).
    */
  def zorderAssignRanked(df: DataFrame, aCol: String, bCol: String,
                         uidCol: String, rowsPerFile: Int): DataFrame = {
    val n = math.max(df.count(), 1L)
    val withA = rankBucket16(df, aCol, uidCol, n, "__a16")
    val withAB = rankBucket16(withA, bCol, uidCol, n, "__b16")
    zorderAssign(withAB, col("__a16"), col("__b16"), uidCol, rowsPerFile)
      .drop("__a16", "__b16")
  }
}
