package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators Spark has no single built-in for: backward as-of
  * join and gap-based sessionization.
  *
  * The as-of join is the union + sorted-window carry-forward
  * formulation: tag both sides, union them, and within each key carry
  * the last right-side row forward over the time-sorted stream. ONE
  * shuffle on (keys), no inequality join — the naive range-join
  * (`l.t >= r.t` + argmax) explodes to O(|L|·|R|) per key and is the
  * classic 100 TB scale-killer this formulation exists to avoid.
  */
object Temporal {

  /** For each left row, attach the latest right row with
    * `right.timeCol <= left.timeCol` on equal `keys` (backward as-of,
    * ties include the right row). `carryCols` are the right columns to
    * attach, null when no prior right row exists (left-join shape).
    * Column name collisions: carried columns get `asof_` prefixes.
    */
  def asofJoinBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                       leftTime: String, rightTime: String,
                       carryCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // common layout: keys ++ __t ++ __side ++ leftCols-as-nullable ++ carry
    val l = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("__t"), lit(1).as("__side")) ++
        leftCols.filterNot(keys.contains).map(col) ++
        carryCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"asof_$c")): _*)
    val r = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as("__t"), lit(0).as("__side")) ++
        leftCols.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        carryCols.map(c => col(c).as(s"asof_$c")): _*)
    // at equal __t the right row sorts first (side 0 < 1), so a right
    // row exactly at leftTime is visible to that left row (<= semantics)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Carry ALL carry columns as ONE struct: per-column last(...,
    // ignoreNulls) would skip a genuinely-NULL field on the latest
    // right row (attaching an older row's value, possibly a different
    // row per column) — DuckDB ASOF semantics attach the latest row
    // wholesale, internal NULLs preserved. The when() is NULL exactly
    // on left rows, so ignoreNulls skips those but keeps any right
    // row's struct, null fields and all.
    val carried = l.unionByName(r)
      .withColumn("__carry",
        last(when(col("__side") === 0,
            struct(carryCols.map(c => col(s"asof_$c").as(c)): _*)),
          ignoreNulls = true).over(w))
    carryCols.foldLeft(carried) { (df, c) =>
        df.withColumn(s"asof_$c", col(s"__carry.$c"))
      }
      .filter(col("__side") === 1).drop("__t", "__side", "__carry")
  }

  /** Interval-follow count: for each left row, how many right rows of
    * the same `key` fall in `(leftTime, leftTime + windowMicros]` —
    * the attribution primitive ("clicks within 30 min of the view").
    *
    * The naive formulation is an inequality join, which Spark can only
    * plan as a nested loop — quadratic per key, the canonical 100 TB
    * incident. This is the BANDED decomposition instead: both sides
    * bucket time by the window length, every right match of a left row
    * lives in the left row's bucket or the next one, so each left row
    * expands to exactly 2 (key, bucket) probes and the join is a plain
    * shuffled EQUI-join on (key, bucket) with the exact interval
    * predicate as a post-filter (PlanSpec asserts no nested loop).
    * Candidate volume is bounded by rows-per-(key, window-width) — the
    * data's actual temporal density, not its total size.
    *
    * Zero-match left rows are kept at n_follow = 0 (left-outer shape);
    * time arithmetic runs in integral micros on both sides of the
    * oracle, never float.
    */
  def intervalFollowCount(left: DataFrame, right: DataFrame, key: String,
                          leftId: String, leftTime: String, rightTime: String,
                          windowMicros: Long): DataFrame = {
    require(windowMicros > 0, s"window must be positive, got $windowMicros")
    val l = left.select(col(key), col(leftId),
        unix_micros(col(leftTime)).as("__lt"))
      .withColumn("__b", explode(array(
        floor(col("__lt") / windowMicros),
        floor(col("__lt") / windowMicros) + 1)))
    val r = right.select(col(key).as("__rk"),
        unix_micros(col(rightTime)).as("__rt"))
      .withColumn("__b", floor(col("__rt") / windowMicros))
    l.join(r,
        l("__b") === r("__b") && col(key) === col("__rk") &&
          col("__rt") > col("__lt") &&
          col("__rt") <= col("__lt") + windowMicros,
        "left_outer")
      .groupBy(col(key), col(leftId))
      .agg(count(col("__rt")).as("n_follow"))
  }

  /** Gap-based sessions via Spark's native session_window: events of
    * one user belong to one session while consecutive gaps stay at or
    * under `gap` (an event exactly `gap` later still merges — the
    * per-event [t, t+gap) windows merge when adjacent).
    * Returns one row per session with start / end (= last event
    * time) / size. Single shuffle on the user key; the session merge
    * is the built-in operator, which also works 1:1 under streaming
    * with a watermark.
    */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
                 gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(col(userCol), session_window(col(tsCol), gap).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col(userCol), col("w.start").as("session_start"),
        (col("w.end") - expr(s"INTERVAL $gap")).as("session_end"),
        col("n_events"))
}
