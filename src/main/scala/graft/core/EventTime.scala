package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Schema-adaptive event-time ingestion — the ONE place that knows how
  * an on-disk `ts` column becomes Spark's `TimestampType`.
  *
  * The events table has shipped in two physical encodings across data
  * regenerations: parquet TIMESTAMP(NANOS) (surfaced as raw int64 nanos
  * under `spark.sql.legacy.parquet.nanosAsLong=true`) and plain
  * `timestamp[us]` (surfaced as TimestampType directly). A real user's
  * parquet can be either, so every events reader — batch
  * ([[Tables.events]]), streaming replay, and the replay fixture
  * builder — routes through here instead of hard-coding one encoding.
  * Round 7 hard-coded the nanos path and a testdata regeneration to
  * micros broke all 20 event-time queries; this helper is the fix and
  * [[graft]] EventTimeEncodingSpec is the regression test that pins
  * both encodings forever.
  */
object EventTime {

  private val NanosPerSecond = 1000000000L

  /** Normalize `colName` to TimestampType whatever its on-disk encoding:
    *
    *   - `LongType` (nanosAsLong raw int64 nanos): truncate to micros
    *     with INTEGER division (`div`), matching DuckDB's own
    *     nanos→micros truncation bit-for-bit — float division would
    *     round through double and drift 1µs on ~12% of 2024-epoch
    *     values.
    *   - `TimestampType` (parquet timestamp[us]): already what we want.
    *   - `TimestampNTZType`: reinterpret as UTC instants (the session
    *     time zone is pinned to UTC in [[GraftSession]], so the cast is
    *     wall-clock-identical to what DuckDB reads).
    *
    * Anything else fails loudly — silently treating e.g. a string or
    * int32-seconds column as event time would corrupt every watermark
    * downstream.
    */
  def normalize(df: DataFrame, colName: String = "ts"): DataFrame =
    df.schema(colName).dataType match {
      case LongType =>
        df.withColumn(colName, timestamp_micros(expr(s"`$colName` div 1000")))
      case TimestampType => df
      case TimestampNTZType =>
        df.withColumn(colName, col(colName).cast(TimestampType))
      case other =>
        sys.error(s"events column `$colName` has unsupported event-time " +
          s"encoding $other (expected int64 nanos, timestamp, or timestamp_ntz)")
    }

  /** A literal instant expressed in the given RAW on-disk encoding —
    * for code (the replay split builder) that must compare against or
    * inject rows into a source column BEFORE normalization, in whatever
    * dtype the source actually has.
    */
  def rawLiteral(dt: DataType, epochSeconds: Long): Column = dt match {
    case LongType => lit(epochSeconds * NanosPerSecond)
    case TimestampType | TimestampNTZType =>
      timestamp_seconds(lit(epochSeconds)).cast(dt)
    case other =>
      sys.error(s"cannot build an event-time literal in encoding $other")
  }
}
