package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The canonical streaming pipeline shape — readStream → event-time
  * window aggregation under a watermark → append sink — over the same
  * events schema q12 aggregates in batch (its "streaming twin").
  *
  * The reference has no windowed streaming (SURVEY §2.8: only the
  * membership timeouts); this is the engine's extension surface for
  * continuous ingestion. State is bounded by the watermark: windows
  * older than (max event time − delay) are finalized and evicted, so
  * the operator runs indefinitely at any rate.
  */
object EventPipeline {

  /** Tumbling-window counts + sums per (window, event_type). Works on
    * any DataFrame with (ts: timestamp, event_type: string,
    * value: double) — streaming or batch (Spark plans both from the
    * same declaration; a batch frame just computes all windows).
    */
  def hourlyByType(events: DataFrame, watermarkDelay: String = "30 minutes",
                   windowLength: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLength).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))
}
