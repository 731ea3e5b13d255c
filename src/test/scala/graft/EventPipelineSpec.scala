package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventPipeline

case class Ev(ts: Timestamp, event_type: String, value: Double)

class EventPipelineSpec extends SparkSpecBase {

  private def ev(minute: Int, t: String, v: Double) =
    Ev(new Timestamp(3600000L + minute * 60000L), t, v)

  test("streaming windowed agg finalizes windows as the watermark passes") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[Ev]
    val q = EventPipeline
      .hourlyByType(input.toDF(), watermarkDelay = "10 minutes",
        windowLength = "30 minutes")
      .writeStream.format("memory").queryName("ev_windows")
      .outputMode("append").start()
    try {
      input.addData(ev(1, "click", 1.0), ev(5, "click", 2.0), ev(40, "view", 3.0))
      q.processAllAvailable()
      // advance event time far enough to close both earlier windows
      input.addData(ev(120, "click", 9.0))
      q.processAllAvailable()
      val rows = s.table("ev_windows")
        .orderBy("window_start", "event_type")
        .collect().map(r => (r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(rows.toSeq == Seq(("click", 2L, 3.0), ("view", 1L, 3.0)))
    } finally q.stop()
  }

  test("batch EventPipeline totals agree with q12's hourly aggregation") {
    val s = spark
    import s.implicits._
    val events = graft.core.Tables(s, sf("sf0.001")).events
    val pipeline = graft.streaming.EventPipeline
      .hourlyByType(events.select($"ts", $"event_type", $"value"))
      .agg(sum($"n_events"), sum($"total_value"), count(lit(1))).head
    val q12 = SparkEntry.queries("q12_events_hourly")(s, sf("sf0.001"))
      .agg(sum($"n_events"), sum($"total_value")).head
    assert(pipeline.getLong(0) == q12.getLong(0))
    // the pipeline ROUNDS into cents per row (order-free long sum)
    // where q12's oracle-synced form ROUNDS the double sum per bucket —
    // per-row rounding can shift arbitrary (non-cents-valued) doubles
    // by up to half a cent EACH, so the honest tolerance scales with
    // ROWS (0.005 per event), plus half a cent per bucket for q12's
    // own sum-then-round step
    val rows = pipeline.getLong(0)
    val buckets = pipeline.getLong(2)
    assert(math.abs(pipeline.getDouble(1) - q12.getDouble(1)) <=
      0.005 * rows + 0.005 * buckets + 1e-6)
  }

  test("the same declaration computes all windows in batch mode") {
    val s = spark
    import s.implicits._
    val batch = Seq(ev(1, "click", 1.0), ev(5, "click", 2.0), ev(40, "view", 3.0))
      .toDF()
    val rows = EventPipeline.hourlyByType(batch, windowLength = "30 minutes")
      .orderBy("window_start", "event_type")
      .collect().map(r => (r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq == Seq(("click", 2L, 3.0), ("view", 1L, 3.0)))
  }
}
