package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

class StreamOhlcSpec extends SparkSpecBase {

  /** The claim behind st9: min/max over the packed (ts, id) DECIMAL
    * decide event-time first/last correctly even when batches deliver
    * events OUT of event-time order (as long as nothing is late past
    * the watermark) — where a streaming `first()` aggregate would
    * report arrival order. Driven from a MemoryStream so the arrival
    * permutation is exact.
    */
  test("packed min/max recover event-time open/close under out-of-order arrival") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val idSpace = 10000000000L
    val dec = DecimalType(38, 0)
    val input = MemoryStream[(Long, Long, Double)] // (sec, id, value)
    val bars = input.toDF().toDF("sec", "id", "v")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withColumn("__pk",
        graft.operators.Changelog.packedOrderKey("ts", "id", idSpace))
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"),
        max(col("v")).as("high"), min(col("v")).as("low"),
        min(col("__pk")).as("opk"), max(col("__pk")).as("cpk"))
      .select(col("window.start").as("hour"), col("n"),
        col("high"), col("low"),
        (col("opk") % lit(idSpace).cast(dec)).cast("long").as("open_id"),
        (col("cpk") % lit(idSpace).cast(dec)).cast("long").as("close_id"))
    val name = "ohlc_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = bars.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // batch 1 delivers the event-time FIRST and LAST rows of hour 0
      input.addData((600L, 2L, 5.0), (1800L, 3L, 9.9))
      q.processAllAvailable()
      // batch 2 delivers a row that ARRIVES last but sorts BETWEEN the
      // two in event time (t=1795s > the 1790s watermark, so it is
      // accepted, not late): an arrival-order `last()` would wrongly
      // report it as the close
      input.addData((1795L, 1L, 1.0))
      q.processAllAvailable()
      // a far-future closer pushes the watermark past hour 0's end
      input.addData((20000L, 9L, 0.0))
      q.processAllAvailable()
      val got = s.table(name)
        .filter(col("hour") === timestamp_seconds(lit(0)))
        .collect()
      assert(got.length == 1)
      val r = got(0)
      assert(r.getAs[Long]("n") == 3L)
      // event-time (t, id) order: 600→5.0, 1795→1.0, 1800→9.9 —
      // open is the 600s row, close is the 1800s row, regardless of
      // the arrival permutation
      assert(r.getAs[Long]("open_id") == 2L, s"open: $r")
      assert(r.getAs[Long]("close_id") == 3L, s"close: $r")
      assert(r.getAs[Double]("high") == 9.9 && r.getAs[Double]("low") == 1.0)
    } finally q.stop()
  }
}
