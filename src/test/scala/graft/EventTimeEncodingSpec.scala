package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** The regression test round 7 lacked: the events table has shipped
  * `ts` both as TIMESTAMP(NANOS) (read as raw int64 under nanosAsLong)
  * and as plain timestamp[us], and a testdata regeneration that flips
  * the encoding must NOT change any query's answer. This spec writes
  * the SAME logical events twice — once per physical encoding — and
  * asserts the catalog queries that consume event time (batch agg q12,
  * as-of a1, changelog c1, and the multi-batch streaming replay st2)
  * return byte-identical results on both.
  */
class EventTimeEncodingSpec extends SparkSpecBase {

  private val Epoch2024 = 1704067200L // 2024-01-01T00:00:00Z
  private val Day = 86400L

  /** 600 deterministic events over the generator's 30-day span (so the
    * StreamReplay day-10/day-20 cuts all land non-empty), 20 users,
    * the event_type vocabulary a1/st2 filter on, micros-precision
    * timestamps (both encodings can represent them exactly).
    */
  private def logicalEvents: Seq[(Long, Long, Long, String, Double)] = {
    val types = Seq("view", "click", "error", "purchase")
    (0L until 600L).map { i =>
      val micros = (Epoch2024 + (i * 30 * Day) / 600 + i % 53) * 1000000L +
        (i * 12347L) % 1000000L
      (i, micros, i % 20, types((i % 7 % types.size).toInt), (i % 97) / 10.0)
    }
  }

  /** Write `events.parquet` under a fresh dir with ts encoded per
    * `asNanosLong`: int64 nanoseconds (what nanosAsLong surfaces for a
    * TIMESTAMP(NANOS) file) or TimestampType micros (timestamp[us]).
    */
  private def writeVariant(asNanosLong: Boolean): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory(
      s"graft-evt-${if (asNanosLong) "nanos" else "micros"}").toString
    val base = logicalEvents
      .toDF("event_id", "ts_us", "user_id", "event_type", "value")
      .withColumn("props", lit(null).cast("string"))
    val withTs =
      if (asNanosLong) base.withColumn("ts", col("ts_us") * lit(1000L))
      else base.withColumn("ts", timestamp_micros(col("ts_us")))
    withTs.select("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private lazy val nanosDir = writeVariant(asNanosLong = true)
  private lazy val microsDir = writeVariant(asNanosLong = false)

  private def canonical(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("Tables.events normalizes both encodings to identical TimestampType rows") {
    val nanos = graft.core.Tables(spark, nanosDir).events
    val micros = graft.core.Tables(spark, microsDir).events
    // the raw files really are different physical types…
    assert(spark.read.parquet(s"$nanosDir/events.parquet")
      .schema("ts").dataType == LongType)
    assert(spark.read.parquet(s"$microsDir/events.parquet")
      .schema("ts").dataType == TimestampType)
    // …and normalization erases the difference completely
    assert(nanos.schema("ts").dataType == TimestampType)
    assert(micros.schema("ts").dataType == TimestampType)
    assert(canonical(nanos) == canonical(micros))
    assert(nanos.count() == 600)
  }

  for (name <- Seq("q12_events_hourly", "a1_asof_click_error",
      "c1_compact_latest", "st2_streaming_events_hourly")) {
    test(s"$name is encoding-invariant (int64-nanos vs timestamp[us])") {
      val build = SparkEntry.queries(name)
      val a = canonical(build(spark, nanosDir))
      val b = canonical(build(spark, microsDir))
      assert(a.nonEmpty, s"$name returned no rows on the fixture")
      assert(a == b, s"$name diverges across ts encodings")
    }
  }

  test("timestamp_ntz normalizes to the same instants (session tz is UTC)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-evt-ntz").toString
    logicalEvents.toDF("event_id", "ts_us", "user_id", "event_type", "value")
      .withColumn("props", lit(null).cast("string"))
      .withColumn("ts", timestamp_micros(col("ts_us")).cast("timestamp_ntz"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ntz = graft.core.Tables(spark, dir).events
    assert(ntz.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(canonical(ntz) ==
      canonical(graft.core.Tables(spark, microsDir).events))
  }

  test("EventTime rejects an un-normalizable ts encoding loudly") {
    import spark.implicits._
    val bad = Seq(("x", 1)).toDF("ts", "k")
    val err = intercept[RuntimeException] {
      graft.core.EventTime.normalize(bad)
    }
    assert(err.getMessage.contains("unsupported event-time encoding"))
  }
}
