package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Stop/restart recovery for the streaming corpus-clean pipeline — the
  * operational contract a long-running 100 TB ingest actually depends
  * on: a run is killed, a new batch of files lands, the query restarts
  * from its checkpoint and (1) does not re-emit documents already
  * committed to the sink, (2) still holds the dedup state from before
  * the restart, so a duplicate arriving AFTER the restart (within the
  * watermark horizon) is dropped. Uses the parquet file sink + file
  * source, the exactly-once pairing (memory sinks forget on restart
  * and would mask a replay bug).
  */
class CheckpointRecoverySpec extends SparkSpecBase {

  test("corpus clean restarts from checkpoint: no re-emission, dedup state survives") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-chk").toString
    val (srcDir, outDir, chkDir) = (s"$root/src", s"$root/out", s"$root/chk")

    def doc(id: Long, text: String) = (id, text, id + 1)
    def writeBatch(name: String, rows: Seq[(Long, String, Long)]): Unit =
      rows.toDF("doc_id", "text", "sec")
        .coalesce(1).write.parquet(s"$srcDir/$name")

    // quality-passing text (long, stopword-rich, no punctuation)
    val good = "the quick brown fox jumps over the lazy dog and runs to " +
      "the river bank of a quiet town where the people trade fresh goods"

    writeBatch("b1", Seq(doc(1, good + " one"), doc(2, good + " two"),
      doc(3, good + " two"))) // 3 duplicates 2 within the first run

    val schema = s.read.parquet(s"$srcDir/b1").schema
    def runOnce(): Unit = {
      val src = s.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(srcDir)
        .withColumn("ts", timestamp_seconds(col("sec")))
      val cleaned = graft.streaming.StreamingCorpusClean.clean(
        src, "text", "ts", horizon = "1 hour", minQuality = 0.1)
      val q = cleaned.writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", chkDir)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
    }

    runOnce() // first run commits batch 1, then "the job is killed"
    val after1 = s.read.parquet(outDir).select($"doc_id").as[Long]
      .collect().sorted.toSeq
    assert(after1 == Seq(1L, 2L), s"first run should emit 1,2: $after1")

    // new files land while the job is down: one genuinely new doc and
    // one duplicate of a PRE-restart text (state must survive recovery)
    writeBatch("b2", Seq(doc(10, good + " ten"), doc(11, good + " one")))

    runOnce() // restart from the same checkpoint
    val after2 = s.read.parquet(outDir).select($"doc_id").as[Long]
      .collect().sorted.toSeq
    // 1,2 NOT re-emitted (exactly-once), 10 new, 11 dropped (dup of 1)
    assert(after2 == Seq(1L, 2L, 10L),
      s"restart must add only the new non-duplicate doc: $after2")
  }
}
