package graft

import org.apache.spark.sql.SparkSession
import graft.core.GraftSession

/** Round-11 weather probe for the streaming family: times named
  * catalog queries solo (bench invocation — tuned session, noop-write
  * action, one warm-up) so a streaming wall can be read OUTSIDE the
  * 143-query bench context. Built to separate "the st family got
  * slower" from "the box got slower": paired with a /proc/stat
  * sampler it showed st5 at 15-19 s under a 15-19-core kernel-sys
  * storm at local[32] vs 5.5-6.2 s at local[8] on the same box and
  * code — a thread-count-scaled host-co-tenancy mode, not a plan
  * change (BENCH_NOTES_r11.md; SCALING_r11.json st5_weather_probe
  * rows). SPARK_GRAFT_CPUS picks the thread count.
  */
object StProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.tuned(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-stprobe"),
      shufflePartitions = cpus
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("st1_streaming_corpus_clean", "st5_stream_stream_join")
    def runOnce(n: String): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach(runOnce) // warm-up
    names.foreach { n =>
      val walls = (1 to 4).map(_ => runOnce(n))
      println(f"""{"op":"st_probe","q":"$n","walls":[${walls.map(w => f"$w%.2f").mkString(",")}]}""")
    }
    spark.stop()
  }
}
