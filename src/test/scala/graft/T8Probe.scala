package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.core.GraftSession

/** Round-11 pin for t8_lm_score's +19% driver-record drift
  * (3.33 -> 3.96 s, the only >15% bench move on unchanged code).
  *
  * VERDICT r10 finding 3 asks: prove it's timing noise or find the
  * stage that moved. The evidence shape follows the within-JVM probe
  * rule (cross-JVM sub-5s walls spread with AQE stats timing and box
  * weather): run the EXACT bench invocation — same GraftSession.tuned
  * session shape, same noop-write action, one warm-up — N times in one
  * JVM and decompose every run into its completed stages' executor run
  * time. If per-run walls are tight and the stage profile is flat
  * across runs, the plan didn't move; the driver number was the box.
  * If a stage's run time steps between runs, that stage is the finding.
  *
  * Emits one JSON line per timed run plus a summary line.
  */
object T8Probe {
  def main(args: Array[String]): Unit = {
    val runs = args.headOption.map(_.toInt).getOrElse(8)
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.tuned(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-t8probe"),
      shufflePartitions = cpus
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // per-stage executor run time since the last drain, keyed by the
    // stage's callsite-bearing name prefix (stable across reruns of
    // the same plan; attempt ids vary, names don't)
    val stageMs = new java.util.concurrent.ConcurrentHashMap[String, Long]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          val key = s.stageInfo.name.takeWhile(_ != '+').trim
          stageMs.merge(key, m.executorRunTime, (a, b) => a + b)
        }
        ()
      }
    })
    def drainStages(): Map[String, Long] = {
      // stage events are async; settle like WaveProbes.ShuffleMeter
      var last = -1L; var stable = 0; var waited = 0
      def tot = {
        val it = stageMs.values().iterator()
        var s = 0L; while (it.hasNext) s += it.next(); s
      }
      while (stable < 3 && waited < 10000) {
        Thread.sleep(200); waited += 200
        val now = tot
        if (now == last) stable += 1 else { stable = 0; last = now }
      }
      import scala.jdk.CollectionConverters._
      val snap = stageMs.asScala.toMap
      stageMs.clear()
      snap
    }

    def runOnce(): Unit =
      SparkEntry.queries("t8_lm_score")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    runOnce() // warm-up, exactly as Bench does
    drainStages()
    val walls = (1 to runs).map { i =>
      val t0 = System.nanoTime()
      runOnce()
      val wall = (System.nanoTime() - t0) / 1e9
      val stages = drainStages()
      val top = stages.toSeq.sortBy(-_._2).take(4)
        .map { case (n, ms) => s""""${n.replace("\"", "")}":${ms}""" }
        .mkString(",")
      println(f"""{"op":"t8_probe","run":$i,"wall_sec":$wall%.3f,"stage_exec_ms_total":${stages.values.sum},"top_stages_exec_ms":{$top}}""")
      wall
    }
    val sorted = walls.sorted
    val med = sorted(runs / 2)
    println(f"""{"op":"t8_probe_summary","runs":$runs,"median_sec":$med%.3f,"min_sec":${sorted.head}%.3f,"max_sec":${sorted.last}%.3f,"spread":${sorted.last / sorted.head}%.2f}""")
    spark.stop()
  }
}
