package graft

import org.apache.spark.sql.functions._

// dev probe for the t7 decade question: the documents scan at sf1 is
// a 5.7MB single file, and Spark's openCostInBytes floor (4MB) caps
// its split count at ~2 — a CPU-heavy regex projection then runs on 2
// of 32 cores. A/B the split-granularity knob, plus the alternative
// contains('@') gating idea, in one session, interleaved.
// usage: Test/runMain graft.T7AB [sfDir] [reps]
object T7AB {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "target/testdata/sf1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = core.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    def q() = SparkEntry.queries("t7_pii_redaction")(spark, sfDir)
    def run(label: String, openCost: String): Double = {
      spark.conf.set("spark.sql.files.openCostInBytes", openCost)
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      q().write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[t7ab] $label%-12s $dt%.2f s")
      dt
    }
    run("warmup", "4194304")
    val acc = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    val arms = Seq(("open4MB", "4194304"), ("open512KB", "524288"),
      ("open128KB", "131072"))
    for (_ <- 1 to reps; (l, c) <- arms) acc(l) = run(l, c) :: acc(l)
    for ((l, _) <- arms) {
      val a = acc(l).sorted
      println(f"[t7ab] median $l%-12s ${a(a.size / 2)}%.2f s")
    }
    spark.stop()
  }
}
