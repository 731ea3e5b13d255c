package graft

import org.apache.spark.sql.functions._

// dev probe: exchange count in bellmanFord's adjacency build, both
// modes, plus warm g4 end-to-end A/B.
// usage: Test/runMain graft.AdjPlanProbe [sfDir]
object AdjPlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = core.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val e = Seq((1L, 2L, 3L), (2L, 3L, 4L)).toDF("src", "dst", "w")
    for (canon <- Seq(false, true)) {
      val p = operators.Graph.bellmanAdjacency(e, canon)
        .queryExecution.executedPlan.toString
      val nEx = "Exchange".r.findAllIn(p).size
      println(s"[adjprobe] canonical=$canon exchanges=$nEx")
      if (canon == false) println(p.take(1500))
    }
    for (rep <- 1 to 3) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      SparkEntry.queries("g4_sssp")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[adjprobe] g4 end-to-end rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
