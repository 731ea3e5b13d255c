package graft

// dev profiler: warm bench-style timing of arbitrary catalog queries
// usage: Test/runMain graft.QProfile <sfDir> <name1,name2,...> [reps]
object QProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = core.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names) {
      val q = SparkEntry.queries(name)
      q(spark, sfDir).foreach(_ => ())
      for (i <- 1 to reps) {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        q(spark, sfDir).foreach(_ => ())
        println(f"[qprof] $name%-24s run$i ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
