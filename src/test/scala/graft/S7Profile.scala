package graft

// dev profiler: time the s7 catalog query as Bench does (clearCache between runs)
object S7Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = core.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val q = SparkEntry.queries("s7_semantic_dedup")
    q(spark, sfDir).foreach(_ => ())
    for (i <- 1 to 3) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      q(spark, sfDir).foreach(_ => ())
      println(f"[s7prof] run$i ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
