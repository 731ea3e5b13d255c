package graft

// quick dev check: planted recall at sf0.1 under the retuned params
object S3Check {
  def main(args: Array[String]): Unit = {
    val spark = core.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val q = SparkEntry.queries("s3_cosine_neardup")
    for (run <- 1 to 2) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val rows = q(spark, "/root/testdata/sf0.1").collect()
      val sec = (System.nanoTime()-t0)/1e9
      val planted = rows.count(r => r.getLong(1) - r.getLong(0) == 1000000L)
      println(f"RUN=$run ROWS=${rows.length} PLANTED=$planted SEC=$sec%.2f")
    }
    spark.stop()
  }
}
