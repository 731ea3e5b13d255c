package graft

import org.apache.spark.sql.SparkSession

import graft.core.GraftSession

/** Disposable probe: replicate round-6's bench protocol (no cache clear
  * between runs, best-of-2) against round-7/8's (clear before each run)
  * for queries that persist() intermediates, to show the r06 series was
  * flattered by CacheManager reuse rather than r7+ having regressed.
  */
object CacheFlatterProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = GraftSession.tuned(
      SparkSession.builder().master("local[32]").appName("probe"),
      shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def once(n: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    for (n <- Seq("t8_lm_score", "t9_tfidf_keywords", "x6_training_set",
        "x10_weighted_sample", "q1_pricing_summary")) {
      once(n) // warm-up, as both protocols had
      spark.catalog.clearCache()
      val cold1 = once(n); spark.catalog.clearCache()
      val cold2 = once(n) // r7/r8 protocol: every run cold
      val warm = once(n)  // r6 protocol: run 2 reuses run 1's cache
      println(f"PROBE $n%-24s cold=${math.min(cold1, cold2)}%.3f warm=$warm%.3f")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
