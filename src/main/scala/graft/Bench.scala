package graft
import org.apache.spark.sql.SparkSession

import graft.core.GraftSession

/** Benchmark main. Emits ONE JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}
  *
  * Method:
  *  - same GraftSession.tuned configuration correctness runs under;
  *  - one warm-up pass (JVM/codegen/parquet-footer caches) before timing;
  *  - action = write.format("noop") so every projected column is actually
  *    materialized (count() lets Catalyst prune the work away);
  *  - per-query time = best of 2 timed runs (this host shows 1.5-2x
  *    run-to-run noise under load; min is the standard noise-robust
  *    estimator for a deterministic workload);
  *  - a failing query is reported in "errors" with elapsed -1, never
  *    silently folded into the total.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.tuned(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-bench"),
      shufflePartitions = cpus
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    val names = SparkEntry.queries.keys.toSeq.sorted
    // Warm-up: one untimed pass over every query.
    names.foreach { n =>
      try runOnce(SparkEntry.queries(n)) catch { case _: Throwable => () }
    }
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def timeOnce(name: String): Double = {
      // Operators that persist() intermediates (d3, s3) register them in
      // the CacheManager, which matches by logical plan — a later run of
      // the same query would silently read the previous run's cache.
      // Clear so every timed run pays its own materialization and only
      // WITHIN-run reuse (the actual plan property) is measured.
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try { runOnce(SparkEntry.queries(name)); (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable =>
        errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
        -1.0
      }
    }
    val results = names.map { name =>
      val a = timeOnce(name)
      val b = if (a >= 0) timeOnce(name) else a
      name -> (if (a >= 0 && b >= 0) math.min(a, b) else -1.0)
    }
    def js(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    val qs = results.map { case (k, v) => s"${js(k)}:$v" }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s"${js(k)}:${js(v)}" }.mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":${js(sfDir)}}""")
    spark.stop()
  }
}
