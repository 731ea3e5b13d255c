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
  *  - per-query time = MEDIAN of 3 timed runs — robust against the
  *    one-off stalls a shared box injects in either direction, unlike
  *    min (flatters sustained contention) or mean (one outlier owns it);
  *  - a CONTENTION SENTINEL — a fixed 500M-iteration xorshift spin that
  *    takes 1.00s single-threaded on this box when idle (calibrated,
  *    +-0.3% over repeated runs) — executes before, between and after
  *    the timed passes. If its median drifts past 1.3x the calibrated
  *    baseline, the line carries "contended":true: the round-6 bench
  *    artifact was taken on a busy box and fabricated 1.5-2.7x
  *    regressions on unchanged code, and this flag is what lets a
  *    reader reject such a run instead of diagnosing phantom
  *    regressions;
  *  - a failing query is reported in "errors" with elapsed -1, never
  *    silently folded into the total.
  */
object Bench {

  /** Fixed CPU-bound work whose idle-box wall time is known. xorshift64
    * can't be constant-folded (the result is consumed) and runs in
    * registers, so its wall time varies only with CPU contention —
    * never with data, disk, or JIT warm-up beyond the first pass.
    */
  private def spinSentinel(): Double = {
    var x = 0x9E3779B97F4A7C15L
    var i = 0L
    val t0 = System.nanoTime()
    while (i < 500000000L) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      i += 1
    }
    val dt = (System.nanoTime() - t0) / 1e9
    sink = x // publish x: defeat dead-code elimination
    dt
  }
  @volatile private var sink: Long = _

  /** Calibrated idle-box sentinel time (see spinSentinel). */
  private val SentinelBaselineSec = 1.0
  private val ContentionFactor = 1.3

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
    // Warm-up: one untimed pass over every query (also JIT-warms the
    // sentinel loop before its first timed use).
    spinSentinel()
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
    def median3(a: Double, b: Double, c: Double): Double =
      Seq(a, b, c).sorted.apply(1)
    // Sentinel samples bracket the timed passes, so contention that
    // starts or stops mid-run still lands in at least one sample.
    val sentinels = scala.collection.mutable.ArrayBuffer(spinSentinel())
    val pass1 = names.map(n => n -> timeOnce(n)).toMap
    sentinels += spinSentinel()
    val pass2 = names.map(n => n -> (if (pass1(n) >= 0) timeOnce(n) else -1.0)).toMap
    val pass3 = names.map(n => n -> (if (pass2(n) >= 0) timeOnce(n) else -1.0)).toMap
    sentinels += spinSentinel()
    val results = names.map { n =>
      val (a, b, c) = (pass1(n), pass2(n), pass3(n))
      n -> (if (a >= 0 && b >= 0 && c >= 0) median3(a, b, c) else -1.0)
    }
    // best-of-passes, next to the median: rounds before 7 reported
    // best-of-2, so this is the apples-to-apples series for
    // cross-round comparison while the median stays the headline
    val mins = names.map { n =>
      val (a, b, c) = (pass1(n), pass2(n), pass3(n))
      n -> (if (a >= 0 && b >= 0 && c >= 0) Seq(a, b, c).min else -1.0)
    }
    val sentinelMedian = median3(sentinels(0), sentinels(1), sentinels(2))
    val contended = sentinelMedian > SentinelBaselineSec * ContentionFactor
    def js(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    val qs = results.map { case (k, v) => s"${js(k)}:$v" }.mkString("{", ",", "}")
    val qsMin = mins.map { case (k, v) => s"${js(k)}:$v" }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s"${js(k)}:${js(v)}" }.mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val sentinelJson = sentinels.map(s => f"$s%.3f").mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","method":"median-of-3","queries":$qs,"queries_min":$qsMin,"errors":$errJson,"sentinel_sec":$sentinelJson,"sentinel_baseline_sec":$SentinelBaselineSec,"contended":$contended,"sf":${js(sfDir)}}"""
    println(line)
    // Sidecar copy: the driver captures only a bounded stdout tail, and
    // round 7's line was truncated past parseability by 20 error
    // messages. The file survives any tail size. Best-effort — an
    // unwritable cwd must not fail a bench whose results already
    // printed.
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_LAST.json"),
      (line + "\n").getBytes("UTF-8"))
    catch { case e: java.io.IOException =>
      System.err.println(s"[bench] sidecar write failed (results already " +
        s"printed above): $e")
    }
    spark.stop()
  }
}
