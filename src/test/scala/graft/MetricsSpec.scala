package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Counter/metrics aggregation (SURVEY §2.4 A8): the reference keeps
  * monotonic counters + derived rates in its monitor
  * (`mp3/src/monitor.go:26-76`); the Spark equivalents are `observe`
  * metrics riding on a query (no extra pass) and accumulators.
  */
class MetricsSpec extends SparkSpecBase {

  test("observe collects pipeline counters without a second pass") {
    val s = spark
    import s.implicits._
    val obs = Observation("lineitem-scan")
    val df = graft.core.Tables(s, sf("sf0.001")).lineitem
      .observe(obs, count(lit(1)).as("rows_in"),
        sum(when($"l_discount" > 0.05, 1).otherwise(0)).as("discounted"))
      .filter($"l_discount" > 0.05)
    val kept = df.count()
    val m = obs.get
    assert(m("rows_in") == 6000L)
    assert(m("discounted") == kept)
  }

  test("accumulators count per-row events across tasks") {
    val s = spark
    import s.implicits._
    val acc = s.sparkContext.longAccumulator("malformed")
    val parsed = Seq("1", "x", "3", "y", "5").toDS().map { v =>
      v.toLongOption match {
        case Some(n) => n
        case None => acc.add(1); -1L
      }
    }
    assert(parsed.filter(_ >= 0).count() == 3)
    assert(acc.value == 2L)
  }
}
