package graft
import org.apache.spark.sql.functions._

/** Dev probe: cost of exact (order-independent) money aggregation vs
  * the raw double sum it replaced (round-14, the q4 sf1 finding).
  * Median-of-3 over the q1-shaped filter+groupBy at sf0.1:
  * double 1.03s, decimal(28,6) 0.80s, decimal(18,6) 0.61s, long
  * micro-units 0.46s (2026-08-16, idle box) — i.e. the DECIMAL(28,6)
  * accumulation the catalog ships costs NOTHING measurable over the
  * double sum (scan+filter dominate), so scale-stable money sums are
  * a free correctness win, not a perf trade. long micro-units would
  * shave ~0.3s but silently wrap past 2^63 micro-units (~9.2e12 in
  * value) — exactly the 100 TB regime the decimal fix exists for.
  *
  * Usage: sbt "Test/runMain graft.DecTax"
  */
object DecTax {
  def main(args: Array[String]): Unit = {
    val spark = core.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    def time(tag: String)(f: => Unit): Unit = {
      f // warm
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted.apply(1)
      println(f"[dectax] $tag%-14s $t%.3f s")
    }
    def agg(c: org.apache.spark.sql.Column) =
      li.filter(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(c).as("s")).write.format("noop").mode("overwrite").save()
    val prod = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    time("double")       { agg(prod) }
    time("dec28")        { agg(prod.cast("decimal(28,6)")) }
    time("dec18")        { agg(prod.cast("decimal(18,6)")) }
    time("long_micro")   { agg(round(prod * 1e6).cast("long")) }
    spark.stop()
  }
}
