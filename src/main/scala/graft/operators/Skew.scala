package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot-key aggregations: the two-stage salted
  * aggregate. AQE's skew-join splitting handles JOIN skew at runtime
  * (enabled in GraftSession); aggregation skew needs this plan shape —
  * stage 1 spreads each key over `saltBuckets` partial groups, stage 2
  * merges the partials, so no single task ever owns a whole hot key.
  * Cost: one extra (tiny, O(keys·salt)) shuffle; correct for any
  * algebraic aggregate expressed as (partial, merge) column pairs.
  */
object Skew {

  /** Salted sum/count aggregation over `keyCol`.
    * `aggs` maps output name → column to sum. Counts are sums of 1.
    */
  def saltedSum(df: DataFrame, keyCol: String, saltBuckets: Int,
                aggs: Map[String, Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val partialCols = aggs.toSeq.map { case (name, c) => sum(c).as(name) }
    val partial = salted
      .groupBy(col(keyCol), col("__salt"))
      .agg(partialCols.head, partialCols.tail: _*)
    val finalCols = aggs.keys.toSeq.map(n => sum(col(n)).as(n))
    partial
      .groupBy(col(keyCol))
      .agg(finalCols.head, finalCols.tail: _*)
  }
}
