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
    require(saltBuckets > 0, s"saltBuckets must be positive, got $saltBuckets")
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

  /** Salted inner equi-join for when AQE's runtime skew split can't
    * help (e.g. the skew is known up front, or AQE is disabled on the
    * cluster): each skewed-side row gets a salt in [0, saltBuckets)
    * from its physical position — duplicate rows of one hot key
    * spread across buckets, which a content hash could not do — and
    * the other side replicates `saltBuckets` times so every
    * (key, salt) bucket finds its match. Shuffle keys become
    * (key, salt): a hot key's rows land on `saltBuckets` tasks
    * instead of one. Cost: the right side shuffles saltBuckets×; use
    * with a small-but-not-broadcastable right side.
    */
  def saltedJoin(skewed: DataFrame, right: DataFrame, key: String,
                 saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0, s"saltBuckets must be positive, got $saltBuckets")
    // The position-derived salt is nondeterministic across recomputes;
    // Spark marks such stages indeterminate and resubmits the WHOLE
    // stage (not just lost tasks) on fetch failure (SPARK-25341), which
    // is what keeps this correct under partial retry — the same
    // reliance every rand()-salted plan has.
    val l = skewed.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets))
        .cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
