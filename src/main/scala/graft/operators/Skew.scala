package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: the two-stage salted aggregate and the salted
  * broadcast join. AQE's skew-join splitting handles JOIN skew at
  * runtime (enabled in GraftSession); [[saltedJoin]] is the explicit
  * form for when AQE's size heuristics miss.
  *
  * HONEST SCOPE for [[saltedSum]]: for the sum/count aggregates this
  * API expresses, Spark's HashAggregate already map-side-combines —
  * a hot key ships at most one partial row per map partition, so the
  * unsalted plan has no reducer skew and salting buys nothing but an
  * extra O(keys·salt) shuffle. The shape EXISTS here as the verified
  * template for the cases that DO need it — aggregates without
  * map-side combine (exact distinct under a hot key, collect-style
  * buffers, high-cardinality partial state that overflows the hash
  * map and falls back to sort-based aggregation) — where stage 1's
  * salt is what bounds a single task's state. x3 verifies the salted
  * result equals the direct one, which is the property that lets a
  * caller swap it in when profiling says so.
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
