package graft

import org.apache.spark.sql.functions._

/** Executable evidence for the "AQE re-plans skew at runtime" claims
  * the operator Scaladoc leans on (Skew.scala positions saltedJoin as
  * the AQE-less fallback): a constructed hot-key join, with the skew
  * thresholds scaled down to test size, must actually come back from
  * AQE with the skewed partition SPLIT. If a Spark upgrade or a config
  * change in GraftSession ever silently disabled that behavior, the
  * 100 TB story would regress to the manual salting path — this spec
  * makes that failure loud.
  */
class AqeSkewSpec extends SparkSpecBase {

  test("AQE splits a skewed join partition (skew=true in the final plan)") {
    val s = spark
    import s.implicits._
    val conf = s.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      // scale the skew detection down to test size: a partition is
      // "skewed" past 1x median AND >20KB, and the target split size
      // is 20KB; disable broadcast so the join actually shuffles
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "20KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "20KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // ... the RUNTIME threshold too: GraftSession sets the adaptive
      // one to 64MB, under which AQE would broadcast the tiny dim at
      // replan time and this join would never shuffle at all
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // 50k rows of one hot key + a sprinkle of others, joined to a
      // small keyed dim — the hot key's partition dwarfs the median
      val fact = s.range(0, 50000).select(
        when($"id" % 100 === 0, $"id" % 7).otherwise(lit(3L)).as("k"),
        concat(lit("pad-pad-pad-pad-pad-pad-pad-"), $"id").as("payload"))
      val dim = s.range(0, 7).select($"id".as("k"), ($"id" * 10).as("v"))
      val joined = fact.join(dim, "k")
      // collect() drives THIS Dataset's own QueryExecution — count()
      // would wrap a new plan and leave this one un-executed, so its
      // AdaptiveSparkPlan would still print isFinalPlan=false
      val n = joined.collect().length
      assert(n == 50000, s"join must preserve fact rows, got $n")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the hot partition as skewed:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
