package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located joins: pre-partitioning both sides of a
  * recurring join key into the same bucket layout removes the
  * per-query shuffle entirely — the 100 TB answer to "this join runs
  * every hour on the same keys". The assertion is on the physical
  * plan: joining two tables bucketed by the same key must produce a
  * SortMergeJoin with NO Exchange on either side.
  */
class BucketingSpec extends SparkSpecBase {

  test("joining same-bucketed tables plans no shuffle exchange") {
    val s = spark
    import s.implicits._
    val t = graft.core.Tables(s, sf("sf0.001"))
    // AQE rewrites small SMJs to broadcast, hiding the property under
    // test; pin the planner for this check only.
    withSql("spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      t.orders.write.mode("overwrite")
        .bucketBy(4, "o_custkey").sortBy("o_custkey").saveAsTable("b_orders")
      t.customer.write.mode("overwrite")
        .bucketBy(4, "c_custkey").sortBy("c_custkey").saveAsTable("b_customer")
      val joined = s.table("b_orders")
        .join(s.table("b_customer"), $"o_custkey" === $"c_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
      assert(plan.contains("SelectedBucketsCount"),
        "scan should report bucket pruning metadata")
      // and the result is the same as the unbucketed join
      val n = joined.count()
      val expected = t.orders
        .join(t.customer, $"o_custkey" === $"c_custkey").count()
      assert(n == expected)
    }
  }

  private def withSql(settings: (String, String)*)(body: => Unit): Unit = {
    val prior = settings.map { case (k, _) => k -> spark.conf.getOption(k) }
    settings.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
