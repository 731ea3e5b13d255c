package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Partition pruning: hive-style partitioned layout + a partition-key
  * predicate must prune at PLANNING time (PartitionFilters in the scan,
  * only matching directories read) — the difference between scanning
  * one day and scanning 100 TB.
  */
class PartitionPruningSpec extends SparkSpecBase {

  test("a partition-key predicate prunes directories at the scan") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-part").toString
    graft.core.Tables(s, sf("sf0.001")).events
      .withColumn("day", date_format($"ts", "yyyy-MM-dd"))
      .write.mode("overwrite").partitionBy("day").parquet(dir)
    val days = s.read.parquet(dir).select("day").distinct().count()
    assert(days > 1, "need multiple partitions for the test to mean anything")

    val oneDay = s.read.parquet(dir).filter($"day" === "2024-01-02")
    val plan = oneDay.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(day"),
      s"partition filter not pushed:\n$plan")
    // the pruned scan reads exactly the one matching directory
    val scanned = oneDay.select(input_file_name()).distinct()
      .as[String].collect()
    assert(scanned.nonEmpty && scanned.forall(_.contains("day=2024-01-02")))
  }
}
