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

  test("IVF index-at-rest probe prunes the corpus scan to the probed cells") {
    val s = spark
    import s.implicits._
    val e = graft.core.Tables(s, sf("sf0.001")).embeddings
    // fresh build (not ensure()): training twice in ONE session is
    // deterministic, so the at-rest-vs-inline equality below is exact
    val path = Files.createTempDirectory("graft-ivf-spec").toString
    graft.operators.IvfIndex.build(e, path, nlist = 8, maxIter = 5)
    val queries = e.filter($"vec_id" < 3)
    val probed = graft.operators.IvfIndex.probeTopK(s, path, queries,
      k = 3, nprobe = 2)
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell"),
      s"probe must push a partition filter on cell:\n$plan")
    // recompute the probed cells independently (same ||c||²/2 − v·c
    // scoring) and confirm the pruned scan reads ONLY those directories
    val cents = graft.operators.IvfIndex.centroids(s, path)
    assert(cents.size == 8)
    val allCells = s.read.parquet(s"$path/corpus")
      .select($"cell").distinct().count()
    assert(allCells == 8, "index must populate all cells for the test to bite")
    def nearestCells(v: Seq[Double], n: Int): Seq[Int] = cents.zipWithIndex
      .map { case (c, i) =>
        (c.map(x => x * x).sum / 2 - c.lazyZip(v).map(_ * _).sum, i) }
      .sorted.take(n).map(_._2)
    val probedCells = queries
      .select($"embedding".cast("array<double>")).as[Seq[Double]]
      .collect().flatMap(nearestCells(_, 2)).distinct.sorted
    assert(probedCells.length <= 6)
    val readDirs = s.read.parquet(s"$path/corpus")
      .filter($"cell".isin(probedCells: _*))
      .select(input_file_name()).distinct().as[String]
      .collect().flatMap(f => "cell=(\\d+)".r.findFirstMatchIn(f).map(_.group(1).toInt))
      .distinct.sorted
    assert(readDirs.nonEmpty && readDirs.toSet.subsetOf(probedCells.toSet),
      s"pruned scan read cells ${readDirs.mkString(",")} beyond probed ${probedCells.mkString(",")}")
    // and the probe's answer equals the in-line (retraining) form's
    val inline = graft.operators.Similarity
      .ivfTopK(e, queries, k = 3, nlist = 8, nprobe = 2, maxIter = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val atRest = probed
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(atRest == inline, s"at-rest probe diverged from in-line IVF")
  }
}
