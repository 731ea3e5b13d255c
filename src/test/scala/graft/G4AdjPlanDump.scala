package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

// dev tool: g4's catalog plan is a checkpointed LogicalRDD (bellmanFord
// runs its rounds eagerly), so the adjacency-build optimization is
// invisible in plans/r16/g4_sssp_after.txt. This dumps the adjacency
// FRAGMENT plans: "before" reconstructs the r15 build order
// (filter+groupBy THEN repartition = two full-edge-set exchanges);
// "after" is the shipped Graph.bellmanAdjacency with the
// canonicalEdges fast path (one exchange, no aggregate).
// usage: Test/runMain graft.G4AdjPlanDump <sfDir> <outDir>
object G4AdjPlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 1) args(1) else "plans/r16"
    val spark = core.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val li = core.Tables(spark, sfDir).lineitem
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val pairs = li.as("x").join(li.as("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_partkey") < col("y.l_partkey"))
      .groupBy(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
      .agg(count(lit(1)).as("c"))
      .select(col("a"), col("b"),
        greatest(lit(1L), expr("1000L div c")).as("w"))
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"), col("w"))
      .unionAll(pairs.select(col("b").as("src"), col("a").as("dst"), col("w")))
    // r15 shape: normalize first, repartition second — the aggregate
    // and the repartition are EACH a full-edge-set exchange
    val before = edges
      .select(col("src").cast("long"), col("dst").cast("long"),
        col("w").cast("long"))
      .filter(col("src") =!= col("dst"))
      .groupBy(col("src"), col("dst")).agg(min(col("w")).as("w"))
      .repartition(col("src"))
    val after = operators.Graph.bellmanAdjacency(edges, canonicalEdges = true)
    for ((df, tag) <- Seq((before, "before"), (after, "after"))) {
      val txt = df.queryExecution.explainString(FormattedMode)
      Files.writeString(Paths.get(s"$outDir/g4_sssp_adjacency_$tag.txt"), txt)
      println(s"[g4adj] $tag: ${txt.linesIterator.count(_.contains("Exchange"))} Exchange lines")
    }
    spark.stop()
  }
}
