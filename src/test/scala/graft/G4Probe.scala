package graft

import org.apache.spark.sql.functions._

// dev probe: g4 stage split — edge build vs the 4 Bellman-Ford rounds.
// usage: Test/runMain graft.G4Probe [sfDir] [reps]
object G4Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = core.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[g4probe] $label%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (rep <- 1 to reps) {
      println(s"--- rep $rep ---")
      spark.catalog.clearCache()
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
      t("edges build (count)")(println("  edges=" + edges.count()))
      t("bellmanFord 4 iters")(
        operators.Graph.bellmanFord(edges, 1L, 4)
          .write.format("noop").mode("overwrite").save())
      spark.catalog.clearCache()
      t("g4 catalog end-to-end")(
        SparkEntry.queries("g4_sssp")(spark, sfDir)
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
