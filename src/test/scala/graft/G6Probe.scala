package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.functions._

import graft.core.GraftSession

/** Dev probe (Test scope, like M9Probe): where do g6 LPA's walls go at
  * a given replica multiplier? SCALING_r10 measured a reproducible
  * mid-scale slowdown (30x slower than 100x on 3.3x less data); this
  * prints per-round wall + job walls for the checkpointed loop, and the
  * physical plan of one UNCUT round (checkpoint=false) so the join
  * strategy AQE picked at this scale is visible.
  *
  * Usage: Test/runMain graft.G6Probe [mult] [sfDir]
  */
object G6Probe {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(30)
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val t = graft.core.Tables(spark, dir)

    // the ScaleSmoke purchase graph, replicated disjoint
    val baseEdges = t.orders.select(col("o_orderkey"), col("o_custkey"))
      .join(t.lineitem.select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("src"), col("l_suppkey").as("dst"))
      .distinct()
    val tmp = java.nio.file.Files.createTempDirectory(s"g6probe_$mult").toString
    (0 until mult).map(r => baseEdges.select(
        (col("src") + lit(r * 1000000L)).as("src"),
        (col("dst") + lit(r * 1000000L)).as("dst")))
      .reduce(_ union _).write.mode("overwrite").parquet(s"$tmp/e")
    val edges = spark.read.parquet(s"$tmp/e")
    println(s"[g6probe] mult=$mult edges=${edges.count()}")

    val jobs = scala.collection.mutable.Map[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.synchronized { jobs(j.jobId) = (j.time, "") }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs.get(j.jobId).foreach { case (t0, _) =>
            println(f"[g6probe]   job ${j.jobId}%4d ${(j.time - t0) / 1e3}%8.2fs")
          }
        }
    })

    // per-round walls through the REAL checkpointed loop, one round at
    // a time so the boundary between rounds is visible in the job log
    var labels: org.apache.spark.sql.DataFrame = null
    val tAll = System.nanoTime()
    for (r <- 1 to 3) {
      val t0 = System.nanoTime()
      labels = graft.operators.Graph.labelPropagation(edges, rounds = r)
      val n = labels.count()
      println(f"[g6probe] rounds=$r cumulative=${(System.nanoTime() - t0) / 1e9}%.1fs rows=$n")
    }
    println(f"[g6probe] total (1+2+3 rounds re-run) ${(System.nanoTime() - tAll) / 1e9}%.1fs")

    // the uncut single-round plan: what join strategy did this scale get?
    val p = graft.operators.Graph
      .labelPropagation(edges, rounds = 1, checkpoint = false)
      .queryExecution.executedPlan.toString
    val strat = Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
      .filter(p.contains)
    println(s"[g6probe] uncut round-1 join strategies: ${strat.mkString(",")}")

    val root = java.nio.file.Paths.get(tmp)
    java.nio.file.Files.walk(root).sorted(java.util.Comparator.reverseOrder())
      .forEach(pp => java.nio.file.Files.deleteIfExists(pp))
    spark.stop()
  }
}
