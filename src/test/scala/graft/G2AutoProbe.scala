package graft

import org.apache.spark.sql.functions._

// dev probe: g2's triangleCounts vs triangleCountsAuto wall at a given
// sf, interleaved in one session. usage: Test/runMain graft.G2AutoProbe [sfDir]
object G2AutoProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = core.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    def edges = {
      val li = core.Tables(spark, sfDir).lineitem
        .select(col("l_orderkey"), col("l_partkey"))
      li.as("x").join(li.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").as("src"), col("y.l_partkey").as("dst"))
    }
    def time(tag: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"[g2auto] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("warmup-fixed")(operators.Graph.triangleCounts(edges))
    for (_ <- 1 to 2) {
      time("fixed")(operators.Graph.triangleCounts(edges))
      time("auto ")(operators.Graph.triangleCountsAuto(edges))
    }
    spark.stop()
  }
}
