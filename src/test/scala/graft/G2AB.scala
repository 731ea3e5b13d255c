package graft

// dev probe: A/B g2 variants in ONE session, interleaved so box
// weather hits all arms equally.
// usage: Test/runMain graft.G2AB [sfDir] [reps]
object G2AB {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 4
    val spark = core.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    def run(label: String, ceiling: String, adaptBcast: String): Double = {
      spark.conf.set("spark.graft.triangles.closeBloomMaxEdges", ceiling)
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", adaptBcast)
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
    SparkEntry.queries("g2_triangles")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[g2ab] $label%-14s $dt%.2f s")
      dt
    }
    run("warmup", "0", "10MB")
    val arms = Seq(
      ("base", "0", "10MB"),
      ("bloom", Long.MaxValue.toString, "10MB"),
      ("bcast64", "0", "64MB"),
      ("bloom+bcast64", Long.MaxValue.toString, "64MB"))
    val acc = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    for (_ <- 1 to reps; (l, c, b) <- arms) acc(l) = run(l, c, b) :: acc(l)
    for ((l, _, _) <- arms) {
      val a = acc(l).sorted
      println(f"[g2ab] median $l%-14s ${a(a.size / 2)}%.2f s")
    }
    spark.stop()
  }
}
