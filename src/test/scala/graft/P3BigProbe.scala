package graft

// dev probe: the Bench p3_136mb block standalone — generates the
// 136 MB seeded ballot file (once) and times the full two-phase
// Condorcet chain, printing the election output for eyeballing.
// usage: Test/runMain graft.P3BigProbe
object P3BigProbe {
  def main(args: Array[String]): Unit = {
    val spark = core.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val cpus = spark.sparkContext.defaultParallelism
    val bdir = "target/bench/ballots_136mb"
    if (!new java.io.File(s"$bdir/_SUCCESS").exists()) {
      val t0 = System.nanoTime()
      sources.Generators.ballots(spark, 6800000L,
        (0 to 9).map(_.toString), seed = 425)
        .write.mode("overwrite").text(bdir)
      println(f"[p3big] generated in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    val bytes = new java.io.File(bdir).listFiles()
      .filter(_.getName.startsWith("part-")).map(_.length).sum
    println(s"[p3big] ballot bytes: $bytes")
    import spark.implicits._
    def once(show: Boolean): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val ballots = spark.read.textFile(bdir)
      val p1 = mapreduce.MapleJuiceJob.run(ballots,
        mapreduce.Workloads.CondorcetMaple1,
        mapreduce.Workloads.CondorcetJuice1, cpus)
      val p2 = mapreduce.MapleJuiceJob.run(p1.map(_._1),
        mapreduce.Workloads.CondorcetMaple2,
        new mapreduce.Workloads.CondorcetJuice2Compat(10), 1)
      if (show) p2.collect().foreach(println)
      else p2.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[p3big] warm-up (with output): ${once(show = true)}%.2f s")
    for (r <- 1 to 3) println(f"[p3big] timed rep$r: ${once(show = false)}%.2f s")
    spark.stop()
  }
}
