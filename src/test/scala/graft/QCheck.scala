package graft

import java.nio.file.{Files, Paths}

// quick dev check: dump an arbitrary subset of catalog queries + their
// oracles for scripts/check_oracle.py, at an arbitrary sfDir.
// usage: Test/runMain graft.QCheck <sfDir> <outDir> <name1,name2,...>
object QCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 1) args(1) else "/tmp/qcheck"
    val names = if (args.length > 2) args(2).split(",").toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = core.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Per-query walls, split BUILD vs SERVE: the dump pass lands any
    // one-time index/materialization build (IndexCache at a fresh data
    // fingerprint) plus cold footers; the second, noop-write pass is
    // the serving path. sf1_validate.py merges walls.json into the
    // artifact so decade ratios can use the serve wall — the round-14
    // sweep reported s9's cold PQ build as a 19.2x "serving" ratio.
    // GRAFT_QCHECK_MODE=walls: the build pass is a cache-cleared noop
    // write instead of a coalesce(1) parquet dump — for walls-only
    // sweeps (sf10: oracle infeasible, outputs unwanted, and the
    // single-file encode would both eat disk and overstate the build
    // wall by the parquet-write cost — ADVICE r15). Default mode keeps
    // the dump: the oracle compare needs the outputs, and dump_sec is
    // then build + coalesce(1) + single-file parquet encode (recorded
    // in walls.json's "_mode" so downstream artifacts can say which
    // measurement they carry).
    val wallsOnly = sys.env.get("GRAFT_QCHECK_MODE").contains("walls")
    // hypervisor-steal jiffies bracketing each pass (the Bench
    // evidence pattern, round 16): this box takes multi-core steal
    // BURSTS (a d12c serve pass measured 19x its clean wall under one,
    // with nothing in the artifact to say so). Steal is never
    // self-caused, so per-pass steal cores are recorded in walls.json
    // and a serve pass whose window averaged >= 0.5 stolen cores gets
    // ONE bounded re-measure (the lower-steal window wins; ties to the
    // faster wall) — under persistent weather the artifact then
    // carries the evidence instead of silently shipping storm walls.
    def stealJiffies(): Long = try {
      val s = scala.io.Source.fromFile("/proc/stat")
      try s.getLines().next().split("\\s+").drop(1).take(8)
        .map(_.toLong).apply(7)
      finally s.close()
    } catch { case _: Throwable => 0L }
    def stealCores(j0: Long, j1: Long, wall: Double): Double =
      if (wall > 0) math.max(j1 - j0, 0L) / 100.0 / wall else 0.0
    val walls = scala.collection.mutable.LinkedHashMap
      .empty[String, (Double, Double, Double, Double)]
    for (name <- names) {
      val s0 = stealJiffies()
      val t0 = System.nanoTime()
      if (wallsOnly)
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      else
        SparkEntry.queries(name)(spark, sfDir)
          .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      val dump = (System.nanoTime() - t0) / 1e9
      val dumpSteal = stealCores(s0, stealJiffies(), dump)
      // clear the SQL cache so the serve pass pays its own
      // materialization (operators persist() shared subtrees; the
      // CacheManager matches by logical plan and would serve the dump
      // pass's cache) — but the at-rest INDEX (IndexCache) survives,
      // which is the point. The explicit GC releases the previous
      // query's localCheckpoint blocks (iterative operators) so a
      // long sweep's walls stay comparable to a fresh JVM's — the
      // round-15 bench smoke measured g4 at 10x its fresh-JVM wall in
      // a JVM polluted by the preceding catalog grind.
      def servePass(): (Double, Double) = {
        spark.catalog.clearCache()
        System.gc()
        Thread.sleep(150)
        val j0 = stealJiffies()
        val t1 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val w = (System.nanoTime() - t1) / 1e9
        (w, stealCores(j0, stealJiffies(), w))
      }
      val first = servePass()
      val (serve, serveSteal) =
        if (first._2 < 0.5) first
        else {
          val retry = servePass()
          if (retry._2 < first._2 ||
              (retry._2 == first._2 && retry._1 < first._1)) retry
          else first
        }
      walls(name) = (dump, serve, dumpSteal, serveSteal)
      println(f"[qcheck] $name%-28s dumped in $dump%.2f s, served in " +
        f"$serve%.2f s" + (if (serveSteal >= 0.5 || dumpSteal >= 0.5)
          f" [steal d=$dumpSteal%.1f s=$serveSteal%.1f]" else ""))
      writeWalls()
      spark.catalog.clearCache()
      System.gc()
    }
    def f3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // rewritten after EVERY query: a multi-hour sweep killed mid-run
    // (disk, OOM, operator timeout) keeps the walls it already paid for
    def writeWalls(): Unit =
      Files.writeString(Paths.get(s"$outDir/walls.json"),
        (Seq(s"${q("_mode")}: ${q(if (wallsOnly) "noop_build" else "dump_build")}") ++
          walls.map { case (n, (d, s, ds, ss)) =>
            s"${q(n)}: {${q("dump_sec")}: ${f3(d)}, ${q("serve_sec")}: ${f3(s)}, " +
              s"${q("dump_steal_cores")}: ${f3(ds)}, ${q("serve_steal_cores")}: ${f3(ss)}}"
          }).mkString("{", ", ", "}"))
    writeWalls()
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      names.filter(SparkEntry.oracleSql.contains)
        .map(n => s"${q(n)}: ${q(SparkEntry.oracleSql(n))}")
        .mkString("{", ", ", "}"))
    // provenance binding: carry the dataset fingerprint the outputs
    // were computed against, so sf1_validate.py can refuse a
    // mixed-generation compare (the round-13 staleness trap)
    val manifest = Paths.get(s"$sfDir/MANIFEST.json")
    if (Files.exists(manifest))
      Files.copy(manifest, Paths.get(s"$outDir/MANIFEST.json"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    spark.stop()
  }
}
