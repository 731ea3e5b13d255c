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
    for (name <- names) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      println(f"[qcheck] $name%-28s dumped in ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
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
