package graft

import java.nio.file.{Files, Paths}

// quick dev check: dump only s7_semantic_dedup + its oracle for
// scripts/check_oracle.py, at an arbitrary sfDir
object S7Check {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 1) args(1) else "/tmp/s7out"
    val spark = core.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val name = "s7_semantic_dedup"
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    println(f"[s7check] dumped in ${(System.nanoTime()-t0)/1e9}%.2f s")
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      s"{${q(name)}: ${q(SparkEntry.oracleSql(name))}}")
    spark.stop()
  }
}
