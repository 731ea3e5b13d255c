package graft

import org.apache.spark.sql.functions._

import graft.core.GraftSession

/** Dev probe (Test scope, like S3Check): m9's candidate-volume
  * accounting at a given sf dir — bucket skew, raw candidate pairs,
  * distinct pairs, final output. The d12-style selectivity series that
  * predicts wall time before timing does.
  */
object M9Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val base = "((doc_id div 3 + 13) * (j * j + 71) * " +
      "(j + doc_id div 3 + 7)) % 251"
    val thumbs = graft.core.Tables(spark, dir).documents.select(col("doc_id"),
      expr(s"""transform(sequence(0, 63), j ->
              |  CASE WHEN doc_id % 3 = 2 AND j < 5 THEN ($base + 128) % 251
              |       ELSE $base + IF(doc_id % 3 = 1, 17, 0)
              |  END)""".stripMargin).as("px"))
    val fp = graft.operators.Multimodal.aHash(thumbs, "doc_id", "px")
      .persist()
    val buckets = fp.select(col("doc_id").as("id"),
      posexplode(col("blocks")).as(Seq("bpos", "bval")))
    println("top buckets:")
    buckets.groupBy(col("bpos"), col("bval")).count()
      .orderBy(desc("count")).show(12)
    val cand = buckets.as("x").join(buckets.as("y"),
      col("x.bpos") === col("y.bpos") && col("x.bval") === col("y.bval") &&
        col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
    val raw = cand.count()
    val dis = cand.distinct().count()
    println(s"raw=$raw distinct=$dis")
    fp.unpersist()
    // shipped-path wall time (the number BENCH reports)
    for (i <- 1 to 2) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = graft.operators.Multimodal
        .ahashNearDupPairs(thumbs, "doc_id", "px", maxDist = 7).count()
      println(s"shipped pass $i: ${(System.nanoTime() - t0) / 1e9}s pairs=$n")
    }
    spark.stop()
  }
}
