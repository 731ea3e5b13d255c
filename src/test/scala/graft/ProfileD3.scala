package graft

import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.operators.Dedup

/** Dev profiler for d3's stages (run: `sbt "Test/runMain graft.ProfileD3"`). */
object ProfileD3 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local()
    val docs = graft.core.Tables(spark, dir).documents
    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    time("shingles")(Dedup.shingles(docs, "doc_id", "text", 3))
    time("signatures(128)")(Dedup.minhashSignatures(docs, "doc_id", "text", 3, 128))
    time("full d3")(Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 16, 8, 0.8))
    spark.stop()
  }
}
