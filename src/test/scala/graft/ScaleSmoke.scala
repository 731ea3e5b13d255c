package graft

import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.operators.{Dedup, Similarity}

/** Dev scale-smoke (run: `sbt "Test/runMain graft.ScaleSmoke [mult]"`):
  * unions the sf0.1 corpus `mult` times with offset ids (default 10x →
  * ~50k docs / ~10k embeddings per table replica) and times the
  * heaviest operators, to observe scaling behavior beyond the driver's
  * test sizes. Row counts scale linearly; near-dup pair counts scale
  * with the planted structure (each replica contributes its own pairs;
  * cross-replica EXACT copies also pair up).
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val t = graft.core.Tables(spark, dir)
    val docs = (0 until mult).map { r =>
      t.documents.select((col("doc_id") + lit(r * 1000000L)).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars"))
    }.reduce(_ union _)
    val emb = (0 until mult).map { r =>
      t.embeddings.select((col("vec_id") + lit(r * 1000000L)).as("vec_id"),
        col("embedding"))
    }.reduce(_ union _)
    println(s"docs=${docs.count()} embeddings=${emb.count()}")
    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
      spark.catalog.clearCache()
    }
    time("d1 exact")(Dedup.exact(docs, "doc_id", "text").count())
    time("d2 ngram jaccard")(Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      3, 0.8, maxDf = 100 * mult).count())
    time("d3 minhash lsh")(Dedup.minhashLshPairs(docs, "doc_id", "text",
      3, 16, 8, 0.8, maxDf = 100 * mult).count())
    time("d4 simhash")(Dedup.simhashPairs(docs, "doc_id", "text", 3).count())
    time("s3 cosine neardup")(Similarity.cosineNearDupPairs(emb, 0.9).count())
    time("s2 lsh topk")(Similarity.lshTopK(emb,
      emb.filter(col("vec_id") < 10), 5).count())
    spark.stop()
  }
}
