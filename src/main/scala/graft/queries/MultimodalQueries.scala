package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{CatalogQuery, QueryModule, Tables}
import graft.operators.Multimodal

/** Multimodal plumbing over a binary column derived from `documents`
  * (the testdata ships no media files, so text bytes stand in as the
  * blobs). The full pipeline — binary column → typed Blob → partition-
  * batched decode → features — runs for real; only the decoder itself
  * is the stub. Because the stub's features are byte arithmetic and the
  * text is ASCII (byte == codepoint), DuckDB can replay the whole
  * pipeline exactly.
  */
object MultimodalQueries extends QueryModule {

  private val features = CatalogQuery(
    "m1_multimodal_features",
    (s: SparkSession, dir: String) => {
      val docs = Tables(s, dir).documents
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("content"))
      val blobs = Multimodal.asBlobs(docs, "doc_id", "content")
      Multimodal.extractFeatures(blobs, Multimodal.StubDecoder)
        .toDF()
        .select(col("blob_id"), col("modality"), col("n_bytes"),
          col("byte_sum"), round(col("mean_byte"), 4).as("mean_byte"),
          col("frames").cast("long").as("frames"))
        .orderBy(col("blob_id"))
    },
    Some("""WITH bytes AS (
           |  SELECT doc_id AS blob_id,
           |    list_transform(list_filter(string_split(text, ''), c -> c <> ''),
           |                   c -> CAST(unicode(c) AS BIGINT)) AS bs
           |  FROM documents)
           |SELECT blob_id, 'text' AS modality,
           |  CAST(len(bs) AS BIGINT) AS n_bytes,
           |  list_reduce(bs, (a, b) -> (a + b) % 1000000007) AS byte_sum,
           |  round(list_sum(bs)*1.0/len(bs), 4) AS mean_byte,
           |  CAST(len(bs)//1024 + 1 AS BIGINT) AS frames
           |FROM bytes ORDER BY blob_id""".stripMargin),
    doc = "Binary-column blob pipeline with partition-batched (stub) " +
      "decode; byte-arithmetic features replayed exactly by DuckDB")

  override def queries: Seq[CatalogQuery] = Seq(features)
}
