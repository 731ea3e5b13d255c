package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Context-window chunking: split each document into fixed-size token
  * windows with overlap (`stride` < `chunkTokens` tokens of fresh text
  * per chunk, the rest carried over) — how a pipeline prepares
  * documents longer than the model's context for embedding or training
  * while preserving cross-boundary context. The complement of
  * [[SequencePack]] (which packs SHORT documents into full windows).
  *
  * Purely row-local: one tokenize, one bounded explode (≤ ⌈n/stride⌉
  * chunks per doc), no shuffle at all — at 100 TB this runs at scan
  * speed and the output stays partitioned like its input, so a
  * downstream embed/write stage needs no exchange either. Chunk
  * geometry is closed-form per (n, chunkTokens, stride):
  * `1 + max(0, ⌈(n − chunkTokens)/stride⌉)` chunks starting at
  * `1 + chunk_id·stride`; the last chunk may be short but never empty,
  * and every token is covered (guaranteed by stride ≤ chunkTokens).
  */
object Chunking {

  /** `(doc, chunk_id, start_tok, n_tokens, chunk_text)` — one row per
    * window, chunk_id 0-based, start_tok 1-based, deterministic text
    * reassembly with single spaces. Empty documents emit no row.
    */
  def chunkDocs(df: DataFrame, chunkTokens: Int = 32, stride: Int = 24,
                idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(stride >= 1 && stride <= chunkTokens,
      "stride must be in [1, chunkTokens] so chunks cover every token")
    val toks = df
      .select(col(idCol).as("doc"),
        TextAnalysis.words(col(textCol)).as("ws"))
      .withColumn("n", size(col("ws")))
      .filter(col("n") >= 1)
    toks
      .withColumn("nchunks",
        when(col("n") <= chunkTokens, lit(1))
          .otherwise(expr(s"(n - $chunkTokens + ${stride - 1}) div $stride + 1")))
      .select(col("doc"), col("ws"), col("n"),
        explode(sequence(lit(0), col("nchunks") - 1)).as("cid"))
      .withColumn("start", col("cid") * stride + 1)
      .withColumn("len", least(lit(chunkTokens), col("n") - col("start") + 1))
      .select(col("doc"),
        col("cid").cast("long").as("chunk_id"),
        col("start").cast("long").as("start_tok"),
        col("len").cast("long").as("n_tokens"),
        array_join(slice(col("ws"), col("start"), col("len")), " ")
          .as("chunk_text"))
  }
}
