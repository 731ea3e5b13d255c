package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding quantization for storage at scale: a 100 TB corpus's
  * float32 vectors are the single largest ANN-index input, and
  * symmetric per-vector int8 cuts them 4x with a bounded, auditable
  * reconstruction error (|err| <= scale/2 per element by construction
  * — QuantizeSpec asserts it). All pure per-row expression work: no
  * shuffle, rides the scan, codegen'd end to end.
  *
  * Determinism contract (what makes the audit oracle-able): every
  * element is CAST to double first (float->double is exact), the scale
  * is max|v|/127 (an order-free max, never a sum), and the rounding is
  * the explicit `floor(x/scale + 0.5)` — not the engine `round`, whose
  * tie-breaking differs between engines. Same formula, same doubles,
  * any engine.
  */
object Quantize {

  private def dbl(vecCol: String): Column =
    transform(col(vecCol), x => x.cast("double"))

  /** Adds `scale` (double) and `q` (array<int>, all in [-127, 127]):
    * q_i = floor(v_i/scale + 0.5). A zero vector quantizes to zeros at
    * scale 0 rather than dividing by it. Dequantize is q_i * scale.
    */
  def int8(df: DataFrame, vecCol: String): DataFrame = {
    val v = dbl(vecCol)
    val scale = array_max(transform(v, abs(_))) / lit(127.0)
    df.withColumn("scale", scale)
      .withColumn("q",
        when(col("scale") === 0.0,
          transform(dbl(vecCol), _ => lit(0)))
        .otherwise(transform(dbl(vecCol),
          x => floor(x / col("scale") + 0.5).cast("int"))))
  }

  /** The reconstruction audit over [[int8]]: per-vector quantized range
    * and the max absolute dequantization error — order-free maxima
    * only, so the numbers replay exactly on any engine.
    */
  def int8Audit(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = dbl(vecCol)
    val scale = array_max(transform(v, abs(_))) / lit(127.0)
    val err = (x: Column, s: Column) =>
      abs(x - floor(x / s + lit(0.5)) * s)
    // the raw scale must NOT be named "scale" here: the output select
    // aliases the rounded value "scale", and lateral column alias
    // resolution (default-on since Spark 3.4) would silently rebind the
    // error expressions to the ROUNDED scale — a ~1e-7 drift the hash
    // gate caught on first run
    df.select(col(idCol), v.as("v"), scale.as("s_raw"))
      .select(col(idCol),
        round(col("s_raw"), 9).as("scale"),
        size(col("v")).cast("long").as("n_dims"),
        when(col("s_raw") === 0.0, lit(0L)).otherwise(
          array_min(transform(col("v"),
            x => floor(x / col("s_raw") + 0.5))).cast("long")).as("qmin"),
        when(col("s_raw") === 0.0, lit(0L)).otherwise(
          array_max(transform(col("v"),
            x => floor(x / col("s_raw") + 0.5))).cast("long")).as("qmax"),
        when(col("s_raw") === 0.0, lit(0.0)).otherwise(
          round(array_max(transform(col("v"), x => err(x, col("s_raw")))), 9))
          .as("max_abs_err"))
  }

  // ---- Product quantization (PQ) ----
  //
  // The other half of the embedding-compression story: int8 (above)
  // cuts 4x per element; PQ cuts a D-dim float vector to m SUBSPACE
  // CODES (m bytes at k <= 256) — 32x for D=64/m=8 — and still
  // supports approximate scoring without decompression via ADC
  // (asymmetric distance computation): per query, an m×k table of
  // query-subvector · codeword dots; a corpus vector's approximate dot
  // is m table lookups. Jégou et al., "Product Quantization for
  // Nearest Neighbor Search", TPAMI 2011.

  /** Per-subspace codebooks: split the D dims into m contiguous
    * subspaces and train a k-codeword quantizer on each via the same
    * seed-pinned k-means the IVF coarse quantizer uses. Returns
    * m × k × (D/m) doubles — driver-side METADATA (m·k·D total, KBs),
    * the IvfIndex centroid-sidecar convention. D is read from one
    * bounded metadata row and must be divisible by m.
    */
  def pqCodebooks(vecs: DataFrame, m: Int, k: Int,
                  idCol: String = "vec_id", vecCol: String = "embedding",
                  maxIter: Int = 5): Seq[Seq[Seq[Double]]] = {
    val dim = vecs.select(size(col(vecCol)).as("n")).limit(1)
      .collect().headOption.map(_.getInt(0))
      .getOrElse(throw new IllegalArgumentException("pqCodebooks: empty input"))
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val sub = dim / m
    (0 until m).map { s =>
      Similarity.ivfCentroids(
        vecs.select(col(idCol),
          slice(dbl(vecCol), s * sub + 1, sub).as("__sv")),
        k, idCol, "__sv", maxIter)
    }
  }

  /** Encode every vector as its m nearest-codeword ids — one scan, all
    * per-row expression work (the nearestCell argmin per subspace),
    * codegen'd, no shuffle: `(idCol, codes array<int>)`.
    */
  def pqEncode(vecs: DataFrame, books: Seq[Seq[Seq[Double]]],
               idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame = {
    val sub = books.head.head.size
    vecs.select(col(idCol),
      array(books.zipWithIndex.map { case (book, s) =>
        Similarity.nearestCell(slice(dbl(vecCol), s * sub + 1, sub), book)
      }: _*).as("codes"))
  }

  /** Approximate top-k by ADC over PQ codes with exact re-rank: the
    * queries (small by the serving contract, like IvfIndex.probeTopK's)
    * broadcast with their m×k lookup tables computed in-plan as one
    * flat literal-dot array; the corpus-side scan then costs m
    * element_at lookups per (vector, query) — the canonical ADC scan,
    * broadcast-table, scan-riding, never a decompression. The top
    * `rerankDepth` candidates per query re-rank EXACTLY against the
    * raw vectors (one id join), so quantization error bounds recall,
    * never correctness of the emitted cosines: output is probeRank's
    * (qid, rank, neighbor_id, cosine) shape.
    */
  def pqAdcTopK(vecs: DataFrame, queries: DataFrame, m: Int, k: Int,
                topK: Int, rerankDepth: Int = 32,
                idCol: String = "vec_id", vecCol: String = "embedding",
                maxIter: Int = 5): DataFrame = {
    val books = pqCodebooks(vecs, m, k, idCol, vecCol, maxIter)
    val codes = pqEncode(vecs, books, idCol, vecCol)
      .withColumnRenamed(idCol, "neighbor_id")
    adcRank(codes, vecs, books, queries, k, topK, rerankDepth,
      idCol, vecCol)
  }

  /** The ADC scan + exact re-rank shared by the in-line [[pqAdcTopK]]
    * and the index-at-rest serving path ([[PqIndex.adcTopK]]) — the
    * Similarity.probeRank convention. `codes` carries
    * (neighbor_id, codes); `raw` the uncompressed vectors for the
    * re-rank.
    */
  private[operators] def adcRank(codes: DataFrame, raw: DataFrame,
                                 books: Seq[Seq[Seq[Double]]],
                                 queries: DataFrame, k: Int, topK: Int,
                                 rerankDepth: Int,
                                 idCol: String, vecCol: String): DataFrame = {
    require(rerankDepth >= topK, "rerankDepth must cover topK")
    val m = books.size
    val sub = books.head.head.size
    // flat m·k ADC table per query row: tbl[s*k + c] = q_s · book_s[c]
    val tbl = array((for (s <- 0 until m; c <- 0 until k) yield
      Similarity.dot(slice(dbl(vecCol), s * sub + 1, sub),
        typedLit(books(s)(c)))): _*)
    val probes = queries.select(col(idCol).as("qid"),
      dbl(vecCol).as("qv"), tbl.as("__tbl"))
    val approx = codes.join(broadcast(probes))
      .filter(col("neighbor_id") =!= col("qid"))
      .withColumn("__adc",
        expr(s"aggregate(transform(sequence(0, ${m - 1}), s -> " +
          s"element_at(__tbl, s * $k + element_at(codes, s + 1) + 1)), " +
          "0D, (a, x) -> a + x)"))
    val wa = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("__adc").desc, col("neighbor_id"))
    val cand = approx
      .withColumn("__arank", row_number().over(wa))
      .filter(col("__arank") <= rerankDepth)
      .select(col("qid"), col("qv"), col("neighbor_id"))
    val we = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cos").desc, col("neighbor_id"))
    cand
      .join(raw.select(col(idCol).as("neighbor_id"), dbl(vecCol).as("v")),
        "neighbor_id")
      .select(col("qid"), col("neighbor_id"),
        Similarity.cosine(col("qv"), col("v")).as("cos"))
      .withColumn("rank", row_number().over(we).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("qid"), col("rank"), col("neighbor_id"),
        round(col("cos"), 4).as("cosine"))
  }
}
