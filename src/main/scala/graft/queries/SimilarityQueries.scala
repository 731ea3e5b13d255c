package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{CatalogQuery, QueryModule, Tables}
import graft.operators.Similarity

/** Catalog entries for similarity search over `embeddings`. The exact
  * brute-force top-k is replayed verbatim by DuckDB's
  * list_cosine_similarity (both sides computed in double); the LSH and
  * IVF variants depend on engine-seeded hyperplanes / k-means cells,
  * so they get rows-only checks here and are validated against the
  * brute-force ranking in SimilaritySpec.
  */
object SimilarityQueries extends QueryModule {

  private def emb(s: SparkSession, dir: String) = Tables(s, dir).embeddings

  /** Deterministic near-duplicate copies of the corpus: component i of
    * vector id gets `+0.04·sin(7·id + i)` — on these unit vectors that
    * lands the copy at cosine ≈0.97 from its source. The testdata
    * embeddings are near-orthogonal noise (top-5 cosines ~0.3), so ANN
    * demos need a corpus that actually CONTAINS near neighbors; ids are
    * offset by 1_000_000 to keep the pairing explicit.
    */
  private def perturbed(e: org.apache.spark.sql.DataFrame) =
    e.select((col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding").cast("array<double>"),
        (x, i) => x + lit(0.04) * sin(col("vec_id") * 7 + i)).as("embedding"))

  private val brute = CatalogQuery(
    "s1_cosine_topk",
    (s, dir) => {
      val e = emb(s, dir)
      Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 10), k = 5)
        .orderBy(col("qid"), col("rank"))
    },
    Some("""WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
           |           FROM embeddings WHERE vec_id < 10),
           |scored AS (
           |  SELECT qid, e.vec_id AS neighbor_id,
           |         list_cosine_similarity(qv, CAST(e.embedding AS DOUBLE[])) AS cos
           |  FROM q, embeddings e WHERE e.vec_id <> qid),
           |ranked AS (
           |  SELECT qid, neighbor_id, cos,
           |         CAST(row_number() OVER (PARTITION BY qid
           |                ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
           |  FROM scored)
           |SELECT qid, rank, neighbor_id, round(cos, 4) AS cosine
           |FROM ranked WHERE rank <= 5 ORDER BY qid, rank""".stripMargin),
    doc = "Exact cosine top-5 neighbors for 10 query vectors; broadcast " +
      "query set, one corpus pass")

  private val lsh = CatalogQuery(
    "s2_ann_lsh_topk",
    (s, dir) => {
      val e = emb(s, dir)
      Similarity.lshTopK(e, perturbed(e.filter(col("vec_id") < 10)), k = 5)
        .orderBy(col("qid"), col("rank"))
    },
    None, // seeded-hyperplane-dependent; rank-1 must recover each
          // query's source vector — asserted in SimilaritySpec.
    doc = "Approximate top-5 via 8-table 12-bit hyperplane LSH with " +
      "exact re-rank; queries are perturbed copies (cos~0.97) of corpus " +
      "vectors, so rank-1 should recover the source")

  private val nearDup = CatalogQuery(
    "s3_cosine_neardup",
    (s, dir) => {
      val e = emb(s, dir)
      val base = e.select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      Similarity.cosineNearDupPairs(base.union(perturbed(e)), threshold = 0.9)
        .orderBy(col("i"), col("j"))
    },
    None, // ditto; pair recall vs the planted copies tested in spec.
    doc = "Embedding near-dup pairs (cosine >= 0.9) over corpus + " +
      "planted copies, via LSH bucket collisions")

  private val ivf = CatalogQuery(
    "s4_ann_ivf_topk",
    (s, dir) => {
      val e = emb(s, dir)
      // maxIter 5: k-means on these near-orthogonal vectors converges
      // almost immediately, and IVF recall here comes from the query
      // landing in its source's cell (cos ~0.97 proximity), not from
      // centroid polish — training is the query's dominant cost
      Similarity.ivfTopK(e, perturbed(e.filter(col("vec_id") < 10)), k = 5,
          nlist = 16, nprobe = 4, maxIter = 5)
        .orderBy(col("qid"), col("rank"))
    },
    None, // k-means-trained cells are engine-specific; rank-1 source
          // recovery + cosine agreement asserted in SimilaritySpec.
    doc = "Approximate top-5 via an IVF inverted-file index (16-cell " +
      "k-means quantizer, 4-cell probe, exact re-rank); same perturbed " +
      "query harness as s2")

  override def queries: Seq[CatalogQuery] = Seq(brute, lsh, nearDup, ivf)
}
