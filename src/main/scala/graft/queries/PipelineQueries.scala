package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{CatalogQuery, QueryModule, Tables}
import graft.operators.{CorpusMix, SequencePack, Skew}

/** Catalog entries for the corpus-assembly operators — the steps
  * between a cleaned corpus and a training run: mixing weights +
  * held-out splits (CorpusMix) and context-window packing
  * (SequencePack). Both are exactly deterministic (keyed hashes, a
  * prefix sum), so both carry full DuckDB oracles.
  */
object PipelineQueries extends QueryModule {

  /** Mixing rates chosen to exercise every code path: downsample
    * (en/zh/de/fr at distinct rates) and the rate>=1 sentinel (es).
    */
  private val mixRates = Map(
    "en" -> 0.5, "zh" -> 0.25, "es" -> 1.0, "de" -> 0.125, "fr" -> 0.75)

  private val mix = CatalogQuery(
    "x1_corpus_mix",
    (s: SparkSession, dir: String) => {
      val kept = CorpusMix.stratifiedSample(
        Tables(s, dir).documents, "doc_id", "lang", mixRates)
      CorpusMix.withSplit(kept, "doc_id")
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("lang"), col("split"))
    },
    Some("""WITH kept AS (
           |  SELECT * FROM documents
           |  WHERE substr(md5(concat('mix1:', CAST(doc_id AS VARCHAR))), 1, 8) <
           |    CASE lang WHEN 'en' THEN '80000000' WHEN 'zh' THEN '40000000'
           |              WHEN 'es' THEN 'g' WHEN 'de' THEN '20000000'
           |              WHEN 'fr' THEN 'c0000000' ELSE '00000000' END),
           |sp AS (
           |  SELECT lang,
           |    CASE WHEN substr(md5(concat('split:', CAST(doc_id AS VARCHAR))), 1, 8)
           |              < 'cccccccc' THEN 'train'
           |         WHEN substr(md5(concat('split:', CAST(doc_id AS VARCHAR))), 1, 8)
           |              < 'e6666666' THEN 'val'
           |         ELSE 'test' END AS split
           |  FROM kept)
           |SELECT lang, split, count(*) AS n_docs
           |FROM sp GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    doc = "Deterministic hash-keyed stratified corpus mix + 80/10/10 split")

  private val pack = CatalogQuery(
    "x2_sequence_packing",
    (s: SparkSession, dir: String) => {
      val toks = Tables(s, dir).documents.select(
        col("doc_id"),
        graft.operators.TextAnalysis.wordCount(col("text")).as("n_tokens"))
      SequencePack.withPackAssignment(toks, "doc_id", "n_tokens",
          maxTokens = 2048)
        .select(col("doc_id").as("doc"), col("n_tokens"),
          col("start_tok"), col("pack_id"), col("n_boundary_crossings"))
        .orderBy(col("doc"))
    },
    Some("""WITH tk AS (
           |  SELECT doc_id,
           |    CAST(len(list_filter(string_split_regex(text,'\s+'), w -> w <> ''))
           |         AS BIGINT) AS n_tokens
           |  FROM documents),
           |c AS (
           |  SELECT doc_id, n_tokens,
           |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |      AS BIGINT) AS start_tok
           |  FROM tk)
           |SELECT doc_id AS doc, n_tokens, start_tok,
           |  CAST(start_tok // 2048 AS BIGINT) AS pack_id,
           |  CAST(CASE WHEN n_tokens = 0 THEN 0
           |       ELSE (start_tok + n_tokens - 1) // 2048 - start_tok // 2048
           |       END AS BIGINT) AS n_boundary_crossings
           |FROM c ORDER BY doc""".stripMargin),
    doc = "Context-window packing via distributed prefix sum " +
      "(range partition + per-partition offsets, no global window)")

  /** The salted two-stage aggregate, driver-checked: until round 5 its
    * "equals the plain groupBy" contract lived only in a spec. The
    * l_returnflag key is the engine's most skewed grouping (3 keys over
    * the whole fact table — every row is a hot-key row). Sums stay in
    * exactly-representable territory (a count, and l_quantity which is
    * integral-valued), so the two-stage summation order cannot drift
    * vs the oracle's single-pass sum.
    */
  private val saltedAgg = CatalogQuery(
    "x3_salted_agg",
    (s: SparkSession, dir: String) => {
      Skew.saltedSum(Tables(s, dir).lineitem, "l_returnflag",
          saltBuckets = 32,
          aggs = Map("n_rows" -> lit(1L), "sum_qty" -> col("l_quantity")))
        .select(col("l_returnflag"), col("n_rows").cast("long").as("n_rows"),
          col("sum_qty").cast("long").as("sum_qty"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag,
           |  CAST(count(*) AS BIGINT) AS n_rows,
           |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty
           |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin),
    doc = "Two-stage salted hot-key aggregation vs the plain groupBy oracle")

  /** The permutation itself is the contract: the oracle recomputes the
    * exact md5-keyed order with a row_number window (fine at oracle
    * scale), while the engine side ranks via the distributed prefix
    * sum — so a wrong position anywhere flips the row red.
    */
  private val shuffle = CatalogQuery(
    "x4_corpus_shuffle",
    (s: SparkSession, dir: String) =>
      CorpusMix.withShufflePosition(Tables(s, dir).documents, "doc_id")
        .select(col("doc_id").as("doc"), col("shuffle_pos"))
        .orderBy(col("doc")),
    Some("""SELECT doc_id AS doc,
           |  CAST(row_number() OVER (ORDER BY
           |    substr(md5(concat('shuf1:', CAST(doc_id AS VARCHAR))), 1, 8)
           |      || '-' || CAST(doc_id AS VARCHAR)) - 1 AS BIGINT)
           |    AS shuffle_pos
           |FROM documents ORDER BY doc""".stripMargin),
    doc = "Deterministic global corpus shuffle: reproducible keyed-hash " +
      "training order via distributed prefix sum, no global window")

  private val sourceCap = CatalogQuery(
    "x5_source_cap",
    (s: SparkSession, dir: String) =>
      CorpusMix.capPerStratum(Tables(s, dir).documents, "doc_id", "source",
          k = 10)
        .select(col("doc_id").as("doc"), col("source"), col("cap_rank"))
        .orderBy(col("doc")),
    Some("""WITH r AS (
           |  SELECT doc_id, source,
           |    row_number() OVER (PARTITION BY source ORDER BY
           |      substr(md5(concat('cap1:', CAST(doc_id AS VARCHAR))), 1, 8),
           |      doc_id) AS rk
           |  FROM documents)
           |SELECT doc_id AS doc, source, CAST(rk AS BIGINT) AS cap_rank
           |FROM r WHERE rk <= 10 ORDER BY doc""".stripMargin),
    doc = "Per-source document cap (k=10 by keyed hash): no source " +
      "dominates the mix; kept set is stable and nested in k")

  override def queries: Seq[CatalogQuery] =
    Seq(mix, pack, saltedAgg, shuffle, sourceCap)
}
