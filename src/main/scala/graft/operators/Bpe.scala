package graft.operators

import java.util.regex.{Matcher, Pattern}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Byte-pair-encoding merge learning — the tokenizer-training stage of
  * an LLM data pipeline (Sennrich et al. 2016, public literature):
  * repeatedly find the most frequent adjacent symbol pair across the
  * corpus and fuse it into one symbol.
  *
  * Distribution shape: BPE trains on the WORD-FREQUENCY table, not raw
  * text — the corpus-sized work is one tokenize + groupBy(word) pass;
  * every merge iteration then runs over the vocabulary relation
  * (orders of magnitude smaller, and shrinking as merges fuse
  * symbols). Per iteration: one pair explode + hash aggregate + a
  * 1-row argmax to the driver (bounded by construction, the IVF
  * centroid pattern), then one codegen'd literal replace over the
  * vocabulary. Lineage is cut per iteration by persist/unpersist so
  * plans stay constant-size.
  *
  * Determinism contract (what the DuckDB oracle replays exactly):
  * symbols are space-joined inside a space-padded representation, the
  * argmax tie-breaks lexicographically on the pair, and a merge is a
  * LITERAL left-to-right non-overlapping replace of " a b " with
  * " ab " — Java's regex global replace and DuckDB's replace() share
  * that scan rule, so "a a a" fuses to "aa a" on both engines.
  */
object Bpe {

  /** Hard cap on `nMerges`: each merge is one Spark job plus ONE 1-row
    * driver collect, strictly sequential (merge i+1's pair counts
    * depend on merge i's fused vocabulary — the algorithm's data
    * dependence, not an implementation shortcut). The cap makes the
    * driver-roundtrip cost contract explicit: at ~0.1-1 s of scheduling
    * per round, 2000 merges is already hours of wall clock on a busy
    * cluster, and a 50k-merge production vocabulary should be learned
    * with a dedicated tokenizer-training run, not this relation-per-
    * round loop.
    */
  val MaxMerges = 2000

  /** The first `nMerges` learned merges as (iter, pair, freq) — iter
    * is 1-based rank, pair the space-separated symbol pair, freq its
    * corpus frequency at the time of the merge.
    *
    * COST CONTRACT: runtime is `nMerges` SEQUENTIAL Spark jobs (pair
    * count + argmax each), i.e. O(nMerges) driver round-trips that no
    * amount of executors parallelizes away; `nMerges` is validated
    * against [[MaxMerges]] up front so a runaway vocabulary size fails
    * in milliseconds instead of scheduling thousands of jobs.
    */
  def learnMerges(docs: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    require(nMerges <= MaxMerges,
      s"nMerges = $nMerges exceeds MaxMerges = $MaxMerges: each merge is " +
        "a sequential Spark job + driver round-trip (see the cost " +
        "contract); learn large vocabularies in a dedicated run")
    val spark = docs.sparkSession
    // word-frequency table → padded space-joined char representation
    var reprs = docs
      .select(explode(split(col(textCol), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(concat(lit(" "),
        regexp_replace(col("w"), "(.)", "$1 ")).as("repr"), col("freq"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val merges = Seq.newBuilder[(Int, String, Long)]
    for (i <- 1 to nMerges) {
      val l = split(trim(col("repr")), " ")
      val pairs = reprs.select(col("freq"),
          explode(when(size(l) > 1,
            transform(sequence(lit(1), size(l) - 1),
              k => concat_ws(" ", element_at(l, k), element_at(l, k + 1))))
            .otherwise(array().cast("array<string>"))).as("pair"))
        .groupBy(col("pair")).agg(sum(col("freq")).as("f"))
      // 1-row argmax with a total tie-break — the only driver-side
      // collect, bounded at one row per iteration
      val best = pairs.orderBy(col("f").desc, col("pair")).limit(1).collect()
      if (best.isEmpty) return result(spark, merges.result())
      val (pair, f) = (best(0).getString(0), best(0).getLong(1))
      merges += ((i, pair, f))
      val next = reprs.select(
          regexp_replace(col("repr"),
            lit(Pattern.quote(s" $pair ")),
            lit(Matcher.quoteReplacement(s" ${pair.replace(" ", "")} ")))
            .as("repr"),
          col("freq"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count() // materialize before dropping the previous vocabulary
      reprs.unpersist()
      reprs = next
    }
    reprs.unpersist()
    result(spark, merges.result())
  }

  private def result(spark: SparkSession,
                     merges: Seq[(Int, String, Long)]): DataFrame = {
    import spark.implicits._
    merges.toDF("iter", "pair", "freq")
      .select(col("iter").cast("long").as("iter"), col("pair"), col("freq"))
  }
}
