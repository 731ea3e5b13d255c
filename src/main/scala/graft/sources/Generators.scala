package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic synthetic-data generators mirroring the reference's
  * scripts (SURVEY §2.1 S12) — with pinned seeds, which the reference's
  * `gen_condorcet_data.py` notably lacks.
  */
object Generators {

  /** The reference's wordcount blowup input (`mp3/src/trees/gen_file.py`):
    * a sentence repeated n times with NO separator, so the last word of
    * one copy and the first word of the next concatenate into a merged
    * token. The golden output `output/part-00000` is the wordcount of
    * exactly this string at n = 2·2^20.
    */
  def repeatedSentence(sentence: String, n: Int): String = sentence * n

  /** Closed-form wordcount of `repeatedSentence(sentence, n)`:
    * the first word stands alone only in copy 1, the last word only in
    * copy n, interior words appear n times, and the merged
    * `last+first` token appears n−1 times.
    */
  def repeatedSentenceCounts(sentence: String, n: Long): Map[String, Long] = {
    val ws = sentence.trim.split("\\s+").toSeq
    require(ws.size >= 2 && n >= 1)
    val (first, last) = (ws.head, ws.last)
    val merged = last + first
    val base = scala.collection.mutable.Map.empty[String, Long]
    def add(w: String, c: Long): Unit = base(w) = base.getOrElse(w, 0L) + c
    ws.tail.init.foreach(add(_, n)) // interior words: every copy
    add(first, 1); add(last, 1)
    if (n > 1) add(merged, n - 1)
    base.toMap
  }

  /** Ranked Condorcet ballots, one CSV line per ballot, deterministic
    * per row id (seed ⊕ id) so the output is identical under any
    * partitioning — distributed, O(rows/partitions) per task.
    */
  def ballots(spark: SparkSession, n: Long, candidates: Seq[String],
              seed: Long = 42L): Dataset[String] = {
    import spark.implicits._
    val cands = candidates.toVector
    spark.range(n).map { i =>
      new scala.util.Random(seed ^ i).shuffle(cands).mkString(",")
    }
  }
}
