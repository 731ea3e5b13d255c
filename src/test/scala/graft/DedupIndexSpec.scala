package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, DedupIndex}

/** The at-rest MinHash band index: probe output must equal the
  * all-at-once LSH answer restricted to pairs touching the batch, and
  * appending a batch must make later batches collide with it.
  */
class DedupIndexSpec extends SparkSpecBase {

  private def docs = graft.core.Tables(spark, sf("sf0.001")).documents

  private def pairsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("probe equals the all-at-once answer restricted to the split") {
    val d = docs
    val all = pairsOf(Dedup.minhashLshPairs(d, "doc_id", "text"))
    assert(all.nonEmpty)
    val dir = java.nio.file.Files.createTempDirectory("dedupidx").toString
    DedupIndex.build(d.filter(col("doc_id") < 250), s"$dir/idx")
    val probed = pairsOf(DedupIndex.probePairs(spark, s"$dir/idx",
      batch = d.filter(col("doc_id") >= 250), texts = d))
    assert(probed == all.filter { case (_, j) => j >= 250 })

    val crossOnly = pairsOf(DedupIndex.probePairs(spark, s"$dir/idx",
      batch = d.filter(col("doc_id") >= 250), texts = d, withinBatch = false))
    assert(crossOnly == all.filter { case (i, j) => i < 250 && j >= 250 })
    assert(crossOnly.subsetOf(probed))
  }

  test("novelty probe equals the whole-corpus novelty restricted to the batch") {
    val d = docs
    val dir = java.nio.file.Files.createTempDirectory("novidx").toString
    DedupIndex.buildNovelty(d.filter(col("doc_id") < 250), s"$dir/idx", n = 8)
    val probed = DedupIndex.probeNovelty(spark, s"$dir/idx",
        d.filter(col("doc_id") >= 250))
      .orderBy(col("doc")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val full = Dedup.ngramNovelty(d, "doc_id", "text", n = 8)
      .filter(col("doc") >= 250)
      .orderBy(col("doc")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(probed.nonEmpty && probed.toSeq == full.toSeq,
      s"incremental novelty must equal the full recompute on the batch " +
        s"(${probed.length} vs ${full.length} rows)")
    // the contract is falsifiable: some batch doc must actually lose
    // novelty to the index (else the test only proves the trivial case)
    assert(probed.exists(r => r._3 < r._2),
      "fixture must contain a batch doc with index-owned grams")
  }

  test("append: a later batch collides with earlier appended batches") {
    val d = docs
    val all = pairsOf(Dedup.minhashLshPairs(d, "doc_id", "text"))
    // three-way split; sf0.001's planted pairs span all three regions
    val (c1, c2) = (200L, 350L)
    val expectB2 = all.filter { case (_, j) => j >= c2 }
    assert(expectB2.exists { case (i, _) => i < c1 }, "wants a corpus hit")
    assert(expectB2.exists { case (i, _) => i >= c1 && i < c2 },
      "wants a batch-1 hit (the append must matter)")
    val dir = java.nio.file.Files.createTempDirectory("dedupidx").toString
    DedupIndex.build(d.filter(col("doc_id") < c1), s"$dir/idx")
    DedupIndex.append(spark, s"$dir/idx",
      d.filter(col("doc_id") >= c1 && col("doc_id") < c2))
    val probed = pairsOf(DedupIndex.probePairs(spark, s"$dir/idx",
      batch = d.filter(col("doc_id") >= c2), texts = d))
    assert(probed == expectB2)
  }

  test("the stop-shingle list is frozen at build and applied at probe") {
    val s = spark
    import s.implicits._
    // Same discriminating corpus as DedupSpec's hot-shingle test: the
    // "common hot phrase" shingle has df=121 > maxDf=20 at BUILD time,
    // and the 1000/1001 near-dup pair (split across corpus and batch
    // here) also shares it. A probe that ignored the stored list would
    // count the hot shingle in the intersection and report 0.857
    // (12/14); a probe that recomputed df over only the visible texts
    // slice could drop below the threshold. The frozen list gives
    // exactly d2's answer: 10/12 = 0.833333.
    val corpus = ((0 until 120).map { i =>
      val tail = Seq.tabulate(12)(k => s"w${i}x$k").mkString(" ")
      (i.toLong, s"common hot phrase $tail")
    } :+ (1000L, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 common hot phrase"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (1001L, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 common hot phrase"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("dedupidx").toString
    DedupIndex.build(corpus, s"$dir/idx", maxDf = 20)
    val got = DedupIndex.probePairs(spark, s"$dir/idx", batch = batch,
        texts = corpus.unionByName(batch))
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((1000L, 1001L, 0.833333)), s"got $got")
  }

  test("probe derives the banding scheme from the index meta") {
    val d = docs
    val dir = java.nio.file.Files.createTempDirectory("dedupidx").toString
    DedupIndex.build(d.filter(col("doc_id") < 250), s"$dir/idx",
      n = 2, bands = 8, rows = 4)
    assert(DedupIndex.meta(spark, s"$dir/idx") == ((2, 8, 4, 100)))
    // 2-gram shingles at 8x4 banding: a DIFFERENT pair set than the
    // 3-gram default — matching it proves the probe read the scheme
    // from meta rather than assuming defaults.
    val expect = pairsOf(Dedup.minhashLshPairs(d, "doc_id", "text",
        n = 2, bands = 8, rows = 4))
      .filter { case (_, j) => j >= 250 }
    val probed = pairsOf(DedupIndex.probePairs(spark, s"$dir/idx",
      batch = d.filter(col("doc_id") >= 250), texts = d))
    assert(probed == expect)
  }
}
