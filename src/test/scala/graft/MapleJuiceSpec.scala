package graft

import org.apache.spark.sql.functions._

import graft.mapreduce._

/** Differential tests for the Maple/Juice surface — the comparison the
  * reference itself runs between MapleJuice and Hadoop Streaming
  * (`mp3/src/hadoop_*`): the API forms must agree with the pure
  * DataFrame forms and with each other under both partitioners.
  */
class MapleJuiceSpec extends SparkSpecBase {

  private def lines = {
    val s = spark
    import s.implicits._
    graft.core.Tables(s, sf("sf0.001")).documents.select($"text").as[String]
  }

  private def dataframeWordcount: Map[String, Long] = {
    val s = spark
    import s.implicits._
    graft.core.Tables(s, sf("sf0.001")).documents
      .select(explode(split($"text", "\\s+")).as("w"))
      .filter($"w" =!= "")
      .groupBy($"w").count()
      .as[(String, Long)].collect().toMap
  }

  test("hash-partitioned MapleJuice wordcount matches the DataFrame form") {
    val got = MapleJuiceJob
      .run(lines, Workloads.WordCountMaple, Workloads.WordCountJuice, 4, HashPartition)
      .collect().map { case (k, v) => k -> v.toLong }.toMap
    assert(got == dataframeWordcount)
  }

  test("range-partitioned MapleJuice wordcount matches the DataFrame form") {
    val got = MapleJuiceJob
      .run(lines, Workloads.WordCountMaple, Workloads.WordCountJuice, 4, RangePartition)
      .collect().map { case (k, v) => k -> v.toLong }.toMap
    assert(got == dataframeWordcount)
  }

  test("range partitioning yields disjoint, contiguous key ranges") {
    val s = spark
    import s.implicits._
    val kv = lines.flatMap(Workloads.WordCountMaple.maple(_))
      .repartitionByRange(4, col("_1"))
    val ranges = kv.rdd
      .mapPartitionsWithIndex { (p, it) =>
        val ks = it.map(_._1).toSeq
        if (ks.isEmpty) Iterator.empty
        else Iterator((p, ks.min, ks.max))
      }.collect().sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, _, prevMax), (_, nextMin, _)) =>
        assert(prevMax <= nextMin, s"overlapping ranges: $prevMax > $nextMin")
      case _ =>
    }
  }

  test("hash partitioning co-locates every key in exactly one partition") {
    val s = spark
    import s.implicits._
    val kv = lines.flatMap(Workloads.WordCountMaple.maple(_))
      .repartition(4, col("_1"))
    val partsPerKey = kv.rdd
      .mapPartitionsWithIndex((p, it) => it.map(kvp => (kvp._1, p)))
      .distinct().collect().groupBy(_._1).view.mapValues(_.length)
    assert(partsPerKey.values.forall(_ == 1))
  }

  test("pipe runner reproduces wordcount through shell executables") {
    val mapper = Seq("awk", "{for(i=1;i<=NF;i++) print $i\",1\"}")
    // key-grouped sum over sorted k\tv lines (Hadoop Streaming reducer)
    val reducer = Seq("awk", "-F", "\t",
      "{ if ($1 != k && NR > 1) { print k\"\\t\"c }; if ($1 != k) { k=$1; c=0 }; c+=$2 } END { if (NR > 0) print k\"\\t\"c }")
    val got = MapleJuiceJob.runPipe(lines, mapper, reducer, 4)
      .collect().map { case (k, v) => k -> v.toLong }.toMap
    assert(got == dataframeWordcount)
  }

  test("wine workload through the API matches the DataFrame form") {
    val s = spark
    import s.implicits._
    val docs = graft.core.Tables(s, sf("sf0.001")).documents
    val csvLines = docs
      .select(concat_ws(",", $"lang", $"source", $"text")).as[String]
    val api = MapleJuiceJob
      .run(csvLines, Workloads.WineMaple, Workloads.WordCountJuice, 4)
      .collect().map { case (k, v) => k -> v.toLong }.toMap
    val df = docs.filter($"lang" === "en")
      .select($"source", explode(split($"text", "\\s+")).as("w"))
      .filter($"w" === "hash")
      .groupBy($"source").count()
      .as[(String, Long)].collect().toMap
    assert(api == df)
  }

  test("two-phase Condorcet through the API finds the planted winner") {
    val s = spark
    import s.implicits._
    // 3 candidates a,b,c: a beats b (2/3), a beats c (2/3), b beats c (2/3)
    val ballots = Seq("a,b,c", "a,c,b", "b,c,a").toDS()
    val phase1 = MapleJuiceJob.run(ballots,
      Workloads.CondorcetMaple1, Workloads.CondorcetJuice1, 2)
    val pairLines = phase1.map { case (k, _) => k }
    val phase2 = MapleJuiceJob.run(pairLines,
      Workloads.CondorcetMaple2, new Workloads.CondorcetJuice2(3), 1)
      .collect().toMap
    assert(phase2("a") == "2,condorcet_winner")
    assert(phase2("b") == "1,loser")
    assert(!phase2.contains("c")) // zero pairwise wins, like the reference
  }

  test("compat Condorcet juice reproduces the reference's exact output strings") {
    val s = spark
    import s.implicits._
    def phase2(ballots: Seq[String]): Map[String, String] = {
      val p1 = MapleJuiceJob.run(ballots.toDS(),
        Workloads.CondorcetMaple1, Workloads.CondorcetJuice1, 2)
      MapleJuiceJob.run(p1.map(_._1),
        Workloads.CondorcetMaple2, new Workloads.CondorcetJuice2Compat(3), 1)
        .collect().toMap
    }
    // candidate 0 beats 1 and 2; 1 beats 2 → 0 is the Condorcet winner
    assert(phase2(Seq("0,1,2", "0,2,1", "1,0,2")) ==
      Map("0" -> " is the condorcet winner!"))
    // rock-paper-scissors cycle → trailing-comma max-win set, no winner
    assert(phase2(Seq("0,1,2", "1,2,0", "2,0,1")) ==
      Map("0,1,2," -> " have the highest condorcet counts, no winner."))
  }

  test("writeTsv emits k<TAB>v lines") {
    val s = spark
    import s.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-tsv").toString
    MapleJuiceJob.writeTsv(Seq(("k1", "v1"), ("k2", "v2")).toDS(), out, coalesce1 = true)
    val lines = spark.read.textFile(out).collect().sorted
    assert(lines.toSeq == Seq("k1\tv1", "k2\tv2"))
  }
}
