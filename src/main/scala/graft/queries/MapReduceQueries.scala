package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{CatalogQuery, QueryModule, Tables}
import graft.mapreduce.{HashPartition, MapleJuiceJob, RangePartition, Workloads}

/** Wordcount run through the Maple/Juice API with both partition
  * strategies, checked against the SAME DuckDB oracle as the pure
  * DataFrame wordcount (p1) — a three-way differential: DataFrame vs
  * hash-MapleJuice vs range-MapleJuice vs DuckDB.
  */
object MapReduceQueries extends QueryModule {

  private val wordcountOracle =
    """SELECT word, count(*) AS n_occurrences
      |FROM (SELECT unnest(string_split_regex(text, '\s+')) AS word
      |      FROM documents)
      |WHERE word <> ''
      |GROUP BY word ORDER BY word""".stripMargin

  private def run(s: SparkSession, dir: String,
                  strategy: graft.mapreduce.PartitionStrategy): DataFrame = {
    import s.implicits._
    val lines = Tables(s, dir).documents.select($"text").as[String]
    MapleJuiceJob
      .run(lines, Workloads.WordCountMaple, Workloads.WordCountJuice,
        numPartitions = s.sparkContext.defaultParallelism, strategy)
      .select($"_1".as("word"), $"_2".cast("long").as("n_occurrences"))
      .orderBy($"word")
  }

  override def queries: Seq[CatalogQuery] = Seq(
    CatalogQuery(
      "mj1_wordcount_hash",
      (s, dir) => run(s, dir, HashPartition),
      Some(wordcountOracle),
      doc = "Wordcount via the Maple/Juice API, hash partitioner " +
        "(mp3/src/partition.go:29-38 semantics)"),
    CatalogQuery(
      "mj2_wordcount_range",
      (s, dir) => run(s, dir, RangePartition),
      Some(wordcountOracle),
      doc = "Wordcount via the Maple/Juice API, range partitioner + " +
        "sorted-run reduce (mp3/src/partition.go:12-19, SURVEY §2.6 P5)"),
    CatalogQuery(
      "mj3_wordcount_pipe",
      (s, dir) => {
        import s.implicits._
        val lines = Tables(s, dir).documents.select($"text").as[String]
        // The reference's binary-exe protocol (mp3/src/maplejuice.go:
        // 319-332,655-669) through deterministic shell exes: map emits
        // `word,1` lines, reduce sums key-grouped sorted `k\tv` lines
        // (Hadoop Streaming contract). Known protocol limit, shared
        // with the reference: a token CONTAINING a comma would split at
        // the first comma (WriteMapleKeys' k,v format has no escaping);
        // the documents vocabulary is comma-free.
        val mapper = Seq("awk", "{for(i=1;i<=NF;i++) print $i\",1\"}")
        val reducer = Seq("awk", "-F", "\t",
          "{ if ($1 != k && NR > 1) { print k\"\\t\"c }; " +
            "if ($1 != k) { k=$1; c=0 }; c+=$2 } " +
            "END { if (NR > 0) print k\"\\t\"c }")
        MapleJuiceJob
          .runPipe(lines, mapper, reducer,
            numPartitions = s.sparkContext.defaultParallelism)
          .select($"_1".as("word"), $"_2".cast("long").as("n_occurrences"))
          .orderBy($"word")
      },
      Some(wordcountOracle),
      doc = "Wordcount via external binary executables over rdd.pipe " +
        "(mp3/src/maplejuice.go:319-332 exe protocol, SURVEY §2.9)"))
}
