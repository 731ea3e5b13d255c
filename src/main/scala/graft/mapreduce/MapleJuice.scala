package graft.mapreduce

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's pluggable map/reduce surface (SURVEY.md §2.9),
  * re-expressed on Datasets.
  *
  * Reference contract: a Maple is called once per input line and emits
  * `(key, value)` string pairs (`mp3/src/maple/mapler.go:10-22`); a
  * Juice is called once per key with every value for that key
  * (`mp3/src/juice/juicer.go:13-28`); keys are distributed over juice
  * tasks by a hash OR range partitioner (`mp3/src/partition.go:9-38`).
  * Value order within a group is unspecified in the reference (its
  * "ShuffleSort" concatenates per-node files in arrival order,
  * `mp3/src/maplejuice.go:623-652`) and is unspecified here too.
  */
trait Maple extends Serializable {
  def maple(line: String): IterableOnce[(String, String)]
}

trait Juice extends Serializable {
  def juice(key: String, values: Iterator[String]): IterableOnce[(String, String)]
}

sealed trait PartitionStrategy
/** FNV-hash in the reference; Murmur3 here — same co-location semantics. */
case object HashPartition extends PartitionStrategy
/** Contiguous sorted key ranges (`mp3/src/partition.go:12-19`). */
case object RangePartition extends PartitionStrategy

object MapleJuiceJob {

  /** Run a Maple → shuffle → Juice job.
    *
    * Hash path: `groupByKey.flatMapGroups` — one hash shuffle, keys
    * co-located exactly as the reference's hash partitioner guarantees.
    * Range path: `repartitionByRange` + `sortWithinPartitions` + a
    * partition walk over sorted key runs — the reference's range
    * partitioner plus Hadoop's sort-based reduce input (SURVEY §2.6 P5)
    * in one pass, no second shuffle.
    *
    * At scale the hash path is an O(keys) shuffle with map-side combine
    * left to the Juice author (as in the reference); the range path
    * additionally gives totally-ordered output partitions.
    */
  def run(input: Dataset[String], m: Maple, j: Juice,
          numPartitions: Int,
          strategy: PartitionStrategy = HashPartition): Dataset[(String, String)] = {
    val spark = input.sparkSession
    import spark.implicits._
    val kv: Dataset[(String, String)] = input.flatMap(m.maple(_))
    // BOTH paths are one exchange + one in-partition sort + the
    // sorted-run walk (Hadoop's sort-based reduce). The hash path used
    // to chain .repartition(n, _1).groupByKey(_._1): groupByKey keys on
    // a CLOSURE-derived column Catalyst cannot relate to _1's hash
    // partitioning, so it re-exchanged AND re-sorted the whole KV
    // stream — a second full shuffle carrying zero information (round
    // 16, measured on the 306M-pair 136 MB Condorcet workload:
    // 80.6 s → 43.4 s median end-to-end from removing it).
    val partitioned = strategy match {
      case HashPartition  => kv.repartition(numPartitions, col("_1"))
      case RangePartition => kv.repartitionByRange(numPartitions, col("_1"))
    }
    partitioned
      .sortWithinPartitions(col("_1"))
      .mapPartitions { it =>
        // walk contiguous runs of equal keys in the sorted stream
        // (named `in`, not `buffered`: inside the anonymous Iterator
        // subclass a bare `buffered` resolves to Iterator's own
        // .buffered method, silently shadowing the outer val)
        val in = it.buffered
        new Iterator[Iterator[(String, String)]] {
          def hasNext: Boolean = in.hasNext
          def next(): Iterator[(String, String)] = {
            val k = in.head._1
            val values = Iterator.unfold(()) { _ =>
              if (in.hasNext && in.head._1 == k)
                Some((in.next()._2, ())) else None
            }
            // the trailing by-name ++ drains any values a Juice left
            // unconsumed, so the stream stays aligned on run starts
            j.juice(k, values).iterator ++ {
              while (in.hasNext && in.head._1 == k) in.next()
              Iterator.empty[(String, String)]
            }
          }
        }.flatten
      }
  }

  /** Binary-executable compatibility via `rdd.pipe`, the Hadoop
    * Streaming contract the reference's own `hadoop_*` ports use:
    * map exe reads lines on stdin and emits `k,v` lines (the reference
    * Emit format, `mp3/src/maple/mapler.go:20-22`); reduce exe reads
    * key-sorted `k\tv` lines and emits `k\tv` lines. Malformed map
    * output (no comma) is dropped, matching WriteMapleKeys
    * (`mp3/src/maplejuice.go:350-353`).
    */
  def runPipe(input: Dataset[String], mapleCmd: Seq[String], juiceCmd: Seq[String],
              numPartitions: Int): Dataset[(String, String)] = {
    val spark = input.sparkSession
    import spark.implicits._
    val kv = input.rdd.pipe(mapleCmd)
      .flatMap { line =>
        val i = line.indexOf(',')
        if (i < 0) None else Some((line.substring(0, i), line.substring(i + 1)))
      }
    val reduced = kv
      .map { case (k, v) => (k, v) }
      .repartitionAndSortWithinPartitions(
        new org.apache.spark.HashPartitioner(numPartitions))
      .map { case (k, v) => s"$k\t$v" }
      .pipe(juiceCmd)
      .map { line =>
        val i = line.indexOf('\t')
        if (i < 0) (line, "") else (line.substring(0, i), line.substring(i + 1))
      }
    spark.createDataset(reduced)
  }

  /** The reference's output format: `key<TAB>value` text lines
    * (SURVEY §2.1 S11), one file when `coalesce1` (CollectJuices
    * concatenates to a single SDFS file, `mp3/src/maplejuice.go:540-568`).
    */
  def writeTsv(ds: Dataset[(String, String)], path: String,
               coalesce1: Boolean = false): Unit = {
    val out = ds.toDF("k", "v").select(concat_ws("\t", col("k"), col("v")))
    (if (coalesce1) out.coalesce(1) else out).write.mode("overwrite").text(path)
  }
}
