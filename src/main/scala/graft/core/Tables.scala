package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lazy handles to the star-schema + document corpus parquet tables
  * (TESTDATA.md). Each accessor is a fresh declarative scan, so Catalyst
  * can prune columns / push filters per query — nothing is cached here.
  *
  * At 100 TB these would be partitioned/bucketed external tables; the
  * accessors keep that swap localized to this one class.
  */
final case class Tables(spark: SparkSession, dir: String) {
  // Operators resolve the engine's native functions (token_count,
  // array_dot, minhash_sig, simhash_fp, rolling_hash) through the
  // session registry; a FOREIGN session (built without
  // spark.sql.extensions=graft.plans.GraftExtensions) would fail
  // analysis on them. Registration is idempotent and cheap, and every
  // catalog query reads through this accessor — so this is the one
  // chokepoint that makes the library work on any session.
  graft.plans.GraftExtensions.ensureRegistered(spark)

  private def read(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame = read("region")
  def nation: DataFrame = read("nation")
  def customer: DataFrame = read("customer")
  def supplier: DataFrame = read("supplier")
  def part: DataFrame = read("part")
  def orders: DataFrame = read("orders")
  def lineitem: DataFrame = read("lineitem")
  /** events.parquet stores TIMESTAMP(NANOS) which Spark's TimestampType
    * (micros) can't hold natively — read the raw int64 nanos and truncate
    * to micros with INTEGER division (`div`), matching DuckDB's own
    * nanos→micros truncation bit-for-bit. (float division would round
    * through double and drift 1µs on ~12% of 2024-epoch values.)
    * The nanosAsLong flag is set once in GraftSession, not here.
    */
  def events: DataFrame =
    read("events").withColumn("ts", timestamp_micros(expr("ts div 1000")))
  def documents: DataFrame = read("documents")
  def embeddings: DataFrame = read("embeddings")
}
