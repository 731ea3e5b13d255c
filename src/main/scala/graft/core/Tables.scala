package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  /** events.parquet has shipped `ts` both as TIMESTAMP(NANOS) (read as
    * raw int64 under GraftSession's nanosAsLong flag) and as plain
    * timestamp[us]; [[EventTime.normalize]] branches on the actual file
    * schema so either encoding lands as TimestampType.
    */
  def events: DataFrame = EventTime.normalize(read("events"))
  def documents: DataFrame = read("documents")
  def embeddings: DataFrame = read("embeddings")
}
