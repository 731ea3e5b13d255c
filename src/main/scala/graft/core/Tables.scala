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
    * (micros) can't hold natively — read the raw int64 nanos and floor to
    * micros, matching DuckDB's own nanos→micros truncation.
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    read("events").withColumn("ts",
      timestamp_micros(floor(col("ts") / 1000).cast("long")))
  }
  def documents: DataFrame = read("documents")
  def embeddings: DataFrame = read("embeddings")
}
