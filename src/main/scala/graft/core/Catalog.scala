package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark plan builder plus (when SQL-expressible)
  * the equivalent DuckDB SQL the driver replays as an oracle.
  *
  * Determinism contract (drives the hash compare):
  *   - every query ends in a total ORDER BY (unique tie-break columns);
  *   - every floating-point aggregate is rounded identically on both
  *     sides (raw column passthrough is exact and needs no rounding);
  *   - output column names match the oracle's aliases exactly.
  */
final case class CatalogQuery(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

trait QueryModule {
  def queries: Seq[CatalogQuery]
}
