package graft.queries

import org.apache.spark.sql.functions._

import graft.core.{CatalogQuery, QueryModule, Tables}
import graft.operators.Changelog

/** CDC / changelog compaction over the events table: latest-state
  * upsert compaction and SCD-2 validity intervals, both replayed by
  * DuckDB window oracles. The engine side deliberately does NOT use
  * the window spelling for c1 — the packed-max HashAggregate is the
  * shape under test, and the oracle's `row_number() = 1` is the
  * independent specification it must reproduce exactly.
  */
object ChangelogQueries extends QueryModule {

  private val compact = CatalogQuery(
    "c1_compact_latest",
    (s, dir) => {
      val e = Tables(s, dir).events
      Changelog.compactLatest(e, keys = Seq("user_id"), tsCol = "ts",
          idCol = "event_id", payload = Seq("event_type", "value"))
        .orderBy(col("user_id"))
    },
    Some("""SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
           |       event_type, value
           |FROM events
           |QUALIFY row_number() OVER (
           |  PARTITION BY user_id
           |  ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) = 1
           |ORDER BY user_id""".stripMargin),
    doc = "Changelog upsert compaction (latest record per user, " +
      "last-writer-wins on (ts, event_id)) via the packed-decimal max " +
      "HashAggregate — O(keys) through the shuffle, no history sort; " +
      "oracle replays the window row_number specification")

  private val scd2 = CatalogQuery(
    "c2_scd2_intervals",
    (s, dir) => {
      val e = Tables(s, dir).events
      Changelog.scd2Intervals(e, keys = Seq("user_id"), tsCol = "ts",
          idCol = "event_id", stateCol = "event_type")
        .withColumn("is_current", col("is_current").cast("long"))
        .orderBy(col("user_id"), col("valid_from"), col("event_id"))
    },
    Some("""WITH t AS (
           |  SELECT user_id, event_id, event_type,
           |         CAST(ts AS TIMESTAMP) AS uts,
           |         lag(event_type) OVER w AS prev,
           |         row_number() OVER w AS rn
           |  FROM events
           |  WINDOW w AS (PARTITION BY user_id
           |               ORDER BY CAST(ts AS TIMESTAMP), event_id)
           |),
           |tr AS (
           |  SELECT * FROM t
           |  WHERE rn = 1 OR event_type IS DISTINCT FROM prev
           |)
           |SELECT user_id, event_id, event_type,
           |       uts AS valid_from,
           |       lead(uts) OVER w2 AS valid_to,
           |       CAST(lead(uts) OVER w2 IS NULL AS BIGINT) AS is_current
           |FROM tr
           |WINDOW w2 AS (PARTITION BY user_id ORDER BY uts, event_id)
           |ORDER BY user_id, valid_from, event_id""".stripMargin),
    doc = "SCD-2 interval build: collapse the event log to state " +
      "transitions (null-safe lag compare), stamp [valid_from, " +
      "valid_to) via lead, open interval flagged is_current — one " +
      "Exchange, both windows and the filter share partitioning + sort")

  /** Delete-tombstone CDC: op derived deterministically from the id
    * (`event_id % 7 = 0` → delete) so the oracle can re-derive it —
    * ~1/7 of records are tombstones, interleaved with upserts, so some
    * keys end deleted (absent rows, the semantics under test) and
    * others are deleted mid-history and resurrected by a later upsert.
    */
  private val deletes = CatalogQuery(
    "c3_compact_deletes",
    (s, dir) => {
      val e = Tables(s, dir).events
        .withColumn("op", when(col("event_id") % 7 === 0, lit("delete"))
          .otherwise(lit("upsert")))
      Changelog.compactWithDeletes(e, keys = Seq("user_id"), tsCol = "ts",
          idCol = "event_id", payload = Seq("event_type", "value"),
          opCol = "op", deleteOp = "delete")
        .orderBy(col("user_id"))
    },
    Some("""SELECT user_id, ts, event_id, event_type, value FROM (
           |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
           |         event_type, value,
           |         CASE WHEN event_id % 7 = 0 THEN 'delete'
           |              ELSE 'upsert' END AS op
           |  FROM events
           |  QUALIFY row_number() OVER (
           |    PARTITION BY user_id
           |    ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) = 1)
           |WHERE op <> 'delete'
           |ORDER BY user_id""".stripMargin),
    doc = "CDC compaction with delete tombstones: a key whose latest " +
      "record is a delete is absent from the compacted state; the " +
      "tombstone filter runs on the O(keys) winner relation AFTER the " +
      "packed-max HashAggregate, so dead keys' histories still " +
      "collapse map-side")

  override def queries: Seq[CatalogQuery] = Seq(compact, scd2, deletes)
}
