package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame

/** The lineage-cut discipline shared by every iterative DataFrame loop
  * in the engine ([[Dedup]] components, [[Bpe]] merge rounds, [[Graph]]
  * rank/frontier rounds): per-round state is eagerly
  * `localCheckpoint(true)`'d — NEVER persist()'d, because a persisted
  * round carries the previous round's InMemoryRelation inside its plan
  * and per-job plan rendering is exponential in that nesting depth —
  * and the PREVIOUS round's checkpoint storage is released explicitly
  * once the next round is materialized.
  */
private[operators] object Lineage {

  /** The checkpointed RDD behind a localCheckpoint'ed DataFrame, for
    * explicit release — `df.rdd` would wrap it in a NEW deserializing
    * RDD whose unpersist frees nothing.
    *
    * SAFETY: call this only on a DataFrame the loop itself
    * checkpointed (a flat LogicalRDD-rooted plan, or a pure projection
    * over one). On an arbitrary plan, collectFirst would surface a
    * LogicalRDD embedded in CALLER input — e.g. an edges argument the
    * caller localCheckpoint'ed — and releasing that destroys blocks
    * the caller cannot recompute (truncated lineage). Loops that start
    * from un-checkpointed state must track the RDDs they created
    * (snapshot AFTER each checkpoint) rather than walking the loop
    * variable's plan on round 1.
    */
  def snapshotRdd(df: DataFrame): Option[RDD[_]] =
    df.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }
}
