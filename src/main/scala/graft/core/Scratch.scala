package graft.core

import java.io.File
import java.util.UUID

/** Small scratch directories for streaming checkpoints and per-query
  * sinks, placed on a RAM-backed tmpfs when the box offers one.
  *
  * Why: Structured Streaming fsyncs its offset/commit logs and state
  * store files once per micro-batch. On a disk-backed temp dir those
  * fsyncs contend with whatever else is washing through the page
  * cache — the round-9 bench measured the streaming query family
  * drifting +25 s on IDENTICAL plans, with per-query accounting
  * attributing the drift to 5–12 foreign busy cores of checkpoint
  * fsync/kworker activity. Checkpoint state for the replay fixtures
  * is kilobytes; its durability story is irrelevant to a bench/test
  * run; tmpfs makes the micro-batch commit path memory-speed and
  * box-state-independent.
  *
  * On a real cluster the checkpoint location is a caller decision
  * (HDFS/object store for durability) — every operator takes it as a
  * parameter or writes under the caller's sink; this helper only
  * decides where THIS process's ephemeral replay scratch lives.
  */
object Scratch {

  /** Preferred scratch root: /dev/shm (Linux tmpfs) when writable,
    * else java.io.tmpdir.
    */
  def root: File = {
    val shm = new File("/dev/shm")
    if (shm.isDirectory && shm.canWrite) shm
    else new File(System.getProperty("java.io.tmpdir"))
  }

  /** Fresh uniquely-named scratch dir under [[root]]. */
  def dir(prefix: String): File = {
    val d = new File(root, prefix + UUID.randomUUID().toString.replace("-", ""))
    require(d.mkdirs() || d.isDirectory, s"cannot create scratch dir $d")
    d
  }

  /** Best-effort recursive delete — scratch cleanup must never fail
    * the query whose results are already produced.
    */
  def delete(f: File): Unit = {
    try {
      val children = Option(f.listFiles()).getOrElse(Array.empty)
      children.foreach(delete)
      f.delete()
      ()
    } catch { case _: Exception => () }
  }
}
