package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** One `ls` row: a stored file with its size and block placement. */
case class DfsEntry(path: String, sizeBytes: Long, nBlocks: Int,
                    hosts: Seq[String])

/** UX-parity wrappers for the reference's SDFS CLI verbs
  * (`put/get/delete/ls/store`, `mp3/src/sdfs.go:108-170` and the
  * main.go verb dispatch) over Hadoop's `FileSystem` abstraction.
  *
  * SURVEY §7.3 scopes the SDFS internals — replication, write locks,
  * master election, block placement (`mp3/src/sdfs.go:22-47`) — as
  * delegated to the cluster file system (HDFS/S3A in production,
  * `file://` under local[*]), which provides the same guarantees the
  * reference hand-rolls. These wrappers keep the reference's verb
  * surface so a user of its CLI finds the same operations:
  *
  *  - `put` uploads a local file (the reference splits into
  *    newline-aligned blocks and replicates to 4 nodes — HDFS does
  *    exactly this below the FileSystem API);
  *  - `get` downloads to a local path;
  *  - `delete` removes a stored file (reference: DelReq fan-out);
  *  - `ls` lists stored files with their block placement, the
  *    analogue of the reference's file → replica-IP listing;
  *  - `store` lists the files whose blocks live on THIS host, the
  *    reference's "files stored on the current node".
  */
object Dfs {

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** `put [local file] [sdfsfile]` */
  def put(spark: SparkSession, localPath: String, dfsPath: String): Unit = {
    val dst = new Path(dfsPath)
    fs(spark, dst).copyFromLocalFile(false, true, new Path(localPath), dst)
  }

  /** `get [sdfs file] [local file]` */
  def get(spark: SparkSession, dfsPath: String, localPath: String): Unit = {
    val src = new Path(dfsPath)
    fs(spark, src).copyToLocalFile(false, src, new Path(localPath), true)
  }

  /** `delete [sdfs file]`; true iff something was removed. */
  def delete(spark: SparkSession, dfsPath: String): Boolean = {
    val p = new Path(dfsPath)
    fs(spark, p).delete(p, true)
  }

  /** `ls`: stored files under `dir` with size and block placement. */
  def ls(spark: SparkSession, dir: String): Seq[DfsEntry] = {
    val d = new Path(dir)
    val f = fs(spark, d)
    if (!f.exists(d)) Seq.empty
    else {
      val it = f.listFiles(d, true)
      val out = Seq.newBuilder[DfsEntry]
      while (it.hasNext) {
        val st = it.next()
        if (st.isFile) {
          val blocks = f.getFileBlockLocations(st, 0, math.max(st.getLen, 1))
          out += DfsEntry(st.getPath.toUri.getPath, st.getLen, blocks.length,
            blocks.flatMap(_.getHosts).distinct.toSeq)
        }
      }
      out.result().sortBy(_.path)
    }
  }

  /** `store`: files with at least one block on this host. Under a
    * local (`file://`) file system every block is local by definition,
    * matching a single-node reference deployment; on HDFS this filters
    * by datanode host. Hostname comparison is case-insensitive and
    * FQDN-insensitive (datanodes may report short names while
    * getLocalHost returns a fully-qualified one, or vice versa).
    */
  def store(spark: SparkSession, dir: String): Seq[DfsEntry] = {
    val d = new Path(dir)
    val scheme = Option(fs(spark, d).getUri.getScheme).getOrElse("file")
    val entries = ls(spark, dir)
    if (scheme == "file") entries
    else {
      // Short-name comparison only for real hostnames: an IP literal's
      // "short name" would be its first octet and falsely match other
      // addresses in the same /8.
      def isIpLike(h: String) = h.nonEmpty && h.forall(c => c.isDigit || c == '.')
      def short(h: String) = h.toLowerCase.split('.').head
      val me = java.net.InetAddress.getLocalHost.getHostName
      def matches(h: String): Boolean =
        h.equalsIgnoreCase(me) || h.equalsIgnoreCase("localhost") ||
          (!isIpLike(h) && !isIpLike(me) && short(h) == short(me))
      // empty block list = zero-length file: stored (metadata-only) but
      // located nowhere — keep it listed, like the pre-round behavior
      entries.filter(e => e.hosts.isEmpty || e.hosts.exists(matches))
    }
  }
}
