package graft

import java.nio.file.{Files, Paths}

import graft.sources.Dfs

/** The SDFS CLI verb surface (put/get/delete/ls/store) over the
  * delegated file system (SURVEY §7.3; `mp3/src/sdfs.go`, main.go
  * dispatch), exercised end-to-end on a temp directory.
  */
class DfsSpec extends SparkSpecBase {

  test("put/ls/get/store/delete round-trip") {
    val tmp = Files.createTempDirectory("graft-dfs").toString
    val local = Files.createTempFile("graft-local", ".txt")
    Files.writeString(local, "line one\nline two\n")
    try {
      Dfs.put(spark, local.toString, s"$tmp/dfs/data.txt")
      val listed = Dfs.ls(spark, s"$tmp/dfs")
      assert(listed.map(_.path).exists(_.endsWith("data.txt")))
      assert(listed.head.sizeBytes == Files.size(local))
      assert(listed.head.nBlocks >= 1)

      // store: on file:// every block is on this node
      val stored = Dfs.store(spark, s"$tmp/dfs")
      assert(stored.map(_.path) == listed.map(_.path))

      val back = s"$tmp/back.txt"
      Dfs.get(spark, s"$tmp/dfs/data.txt", back)
      assert(Files.readString(Paths.get(back)) == "line one\nline two\n")

      assert(Dfs.delete(spark, s"$tmp/dfs/data.txt"))
      assert(Dfs.ls(spark, s"$tmp/dfs").isEmpty)
      assert(!Dfs.delete(spark, s"$tmp/dfs/data.txt")) // already gone
    } finally {
      Dfs.delete(spark, tmp)
      Files.deleteIfExists(local)
    }
  }

  test("ls on a missing directory is empty, not an error") {
    assert(Dfs.ls(spark, "/tmp/graft-does-not-exist-xyz").isEmpty)
  }

  test("put overwrites an existing stored file, like the reference's re-put") {
    val tmp = Files.createTempDirectory("graft-dfs2").toString
    val local = Files.createTempFile("graft-local2", ".txt")
    try {
      Files.writeString(local, "v1")
      Dfs.put(spark, local.toString, s"$tmp/f.txt")
      Files.writeString(local, "v2 longer")
      Dfs.put(spark, local.toString, s"$tmp/f.txt")
      val back = s"$tmp/back.txt"
      Dfs.get(spark, s"$tmp/f.txt", back)
      assert(Files.readString(Paths.get(back)) == "v2 longer")
    } finally Dfs.delete(spark, tmp)
  }
}
