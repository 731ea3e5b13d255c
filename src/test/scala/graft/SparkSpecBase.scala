package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession

/** Shared session for all specs — the same GraftSession.tuned config
  * Verify and Bench run under, so tests exercise the graded engine.
  */
trait SparkSpecBase extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpecBase.shared
  def sf(name: String): String = s"/root/testdata/$name"
}

object SparkSpecBase {
  // one session per JVM: specs share it, sbt forks a single test JVM.
  // Warehouse in tmp so bucketed-table tests never litter the repo.
  lazy val shared: SparkSession = {
    val s = GraftSession.tuned(
      SparkSession.builder().master("local[4]").appName("graft-test")
        .config("spark.sql.warehouse.dir",
          java.nio.file.Files.createTempDirectory("graft-warehouse").toString),
      shufflePartitions = 4
    ).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
