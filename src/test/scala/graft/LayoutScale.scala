package graft

import org.apache.spark.sql.functions._
import graft.core.GraftSession

/** Round-11 scale probe for Layout.zorderAssign: one JVM, disjoint
  * replicas of lineitem (same corpus-synthesis harness as ScaleSmoke),
  * per-scale wall + output checks. The rank rides the two-level
  * distributed prefix sum, so per-row cost should stay flat while
  * rows scale 30x.
  */
object LayoutScale {
  def main(args: Array[String]): Unit = {
    val scales = args.headOption.getOrElse("1,10,30")
      .split(",").map(_.trim.toInt).toSeq
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val t = graft.core.Tables(spark, dir)
    scales.foreach { mult =>
      spark.catalog.clearCache()
      val li = (0 until mult).map { r =>
        t.lineitem.select(
          (col("l_orderkey") + lit(r * 10000000L)).as("l_orderkey"),
          col("l_linenumber").cast("long").as("ln"),
          col("l_partkey"), col("l_suppkey"))
      }.reduce(_ unionAll _)
        .withColumn("uid", col("l_orderkey") * 8 + col("ln"))
      val t0 = System.nanoTime()
      val stats = graft.operators.Layout.zorderAssign(li,
          pmod(col("l_partkey"), lit(65536L)),
          pmod(col("l_suppkey"), lit(65536L)), "uid", rowsPerFile = 4096)
        .groupBy(col("file_id"))
        .agg(count(lit(1)).as("n"),
          (max(col("l_partkey")) - min(col("l_partkey"))).as("dp"),
          (max(col("l_suppkey")) - min(col("l_suppkey"))).as("ds"))
        .agg(count(lit(1)).as("files"), sum(col("n")).as("rows"),
          avg(col("dp")).as("avg_dp"), avg(col("ds")).as("avg_ds")).head()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"op":"x14_zorder_scale","scale":$mult,"sec":$sec%.1f,"files":${stats.getLong(0)},"rows":${stats.getLong(1)},"avg_env_p":${stats.getDouble(2)}%.0f,"avg_env_s":${stats.getDouble(3)}%.0f}""")
    }
    spark.stop()
  }
}
