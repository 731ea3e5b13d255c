package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

// dev probe: where does g2's wall go? Times each stage of the
// triangle pipeline separately (noop writes so nothing prunes).
// usage: Test/runMain graft.G2Probe [sfDir] [reps]
object G2Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = core.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    import graft.core.Tables

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[g2probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    for (rep <- 1 to reps) {
      println(s"--- rep $rep ---")
      spark.catalog.clearCache()
      val li = Tables(spark, sfDir).lineitem
        .select(col("l_orderkey"), col("l_partkey"))
      val e = li.as("x").join(li.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").as("src"), col("y.l_partkey").as("dst"))
      val undPlan = e
        .select(least(col("src"), col("dst")).cast("long").as("a"),
          greatest(col("src"), col("dst")).cast("long").as("b"))
        .filter(col("a") =!= col("b"))
        .distinct()
      val und = undPlan.persist(StorageLevel.MEMORY_AND_DISK)
      t("edges: extract+distinct")(noop(und))
      println(s"[g2probe] edges = ${und.count()}")
      val deg = und.select(col("a").as("n"))
        .unionAll(und.select(col("b").as("n")))
        .groupBy(col("n")).agg(count(lit(1)).as("d"))
      val oriented = und
        .join(deg.select(col("n").as("a"), col("d").as("__da")), "a")
        .join(deg.select(col("n").as("b"), col("d").as("__db")), "b")
        .select(
          when(col("__da") < col("__db") ||
              (col("__da") === col("__db") && col("a") < col("b")),
            struct(col("a").as("u"), col("b").as("v")))
            .otherwise(struct(col("b").as("u"), col("a").as("v")))
            .as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      t("orient (2 deg joins)")(noop(oriented))
      val ySide = oriented.select(col("u"), col("v").as("y"))
      val wedges = oriented.select(col("u"), col("v").as("x"))
        .join(ySide, "u")
        .filter(col("x") < col("y"))
      t("wedges (self-join only)")(noop(wedges))
      val closed = wedges
        .join(und, col("x") === col("a") && col("y") === col("b"))
        .select(col("u"), col("x"), col("y"))
      t("wedges+close join")(noop(closed))
      val corners = closed
        .select(explode(array(col("u"), col("x"), col("y"))).as("node"))
        .groupBy(col("node"))
        .agg(count(lit(1)).as("n_triangles"))
      t("full corners (re-run all)")(noop(corners))
      und.unpersist(); oriented.unpersist()
    }
    // the shipped operator end to end, for reference
    for (rep <- 1 to reps) {
      spark.catalog.clearCache()
      t(s"g2 catalog query rep$rep")(noop(
        SparkEntry.queries("g2_triangles")(spark, sfDir)))
    }
    spark.stop()
  }
}
