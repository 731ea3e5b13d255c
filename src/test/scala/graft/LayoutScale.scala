package graft

import org.apache.spark.sql.functions._
import graft.core.GraftSession

/** Round-11/12 scale probe for Layout.zorderAssign: one JVM, disjoint
  * replicas of lineitem (same corpus-synthesis harness as ScaleSmoke),
  * per-scale wall + output checks. The rank rides the two-level
  * distributed prefix sum, so per-row cost should stay flat while
  * rows scale 30x.
  *
  * uid is re-densified per replica with an 8e6 stride (base
  * orderkey*8 + linenumber < 4.8e6 at sf0.1). Historical note: the
  * round-11 version offset ORDERKEYS by 1e7 per replica, pushing 30x
  * uids to ~2.3e9 and silently spilling uid bits into the then
  * z<<30|uid packed rank key (the advisor catch); zorderAssign has
  * since dropped the packing for a composite (z, uid) prefix-sum
  * order, so uid magnitude no longer matters — the stride is kept
  * only so the probe series stays comparable across rounds.
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
          col("l_orderkey"), col("l_linenumber").cast("long").as("ln"),
          col("l_partkey"), col("l_suppkey"), lit(r.toLong).as("rep"))
      }.reduce(_ unionAll _)
        // per-replica densified uid: base < 8e6, stride 8e6 per replica
        .withColumn("uid",
          col("l_orderkey") * 8 + col("ln") + col("rep") * lit(8000000L))
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

/** The x14b claim, measured: on a SKEWED, SPARSE key domain the pmod
  * coordinates stop pruning while rank-bucketed (equi-depth) ones keep
  * the envelopes tight. The skewed key is v = l_partkey², a sparse
  * quadratic domain (~4e8 span at sf0.1): under pmod(v, 65536) nearby
  * v values scatter across the coordinate space, so a file's v-envelope
  * approaches the full domain; under the rank coordinate the envelope
  * stays near rows_per_file worth of value span. Emits one JSON line
  * per layout with the avg/max per-file envelope width ON v — the
  * number a reader's min/max pruning actually sees.
  */
object LayoutSkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val t = graft.core.Tables(spark, dir)
    val base = t.lineitem.select(
        col("l_orderkey"), col("l_linenumber").cast("long").as("ln"),
        col("l_partkey").cast("long").as("pk"), col("l_suppkey"))
      .withColumn("uid", col("l_orderkey") * 8 + col("ln"))
      .withColumn("v", col("pk") * col("pk"))
    def envelopes(df: org.apache.spark.sql.DataFrame, layout: String): Unit = {
      val r = df.groupBy(col("file_id"))
        .agg((max(col("v")) - min(col("v"))).as("dv"),
          (max(col("l_suppkey")) - min(col("l_suppkey"))).as("ds"))
        .agg(count(lit(1)).as("files"), avg(col("dv")).as("avg_dv"),
          max(col("dv")).as("max_dv"), avg(col("ds")).as("avg_ds")).head()
      val domain = base.agg(max(col("v")) - min(col("v"))).head().getLong(0)
      println(f"""{"op":"x14b_skew_probe","layout":"$layout","files":${r.getLong(0)},"avg_env_v":${r.getDouble(1)}%.0f,"max_env_v":${r.getLong(2)},"avg_env_s":${r.getDouble(3)}%.0f,"v_domain":$domain,"avg_env_v_frac":${r.getDouble(1) / domain}%.4f}""")
    }
    envelopes(graft.operators.Layout.zorderAssign(base,
      pmod(col("v"), lit(65536L)), pmod(col("l_suppkey"), lit(65536L)),
      "uid", rowsPerFile = 4096), "pmod")
    envelopes(graft.operators.Layout.zorderAssignRanked(base,
      "v", "l_suppkey", "uid", rowsPerFile = 4096), "ranked")
    spark.stop()
  }
}
