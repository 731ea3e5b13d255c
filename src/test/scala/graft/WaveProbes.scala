package graft

import org.apache.spark.sql.functions._

import graft.core.GraftSession

/** Round-11 controlled probes for the two waved-execution claims, both
  * WITHIN one JVM (the ScaleSmoke/G6Probe rule: sub-minute cross-JVM
  * walls spread 3-20x with AQE stats timing and box I/O weather, so
  * wave-vs-single comparisons must share a JVM, a parquet input, and a
  * page cache).
  *
  * [[G2WaveProbe]] — the SCALING_r10 finding-B fix: waved triangle
  * counting used to re-shuffle `und` and re-scan `oriented` every wave
  * (2-wave 30x at 1.65-1.78x the single-pass per-wedge rate); with the
  * fixed relations materialized ONCE as bucketed tables the per-wave
  * fixed term is a bucketed scan, and 2-wave should land within ~1.2x
  * of single-pass. Emits one JSON line per wave count, with the
  * triangle checksum equality across wave counts asserted in-run.
  *
  * [[D12WaveProbe]] — the blocked edit-distance join's bounded-scratch
  * story: d12c already proves (under the oracle) that the join COMPOSES
  * from disjoint block-key strata; this probe measures that executing
  * the same 30x-shaped join as K sequential stratum-hash waves bounds
  * per-wave shuffle-write scratch at ~1/K of the whole-join footprint
  * with the same output — the fuzzy-join analogue of g2's waves, using
  * only the operator's public blocked signature.
  */
object WaveProbes {

  /** Cumulative shuffle-write bytes across completed stages, with a
    * quiesce poll (stage-completion events are async).
    */
  final class ShuffleMeter(spark: org.apache.spark.sql.SparkSession) {
    private val bytes = new java.util.concurrent.atomic.AtomicLong(0)
    private val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null) bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    def settledTotal(): Long = {
      var last = -1L
      var stable = 0
      var waited = 0
      while (stable < 3 && waited < 10000) {
        Thread.sleep(200); waited += 200
        val now = bytes.get()
        if (now == last) stable += 1 else { stable = 0; last = now }
      }
      bytes.get()
    }
  }

  def disjointCoPurchaseEdges(t: graft.core.Tables, mult: Int) = {
    def side = (0 until mult).map { r =>
      t.lineitem.select((col("l_orderkey") + lit(r * 100000000L)).as("ok"),
        (col("l_partkey") + lit(r * 1000000L)).as("pk"))
    }.reduce(_ union _)
    side.as("x").join(side.as("y"),
        col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .select(col("x.pk").as("src"), col("y.pk").as("dst"))
  }

  def taggedDocs(t: graft.core.Tables, mult: Int) =
    (0 until mult).map { r =>
      val text =
        if (r > 0) regexp_replace(col("text"), "(\\S+)", s"$$1r$r")
        else col("text")
      t.documents.select((col("doc_id") + lit(r * 1000000L)).as("doc_id"),
        text.as("text"))
    }.reduce(_ union _)
}

object G2WaveProbe {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(30)
    val waveList = args.drop(1).headOption.getOrElse("1,2")
      .split(",").map(_.trim.toInt).toSeq
    val dir = args.drop(2).headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val t = graft.core.Tables(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory(s"g2wave_$mult").toString
    WaveProbes.disjointCoPurchaseEdges(t, mult)
      .write.mode("overwrite").parquet(s"$tmp/edges")
    val e = spark.read.parquet(s"$tmp/edges")
    // wedge volume (the work denominator), outside any timed block
    val und = e.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = und.select(col("a").as("n"))
      .unionAll(und.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val wedges = und
      .join(deg.select(col("n").as("a"), col("d").as("__da")), "a")
      .join(deg.select(col("n").as("b"), col("d").as("__db")), "b")
      .select(when(col("__da") < col("__db") ||
          (col("__da") === col("__db") && col("a") < col("b")),
        col("a")).otherwise(col("b")).as("u"))
      .groupBy(col("u")).agg(count(lit(1)).as("od"))
      .agg(coalesce(sum(expr("od * (od - 1) div 2")), lit(0L)).as("w"))
      .head().getLong(0)
    val nEdges = und.count()
    und.unpersist()
    println(s"""{"op":"g2_wave_probe_setup","scale":$mult,"edges":$nEdges,"wedges":$wedges}""")
    var checksum = Option.empty[(Long, Long)]
    waveList.foreach { w =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val r = graft.operators.Graph.triangleCounts(e, w)
        .agg(sum(col("n_triangles")).as("s"), count(lit(1)).as("n")).head()
      val sec = (System.nanoTime() - t0) / 1e9
      val cs = (r.getLong(0), r.getLong(1))
      checksum match {
        case None => checksum = Some(cs)
        case Some(c0) => require(c0 == cs,
          s"waves=$w checksum $cs != single-pass $c0")
      }
      val perM = sec * 1e6 / math.max(wedges, 1L)
      println(f"""{"op":"g2_wave_probe","scale":$mult,"waves":$w,"sec":$sec%.1f,"sec_per_m_wedges":$perM%.3f,"tri_sum":${cs._1},"nodes":${cs._2}}""")
    }
    graft.core.Scratch.delete(new java.io.File(tmp))
    spark.stop()
  }
}

object D12WaveProbe {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(30)
    val groups = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val dir = args.drop(2).headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val t = graft.core.Tables(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory(s"d12wave_$mult").toString
    WaveProbes.taggedDocs(t, mult).write.mode("overwrite").parquet(s"$tmp/docs")
    val docs = spark.read.parquet(s"$tmp/docs")
    // the ScaleSmoke d12b stratum-composed population: 40-char
    // fingerprints, 1-3 planted edits on 3/4 of rows, block key =
    // edit-stable prefix-8 composed with the replica stratum
    val base0 = docs.select(col("doc_id"), substring(col("text"), 1, 40).as("fp"))
    val rr = pmod(col("doc_id"), lit(4))
    val t1 = concat(substring(col("fp"), 1, 9), lit("z"),
      substring(col("fp"), 11, 1000))
    val t2 = concat(substring(t1, 1, 12), lit("y"), substring(t1, 14, 1000))
    val t3 = concat(substring(t2, 1, 15), lit("x"), substring(t2, 17, 1000))
    val typos0 = base0.select(col("doc_id").as("typo_key"),
      when(rr === 0, col("fp")).when(rr === 1, t1)
        .when(rr === 2, t2).otherwise(t3).as("typo_name"))
    val typos = typos0.withColumn("blk",
      concat(substring(col("typo_name"), 1, 8), lit("#"),
        expr("typo_key div 1000000")))
    val base = base0.withColumn("blk",
      concat(substring(col("fp"), 1, 8), lit("#"),
        expr("doc_id div 1000000")))
    def join(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame) =
      graft.operators.Fuzzy.editDistanceJoin(l, r,
        "typo_key", "doc_id", "typo_name", "fp", "blk", "blk",
        maxDist = 2, q = 3)
    val meter = new WaveProbes.ShuffleMeter(spark)
    // phase A: the join run WHOLE — the footprint baseline
    val a0 = meter.settledTotal()
    val tw0 = System.nanoTime()
    val wholeCount = join(typos, base).count()
    val wholeSec = (System.nanoTime() - tw0) / 1e9
    val wholeBytes = meter.settledTotal() - a0
    println(f"""{"op":"d12_wave_probe","scale":$mult,"phase":"whole","sec":$wholeSec%.1f,"shuffle_mb":${wholeBytes / 1e6}%.0f,"pairs":$wholeCount}""")
    // phase B: K sequential stratum-hash waves over the SAME blocked
    // join — a wave filters BOTH sides to one hash class of the block
    // key, so waves partition the candidate space exactly (every
    // candidate pair shares its block); per-wave shuffle write is the
    // bounded-scratch claim, the count sum is the correctness claim
    var waveSum = 0L
    var maxWaveBytes = 0L
    var maxWaveSec = 0.0
    (0 until groups).foreach { g =>
      spark.catalog.clearCache()
      val b0 = meter.settledTotal()
      val tg0 = System.nanoTime()
      val c = join(
        typos.filter(pmod(hash(col("blk")), lit(groups)) === g),
        base.filter(pmod(hash(col("blk")), lit(groups)) === g)).count()
      val sec = (System.nanoTime() - tg0) / 1e9
      val b = meter.settledTotal() - b0
      waveSum += c
      maxWaveBytes = math.max(maxWaveBytes, b)
      maxWaveSec = math.max(maxWaveSec, sec)
      println(f"""{"op":"d12_wave_probe","scale":$mult,"phase":"wave","wave":$g,"of":$groups,"sec":$sec%.1f,"shuffle_mb":${b / 1e6}%.0f,"pairs":$c}""")
    }
    require(waveSum == wholeCount,
      s"stratum waves lost pairs: $waveSum != $wholeCount")
    println(f"""{"op":"d12_wave_probe","scale":$mult,"phase":"summary","groups":$groups,"whole_shuffle_mb":${wholeBytes / 1e6}%.0f,"max_wave_shuffle_mb":${maxWaveBytes / 1e6}%.0f,"scratch_ratio":${maxWaveBytes.toDouble / math.max(wholeBytes, 1L)}%.3f,"pairs_equal":true}""")
    graft.core.Scratch.delete(new java.io.File(tmp))
    spark.stop()
  }
}

/** Round-12 probe for the AUTO-waved blocked fuzzy join
  * (Fuzzy.editDistanceJoinAutoWaved): same 30x-shaped tagged population
  * as D12WaveProbe, but the operator decides the wave count itself from
  * the predicted candidate volume. Emits the prediction-driven wave
  * count, per-wave shuffle scratch vs the whole join, and asserts pair
  * conservation in-run — the SCALING_r12 row for VERDICT r11 ask 5.
  * Usage: Test/runMain graft.FuzzyAutoWaveProbe [mult] [ceiling] [sfDir]
  */
object FuzzyAutoWaveProbe {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(30)
    // 0 = let the operator derive the ceiling from its scratch-byte
    // budget (the production default since round 13)
    val ceiling = args.drop(1).headOption.map(_.toLong).getOrElse(0L)
    val dir = args.drop(2).headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val t = graft.core.Tables(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory(s"d12auto_$mult").toString
    WaveProbes.taggedDocs(t, mult).write.mode("overwrite").parquet(s"$tmp/docs")
    val docs = spark.read.parquet(s"$tmp/docs")
    val base0 = docs.select(col("doc_id"), substring(col("text"), 1, 40).as("fp"))
    val rr = pmod(col("doc_id"), lit(4))
    val t1 = concat(substring(col("fp"), 1, 9), lit("z"),
      substring(col("fp"), 11, 1000))
    val t2 = concat(substring(t1, 1, 12), lit("y"), substring(t1, 14, 1000))
    val t3 = concat(substring(t2, 1, 15), lit("x"), substring(t2, 17, 1000))
    val typos0 = base0.select(col("doc_id").as("typo_key"),
      when(rr === 0, col("fp")).when(rr === 1, t1)
        .when(rr === 2, t2).otherwise(t3).as("typo_name"))
    val typos = typos0.withColumn("blk",
      concat(substring(col("typo_name"), 1, 8), lit("#"),
        expr("typo_key div 1000000")))
    val base = base0.withColumn("blk",
      concat(substring(col("fp"), 1, 8), lit("#"),
        expr("doc_id div 1000000")))
    val meter = new WaveProbes.ShuffleMeter(spark)
    // phase A: whole blocked join — the footprint baseline
    val a0 = meter.settledTotal()
    val tw0 = System.nanoTime()
    val wholeCount = graft.operators.Fuzzy.editDistanceJoin(typos, base,
      "typo_key", "doc_id", "typo_name", "fp", "blk", "blk",
      maxDist = 2, q = 3).count()
    val wholeSec = (System.nanoTime() - tw0) / 1e9
    val wholeBytes = meter.settledTotal() - a0
    println(f"""{"op":"fuzzy_auto_wave","scale":$mult,"phase":"whole","sec":$wholeSec%.1f,"shuffle_mb":${wholeBytes / 1e6}%.0f,"pairs":$wholeCount}""")
    // phase B: the auto-waved operator at the given ceiling — waves run
    // SEQUENTIALLY inside the call (eager per-wave localCheckpoint), so
    // the post-call shuffle total divided by the wave count bounds the
    // mean per-wave scratch; the wave max is what the probe's per-wave
    // baseline (phase A / waves from D12WaveProbe) already established
    spark.catalog.clearCache()
    var waves = -1
    val b0 = meter.settledTotal()
    val ta0 = System.nanoTime()
    val autoDf = graft.operators.Fuzzy.editDistanceJoinAutoWaved(typos, base,
      "typo_key", "doc_id", "typo_name", "fp", "blk", "blk",
      maxDist = 2, q = 3, waveCandidateCeiling = ceiling,
      onWaves = w => waves = w)
    val autoCount = autoDf.count()
    val autoSec = (System.nanoTime() - ta0) / 1e9
    val autoBytes = meter.settledTotal() - b0
    require(autoCount == wholeCount,
      s"auto waves lost pairs: $autoCount != $wholeCount")
    println(f"""{"op":"fuzzy_auto_wave","scale":$mult,"phase":"auto","ceiling":$ceiling,"waves":$waves,"sec":$autoSec%.1f,"shuffle_mb":${autoBytes / 1e6}%.0f,"pairs":$autoCount,"pairs_equal":true}""")
    graft.core.Scratch.delete(new java.io.File(tmp))
    spark.stop()
  }
}
