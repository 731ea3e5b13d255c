package graft

import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.operators.Multimodal

/** Dev probe (Test scope): the m9 predict-then-wave breaker under a
  * REALISTIC planted hot bucket — every image shares block 0 (the
  * flat-region failure mode) while the other 56 bits are pseudo-random,
  * so the hot (bpos=0, bval) bucket holds N DISTINCT fingerprints the
  * rep-collapse cannot absorb and the bucket join must probe ~C(N,2)
  * pairs. Reports the exact predicted volume, the wave decision under
  * the default ceiling, and the waved-vs-single-wave wall + output
  * differential (the FuzzyAutoWaveProbe convention: trip at scale,
  * conservation, bounded scratch at ~no wall cost).
  *
  * Usage: sbt "Test/runMain graft.AhashWaveProbe [nImages]"
  */
object AhashWaveProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(60000)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    // 0/255 pixels make bits directly controllable (bit_j = 1 iff
    // p_j = 255 whenever not all pixels are lit): bit 0 set for all
    // images (the shared hot block), bits 8-63 pseudo-random per id
    val imgs = spark.range(n.toLong).select(col("id").as("doc_id"),
      expr("""transform(sequence(0, 63), j ->
             |  IF(j = 0, 255L,
             |     IF(j < 8, 0L,
             |        IF(pmod(xxhash64(id, j), 2) = 1, 255L, 0L))))"""
        .stripMargin).as("px"))
    def run(tag: String, ceiling: Long): Long = {
      spark.catalog.clearCache()
      var waves = 0
      val t0 = System.nanoTime()
      val pairs = Multimodal.ahashNearDupPairs(imgs, "doc_id", "px",
        maxDist = 7, pairWorkCeiling = ceiling, onWaves = waves = _).count()
      println(f"[ahashwave] $tag%-12s n=$n waves=$waves " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%.2f s pairs=$pairs")
      pairs
    }
    // warm pass (codegen of the aHash tree dominates the first run)
    run("warm", Long.MaxValue / 4)
    val single = run("single-wave", Long.MaxValue / 4)
    val waved = run("default", Multimodal.DefaultPairWorkCeiling)
    require(single == waved,
      s"wave partition lost pairs: $single vs $waved")
    spark.stop()
  }
}
