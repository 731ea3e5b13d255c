package graft

import org.apache.spark.sql.streaming.StreamingQuery

import graft.streaming.StreamMotif
import graft.streaming.StreamMotif.{MotifDelta, MotifEvent}

class StreamMotifSpec extends SparkSpecBase {

  private def ev(uid: Long, sec: Long, id: Long, ty: String): MotifEvent =
    MotifEvent(uid, new java.sql.Timestamp(sec * 1000L), sec * 1000000L,
      id, ty)

  private def driveWaves(motif: Seq[String], delay: String,
                         waves: Seq[Seq[MotifEvent]]): Seq[MotifDelta] = {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[MotifEvent]
    val out = StreamMotif.deltas(
      input.toDS().withWatermark("ts", delay).as[MotifEvent], motif)
    val name = "motif_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q: StreamingQuery = out.writeStream.format("memory")
      .queryName(name).outputMode("append").start()
    try {
      waves.foreach { w => input.addData(w); q.processAllAvailable() }
      s.table(name).as[MotifDelta].collect().toSeq
    } finally q.stop()
  }

  test("carry across finalization boundaries; frontier withholds the tail") {
    // user 1, motif [A,B], delay 10s:
    //  wave 1: A@1 B@2 A@3 — wm 0, nothing finalized
    //  wave 2: B@30        — wm still < 1s
    //  wave 3: C@60        — wm 20s finalizes A,B,A → 1 hit, carry [A]
    //  wave 4: D@100       — wm 50s finalizes B@30 → the STRADDLING
    //          occurrence (A@3, B@30) counts via carry, exactly once
    //  final timeout drain at wm 90s finalizes C@60 ([B,C] → no hit);
    //  D@100 sits past the frontier and is never emitted
    val got = driveWaves(Seq("A", "B"), "10 seconds", Seq(
      Seq(ev(1, 1, 1, "A"), ev(1, 2, 2, "B"), ev(1, 3, 3, "A")),
      Seq(ev(1, 30, 4, "B")),
      Seq(ev(1, 60, 5, "C")),
      Seq(ev(1, 100, 6, "D"))))
    assert(got.map(_.n).sum == 2L, s"deltas: $got")
    assert(got.forall(_.user_id == 1L))
  }

  test("a late arrival below the watermark cannot corrupt a finalized prefix") {
    // by wave 3 the watermark is 20s and A@1 B@2 are finalized (1 hit);
    // the late B@4 (wave 4, far below wm 50s) must be dropped — merged,
    // it would sit after A@3 and fabricate a second occurrence
    val got = driveWaves(Seq("A", "B"), "10 seconds", Seq(
      Seq(ev(1, 1, 1, "A"), ev(1, 2, 2, "B"), ev(1, 3, 3, "A")),
      Seq(ev(1, 30, 4, "X")),
      Seq(ev(1, 60, 5, "X")),
      Seq(ev(1, 4, 6, "B")),
      Seq(ev(1, 100, 7, "X"))))
    assert(got.map(_.n).sum == 1L, s"late row leaked into the order: $got")
  }

  test("overlapping occurrences count, per key, matching the batch reference") {
    val rnd = new scala.util.Random(2029)
    val types = Vector("A", "B", "C")
    val all = (1 to 240).map { i =>
      ev((rnd.nextInt(6) + 1).toLong, 10L + rnd.nextInt(600), i.toLong,
        types(rnd.nextInt(3)))
    }.sortBy(e => (e.us, e.event_id))
    val waves = all.grouped(80).toSeq ++
      // two far-future closers push the watermark past every real event
      Seq(Seq(ev(99, 5000, 9998, "X")), Seq(ev(99, 9000, 9999, "X")))
    val motif = Seq("A", "B")
    val got = driveWaves(motif, "10 seconds", waves)
      .groupBy(_.user_id).view.mapValues(_.map(_.n).sum).toMap
    val ref = all.groupBy(_.user_id).view.mapValues { es =>
      es.sortBy(e => (e.us, e.event_id)).map(_.event_type)
        .sliding(motif.size).count(_.toList == motif.toList).toLong
    }.toMap.filter(_._2 > 0)
    assert(got == ref)
  }
}
