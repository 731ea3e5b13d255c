package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators Spark has no single built-in for: backward as-of
  * join and gap-based sessionization.
  *
  * The as-of join is the union + sorted-window carry-forward
  * formulation: tag both sides, union them, and within each key carry
  * the last right-side row forward over the time-sorted stream. ONE
  * shuffle on (keys), no inequality join — the naive range-join
  * (`l.t >= r.t` + argmax) explodes to O(|L|·|R|) per key and is the
  * classic 100 TB scale-killer this formulation exists to avoid.
  */
object Temporal {

  /** Tagged union both as-of directions run their window pass over:
    * keys ++ __t ++ __side (right = 0, left = 1) ++ left's own columns
    * (null on right rows) ++ `asof_`-prefixed carry columns (null on
    * left rows).
    */
  private def asofUnion(left: DataFrame, right: DataFrame, keys: Seq[String],
                        leftTime: String, rightTime: String,
                        carryCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("__t"), lit(1).as("__side")) ++
        leftCols.filterNot(keys.contains).map(col) ++
        carryCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"asof_$c")): _*)
    val r = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as("__t"), lit(0).as("__side")) ++
        leftCols.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        carryCols.map(c => col(c).as(s"asof_$c")): _*)
    l.unionByName(r)
  }

  /** The carried right-side row as ONE struct: per-column last(...,
    * ignoreNulls) would skip a genuinely-NULL field on the nearest
    * right row (attaching an older row's value, possibly a different
    * row per column) — DuckDB ASOF semantics attach the matched row
    * wholesale, internal NULLs preserved. The when() is NULL exactly
    * on left rows, so ignoreNulls skips those but keeps any right
    * row's struct, null fields and all. `__t` rides inside the struct
    * so [[asofJoinNearest]] can compare candidate distances.
    */
  private def carryStruct(carryCols: Seq[String]) =
    when(col("__side") === 0,
      struct(Seq(col("__t").as("__rt")) ++
        carryCols.map(c => col(s"asof_$c").as(c)): _*))

  private def unpackCarry(df: DataFrame, carryField: String,
                          carryCols: Seq[String]): DataFrame =
    carryCols.foldLeft(df) { (d, c) =>
        d.withColumn(s"asof_$c", col(s"$carryField.$c"))
      }
      .filter(col("__side") === 1)
      .drop("__t", "__side", "__carry_b", "__carry_f")

  /** For each left row, attach the latest right row with
    * `right.timeCol <= left.timeCol` on equal `keys` (backward as-of,
    * ties include the right row). `carryCols` are the right columns to
    * attach, null when no prior right row exists (left-join shape).
    * Column name collisions: carried columns get `asof_` prefixes.
    */
  def asofJoinBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                       leftTime: String, rightTime: String,
                       carryCols: Seq[String]): DataFrame = {
    val carried = asofUnion(left, right, keys, leftTime, rightTime, carryCols)
      .withColumn("__carry_b",
        last(carryStruct(carryCols), ignoreNulls = true).over(windowBackward(keys)))
    unpackCarry(carried, "__carry_b", carryCols)
  }

  /** [[asofJoinBackward]] with a MATCH-AGE BOUND — pandas
    * merge_asof's `tolerance` knob: a carried right row older than
    * `tolerance` before the left time is nulled out, not matched.
    * Implemented as a pure projection ON TOP of the same one-shuffle
    * carry plan (the right time always rides the carry struct), so
    * the plan shape is identical to the unbounded form — no second
    * window, no join. The stale-match null means "no error within the
    * window", which is the semantics label-attachment pipelines need
    * (an exposure with no outcome inside the horizon is unlabeled,
    * not labeled with a year-old outcome).
    */
  def asofJoinBackwardTolerance(left: DataFrame, right: DataFrame,
                                keys: Seq[String], leftTime: String,
                                rightTime: String, carryCols: Seq[String],
                                tolerance: String): DataFrame = {
    val carry =
      if (carryCols.contains(rightTime)) carryCols else rightTime +: carryCols
    val joined = asofJoinBackward(left, right, keys, leftTime, rightTime, carry)
    val within =
      col(s"asof_$rightTime") >= col(leftTime) - expr(s"INTERVAL $tolerance")
    val nulled = carry.foldLeft(joined)((df, c) =>
      df.withColumn(s"asof_$c", when(within, col(s"asof_$c"))))
    // the right time rode the carry struct only to evaluate `within` —
    // if the caller did not ask for it, drop it so the schema is
    // exactly asofJoinBackward's for the same carryCols
    if (carryCols.contains(rightTime)) nulled
    else nulled.drop(s"asof_$rightTime")
  }

  /** Backward-carry window: ascending (__t, __side) — at equal __t the
    * right row (side 0) sorts first, so a right row exactly at a left
    * row's time is inside its preceding frame (<= semantics).
    */
  private def windowBackward(keys: Seq[String]) =
    Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

  /** Forward-carry window: time-DESCENDING sort with the same GROWING
    * [unboundedPreceding, currentRow] frame as [[windowBackward]] — in
    * reversed time order the "latest at-or-before" scan IS the
    * "earliest at-or-after" scan. At equal __t the right row (side 0)
    * still sorts first, so an exactly-simultaneous right row is inside
    * the left row's frame (>= tie semantics, mirroring backward's <=).
    *
    * The growing frame is the point: Spark evaluates it incrementally
    * (one aggregate update per row), while any frame anchored at
    * unboundedFollowing — the "natural" forward formulation
    * `first(...) over [currentRow, ∞)` — re-aggregates the remaining
    * partition for EVERY row, O(rows²) per key. Measured on a5b at
    * sf0.1: the shrinking-frame form is ~3.4× the backward pass; this
    * form is sort-cost only.
    */
  private def windowForward(keys: Seq[String]) =
    Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").desc, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

  /** Mirror of [[asofJoinBackward]]: the EARLIEST right row with
    * `right.timeCol >= left.timeCol` (forward as-of, ties include the
    * right row — DuckDB `ASOF ... ON l.ts <= r.ts` semantics). Same
    * single shuffle; the second in-partition sort ([[windowForward]])
    * buys an O(rows) window pass.
    */
  def asofJoinForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftTime: String, rightTime: String,
                      carryCols: Seq[String]): DataFrame = {
    val carried = asofUnion(left, right, keys, leftTime, rightTime, carryCols)
      .withColumn("__carry_f",
        last(carryStruct(carryCols), ignoreNulls = true).over(windowForward(keys)))
    unpackCarry(carried, "__carry_f", carryCols)
  }

  /** Nearest as-of: whichever of the backward / forward candidates sits
    * closer in time, ties (equidistant candidates) resolving BACKWARD
    * (pandas merge_asof direction='nearest' convention). Both carries
    * run over the SAME union — one shuffle on `keys`, two in-partition
    * sorted GROWING-frame passes (never a shrinking frame, see
    * [[windowForward]]), still no inequality join.
    */
  def asofJoinNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftTime: String, rightTime: String,
                      carryCols: Seq[String]): DataFrame = {
    val carried = asofUnion(left, right, keys, leftTime, rightTime, carryCols)
      .withColumn("__carry_b",
        last(carryStruct(carryCols), ignoreNulls = true).over(windowBackward(keys)))
      .withColumn("__carry_f",
        last(carryStruct(carryCols), ignoreNulls = true).over(windowForward(keys)))
    // distances in integral micros; a missing side is infinitely far.
    // <= keeps the backward candidate on exact ties.
    val db = when(col("__carry_b").isNull, lit(Long.MaxValue))
      .otherwise(unix_micros(col("__t")) - unix_micros(col("__carry_b.__rt")))
    val df_ = when(col("__carry_f").isNull, lit(Long.MaxValue))
      .otherwise(unix_micros(col("__carry_f.__rt")) - unix_micros(col("__t")))
    val nearest = carried.withColumn("__carry_n",
      when(db <= df_, col("__carry_b")).otherwise(col("__carry_f")))
    unpackCarry(nearest, "__carry_n", carryCols).drop("__carry_n")
  }

  /** Last-observation-carried-forward resampling: each key's irregular
    * event series becomes a regular `stepSec` grid, every grid point
    * carrying the latest event at-or-before it — how a feature
    * pipeline turns raw logs into fixed-rate model inputs. Grid points
    * are epoch multiples of `stepSec` clipped to each key's own
    * [min, max] span (first point = ceil(min), so every grid row HAS a
    * prior event and the output is null-free), generated by a
    * row-local sequence explode; the carry is [[asofJoinBackward]], so
    * the whole thing is one window pass over the union — no
    * inequality join, no per-grid-point probe. All grid arithmetic in
    * integral epoch seconds (`div`, never float division).
    */
  def resampleLocf(events: DataFrame, keyCol: String, tsCol: String,
                   carryCols: Seq[String], stepSec: Long): DataFrame = {
    val grid = alignedGrid(events, keyCol, tsCol, stepSec)
    asofJoinBackward(grid, events, Seq(keyCol), "grid_ts", tsCol, carryCols)
  }

  /** Each key's `stepSec`-aligned grid clipped to its own [min, max]
    * event span: first point = ceil(min), last = floor(max), so every
    * grid point has BOTH a prior and a following event.
    */
  private def alignedGrid(events: DataFrame, keyCol: String, tsCol: String,
                          stepSec: Long): DataFrame = {
    require(stepSec > 0, s"step must be positive, got $stepSec")
    val secs = expr(s"unix_micros($tsCol) div 1000000")
    events
      .groupBy(col(keyCol))
      .agg(min(secs).as("__lo"), max(secs).as("__hi"))
      // ceil/floor to the step grid in EXACT long arithmetic via pmod
      // (always in [0, step)): lo + pmod(-lo, step) is the least
      // multiple >= lo, hi - pmod(hi, step) the greatest <= hi — for
      // ANY sign of the epoch seconds. Float .divide + cast("long")
      // truncates toward zero and mis-places the grid for pre-1970
      // spans (and drifts past 2^52); the DuckDB oracles use floor
      // division (//), which this matches everywhere.
      .select(col(keyCol),
        (col("__lo") + pmod(-col("__lo"), lit(stepSec))).as("__g0"),
        (col("__hi") - pmod(col("__hi"), lit(stepSec))).as("__g1"))
      // a key whose span straddles no aligned point (short series between
      // two grid lines) has g0 > g1 — sequence() with an explicit
      // positive step THROWS on descending bounds, so guard to empty:
      // the key simply has no grid rows, which is the right semantics
      .select(col(keyCol),
        explode(when(col("__g0") <= col("__g1"),
            sequence(col("__g0"), col("__g1"), lit(stepSec)))
          .otherwise(array().cast("array<long>"))).as("__gs"))
      .select(col(keyCol), timestamp_seconds(col("__gs")).as("grid_ts"))
  }

  /** Linear-interpolation resampling: [[resampleLocf]]'s companion for
    * continuous signals — each grid point gets the straight-line value
    * between its bracketing samples instead of the stale carry. Same
    * execution shape as [[asofJoinNearest]]: grid + events unioned
    * once, ONE shuffle on the key, backward and forward carries as two
    * in-partition window passes — no inequality join, no per-grid
    * probe.
    *
    * Exactness contract: the value is fixed-point micro-units
    * (`floor(v * 1e6)`, one IEEE multiply both engines perform
    * identically), time deltas are integral MILLIS, and the
    * interpolation `vb + (vf-vb)*(g-tb) div (tf-tb)` is pure integer
    * arithmetic with truncating division — Spark `div` and DuckDB `//`
    * both truncate toward zero, so the oracle matches bit-for-bit with
    * no float-drift rounding dance. Overflow envelope: |Δv_micro| ×
    * span_ms < 2^63, i.e. values to ±10³ over series spanning ~200
    * days; wider envelopes scale the fixed-point unit down one notch.
    * A grid point landing exactly on a sample has tb == tf; the guard
    * emits that sample's value (the interpolation limit).
    *
    * Because the grid is clipped to [ceil(min), floor(max)], both
    * carries exist at every grid point and the output is null-free.
    */
  def resampleInterp(events: DataFrame, keyCol: String, tsCol: String,
                     valCol: String, stepSec: Long): DataFrame = {
    val ev = events.select(col(keyCol), col(tsCol),
      floor(col(valCol) * lit(1000000)).as("__vmicro"))
    val grid = alignedGrid(ev, keyCol, tsCol, stepSec)
    asofUnion(grid, ev, Seq(keyCol), "grid_ts", tsCol, Seq("__vmicro"))
      .withColumn("__carry_b",
        last(carryStruct(Seq("__vmicro")), ignoreNulls = true)
          .over(windowBackward(Seq(keyCol))))
      .withColumn("__carry_f",
        last(carryStruct(Seq("__vmicro")), ignoreNulls = true)
          .over(windowForward(Seq(keyCol))))
      .filter(col("__side") === 1)
      .withColumn("__tg", expr("unix_micros(__t) div 1000"))
      .withColumn("__tb", expr("unix_micros(__carry_b.__rt) div 1000"))
      .withColumn("__tf", expr("unix_micros(__carry_f.__rt) div 1000"))
      .withColumn("interp_micro",
        when(col("__tf") === col("__tb"), col("__carry_b.__vmicro"))
          .otherwise(col("__carry_b.__vmicro") +
            expr("(__carry_f.__vmicro - __carry_b.__vmicro)" +
              " * (__tg - __tb) div (__tf - __tb)")))
      .select(col(keyCol), col("__t").as("grid_ts"), col("interp_micro"))
  }

  /** Interval-follow count: for each left row, how many right rows of
    * the same `key` fall in `(leftTime, leftTime + windowMicros]` —
    * the attribution primitive ("clicks within 30 min of the view").
    *
    * The naive formulation is an inequality join, which Spark can only
    * plan as a nested loop — quadratic per key, the canonical 100 TB
    * incident. This is the BANDED decomposition instead: both sides
    * bucket time by the window length, every right match of a left row
    * lives in the left row's bucket or the next one, so each left row
    * expands to exactly 2 (key, bucket) probes and the join is a plain
    * shuffled EQUI-join on (key, bucket) with the exact interval
    * predicate as a post-filter (PlanSpec asserts no nested loop).
    * Candidate volume is bounded by rows-per-(key, window-width) — the
    * data's actual temporal density, not its total size.
    *
    * Zero-match left rows are kept at n_follow = 0 (left-outer shape);
    * time arithmetic runs in integral micros on both sides of the
    * oracle, never float.
    */
  def intervalFollowCount(left: DataFrame, right: DataFrame, key: String,
                          leftId: String, leftTime: String, rightTime: String,
                          windowMicros: Long): DataFrame = {
    require(windowMicros > 0, s"window must be positive, got $windowMicros")
    // bucket = the greatest multiple of windowMicros <= t, in EXACT
    // long arithmetic (t - pmod(t, w); pmod is non-negative for any
    // sign of t). floor(double division) loses exactness past 2^52
    // micros and truncates toward zero below zero — either slides a
    // right row into the wrong bucket, silently missing an in-window
    // pair. Comparing aligned multiples is equivalent to comparing
    // bucket indices without any division at all.
    def bucketOf(t: org.apache.spark.sql.Column) =
      t - pmod(t, lit(windowMicros))
    val l = left.select(col(key), col(leftId),
        unix_micros(col(leftTime)).as("__lt"))
      .withColumn("__b", explode(array(
        bucketOf(col("__lt")),
        bucketOf(col("__lt")) + windowMicros)))
    val r = right.select(col(key).as("__rk"),
        unix_micros(col(rightTime)).as("__rt"))
      .withColumn("__b", bucketOf(col("__rt")))
    l.join(r,
        l("__b") === r("__b") && col(key) === col("__rk") &&
          col("__rt") > col("__lt") &&
          col("__rt") <= col("__lt") + windowMicros,
        "left_outer")
      .groupBy(col(key), col(leftId))
      .agg(count(col("__rt")).as("n_follow"))
  }

  /** Gap-based sessions via Spark's native session_window: events of
    * one user belong to one session while consecutive gaps stay at or
    * under `gap` (an event exactly `gap` later still merges — the
    * per-event [t, t+gap) windows merge when adjacent).
    * Returns one row per session with start / end (= last event
    * time) / size. Single shuffle on the user key; the session merge
    * is the built-in operator, which also works 1:1 under streaming
    * with a watermark.
    */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
                 gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(col(userCol), session_window(col(tsCol), gap).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col(userCol), col("w.start").as("session_start"),
        (col("w.end") - expr(s"INTERVAL $gap")).as("session_end"),
        col("n_events"))

  /** Trailing-`windowDays` distinct actives per day (DAU→WAU family).
    * No engine's window exec supports COUNT(DISTINCT) over a frame;
    * the scalable form is contribution expansion: dedup to
    * (user, day) grain FIRST, then each pair contributes to the
    * `windowDays` target days it keeps the user active for, then one
    * distinct-agg. The ×windowDays blowup happens AFTER per-day
    * dedup, so shuffle is O(windowDays · active-pairs) — orders below
    * event volume — and no per-day user set is ever held in memory.
    *
    * Output covers observed days only: trailing contributions past the
    * last event date are clipped (a day after the data ends is not a
    * decaying phantom WAU), and days whose whole trailing window is
    * empty are absent rather than 0 — zero-filling needs a calendar
    * dimension, which is the caller's join. The clip bound is derived
    * INSIDE the one pass: posexplode tags each pair's origin day
    * (pos 0), the distinct-agg keeps an is-observed flag per day, and
    * the global max of observed days is a window over the day-grain
    * output — O(days) rows by construction — so nothing is persisted,
    * nothing is joined, and the events relation is read exactly once.
    */
  def rollingActiveUsers(events: DataFrame, userCol: String, tsCol: String,
                         windowDays: Int = 7): DataFrame = {
    require(windowDays > 0, s"windowDays must be positive, got $windowDays")
    val byDay = events
      .select(to_date(col(tsCol)).as("d"), col(userCol).as("u")).distinct()
      .select(posexplode(sequence(col("d"), date_add(col("d"), windowDays - 1)))
        .as(Seq("pos", "day")), col("u"))
      .groupBy(col("day"))
      .agg(countDistinct(col("u")).as("wau"),
        max(when(col("pos") === 0, 1).otherwise(0)).as("observed"))
    // single-partition window over day-grain rows only (years of data
    // = thousands of rows), never over events
    val all = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    byDay
      .withColumn("maxd", max(when(col("observed") === 1, col("day"))).over(all))
      .filter(col("day") <= col("maxd"))
      .select(col("day"), col("wau"))
  }

  /** Ordered-funnel analysis: for each key, the first time of step 1,
    * the first step-2 event strictly AFTER it, the first step-3 event
    * strictly after that, … plus how many steps completed. The classic
    * conversion query (view → click → purchase), JOIN-FREE: each
    * step's first-qualifying time is a whole-partition window min that
    * may reference the previous step's column, so the plan is ONE
    * shuffle on the key and a chain of Window passes over the same
    * partitioning — versus the naive per-step self-joins, which
    * shuffle the event table once per step. Window state is O(1) per
    * partition (a running min), never a buffered user history.
    *
    * Strict `>` between steps: a step-2 event at exactly the step-1
    * time does not convert (and events are micro-second grained on
    * both engines, so the oracle's comparison agrees bit-for-bit).
    */
  def funnel(events: DataFrame, keyCol: String, tsCol: String,
             typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val wu = Window.partitionBy(col("k"))
    var df = events.select(col(keyCol).as("k"), col(tsCol).as("t"),
      col(typeCol).as("ty"))
    steps.zipWithIndex.foreach { case (step, i) =>
      val afterPrev =
        if (i == 0) lit(true) else col("t") > col(s"__s${i - 1}")
      df = df.withColumn(s"__s$i",
        min(when(col("ty") === step && afterPrev, col("t"))).over(wu))
    }
    val stepCols = steps.indices.map(i => max(col(s"__s$i")).as(s"ts_step${i + 1}"))
    // ascending fold so the HIGHEST completed step is the outermost
    // branch: when(s3, 3).otherwise(when(s2, 2).otherwise(...))
    val completed = steps.indices.foldLeft(lit(0L)) { (acc, i) =>
      when(col(s"ts_step${i + 1}").isNotNull, lit((i + 1).toLong)).otherwise(acc)
    }
    df.groupBy(col("k"))
      .agg(stepCols.head, stepCols.tail: _*)
      .withColumn("steps_completed", completed)
  }

  /** Time-weighted average (TWAP): each observation's value holds until
    * the key's next observation (the LOCF integral), so
    * twap = Σ vᵢ·Δtᵢ / Σ Δtᵢ over consecutive pairs. One window pass
    * (lead over the per-key time order) then one hash aggregate — the
    * same single-shuffle shape as any per-key window, state O(1) per
    * row. The last observation of each key spans no interval and drops
    * out; keys with one observation produce no row, and so does a key
    * whose observations all share one timestamp (zero total interval —
    * the same undefined statistic). Each cents·micros term is guarded
    * by an in-plan int64 assert_true (the dyadicEwma envelope).
    *
    * Determinism contract: values floor into integral cents and time
    * into epoch micros BEFORE any arithmetic, so numerator/denominator
    * are exact integral sums (order-free; the numerator accumulates in
    * DECIMAL(38,0) and is asserted back into int64); the quotient is
    * emitted in
    * micro-units via the explicit `floor(x + 0.5)` (engine round()
    * tie-break hazard, as s6). `tieCol` breaks equal-timestamp
    * ordering — without it, which tied row spans the interval is
    * engine-dependent and the sums diverge.
    */
  def timeWeightedAvg(events: DataFrame, keyCol: String, tsCol: String,
                      valCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col("k")).orderBy(col("us"), col("tie"))
    events
      .select(col(keyCol).as("k"), unix_micros(col(tsCol)).as("us"),
        col(tieCol).as("tie"),
        floor(col(valCol) * 100).cast("long").as("c"))
      .withColumn("nxt", lead(col("us"), 1).over(w))
      .filter(col("nxt").isNotNull)
      // int64 envelope, widened where the arithmetic actually happens:
      // each term c·Δt (cents·micros) and their per-key sum are
      // computed in DECIMAL(38,0) — exact, never wraps (|long·long| ≤
      // 8.5e37 < 10^38) — and the AGGREGATED numerator is asserted
      // back into int64 before the long cast below. The previous
      // per-term guard had two holes the decimal path closes: its
      // bound used `/` (double division — double(Long.MaxValue)
      // rounds UP, so a passing term could still wrap), and a sum of
      // in-range terms could overflow unguarded under ansi=false.
      .groupBy(col("k"))
      .agg(sum((col("c").cast("decimal(38,0)") *
          (col("nxt") - col("us"))).as("term")).as("numd"),
        sum(col("nxt") - col("us")).as("den"))
      .withColumn("num",
        when(assert_true(
          abs(col("numd")) <= lit(Long.MaxValue).cast("decimal(38,0)"),
          lit("timeWeightedAvg: sum of cents-by-micros terms exceeds " +
            "int64 — the exact numerator cannot be emitted as a long"))
          .isNull, col("numd").cast("long")))
      // a key whose observations all share one timestamp has intervals
      // of zero total length — the same no-interval situation as a
      // single observation, which the contract defines as "no row"
      // (num/den would be 0/0: null here, NaN in a double engine —
      // divergent spellings of an undefined statistic)
      .filter(col("den") > 0)
      .select(col("k"), col("num"), col("den"),
        floor(col("num") / col("den") * 10000 + 0.5).cast("long")
          .as("twap_micro"))
  }

  /** OHLC bars (open/high/low/close downsampling): per (key,
    * time-bucket), the first and last value in (tsCol, idCol) order
    * plus the min/max and the event count — the classic telemetry /
    * market-data compaction.
    *
    * Exactness: high/low/open/close are SELECTIONS of stored values,
    * never arithmetic, so raw doubles pass through bit-identical on
    * any engine. First/last are decided by [[Changelog.packedOrderKey]]
    * — min/max over the order-isomorphic packed (ts, id) DECIMAL — so
    * the whole bar is ONE map-side-combined HashAggregate, O(buckets)
    * through the shuffle; the `first_value` window spelling sorts
    * every bucket's history, and `min_by`/`max_by` sort-aggregate
    * (the c1 argument). Open/close values are then recovered by two
    * equi-joins on the UNIQUE id — the O(buckets) bar relation joins
    * the event stream, broadcast-able whenever bars fit.
    */
  def ohlcBars(events: DataFrame, keyCol: String, tsCol: String,
               idCol: String, valCol: String, bucket: String = "hour",
               idSpace: Long = 10000000000L): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val bars = events
      .select(col(keyCol).as("k"),
        date_trunc(bucket, col(tsCol)).as("bucket_ts"),
        col(valCol).as("v"),
        graft.operators.Changelog.packedOrderKey(tsCol, idCol, idSpace)
          .as("__pk"))
      .groupBy(col("k"), col("bucket_ts"))
      .agg(count(lit(1)).as("n_events"),
        max(col("v")).as("high"), min(col("v")).as("low"),
        min(col("__pk")).as("__opk"), max(col("__pk")).as("__cpk"))
      .withColumn("__oid", (col("__opk") % lit(idSpace).cast(dec)).cast("long"))
      .withColumn("__cid", (col("__cpk") % lit(idSpace).cast(dec)).cast("long"))
    val vals = events.select(col(idCol), col(valCol))
    bars
      .join(vals.select(col(idCol).as("__oid"), col(valCol).as("open")), "__oid")
      .join(vals.select(col(idCol).as("__cid"), col(valCol).as("close")), "__cid")
      .select(col("k").as(keyCol), col("bucket_ts"), col("n_events"),
        col("open"), col("high"), col("low"), col("close"))
  }

  /** Contiguous event-sequence motif counting: per key, how many
    * positions of the (tsCol, tieCol)-ordered event stream start an
    * occurrence of `motif` — `motif.length` CONSECUTIVE events whose
    * types match in order, with nothing between them ([[funnel]]'s
    * complement: the funnel asks "did the steps happen in order,
    * gaps allowed"; the motif asks "did they happen back-to-back",
    * the behavioral-pattern / session-grammar question). Overlapping
    * occurrences all count (AAA contains AA twice), matching the
    * textbook sliding-window semantics an oracle replays verbatim.
    *
    * Shape at 100 TB: one key shuffle; the pattern test is
    * `motif.length − 1` `lead`s over that single window — O(|motif|)
    * frame state per row, no join, no per-key sequence
    * materialization (the collect_list spelling buffers a key's whole
    * history; a hot key OOMs one task). Emits every key that has ≥ 1
    * event, with its event count and motif count — zero-count keys are
    * explicit rows, they are the audit's denominator.
    */
  def motifCount(events: DataFrame, keyCol: String, tsCol: String,
                 tieCol: String, typeCol: String,
                 motif: Seq[String]): DataFrame = {
    require(motif.nonEmpty, "motif must be non-empty")
    val w = Window.partitionBy(col("k")).orderBy(col("t"), col("tie"))
    val base = events.select(col(keyCol).as("k"), col(tsCol).as("t"),
      col(tieCol).as("tie"), col(typeCol).as("ty"))
    val withLeads = motif.indices.tail.foldLeft(base) { (df, i) =>
      df.withColumn(s"__t$i", lead(col("ty"), i).over(w))
    }
    val hit = motif.zipWithIndex.map { case (step, i) =>
      (if (i == 0) col("ty") else col(s"__t$i")) === lit(step)
    }.reduce(_ && _)
    withLeads.groupBy(col("k"))
      .agg(count(lit(1)).as("n_events"),
        count(when(hit, lit(1))).as("n_motifs"))
  }

  /** Cohort retention matrix: users grouped by first-active week,
    * distinct-counted per subsequent activity week. Grains coarsen
    * monotonically — events → (user, week) distinct → per-user min →
    * (cohort, week_no) counts — so each shuffle is strictly smaller
    * than the last. The first-active week is a running min OVER the
    * user partition — not a separate aggregate joined back — so the
    * (user, week) relation is computed once, nothing is persisted, and
    * there is no self-join at all; per-user window state is the user's
    * week list, bounded by the calendar.
    */
  def cohortRetention(events: DataFrame, userCol: String,
                      tsCol: String): DataFrame =
    events.select(col(userCol).as("u"),
        date_trunc("week", to_date(col(tsCol))).cast("date").as("w"))
      .distinct()
      .withColumn("cohort_w",
        min(col("w")).over(Window.partitionBy(col("u"))))
      .groupBy(col("cohort_w"),
        floor(datediff(col("w"), col("cohort_w")) / 7).cast("long")
          .as("week_no"))
      .agg(countDistinct(col("u")).as("n_users"))

  /** Dyadic exponentially-weighted trailing average: over each key's
    * last `w` events (the row itself plus `w−1` predecessors in
    * (time, id) order), the weighted mean with weights 2^(w−1), …, 2, 1
    * from newest to oldest — the pandas `ewm(alpha=0.5)` shape with the
    * tail truncated at `w`, which is what makes it EXACT: value micros
    * (the a10/a11 `floor(v·10⁶)` convention) times power-of-two weights
    * summed in int64, floor-divided by the constant weight total
    * 2^w − 1. No float accumulation order, no pow(), bit-identical on
    * any engine. The int64 safety envelope is enforced in-plan:
    * every |value·10⁶| must be ≤ Long.MaxValue / (2^w − 1) (an
    * `assert_true` guard — at the default w=8 that is ~3.6·10^16,
    * i.e. |value| up to ~3.6·10^10), so the weighted sum provably
    * fits and can never silently wrap.
    *
    * Only full windows emit (the a11 contract: a smoothed value built
    * on fewer than `w` observations is not the statistic it claims to
    * be — and `lag` nulls enforce that for free: one null poisons the
    * weighted sum). The `w` lags are ONE window pass over one key
    * shuffle — O(w) frame state, no join, no self-union; the weighted
    * combination is a codegen'd projection of the lag columns.
    */
  def dyadicEwma(df: DataFrame, keyCol: String, valueCol: String,
                 timeCol: String, idCol: String, w: Int = 8): DataFrame = {
    require(w >= 1 && w <= 62, s"w must be in [1, 62], got $w")
    // Exact int64 precondition: the weighted sum is at most
    // max|v| · (2^w − 1), so every |v| must fit Long.MaxValue / (2^w − 1)
    // or the fold silently wraps (ansi=false). Enforced in-plan (the c1
    // assert_true pattern): a violating row fails the job loudly instead
    // of emitting garbage ewma_micro.
    val vMax = Long.MaxValue / ((1L << w) - 1)
    val ev = df.select(col(idCol), col(keyCol), col(timeCol),
      floor(col(valueCol) * lit(1000000L)).cast("long").as("__v0"))
      .withColumn("v",
        when(assert_true(abs(col("__v0")) <= lit(vMax),
          lit(s"dyadicEwma(w=$w): |value|*1e6 exceeds $vMax — " +
            "the int64 weighted sum would overflow")).isNull, col("__v0")))
      .drop("__v0")
    val win = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol), col(idCol))
    val num = (0 until w).map { j =>
      lag(col("v"), j).over(win) * lit(1L << (w - 1 - j))
    }.reduce(_ + _)
    ev.withColumn("__num", num)
      .filter(col("__num").isNotNull)
      .select(col(idCol), col(keyCol), col("v").as("value_micro"),
        expr(s"__num div ${(1L << w) - 1}").as("ewma_micro"))
  }

  /** Peak concurrency per day: the maximum number of intervals
    * simultaneously active, from a boundary sweep — every interval
    * emits (+1 at start, −1 at end), and a day's peak is the max over
    * its boundaries of the concurrency AT the boundary instant:
    * `prefix_before + greatest(delta, 0)`. A start counts itself
    * (prefix+1); an end still counts its own session (prefix
    * unchanged), because intervals are CLOSED on both ends — a session
    * ending at the exact instant another starts overlaps it (hence
    * starts sort before ends at a tie, the packed key's low bit).
    * Sampling AT the boundary (not after it) is what makes a day whose
    * only boundaries are ends — sessions carried over midnight that
    * merely finish that day — report the true carry-in peak instead
    * of the post-departure count.
    *
    * The textbook sweep is a `Window.orderBy(time)` over every
    * boundary — one partition holding the whole relation, the same
    * scale-killer [[graft.operators.SequencePack]] exists to avoid, and
    * its two-level [[graft.operators.SequencePack.prefixSum]] is
    * exactly the fix here (signed ±1 weights): one range exchange + one
    * O(partitions) offset plan + partition-local windows, then an
    * O(days)-grain aggregate. Tied boundaries share a packed key only
    * with SAME-SIGN deltas (the delta is the key's parity), so the set
    * of running values over a tie group — and hence the day max — is
    * order-invariant; per-boundary prefixes are not individually
    * emitted.
    *
    * Output: one row per day that contains at least one boundary —
    * `(day, peak_concurrent, n_starts, n_ends)`. A day a session spans
    * entirely without starting or ending is absent (its concurrency is
    * constant and owned by the neighboring boundary days); emitting it
    * needs a calendar dimension, which is the caller's join.
    */
  def peakConcurrency(sessions: DataFrame, startCol: String,
                      endCol: String, numParts: Int = 0): DataFrame = {
    val b = sessions.select(col(startCol).as("__t"), lit(1L).as("__delta"))
      .unionAll(sessions.select(col(endCol).as("__t"), lit(-1L).as("__delta")))
      .withColumn("__ord",
        unix_micros(col("__t")) * 2 + when(col("__delta") < 0, 1L).otherwise(0L))
    SequencePack.prefixSum(b, "__ord", "__delta", numParts)
      .groupBy(to_date(col("__t")).as("day"))
      .agg(max(col("prefix_before") + greatest(col("__delta"), lit(0L)))
          .as("peak_concurrent"),
        sum(when(col("__delta") === 1L, 1L).otherwise(0L)).as("n_starts"),
        sum(when(col("__delta") === -1L, 1L).otherwise(0L)).as("n_ends"))
  }
}
