package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{CatalogQuery, QueryModule, Tables}
import graft.operators.Temporal

/** As-of join and sessionization over the events table, both
  * DuckDB-oracled (native ASOF JOIN on one side; identical manual
  * window arithmetic on the other). DuckDB compares raw nano
  * timestamps while Spark compares the micro truncation — divergence
  * would need two events of one user inside the same microsecond,
  * which the minute-scale event data cannot produce.
  */
object TemporalQueries extends QueryModule {

  private val asof = CatalogQuery(
    "a1_asof_click_error",
    (s, dir) => {
      val e = Tables(s, dir).events
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts").as("click_ts"))
      val errors = e.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts").as("err_ts"), col("value"))
      Temporal.asofJoinBackward(clicks, errors, keys = Seq("user_id"),
          leftTime = "click_ts", rightTime = "err_ts",
          carryCols = Seq("err_ts", "value"))
        .select(col("event_id"), col("user_id"), col("click_ts"),
          col("asof_err_ts").as("last_error_ts"),
          col("asof_value").as("last_error_value"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT c.event_id, c.user_id, CAST(c.ts AS TIMESTAMP) AS click_ts,
           |       CAST(e.ts AS TIMESTAMP) AS last_error_ts,
           |       e.value AS last_error_value
           |FROM (SELECT * FROM events WHERE event_type = 'click') c
           |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
           |  ON c.user_id = e.user_id AND c.ts >= e.ts
           |ORDER BY c.event_id""".stripMargin),
    doc = "Backward as-of join (latest error before each click, per " +
      "user) via union + window carry-forward — one shuffle, no " +
      "inequality join")

  /** a1's FORWARD mirror: the next error at-or-after each click — the
    * direction DuckDB's own ASOF (`l.ts <= r.ts`) and every
    * label-attachment pipeline ("first outcome after the exposure")
    * need alongside backward. Same union + window skeleton, scanned in
    * time-descending order so the carry stays an incremental growing
    * frame (see [[graft.operators.Temporal.windowForward]]).
    */
  private val asofForward = CatalogQuery(
    "a1b_asof_forward",
    (s, dir) => {
      val e = Tables(s, dir).events
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts").as("click_ts"))
      val errors = e.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts").as("err_ts"), col("value"))
      Temporal.asofJoinForward(clicks, errors, keys = Seq("user_id"),
          leftTime = "click_ts", rightTime = "err_ts",
          carryCols = Seq("err_ts", "value"))
        .select(col("event_id"), col("user_id"), col("click_ts"),
          col("asof_err_ts").as("next_error_ts"),
          col("asof_value").as("next_error_value"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT c.event_id, c.user_id, CAST(c.ts AS TIMESTAMP) AS click_ts,
           |       CAST(e.ts AS TIMESTAMP) AS next_error_ts,
           |       e.value AS next_error_value
           |FROM (SELECT * FROM events WHERE event_type = 'click') c
           |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
           |  ON c.user_id = e.user_id AND c.ts <= e.ts
           |ORDER BY c.event_id""".stripMargin),
    doc = "Forward as-of join (next error after each click) — the " +
      "union + window carry, frame flipped; oracle is DuckDB's native " +
      "forward ASOF")

  /** NEAREST as-of: backward and forward candidates carried in ONE
    * shuffle (two in-partition window passes over the same union),
    * the closer one picked in integral micros, exact ties resolving
    * backward. The oracle composes DuckDB's two native ASOF
    * directions and replays the same pick arithmetic.
    */
  private val asofNearest = CatalogQuery(
    "a1c_asof_nearest",
    (s, dir) => {
      val e = Tables(s, dir).events
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts").as("click_ts"))
      val errors = e.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts").as("err_ts"), col("value"))
      Temporal.asofJoinNearest(clicks, errors, keys = Seq("user_id"),
          leftTime = "click_ts", rightTime = "err_ts",
          carryCols = Seq("err_ts", "value"))
        .select(col("event_id"), col("user_id"), col("click_ts"),
          col("asof_err_ts").as("near_error_ts"),
          col("asof_value").as("near_error_value"))
        .orderBy(col("event_id"))
    },
    Some("""WITH c AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
           |           FROM events WHERE event_type = 'click'),
           |e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
           |      FROM events WHERE event_type = 'error'),
           |b AS (SELECT c.event_id, e.ts AS bts, e.value AS bval
           |      FROM c ASOF LEFT JOIN e
           |        ON c.user_id = e.user_id AND c.ts >= e.ts),
           |f AS (SELECT c.event_id, e.ts AS fts, e.value AS fval
           |      FROM c ASOF LEFT JOIN e
           |        ON c.user_id = e.user_id AND c.ts <= e.ts)
           |SELECT c.event_id, c.user_id, c.ts AS click_ts,
           |  CASE WHEN fts IS NULL THEN bts
           |       WHEN bts IS NULL THEN fts
           |       WHEN epoch_us(c.ts) - epoch_us(bts)
           |              <= epoch_us(fts) - epoch_us(c.ts) THEN bts
           |       ELSE fts END AS near_error_ts,
           |  CASE WHEN fts IS NULL THEN bval
           |       WHEN bts IS NULL THEN fval
           |       WHEN epoch_us(c.ts) - epoch_us(bts)
           |              <= epoch_us(fts) - epoch_us(c.ts) THEN bval
           |       ELSE fval END AS near_error_value
           |FROM c
           |JOIN b USING (event_id) JOIN f USING (event_id)
           |ORDER BY c.event_id""".stripMargin),
    doc = "Nearest as-of join (closest error either side of each " +
      "click, ties backward) — both directions in one shuffle; oracle " +
      "composes DuckDB's two native ASOF directions")

  /** a1's tolerance variant (pandas merge_asof `tolerance`): a match
    * older than 2 hours is NULLed, not carried — an exposure with no
    * outcome inside the horizon is unlabeled, never labeled with a
    * stale one. Same one-shuffle carry plan; the bound is a pure
    * projection. The oracle runs DuckDB's native ASOF and applies the
    * identical age test.
    */
  private val asofTolerance = CatalogQuery(
    "a1d_asof_tolerance",
    (s, dir) => {
      val e = Tables(s, dir).events
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts").as("click_ts"))
      val errors = e.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts").as("err_ts"), col("value"))
      Temporal.asofJoinBackwardTolerance(clicks, errors,
          keys = Seq("user_id"), leftTime = "click_ts",
          rightTime = "err_ts", carryCols = Seq("err_ts", "value"),
          tolerance = "2 hours")
        .select(col("event_id"), col("user_id"), col("click_ts"),
          col("asof_err_ts").as("last_error_ts"),
          col("asof_value").as("last_error_value"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT c.event_id, c.user_id, CAST(c.ts AS TIMESTAMP) AS click_ts,
           |  CASE WHEN e.ts >= c.ts - INTERVAL 2 HOUR
           |       THEN CAST(e.ts AS TIMESTAMP) END AS last_error_ts,
           |  CASE WHEN e.ts >= c.ts - INTERVAL 2 HOUR
           |       THEN e.value END AS last_error_value
           |FROM (SELECT * FROM events WHERE event_type = 'click') c
           |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
           |  ON c.user_id = e.user_id AND c.ts >= e.ts
           |ORDER BY c.event_id""".stripMargin),
    doc = "Backward as-of join with a 2-hour tolerance horizon " +
      "(stale matches null out): merge_asof semantics on the same " +
      "single-shuffle union + window carry")

  private val sessions = CatalogQuery(
    "a2_sessionize",
    (s, dir) =>
      Temporal.sessionize(
          Tables(s, dir).events.select(col("user_id"), col("ts")),
          "user_id", "ts", gap = "30 minutes")
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("n_events"))
        .orderBy(col("user_id"), col("session_start")),
    // strict > on the gap: Spark's session_window MERGES an event
    // exactly `gap` after the previous one (its [t, t+gap) windows
    // merge when adjacent) — caught by TemporalSpec's brute-force
    // differential; the events testdata never hits the boundary, so
    // the >= form also hash-matched by accident
    Some("""WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
           |b AS (SELECT user_id, ts,
           |        CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
           |               OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
           |                    > INTERVAL 30 MINUTE
           |             THEN 1 ELSE 0 END AS brk
           |      FROM e),
           |s AS (SELECT user_id, ts,
           |        sum(brk) OVER (PARTITION BY user_id ORDER BY ts
           |                       ROWS UNBOUNDED PRECEDING) AS sid
           |      FROM b)
           |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
           |       count(*) AS n_events
           |FROM s GROUP BY user_id, sid
           |ORDER BY user_id, session_start""".stripMargin),
    doc = "Gap-based sessionization via native session_window (30 min " +
      "gap), replayed in DuckDB with manual lag/cumsum windows")

  /** Semi-structured extraction: the events `props` column is a JSON
    * string; parse it with a typed from_json (schema declared, codegen
    * path, invalid JSON → null) and aggregate the extracted field.
    * At 100 TB: declare-then-extract beats per-use get_json_object
    * re-parsing, and the projection prunes to (event_type, props).
    */
  private val json = CatalogQuery(
    "a3_json_props",
    (s, dir) => {
      import org.apache.spark.sql.types._
      Tables(s, dir).events
        .select(col("event_type"),
          from_json(col("props"), StructType(Seq(StructField("k", LongType))))
            .getField("k").as("k"))
        .groupBy(col("event_type"))
        .agg(count(col("k")).as("n_with_k"),
          round(avg(col("k")), 4).as("avg_k"),
          sum(col("k")).as("sum_k"))
        .orderBy(col("event_type"))
    },
    Some("""SELECT event_type,
           | count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
           | round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
           | CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
           |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
    doc = "Typed JSON extraction (from_json with declared schema) + " +
      "aggregation over the extracted field")

  /** The oracle writes the join the natural (inequality) way — DuckDB
    * handles that fine at gate scale — while the engine runs the
    * banded equi-join decomposition; the hash compare proves the
    * decomposition exact, boundary semantics included.
    */
  private val intervalFollow = CatalogQuery(
    "a4_interval_follow",
    (s, dir) => {
      val e = Tables(s, dir).events
      Temporal.intervalFollowCount(
          left = e.filter(col("event_type") === "view"),
          right = e.filter(col("event_type") === "click"),
          key = "user_id", leftId = "event_id",
          leftTime = "ts", rightTime = "ts",
          windowMicros = 30L * 60 * 1000000)
        .orderBy(col("event_id"))
    },
    Some("""SELECT v.user_id, v.event_id,
           |  CAST(count(c.ts) AS BIGINT) AS n_follow
           |FROM (SELECT * FROM events WHERE event_type = 'view') v
           |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
           |  ON c.user_id = v.user_id
           |  AND CAST(c.ts AS TIMESTAMP) > CAST(v.ts AS TIMESTAMP)
           |  AND CAST(c.ts AS TIMESTAMP) <=
           |      CAST(v.ts AS TIMESTAMP) + INTERVAL 30 MINUTE
           |GROUP BY v.user_id, v.event_id
           |ORDER BY v.event_id""".stripMargin),
    doc = "Attribution interval join: clicks within 30 min after each " +
      "view, banded into a shuffled equi-join on (user, time bucket) — " +
      "never a nested loop")

  /** 6-hour LOCF grid over each user's span. (user_id, ts) is unique in
    * the testdata, so the carried row is well-defined; grid points
    * start at ceil(min), so no output is null. The oracle replays the
    * carry with DuckDB's NATIVE ASOF JOIN — an independent
    * implementation of the semantics the engine builds from a window
    * pass. Grid timestamps are built by plain-TIMESTAMP interval
    * arithmetic in the oracle (to_timestamp would detour through
    * TIMESTAMPTZ and the session zone).
    */
  private val resample = CatalogQuery(
    "a5_grid_resample",
    (s, dir) =>
      Temporal.resampleLocf(
          Tables(s, dir).events
            .select(col("user_id"), col("ts"), col("event_id"), col("value")),
          "user_id", "ts", carryCols = Seq("event_id", "value"),
          stepSec = 21600L)
        .orderBy(col("user_id"), col("grid_ts")),
    Some("""WITH e AS (
           |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value
           |  FROM events),
           |bounds AS (
           |  SELECT user_id,
           |    (epoch_us(min(ts))//1000000 + 21599)//21600*21600 AS lo,
           |    (epoch_us(max(ts))//1000000)//21600*21600 AS hi
           |  FROM e GROUP BY user_id),
           |grid AS (
           |  SELECT user_id,
           |    TIMESTAMP '1970-01-01' + t.g * INTERVAL 1 SECOND AS grid_ts
           |  FROM bounds, unnest(range(lo, hi + 1, 21600)) t(g))
           |SELECT g.user_id, g.grid_ts,
           |  e.event_id AS asof_event_id, e.value AS asof_value
           |FROM grid g ASOF JOIN e
           |  ON g.user_id = e.user_id AND e.ts <= g.grid_ts
           |ORDER BY g.user_id, g.grid_ts""".stripMargin),
    doc = "LOCF resampling to a 6-hour grid per user; the engine's " +
      "window-pass carry vs DuckDB's native ASOF JOIN")

  /** a5's linear twin — see [[Temporal.resampleInterp]] for the
    * fixed-point exactness contract (micro-unit values, milli deltas,
    * truncating integer division on both engines). The oracle brackets
    * each grid point with DuckDB's native ASOF in BOTH directions
    * (`<=` backward, `>=` forward) and replays the identical integer
    * interpolation — two independent implementations of the same
    * arithmetic, no rounding tolerance anywhere.
    */
  private val resampleLinear = CatalogQuery(
    "a5b_grid_interp",
    (s, dir) =>
      Temporal.resampleInterp(
          Tables(s, dir).events.select(col("user_id"), col("ts"), col("value")),
          "user_id", "ts", valCol = "value", stepSec = 21600L)
        .orderBy(col("user_id"), col("grid_ts")),
    Some("""WITH e AS (
           |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
           |         CAST(floor(value * 1000000) AS BIGINT) AS vmicro
           |  FROM events),
           |bounds AS (
           |  SELECT user_id,
           |    (epoch_us(min(ts))//1000000 + 21599)//21600*21600 AS lo,
           |    (epoch_us(max(ts))//1000000)//21600*21600 AS hi
           |  FROM e GROUP BY user_id),
           |grid AS (
           |  SELECT user_id,
           |    TIMESTAMP '1970-01-01' + t.g * INTERVAL 1 SECOND AS grid_ts
           |  FROM bounds, unnest(range(lo, hi + 1, 21600)) t(g)),
           |b AS (
           |  SELECT g.user_id, g.grid_ts, e.ts AS tb, e.vmicro AS vb
           |  FROM grid g ASOF JOIN e
           |    ON g.user_id = e.user_id AND e.ts <= g.grid_ts),
           |f AS (
           |  SELECT g.user_id, g.grid_ts, e.ts AS tf, e.vmicro AS vf
           |  FROM grid g ASOF JOIN e
           |    ON g.user_id = e.user_id AND e.ts >= g.grid_ts)
           |SELECT b.user_id, b.grid_ts,
           |  CASE WHEN epoch_ms(f.tf) = epoch_ms(b.tb) THEN b.vb
           |       ELSE b.vb + (f.vf - b.vb)
           |            * (epoch_ms(b.grid_ts) - epoch_ms(b.tb))
           |            // (epoch_ms(f.tf) - epoch_ms(b.tb)) END AS interp_micro
           |FROM b JOIN f ON b.user_id = f.user_id AND b.grid_ts = f.grid_ts
           |ORDER BY b.user_id, b.grid_ts""".stripMargin),
    doc = "Linear interpolation to the 6-hour grid: union + two window " +
      "carries on one shuffle, fixed-point integer arithmetic exact " +
      "against DuckDB's two-directional native ASOF")

  /** See [[Temporal.rollingActiveUsers]] for the contribution-expansion
    * scale argument.
    */
  private val rollingActives = CatalogQuery(
    "a6_rolling_active_users",
    (s, dir) =>
      Temporal.rollingActiveUsers(Tables(s, dir).events, "user_id", "ts")
        .orderBy(col("day")),
    Some("""WITH pairs AS (
           |  SELECT DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d, user_id
           |  FROM events),
           |contrib AS (
           |  SELECT d + CAST(i AS INTEGER) AS day, user_id
           |  FROM pairs, range(7) t(i))
           |SELECT day, count(DISTINCT user_id) AS wau
           |FROM contrib WHERE day <= (SELECT max(d) FROM pairs)
           |GROUP BY day ORDER BY day""".stripMargin),
    doc = "Rolling 7-day distinct active users per day via contribution " +
      "expansion — the scalable substitute for COUNT(DISTINCT) over a " +
      "sliding window frame, which no engine's window exec supports")

  /** See [[Temporal.cohortRetention]] for the coarsening-grain scale
    * argument and the persist rationale.
    */
  private val cohorts = CatalogQuery(
    "a7_cohort_retention",
    (s, dir) =>
      Temporal.cohortRetention(Tables(s, dir).events, "user_id", "ts")
        .orderBy(col("cohort_w"), col("week_no")),
    Some("""WITH weeks AS (
           |  SELECT DISTINCT user_id,
           |    CAST(date_trunc('week', CAST(CAST(ts AS TIMESTAMP) AS DATE))
           |      AS DATE) AS w
           |  FROM events),
           |cohort AS (SELECT user_id, min(w) AS cohort_w FROM weeks GROUP BY user_id)
           |SELECT cohort_w,
           |  CAST(date_diff('day', cohort_w, w) // 7 AS BIGINT) AS week_no,
           |  count(DISTINCT weeks.user_id) AS n_users
           |FROM weeks JOIN cohort ON weeks.user_id = cohort.user_id
           |GROUP BY cohort_w, week_no ORDER BY cohort_w, week_no""".stripMargin),
    doc = "Cohort retention matrix (first-active week × activity week) " +
      "— monotonically coarsening grains, co-keyed join on user_id")

  /** See [[Temporal.timeWeightedAvg]]. num/den are exact long sums the
    * oracle recomputes; the quotient is integral micro-units.
    */
  private val twap = CatalogQuery(
    "a8_time_weighted_avg",
    (s, dir) =>
      Temporal.timeWeightedAvg(Tables(s, dir).events,
          "user_id", "ts", "value", tieCol = "event_id")
        .select(col("k").as("user_id"), col("num"), col("den"),
          col("twap_micro"))
        .orderBy(col("user_id")),
    Some("""WITH e AS (
           |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
           |    CAST(floor(value*100) AS BIGINT) AS c
           |  FROM events),
           |l AS (
           |  SELECT user_id, c, us,
           |    lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS nxt
           |  FROM e),
           |g AS (
           |  SELECT user_id, CAST(sum(c*(nxt-us)) AS BIGINT) AS num,
           |    CAST(sum(nxt-us) AS BIGINT) AS den
           |  FROM l WHERE nxt IS NOT NULL GROUP BY user_id)
           |SELECT user_id, num, den,
           |  CAST(floor(num/den*10000 + 0.5) AS BIGINT) AS twap_micro
           |FROM g WHERE den > 0 ORDER BY user_id""".stripMargin),
    doc = "Time-weighted average per user (LOCF integral over " +
      "observation intervals): one lead-window pass + one aggregate, " +
      "exact integral cents·micros arithmetic end-to-end")

  /** See [[Temporal.funnel]]. The oracle writes the NATURAL per-step
    * join cascade — an independent implementation of the same
    * semantics the engine computes join-free in one shuffle.
    */
  private val funnelQ = CatalogQuery(
    "a9_funnel",
    (s, dir) =>
      Temporal.funnel(Tables(s, dir).events, "user_id", "ts", "event_type",
          steps = Seq("view", "click", "purchase"))
        .select(col("k").as("user_id"), col("ts_step1"), col("ts_step2"),
          col("ts_step3"), col("steps_completed"))
        .orderBy(col("user_id")),
    Some("""WITH e AS (
           |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
           |  FROM events),
           |v AS (SELECT user_id, min(ts) AS v1 FROM e
           |      WHERE event_type = 'view' GROUP BY user_id),
           |c AS (SELECT e.user_id, min(e.ts) AS c1 FROM e
           |      JOIN v ON e.user_id = v.user_id
           |      WHERE e.event_type = 'click' AND e.ts > v.v1
           |      GROUP BY e.user_id),
           |p AS (SELECT e.user_id, min(e.ts) AS p1 FROM e
           |      JOIN c ON e.user_id = c.user_id
           |      WHERE e.event_type = 'purchase' AND e.ts > c.c1
           |      GROUP BY e.user_id)
           |SELECT u.user_id, v.v1 AS ts_step1, c.c1 AS ts_step2,
           |  p.p1 AS ts_step3,
           |  CAST(CASE WHEN p.p1 IS NOT NULL THEN 3
           |            WHEN c.c1 IS NOT NULL THEN 2
           |            WHEN v.v1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
           |    AS steps_completed
           |FROM (SELECT DISTINCT user_id FROM e) u
           |LEFT JOIN v USING (user_id)
           |LEFT JOIN c USING (user_id)
           |LEFT JOIN p USING (user_id)
           |ORDER BY u.user_id""".stripMargin),
    doc = "Ordered view->click->purchase funnel per user, join-free " +
      "(chained whole-partition window minima, one shuffle) vs the " +
      "oracle's natural three-join cascade")

  /** Tukey IQR-fence anomaly screen over the event metric, per event
    * type — exact integer fence arithmetic end to end (see
    * [[graft.operators.Outliers]] for why interpolated quartiles of
    * micro-truncated integers are bit-exact across engines).
    */
  private val outliers = CatalogQuery(
    "a10_value_outliers",
    (s, dir) =>
      graft.operators.Outliers.iqrOutliers(Tables(s, dir).events,
          keyCol = "event_type", valueCol = "value",
          keepCols = Seq("event_id"))
        .orderBy(col("event_id")),
    Some("""WITH ev AS (
           |  SELECT event_id, event_type,
           |    CAST(floor(value*1000000) AS BIGINT) AS v
           |  FROM events),
           |f AS (
           |  SELECT event_type,
           |    CAST(quantile_cont(v, 0.25)*4 AS BIGINT) AS q25,
           |    CAST(quantile_cont(v, 0.75)*4 AS BIGINT) AS q75
           |  FROM ev GROUP BY 1)
           |SELECT e.event_id, e.event_type, e.v AS value_micro
           |FROM ev e JOIN f USING (event_type)
           |WHERE 8*e.v < 2*f.q25 - 3*(f.q75-f.q25)
           |   OR 8*e.v > 2*f.q75 + 3*(f.q75-f.q25)
           |ORDER BY e.event_id""".stripMargin),
    doc = "Per-type Tukey fences (p25/p75 ± 1.5·IQR) in exact " +
      "eighth-micro-units: hash pre-agg to (type, v, cnt) -> cumulative-" +
      "count rank selection over the saturated value domain -> O(types) " +
      "fence relation broadcast -> single codegen'd scan; the per-key " +
      "sort never touches raw rows")

  /** a10's sequential twin: a rolling z-test against the TRAILING
    * 20-event baseline per type — the streaming-shaped anomaly screen
    * (is this point wild vs the recent past) next to a10's
    * whole-history Tukey fences. Integer inequality
    * `(n·v−S)² > 9(nQ−S²)` in DECIMAL(38,0)/HUGEINT; see
    * [[graft.operators.Outliers.rollingZOutliers]].
    */
  private val rollingZ = CatalogQuery(
    "a11_rolling_zscore",
    (s, dir) =>
      graft.operators.Outliers.rollingZOutliers(Tables(s, dir).events,
          keyCol = "event_type", valueCol = "value",
          timeCol = "ts", idCol = "event_id", w = 20, z = 3)
        .orderBy(col("event_id")),
    Some("""WITH ev AS (
           |  SELECT event_id, event_type, ts,
           |    CAST(floor(value*1000000) AS BIGINT) AS v
           |  FROM events),
           |w AS (
           |  SELECT event_id, event_type, v,
           |    sum(CAST(v AS HUGEINT)) OVER win AS s,
           |    sum(CAST(v AS HUGEINT)*v) OVER win AS q,
           |    count(*) OVER win AS n
           |  FROM ev
           |  WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id
           |                 ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
           |SELECT event_id, event_type, v AS value_micro,
           |  CAST(s // n AS BIGINT) AS mean_micro
           |FROM w
           |WHERE n = 20
           |  AND (n*CAST(v AS HUGEINT) - s)*(n*CAST(v AS HUGEINT) - s)
           |      > 9*(n*q - s*s)
           |ORDER BY event_id""".stripMargin),
    doc = "Rolling z-score anomaly screen (|v-mean| > 3 sigma vs the " +
      "20 strictly-preceding events per type) as one exact integer " +
      "window inequality — single key shuffle, O(w) frame state, no " +
      "join, no float")

  /** Contiguous view→click→purchase motif per user — the back-to-back
    * complement of a9's gaps-allowed funnel. Event types are uniform
    * over 5 values, so a ~67-event user expects ~0.5 occurrences:
    * the output mixes zero and positive counts, and an off-by-one in
    * the window frame (counting non-contiguous triples, or dropping
    * the overlap case) shifts real rows.
    */
  private val motif = CatalogQuery(
    "a12_motif_sequence",
    (s, dir) => {
      val e = Tables(s, dir).events
      Temporal.motifCount(e, keyCol = "user_id", tsCol = "ts",
          tieCol = "event_id", typeCol = "event_type",
          motif = Seq("view", "click", "purchase"))
        .select(col("k").as("user_id"), col("n_events"), col("n_motifs"))
        .orderBy(col("user_id"))
    },
    Some("""WITH o AS (
           |  SELECT user_id, event_type,
           |         lead(event_type, 1) OVER w AS t1,
           |         lead(event_type, 2) OVER w AS t2
           |  FROM events
           |  WINDOW w AS (PARTITION BY user_id
           |               ORDER BY CAST(ts AS TIMESTAMP), event_id))
           |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           |       CAST(count(CASE WHEN event_type = 'view'
           |                        AND t1 = 'click'
           |                        AND t2 = 'purchase' THEN 1 END)
           |            AS BIGINT) AS n_motifs
           |FROM o GROUP BY user_id ORDER BY user_id""".stripMargin),
    doc = "Contiguous event-sequence motif count (view→click→purchase " +
      "back-to-back, overlaps counted) per user: the pattern test is " +
      "two leads over ONE key-shuffle window — O(|motif|) frame state, " +
      "no join, no per-key sequence buffering; zero-count users are " +
      "explicit rows")

  /** Hourly OHLC bars per event type — first/last decided by the
    * packed (ts, event_id) order inside one HashAggregate; every
    * emitted number is a stored double or a count, so the hash compare
    * is exact with no rounding anywhere.
    */
  private val ohlc = CatalogQuery(
    "a13_ohlc_bars",
    (s, dir) => {
      val e = Tables(s, dir).events
      Temporal.ohlcBars(e, keyCol = "event_type", tsCol = "ts",
          idCol = "event_id", valCol = "value", bucket = "hour")
        .orderBy(col("event_type"), col("bucket_ts"))
    },
    Some("""WITH b AS (
           |  SELECT event_type,
           |         date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket_ts,
           |         CAST(ts AS TIMESTAMP) AS uts, event_id, value
           |  FROM events),
           |agg AS (
           |  SELECT event_type, bucket_ts, CAST(count(*) AS BIGINT) AS n_events,
           |         max(value) AS high, min(value) AS low
           |  FROM b GROUP BY 1, 2),
           |o AS (
           |  SELECT event_type, bucket_ts, value AS open FROM b
           |  QUALIFY row_number() OVER (PARTITION BY event_type, bucket_ts
           |                             ORDER BY uts, event_id) = 1),
           |c AS (
           |  SELECT event_type, bucket_ts, value AS close FROM b
           |  QUALIFY row_number() OVER (PARTITION BY event_type, bucket_ts
           |                             ORDER BY uts DESC, event_id DESC) = 1)
           |SELECT a.event_type, a.bucket_ts, a.n_events,
           |       o.open, a.high, a.low, c.close
           |FROM agg a
           |JOIN o ON a.event_type = o.event_type AND a.bucket_ts = o.bucket_ts
           |JOIN c ON a.event_type = c.event_type AND a.bucket_ts = c.bucket_ts
           |ORDER BY a.event_type, a.bucket_ts""".stripMargin),
    doc = "Hourly OHLC bars per event type: open/close via min/max " +
      "over the order-isomorphic packed (ts, id) DECIMAL — the whole " +
      "bar is one map-side-combined HashAggregate (no window sort), " +
      "values recovered by unique-id equi-joins; every output is a " +
      "stored double or count, exact on any engine")

  /** Peak load per day over a2's sessions: the ±1 boundary sweep whose
    * running sum is the live-session count, distributed via the
    * SequencePack two-level prefix sum (the naive sweep is ONE window
    * over every boundary — the single-partition scale-killer). Closed
    * intervals: a session ending the instant another starts overlaps
    * it, so starts sort before ends at a tie (the packed order key's
    * low bit) — which also makes the day-max order-invariant across
    * tied boundaries (a tie group is all-starts or all-ends by
    * parity). Days with no boundary are absent by contract.
    */
  private val concurrency = CatalogQuery(
    "a14_peak_concurrency",
    (s, dir) => {
      val sess = Temporal.sessionize(
        Tables(s, dir).events.select(col("user_id"), col("ts")),
        "user_id", "ts", gap = "30 minutes")
      Temporal.peakConcurrency(sess, "session_start", "session_end")
        .orderBy(col("day"))
    },
    Some("""WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
           |b AS (SELECT user_id, ts,
           |        CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
           |               OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
           |                    > INTERVAL 30 MINUTE
           |             THEN 1 ELSE 0 END AS brk
           |      FROM e),
           |s AS (SELECT user_id, ts,
           |        sum(brk) OVER (PARTITION BY user_id ORDER BY ts
           |                       ROWS UNBOUNDED PRECEDING) AS sid
           |      FROM b),
           |sess AS (SELECT user_id, min(ts) AS st, max(ts) AS en
           |         FROM s GROUP BY user_id, sid),
           |bd AS (SELECT st AS t, 1 AS delta FROM sess
           |       UNION ALL SELECT en, -1 FROM sess),
           |r AS (SELECT t, delta,
           |        sum(delta) OVER (ORDER BY t, delta DESC
           |                         ROWS UNBOUNDED PRECEDING) AS running
           |      FROM bd)
           |SELECT CAST(date_trunc('day', t) AS DATE) AS day,
           |       CAST(max(running + CASE WHEN delta = -1 THEN 1 ELSE 0 END)
           |            AS BIGINT) AS peak_concurrent,
           |       CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_starts,
           |       CAST(sum(CASE WHEN delta = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_ends
           |FROM r GROUP BY 1 ORDER BY 1""".stripMargin),
    doc = "Peak concurrent sessions per day via a distributed ±1 " +
      "boundary sweep: the global running concurrency through the " +
      "two-level prefix sum (range exchange + O(partitions) offsets + " +
      "partition-local windows), then an O(days) aggregate — never a " +
      "single-partition global window; oracle replays the sweep with " +
      "DuckDB's window sum")

  /** a11's smoothing sibling: not "is this point anomalous" but "what
    * is the denoised level" — the pandas ewm(alpha=0.5) shape with the
    * tail truncated at w=8, which is exactly what buys bit-exactness
    * (dyadic weights × value micros in int64, constant divisor 255; no
    * pow(), no float fold). Values here are nonnegative so Spark's
    * truncating `div` and DuckDB's flooring `//` agree — the same
    * nonnegativity license a11's mean_micro already relies on.
    */
  private val ewma = CatalogQuery(
    "a15_dyadic_ewma",
    (s, dir) =>
      Temporal.dyadicEwma(Tables(s, dir).events,
          keyCol = "user_id", valueCol = "value",
          timeCol = "ts", idCol = "event_id", w = 8)
        .orderBy(col("event_id")),
    Some {
      val terms = (0 until 8).map(j =>
        s"${1L << (7 - j)}*lag(v, $j) OVER win").mkString(" + ")
      s"""WITH ev AS (
         |  SELECT event_id, user_id, ts,
         |    CAST(floor(value*1000000) AS BIGINT) AS v
         |  FROM events),
         |l AS (
         |  SELECT event_id, user_id, v, $terms AS num
         |  FROM ev
         |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id))
         |SELECT event_id, user_id, v AS value_micro,
         |       CAST(num // 255 AS BIGINT) AS ewma_micro
         |FROM l WHERE num IS NOT NULL ORDER BY event_id""".stripMargin
    },
    doc = "Dyadic EWMA (trailing 8 events per user, weights 128..1, " +
      "exact integer micro-units): w lags on ONE key-shuffle window — " +
      "O(w) frame state, no join; full windows only emit")

  override def queries: Seq[CatalogQuery] =
    Seq(asof, asofForward, asofNearest, asofTolerance, sessions, json,
      intervalFollow, resample, resampleLinear, rollingActives, cohorts,
      twap, funnelQ, outliers, rollingZ, motif, ohlc, concurrency, ewma)
}
