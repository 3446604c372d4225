package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time analytics over the `events` stream table — the batch
  * equivalents of the streaming operators (tumbling windows, sessionization
  * by inactivity gap). The same aggregations run as Structured Streaming in
  * [[graft.streaming.EventStream]]; here they are batch + oracle-checked.
  *
  * Timestamps are emitted as formatted UTC strings so the oracle compare is
  * representation-stable (µs-truncated on both sides — see Tables).
  */
object Events {

  private def dsum(c: Column): Column = sum(c.cast("decimal(18,4)")).cast("double")

  /** q132's attribution geometry: 2 h lookback horizon, 30 min decay
    * half-life — ≤ 4 halvings inside the horizon, so the shift never
    * exceeds the long's width.
    */
  private[graft] val AttribHorizonUs = 7200L * 1000000L
  private[graft] val AttribHalfLifeUs = 1800L * 1000000L

  /** The exact decay weight over a non-negative µs staleness:
    * 1e6 >> (Δ div half-life) — identical to `1e6 div 2^halvings` for
    * non-negative ints, shift-exact on both engines. ONE definition
    * shared by batch q132 and the streaming dual
    * ([[graft.streaming.EventStream.decayedTouches]]). The floor of the
    * double quotient is exact: both operands are < 2^53.
    */
  private[graft] def decayWeightPpm(dltUs: Column): Column =
    call_function("shiftright", lit(1000000L),
      floor(dltUs.cast("double") / AttribHalfLifeUs.toDouble).cast("int"))

  /** Depth-N ordered funnel over an event log: per user, the first
    * occurrence of `stages(0)`, then the first `stages(1)` strictly AFTER
    * it, and so on down the chain. The cascaded-conditional-min shape
    * generalizes mechanically from the 3-stage q78: every stage is one
    * map-side-combined MIN aggregate plus an equi-join on user_id — N
    * passes over the type-filtered scan, no window over a user's whole
    * history, nothing ordered globally, and every shuffle shares the
    * user_id key (so at 100 TB the N stages reuse one exchange
    * partitioning). Output: user_id, t_<stage> per stage (null once the
    * chain breaks), funnel_depth = number of stages reached.
    */
  private[graft] def funnelStages(ev: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty && stages.distinct.size == stages.size,
      s"funnel stages must be non-empty and distinct: $stages")
    val users = ev.select(col("user_id")).distinct()
    // fold forward: stage i's candidates are conditioned on arriving
    // strictly after stage i-1's per-user min
    val mins = stages.foldLeft(List.empty[(String, DataFrame)]) {
      case (acc, stage) =>
        val filtered = ev.filter(col("event_type") === stage)
          .select(col("user_id"), col("ts"))
        val conditioned = acc match {
          case Nil => filtered
          case (prevName, prevDf) :: _ =>
            filtered.join(prevDf, "user_id")
              .filter(col("ts") > col(s"t_$prevName"))
        }
        val agg = conditioned.groupBy("user_id").agg(min("ts").as(s"t_$stage"))
        (stage, agg) :: acc
    }.reverse
    val stitched = mins.foldLeft(users) {
      case (df, (_, m)) => df.join(m, Seq("user_id"), "left")
    }
    // null-front depth: fold shallow→deep so the DEEPEST stage's check
    // ends up outermost (a user at depth k has every t_<stage> up to k
    // non-null, so the deepest non-null must win)
    val depth = stages.zipWithIndex
      .foldLeft(lit(0L)) { case (els, (stage, i)) =>
        when(col(s"t_$stage").isNotNull, lit(i + 1L)).otherwise(els)
      }
    stitched.select(
      col("user_id") +: stages.map(s => col(s"t_$s")) :+ depth.as("funnel_depth"): _*)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // tumbling 1-hour windows per event type
    "q23_event_windows" -> ((s, dir) => {
      Tables(s, dir, "events")
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
    }),

    // sessionization: 30-minute inactivity gap via lag()
    "q24_sessionize" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val gap = unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))
      Tables(s, dir, "events")
        .withColumn("new_session",
          when(gap.isNull || gap > lit(1800L * 1000000L), 1L).otherwise(0L))
        .groupBy("user_id")
        .agg(sum("new_session").as("n_sessions"), count(lit(1)).as("n_events"))
    }),

    // semi-structured props: schema'd JSON parsing (from_json with an
    // explicit schema — the scalable pattern for JSON columns: one parse
    // per row inside codegen, no schema inference scan) + an all-integer
    // rollup, so the oracle is arithmetic-exact. Malformed/missing keys
    // parse to NULL on both engines and fall out of SUM/MAX identically.
    "q49_json_props" -> ((s, dir) => {
      Tables(s, dir, "events")
        .select(col("event_type"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k LONG"))
            .getField("k").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"), max("k").as("max_k"))
    }),

    // salted skew-bounded fact-dim join: events' user_id is genuinely hot
    // (~15 distinct users over the whole fact table), so a plain shuffled
    // join lands each hot key on ONE task. The standard remedy ladder is
    // (1) broadcast the dim when it fits, (2) AQE skew-split on sort-merge,
    // (3) EXPLICIT SALT when the dim is too big to broadcast and a single
    // key exceeds a task even after AQE splitting: salt the fact side,
    // replicate the dim ×S, join on (key, salt) — the hot key's rows
    // spread over S tasks, at the price of an S× dim shuffle. This
    // operator demonstrates (3) deliberately (shuffle_hash hint so the
    // tiny bench dim doesn't silently collapse to (1)); the salt is
    // deterministic (pmod of the fact's unique id — exactly the uniform
    // spreader a production rand() salt approximates) so the result is
    // the plain join the oracle runs.
    "q48_salted_enrich" -> ((s, dir) => {
      val S = 8
      val facts = Tables(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          pmod(col("event_id"), lit(S.toLong)).as("salt"))
      val dims = Tables(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"))
        .withColumn("d_salt", explode(sequence(lit(0L), lit(S - 1L))))
      facts.join(dims.hint("shuffle_hash"),
          col("user_id") === col("c_custkey") && col("salt") === col("d_salt"))
        .select(col("event_id"), col("user_id"), col("event_type"), col("c_name"))
    }),

    // range (interval) join: for each error event, aggregate the same
    // user's purchases in the following 30 minutes — incident-to-
    // conversion attribution, the big×big time-range join Spark has no
    // native operator for. Written naively (`e2.ts BETWEEN e1.ts AND
    // e1.ts + 30min` as a join condition) Catalyst can only plan a
    // nested-loop join over the user-cogroup — quadratic per hot user,
    // unrunnable at a 100 TB fact table. The scale shape is the BINNED
    // interval equi-join (the Flink/Trino interval-join strategy):
    //   - quantize time into buckets the width of the horizon; each
    //     right-side event lands in exactly ONE bucket, and each
    //     left-side interval (t, t+W] spans exactly TWO (floor(t/W) and
    //     the next — integer arithmetic, no boundary leaks);
    //   - equi-join on (user_id, bucket) — a plain shuffle join whose
    //     key cardinality grows with time span, so the 15-user hotness
    //     of this table is diluted ~1440× by the month of buckets;
    //   - re-check the exact range predicate AFTER the equi-join: the
    //     bucket join over-generates at most 2× (work ∝ true temporal
    //     neighbors, never |left|×|right| per user).
    // A purchase's single bucket matches at most one of the two probe
    // rows of any error interval, so no pair is double-counted and no
    // distinct is needed. Errors with no follower survive via the final
    // left join (n=0, sum=0), keeping the operator total.
    "q60_range_join" -> ((s, dir) => {
      val W = 1800L * 1000000L // horizon = bucket width, µs
      val ev = Tables(s, dir, "events")
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("t1"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("t2"), col("value"))
        .withColumn("bkt", expr(s"t2 div ${W}L"))
      val probes = errors.withColumn("bkt",
        explode(array(expr(s"t1 div ${W}L"), expr(s"t1 div ${W}L + 1L"))))
      val followed = probes.join(purchases, Seq("user_id", "bkt"))
        .filter(col("t2") > col("t1") && col("t2") <= col("t1") + lit(W))
        .groupBy("event_id")
        .agg(count(lit(1)).as("n_follow"), dsum(col("value")).as("sum_value"))
      errors.select("event_id").join(followed, Seq("event_id"), "left")
        .select(col("event_id"),
          coalesce(col("n_follow"), lit(0L)).as("n_follow"),
          coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
    }),

    // time-decayed attribution — which channels get credit for
    // conversions: every view/click touch within the 2 h lookback of a
    // same-user purchase earns weight halved per 30 min of staleness
    // (the marketing-attribution / reward-shaping classic). Exponential
    // decay is float-hostile (exp/pow never hash-match cross-engine),
    // so the decay is EXACT: halvings = Δ div half-life ∈ 0..4 inside
    // the horizon, weight_ppm = 1e6 div 2^halvings — integer
    // bit-shifts, bit-identical on both engines. Plan shape: q60's
    // horizon-bucket range join verbatim (touches keep their one
    // bucket, purchases probe two; the bounded Δ means each pair
    // matches exactly once — no distinct), then ONE map-combined agg to
    // ≤ |channels| rows. The oracle states the plain inequality join;
    // the binning is the Spark plan's scale device.
    "q132_decay_attribution" -> ((s, dir) => {
      val W = AttribHorizonUs
      val ev = Tables(s, dir, "events")
      val touches = ev.filter(col("event_type").isin("view", "click"))
        .select(col("event_type").as("channel"), col("user_id"),
          unix_micros(col("ts")).as("t1"))
        .withColumn("bkt", expr(s"t1 div ${W}L"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("t2"))
        .withColumn("bkt",
          explode(array(expr(s"t2 div ${W}L"), expr(s"t2 div ${W}L - 1L"))))
      touches.join(purchases, Seq("user_id", "bkt"))
        .filter(col("t1") < col("t2") && col("t2") <= col("t1") + lit(W))
        .withColumn("w_ppm", decayWeightPpm(col("t2") - col("t1")))
        .groupBy("channel")
        .agg(count(lit(1)).as("n_touches"), sum("w_ppm").as("weight_ppm"))
    }),

    // ordered funnel analysis: per user, the first view → the first
    // click AFTER that view → the first purchase AFTER that click —
    // the sequential-conversion question flat per-type aggregates get
    // wrong (a click before any view is not funnel progress). Cascaded
    // conditional MINs: each stage is ONE map-side-combined aggregate
    // plus an equi-join on user_id — three passes over the (filtered)
    // event scan, no window over a user's whole history and nothing
    // ordered globally; every shuffle shares the user_id key. Depth is
    // the stitched null-front: 0 = never viewed … 3 = converted.
    "q78_funnel" -> ((s, dir) =>
      funnelStages(Tables(s, dir, "events"), Seq("view", "click", "purchase"))),

    // event-type transition matrix — the first-order Markov card over
    // user journeys: per (type, next type) the count of consecutive
    // same-user transitions (event-time order, event_id ties). The
    // sequence-mining primitive behind "what do users do after an
    // error": funnel operators (q78/q83) test ONE prescribed path;
    // this measures every observed adjacent step. Plan: one
    // user-partitioned LEAD window (bounded by a user's history — the
    // q24 partitions) + ONE map-combined agg to ≤ |types|² rows.
    "q145_event_transitions" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables(s, dir, "events")
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type"), col("next_type"))
        .agg(count(lit(1)).as("n"))
    }),

    // session-size distribution — q24's sessionizer driven one level
    // deeper: q24 counts sessions per user; this is the histogram of
    // EVENTS PER SESSION across the corpus (the engagement-shape card:
    // a spike at 1 is bounce traffic, a heavy tail is power usage).
    // Same 30-min-gap rule as q24 (shared semantics — the boundary
    // column is computed identically), a running SUM of the boundary
    // flags numbers each user's sessions, then the q137 double-agg
    // shape: per-(user, session) count → per-count histogram. Windows
    // are user-partitioned (bounded by one user's history, exactly
    // q24's partitions); both aggs map-combine.
    "q138_session_sizes" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val gap = unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))
      val cum = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir, "events")
        .withColumn("new_session",
          when(gap.isNull || gap > lit(1800L * 1000000L), 1L).otherwise(0L))
        .withColumn("session_idx", sum("new_session").over(cum))
        .groupBy("user_id", "session_idx")
        .agg(count(lit(1)).as("n_events"))
        .groupBy("n_events")
        .agg(count(lit(1)).as("n_sessions"))
    }),

    // weekly metric drift — the monitoring read on the event stream's
    // own health: per (event_type, week), the count beside last week's
    // and their integer per-mille ratio (1000 = flat; an ops dashboard
    // alerts off the ratio, so it must be deterministic — a float ratio
    // is, per-row, but the per-mille floor keeps it hash-comparable).
    // Ratio = n·1000 div prev_n with BOTH operands non-negative — the
    // signed (n−prev) delta would hit the div-vs-floor divergence
    // (Spark `div` truncates toward zero, DuckDB `//` floors), so the
    // stat is deliberately a ratio, not a difference. Week numbers are
    // q98's epoch-µs `div` (no calendar functions). Plan: ONE
    // map-combined count agg, then a lag window PARTITIONED by type —
    // partitions are the per-type week series (time-bounded: a decade
    // is ~520 rows), never event-sized.
    "q134_weekly_drift" -> ((s, dir) => {
      val counts = Tables(s, dir, "events")
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 604800000000").as("week"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("event_type").orderBy("week")
      counts.withColumn("prev_n", lag("n", 1).over(w))
        .withColumn("ratio_pm",
          expr("CAST((n * 1000) div prev_n AS BIGINT)"))
        .select("event_type", "week", "n", "prev_n", "ratio_pm")
    }),

    // retention cohort matrix — the training-data analytics classic:
    // users bucketed by FIRST-activity week (the cohort), then per
    // (cohort_week, week_offset) the count of distinct users active in
    // that offset week. Integer week numbers from epoch micros (one
    // `div` — no calendar/timezone functions, so both engines derive
    // the identical bucket from the identical int64). Plan at 100 TB:
    // the (user, week) activity relation is distinct-ed FIRST (one
    // map-combined shuffle on the pair — count state never holds a
    // distinct-set), cohorts are a second agg on the user key, and the
    // matrix is one map-combined count on (cohort, offset) — output
    // bounded by weeks², never user-sized.
    "q98_retention_cohorts" -> ((s, dir) => {
      val uw = Tables(s, dir, "events")
        .select(col("user_id"),
          expr("unix_micros(ts) div 604800000000").as("week"))
        .distinct()
        .persist() // feeds the cohort agg AND the activity join
      val cohorts = uw.groupBy("user_id").agg(min("week").as("cohort_week"))
      uw.join(cohorts, Seq("user_id"))
        .groupBy(col("cohort_week"),
          (col("week") - col("cohort_week")).as("week_offset"))
        .agg(count(lit(1)).as("n_users"))
    }),

    // depth-4 funnel: the generalized stage list exercised one deeper
    // than q78 (signup → view → click → purchase). Same plan family —
    // N cascaded conditional mins on one shuffle key.
    "q83_funnel_stages" -> ((s, dir) =>
      funnelStages(Tables(s, dir, "events"),
        Seq("signup", "view", "click", "purchase"))))

  def oracleSql: Map[String, String] = Map(
    "q23_event_windows" ->
      """SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS hour,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q24_sessionize" ->
      """WITH g AS (SELECT user_id,
        |  epoch_us(CAST(ts AS TIMESTAMP))
        |    - epoch_us(lag(CAST(ts AS TIMESTAMP), 1) OVER (
        |        PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)) AS gap
        |  FROM events)
        |SELECT user_id,
        |  CAST(SUM(CASE WHEN gap IS NULL OR gap > 1800000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
        |  COUNT(*) AS n_events
        |FROM g GROUP BY user_id""".stripMargin,

    // CAST around SUM: DuckDB widens SUM(BIGINT) to HUGEINT, which
    // reaches the compare as float64 (see SqlSimhash note). The extraction
    // is json_type-gated to bare JSON integers + TRY_CAST: Spark's
    // from_json with `k LONG` yields NULL for quoted numbers ("5"),
    // floats, and overflows — a plain CAST(json_extract_string) would
    // parse "5" to 5 and hard-error on non-numeric strings, so both
    // engines must null out the same malformed shapes.
    "q49_json_props" ->
      """WITH j AS (SELECT event_type,
        |  CASE WHEN json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
        |    THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) END AS k
        |  FROM events)
        |SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(k) AS BIGINT) AS sum_k, MAX(k) AS max_k
        |FROM j GROUP BY event_type""".stripMargin,

    // the salt is an implementation detail of the Spark plan; the
    // semantics are the plain equi-join
    "q48_salted_enrich" ->
      """SELECT e.event_id, e.user_id, e.event_type, c.c_name
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey""".stripMargin,

    // the binning is an implementation detail of the Spark plan; the
    // semantics are the plain range join (DuckDB plans this as an IEJoin)
    "q60_range_join" ->
      """WITH e1 AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events WHERE event_type = 'error'),
        |e2 AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |  FROM events WHERE event_type = 'purchase')
        |SELECT e1.event_id,
        |  COUNT(e2.ts) AS n_follow,
        |  CAST(COALESCE(SUM(CAST(e2.value AS DECIMAL(18,4))), 0) AS DOUBLE) AS sum_value
        |FROM e1 LEFT JOIN e2 ON e2.user_id = e1.user_id
        |  AND e2.ts > e1.ts AND e2.ts <= e1.ts + INTERVAL 30 MINUTE
        |GROUP BY e1.event_id""".stripMargin,

    // the same per-user order, LEAD instead of LAG, one grouped count
    "q145_event_transitions" ->
      """WITH nx AS (SELECT user_id, event_type,
        |  LEAD(event_type, 1) OVER (PARTITION BY user_id
        |    ORDER BY CAST(ts AS TIMESTAMP), event_id) AS next_type
        |  FROM events)
        |SELECT event_type, next_type, COUNT(*) AS n
        |FROM nx WHERE next_type IS NOT NULL
        |GROUP BY event_type, next_type""".stripMargin,

    // q24's gap rule, a per-user running boundary sum, the double agg
    "q138_session_sizes" ->
      """WITH g AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS t,
        |  epoch_us(CAST(ts AS TIMESTAMP))
        |    - epoch_us(lag(CAST(ts AS TIMESTAMP), 1) OVER (
        |        PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)) AS gap
        |  FROM events),
        |n AS (SELECT user_id, event_id, t,
        |  CASE WHEN gap IS NULL OR gap > 1800000000 THEN 1 ELSE 0 END AS ns
        |  FROM g),
        |s AS (SELECT user_id,
        |  SUM(ns) OVER (PARTITION BY user_id ORDER BY t, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM n),
        |c AS (SELECT user_id, sid, CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM s GROUP BY user_id, sid)
        |SELECT n_events, COUNT(*) AS n_sessions
        |FROM c GROUP BY n_events""".stripMargin,

    // q98's week derivation, the per-type lag, the non-negative ratio
    "q134_weekly_drift" ->
      """WITH c AS (SELECT event_type,
        |  epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000 AS week,
        |  CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
        |l AS (SELECT event_type, week, n,
        |  LAG(n) OVER (PARTITION BY event_type ORDER BY week) AS prev_n
        |  FROM c)
        |SELECT event_type, CAST(week AS BIGINT) AS week, n, prev_n,
        |  CAST((n * 1000) // prev_n AS BIGINT) AS ratio_pm
        |FROM l""".stripMargin,

    // the plain inequality join; integer µs deltas, shift-exact decay
    "q132_decay_attribution" ->
      """WITH tch AS (SELECT event_type AS channel, user_id,
        |  epoch_us(CAST(ts AS TIMESTAMP)) AS t1 FROM events
        |  WHERE event_type IN ('view', 'click')),
        |pur AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t2
        |  FROM events WHERE event_type = 'purchase'),
        |j AS (SELECT tch.channel, pur.t2 - tch.t1 AS dlt
        |  FROM tch JOIN pur ON pur.user_id = tch.user_id
        |  AND tch.t1 < pur.t2 AND pur.t2 <= tch.t1 + 7200000000)
        |SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_touches,
        |  CAST(SUM(1000000 // (CAST(1 AS BIGINT)
        |    << CAST(dlt // 1800000000 AS INT))) AS BIGINT) AS weight_ppm
        |FROM j GROUP BY channel""".stripMargin,

    "q98_retention_cohorts" ->
      """WITH uw AS (SELECT DISTINCT user_id,
        |  epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000 AS week FROM events),
        |c AS (SELECT user_id, MIN(week) AS cohort_week FROM uw GROUP BY user_id)
        |SELECT c.cohort_week, uw.week - c.cohort_week AS week_offset,
        |  COUNT(*) AS n_users
        |FROM uw JOIN c USING (user_id)
        |GROUP BY 1, 2""".stripMargin,

    "q78_funnel" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |v AS (SELECT user_id, MIN(ts) AS t_view FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, MIN(e.ts) AS t_click FROM events e
        |  JOIN v USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY e.user_id),
        |p AS (SELECT e.user_id, MIN(e.ts) AS t_purchase FROM events e
        |  JOIN c USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY e.user_id)
        |SELECT u.user_id, v.t_view, c.t_click, p.t_purchase,
        |  CAST(CASE WHEN p.t_purchase IS NOT NULL THEN 3
        |       WHEN c.t_click IS NOT NULL THEN 2
        |       WHEN v.t_view IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
        |    AS funnel_depth
        |FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
        |  LEFT JOIN p USING (user_id)""".stripMargin,

    "q83_funnel_stages" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |s1 AS (SELECT user_id, MIN(ts) AS t_signup FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, MIN(e.ts) AS t_view FROM events e
        |  JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'view' AND e.ts > s1.t_signup GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, MIN(e.ts) AS t_click FROM events e
        |  JOIN s2 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > s2.t_view GROUP BY e.user_id),
        |s4 AS (SELECT e.user_id, MIN(e.ts) AS t_purchase FROM events e
        |  JOIN s3 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > s3.t_click GROUP BY e.user_id)
        |SELECT u.user_id, s1.t_signup, s2.t_view, s3.t_click, s4.t_purchase,
        |  CAST(CASE WHEN s4.t_purchase IS NOT NULL THEN 4
        |       WHEN s3.t_click IS NOT NULL THEN 3
        |       WHEN s2.t_view IS NOT NULL THEN 2
        |       WHEN s1.t_signup IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
        |    AS funnel_depth
        |FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
        |  LEFT JOIN s3 USING (user_id) LEFT JOIN s4 USING (user_id)""".stripMargin)
}
