package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming operators over the event stream — the streaming
  * duals of the batch queries q23/q24 (graft.queries.Events). Each takes a
  * (possibly streaming) events DataFrame `(event_id, ts timestamp, user_id,
  * event_type, value, ...)` and returns a transformed DataFrame, so the
  * same code runs over `readStream` sources in production and over
  * `MemoryStream` in specs.
  *
  * Watermark posture: the reference's only stream (spreadsheet-modification
  * discovery) needs none — Drive modifiedTime is monotone per file (SURVEY
  * §2.1). These operators are the training-pipeline extensions, where event
  * time DOES arrive late; watermarks bound state.
  *
  * Scale notes: tumbling/session windows shuffle once on the grouping key;
  * state store size is bounded by (watermark horizon × key cardinality).
  * `flatMapGroupsWithState` keeps one small record per open session, not
  * the events themselves.
  */
object EventStream {

  /** Tumbling 1-hour windows per event type, 2-hour watermark — the
    * streaming dual of q23_event_windows.
    */
  def hourlyWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("sum_value"))

  /** Built-in session windows: 30-minute inactivity gap per user. */
  def sessionWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"))

  /** Stream-stream interval join: attach to each non-signup event its
    * user's most recent signup within the preceding `horizonHours` — the
    * streaming-feasible form of q38's as-of enrichment. An unbounded
    * as-of cannot run on two streams (its state never expires); the
    * horizon is exactly the state bound: with watermarks on BOTH sides
    * and the time-range join condition, Spark retains signups only until
    * the activity watermark passes their horizon, so state is
    * (horizon × signup rate), not history. Left-outer: activities with no
    * in-horizon signup emit with a null signup_ts once the watermark
    * proves none can arrive.
    *
    * The raw interval join emits one row per matching signup — a user who
    * signed up twice inside the horizon would duplicate every activity —
    * so a chained streaming aggregation (grouped on the activity row, max
    * over the matches) reduces to exactly ONE row per activity carrying
    * the latest in-horizon signup_ts. Grouping includes the watermarked
    * event-time column, so the agg runs in append mode and its state
    * expires with the same watermark that closes the join.
    */
  def withRecentSignup(events: DataFrame, watermark: String = "2 hours",
      horizonHours: Int = 168): DataFrame = {
    val signups = events.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("signup_ts"))
      .withWatermark("signup_ts", watermark)
    val acts = events.filter(col("event_type") =!= "signup")
      .withWatermark("ts", watermark)
    val joined = acts.join(signups,
        col("user_id") === col("s_user") &&
        col("signup_ts") <= col("ts") &&
        col("signup_ts") >= col("ts") - expr(s"INTERVAL $horizonHours HOURS"),
        "left_outer")
      .drop("s_user")
    val actCols = joined.columns.filter(_ != "signup_ts")
    joined.groupBy(actCols.map(col): _*)
      .agg(max("signup_ts").as("signup_ts"))
  }

  /** Stream-stream range attribution — the streaming dual of q60: for
    * each error event, count and sum the same user's purchases in the
    * following `horizonMinutes`. Where batch q60 must BUILD the
    * interval equi-join itself (horizon-bucket quantization — Spark has
    * no batch interval-join operator), the streaming engine has the
    * native form: watermarks on both sides plus the time-range join
    * condition bound the join state to (horizon × rate), the same
    * two-sided expiry [[withRecentSignup]] relies on. Left-outer so an
    * error with no follower still emits — its zero row materializes
    * once the purchase watermark proves no follower can arrive, exactly
    * the rows batch q60 stitches in with its final left join. The
    * chained aggregation (grouped on the error row including its
    * watermarked ts) collapses the per-follower join rows to ONE row
    * per error, in append mode with state expiring on the same
    * watermark.
    */
  def rangeAttribution(events: DataFrame, watermark: String = "2 hours",
      horizonMinutes: Int = 30): DataFrame = {
    val errors = events.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id").as("e_user"), col("ts").as("e_ts"))
      .withWatermark("e_ts", watermark)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("value"))
      .withWatermark("p_ts", watermark)
    errors.join(purchases,
        col("e_user") === col("p_user") &&
        col("p_ts") > col("e_ts") &&
        col("p_ts") <= col("e_ts") + expr(s"INTERVAL $horizonMinutes MINUTES"),
        "left_outer")
      .groupBy(col("event_id"), col("e_user"), col("e_ts"))
      .agg(count(col("p_ts")).as("n_follow"),
        coalesce(sum(col("value").cast("decimal(18,4)")).cast("double"),
          lit(0.0)).as("sum_value"))
      .select(col("event_id"), col("n_follow"), col("sum_value"))
  }

  /** Streaming time-decayed attribution — q132's dual: view/click
    * touches interval-join same-user purchases within the shared 2 h
    * horizon (two-sided watermark state bounds, the [[rangeAttribution]]
    * machinery), each joined row weighted by the SAME exact shift-decay
    * Column ([[graft.queries.Events.decayWeightPpm]] — batch and stream
    * cannot disagree on a weight). Emits PER-TOUCH attribution rows in
    * append mode — a channel-level global aggregate after a
    * stream-stream join is the unsupported multi-stateful shape, and
    * the channel totals are value-space-tiny anyway, so the card is a
    * batch aggregate over the emitted rows (the fertilityRegisters
    * posture: rows on the stream, the report as a batch step).
    */
  def decayedTouches(events: DataFrame,
      watermark: String = "4 hours"): DataFrame = {
    val horizonMin = graft.queries.Events.AttribHorizonUs / 60000000L
    val touches = events
      .filter(col("event_type").isin("view", "click"))
      .select(col("event_type").as("channel"), col("event_id"),
        col("user_id").as("t_user"), col("ts").as("t_ts"))
      .withWatermark("t_ts", watermark)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", watermark)
    touches.join(purchases,
        col("t_user") === col("p_user") &&
        col("p_ts") > col("t_ts") &&
        col("p_ts") <= col("t_ts") + expr(s"INTERVAL $horizonMin MINUTES"))
      .select(col("channel"), col("event_id"), col("t_user").as("user_id"),
        graft.queries.Events.decayWeightPpm(
          unix_micros(col("p_ts")) - unix_micros(col("t_ts"))).as("w_ppm"))
  }

  // ---- custom state: sessionization via flatMapGroupsWithState ----------

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionState(sessionStart: Long, lastSeen: Long, nEvents: Long)

  final case class SessionOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long)

  private val GapMs = 30L * 60 * 1000

  /** Custom sessionizer: one open-session record per user in the state
    * store; a session closes when the event-time watermark passes its
    * last-seen + gap (timeout), or splits when a later event arrives past
    * the gap. Emits closed sessions only (append mode).
    */
  def sessionize(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            // watermark passed: close and emit the open session
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, new Timestamp(s.sessionStart),
              new Timestamp(s.lastSeen), s.nEvents))
          } else {
            // fold this micro-batch's events (in event-time order) into the
            // open session, emitting any sessions closed by gap splits
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
            val closed = Seq.newBuilder[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastSeen <= GapMs =>
                  cur = Some(s.copy(lastSeen = math.max(s.lastSeen, t),
                    nEvents = s.nEvents + 1))
                case Some(s) =>
                  closed += SessionOut(userId, new Timestamp(s.sessionStart),
                    new Timestamp(s.lastSeen), s.nEvents)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close when event time passes lastSeen + gap
              state.setTimeoutTimestamp(s.lastSeen + GapMs)
            }
            closed.result().iterator
          }
      }
  }

  final case class FunnelState(stageTs: Seq[Long])

  final case class FunnelOut(user_id: Long, funnel_depth: Long, at: Timestamp)

  /** Stateful streaming funnel — the q78 dual, generalized to an
    * arbitrary depth-N stage list exactly like the batch
    * [[graft.queries.Events.funnelStages]]: one N-long record per user
    * in the state store (the stage timestamps — never the user's
    * events), advanced causally as events arrive; each depth TRANSITION
    * emits a row (append mode), so the sink is the conversion log a
    * dashboard tails, and a user's max emitted depth is their current
    * funnel position.
    *
    * Semantics are the cascaded conditional mins under ARRIVAL order
    * (the [[DocStream.budgetAdmitted]] posture): processed in event-time
    * order they converge to the batch answer — stage 0's first arrival
    * is its min, and each later stage's first qualifying arrival IS its
    * conditional min (pinned by FunnelStreamSpec at depths 3 and 4); an
    * out-of-order straggler that would have changed an already-taken
    * min is a divergence the batch operator owns, as with every causal
    * dual. Within a micro-batch, a user's slice is sorted by
    * (ts, event_id) — one user of one batch, never the stream.
    */
  def funnelStages(events: Dataset[Event], stages: Seq[String])
      : Dataset[FunnelOut] = {
    require(stages.nonEmpty && stages.distinct.size == stages.size,
      s"funnel stages must be non-empty and distinct: $stages")
    import events.sparkSession.implicits._
    val Unset = Long.MinValue
    val idx = stages.zipWithIndex.toMap
    val n = stages.length
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[FunnelState]) =>
          val ts = state.getOption.map(_.stageTs.toArray)
            .getOrElse(Array.fill(n)(Unset))
          val out = Seq.newBuilder[FunnelOut]
          batch.toSeq.sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id)).foreach { e =>
            idx.get(e.event_type).foreach { i =>
              val qualifies = ts(i) == Unset &&
                (i == 0 || (ts(i - 1) != Unset && e.ts.getTime > ts(i - 1)))
              if (qualifies) {
                ts(i) = e.ts.getTime
                out += FunnelOut(userId, i + 1L, e.ts)
              }
            }
          }
          state.update(FunnelState(ts.toSeq))
          out.result().iterator
      }
  }

  /** The 3-stage instance (view → click → purchase) — the q78 dual. */
  def funnel(events: Dataset[Event]): Dataset[FunnelOut] =
    funnelStages(events, Seq("view", "click", "purchase"))

  final case class TransState(lastType: String)

  final case class TransOut(user_id: Long, event_type: String,
      next_type: String)

  /** Stateful streaming transitions — the q145 dual: per user the state
    * is the LAST event type seen (ONE string — constant per user, never
    * history); each arrival emits one (prev → current) adjacency row in
    * append mode, so `count(*) GROUP BY event_type, next_type` over the
    * emitted log IS the batch q145 matrix
    * (TransitionStreamSpec-by-way-of-EventStreamSpec pins the equality
    * across a batch boundary). In-batch arrivals sort by
    * (ts, event_id) — exactly the batch window's order. Causal caveat
    * (the funnel posture): fed in event-time order the adjacency is the
    * batch adjacency; an out-of-order straggler splices between the
    * wrong neighbors — the divergence every causal dual here owns.
    */
  def transitions(events: Dataset[Event]): Dataset[TransOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TransState, TransOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[TransState]) =>
          var last = state.getOption.map(_.lastType).orNull
          val out = Seq.newBuilder[TransOut]
          batch.toSeq.sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id)).foreach { e =>
            if (last != null) out += TransOut(userId, last, e.event_type)
            last = e.event_type
          }
          if (last != null) state.update(TransState(last))
          out.result().iterator
      }
  }

  final case class CohortState(cohortWeek: Long, offsetsSeen: Seq[Long])

  final case class CohortOut(user_id: Long, cohort_week: Long,
      week_offset: Long)

  /** Stateful streaming retention — the q98 dual: per user, the state is
    * (cohort week = first-seen activity week, offsets already credited);
    * a user's first event in a not-yet-seen week emits ONE
    * (user, cohort_week, week_offset) increment row (append mode). The
    * sink is the increment log: `count(*) GROUP BY cohort_week,
    * week_offset` over it IS the batch q98 matrix (each user counted
    * once per active week — RetentionStreamSpec pins the equality
    * across a batch boundary). Week numbers are the same epoch-micros
    * integer `div` as batch, so both engines bucket identically.
    *
    * Causal caveat (the funnel posture): fed in event-time order the
    * first-seen week IS the min week; an out-of-order straggler from an
    * EARLIER week would have re-based the batch cohort — that
    * divergence is the batch operator's to own, as with every causal
    * dual here.
    *
    * State bound at 100 TB: one record per user of (1 + active weeks)
    * longs — the per-user projection of the batch plan's distinct
    * (user, week) relation, NEVER the events; a year-long stream holds
    * ≤ 53 offsets per user.
    */
  def retentionCohorts(events: Dataset[Event]): Dataset[CohortOut] = {
    import events.sparkSession.implicits._
    val WeekMicros = 604800000000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[CohortState, CohortOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[CohortState]) =>
          val weeks = batch.map(e => Math.floorDiv(e.ts.getTime * 1000L,
            WeekMicros)).toSeq.sorted
          if (weeks.isEmpty) Iterator.empty
          else {
            val st = state.getOption
              .getOrElse(CohortState(weeks.head, Seq.empty))
            val seen = scala.collection.mutable.LinkedHashSet(
              st.offsetsSeen: _*)
            val out = weeks.flatMap { w =>
              val off = w - st.cohortWeek
              if (seen.add(off)) Some(CohortOut(userId, st.cohortWeek, off))
              else None
            }
            state.update(CohortState(st.cohortWeek, seen.toSeq))
            out.iterator
          }
      }
  }
}
