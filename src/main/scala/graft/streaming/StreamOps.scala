package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming mirrors of the reference's streaming apps.
  * Each takes already-streaming inputs (readStream / MemoryStream) so
  * specs can drive them batch-by-batch; the semantics match the batch
  * operators in graft.operators, which the specs cross-check.
  *
  * Flink → Spark mapping used throughout:
  *  - keyed ValueState/TTL → `flatMapGroupsWithState` per-key state
  *  - CEP within-window    → per-key state + event-time timeout
  *  - side outputs         → column routing / filtered branches
  *  - interval join        → stream-stream join with time-range bound
  *  - tumbling window agg  → watermark + `window()` groupBy
  */
object StreamOps {

  /** The streaming event record (page-log analog). */
  case class Evt(event_id: Long, user_id: Long, event_type: String,
    value: Double, ts: Timestamp)

  case class Flagged(event_id: Long, user_id: Long, is_new: Int)
  case class Visit(user_id: Long, visit_date: String, event_id: Long)
  case class Jump(event_id: Long, user_id: Long, ts_ms: Long)

  /** jumpDetect per-key state: pending bounce candidate. */
  case class JumpState(eventId: Long, tsMs: Long, isolated: Boolean)

  private val GapMs = graft.operators.Sessions.GapMs

  /** BaseLogApp stream split (side-output analog): tag each event with
    * its target stream. Downstream sinks filter on `stream`. */
  def route(df: DataFrame): DataFrame =
    df.withColumn("stream",
      when(col("event_type").isin("view", "click"), "page")
        .when(col("event_type") === "signup", "start")
        .otherwise("other"))

  /** BaseLogApp new-user repair (keyed ValueState): the first event a
    * user ever produces is `is_new = 1`, everything after is 0 — state
    * survives across micro-batches. */
  def newUserFlag(ds: Dataset[Evt]): Dataset[Flagged] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[Boolean, Flagged](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, events, state: GroupState[Boolean]) =>
          var seen = state.getOption.getOrElse(false)
          val out = events.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).map { e =>
            val f = Flagged(e.event_id, e.user_id, if (seen) 0 else 1)
            seen = true
            f
          }
          state.update(seen)
          out.iterator
      }
  }

  case class Lateness(event_id: Long, user_id: Long, late_us: Long)

  /** Streaming twin of `EventAnalytics.outOfOrder` — the LIVE
    * watermark-lag monitor: per-user event-time high-water mark in
    * keyed state; every arrival scores its lateness against it the
    * instant it lands (within a batch, arrival order = event_id, the
    * same ingest-sequence contract as the batch op). Feed its output to
    * a windowed max/quantile and you are watching exactly the disorder
    * the configured watermark must cover. State is ONE long per user. */
  def latenessMonitor(ds: Dataset[Evt]): Dataset[Lateness] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, Lateness](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, events, state: GroupState[Long]) =>
          var hwm = state.getOption.getOrElse(Long.MinValue)
          val out = events.toSeq.sortBy(_.event_id).map { e =>
            // full micro precision: getTime truncates to millis, the
            // sub-ms digits ride in getNanos (batch op compares ts_us)
            val tus = math.floorDiv(e.ts.getTime, 1000L) * 1000000L + e.ts.getNanos / 1000L
            val late = if (hwm == Long.MinValue || hwm <= tus) 0L else hwm - tus
            if (tus > hwm) hwm = tus
            Lateness(e.event_id, e.user_id, late)
          }
          state.update(hwm)
          out.iterator
      }
  }

  /** UniqueVisitApp (keyed first-visit state + 1-day TTL): emit only
    * each user's first event per day. State is just the latest visit
    * date string — the TTL falls out of the date comparison. */
  def uniqueVisit(ds: Dataset[Evt]): Dataset[Visit] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[Set[String], Visit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (uid, events, state: GroupState[Set[String]]) =>
          var seen = state.getOption.getOrElse(Set.empty[String])
          val out = events.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).flatMap { e =>
            // UTC-pinned (SimpleDateFormat would use the JVM default
            // timezone and diverge from the UTC-session batch operator)
            val day = e.ts.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
            if (seen(day)) None
            else { seen += day; Some(Visit(uid, day, e.event_id)) }
          }
          // TTL: keep every date within the 1-day lateness horizon of
          // the newest (the reference's 1-day state TTL) — keeping ONLY
          // the max would re-emit a duplicate first-visit row when a
          // late cross-day event lands inside the allowed lateness.
          // State stays bounded (≤ horizon+1 dates per key); events
          // older than the horizon are past the upstream watermark.
          val newest = java.time.LocalDate.parse(seen.max)
          state.update(seen.filter(d =>
            java.time.temporal.ChronoUnit.DAYS.between(
              java.time.LocalDate.parse(d), newest) <= 1L))
          out.iterator
      }
  }

  /** UserJumpDetailApp (CEP + timeout): an event is a jump (bounce) if
    * no other event of the same user lands within the session gap on
    * either side. The candidate is held in per-key state; the next
    * event either cancels it (gap small) or confirms it (gap large);
    * the event-time timeout confirms a candidate the stream never
    * followed up — exactly the reference's PatternTimeoutFunction. */
  def jumpDetect(ds: Dataset[Evt]): Dataset[Jump] = {
    import ds.sparkSession.implicits._
    ds.withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[JumpState, Jump](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, events, state: GroupState[JumpState]) =>
          if (!events.hasNext && state.hasTimedOut) {
            // stream went quiet past the watermark: pending candidate is a jump
            val out = state.getOption.collect {
              case JumpState(id, ts, true) => Jump(id, uid, ts)
            }
            state.remove()
            out.iterator
          } else {
            val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var pending = state.getOption
            val out = Seq.newBuilder[Jump]
            sorted.foreach { e =>
              val t = e.ts.getTime
              pending match {
                case Some(JumpState(pid, pts, isolated)) =>
                  if (t - pts > GapMs) {
                    if (isolated) out += Jump(pid, uid, pts)
                    pending = Some(JumpState(e.event_id, t, isolated = true))
                  } else {
                    pending = Some(JumpState(e.event_id, t, isolated = false))
                  }
                case None =>
                  pending = Some(JumpState(e.event_id, t, isolated = true))
              }
            }
            pending.foreach { p =>
              state.update(p)
              state.setTimeoutTimestamp(p.tsMs + GapMs + 1)
            }
            out.result().iterator
          }
      }
  }

  /** Buffered event / pending candidate / per-key state for
    * [[jumpDetectStrict]] — top-level for Encoder derivation. */
  case class CepEvt(eventId: Long, tsUs: Long, isEntry: Boolean)
  case class CepPending(eventId: Long, tsUs: Long)
  case class CepState(pending: Option[CepPending], buf: Seq[CepEvt])

  case class FunnelEvt(eventId: Long, tsUs: Long, tpe: String)
  case class FunnelState(t1: Option[Long], t2: Option[Long], done: Boolean, buf: Seq[FunnelEvt])
  case class StageHit(stage: String, user_id: Long, ts_us: Long)

  /** Streaming conversion funnel — the per-user view→click→purchase
    * ladder of the batch `EventAnalytics.funnelWindowed`, as an
    * event-time state machine: stage 2 must land strictly after stage
    * 1 and inside the conversion window anchored at the FIRST view;
    * stage 3 strictly after stage 2, same anchor window. Out-of-order
    * safety uses the buffer-until-watermark skeleton shared with
    * [[jumpDetectStrict]]: events ripen only once the watermark
    * passes them, ripe events replay in (ts, event_id) order, so the
    * first-qualifying-event decisions are exactly the batch op's
    * min-over-qualifying choices. Emits one StageHit per completed
    * stage (groupBy(stage).count downstream is the batch output).
    * State is three longs + flags per user — the same per-user
    * footprint the batch distinct needs — plus the unripe buffer,
    * which the watermark bounds. */
  def funnelStream(ds: Dataset[Evt], windowUs: Long = 72L * 3600L * 1000000L): Dataset[StageHit] = {
    import ds.sparkSession.implicits._
    def usOf(t: Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
    ds.withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, StageHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, events, state: GroupState[FunnelState]) =>
          val prev = state.getOption.getOrElse(FunnelState(None, None, done = false, Nil))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val incoming = events.map(e => FunnelEvt(e.event_id, usOf(e.ts), e.event_type)).toSeq
          val all = (prev.buf ++ incoming).sortBy(e => (e.tsUs, e.eventId))
          // ripeness is STRICT (tsUs < wm, same rule at every
          // buffer-until-final op). Probed on Spark 4.1: the
          // EventTimeTimeout late filter drops incoming rows with
          // event time <= the batch watermark, so once wm reaches an
          // event's ts no equal-ts peer can arrive and consuming AT
          // equality would also be safe — strict ripeness costs one
          // batch of latency and keeps the rule identical to Spark's
          // own "strictly older than watermark" eviction framing,
          // rather than leaning on the filter's boundary convention.
          // Cross-batch equal-ts peers DO happen while wm < ts; the
          // buffer sort on (tsUs, eventId) is what orders those
          // (StreamingSpec "equal-ts replay order" specs).
          val (ripe, unripe) = all.partition(_.tsUs < wmUs)
          var (t1, t2, done) = (prev.t1, prev.t2, prev.done)
          val out = Seq.newBuilder[StageHit]
          ripe.foreach { e =>
            e.tpe match {
              case "view" if t1.isEmpty =>
                t1 = Some(e.tsUs); out += StageHit("1_view", uid, e.tsUs)
              case "click" if t1.nonEmpty && t2.isEmpty &&
                  e.tsUs > t1.get && e.tsUs <= t1.get + windowUs =>
                t2 = Some(e.tsUs); out += StageHit("2_click", uid, e.tsUs)
              case "purchase" if t2.nonEmpty && !done &&
                  e.tsUs > t2.get && e.tsUs <= t1.get + windowUs =>
                done = true; out += StageHit("3_purchase", uid, e.tsUs)
              case _ => // non-qualifying: wrong stage, out of window, or repeat
            }
          }
          state.update(FunnelState(t1, t2, done, unripe))
          // unripe events need a wake-up even if the key goes quiet
          unripe.headOption.foreach(e => state.setTimeoutTimestamp(e.tsUs / 1000L + 1))
          out.result().iterator
      }
  }

  case class TouchEvt(eventId: Long, tsUs: Long, tpe: String, isConv: Boolean, value: Double)
  case class AttrState(pending: Seq[TouchEvt], buf: Seq[TouchEvt])
  case class ConvCredit(conv_id: Long, user_id: Long, first_touch: String,
    last_touch: String, conv_value: Double)

  /** Streaming multi-touch ATTRIBUTION — the continuous twin of
    * `EventAnalytics.attribution` (first/last-touch credit per
    * conversion; `groupBy(first_touch)` / `groupBy(last_touch)`
    * rollups downstream are the batch op's output): per-user
    * event-time state on the buffer-until-watermark skeleton shared
    * with [[funnelStream]]/[[jumpDetectStrict]]. Ripe events replay in
    * (ts, event_id) order; a touch joins the pending set; a conversion
    * consumes the WHOLE pending set (a touch credits only its NEXT
    * conversion — later touches belong to later conversions), crediting
    * those within the lookback window: earliest = first-touch, latest =
    * last-touch, emitted as one ConvCredit the moment the watermark
    * passes the conversion (every crediting touch sorts BEFORE the
    * conversion, so nothing later can change the verdict — no need to
    * hold until conversion+lookback). Conversions with no in-window
    * touch emit nothing, exactly the batch semantics.
    *
    * State per key = the pending touch set, PRUNED to the lookback
    * horizon (a touch whose window the watermark has closed can never
    * credit a future ripe conversion), plus the unripe buffer the
    * watermark bounds — both O(window), never O(history). */
  def attributionStream(ds: Dataset[Evt],
      windowUs: Long = 86400000000L): Dataset[ConvCredit] = {
    import ds.sparkSession.implicits._
    val touchTypes = graft.operators.EventAnalytics.TouchTypes.toSet
    def usOf(t: Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
    ds.filter(e => touchTypes(e.event_type) || e.event_type == "purchase")
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AttrState, ConvCredit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, events, state: GroupState[AttrState]) =>
          val prev = state.getOption.getOrElse(AttrState(Nil, Nil))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val incoming = events.map(e =>
            TouchEvt(e.event_id, usOf(e.ts), e.event_type,
              e.event_type == "purchase", e.value)).toSeq
          val all = (prev.buf ++ incoming).sortBy(e => (e.tsUs, e.eventId))
          val (ripe, unripe) = all.partition(_.tsUs < wmUs)
          var pending = prev.pending
          val out = Seq.newBuilder[ConvCredit]
          ripe.foreach { e =>
            if (e.isConv) {
              // equal-ts tie: a touch with the same ts but a SMALLER
              // event_id sorted before this conversion → credits it
              // (the batch op's strict (ts, event_id) composite)
              val credited = pending.filter(t => e.tsUs - t.tsUs <= windowUs)
              if (credited.nonEmpty) {
                val first = credited.minBy(t => (t.tsUs, t.eventId))
                val last = credited.maxBy(t => (t.tsUs, t.eventId))
                out += ConvCredit(e.eventId, uid, first.tpe, last.tpe, e.value)
              }
              pending = Nil // consumed: their next conversion was this one
            } else {
              pending = pending :+ e
            }
          }
          // horizon prune: touches that can no longer credit anything
          pending = pending.filter(t => t.tsUs + windowUs >= wmUs)
          if (pending.isEmpty && unripe.isEmpty) state.remove()
          else {
            state.update(AttrState(pending, unripe))
            // unripe events need a wake-up even if the key goes quiet;
            // a quiet key with only pending touches wakes at its prune
            // horizon so state cannot linger past the lookback
            val wake = unripe.headOption.map(_.tsUs)
              .getOrElse(pending.map(_.tsUs + windowUs).max)
            state.setTimeoutTimestamp(wake / 1000L + 1)
          }
          out.result().iterator
      }
  }

  /** [[sequenceCountStream]] per-key state: the two greedy-matcher
    * counters plus the not-yet-watermark-final event buffer. */
  case class SeqCState(buf: Seq[(Long, Long, Boolean)], open: Long, matches: Long)
  case class ConvCount(user_id: Long, conversions: Long)

  /** `EventAnalytics.sequenceCount` served LIVE — the repeat-conversion
    * counter maintained per user across micro-batches. The batch op's
    * bracket-matching window needs the whole history; the STREAMING
    * form is where the greedy matcher's O(1) recurrence actually runs:
    * per-key state is exactly TWO longs (unmatched views `open`,
    * completed matches) plus the ≤-watermark-horizon event buffer —
    * the same buffer-until-final discipline as [[jumpDetectStrict]],
    * so out-of-order arrival within the watermark cannot mis-order a
    * view/purchase pair (events apply in (ts, event_id) event-time
    * order, matching the batch op verdict-for-verdict). Emits a
    * (user_id, conversions) snapshot whenever the count advances
    * (Append mode); keys persist their two counters (user-dim-bounded,
    * the newUserFlag contract) while the buffer drains to zero on
    * quiet keys via the event-time timeout. */
  def sequenceCountStream(ds: Dataset[Evt]): Dataset[ConvCount] = {
    import ds.sparkSession.implicits._
    def usOf(t: Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
    ds.filter(e => e.event_type == "view" || e.event_type == "purchase")
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SeqCState, ConvCount](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, events, state: GroupState[SeqCState]) =>
          val prev = state.getOption.getOrElse(SeqCState(Nil, 0L, 0L))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val incoming = events.map(e =>
            (e.event_id, usOf(e.ts), e.event_type == "purchase")).toSeq
          val all = (prev.buf ++ incoming).sortBy(e => (e._2, e._1))
          val (ripe, unripe) = all.partition(_._2 < wmUs)
          var open = prev.open
          var matches = prev.matches
          ripe.foreach { case (_, _, isPurchase) =>
            if (isPurchase) { if (open > 0) { open -= 1; matches += 1 } }
            else open += 1
          }
          if (unripe.nonEmpty)
            state.setTimeoutTimestamp(unripe.head._2 / 1000L + 1)
          state.update(SeqCState(unripe, open, matches))
          if (matches > prev.matches) Iterator(ConvCount(uid, matches))
          else Iterator.empty
      }
  }

  /** The reference's EXACT CEP bounce pattern as a stream
    * (UserJumpDetailApp.java:84-95: session-entry `.times(2)
    * .consecutive().within(10 s)` plus the timeout side output):
    * an entry event is a bounce iff the user's next event is ANOTHER
    * entry within 10 s (matched pair → first fires), or no event at
    * all arrives within 10 s (timeout → the pending candidate fires).
    * A non-entry event within 10 s kills the candidate — the
    * `consecutive()` strictness.
    *
    * Like Flink CEP, events BUFFER in state until the watermark passes
    * them, and the pattern machine only ever consumes watermark-final
    * events in event-time order — so out-of-order arrival across
    * micro-batches cannot fire a false pair or falsely kill a
    * candidate, and results match the batch `Dwm.userJumpStrict`
    * verdict-for-verdict (comparisons run at microsecond granularity,
    * same as the batch op's ts_us). A candidate whose 10 s window the
    * watermark has closed with no successor emits immediately; the
    * event-time timeout (Flink's PatternTimeoutFunction analog) covers
    * keys the stream went quiet on. State per key = one candidate +
    * the ≤watermark-horizon buffer. */
  def jumpDetectStrict(ds: Dataset[Evt]): Dataset[Jump] = {
    import ds.sparkSession.implicits._
    val WinUs = 10L * 1000000L
    def usOf(t: Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
    ds.withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[CepState, Jump](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, events, state: GroupState[CepState]) =>
          // one unified body: a timeout call is just "no new events" —
          // everything re-derives from the buffer and the watermark
          val prev = state.getOption.getOrElse(CepState(None, Nil))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val incoming = events
            .map(e => CepEvt(e.event_id, usOf(e.ts), e.event_type == "signup")).toSeq
          val all = (prev.buf ++ incoming).sortBy(b => (b.tsUs, b.eventId))
          val (ripe, unripe) = all.partition(_.tsUs < wmUs)
          var pending = prev.pending
          val out = Seq.newBuilder[Jump]
          ripe.foreach { e =>
            pending.foreach { p =>
              if (e.tsUs - p.tsUs > WinUs) out += Jump(p.eventId, uid, p.tsUs / 1000)
              else if (e.isEntry) out += Jump(p.eventId, uid, p.tsUs / 1000)
              // else: non-entry within 10 s → real visit, candidate dies
            }
            pending = if (e.isEntry) Some(CepPending(e.eventId, e.tsUs)) else None
          }
          // window closed by the watermark with no successor: bounce now
          // (any in-window event would have ts ≤ wm and be ripe already)
          pending.filter(p => wmUs > p.tsUs + WinUs).foreach { p =>
            out += Jump(p.eventId, uid, p.tsUs / 1000)
            pending = None
          }
          if (pending.isEmpty && unripe.isEmpty) {
            if (state.exists) state.remove()
          } else {
            state.update(CepState(pending, unripe))
            // wake at the earliest next decision point; always > wm
            val nextUs = (pending.map(_.tsUs + WinUs) ++ unripe.headOption.map(_.tsUs)).min
            state.setTimeoutTimestamp(nextUs / 1000 + 1)
          }
          out.result().iterator
      }
  }

  /** Streaming exact dedup: drop events whose `event_id` repeats
    * within the watermark horizon (at-least-once upstream → effectively-
    * once downstream, the Kafka-redelivery guard). State is bounded by
    * the watermark — the built-in form of UniqueVisitApp's TTL idea. */
  def dedupWithinWatermark(df: DataFrame): DataFrame =
    df.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Gap-based sessionization as a STREAM — the continuous mirror of
    * the batch `EventAnalytics.sessionize`, via Spark's native
    * `session_window`: per-user windows that extend while events keep
    * arriving within the gap and close once the watermark passes the
    * last event + gap. Emits one finalized row per session (append
    * mode) with the same stats as the batch op. Late events inside the
    * watermark horizon merge sessions exactly like the batch window
    * pass would. */
  def sessionizeStream(df: DataFrame): DataFrame =
    df.withWatermark("ts", "10 minutes")
      // gap + 1µs: session_window merges on next.start < cur.end
      // (end-EXCLUSIVE), while the batch op's new-session test is
      // strict (gap > 600s keeps the boundary event in-session) — the
      // one-microsecond pad makes the two conventions agree exactly
      .groupBy(session_window(col("ts"), "600000001 microseconds").as("w"),
        col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("stt"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("edt"),
        // the batch op's exact decimal money accumulation, not raw
        // double sums whose low bits drift with micro-batch order
        graft.operators.Agg.moneySum(col("value")).as("value_sum"))
      .select(col("user_id"), col("n_events"), col("stt"), col("edt"),
        col("value_sum"))

  /** VisitorStatsApp: watermark + tumbling-window multi-metric
    * aggregation (hour windows, `user_id % 10` channel dim). */
  def visitorStats(df: DataFrame): DataFrame =
    df.withWatermark("ts", "10 minutes")
      .groupBy(
        window(col("ts"), "1 hour").as("w"),
        (col("user_id") % 10).as("ch"))
      .agg(
        sum(when(col("event_type").isin("view", "click"), 1).otherwise(0)).as("pv_ct"),
        count(lit(1)).as("ev_ct"),
        sum(col("value")).as("dur_sum"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
        date_format(col("w.end"), "yyyy-MM-dd HH:mm:ss").as("edt"),
        col("ch"), col("pv_ct"), col("ev_ct"), col("dur_sum"))

  /** Hopping-window visitor stats — the streaming twin of
    * `Dws.visitorStatsHop` (Flink HOP: size 2 h, slide 1 h). Each
    * event contributes to both covering windows; the watermark closes
    * a window once event time passes its END + delay, so the
    * overlapping windows finalize one slide apart. */
  def visitorStatsHop(df: DataFrame): DataFrame =
    df.withWatermark("ts", "10 minutes")
      .groupBy(
        window(col("ts"), "2 hours", "1 hour").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("pv_ct"), sum(col("value")).as("val_sum"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
        date_format(col("w.end"), "yyyy-MM-dd HH:mm:ss").as("edt"),
        col("event_type"), col("pv_ct"), col("val_sum"))

  /** KeywordStatsApp (tokenize + LATERAL explode + windowed count):
    * the UDTF becomes an explode over the tokenizer; counts roll up
    * per keyword per tumbling window behind a watermark. `textCol`
    * rides in the Evt `event_type` slot in specs. */
  def keywordStats(df: DataFrame, textCol: String): DataFrame =
    df.withWatermark("ts", "10 minutes")
      .select(col("ts"), explode(split(col(textCol), " ")).as("keyword"))
      .filter(length(col("keyword")) > 0)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("keyword"))
      .agg(count(lit(1)).as("ct"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
        col("keyword"), col("ct"))

  /** Windowed heavy hitters: the native Misra–Gries aggregate
    * (`graft.functions.TopKFreqAgg`) running INSIDE a streaming
    * window — per micro-batch partials merge into the window's state
    * summary (TypedImperativeAggregate serializes its ≤ k counters
    * into the state store), so a window's top terms are served from
    * O(k) state no matter how many events it absorbs; the watermark
    * closes the window and emits the final summary. This is the
    * streaming form of `q_heavy_hitters` — the exact windowed count
    * (`keywordStats`) keys state per (window, term), which grows with
    * vocabulary; this keeps one bounded row per window. Caller must
    * have `Graft.registerFunctions` applied to the session. */
  def heavyHittersWindowed(df: DataFrame, textCol: String, k: Int = 8): DataFrame =
    df.withWatermark("ts", "10 minutes")
      .select(col("ts"), explode(split(col(textCol), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(call_function("graft_topk_freq", col("term"), lit(k)).as("summary"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
        explode(col("summary")).as("e"))
      .select(col("stt"), col("e.item").as("item"), col("e.count").as("count"))

  /** Windowed approximate distinct visitors: Datasketches HLL running
    * inside the streaming window — the UniqueVisitApp-at-scale shape
    * where exact per-window distinct state (one row per (window, user))
    * would grow with the audience. Each micro-batch's partial sketch
    * unions into the window's state-store sketch; the closed window
    * emits the estimate plus exact-state-free cardinality from
    * kilobytes of state per window. */
  def approxDistinctWindowed(df: DataFrame): DataFrame =
    df.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(
        hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(14))).as("approx_uv"),
        count(lit(1)).as("ev_ct"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
        col("approx_uv"), col("ev_ct"))

  /** Windowed EXACT distinct visitors via the native Roaring bitmap
    * aggregate — [[approxDistinctWindowed]]'s exact sibling and the
    * third point on the windowed-distinct spectrum: exact-by-rows
    * (`dauStream`'s chained agg keeps one state row per (window,
    * user)), exact-by-bitmap (THIS — state per window is ONE
    * compressed bitmap, ~2 bits-2 bytes per user, partials OR through
    * the state store), approximate (HLL — kilobytes flat at any
    * audience). The cardinality an OR-merged bitmap reports is exact
    * regardless of micro-batch order, so this output is spec-checked
    * EQUAL to the chained-agg path, at bitmap-sized state. */
  def bitmapDistinctWindowed(df: DataFrame): DataFrame = {
    graft.Graft.registerFunctions(df.sparkSession)
    df.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(
        call_function("graft_bitmap_card", col("user_id")).as("uv"),
        count(lit(1)).as("ev_ct"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
        col("uv"), col("ev_ct"))
  }

  /** Online near-dup gate: each incoming document is MinHash-banded
    * (the native `graft_minhash_sig` — a narrow per-row projection, so
    * it runs unchanged inside the stream) and joined stream-STATIC
    * against the pre-built corpus band index; a bucket collision
    * flags the incoming doc against its corpus twin. Multi-band
    * collisions dedup through `dropDuplicatesWithinWatermark`, so
    * per-pair state expires with the watermark instead of growing
    * with the stream. This is how a training-data ingest rejects
    * near-copies of an already-curated corpus without re-running batch
    * dedup: the corpus index is built once (batch `Dedup.bandIndex`),
    * the stream pays one narrow projection + one broadcastable join
    * per row. Candidates are band-level (the batch op's exact-Jaccard
    * verify runs downstream on the flagged pairs). */
  def nearDupGate(stream: DataFrame, corpus: DataFrame): DataFrame = {
    // the static side of a stream-static join re-executes per trigger:
    // cache the banded index so the corpus pays shingling + 128-hash
    // signatures ONCE, not once per micro-batch
    val idx = graft.operators.Dedup.bandIndex(corpus)
      .select(col("doc_id").as("ref_id"), col("band"), col("bk"))
      .cache()
    graft.operators.Dedup.bandIndex(stream.withWatermark("ts", "10 minutes"))
      .join(idx, Seq("band", "bk"))
      .filter(col("doc_id") =!= col("ref_id"))
      .select(col("doc_id"), col("ts"), col("ref_id"))
      .dropDuplicatesWithinWatermark("doc_id", "ref_id")
      .select(col("doc_id"), col("ref_id"))
  }

  /** Ingest-time EXACT-dup admission — the streaming twin of
    * `Dedup.bloomGate` and the exact-match sibling of [[nearDupGate]]:
    * the standing corpus is reduced ONCE to a Bloom filter over its
    * content fingerprints (one bounded binary, built at stream setup
    * via the native `graft_bloom_agg`), and every stream row probes it
    * in-row via `graft_bloom_contains` — k bit-tests inside codegen,
    * no per-row state, no stream-side shuffle. Only probe HITS pay the
    * stream-static fingerprint join for the exact verdict; misses are
    * admitted on the probe alone (the Bloom no-false-negative
    * guarantee: a miss can never be a true duplicate). At 100 TB the
    * corpus never re-scans per trigger — unlike a plain stream-static
    * join, the static side is a literal, not a plan subtree.
    * Emits (doc_id, bloom_hit, is_dup) per stream row. */
  def bloomAdmit(stream: DataFrame, corpus: DataFrame,
      expectedItems: Long = 100000L, fpp: Double = 0.01): DataFrame = {
    import graft.functions.TextFunctions.fingerprint
    val s = corpus.sparkSession
    graft.Graft.registerFunctions(s)
    val bloomBytes = corpus
      .agg(call_function("graft_bloom_agg",
        xxhash64(fingerprint(col("text"))), lit(expectedItems), lit(fpp)))
      .head().getAs[Array[Byte]](0)
    // the exact-verify side: distinct corpus fingerprints, cached so
    // the per-trigger join re-reads memory, not the corpus
    val fps = corpus.select(fingerprint(col("text")).as("fp")).distinct()
      .withColumn("m", lit(1)).cache()
    val probed = stream
      .withColumn("fp", fingerprint(col("text")))
      .withColumn("bloom_hit",
        call_function("graft_bloom_contains", lit(bloomBytes), xxhash64(col("fp"))))
    val hits = probed.filter(col("bloom_hit"))
      .join(fps, Seq("fp"), "left")
      .select(col("doc_id"), col("bloom_hit").cast("int").as("bloom_hit"),
        coalesce(col("m"), lit(0)).as("is_dup"))
    val misses = probed.filter(!col("bloom_hit"))
      .select(col("doc_id"), col("bloom_hit").cast("int").as("bloom_hit"),
        lit(0).as("is_dup"))
    hits.unionByName(misses)
  }

  /** OrderWideApp / PaymentWideApp interval join: stream⋈stream on key
    * + time-range with watermarks bounding state retention. `left` are
    * order headers, `right` are detail events; details must land within
    * [order ts, order ts + 30 min]. */
  def intervalJoin(left: DataFrame, right: DataFrame): DataFrame =
    intervalJoinOn(
      left.withWatermark("ts", "10 minutes"),
      right.withWatermark("ts", "40 minutes"))

  /** Interval join over inputs that ALREADY carry watermarks — needed
    * when chaining joins (OrderWide → PaymentWide): the output of a
    * stream-stream join inherits its watermark, and redefining one is
    * disallowed. */
  def intervalJoinOn(l: DataFrame, r: DataFrame): DataFrame = {
    l.alias("l").join(r.alias("r"),
      expr("""l.user_id = r.user_id AND
              r.ts >= l.ts AND
              r.ts <= l.ts + interval 30 minutes"""))
      .select(
        col("l.event_id").as("order_event"),
        col("r.event_id").as("detail_event"),
        col("l.user_id").as("user_id"),
        col("l.ts").as("order_ts"), col("r.ts").as("detail_ts"))
  }

  /** LEFT OUTER interval join — the branch the reference handles with
    * its join-state timers (OrderWideApp keeps unmatched orders until
    * the interval closes): an order with no detail inside
    * [ts, ts + 30 min] must still emit, null-extended, once BOTH
    * watermarks prove no matching detail can arrive. Same key/range
    * condition as [[intervalJoinOn]]; Spark evicts the expired left
    * row from join state and emits it with nulls in the trigger after
    * the watermark passes — so the null rows are exactly-once, not
    * repeated per trigger. */
  def intervalJoinLeftOuter(left: DataFrame, right: DataFrame): DataFrame =
    left.withWatermark("ts", "10 minutes").alias("l")
      .join(right.withWatermark("ts", "40 minutes").alias("r"),
        expr("""l.user_id = r.user_id AND
                r.ts >= l.ts AND
                r.ts <= l.ts + interval 30 minutes"""),
        "leftOuter")
      .select(
        col("l.event_id").as("order_event"),
        col("r.event_id").as("detail_event"),
        col("l.user_id").as("user_id"),
        col("l.ts").as("order_ts"), col("r.ts").as("detail_ts"))

  /** DimAsyncFunction analog (app/func/DimAsyncFunction.java: every
    * stream record asynchronously looks up its dimension row in HBase
    * and merges the attributes in). Spark-native form: a stream-STATIC
    * broadcast hash join — no per-record RPC, no async client, no
    * cache-invalidation layer; the micro-batch joins against the dim
    * snapshot, and a file-backed dim is re-resolved every batch, so a
    * dim refresh between batches is picked up automatically (the
    * reference needed a Redis cache + TTL for the same freshness).
    * LEFT join: a missing dim row must not drop the fact record —
    * DimAsyncFunction's timeout branch keeps the record too. */
  def dimEnrich(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(org.apache.spark.sql.functions.broadcast(dim), Seq(key), "left")

  /** The streaming order-detail record (lineitem-as-stream analog) for
    * [[productStatsFullStream]] specs. Top-level: method-local case
    * classes have no Encoder. */
  case class LiEvt(order_key: Long, sku: Int, returnflag: String,
    qty: Double, price: Double, ts: Timestamp)

  /** ProductStatsApp's full wide row as a STREAM — the reference unions
    * ~7 DataStreams keyed by sku, tumbles, and reduce-merges a bean
    * whose orderIdSet gives exact distinct orders
    * (ProductStatsApp.java, bean/ProductStats.java:40).
    *
    * Carrying id-sets through state is the anti-scale move, so the
    * Spark-native form is a TWO-PHASE chained windowed aggregation
    * (Spark 4 multiple-stateful-operator support):
    *   1. both sources normalize to one row shape and union; events get
    *      a synthetic unique negative `okey` so phase 1 is a no-op for
    *      them, lineitem rows keep their real order key;
    *   2. phase 1 groups by (window, sku, okey) — per-ORDER partials,
    *      emitted once the watermark closes the window;
    *   3. phase 2 re-groups the finalized partials by (window, sku):
    *      `count(real okey)` IS the exact distinct-order count, and
    *      `max(has_refund)` per order rolls up to the distinct refund
    *      count — no HashSet ever lives in state, and state size is
    *      O(open windows × skus × open orders), watermark-bounded.
    * Expected input columns — events: (event_id, sku, event_type,
    * value, ts); lineitem: (order_key, sku, returnflag, qty, price, ts).
    */
  def productStatsFullStream(events: DataFrame, lineitem: DataFrame): DataFrame = {
    val z = lit(0.0)
    val ev = events.withWatermark("ts", "10 minutes")
      .select(
        col("ts"), col("sku"),
        (-col("event_id") - 1).cast("long").as("okey"),
        when(col("event_type") === "view", 1).otherwise(0).as("display_pv"),
        when(col("event_type") === "click", 1).otherwise(0).as("click_pv"),
        when(col("event_type") === "signup", 1).otherwise(0).as("favor_pv"),
        when(col("event_type") === "purchase", 1).otherwise(0).as("cart_pv"),
        when(col("event_type") === "purchase", col("value")).otherwise(z).as("pay_amt"),
        lit(0).as("is_refund"), z.as("qty"), z.as("ord_amt"))
    val li = lineitem.withWatermark("ts", "10 minutes")
      .select(
        col("ts"), col("sku"), col("order_key").as("okey"),
        lit(0).as("display_pv"), lit(0).as("click_pv"),
        lit(0).as("favor_pv"), lit(0).as("cart_pv"), z.as("pay_amt"),
        when(col("returnflag") === "R", 1).otherwise(0).as("is_refund"),
        col("qty"), col("price").as("ord_amt"))
    val perOrder = ev.unionByName(li)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("sku"), col("okey"))
      .agg(
        sum(col("display_pv")).as("display_pv"), sum(col("click_pv")).as("click_pv"),
        sum(col("favor_pv")).as("favor_pv"), sum(col("cart_pv")).as("cart_pv"),
        sum(col("pay_amt")).as("pay_amt"),
        max(col("is_refund")).as("has_refund"),
        sum(col("qty")).as("qty"), sum(col("ord_amt")).as("ord_amt"),
        sum(when(col("is_refund") === 1, col("ord_amt")).otherwise(z)).as("ref_amt"))
    perOrder
      .groupBy(col("w"), col("sku"))
      .agg(
        sum(col("display_pv")).as("display_ct"), sum(col("click_pv")).as("click_ct"),
        sum(col("favor_pv")).as("favor_ct"), sum(col("cart_pv")).as("cart_ct"),
        sum(col("pay_amt")).as("payment_amount"),
        sum(when(col("okey") >= 0, 1).otherwise(0)).as("order_ct"),
        sum(col("has_refund")).as("refund_order_ct"),
        sum(col("qty")).as("order_sku_num"),
        sum(col("ord_amt")).as("order_amount"),
        sum(col("ref_amt")).as("refund_amount"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
        col("sku"), col("display_ct"), col("click_ct"), col("favor_ct"),
        col("cart_ct"), col("payment_amount"), col("order_ct"),
        col("refund_order_ct"), col("order_sku_num"), col("order_amount"),
        col("refund_amount"))
  }

  /** The streaming order record (order_wide analog) for
    * [[provinceStatsStream]] specs. */
  case class ProvinceOrder(order_key: Long, province: String,
    amount: Double, ts: Timestamp)

  /** ProvinceStatsSqlApp (ProvinceStatsSqlApp.java:52-62) as a STREAM —
    * the one reference DWS app previously mirrored only in batch
    * (graft.operators.Dws.provinceStats): tumbling window × province
    * with `count(distinct order_id)` + `sum(amount)`.
    *
    * The Flink SQL keeps per-window distinct-order state internally;
    * the Spark-native form is the same two-phase CHAINED windowed
    * aggregation as [[productStatsFullStream]] (Spark 4 multiple
    * stateful operators): phase 1 groups by (window, province,
    * order_key) — per-ORDER amount partials, finalized when the
    * watermark closes the window — and phase 2 re-groups the partials
    * by (window, province), where `count(*)` IS the exact distinct
    * order count and the partial sums roll up exactly. No id-set in
    * state; state is O(open windows × provinces × open orders),
    * watermark-bounded.
    * Expected input columns: (order_key, province, amount, ts). */
  def provinceStatsStream(orders: DataFrame): DataFrame =
    orders.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("province"),
        col("order_key"))
      .agg(sum(col("amount")).as("amt"))
      .groupBy(col("w"), col("province"))
      .agg(count(lit(1)).as("order_count"),
        sum(col("amt")).as("order_amount"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
        date_format(col("w.end"), "yyyy-MM-dd HH:mm:ss").as("edt"),
        col("province"), col("order_count"), col("order_amount"))

  /** DAU served continuously — the streaming mirror of
    * `Ads.activeUsers` (the publisher's getDauTotal/hour split served
    * from a live table instead of a nightly batch). Exact distinct
    * visitors per day WITHOUT a per-window id-set in state: phase 1
    * groups by (day window, user) — one tiny partial per active user,
    * finalized when the watermark closes the day — and phase 2's
    * `count(*)` over those partials IS the exact distinct count
    * (the same Spark 4 chained-stateful-aggregation shape as
    * [[provinceStatsStream]]). State is O(open windows × active
    * users), watermark-bounded; nothing ever collects an id list. */
  def dauStream(df: DataFrame): DataFrame =
    df.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 day").as("w"), col("user_id"))
      .agg(count(lit(1)).as("ev_ct"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("dau"), sum(col("ev_ct")).as("ev_ct"))
      .select(date_format(col("w.start"), "yyyy-MM-dd").as("dt"),
        col("dau"), col("ev_ct"))

  /** Continuous NEW-USER counts — the streaming face of
    * `Ads.reachCurve`'s first-appearance transform: `dropDuplicates`
    * on the user key admits exactly ONE event per user ever (state is
    * the seen-user set — user-dim-bounded, the same cardinality the
    * batch min-agg shuffles), and a daily tumbling window counts the
    * admissions. Equals the batch curve whenever each user's first
    * arrival respects event time within the watermark (the dedup keeps
    * the first ARRIVED event; a later-arriving earlier event inside
    * the watermark is absorbed as a duplicate, not re-dated — spec'd).
    * The cumulative line is a serving-side running sum over the
    * emitted day rows. */
  def newUsersStream(df: DataFrame): DataFrame =
    df.filter(col("user_id").isNotNull)
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("user_id")
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(count(lit(1)).as("new_users"))
      .select(date_format(col("w.start"), "yyyy-MM-dd").as("dt"),
        col("new_users"))

  /** Continuous top-N trademark serving — the publisher's
    * `getProductStatsByTrademark` (ORDER BY order_amount LIMIT N over
    * ClickHouse) kept fresh: purchases enrich against the file-backed
    * part dim per micro-batch (stream-STATIC broadcast join, the
    * DimAsyncFunction analog — dim-less skus kept as UNKNOWN like the
    * timeout branch), then a 1-day tumbling window per brand
    * aggregates DECIMAL-exact revenue in append mode. The rank itself
    * is not streamable — windows CLOSE, then the serving layer ranks
    * each closed window (the spec does exactly that and matches the
    * batch operator's ordering). Caller supplies the `sku` column
    * (the productStatsFullStream convention). */
  def trademarkTopNStream(purchases: DataFrame, part: DataFrame): DataFrame =
    purchases.filter(col("event_type") === "purchase")
      .withWatermark("ts", "10 minutes")
      .join(broadcast(part.select(col("p_partkey"), col("p_brand"))),
        col("sku") === col("p_partkey"), "left")
      .select(col("ts"), coalesce(col("p_brand"), lit("UNKNOWN")).as("brand"),
        col("value"))
      .groupBy(window(col("ts"), "1 day").as("w"), col("brand"))
      .agg(graft.operators.Agg.moneySum(col("value")).as("order_amount"),
        count(lit(1)).as("orders"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
        col("brand"), col("order_amount"), col("orders"))

  /** Running GMV (the publisher's getGMV served continuously): global
    * per-day sums maintained across micro-batches, emitted in Update
    * mode — the Spark analog of the ClickHouse table the reference
    * upserts into. */
  def runningGmv(df: DataFrame): DataFrame =
    df.filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("dt"))
      .agg(graft.operators.Agg.moneySum(col("value")).as("gmv"),
        count(lit(1)).as("purchase_ct"))

  /** BaseDBApp delete filtering (BaseDBApp.java:57-62): stamp the CDC
    * op envelope (the Debezium/Maxwell `type` analog, derived the same
    * way as the batch Dwd.cdcOps) and drop deletes BEFORE routing, so
    * tombstones never reach a sink. Compose in front of [[cdcRoute]]. */
  def cdcEnvelope(df: DataFrame): DataFrame =
    df.withColumn("op", graft.operators.Dwd.opOf(col("event_id")))
      .filter(col("op") =!= "d")

  /** Continuous dim maintenance — the DimSinkFunction.java analog as a
    * stream: each micro-batch of CDC updates MERGEs into the running
    * snapshot via the same latest-version-wins batch operator
    * (graft.operators.DimMaintenance.upsert), so batch and streaming
    * dim semantics cannot drift. The reference upserts row-by-row into
    * Phoenix; here a whole micro-batch merges in one distributed pass
    * and `onSnapshot` receives the post-merge table (in production: a
    * write to the dim store / Delta-style table).
    *
    * `onSnapshot` must FULLY CONSUME the snapshot before returning:
    * the frame is checkpoint-backed and its blocks are released at the
    * start of the NEXT micro-batch (Ckpt discipline), so a retained
    * reference read asynchronously later fails with lost blocks. */
  def dimUpsertStream(updates: DataFrame, initial: DataFrame,
    keyCol: String, versionCol: String, tieCol: String, opCol: String)(
    onSnapshot: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    // state retains (version, tie, op) across batches: late
    // out-of-order updates can't displace newer winners, and delete
    // tombstones can't be resurrected by pre-delete stragglers
    var state = initial
      .withColumn(versionCol, lit(Long.MinValue))
      .withColumn(tieCol, lit(Long.MinValue))
      .withColumn(opCol, lit("u"))
    // only frames THIS op checkpointed are ever released — the
    // caller's `initial` plan may itself be RDD-backed and is not ours
    // to free (graft.operators.Ckpt discipline)
    var ownCkpt: DataFrame = null
    updates.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        state = graft.operators.DimMaintenance
          .mergeVersioned(state, batch, keyCol, versionCol, tieCol)
          .localCheckpoint() // pin the merged state; else the lineage
                             // re-reads every past batch on each merge
        if (ownCkpt != null) graft.operators.Ckpt.release(ownCkpt)
        ownCkpt = state
        onSnapshot(state.filter(col(opCol) =!= "d")
          .drop(versionCol, tieCol, opCol))
      }
      .start()
  }

  /** BaseDBApp dynamic routing: broadcast config decides each record's
    * sink; `foreachBatch` fans one micro-batch out to multiple sinks
    * (the Kafka/HBase split in the reference). `sinkWriter` receives
    * (sinkName, batchDf) so tests can capture per-sink output. */
  def cdcRoute(df: DataFrame, config: DataFrame)(
    sinkWriter: (String, DataFrame) => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    val routed = df.join(broadcast(config), df("event_type") === config("src_type"), "left")
      .withColumn("sink_table", coalesce(col("sink_table"), lit("dwd_default")))
      .withColumn("sink_type", coalesce(col("sink_type"), lit("kafka")))
    routed.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val cached = batch.persist()
        try {
          cached.select(col("sink_type")).distinct().collect().map(_.getString(0))
            .foreach { sink =>
              sinkWriter(sink, cached.filter(col("sink_type") === sink))
            }
        } finally { cached.unpersist(); () }
      }
      .start()
  }
}
