package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode}
import graft.streaming.StreamOps.{Evt, Flagged, Jump, JumpState, Visit}

/** The Spark 4 `transformWithState` forms of the keyed-state
  * operators — the modern replacement for `flatMapGroupsWithState`
  * (typed state variables, per-state TTL, real timers, RocksDB-
  * backed). Each is kept alongside its classic implementation so both
  * state APIs are exercised; semantics are identical and the specs
  * cross-check them scenario-for-scenario. */
object ModernState {

  private class NewUserProcessor extends StatefulProcessor[Long, Evt, Flagged] {
    @transient private var seen: org.apache.spark.sql.streaming.ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Boolean]("seen", Encoders.scalaBoolean,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Evt],
      timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[Flagged] = {
      var s = if (seen.exists()) seen.get() else false
      val out = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).map { e =>
        val f = Flagged(e.event_id, e.user_id, if (s) 0 else 1)
        s = true
        f
      }
      seen.update(s)
      out.iterator
    }
  }

  /** Requires the RocksDB state store provider (see spec). */
  def newUserFlag(ds: Dataset[Evt]): Dataset[Flagged] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .transformWithState(new NewUserProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** UniqueVisit's modern twin: the bounded seen-days set becomes a
    * typed ListState. Same emission + 1-day-horizon TTL semantics as
    * StreamOps.uniqueVisit (see that scaladoc for the horizon
    * argument); the list is rewritten with only in-horizon days, so
    * state stays ≤ horizon+1 entries per key. */
  private class UniqueVisitProcessor extends StatefulProcessor[Long, Evt, Visit] {
    @transient private var days: org.apache.spark.sql.streaming.ListState[String] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      days = getHandle.getListState[String]("days", Encoders.STRING,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(uid: Long, rows: Iterator[Evt],
      timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[Visit] = {
      var seen = days.get().toSet
      val out = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).flatMap { e =>
        val day = e.ts.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
        if (seen(day)) None
        else { seen += day; Some(Visit(uid, day, e.event_id)) }
      }
      val newest = java.time.LocalDate.parse(seen.max)
      days.put(seen.filter(d =>
        java.time.temporal.ChronoUnit.DAYS.between(
          java.time.LocalDate.parse(d), newest) <= 1L).toArray)
      out.iterator
    }
  }

  def uniqueVisit(ds: Dataset[Evt]): Dataset[Visit] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .transformWithState(new UniqueVisitProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  private val GapMs = graft.operators.Sessions.GapMs

  /** JumpDetect's modern twin: the pending candidate is a typed
    * ValueState and the classic GroupStateTimeout becomes a REAL
    * event-time timer (registerTimer/handleExpiredTimer) — one live
    * timer per key, replaced whenever the candidate changes. Emission
    * logic matches StreamOps.jumpDetect case-for-case. */
  private class JumpProcessor extends StatefulProcessor[Long, Evt, Jump] {
    @transient private var pending: org.apache.spark.sql.streaming.ValueState[JumpState] = _

    private def timerFor(p: JumpState): Long = p.tsMs + GapMs + 1

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      pending = getHandle.getValueState[JumpState]("pending",
        Encoders.product[JumpState], org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(uid: Long, rows: Iterator[Evt],
      timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[Jump] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      var p = if (pending.exists()) Option(pending.get()) else None
      val prevTimer = p.map(timerFor)
      val out = Seq.newBuilder[Jump]
      sorted.foreach { e =>
        val t = e.ts.getTime
        p match {
          case Some(JumpState(pid, pts, isolated)) =>
            if (t - pts > GapMs) {
              if (isolated) out += Jump(pid, uid, pts)
              p = Some(JumpState(e.event_id, t, isolated = true))
            } else {
              p = Some(JumpState(e.event_id, t, isolated = false))
            }
          case None =>
            p = Some(JumpState(e.event_id, t, isolated = true))
        }
      }
      p.foreach { st =>
        pending.update(st)
        val newTimer = timerFor(st)
        if (!prevTimer.contains(newTimer)) {
          prevTimer.foreach(getHandle.deleteTimer)
          getHandle.registerTimer(newTimer)
        }
      }
      out.result().iterator
    }

    override def handleExpiredTimer(uid: Long,
      timerValues: org.apache.spark.sql.streaming.TimerValues,
      expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[Jump] = {
      // stream went quiet past the watermark: the pending candidate is
      // a jump iff still isolated (a stale timer finds no pending)
      val out = (if (pending.exists()) Option(pending.get()) else None).collect {
        case p @ JumpState(id, ts, true)
          if timerFor(p) == expiredTimerInfo.getExpiryTimeInMs => Jump(id, uid, ts)
      }
      if (out.nonEmpty) pending.clear()
      out.iterator
    }
  }

  def jumpDetect(ds: Dataset[Evt]): Dataset[Jump] = {
    import ds.sparkSession.implicits._
    ds.withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .transformWithState(new JumpProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** The strict CEP bounce pattern (`.times(2).consecutive()
    * .within(10 s)` + timeout) on the modern API — the last classic
    * stateful operator to get its `transformWithState` twin. The
    * event buffer becomes a typed ListState, the candidate a
    * ValueState, and the classic `setTimeoutTimestamp` a REAL
    * event-time timer (deduped through a ValueState so exactly one is
    * live per key). `advance` is the same watermark-driven pure body
    * as StreamOps.jumpDetectStrict: input rows and expired timers
    * both just re-run it, so stale timers are harmless no-ops and
    * out-of-order safety carries over unchanged. */
  private class StrictCepProcessor extends StatefulProcessor[Long, Evt, Jump] {
    import StreamOps.{CepEvt, CepPending}
    private val WinUs = 10L * 1000000L
    @transient private var pendingSt: org.apache.spark.sql.streaming.ValueState[CepPending] = _
    @transient private var bufSt: org.apache.spark.sql.streaming.ListState[CepEvt] = _
    @transient private var timerSt: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      pendingSt = getHandle.getValueState[CepPending]("pending",
        Encoders.product[CepPending], org.apache.spark.sql.streaming.TTLConfig.NONE)
      bufSt = getHandle.getListState[CepEvt]("buf",
        Encoders.product[CepEvt], org.apache.spark.sql.streaming.TTLConfig.NONE)
      timerSt = getHandle.getValueState[Long]("timer",
        Encoders.scalaLong, org.apache.spark.sql.streaming.TTLConfig.NONE)
    }

    private def advance(uid: Long, incoming: Seq[CepEvt], wmUs: Long): Iterator[Jump] = {
      val all = (bufSt.get().toSeq ++ incoming).sortBy(b => (b.tsUs, b.eventId))
      var pending = if (pendingSt.exists()) Option(pendingSt.get()) else None
      val (ripe, unripe) = all.partition(_.tsUs < wmUs)
      val out = Seq.newBuilder[Jump]
      ripe.foreach { e =>
        pending.foreach { p =>
          if (e.tsUs - p.tsUs > WinUs) out += Jump(p.eventId, uid, p.tsUs / 1000)
          else if (e.isEntry) out += Jump(p.eventId, uid, p.tsUs / 1000)
          // else: non-entry within 10 s → real visit, candidate dies
        }
        pending = if (e.isEntry) Some(CepPending(e.eventId, e.tsUs)) else None
      }
      pending.filter(p => wmUs > p.tsUs + WinUs).foreach { p =>
        out += Jump(p.eventId, uid, p.tsUs / 1000)
        pending = None
      }
      val prevTimer = if (timerSt.exists()) Option(timerSt.get()) else None
      if (pending.isEmpty && unripe.isEmpty) {
        pendingSt.clear(); bufSt.clear(); timerSt.clear()
        prevTimer.foreach(getHandle.deleteTimer)
      } else {
        pending match {
          case Some(p) => pendingSt.update(p)
          case None => pendingSt.clear()
        }
        bufSt.clear()
        if (unripe.nonEmpty) bufSt.appendList(unripe.toArray)
        val nextMs = (pending.map(_.tsUs + WinUs) ++ unripe.headOption.map(_.tsUs))
          .min / 1000 + 1
        if (!prevTimer.contains(nextMs)) {
          prevTimer.foreach(getHandle.deleteTimer)
          getHandle.registerTimer(nextMs)
          timerSt.update(nextMs)
        }
      }
      out.result().iterator
    }

    override def handleInputRows(uid: Long, rows: Iterator[Evt],
      timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[Jump] = {
      def usOf(t: java.sql.Timestamp): Long =
        Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
      val incoming = rows
        .map(e => CepEvt(e.event_id, usOf(e.ts), e.event_type == "signup")).toSeq
      advance(uid, incoming, timerValues.getCurrentWatermarkInMs() * 1000L)
    }

    override def handleExpiredTimer(uid: Long,
      timerValues: org.apache.spark.sql.streaming.TimerValues,
      expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[Jump] =
      advance(uid, Nil, timerValues.getCurrentWatermarkInMs() * 1000L)
  }

  def jumpDetectStrict(ds: Dataset[Evt]): Dataset[Jump] = {
    import ds.sparkSession.implicits._
    ds.withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .transformWithState(new StrictCepProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Multi-touch attribution on the modern API — the
    * `StreamOps.attributionStream` semantics with typed state: the
    * pending touch set and the unripe buffer become ListStates, the
    * classic GroupStateTimeout a REAL event-time timer (deduped
    * through a ValueState — one live per key). The watermark-driven
    * pure body is shared shape-for-shape: input rows and expired
    * timers both just re-run `advance`, so stale timers are harmless
    * no-ops; verdicts match the classic op (and therefore the batch
    * operator) scenario-for-scenario by spec. */
  private class AttributionProcessor(windowUs: Long)
    extends StatefulProcessor[Long, StreamOps.Evt, StreamOps.ConvCredit] {
    import StreamOps.{ConvCredit, TouchEvt}
    @transient private var pendingSt: org.apache.spark.sql.streaming.ListState[TouchEvt] = _
    @transient private var bufSt: org.apache.spark.sql.streaming.ListState[TouchEvt] = _
    @transient private var timerSt: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      pendingSt = getHandle.getListState[TouchEvt]("pending",
        Encoders.product[TouchEvt], org.apache.spark.sql.streaming.TTLConfig.NONE)
      bufSt = getHandle.getListState[TouchEvt]("buf",
        Encoders.product[TouchEvt], org.apache.spark.sql.streaming.TTLConfig.NONE)
      timerSt = getHandle.getValueState[Long]("timer",
        Encoders.scalaLong, org.apache.spark.sql.streaming.TTLConfig.NONE)
    }

    private def advance(uid: Long, incoming: Seq[TouchEvt],
        wmUs: Long): Iterator[ConvCredit] = {
      val all = (bufSt.get().toSeq ++ incoming).sortBy(e => (e.tsUs, e.eventId))
      val (ripe, unripe) = all.partition(_.tsUs < wmUs)
      var pending = pendingSt.get().toSeq
      val out = Seq.newBuilder[ConvCredit]
      ripe.foreach { e =>
        if (e.isConv) {
          val credited = pending.filter(t => e.tsUs - t.tsUs <= windowUs)
          if (credited.nonEmpty) {
            val first = credited.minBy(t => (t.tsUs, t.eventId))
            val last = credited.maxBy(t => (t.tsUs, t.eventId))
            out += ConvCredit(e.eventId, uid, first.tpe, last.tpe, e.value)
          }
          pending = Nil
        } else {
          pending = pending :+ e
        }
      }
      pending = pending.filter(t => t.tsUs + windowUs >= wmUs)
      val prevTimer = if (timerSt.exists()) Option(timerSt.get()) else None
      if (pending.isEmpty && unripe.isEmpty) {
        pendingSt.clear(); bufSt.clear(); timerSt.clear()
        prevTimer.foreach(getHandle.deleteTimer)
      } else {
        pendingSt.clear()
        if (pending.nonEmpty) pendingSt.appendList(pending.toArray)
        bufSt.clear()
        if (unripe.nonEmpty) bufSt.appendList(unripe.toArray)
        val wake = unripe.headOption.map(_.tsUs)
          .getOrElse(pending.map(_.tsUs + windowUs).max)
        val nextMs = wake / 1000L + 1
        if (!prevTimer.contains(nextMs)) {
          prevTimer.foreach(getHandle.deleteTimer)
          getHandle.registerTimer(nextMs)
          timerSt.update(nextMs)
        }
      }
      out.result().iterator
    }

    override def handleInputRows(uid: Long, rows: Iterator[StreamOps.Evt],
      timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[ConvCredit] = {
      def usOf(t: java.sql.Timestamp): Long =
        Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
      val incoming = rows.map(e =>
        TouchEvt(e.event_id, usOf(e.ts), e.event_type,
          e.event_type == "purchase", e.value)).toSeq
      advance(uid, incoming, timerValues.getCurrentWatermarkInMs() * 1000L)
    }

    override def handleExpiredTimer(uid: Long,
      timerValues: org.apache.spark.sql.streaming.TimerValues,
      expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[ConvCredit] =
      advance(uid, Nil, timerValues.getCurrentWatermarkInMs() * 1000L)
  }

  def attribution(ds: Dataset[Evt],
      windowUs: Long = 86400000000L): Dataset[StreamOps.ConvCredit] = {
    import ds.sparkSession.implicits._
    val touchTypes = graft.operators.EventAnalytics.TouchTypes.toSet
    ds.filter(e => touchTypes(e.event_type) || e.event_type == "purchase")
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .transformWithState(new AttributionProcessor(windowUs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
