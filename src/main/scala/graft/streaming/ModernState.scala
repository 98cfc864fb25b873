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
}
