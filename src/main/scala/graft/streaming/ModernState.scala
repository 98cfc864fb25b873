package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode}
import graft.streaming.StreamOps.{Evt, Flagged}

/** The Spark 4 `transformWithState` form of the new-user flag — the
  * modern replacement for `flatMapGroupsWithState` (typed state
  * variables, per-state TTL, RocksDB-backed). Kept alongside the
  * classic implementation so both state APIs are exercised; semantics
  * are identical and the spec cross-checks them. */
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
}
