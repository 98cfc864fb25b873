package graft

import java.sql.Timestamp

import graft.streaming.StreamOps
import graft.streaming.StreamOps.Evt
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** SURVEY §2's streaming table claims BOUNDED STATE per mirror —
  * O(windows) bitmaps, watermark-expired pair sets, lookback-pruned
  * touch sets, key-removal on settle. These specs pin those claims
  * with the engine's OWN accounting: each scenario plants a load whose
  * per-event state would be visibly larger, then asserts
  * `StreamingQueryProgress.stateOperators.numRowsTotal` at the
  * documented bound. A regression that starts buffering per event (or
  * stops pruning) flips the number, not just the latency. */
class StreamingStateSpec extends SparkSpec {

  private def ts(minutes: Long): Timestamp =
    new Timestamp((24 * 60 + minutes) * 60 * 1000)

  /** Total state rows across every state operator, from the most
    * recent progress that actually reports state. processAllAvailable
    * can leave a trailing no-data progress without stateOperators, so
    * walk recentProgress from the end. */
  private def stateRows(q: StreamingQuery): Long =
    q.recentProgress.reverse
      .find(_.stateOperators.nonEmpty)
      .map(_.stateOperators.map(_.numRowsTotal).sum)
      .getOrElse(0L)

  test("dauStream state is (window x user) + window rows, not per event") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Evt]
    val q = StreamOps.dauStream(input.toDF()).writeStream.format("memory")
      .queryName("dau_state").outputMode("append").start()
    try {
      // 5 users x 2 days x 6 events each = 60 events, 10 (window,user)
      // pairs, 2 windows
      val evts = for {
        day <- 0 to 1; u <- 1 to 5; e <- 0 until 6
      } yield Evt((day * 100 + u * 10 + e).toLong, u.toLong, "view", 0,
        ts(day * 24 * 60 + e.toLong))
      input.addData(evts)
      q.processAllAvailable()
      val rows = stateRows(q)
      // chained agg: first-stage (window,user) rollup + second-stage
      // window rollup; both windows still open under the watermark
      assert(rows <= 10 + 2, s"dauStream state $rows exceeds (w x u) + w")
      assert(rows < evts.size, s"state $rows must not scale with events")
    } finally q.stop()
  }

  test("bitmapDistinctWindowed state is one row per open window at any audience") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    Graft.registerFunctions(spark)
    val input = MemoryStream[Evt]
    val q = StreamOps.bitmapDistinctWindowed(input.toDF())
      .writeStream.format("memory").queryName("bdw_state")
      .outputMode("append").start()
    try {
      // 200 distinct users across 2 hourly windows: exact-by-rows
      // state would be 200 rows; the bitmap holds ONE row per window
      val evts = (1 to 200).map(u =>
        Evt(u.toLong, u.toLong, "view", 0, ts(if (u % 2 == 0) 5 else 65)))
      input.addData(evts)
      q.processAllAvailable()
      val rows = stateRows(q)
      assert(rows <= 2, s"bitmap state $rows exceeds one row per window")
    } finally q.stop()
  }

  test("nearDupGate pair state is per distinct pair and expires with the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    Graft.registerFunctions(spark)
    val boiler = "the quick brown fox jumps over the lazy dog again and " +
      "again in the morning"
    val corpus = Seq(
      (100L, boiler),
      (101L, "completely different reference material about spark plans")
    ).toDF("doc_id", "text")
    val input = MemoryStream[Evt]
    val stream = input.toDF().select(
      col("event_id").as("doc_id"), col("event_type").as("text"), col("ts"))
    val q = StreamOps.nearDupGate(stream, corpus)
      .writeStream.format("memory").queryName("ndg_state")
      .outputMode("append").start()
    try {
      // ONE near-dup doc colliding with ONE corpus doc across MANY
      // minhash bands: band-level state would be rows-per-collision,
      // the dedup holds one row per (doc, ref) pair
      input.addData(Seq(Evt(1, 1, boiler + " tonight", 0, ts(5))))
      q.processAllAvailable()
      val afterFirst = stateRows(q)
      assert(afterFirst <= 1,
        s"pair state $afterFirst exceeds one row per distinct pair")
      // a much later batch advances the watermark past the pair's
      // horizon: dropDuplicatesWithinWatermark must EVICT it — state
      // stays at the new batch's pair count instead of accumulating
      input.addData(Seq(Evt(9, 9, boiler + " at dawn", 0, ts(120))))
      q.processAllAvailable()
      input.addData(Seq(Evt(10, 10, "zero shared shingles here", 0, ts(240))))
      q.processAllAvailable()
      val afterExpiry = stateRows(q)
      assert(afterExpiry <= 1,
        s"expired pairs must leave the store, got $afterExpiry rows")
    } finally q.stop()
  }

  test("attributionStream settles keys: consumed/pruned users leave the store") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Evt]
    val q = StreamOps.attributionStream(input.toDS())
      .writeStream.format("memory").queryName("attr_state")
      .outputMode("append").start()
    try {
      // user 1: 20 touches then a conversion — once the watermark
      // ripens them the pending set is consumed and the KEY is removed
      val touches = (1 to 20).map(i =>
        Evt(i.toLong, 1L, "click", 0, ts(i.toLong)))
      input.addData(touches :+ Evt(50, 1L, "purchase", 5.0, ts(30)))
      q.processAllAvailable()
      // ripen everything: a second key far in the future pushes the
      // watermark past user 1's events AND past its prune horizon
      input.addData(Seq(Evt(60, 2L, "purchase", 1.0, ts(36 * 60))))
      q.processAllAvailable()
      input.addData(Seq(Evt(61, 3L, "view", 0, ts(80 * 60))))
      q.processAllAvailable()
      val rows = stateRows(q)
      // only still-live keys may hold state; user 1 (consumed) and
      // user 2 (conversion with nothing pending) must be gone
      assert(rows <= 1, s"settled keys must be removed, got $rows rows")
      val credits = spark.table("attr_state").collect()
      assert(credits.exists(r => r.getLong(1) == 1L),
        "user 1's conversion must have been credited before removal")
    } finally q.stop()
  }
}
