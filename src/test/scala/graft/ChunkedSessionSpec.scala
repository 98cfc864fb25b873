package graft

import java.nio.file.Files

import graft.operators.EventAnalytics
import org.apache.spark.sql.functions._

/** Chunked sessionization must equal plain sessionization exactly —
  * including sessions that straddle chunk boundaries and skip empty
  * chunks — while windowing events by (user, chunk) instead of one
  * serial pass per user. */
class ChunkedSessionSpec extends SparkSpec {

  test("chunked == plain on the real corpus at several chunk sizes") {
    val plain = EventAnalytics.sessionize(spark, sf0001).collect().toSeq
    // hour-sized and 11-minute chunks force many boundary crossings
    Seq(3600L * 1000000L, 660L * 1000000L).foreach { chunkUs =>
      val chunked = EventAnalytics.sessionizeChunkedDf(
        Tables.events(spark, sf0001), chunkUs).collect().toSeq
      assert(chunked === plain, s"mismatch at chunkUs=$chunkUs")
    }
  }

  test("sessions stitch across boundaries and over empty chunks") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-chunks").toFile.getAbsolutePath
    val day = 86400L * 1000000000L // ns origin, off epoch-0
    def ns(sec: Long): Long = day + sec * 1000000000L
    Seq(
      // user 1: events 499s and 1050s — SAME session (gap 551 < 600)
      // but, with 500s chunks, they sit in chunk 0 and chunk 2 with
      // chunk 1 empty: the stitch must look past the empty chunk
      (1L, ns(499), 1L, "view", 1.0, """{"k": 1}"""),
      (2L, ns(1050), 1L, "view", 1.0, """{"k": 2}"""),
      // user 2: straddles a boundary within the gap (same session),
      // then a > gap jump inside one chunk (new session)
      (3L, ns(490), 2L, "view", 1.0, """{"k": 3}"""),
      (4L, ns(510), 2L, "view", 1.0, """{"k": 4}"""),
      (5L, ns(1200), 2L, "view", 1.0, """{"k": 5}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val chunkUs = 500L * 1000000L
    val out = EventAnalytics.sessionizeChunkedDf(Tables.events(spark, d), chunkUs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out === Map((1L, 1L) -> 2L, (2L, 1L) -> 2L, (2L, 2L) -> 1L))
    // and it still equals the plain formulation on the planted data
    val plain = EventAnalytics.sessionize(spark, d).collect().toSeq
    val chunked = EventAnalytics.sessionizeChunkedDf(Tables.events(spark, d), chunkUs)
      .collect().toSeq
    assert(chunked === plain)
  }

  test("event windows partition by (user, chunk), not by user alone") {
    val plan = EventAnalytics.sessionizeChunked(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(user_id") &&
      plan.contains(", chunk"), "expected (user_id, chunk) window partitioning")
  }
}
