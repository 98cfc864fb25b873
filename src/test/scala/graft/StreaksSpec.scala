package graft

import java.nio.file.Files

import graft.operators.EventAnalytics

/** Gaps-and-islands streak detection over planted calendars: island
  * splitting, month/year boundary contiguity, the multi-event-per-day
  * collapse, and the single-day degenerate. */
class StreaksSpec extends SparkSpec {

  private def writeEvents(rows: Seq[(Long, String, Long)]): String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-streaks").toFile.getAbsolutePath
    rows.map { case (id, day, user) =>
      (id, java.time.LocalDateTime.parse(s"${day}T12:00:00"), user, "view", 1.0, """{"k":1}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("islands split on gaps; multiple events per day collapse to one") {
    // user 1: 1,2,3 | 5 | 7,8  -> longest 3, 3 streaks, 6 active days
    // user 2: one day, three events -> longest 1, 1 streak, 1 day
    val d = writeEvents(Seq(
      (1L, "2024-03-01", 1L), (2L, "2024-03-02", 1L), (3L, "2024-03-02", 1L),
      (4L, "2024-03-03", 1L), (5L, "2024-03-05", 1L), (6L, "2024-03-07", 1L),
      (7L, "2024-03-08", 1L),
      (8L, "2024-06-10", 2L), (9L, "2024-06-10", 2L), (10L, "2024-06-10", 2L)))
    val out = EventAnalytics.streaks(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === ((3L, 3L, 6L)))
    assert(out(2L) === ((1L, 1L, 1L)))
  }

  test("streaks run through month and year boundaries") {
    // 2023-12-30 .. 2024-01-02 is ONE four-day streak (leap-adjacent
    // year roll); Feb 28 -> Mar 1 2023 (non-leap) is contiguous too
    val d = writeEvents(Seq(
      (1L, "2023-12-30", 1L), (2L, "2023-12-31", 1L),
      (3L, "2024-01-01", 1L), (4L, "2024-01-02", 1L),
      (5L, "2023-02-27", 2L), (6L, "2023-02-28", 2L), (7L, "2023-03-01", 2L)))
    val out = EventAnalytics.streaks(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === ((4L, 1L, 4L)))
    assert(out(2L) === ((3L, 1L, 3L)))
  }

  test("corpus: longest <= active_days, sums consistent, repartition-stable") {
    val a = EventAnalytics.streaks(spark, sf0001).collect().toSeq
    assert(a.nonEmpty)
    a.foreach { r =>
      assert(r.getLong(1) <= r.getLong(3))
      assert(r.getLong(2) <= r.getLong(3))
    }
    val b = EventAnalytics.streaks(spark, sf0001).collect().toSeq
    assert(a === b)
  }

  test("sequence count: bracket-matching windows equal a driver-side greedy matcher") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-seqcount").toFile.getAbsolutePath
    // planted per-user sequences (v = view, p = purchase, x = noise):
    // u1 "v p v p"  -> 2;  u2 "p v p"   -> 1 (leading p unmatched)
    // u3 "v v p"    -> 1;  u4 "p p"     -> 0;  u5 "v x v"  -> 0
    // u6 "p v v p p p" -> 2 (purchases 4,5 matched by views 2,3)
    val seqs = Map(
      1L -> "v p v p", 2L -> "p v p", 3L -> "v v p",
      4L -> "p p", 5L -> "v x v", 6L -> "p v v p p p")
    val rows = seqs.toSeq.flatMap { case (u, s) =>
      s.split(" ").zipWithIndex.map { case (c, i) =>
        val et = c match {
          case "v" => "view"; case "p" => "purchase"; case _ => "click"
        }
        (u * 100 + i, java.time.LocalDateTime.parse("2024-01-01T10:00:00")
          .plusMinutes(i.toLong), u, et, 1.0, """{"k":1}""")
      }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = EventAnalytics.sequenceCount(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent driver-side greedy matcher over the same sequences
    def greedy(s: String): Long = {
      var open = 0L; var m = 0L
      s.split(" ").foreach {
        case "v" => open += 1
        case "p" => if (open > 0) { open -= 1; m += 1 }
        case _ =>
      }
      m
    }
    val expect = seqs.values.map(greedy).groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    assert(got === expect)
    assert(got === Map(0L -> 2L, 1L -> 2L, 2L -> 2L))
  }

  test("sequence count: equal timestamps break on event_id (the ea composite order)") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-seqtie").toFile.getAbsolutePath
    val t = java.time.LocalDateTime.parse("2024-01-01T10:00:00")
    Seq(
      // user 1: view (id 1) and purchase (id 2) share ts — the view
      // sorts first by event_id, so the purchase matches -> 1
      (1L, t, 1L, "view", 0.0, """{"k":1}"""),
      (2L, t, 1L, "purchase", 1.0, """{"k":1}"""),
      // user 2: purchase (id 1) sorts BEFORE the equal-ts view (id 2)
      // -> unmatched, 0 conversions
      (1L, t, 2L, "purchase", 1.0, """{"k":1}"""),
      (2L, t, 2L, "view", 0.0, """{"k":1}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = EventAnalytics.sequenceCount(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 1L, 1L -> 1L))
  }
}
