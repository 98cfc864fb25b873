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

  test("native session_window == hand-rolled sessionize, including the exact-gap boundary") {
    val plain = EventAnalytics.sessionize(spark, sf0001).collect().toSeq
    val native = EventAnalytics.sessionizeNative(spark, sf0001).collect().toSeq
    assert(native === plain)
    // boundary: two events exactly 600 s apart stay in ONE session
    // under the batch op's strict-> rule; the +1 µs pad makes the
    // end-exclusive session_window agree
    import spark.implicits._
    val df = Seq(
      (1L, 7L, "view", 1.0, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1000))),
      (2L, 7L, "view", 1.0, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1600))),
      (3L, 7L, "view", 1.0, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(2201)))
    ).toDF("event_id", "user_id", "event_type", "value", "ts")
    val sessions = df
      .groupBy(session_window(col("ts"), "600000001 microseconds"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(2)).sorted.toSeq
    assert(sessions === Seq(1L, 2L), "events 600s apart merge; 601s apart split")
  }

  test("chunked as-of join == plain as-of at several chunk sizes (incl. corpus)") {
    import graft.operators.AsOfJoin
    val plain = AsOfJoin.purchaseAsOfView(spark, sf0001).collect().toSeq
    Seq(3600L * 1000000L, 660L * 1000000L).foreach { chunkUs =>
      val ev = Tables.events(spark, sf0001)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us"), col("event_id").as("purchase_id"),
          col("value").as("purchase_value"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts_us"), col("event_id").as("view_id"))
      val chunked = AsOfJoin.asOfChunked(purchases, views, "user_id", "ts_us",
        Seq("view_id"), chunkUs)
        .select(col("purchase_id"), col("user_id"), col("view_id"), col("purchase_value"))
        .orderBy(col("purchase_id")).collect().toSeq
      assert(chunked === plain, s"mismatch at chunkUs=$chunkUs")
    }
  }

  test("chunked jump == plain jump at several chunk sizes, incl. boundary straddles") {
    import graft.operators.Dwm
    val plain = Dwm.userJump(spark, sf0001).collect().toSeq
    // 11-minute chunks put many within-gap neighbor pairs in different
    // chunks — the bidirectional stitch must still see them
    Seq(3600L * 1000000L, 660L * 1000000L).foreach { chunkUs =>
      val chunked = Dwm.userJumpChunkedDf(Tables.events(spark, sf0001), chunkUs)
        .collect().toSeq
      assert(chunked === plain, s"mismatch at chunkUs=$chunkUs")
    }
  }

  test("chunked transitions == plain at several chunk sizes, and partition by (user, chunk)") {
    import graft.operators.EventAnalytics
    val plain = EventAnalytics.transitions(spark, sf0001).collect().toSeq
    Seq(3600L * 1000000L, 660L * 1000000L).foreach { chunkUs =>
      val chunked = EventAnalytics.transitionsChunkedDf(
        Tables.events(spark, sf0001), chunkUs).collect().toSeq
      assert(chunked === plain, s"mismatch at chunkUs=$chunkUs")
    }
    val plan = EventAnalytics.transitionsChunked(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert("hashpartitioning\\(user_id[^)]*[, ]chunk".r.findFirstIn(plan).isDefined,
      "expected (user_id, chunk) window partitioning in the chunked transitions plan")
  }

  test("chunked strict jump == plain strict jump at several chunk sizes") {
    import graft.operators.Dwm
    val plain = Dwm.userJumpStrict(spark, sf0001).collect().toSeq
    // 11-minute and 7-second chunks: the 7 s chunks put most 10 s CEP
    // windows ACROSS a boundary — the forward stitch carries them all
    Seq(660L * 1000000L, 7L * 1000000L).foreach { chunkUs =>
      val chunked = Dwm.userJumpStrictChunkedDf(Tables.events(spark, sf0001), chunkUs)
        .collect().toSeq
      assert(chunked === plain, s"mismatch at chunkUs=$chunkUs")
    }
  }

  test("chunked visitor stats == plain at several chunk sizes (corpus)") {
    import graft.operators.Dws
    val plain = Dws.visitorStats(spark, sf0001).collect().toSeq
    // 11-minute chunks put many within-gap neighbor pairs (the sv/uj
    // flags) and day-boundary prev events (the uv flag) across chunks
    Seq(3600L * 1000000L, 660L * 1000000L).foreach { chunkUs =>
      val chunked = Dws.visitorStatsChunkedDf(Tables.events(spark, sf0001), chunkUs)
        .collect().toSeq
      assert(chunked === plain, s"mismatch at chunkUs=$chunkUs")
    }
  }

  test("chunked visitor stats stitches uv/sv/uj and is_new across boundaries") {
    import spark.implicits._
    import graft.operators.Dws
    val d = Files.createTempDirectory("graft-vs-chunks").toFile.getAbsolutePath
    val day = 86400L * 1000000000L // ns origin, off epoch-0
    def ns(sec: Long): Long = day + sec * 1000000000L
    Seq(
      // user 1: 499s and 1050s — same session (gap 551 < 600) but with
      // 500s chunks they sit in chunks 0 and 2 (chunk 1 EMPTY): the
      // second event must see sv=0 through the stitch; both on the
      // user's first day so is_new=1
      (1L, ns(499), 1L, "view", 1.0, """{"k": 1}"""),
      (2L, ns(1050), 1L, "view", 1.0, """{"k": 2}"""),
      // user 1 again NEXT day: uv=1 (prev event on an older date,
      // carried across many empty chunks) but is_new=0 (not first day)
      (3L, ns(86400 + 10), 1L, "view", 1.0, """{"k": 3}"""),
      // user 2: 490s/510s straddle a boundary within the gap — the
      // FIRST event's uj must be 0 because its NEXT neighbor (across
      // the boundary) is within the gap
      (4L, ns(490), 2L, "view", 1.0, """{"k": 4}"""),
      (5L, ns(510), 2L, "view", 1.0, """{"k": 5}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val chunkUs = 500L * 1000000L
    val chunked = Dws.visitorStatsChunkedDf(Tables.events(spark, d), chunkUs).collect()
    val plain = Dws.visitorStats(spark, d).collect()
    assert(chunked.toSeq === plain.toSeq)
    // hand-check the stitched flags via the aggregates: on day 1 both
    // pairs sit within the gap (551 s and 20 s < 600 s) so NO event is
    // isolated → uj=0, and each user's first event is a uv → uv=2 on
    // is_new=1 rows. User 1's day-2 event has uv=1 (older prev date,
    // carried across empty chunks), is_new=0 (not the first day), and
    // uj=1 (gap-isolated on both sides).
    val byNew = chunked.map(r => r.getAs[Int]("is_new") ->
      (r.getAs[Long]("uv_ct"), r.getAs[Long]("uj_ct"))).groupBy(_._1)
    val newRows = byNew(1).map(_._2)
    val oldRows = byNew(0).map(_._2)
    assert(newRows.map(_._1).sum === 2L, "one first-day uv per user")
    assert(newRows.map(_._2).sum === 0L, "no day-1 event is gap-isolated")
    assert(oldRows.map(_._1).sum === 1L, "user 1's day-2 visit is uv but not new")
    assert(oldRows.map(_._2).sum === 1L, "user 1's day-2 visit bounces")
  }

  test("chunked visitor stats windows partition by (user, chunk), not by user alone") {
    val plan = graft.operators.Dws.visitorStatsChunked(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert("hashpartitioning\\(user_id[^)]*[, ]chunk".r.findFirstIn(plan).isDefined,
      "expected (user_id, chunk) window partitioning in the chunked visitor stats plan")
  }

  test("path analysis truncates sessions to 8 events and counts identical journeys") {
    import spark.implicits._
    import graft.operators.EventAnalytics
    val d = Files.createTempDirectory("graft-paths").toFile.getAbsolutePath
    val day = 86400L * 1000000000L
    def ns(sec: Long): Long = day + sec * 1000000000L
    val rows =
      // user 1: ONE session of 10 events (1s apart) — path must stop at 8
      (0 until 10).map(i => ((i + 1).toLong, ns(i), 1L, s"t$i", 1.0, "{}")) ++
      // users 2 and 3: identical two-event sessions -> same path, count 2
      Seq((20L, ns(0), 2L, "view", 1.0, "{}"), (21L, ns(5), 2L, "click", 1.0, "{}"),
        (22L, ns(0), 3L, "view", 1.0, "{}"), (23L, ns(5), 3L, "click", 1.0, "{}"),
        // user 2's SECOND session after a >600s gap: single purchase
        (24L, ns(5 + 601), 2L, "purchase", 1.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = EventAnalytics.pathAnalysis(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map(
      (0 until 8).map(i => s"t$i").mkString(">") -> 1L,
      "view>click" -> 2L,
      "purchase" -> 1L))
  }

  test("chunked strict jump stitches every boundary-straddle case") {
    import spark.implicits._
    import graft.operators.Dwm
    val d = Files.createTempDirectory("graft-strict-chunks").toFile.getAbsolutePath
    val day = 86400L * 1000000000L // ns origin, off epoch-0
    def ns(sec: Long): Long = day + sec * 1000000000L
    Seq(
      // user 1: signup at 95s (chunk 0), view at 102s (chunk 1, 7s gap)
      // — a followed visit across the boundary: NOT a jump
      (1L, ns(95), 1L, "signup", 1.0, """{"k": 1}"""),
      (2L, ns(102), 1L, "view", 1.0, """{"k": 2}"""),
      // user 2: signup at 195s (chunk 1), signup at 203s (chunk 2,
      // 8s gap) — consecutive entries across the boundary: the FIRST
      // is a jump; the second times out (nothing after): also a jump
      (3L, ns(195), 2L, "signup", 1.0, """{"k": 3}"""),
      (4L, ns(203), 2L, "signup", 1.0, """{"k": 4}"""),
      // user 3: signup at 295s (chunk 2), next event at 420s (chunk 4,
      // chunk 3 EMPTY, gap 125s > 10s) — timeout jump over an empty chunk
      (5L, ns(295), 3L, "signup", 1.0, """{"k": 5}"""),
      (6L, ns(420), 3L, "view", 1.0, """{"k": 6}"""),
      // user 4: signup exactly AT a boundary (ts=400s = chunk 4 start)
      // followed within-chunk at 405s by a view: NOT a jump
      (7L, ns(400), 4L, "signup", 1.0, """{"k": 7}"""),
      (8L, ns(405), 4L, "view", 1.0, """{"k": 8}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val chunkUs = 100L * 1000000L
    val got = Dwm.userJumpStrictChunkedDf(Tables.events(spark, d), chunkUs)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(got === Set(3L, 4L, 5L))
    // and identical to the plain formulation on the planted data
    val plain = Dwm.userJumpStrict(spark, d).collect().toSeq
    val chunked = Dwm.userJumpStrictChunkedDf(Tables.events(spark, d), chunkUs)
      .collect().toSeq
    assert(chunked === plain)
  }

  test("chunked strict jump windows partition by (user, chunk), not by user alone") {
    val plan = graft.operators.Dwm.userJumpStrictChunked(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert("hashpartitioning\\(user_id[^)]*[, ]chunk".r.findFirstIn(plan).isDefined,
      "expected (user_id, chunk) window partitioning in the chunked strict jump plan")
  }

  test("chunked jump windows partition by (user, chunk), not by user alone") {
    val plan = graft.operators.Dwm.userJumpChunked(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert("hashpartitioning\\(user_id[^)]*[, ]chunk".r.findFirstIn(plan).isDefined,
      "expected (user_id, chunk) window partitioning in the chunked jump plan")
  }

  test("chunked as-of carries payloads across empty and right-free chunks") {
    import spark.implicits._
    import graft.operators.AsOfJoin
    // chunk size 100: right at t=50 (chunk 0); lefts at t=150 (chunk 1,
    // right-free), t=460 (chunk 4, after empty chunks 2-3); a same-ts
    // pair at t=500 (ties match); a left BEFORE any right at t=10
    val left = Seq((1L, 10L, 100L), (1L, 150L, 101L), (1L, 460L, 102L),
      (1L, 500L, 103L), (2L, 300L, 200L))
      .toDF("k", "t", "left_id")
    val right = Seq((1L, 50L, 900L), (1L, 500L, 901L), (2L, 299L, 902L))
      .toDF("k", "t", "rv")
    val out = AsOfJoin.asOfChunked(left, right, "k", "t", Seq("rv"), 100L)
      .select("left_id", "rv").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out === Map(100L -> -1L, 101L -> 900L, 102L -> 900L,
      103L -> 901L, 200L -> 902L))
    // and equals the plain path on the same input
    val plain = AsOfJoin.asOf(left, right, "k", "t", Seq("rv"))
      .select("left_id", "rv").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out === plain)
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

  test("as-of local windows partition by (key, chunk), not by key alone") {
    val plan = graft.operators.AsOfJoin.purchaseAsOfViewChunked(spark, sf0001)
      .queryExecution.executedPlan.toString
    // both columns must sit inside the SAME hashpartitioning clause:
    // separate contains() would also pass via the groupBy's exchange
    assert("hashpartitioning\\(user_id[^)]*_chunk".r.findFirstIn(plan).isDefined,
      "expected (user_id, _chunk) window partitioning in the chunked as-of plan")
  }

  test("event windows partition by (user, chunk), not by user alone") {
    val plan = EventAnalytics.sessionizeChunked(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert("hashpartitioning\\(user_id[^)]*[, ]chunk".r.findFirstIn(plan).isDefined,
      "expected (user_id, chunk) window partitioning")
  }

  test("nearest view: direction pick, exact tie to prev, equal-ts view wins at zero") {
    import spark.implicits._
    import graft.operators.AsOfJoin
    val d = Files.createTempDirectory("graft-nearest").toFile.getAbsolutePath
    val day = 86400L * 1000000000L
    def ns(sec: Long): Long = day + sec * 1000000000L
    Seq(
      // user 1: views at 0 and 100; purchase at 30 → prev (Δ30) beats next (Δ70)
      (1L, ns(0), 1L, "view", 1.0, "{}"),
      (2L, ns(100), 1L, "view", 1.0, "{}"),
      (3L, ns(30), 1L, "purchase", 9.0, "{}"),
      // user 2: views at 0 and 200; purchase at 100 → exact tie → prev
      (4L, ns(0), 2L, "view", 1.0, "{}"),
      (5L, ns(200), 2L, "view", 1.0, "{}"),
      (6L, ns(100), 2L, "purchase", 9.0, "{}"),
      // user 3: only a LATER view → next
      (7L, ns(500), 3L, "view", 1.0, "{}"),
      (8L, ns(400), 3L, "purchase", 9.0, "{}"),
      // user 4: view exactly AT the purchase ts → Δ=0, prev
      (9L, ns(700), 4L, "view", 1.0, "{}"),
      (10L, ns(700), 4L, "purchase", 9.0, "{}"),
      // user 5: no views at all → null columns
      (11L, ns(900), 5L, "purchase", 9.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = AsOfJoin.purchaseNearestView(spark, d).collect()
      .map(r => r.getLong(0) -> ((
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) "none" else r.getString(4)))).toMap
    assert(got === Map(
      3L -> ((1L, 30000000L, "prev")),
      6L -> ((4L, 100000000L, "prev")),
      8L -> ((7L, 100000000L, "next")),
      10L -> ((9L, 0L, "prev")),
      11L -> ((-1L, -1L, "none"))))
  }

  test("tolerance as-of: fresh matches keep ids+age, stale and absent matches null out") {
    import spark.implicits._
    import graft.operators.AsOfJoin
    val d = Files.createTempDirectory("graft-asof-tol").toFile.getAbsolutePath
    val day = 86400L * 1000000000L
    def ns(sec: Long): Long = day + sec * 1000000000L
    Seq(
      // user 1: view 100 s before the purchase → fresh (≤ 1800 s)
      (1L, ns(0), 1L, "view", 1.0, "{}"),
      (2L, ns(100), 1L, "purchase", 9.0, "{}"),
      // user 2: view 1801 s before → STALE, nulls (the latest prior
      // view is the match candidate, then the bound rejects it)
      (3L, ns(0), 2L, "view", 1.0, "{}"),
      (4L, ns(1801), 2L, "purchase", 9.0, "{}"),
      // user 3: stale old view AND a fresh later one: the fresh one is
      // the latest prior → match, age from IT
      (5L, ns(0), 3L, "view", 1.0, "{}"),
      (6L, ns(3000), 3L, "view", 1.0, "{}"),
      (7L, ns(3100), 3L, "purchase", 9.0, "{}"),
      // user 4: view exactly AT the tolerance bound (1800 s) → fresh
      (8L, ns(0), 4L, "view", 1.0, "{}"),
      (9L, ns(1800), 4L, "purchase", 9.0, "{}"),
      // user 5: no views at all → nulls
      (10L, ns(500), 5L, "purchase", 9.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = AsOfJoin.purchaseAsOfViewTol(spark, d).collect()
      .map(r => r.getLong(0) -> ((
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    assert(got === Map(
      2L -> ((1L, 100000000L)),
      4L -> ((-1L, -1L)),
      7L -> ((6L, 100000000L)),
      9L -> ((8L, 1800000000L)),
      10L -> ((-1L, -1L))))
  }

  test("chunked tolerance as-of == plain on the corpus and the planted tolerance cases") {
    import graft.operators.AsOfJoin
    val plain = AsOfJoin.purchaseAsOfViewTol(spark, sf0001).collect().toSeq
    val chunked = AsOfJoin.purchaseAsOfViewTolChunked(spark, sf0001).collect().toSeq
    assert(chunked === plain)
  }

  test("chunked nearest view == plain at several chunk sizes (corpus)") {
    import graft.operators.AsOfJoin
    val plain = AsOfJoin.purchaseNearestView(spark, sf0001).collect().toSeq
    // 11-minute chunks put many nearest pairs across chunk boundaries
    Seq(3600L * 1000000L, 660L * 1000000L).foreach { chunkUs =>
      val chunked = AsOfJoin.purchaseNearestViewChunkedDf(
        Tables.events(spark, sf0001), chunkUs).collect().toSeq
      assert(chunked === plain, s"mismatch at chunkUs=$chunkUs")
    }
  }

  test("chunked nearest view stitches boundary straddles, equal-Δ at a chunk edge, empty chunks") {
    import spark.implicits._
    import graft.operators.AsOfJoin
    val d = Files.createTempDirectory("graft-nearest-chunks").toFile.getAbsolutePath
    val day = 86400L * 1000000000L
    def ns(sec: Long): Long = day + sec * 1000000000L
    Seq(
      // user 1: purchase at 150 (chunk 1, view-free); prev view at 90
      // (chunk 0), next view at 210 (chunk 2) → EQUAL Δ=60 across two
      // boundaries: ties must resolve to prev, exactly as plain
      (1L, ns(90), 1L, "view", 1.0, "{}"),
      (2L, ns(210), 1L, "view", 1.0, "{}"),
      (3L, ns(150), 1L, "purchase", 9.0, "{}"),
      // user 2: purchase at 450 (chunk 4); nearest view at 120 (chunk 1)
      // — the prev carry must cross chunks 2-3, which are EMPTY
      (4L, ns(120), 2L, "view", 1.0, "{}"),
      (5L, ns(450), 2L, "purchase", 9.0, "{}"),
      // user 3: TWO equal-ts views at 700 (chunk 7); purchase at 810
      // (chunk 8) → prev across the boundary picks the LARGEST vid
      (6L, ns(700), 3L, "view", 1.0, "{}"),
      (7L, ns(700), 3L, "view", 1.0, "{}"),
      (8L, ns(810), 3L, "purchase", 9.0, "{}"),
      // user 4: purchase at 890 (chunk 8); TWO equal-ts views at 950
      // (chunk 9) → next across the boundary picks the SMALLEST vid
      (9L, ns(890), 4L, "purchase", 9.0, "{}"),
      (10L, ns(950), 4L, "view", 1.0, "{}"),
      (11L, ns(950), 4L, "view", 1.0, "{}"),
      // user 5: view exactly AT a chunk boundary (1000 = chunk 10
      // start), purchase in the PREVIOUS chunk at 990 → next, Δ=10
      (12L, ns(990), 5L, "purchase", 9.0, "{}"),
      (13L, ns(1000), 5L, "view", 1.0, "{}"),
      // user 6: no views → null columns survive the stitch
      (14L, ns(1100), 6L, "purchase", 9.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val chunkUs = 100L * 1000000L
    val chunked = AsOfJoin.purchaseNearestViewChunkedDf(
      Tables.events(spark, d), chunkUs).collect()
    val got = chunked.map(r => r.getLong(0) -> ((
      if (r.isNullAt(2)) -1L else r.getLong(2),
      if (r.isNullAt(3)) -1L else r.getLong(3),
      if (r.isNullAt(4)) "none" else r.getString(4)))).toMap
    assert(got === Map(
      3L -> ((1L, 60000000L, "prev")),
      5L -> ((4L, 330000000L, "prev")),
      8L -> ((7L, 110000000L, "prev")),
      9L -> ((10L, 60000000L, "next")),
      12L -> ((13L, 10000000L, "next")),
      14L -> ((-1L, -1L, "none"))))
    // and identical to the plain formulation on the planted data
    val plain = AsOfJoin.purchaseNearestView(spark, d).collect().toSeq
    assert(chunked.toSeq === plain)
  }

  test("chunked nearest windows partition by (user, _chunk), not by user alone") {
    val plan = graft.operators.AsOfJoin.purchaseNearestViewChunked(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert("hashpartitioning\\(user_id[^)]*_chunk".r.findFirstIn(plan).isDefined,
      "expected (user_id, _chunk) window partitioning in the chunked nearest plan")
  }

  test("chunked attribution == plain at several chunk sizes (corpus)") {
    import graft.operators.EventAnalytics
    val plain = EventAnalytics.attribution(spark, sf0001).collect().toSeq
    // 11-minute chunks put many touch→conversion carries across chunks
    Seq(3600L * 1000000L, 660L * 1000000L).foreach { chunkUs =>
      val chunked = EventAnalytics.attributionChunkedDf(
        Tables.events(spark, sf0001), chunkUs).collect().toSeq
      assert(chunked === plain, s"mismatch at chunkUs=$chunkUs")
    }
    val plan = EventAnalytics.attributionChunked(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert("hashpartitioning\\(user_id[^)]*_chunk".r.findFirstIn(plan).isDefined,
      "expected (user_id, _chunk) window partitioning in the chunked attribution plan")
  }

  test("chunked attribution stitches conversions across empty chunks and cuts lookback at edges") {
    import spark.implicits._
    import graft.operators.EventAnalytics
    val d = Files.createTempDirectory("graft-attr-chunks").toFile.getAbsolutePath
    val day = 86400L * 1000000000L
    def ns(sec: Long): Long = day + sec * 1000000000L
    Seq(
      // user 1: touch in chunk 0 (view@50); conversion in chunk 4
      // (purchase@450) — the next-conversion carry must cross chunks
      // 1-3, which are EMPTY
      (1L, ns(50), 1L, "view", 1.0, "{}"),
      (2L, ns(450), 1L, "purchase", 40.0, "{}"),
      // user 2: touch@95 (chunk 0), conversion@105 (chunk 1) — a
      // boundary straddle; then touch@190 (chunk 1) with its NEXT
      // conversion@310 (chunk 3): first=last per conversion
      (3L, ns(95), 2L, "click", 1.0, "{}"),
      (4L, ns(105), 2L, "purchase", 10.0, "{}"),
      (5L, ns(190), 2L, "click", 1.0, "{}"),
      (6L, ns(310), 2L, "purchase", 20.0, "{}"),
      // user 3: touch whose next conversion is OUTSIDE the 1-day
      // lookback (and in a far later chunk) — no credit
      (7L, ns(600), 3L, "signup", 1.0, "{}"),
      (8L, ns(600 + 86400 + 100), 3L, "purchase", 30.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val chunkUs = 100L * 1000000L
    val chunked = EventAnalytics.attributionChunkedDf(Tables.events(spark, d), chunkUs)
      .collect()
    val got = chunked.map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got === Map(
      "view" -> ((1L, 1L, 40.0, 40.0)),
      "click" -> ((2L, 2L, 30.0, 30.0))))
    val plain = EventAnalytics.attribution(spark, d).collect().toSeq
    assert(chunked.toSeq === plain)
  }

  test("attribution: first/last-touch credit, lookback cut, unattributed conversions dropped") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-attr").toFile.getAbsolutePath
    val day = 86400L * 1000000000L
    def ns(sec: Long): Long = day + sec * 1000000000L
    Seq(
      // user 1: view → click → purchase(100): first=view, last=click
      (1L, ns(0), 1L, "view", 1.0, "{}"),
      (2L, ns(600), 1L, "click", 1.0, "{}"),
      (3L, ns(1200), 1L, "purchase", 100.0, "{}"),
      // signup 30 min after conv1; next purchase 25 h later → outside
      // the 1-day lookback, conversion 5 goes unattributed
      (4L, ns(1800), 1L, "signup", 1.0, "{}"),
      (5L, ns(1800 + 88200 + 3600), 1L, "purchase", 50.0, "{}"),
      // user 2: click → purchase(10): first=last=click
      (6L, ns(0), 2L, "click", 1.0, "{}"),
      (7L, ns(600), 2L, "purchase", 10.0, "{}"),
      // error events never credit
      (8L, ns(300), 2L, "error", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = EventAnalytics.attribution(spark, d).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got === Map(
      "click" -> ((1L, 2L, 10.0, 110.0)),
      "view" -> ((1L, 0L, 100.0, 0.0))))
  }

  test("out-of-order: planted disorder scores, chunked == plain at several chunk sizes") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-ooo")
      .toFile.getAbsolutePath
    // user 1 arrival order (event_id) vs event time (seconds):
    //   e1@t100, e2@t50 (50s late), e3@t200, e4@t199 (1s late), e5@t300
    // user 2: perfectly ordered
    Seq(
      (1L, 100L, 1L), (2L, 50L, 1L), (3L, 200L, 1L), (4L, 199L, 1L), (5L, 300L, 1L),
      (6L, 10L, 2L), (7L, 20L, 2L))
      .map { case (id, sec, u) =>
        (id, java.time.LocalDateTime.ofEpochSecond(sec, 0, java.time.ZoneOffset.UTC),
          u, "view", 1.0, """{"k":1}""")
      }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val out = EventAnalytics.outOfOrder(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L) === ((5L, 2L, 50000000L, 51000000L)))
    assert(out(2L) === ((2L, 0L, 0L, 0L)))
    // chunked forms: boundary-straddling chunk sizes must all agree
    for (cs <- Seq(1L, 2L, 3L, 4096L)) {
      val ch = EventAnalytics.outOfOrderChunked(spark, d, cs).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      assert(ch === out, s"chunkSize=$cs")
    }
    // corpus equality + the hot-key plan shape
    val plain = EventAnalytics.outOfOrder(spark, sf0001).collect().toSeq
    val chunked = EventAnalytics.outOfOrderChunked(spark, sf0001).collect().toSeq
    assert(chunked === plain)
    val plan = EventAnalytics.outOfOrderChunked(spark, sf0001)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("_chunk"),
      "expected (user_id, _chunk) window partitioning in the chunked plan")
  }
}
