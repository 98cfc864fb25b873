package graft

import java.nio.file.Files

import graft.operators.{DimMaintenance, Dwd, Dwm, Dws}
import org.apache.spark.sql.functions._

/** Round-2 warehouse operators: CDC op-type routing, dim upsert,
  * strict-CEP jump, full multi-stream product stats. Planted-data
  * cases pin the semantics the sf oracles can't distinguish. */
class WarehouseOpsSpec extends SparkSpec {

  /** Planted events: five users covering every strict-vs-approx jump
    * disagreement. `ts` is written as raw nanos (the events.parquet
    * physical type Tables.events expects). */
  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-wops").toFile.getAbsolutePath
    val day = 86400L * 1000000000L
    def ns(sec: Long): Long = day + sec * 1000000000L
    Seq(
      // user 1: entry then a page 300 s later — strict jump, approx no
      (1L, ns(0), 1L, "signup", 1.0, """{"k": 1}"""),
      (2L, ns(300), 1L, "view", 1.0, """{"k": 2}"""),
      // user 2: two consecutive entries 5 s apart — both strict jumps
      // (first by the .times(2) match, second by timeout), approx none
      (3L, ns(0), 2L, "signup", 1.0, """{"k": 3}"""),
      (4L, ns(5), 2L, "signup", 1.0, """{"k": 4}"""),
      // user 3: entry then a page 5 s later — a real visit for both
      (5L, ns(0), 3L, "signup", 1.0, """{"k": 5}"""),
      (6L, ns(5), 3L, "view", 1.0, """{"k": 6}"""),
      // user 4: one isolated page view — approx jump, strict no (not an entry)
      (7L, ns(0), 4L, "view", 1.0, """{"k": 7}"""),
      // user 5: one isolated entry — jump under both predicates
      (8L, ns(0), 5L, "signup", 1.0, """{"k": 8}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("strict CEP jump matches the reference predicate and differs from the approximation") {
    val strict = Dwm.userJumpStrict(spark, dir).collect().map(_.getLong(0)).toSet
    val approx = Dwm.userJump(spark, dir).collect().map(_.getLong(0)).toSet
    assert(strict === Set(1L, 3L, 4L, 8L))
    assert(approx === Set(7L, 8L))
    // the disagreement is real in both directions
    assert((strict -- approx).nonEmpty && (approx -- strict).nonEmpty)
  }

  test("cdc ops: deletes never reach a sink, payloads are pruned per sink config") {
    val rows = Dwd.cdcOps(spark, sf001).collect()
    val total = graft.Tables.events(spark, sf001).count()
    // op envelope: event_id % 5 == 0 → delete, filtered before routing
    assert(rows.map(_.getString(2)).toSet === Set("c", "u"))
    assert(!rows.exists(_.getLong(0) % 5 == 0))
    assert(rows.length.toLong === total - (total / 5 + (if (total % 5 > 0) 1 else 0)))
    // per-sink pruning: dim_error keeps only event_id; dwd_order_info
    // keeps the full 4-field payload; dwd_start_log drops money fields
    val bySink = rows.groupBy(_.getString(3))
    bySink("dim_error").foreach { r =>
      assert(r.getString(5) === s"event_id=${r.getLong(0)}")
    }
    bySink("dwd_order_info").foreach { r =>
      val p = r.getString(5)
      assert(p.contains(",k=") && p.contains(",user_id=") && p.contains(",value_c="))
    }
    bySink("dwd_start_log").foreach { r =>
      assert(!r.getString(5).contains("value_c="))
    }
    // hbase/kafka sink split survives routing
    assert(rows.map(_.getString(4)).toSet === Set("kafka", "hbase"))
  }

  test("dim upsert: latest version wins, ties break by record id, deletes tombstone") {
    import spark.implicits._
    val snapshot = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("key", "name")
    val updates = Seq(
      (2L, "b-v10-first", 10L, 1L, "u"),
      (2L, "b-v10-second", 10L, 2L, "u"), // same version, higher tie wins
      (2L, "b-v3-old", 3L, 9L, "u"),      // older version never wins
      (3L, "dead", 5L, 3L, "d"),          // tombstone removes the key
      (4L, "fresh-insert", 1L, 4L, "u"))  // new key appears
      .toDF("key", "name", "version", "tie", "op")
    val out = DimMaintenance.upsert(snapshot, updates, "key", "version", "tie", "op")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "a", 2L -> "b-v10-second", 4L -> "fresh-insert"))
  }

  test("dim upsert oracled instance: cdc rows replace base rows for touched keys") {
    val out = DimMaintenance.dimUpsert(spark, sf001)
    val bySrc = out.groupBy(col("src")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // every part key survives unless its LAST cdc event was a delete;
    // keys 0..99 are all touched by cdc at sf0.01, keys 100+ stay base
    assert(bySrc("base") >= 1900L)
    assert(bySrc.getOrElse("cdc", 0L) + bySrc("base") === out.count())
    // surviving cdc rows really are the latest event for their key
    assert(out.filter(col("src") === "cdc")
      .filter(!col("p_name").startsWith("upd-")).count() === 0L)
  }

  test("clean/dirty side outputs are an exact partition, dirty keeps raw payloads") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-dirty").toFile.getAbsolutePath
    val base = 86400L * 1000000000L
    Seq(
      (1L, base, 1L, "view", 1.0, """{"k": 5}"""),        // clean
      (2L, base, 1L, "click", 1.0, null),                  // null payload
      (3L, base, 2L, "view", 1.0, "   "),                  // empty payload
      (4L, base, 2L, "view", 1.0, """{"garbage": true}"""), // unparseable key
      (5L, base, 3L, "error", 1.0, """{"k": 9}"""),        // SDK-flagged error
      (6L, base, 3L, "signup", 1.0, """{"k": 7}"""),       // clean
      (7L, base, 4L, null, 1.0, """{"k": 8}"""))           // NULL event_type
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val clean = Dwd.clean(spark, d).collect()
    val dirty = Dwd.dirty(spark, d).collect()
    assert(clean.map(_.getLong(0)).toSet === Set(1L, 6L))
    assert(dirty.map(_.getLong(0)).toSet === Set(2L, 3L, 4L, 5L, 7L))
    // partition: every input row lands in exactly one leg
    assert(clean.length + dirty.length === 7)
    val reasons = dirty.map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(reasons === Map(2L -> "null_payload", 3L -> "empty_payload",
      4L -> "unparseable_key", 5L -> "error_flagged", 7L -> "null_event_type"))
    // raw payload survives untouched for replay
    assert(dirty.find(_.getLong(0) == 4L).get.getString(3) === """{"garbage": true}""")
  }

  test("incremental product stats: delta merge equals full recompute, orders span the split") {
    import spark.implicits._
    // the split key (l_linenumber % 5) must actually divide some orders
    val li = graft.Tables.lineitem(spark, sf001)
    val spanning = li.groupBy(col("l_orderkey"))
      .agg(countDistinct(col("l_linenumber") % 5 === 4).as("sides"))
      .filter(col("sides") === 2).count()
    assert(spanning > 0L, "split does not exercise cross-split orders")
    val full = Dws.productStats(spark, sf001).collect().map(_.toSeq).toSeq
    val incr = Dws.productStatsIncr(spark, sf001).collect().map(_.toSeq).toSeq
    assert(incr === full)
  }

  test("gmv anomaly: spike z-score matches hand arithmetic, warmup and flat windows null") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-anom").toFile.getAbsolutePath
    // days 1-7 flat at 100, day 8 spikes to 1000
    (1 to 8).map { day =>
      (day.toLong, 1L, new java.sql.Timestamp(day * 86400L * 1000L),
        if (day == 8) 1000.0 else 100.0)
    }.toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/orders.parquet")
    val out = graft.operators.Ads.gmvAnomaly(spark, d).collect()
      .map(r => r.getString(0) ->
        ((if (r.isNullAt(2)) null else r.getDouble(2): Any), r.getInt(3)))
      .toMap
    assert(out.size === 8)
    // warmup days (no full 7-day window) and the flat day-7 window: null z
    (1 to 7).foreach { day =>
      val key = f"1970-01-${day + 1}%02d"
      assert(out(key) === ((null, 0)), s"day $day")
    }
    // day 8: window [100x6, 1000] — z from the exact-sums formula
    val s1 = 1600.0; val s2 = 1060000.0
    val mean = s1 / 7.0
    val std = math.sqrt((s2 - s1 * s1 / 7.0) / 6.0)
    val (z, flag) = out("1970-01-09")
    assert(math.abs(z.asInstanceOf[Double] - (1000.0 - mean) / std) < 1e-6)
    assert(flag === 1)
  }

  test("active users: per-day dedup, trailing-7-day WAU, fan-out tail days dropped") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-active").toFile.getAbsolutePath
    def at(day: Long, id: Long, user: Long) =
      (id, (day * 86400L + 43200L + id) * 1000000000L, user, "view", 1.0, """{"k": 1}""")
    Seq(at(1, 1, 1), at(1, 2, 2), at(2, 3, 2), at(2, 4, 2), at(10, 5, 1))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val out = graft.operators.Ads.activeUsers(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
    // d2: user 2's two events collapse; window {d-6..d} still sees user 1
    // d10: d1/d2 activity aged out; no rows for the d3..d8 fan-out tail
    assert(out.toSeq === Seq(
      "1970-01-02" -> ((2L, 2L)), "1970-01-03" -> ((1L, 2L)),
      "1970-01-11" -> ((1L, 1L))))
  }

  test("rfm: quartile-cut banding matches the hand-computed ntile(4) on planted users") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-rfm").toFile.getAbsolutePath
    // user u: u purchases of value u on day u → f=u, m=u², r_days=8-u
    val rows = for { u <- 1L to 8L; i <- 1L to u } yield
      (u * 100 + i, (u * 86400L + 43200L + i) * 1000000000L, u, "purchase",
        u.toDouble, """{"k": 1}""")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val out = graft.operators.Ads.rfm(spark, d).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4), r.getInt(5), r.getInt(6))))
      .toMap
    // quartile cuts over 8 evenly-ranked users put 2 users per band;
    // recency reverses (smallest r_days = best score)
    val expScore = Map(1L -> 1, 2L -> 1, 3L -> 2, 4L -> 2, 5L -> 3, 6L -> 3, 7L -> 4, 8L -> 4)
    (1L to 8L).foreach { u =>
      val (r, f, m, rs, fs, ms) = out(u)
      assert((r, f, m) === ((8 - u, u, (u * u).toDouble)))
      assert(fs === expScore(u), s"f_score user $u")
      assert(ms === expScore(u), s"m_score user $u")
      assert(rs === expScore(u), s"r_score user $u (reversed recency)")
    }
  }

  test("scd2 point-in-time join: boundaries inclusive-exclusive, delete gaps NULL, ties by cdc id") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-pit").toFile.getAbsolutePath
    def ns(sec: Long): Long = sec * 1000000000L
    def ev(id: Long, sec: Long, typ: String, k: Long): (Long, Long, Long, String, Double, String) =
      (id, ns(sec), 1L, typ, 1.0, s"""{"k": $k}""")
    Seq(
      // k=1 version chain: base → upd-10 @100 → deleted @200 → upd-12 @300
      ev(10, 100, "purchase", 1), ev(11, 200, "error", 1), ev(12, 300, "purchase", 1),
      // k=3 tie: two updates at the same instant — higher event_id wins
      ev(30, 100, "purchase", 3), ev(31, 100, "purchase", 3),
      // facts (views)
      ev(20, 50, "view", 1),   // before any cdc → base
      ev(21, 100, "view", 1),  // at version start → inclusive
      ev(22, 150, "view", 1),  // mid-version
      ev(23, 250, "view", 1),  // inside the deleted gap → NULL
      ev(24, 300, "view", 1),  // at re-insert boundary
      ev(25, 350, "view", 1),
      ev(26, 100, "view", 2),  // untouched key → base
      ev(27, 100, "view", 5),  // key absent from the dim → NULL
      ev(32, 100, "view", 3),  // tie instant → max-tie update
      ev(33, 50, "view", 3))   // before the tie → base
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    Seq((1L, "base-1", "B"), (2L, "base-2", "B"), (3L, "base-3", "B"))
      .toDF("p_partkey", "p_name", "p_brand")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/part.parquet")
    val out = DimMaintenance.scd2PointInTime(spark, d).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) null else r.getString(2))).toMap
    assert(out === Map(
      20L -> "base-1", 21L -> "upd-10", 22L -> "upd-10", 23L -> null,
      24L -> "upd-12", 25L -> "upd-12", 26L -> "base-2", 27L -> null,
      32L -> "upd-31", 33L -> "base-3"))
  }

  test("scd2: versions chain validity ranges, deletes close but never appear") {
    import spark.implicits._
    val hist = Seq(
      (1L, "v0", 0L, Long.MinValue, "u"),   // base
      (1L, "v1", 100L, 1L, "u"),
      (1L, "v2", 200L, 2L, "u"),
      (2L, "b0", 0L, Long.MinValue, "u"),
      (2L, "dead", 150L, 3L, "d"),          // tombstone closes b0
      (3L, "only", 0L, Long.MinValue, "u"))
      .toDF("key", "name", "version", "tie", "op")
    val out = DimMaintenance.scd2(hist, "key", "version", "tie", "op")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3), r.getInt(4))).toSet
    assert(out === Set(
      (1L, "v0", 0L, 100L, 0), (1L, "v1", 100L, 200L, 0), (1L, "v2", 200L, -1L, 1),
      (2L, "b0", 0L, 150L, 0),  // closed by the delete, delete row absent
      (3L, "only", 0L, -1L, 1)))
  }

  test("product stats full: wide row agrees with independent per-stream computations") {
    val full = Dws.productStatsFull(spark, sf001).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(full.size === 100)
    // event legs: click_ct for sku 7 == raw filtered count
    val ev = graft.Tables.events(spark, sf001)
      .withColumn("sku", regexp_extract(col("props"), """"k":\s*(\d+)""", 1).cast("int"))
    val clicks7 = ev.filter(col("event_type") === "click" && col("sku") === 7).count()
    assert(full(7).getLong(2) === clicks7)
    // order leg: order_ct for sku 13 == distinct orderkeys with partkey%100==13
    val orders13 = graft.Tables.lineitem(spark, sf001)
      .filter(col("l_partkey") % 100 === 13)
      .select(col("l_orderkey")).distinct().count()
    assert(full(13).getLong(6) === orders13)
    // payment leg: exact decimal sum of purchase values for sku 0
    val pay0 = ev.filter(col("event_type") === "purchase" && col("sku") === 0)
      .agg(graft.operators.Agg.moneySum(col("value"))).collect()(0).getDouble(0)
    assert(full(0).getDouble(5) === pay0)
  }

  test("order wide: six-dim breadth, derived fields, hints only on bounded dims") {
    val ow = Dwm.orderWide(spark, sf001)
    // the reference's six enrichment legs all surface in the row
    assert(ow.columns.toSet === Set(
      "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
      "order_date", "o_totalprice", "c_name", "c_mktsegment",
      "n_name", "r_name",                       // customer → nation → region
      "p_brand", "p_type",                      // part (sku/trademark/category3)
      "s_name", "s_nation",                     // supplier → supplier-nation
      "cust_band", "ship_delay_d"))             // derived-at-enrichment
    // inner dim joins must not drop or fan out fact rows
    assert(ow.count() === graft.Tables.lineitem(spark, sf001).count())
    // derived fields recompute from the base tables on a sampled row
    val row = ow.filter(col("l_orderkey") === 1).orderBy(col("l_linenumber"),
      col("l_quantity"), col("l_extendedprice")).collect()(0)
    val acct = graft.Tables.orders(spark, sf001).filter(col("o_orderkey") === 1)
      .join(graft.Tables.customer(spark, sf001), col("o_custkey") === col("c_custkey"))
      .select(col("c_acctbal")).collect()(0).getDouble(0)
    assert(row.getAs[Int]("cust_band") === math.floor(acct / 1000).toInt)
    // explicit broadcast hints: only the bounded dims (nation ×2, region)
    val hints = "strategy=broadcast".r
      .findAllIn(ow.queryExecution.analyzed.toString).size
    assert(hints === 3, s"expected 3 bounded-dim broadcast hints, got $hints")
  }

  test("incremental scd2: delta merge equals the full rebuild (corpus + planted boundary)") {
    // corpus: byte-identical to the full-history rebuild, with keys
    // spanning the version-midpoint split
    val full = DimMaintenance.dimScd2(spark, sf0001).collect().toSeq
    val incr = DimMaintenance.dimScd2Incr(spark, sf0001).collect().toSeq
    assert(incr === full)
    assert(full.nonEmpty)
    // the state contract: the closed archive is immutable — every
    // closed row of the standing batch appears verbatim in the merge
    // output (spot check via the valid_to!=null subset sizes)
    val closedCt = full.count(r => !r.isNullAt(r.fieldIndex("valid_to")))
    assert(closedCt > 0, "corpus should close versions across the split")
  }

  test("incremental scd2 semantics: tombstone memory survives the split") {
    import spark.implicits._
    // planted via the generic scd2 on the same algebra the incr op
    // uses: last standing event is a TOMBSTONE; a delta update after
    // the split must open a fresh version, and the tombstone's key
    // must not resurrect the pre-delete payload
    val standing = Seq(
      (1L, "v1", 10L, 1L, "u"), (1L, "v2", 20L, 2L, "u"), (1L, "dead", 30L, 3L, "d"))
      .toDF("key", "payload", "version", "tie", "op")
    val delta = Seq((1L, "v3", 40L, 4L, "u"))
      .toDF("key", "payload", "version", "tie", "op")
    val wLast = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("version").desc, col("tie").desc)
    val lastEvent = standing.withColumn("rn", row_number().over(wLast))
      .filter(col("rn") === 1).drop("rn")
    val archive = DimMaintenance.scd2(standing, "key", "version", "tie", "op")
      .filter(col("valid_to").isNotNull)
    val merged = archive.unionByName(
      DimMaintenance.scd2(lastEvent.unionByName(delta), "key", "version", "tie", "op"))
      .orderBy(col("valid_from"))
      .collect().map(r => (r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getInt(4)))
    val rebuild = DimMaintenance.scd2(standing.unionByName(delta), "key", "version", "tie", "op")
      .orderBy(col("valid_from"))
      .collect().map(r => (r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getInt(4)))
    assert(merged === rebuild)
    // v2 closed AT the tombstone (30), v3 opens fresh at 40: the
    // 30-40 gap stays dead
    assert(merged.toSeq === Seq(("v1", 10L, 20L, 0), ("v2", 20L, 30L, 0), ("v3", 40L, -1L, 1)))
  }

  test("churn: came-back vs lapsed customers, next-year-only customers excluded") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-churn")
      .toFile.getAbsolutePath
    def day(y: Int) = java.sql.Timestamp.valueOf(s"$y-06-01 00:00:00")
    // A: 1995 only (churns); B: both years (retained, multiple orders
    // must not double count); C: 1996 only (not in the base cohort)
    Seq(
      (1L, 10L, day(1995)), (2L, 20L, day(1995)), (3L, 20L, day(1995)),
      (4L, 20L, day(1996)), (5L, 30L, day(1996)))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    Seq((10L, 1L), (20L, 1L), (30L, 1L)).toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$d/customer.parquet")
    Seq((1L, "X")).toDF("n_nationkey", "n_name")
      .write.mode("overwrite").parquet(s"$d/nation.parquet")
    val out = graft.operators.Ads.churn(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(out === Array(("X", 2L, 1L, 1L, 0.5)))
  }

  test("basket affinity: hand-computed support/confidence/lift, duplicate lines collapse") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-basket")
      .toFile.getAbsolutePath
    // O1{A,B} O2{A,B} O3{A,C} O4{B}; duplicate (O1, A) line must not
    // inflate the pair count. Pair (A,B): ct 2, ct_A=3, ct_B=3, N=4
    //   confidence 2/3, lift 2*4/9; pair (A,C): ct 1 -> below min support
    Seq((1L, 100L), (1L, 100L), (1L, 200L), (2L, 100L), (2L, 200L),
      (3L, 100L), (3L, 300L), (4L, 200L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val out = graft.operators.Ads.basketAffinity(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(out === Array((100L, 200L, 2L, 0.666667, 0.888889)))
  }

  test("gmv ewma: hand-computed 2-term smoothing, warmup null, exact dyadic weights") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-ewma")
      .toFile.getAbsolutePath
    def day(n: Int) = java.sql.Timestamp.valueOf(f"2024-01-$n%02d 00:00:00")
    Seq((1L, 100.00, day(1)), (2L, 200.00, day(2)), (3L, 50.00, day(3)))
      .toDF("o_orderkey", "o_totalprice", "o_orderdate")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    val out = graft.operators.Ads.gmvEwma(spark, d, span = 2).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1),
        if (r.isNullAt(2)) null else r.getDouble(2)))).toMap
    assert(out("2024-01-01") === ((100.0, null)))
    // (20000*1 + 10000*0.75) / 1.75 / 100 and (5000*1 + 20000*0.75) / 1.75 / 100
    assert(out("2024-01-02") === ((200.0, 157.142857)))
    assert(out("2024-01-03") === ((50.0, 114.285714)))
    // the weights really are the exact dyadic values
    val ws = graft.operators.Ads.ewmaWeights(28)
    assert(ws.head === 1.0)
    assert(ws(27) === math.pow(3, 27) / math.pow(4, 27))
  }
}
