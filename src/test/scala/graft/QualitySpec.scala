package graft

import java.nio.file.Files

import graft.operators.{Ads, Quality, Relational}
import org.apache.spark.sql.functions._

/** Data-quality / warehouse-audit family: planted-data cases pin the
  * exact counts, diffs and profile stats; sf cases pin the outer-join
  * zero-bucket semantics the oracle alone can't isolate. */
class QualitySpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-$name").toFile.getAbsolutePath

  test("dq_profile: hand-computed nulls/distincts/min/max on a planted table") {
    import spark.implicits._
    val d = tmp("dqp")
    val day = 86400L * 1000000000L
    Seq(
      (1L, day, Some(10L), Option("view"), 1.5, Option("""{"k": 1}""")),
      (2L, day + 1000L, None, Option("click"), 2.5, None),
      (3L, day + 2000L, Some(10L), None, 1.5, Option("garbage")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")

    val p = Quality.dqProfile(spark, d).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p.keySet === Set("event_id", "ts_us", "user_id", "event_type", "value", "props"))
    p.values.foreach(r => assert(r.getLong(1) === 3L)) // n_rows

    val eid = p("event_id")
    assert(eid.getLong(2) === 0L && eid.getLong(3) === 3L)
    assert(eid.getDouble(4) === 1.0 && eid.getDouble(5) === 3.0)
    val uid = p("user_id")
    assert(uid.getLong(2) === 1L && uid.getLong(3) === 1L)
    assert(uid.getDouble(4) === 10.0 && uid.getDouble(5) === 10.0)
    val v = p("value")
    assert(v.getLong(2) === 0L && v.getLong(3) === 2L)
    assert(v.getDouble(4) === 1.5 && v.getDouble(5) === 2.5)
    val ts = p("ts_us")
    // stored nanos floor-divide to micros (the Tables.events contract)
    assert(ts.getDouble(4) === (day / 1000).toDouble)
    assert(ts.getDouble(5) === ((day + 2000) / 1000).toDouble)
    val et = p("event_type")
    assert(et.getLong(2) === 1L && et.getLong(3) === 2L)
    assert(et.getString(6) === "click" && et.getString(7) === "view")
    val pr = p("props")
    // byte order: 'g' (0x67) < '{' (0x7b)
    assert(pr.getString(6) === "garbage" && pr.getString(7) === """{"k": 1}""")
    // string rows carry NULL numeric stats and vice versa
    assert(et.isNullAt(4) && et.isNullAt(5) && eid.isNullAt(6) && eid.isNullAt(7))
  }

  test("dq_profile_approx: Expand-free plan, distincts within the HLL bound, exact stats identical") {
    val exact = Quality.dqProfile(spark, sf001).collect()
      .map(r => r.getString(0) -> r).toMap
    val approx = Quality.dqProfileApproxRaw(spark, sf001).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(approx.keySet === exact.keySet)
    approx.foreach { case (c, a) =>
      val e = exact(c)
      // every stat except the distinct estimate is the SAME aggregate
      assert(a.getLong(1) === e.getLong(1), s"$c n_rows")
      assert(a.getLong(2) === e.getLong(2), s"$c n_nulls")
      Seq(4, 5, 6, 7).foreach(i => assert(a.get(i) === e.get(i), s"$c stat $i"))
      // HLL++ at rsd 0.02: hold a loose 5% band so host-independent
      val (nd, ndExact) = (a.getLong(3), e.getLong(3))
      assert(math.abs(nd - ndExact) <= math.max(1L, (ndExact * 0.05).toLong),
        s"$c distinct estimate $nd vs exact $ndExact")
    }
    // the whole point of the variant: NO Expand (the exact multi-
    // distinct replays the scan k ways through one); HLL partials keep
    // the single-pass plan
    val planApprox = Quality.dqProfileApproxRaw(spark, sf001)
      .queryExecution.sparkPlan.toString
    val planExact = Quality.dqProfile(spark, sf001)
      .queryExecution.sparkPlan.toString
    assert(!planApprox.contains("Expand"), "approx profile must be Expand-free")
    assert(planExact.contains("Expand"),
      "exact profile is the Expand baseline this variant replaces")
    // the REGISTERED witness card: exact stats identical to dq_profile,
    // nd_ok pinned TRUE on every column
    val card = Quality.dqProfileApprox(spark, sf001).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(card.keySet === exact.keySet)
    card.foreach { case (c, w) =>
      val e = exact(c)
      Seq(1, 2, 3).foreach(i => assert(w.get(i) === e.get(i), s"$c stat $i"))
      assert(w.getInt(4) === 1, s"$c: nd_ok must hold")
      Seq(5, 6, 7, 8).foreach(i => assert(w.get(i) === e.get(i - 1), s"$c stat $i"))
    }
  }

  test("dq_rules: every rule fires with the exact planted violation count") {
    import spark.implicits._
    val d = tmp("dqr")
    val t0 = java.sql.Timestamp.valueOf("1995-06-01 00:00:00")
    Seq((1L, "c1", 1, 0.0, "S")).toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/customer.parquet")
    Seq(
      (1L, 1L, "F", 10.0, t0, "2-HIGH"),          // clean
      (2L, 99L, "X", -5.0, t0, "2-HIGH"),         // orphan cust + bad status + nonpositive
      (2L, 1L, "O", 20.0, t0, "2-HIGH"))          // duplicate PK
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/orders.parquet")
    Seq(
      (1L, 1L, 1L, 1, 5.0, 100.0, 0.05, 0.01, "N", "O", t0),   // clean
      (77L, 1L, 1L, 1, 100.0, 100.0, 0.05, 0.01, "N", "O", t0)) // orphan order + qty range
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val day = 86400L * 1000000000L
    Seq(
      (1L, day, Some(10L), "view", 1.0, """{"k": 1}"""),
      (2L, day, None, "view", 1.0, "not json"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")

    val got = Quality.dqRules(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map(
      "orders_status_domain" -> 1L,
      "orders_nonpositive_total" -> 1L,
      "orders_dup_pk" -> 1L,
      "lineitem_qty_range" -> 1L,
      "events_null_user" -> 1L,
      "events_unparseable_props" -> 1L,
      "lineitem_orphan_order" -> 1L,
      "orders_orphan_customer" -> 1L))
  }

  test("q_snapshot_diff: I/U/D classification with changed-column list") {
    import spark.implicits._
    val d = tmp("sdiff")
    Seq((1L, "n1", "b", "t", 1, 1.0), (2L, "n2", "b", "t", 1, 1.0), (3L, "n3", "b", "t", 1, 1.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/part.parquet")
    val day = 86400L * 1000000000L
    def ns(sec: Long): Long = day + sec * 1000000000L
    Seq(
      // key 2: early tombstone then a LATER purchase — latest wins → U
      (40L, ns(0), 1L, "error", 1.0, """{"k": 2}"""),
      (10L, ns(10), 1L, "purchase", 1.0, """{"k": 2}"""),
      // key 3: tombstoned → D
      (20L, ns(10), 1L, "error", 1.0, """{"k": 3}"""),
      // key 9: not in the base snapshot → I
      (30L, ns(10), 1L, "purchase", 1.0, """{"k": 9}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")

    val rows = Quality.snapshotDiff(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)), Option(r.getString(3))))
    assert(rows.toSeq === Seq(
      (2L, "U", Some("p_name,p_brand"), Some("upd-10")),
      (3L, "D", None, None),
      (9L, "I", None, Some("upd-30"))))
    // key 1 untouched — never emitted
    assert(!rows.exists(_._1 == 1L))
  }

  test("q_custdist: zero-order customers appear, distribution conserves customers") {
    val dist = Relational.custDist(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nCust = Tables.customer(spark, sf0001).count()
    assert(dist.values.sum === nCust)
    // brute-force cross-check of the per-customer counts
    val counts = Tables.customer(spark, sf0001)
      .join(Tables.orders(spark, sf0001)
          .filter(col("o_orderpriority") =!= "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey")).agg(count(col("o_orderkey")).as("k"))
      .groupBy(col("k")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist === counts)
  }

  test("dq_volume_anomaly: spike day flags, warmup and flat windows emit NULL z") {
    import spark.implicits._
    val d = tmp("dqv")
    val dayNs = 86400L * 1000000000L
    // days 1-7: 3 events each (flat); day 8: 30 events (spike)
    val rows = (1 to 7).flatMap { day =>
      (1 to 3).map(i => ((day * 10 + i).toLong, day * dayNs + i * 1000L, 1L, "view", 1.0, """{"k": 1}"""))
    } ++ (1 to 30).map(i => ((80 + i).toLong, 8 * dayNs + i * 1000L, 1L, "view", 1.0, """{"k": 1}"""))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")

    val got = Quality.dqVolumeAnomaly(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), Option(r.get(2)), r.getInt(3)))).toMap
    assert(got.size === 8)
    // warmup (days 1-6): fewer than 7 window rows → NULL z, no flag
    (1 to 6).foreach { day =>
      val (n, z, f) = got(f"1970-01-0${day + 1}")
      assert(n === 3L && z.isEmpty && f === 0)
    }
    // day 7: full window but zero variance → NULL z
    assert(got("1970-01-08") === ((3L, None, 0)))
    // day 8 (spike): window = 3×6 + 30, mean 8, var (6·25+484)/6
    val mean = 48.0 / 7.0
    val variance = (30.0 * 30 + 6 * 9 - 48.0 * 48 / 7) / 6.0
    val z = BigDecimal((30.0 - mean) / math.sqrt(variance))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (n8, z8, f8) = got("1970-01-09")
    assert(n8 === 30L && f8 === 1)
    assert(z8.get.asInstanceOf[Double] === z)
  }

  test("ads_new_vs_returning: first-month orders are new business, later ones returning") {
    import spark.implicits._
    val d = tmp("nvr")
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    Seq(
      (1L, 1L, "F", 100.0, ts("1995-01-15"), "2-HIGH"),
      (2L, 1L, "F", 40.0, ts("1995-01-20"), "2-HIGH"),  // same month → still new
      (3L, 1L, "F", 50.0, ts("1995-03-02"), "2-HIGH"),  // returning
      (4L, 2L, "F", 70.0, ts("1995-03-10"), "2-HIGH"))  // new in march
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/orders.parquet")
    val got = Ads.newVsReturning(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
    assert(got.toSeq === Seq(
      ("1995-01", 1L, 0L, Some(140.0), None),
      ("1995-03", 1L, 1L, Some(70.0), Some(50.0))))
  }

  test("dq_freshness: staleness in exact seconds against the corpus max") {
    import spark.implicits._
    val d = tmp("dqf")
    val dayNs = 86400L * 1000000000L
    Seq(
      (1L, 1 * dayNs, 1L, "view", 1.0, """{"k": 1}"""),
      (2L, 1 * dayNs + 90L * 1000000000L, 1L, "view", 1.0, """{"k": 1}"""),
      (3L, 1 * dayNs + 30L * 1000000000L, 1L, "click", 1.0, """{"k": 1}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = Quality.dqFreshness(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2), r.getLong(3)))).toMap
    assert(got === Map(
      "click" -> ((1L, "1970-01-02 00:00:30", 60L)),
      "view" -> ((2L, "1970-01-02 00:01:30", 0L))))
  }

  test("ads_reach_curve: first-appearance transform — revisits never re-count") {
    import spark.implicits._
    val d = tmp("reach")
    val dayNs = 86400L * 1000000000L
    Seq(
      (1L, 1 * dayNs, Some(10L), "view", 1.0, """{"k": 1}"""),
      (2L, 1 * dayNs + 1000L, Some(20L), "view", 1.0, """{"k": 1}"""),
      (3L, 2 * dayNs, Some(10L), "view", 1.0, """{"k": 1}"""),  // revisit
      (4L, 3 * dayNs, Some(30L), "view", 1.0, """{"k": 1}"""),
      (5L, 3 * dayNs + 1L, None, "view", 1.0, """{"k": 1}"""))  // null user excluded
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = Ads.reachCurve(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // day 2 has ONLY a revisit → no row (no new users), cum unchanged
    assert(got.toSeq === Seq(
      ("1970-01-02", 2L, 2L),
      ("1970-01-04", 1L, 3L)))
  }

  test("ads_cohort_ltv: hand-computed triangle on planted orders") {
    import spark.implicits._
    val d = tmp("ltv")
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    Seq(
      (1L, 1L, "F", 100.0, ts("1995-01-15"), "2-HIGH"),
      (2L, 1L, "F", 50.0, ts("1995-03-02"), "2-HIGH"),
      (3L, 2L, "F", 70.0, ts("1995-03-10"), "2-HIGH"),
      (4L, 2L, "F", 30.0, ts("1995-03-20"), "2-HIGH"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/orders.parquet")
    val got = Ads.cohortLtv(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.toSeq === Seq(
      ("1995-01", 0L, 1L, 1L, 100.0),
      ("1995-01", 2L, 1L, 1L, 50.0),
      ("1995-03", 0L, 2L, 1L, 100.0)))
  }
}
