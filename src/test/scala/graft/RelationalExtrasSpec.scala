package graft

import java.nio.file.Files

import graft.operators.Relational
import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** Hand-computed checks for the round-3 relational/text additions —
  * the oracle proves engine-equality; these prove the SEMANTICS. */
class RelationalExtrasSpec extends SparkSpec {

  test("rolling GMV: RANGE frame narrows over missing days (not a rows frame)") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-roll").toFile.getAbsolutePath
    def t(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")
    // days 1, 2, 10: day 10's 7-day frame covers days 4-10 → only
    // itself; a 3-rows frame would wrongly include days 1 and 2
    Seq((1L, 1L, "O", 100.0, t(1), "p"), (2L, 1L, "O", 10.0, t(2), "p"),
      (3L, 1L, "O", 1.0, t(10), "p"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    val got = Relational.rollingGmv(spark, d).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got === Map(
      "2024-01-01" -> (100.0, 100.0),
      "2024-01-02" -> (10.0, 110.0),
      "2024-01-10" -> (1.0, 1.0)))
  }

  test("tfidf: scores and ranks recompute by hand on a planted corpus") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-tfidf").toFile.getAbsolutePath
    // 3 docs; "rare" appears only in doc 1 (twice), "common" in all
    Seq((1L, "rare rare common", "en", "s", 0L),
      (2L, "common alpha", "en", "s", 0L),
      (3L, "common beta", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    def score(tf: Long, df: Long): Double =
      BigDecimal(tf * math.log(4.0 / (df + 1.0)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = TextOps.tfidf(spark, d).collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getString(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    // doc 1: rare tf=2 df=1 beats common tf=1 df=3 (whose idf is 0)
    assert(got((1L, 1)) === ("rare", 2L, 1L, score(2, 1)))
    assert(got((1L, 2)) === ("common", 1L, 3L, score(1, 3)))
    assert(got((1L, 2))._4 === 0.0) // ln(4/4) = 0: all-docs terms score 0
    // doc 2: alpha (tf=1, df=1) ranks above common
    assert(got((2L, 1)) === ("alpha", 1L, 1L, score(1, 1)))
  }

  test("gapfill: quiet days appear as explicit zero rows and the spine is continuous") {
    val rows = Relational.dailyGapfill(spark, sf0001).collect()
    val days = rows.map(_.getString(0))
    assert(days.toSet.size === days.length)
    // continuous: row count == exact span between the min and max day
    val span = java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.parse(days.head), java.time.LocalDate.parse(days.last)) + 1
    assert(rows.length.toLong === span)
    // sf0.001 has ~1.5k orders over ~2.4k days → gaps must exist, and a
    // gap day carries exactly (0 orders, 0.0 gmv)
    val zeros = rows.filter(_.getLong(1) == 0L)
    assert(zeros.nonEmpty)
    zeros.foreach(r => assert(r.getDouble(2) === 0.0))
  }

  test("window suite: rank/ntile/pct/cume/lag/running agree on a planted partition") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // four customers with a balance tie: over the tie-visible window
    // (balance only) rank skips and percent_rank/cume_dist use the
    // tied-group definitions; ntile is checked over the operator's
    // fully tie-broken window, where its bucket assignment is
    // deterministic
    val df = Seq((1L, 50.0), (2L, 50.0), (3L, 30.0), (4L, 10.0))
      .toDF("c_custkey", "c_acctbal")
    val tied = Window.orderBy(col("c_acctbal").desc)
    val total = Window.orderBy(col("c_acctbal").desc, col("c_custkey"))
    val got = df.select(col("c_custkey"),
        rank().over(tied).as("rnk"), ntile(4).over(total).as("q"),
        round(percent_rank().over(tied), 6).as("pr"),
        round(cume_dist().over(tied), 6).as("cd"))
      .orderBy(col("c_custkey")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3), r.getDouble(4)))
    assert(got === Array(
      (1L, 1, 1, 0.0, 0.5), (2L, 1, 2, 0.0, 0.5),
      (3L, 3, 3, 0.666667, 0.75), (4L, 4, 4, 1.0, 1.0)))
  }

  test("org walk: recursive chain depth is floor(log2(key)), balances sum exactly") {
    val rows = Relational.orgWalk(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    // depth of key k (k >= 1) is floor(log2 k); key 0 never recurses
    assert(rows(0L)._1 === 0)
    assert(rows(1L)._1 === 0)
    assert(rows(5L)._1 === 2)   // 5 -> 2 -> 1
    assert(rows(100L)._1 === 6) // 100 -> 50 -> 25 -> 12 -> 6 -> 3 -> 1
    // chain balance for 5 = acctbal(5) + acctbal(2) + acctbal(1), 2dp-exact
    val bal = Tables.customer(spark, sf0001)
      .filter(col("c_custkey").isin(5L, 2L, 1L))
      .collect().map(r => BigDecimal(r.getDouble(3)).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
    assert(BigDecimal(rows(5L)._2).setScale(2, BigDecimal.RoundingMode.HALF_UP) === bal)
  }

  test("full outer daily keeps days traded by only one status, zero-filled") {
    val rows = Relational.fullOuterDaily(spark, sf0001).collect()
    // at sf0.001 (~1.5k orders over ~2.4k days) one-sided days dominate
    assert(rows.exists(r => r.getLong(1) == 0L && r.getLong(3) > 0L))
    assert(rows.exists(r => r.getLong(1) > 0L && r.getLong(3) == 0L))
    rows.foreach { r =>
      assert(r.getLong(1) > 0L || r.getLong(3) > 0L) // no phantom days
      if (r.getLong(1) == 0L) assert(r.getDouble(2) === 0.0)
      if (r.getLong(3) == 0L) assert(r.getDouble(4) === 0.0)
    }
  }

  test("open orders: sweep-line replay equals the literal containment count") {
    import org.apache.spark.sql.functions._
    // independent driver-side reference: count intervals containing each day
    val iv = Tables.lineitem(spark, sf0001)
      .join(Tables.orders(spark, sf0001), col("l_orderkey") === col("o_orderkey"))
      .select(to_date(col("o_orderdate")).as("s"), to_date(col("l_shipdate")).as("e"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getDate(1).toLocalDate))
      .filter { case (s, e) => !e.isBefore(s) }
    val out = Relational.openOrders(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(out.nonEmpty)
    // spans min(start)..max(end) with no gaps
    assert(out.length === java.time.temporal.ChronoUnit.DAYS.between(
      iv.map(_._1).min(Ordering.by[java.time.LocalDate, Long](_.toEpochDay)),
      iv.map(_._2).max(Ordering.by[java.time.LocalDate, Long](_.toEpochDay))).toInt + 1)
    out.foreach { case (dayStr, ct) =>
      val day = java.time.LocalDate.parse(dayStr)
      val want = iv.count { case (s, e) => !day.isBefore(s) && !day.isAfter(e) }
      assert(ct === want.toLong, s"day $dayStr")
    }
    // the count really varies (intervals open and close)
    assert(out.map(_._2).distinct.length > 1)
  }

  test("unpivot emits one (charge, amount) row per metric column, no shuffle") {
    val out = Relational.unpivotCharges(spark, sf0001)
    val n = Tables.lineitem(spark, sf0001).count()
    assert(out.count() === 3 * n)
    // narrow transform: no Exchange anywhere before the presentation sort
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.split("Sort").head.contains("Exchange"),
      "unpivot should be an in-place Expand, not a shuffle")
  }

  test("skyline: two-phase sweep equals the brute-force dominance filter") {
    // brute force over the REAL per-customer points at sf0.001
    val pts = Tables.orders(spark, sf0001)
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("s"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getDecimal(1), r.getLong(2)))
    val pairs = pts.groupBy(identity).map { case ((s, n), g) =>
      (s, n, g.length.toLong)
    }.toSeq
    val expected = pairs.filter { case (s, n, _) =>
      !pairs.exists { case (s2, n2, _) =>
        s2.compareTo(s) >= 0 && n2 >= n &&
          (s2.compareTo(s) > 0 || n2 > n)
      }
    }.map { case (s, n, c) => (s.doubleValue, n, c) }
      .sortBy { case (s, _, _) => -s }
    val got = Relational.skyline(spark, sf0001).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
    // frontier is strictly monotone: spend desc ⇒ order count asc
    assert(got.map(_._2) === got.map(_._2).sorted,
      "frontier must trade spend for order count monotonically")
  }

  test("skyline: a dominated point never survives a planted corner case") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-sky").toFile.getAbsolutePath
    def t = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // cust 1: (300, 1)  cust 2: (200, 2)  cust 3: (200, 1) dominated by 2
    // cust 4: (100, 2) dominated by 2     cust 5: (200, 2) ties cust 2
    val rows = Seq(
      (1L, 1L, 300.0), (2L, 2L, 100.0), (3L, 2L, 100.0),
      (4L, 3L, 200.0), (5L, 4L, 50.0), (6L, 4L, 50.0),
      (7L, 5L, 100.0), (8L, 5L, 100.0))
    rows.map { case (ok, ck, p) => (ok, ck, "O", p, t, "p") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    val got = Relational.skyline(spark, d).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((300.0, 1L, 1L), (200.0, 2L, 2L)))
  }

  test("hash split: duplicates share a split, buckets in range, ratios roughly 80/10/10") {
    val rows = TextOps.hashSplit(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getString(3)))
    assert(rows.length === 500)
    // content-keyed: same fingerprint → same split, every time
    rows.groupBy(_._2).values.foreach { g =>
      assert(g.map(_._4).distinct.length === 1, "dup docs split apart")
    }
    assert(rows.forall(r => r._3 >= 0 && r._3 < 100))
    val bySplit = rows.groupBy(_._4).map { case (k, v) => k -> v.size }
    // hash noise at n=500: just require the ordering and presence
    assert(bySplit("train") > bySplit.getOrElse("validation", 0))
    assert(bySplit("train") > bySplit.getOrElse("test", 0))
    assert(bySplit("train") > 300)
    // bucket recomputes from the fingerprint by the same fold
    rows.take(20).foreach { case (_, fp, bucket, _) =>
      val h = fp.foldLeft(0L)((a, c) => (a * 31L + c.toLong) % 1048573L)
      assert((h % 100L).toInt === bucket)
    }
  }

  test("corpus report: per-source card stats recount by hand on a planted corpus") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-report").toFile.getAbsolutePath
    Seq(
      (1L, "alpha beta", "en", "web"),
      (2L, "alpha  beta", "en", "web"),   // whitespace-normalized dup of 1
      (3L, "gamma", "de", "web"),
      (4L, "uno dos tres", "es", "books"),
      (5L, "cuatro", "es", "books"))
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = TextOps.corpusReport(spark, d).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4), r.getLong(5)))).toMap
    // web: 3 docs, 2+2+1 tokens, langs {en,de}, docs 1+2 are dup mass
    assert(got === Map(
      "web" -> ((3L, 5L, 1.666667, 2L, 2L)),
      "books" -> ((2L, 4L, 2.0, 1L, 0L))))
  }

  test("classifier score: plan hash equals the driver-side fold on real tokens") {
    // recompute bucket + weight for every token of a sample doc in
    // plain Scala; the doc score must match the engine's to the 6dp
    // the op rounds to
    val doc = Tables.documents(spark, sf0001)
      .filter(col("doc_id") === 3L).collect()(0).getAs[String]("text")
    val toks = "[a-z0-9]+".r.findAllIn(doc.toLowerCase).toSeq
    val weights = {
      val rnd = new scala.util.Random(7)
      Array.fill(64)(rnd.nextInt(1001) - 500)
    }
    def bucket(t: String): Int =
      (t.foldLeft(0L)((a, c) => (a * 31L + c.toLong) % 1048573L) % 64L).toInt
    val sw = toks.map(t => weights(bucket(t)).toLong).sum
    // the op's integer micro-unit rounding (half away from zero):
    // score = sign(sw) * floor((|sw|*4000 + n) / 2n) / 1e6
    val n = toks.length.toLong
    val expected =
      math.signum(sw.toDouble) * ((math.abs(sw) * 4000L + n) / (2L * n)) / 1e6
    val row = TextOps.classifierScore(spark, sf0001)
      .filter(col("doc_id") === 3L).collect()(0)
    assert(row.getLong(1) === toks.length.toLong)
    assert(row.getDouble(2) === expected)
    assert(row.getInt(3) === (if (expected >= 0) 1 else 0))
  }

  test("median/MAD: hand-computed on a planted skewed group") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-mad").toFile.getAbsolutePath
    val day = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // nation A prices: 1, 2, 3, 4, 100 -> median 3.00,
    //   deviations |x-3|: 2, 1, 0, 1, 97 -> MAD 1.00 (outlier-immune;
    //   stddev would be ~43)
    // nation B prices: 10, 20 -> median 15.00 (interpolated),
    //   deviations: 5, 5 -> MAD 5.00
    val prices = Seq(
      ("A", 1.0), ("A", 2.0), ("A", 3.0), ("A", 4.0), ("A", 100.0),
      ("B", 10.0), ("B", 20.0))
    prices.zipWithIndex.map { case ((n, p0), i) =>
      (i.toLong, if (n == "A") 1L else 2L, "O", p0, day, "p")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    Seq((1L, 10L), (2L, 20L)).toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$d/customer.parquet")
    Seq((10L, "A"), (20L, "B")).toDF("n_nationkey", "n_name")
      .write.mode("overwrite").parquet(s"$d/nation.parquet")
    val got = Relational.medianMad(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got === Map("A" -> ((3.0, 1.0)), "B" -> ((15.0, 5.0))))
  }

  test("histogram: ceil width, max in last bucket, only non-empty buckets") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-hist").toFile.getAbsolutePath
    val day = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // cents 100..2100: lo=100, hi=2100, width=(2000+20) div 20 = 101
    val prices = Seq(1.00, 1.00, 2.00, 21.00)
    prices.zipWithIndex.map { case (p0, i) =>
      (i.toLong, 1L, "O", p0, day, "p")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    val got = Relational.histogram(spark, d).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    // bucket 0: [1.00, 2.01) holds 1.00 x2 and 2.00; bucket 19:
    // [20.19, 21.20) holds the max — never an out-of-range bucket 20
    assert(got === Array((0L, 1.00, 2.01, 3L), (19L, 20.19, 21.20, 1L)))
  }

  test("histogram: bucket math is exact on the real corpus") {
    val rows = Relational.histogram(spark, sf0001).collect()
    val total = rows.map(_.getLong(3)).sum
    val n = Tables.orders(spark, sf0001).count()
    assert(total === n)
    rows.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) < 20)
      assert(r.getDouble(1) < r.getDouble(2))
    }
  }

  test("entropy: hand-computed on planted uniform and degenerate docs") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-entropy").toFile.getAbsolutePath
    Seq(
      (1L, "a a a a", "en", "s0"),     // degenerate: p=1 -> H=0, TTR 0.25
      (2L, "a b", "en", "s0"),         // uniform 2: H = 2*round(-.5*ln .5, 6)
      (3L, "x x y", "en", "s0"))       // H = round(-(2/3)ln(2/3),6)+round(-(1/3)ln(1/3),6)
      .toDF("doc_id", "text", "lang", "source")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = TextOps.entropy(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out(1L) === ((4L, 1L, 0.0, 0.25)))
    val h2 = 2 * math.rint(-0.5 * math.log(0.5) * 1e6) / 1e6
    assert(math.abs(out(2L)._3 - h2) < 1e-9)
    assert(out(2L)._4 === 1.0)
    val h3 = math.rint(-(2.0/3) * math.log(2.0/3) * 1e6) / 1e6 +
      math.rint(-(1.0/3) * math.log(1.0/3) * 1e6) / 1e6
    assert(math.abs(out(3L)._3 - h3) < 1e-9)
  }

  test("mix plan: capped source redistributes its surplus in one water-fill round") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-mix").toFile.getAbsolutePath
    // src1 (w=2): 4 tokens available; src2 (w=3): 100; src3 (w=4): 100
    // total 204 -> budget 102, sw 9
    //   targets: src1 (102*2)div9=22 > 4 -> CAPPED, surplus 18
    //            src2 (102*3)div9=34, src3 (102*4)div9=45
    //   uncapped weight 7: extra src2 (18*3)div7=7, src3 (18*4)div7=10
    //   allocs: 4, 41, 55
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    Seq(
      (1L, words(4), "en", "src1"),
      (2L, words(100), "en", "src2"),
      (3L, words(100), "en", "src3"))
      .toDF("doc_id", "text", "lang", "source")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = TextOps.mixPlan(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("src1") === ((2L, 4L, 22L, 4L)))
    assert(out("src2") === ((3L, 100L, 34L, 41L)))
    assert(out("src3") === ((4L, 100L, 45L, 55L)))
    // conservation: allocation never exceeds the budget
    assert(out.values.map(_._4).sum <= 102L)
  }

  test("median/MAD degenerates: single order and all-equal prices give MAD 0") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-mad-edge").toFile.getAbsolutePath
    val day = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // nation A: ONE order -> median = the value, MAD 0 (n=1 CDF walk);
    // nation B: three identical prices -> MAD 0, median exact
    Seq((1L, 10L, "O", 42.50, day, "p"),
      (2L, 20L, "O", 7.00, day, "p"), (3L, 20L, "O", 7.00, day, "p"),
      (4L, 20L, "O", 7.00, day, "p"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    Seq((10L, 1L), (20L, 2L)).toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$d/customer.parquet")
    Seq((1L, "A"), (2L, "B")).toDF("n_nationkey", "n_name")
      .write.mode("overwrite").parquet(s"$d/nation.parquet")
    val got = Relational.medianMad(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got === Map("A" -> ((42.5, 0.0)), "B" -> ((7.0, 0.0))))
  }

  test("q16: complaint suppliers are excluded from the diversity count") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-q16").toFile.getAbsolutePath
    val t0 = java.sql.Timestamp.valueOf("1995-06-01 00:00:00")
    Seq((1L, "s1", 1, 5000.0), (2L, "s2", 1, 500.0)) // s2: balance < 1000 → excluded
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/supplier.parquet")
    Seq((10L, "p", "B1", "T1", 5, 1.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/part.parquet")
    Seq(
      (1L, 10L, 1L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", t0),
      (2L, 10L, 2L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", t0),  // excluded supplier
      (3L, 10L, 1L, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", t0))  // same supplier again
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val got = Relational.q16SupplierDiversity(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3)))
    assert(got.toSeq === Seq(("B1", "T1", 5, 1L)))
  }

  test("q22: dormant high-balance customers only — recent orders and low balances drop") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-q22").toFile.getAbsolutePath
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    // avg positive balance = (100 + 100 + 10) / 3 = 70
    Seq((1L, "c1", 1, 100.0, "S"), (2L, "c2", 1, 100.0, "S"),
      (3L, "c3", 2, 10.0, "S"), (4L, "c4", 2, -50.0, "S"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/customer.parquet")
    Seq((1, "A", 0), (2, "B", 0)).toDF("n_nationkey", "n_name", "n_regionkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/nation.parquet")
    Seq(
      (1L, 1L, "F", 10.0, ts("1999-06-01"), "2-HIGH"),  // c1 is recent → drops
      (2L, 3L, "F", 10.0, ts("1995-06-01"), "2-HIGH"))  // old order — irrelevant
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/orders.parquet")
    val got = Relational.q22SalesOpportunity(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq(("A", 1L, 100.0)))
  }
}
