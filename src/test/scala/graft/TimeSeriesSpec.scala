package graft

import java.nio.file.Files

import graft.operators.TimeSeries

/** Time-series family on planted daily series: ACF finds a planted
  * weekly cycle, CUSUM accumulates a planted sustained shift that no
  * single day would z-flag, Holt locks onto a planted linear trend
  * and forecasts its continuation. */
class TimeSeriesSpec extends SparkSpec {

  /** Orders table with `n` orders of `amount` on each given day. */
  private def writeOrders(days: Seq[(String, Int, Double)]): String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-ts").toFile.getAbsolutePath
    days.zipWithIndex.flatMap { case ((day, n, amount), i) =>
      (0 until n).map(j =>
        (i.toLong * 1000 + j, 1L,
          java.time.LocalDateTime.parse(s"${day}T00:00:00"), amount))
    }.toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    d
  }

  private def day(i: Int): String =
    java.time.LocalDate.parse("2024-01-01").plusDays(i.toLong).toString

  test("acf: planted weekly cycle spikes at lag 7, flat elsewhere") {
    // 98 days, every 7th day carries 5x the revenue
    val d = writeOrders((0 until 98).map(i =>
      (day(i), 1, if (i % 7 == 0) 500.0 else 100.0)))
    val rows = TimeSeries.acf(spark, d).collect()
      .map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(rows.size === TimeSeries.AcfMaxLag)
    assert(rows(7) > 0.8, s"lag-7 acf ${rows(7)} should be near 1")
    assert(rows(14) > 0.8, s"lag-14 acf ${rows(14)} should be near 1")
    assert(math.abs(rows(1)) < 0.3 && math.abs(rows(3)) < 0.3,
      s"off-cycle lags should be small: ${rows(1)}, ${rows(3)}")
  }

  test("cusum: a sustained +2σ-total shift flags where daily z-scores stay quiet") {
    // 60 days at 10 orders, then 30 days at 12 — each +2 day is well
    // inside the daily spread a z-test needs, but the drift accumulates
    val d = writeOrders(
      (0 until 60).map(i => (day(i), 10, 100.0)) ++
        (60 until 90).map(i => (day(i), 12, 100.0)))
    val rows = TimeSeries.cusum(spark, d).collect()
    val flagged = rows.filter(_.getBoolean(3)).map(_.getString(0))
    assert(flagged.nonEmpty, "sustained shift never flagged")
    assert(flagged.forall(_ >= day(60)),
      s"flag before the shift: ${flagged.min}")
    // the statistic is monotone-increasing through the shifted segment
    val tail = rows.filter(_.getString(0) >= day(60)).map(_.getDouble(2))
    assert(tail.sliding(2).forall(p => p(1) >= p(0) - 1e-9))
  }

  test("holt: linear trend converges to the slope and forecasts its continuation") {
    // y_t = 1000 + 10t: level tracks y, trend -> 10, F+h ~ y_{n-1} + 10h
    val n = 120
    val d = writeOrders((0 until n).map(i => (day(i), 1, 1000.0 + 10.0 * i)))
    val rows = TimeSeries.holt(spark, d).collect()
    assert(rows.length === n + TimeSeries.HoltHorizon)
    val fitted = rows.filter(!_.getString(0).startsWith("F+"))
    val last = fitted.last
    assert(math.abs(last.getDouble(3) - 10.0) < 0.5,
      s"trend ${last.getDouble(3)} should approach 10")
    // late-series one-step-ahead fitted error is small relative to level
    val lateErr = fitted.drop(n - 10)
      .map(r => math.abs(r.getDouble(4) - r.getDouble(1)))
    assert(lateErr.forall(_ < 5.0), s"late fitted errors: ${lateErr.toSeq}")
    val f7 = rows.filter(_.getString(0) == s"F+${TimeSeries.HoltHorizon}").head
    val expected = 1000.0 + 10.0 * (n - 1) + 10.0 * TimeSeries.HoltHorizon
    assert(math.abs(f7.getDouble(4) - expected) < 10.0,
      s"F+7 ${f7.getDouble(4)} vs linear continuation $expected")
  }

  test("seasonality: planted weekend bump gives exact means, shares and a strong factor") {
    // 12 weeks: Sundays (dow 0) carry 500, every other day 100 —
    // 2024-01-01 is a Monday, so days with i % 7 == 6 are Sundays
    val d = writeOrders((0 until 84).map(i =>
      (day(i), 1, if (i % 7 == 6) 500.0 else 100.0)))
    val rows = TimeSeries.seasonality(spark, d).collect()
    assert(rows.length === 7)
    val byName = rows.map(r => r.getString(1) -> r).toMap
    assert(rows.map(_.getString(1)).toSeq ===
      Seq("sun", "mon", "tue", "wed", "thu", "fri", "sat"))
    rows.foreach(r => assert(r.getLong(2) === 12L))
    assert(byName("sun").getDouble(3) === 500.0)
    assert(byName("mon").getDouble(3) === 100.0)
    // shares: sunday 500/(500 + 6*100) = 5/11, others 1/11
    assert(byName("sun").getDouble(4) === math.rint(5.0 / 11.0 * 1e6) / 1e6)
    assert(byName("wed").getDouble(4) === math.rint(1.0 / 11.0 * 1e6) / 1e6)
    // all within-weekday variance is zero → the weekday factor
    // explains everything
    rows.foreach(r => assert(r.getDouble(5) === 1.0,
      s"strength ${r.getDouble(5)} should be exactly 1"))
  }

  test("seasonality: a constant series yields NULL strength, uniform shares") {
    val d = writeOrders((0 until 14).map(i => (day(i), 1, 100.0)))
    val rows = TimeSeries.seasonality(spark, d).collect()
    assert(rows.length === 7)
    rows.foreach { r =>
      assert(r.getDouble(3) === 100.0)
      assert(r.isNullAt(5), "SS_total = 0 must guard to NULL")
    }
  }

  test("corpus: acf bounded by 1, cusum non-negative, holt row count matches days + horizon") {
    val acf = TimeSeries.acf(spark, sf0001).collect()
    assert(acf.forall(r => math.abs(r.getDouble(2)) <= 1.000001))
    val cs = TimeSeries.cusum(spark, sf0001).collect()
    assert(cs.forall(_.getDouble(2) >= 0.0))
    val holt = TimeSeries.holt(spark, sf0001).collect()
    assert(holt.length === cs.length + TimeSeries.HoltHorizon)
  }
}
