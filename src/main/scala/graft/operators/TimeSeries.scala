package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Time-series diagnostics over the daily revenue / volume series —
  * the forecasting-and-monitoring surface next to `Ads.gmvEwma` /
  * `Ads.gmvAnomaly` (reference analog: the publisher's GMV endpoint,
  * gmall-publisher/.../MybatisMapper — its daily series is what every
  * one of these consumes downstream).
  *
  * Exactness discipline shared by the family: the fact scan reduces
  * to a DAY-GRAIN table of integer cents / counts via DECIMAL sums
  * (partial-aggregable, any partitioning), and every statistic is
  * then derived from exact integer moments with the SAME double
  * expression on both engines, so results are bit-identical at any
  * cluster layout. The day-grain tables are calendar-bounded (~2.5k
  * rows for the 7-year TPC-H span) — at 100 TB the fact scan is the
  * only thing that grows; the series math stays constant-size.
  */
object TimeSeries {

  /** Max ACF lag reported by [[acf]] — shared with the oracle. */
  val AcfMaxLag: Int = 14

  private def dailyCents(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderdate").isNotNull)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(Agg.dec(col("o_totalprice")))
        .cast(DecimalType(18, 2)).as("g"))
      .select(col("day"), (col("g") * 100).cast("long").as("x"))

  /** Autocorrelation function of daily GMV at lags 1..[[AcfMaxLag]] —
    * the seasonality probe run before choosing any forecast window
    * (a weekly cycle shows as a spike at lag 7). The estimator is the
    * textbook cross-moment form expanded so every aggregate is an
    * EXACT integer sum (Σxy, Σx, Σy per lag as DECIMAL(38,0) over
    * cent values); the mean/variance division happens once, per lag,
    * on the final doubles — both engines evaluate the identical
    * expression over identical integers, so the 6-dp-rounded ACF is
    * bit-stable under any partitioning.
    *
    * Plan: one fact scan → day-grain rollup; ONE sort of the ~2.5k-row
    * series produces all 14 lead columns (one window spec); the lag
    * pairs then fan out IN-ROW (posexplode of a 14-element struct
    * array) into a lag-grain rollup. Global window is day-grain
    * bounded (whitelisted, the gmv_ewma argument). */
  def acf(s: SparkSession, d: String, maxLag: Int = AcfMaxLag): DataFrame = {
    val daily = dailyCents(s, d)
    val tot = daily.agg(
      count(lit(1)).as("n"),
      sum(col("x").cast(DecimalType(38, 0))).as("s"),
      sum(col("x").cast(DecimalType(38, 0)) * col("x")).as("q"))
    val w = Window.orderBy(col("day"))
    val leads = daily.select(
      (col("x") +: (1 to maxLag).map(j =>
        lead(col("x"), j).over(w).as(s"y$j"))): _*)
    val pairs = leads
      .select(col("x"), posexplode(array((1 to maxLag).map(j =>
        col(s"y$j")): _*)).as(Seq("i", "y")))
      .filter(col("y").isNotNull)
      .select((col("i") + 1).as("lag"), col("x"), col("y"))
    val perLag = pairs.groupBy(col("lag")).agg(
      count(lit(1)).as("n_pairs"),
      sum(col("x").cast(DecimalType(38, 0))).as("sx"),
      sum(col("y").cast(DecimalType(38, 0))).as("sy"),
      sum(col("x").cast(DecimalType(38, 0)) * col("y")).as("cxy"))
    val m = col("s").cast("double") / col("n").cast("double")
    val num = col("cxy").cast("double") -
      m * col("sy").cast("double") - m * col("sx").cast("double") +
      col("n_pairs").cast("double") * m * m
    val den = col("q").cast("double") - col("s").cast("double") * m
    // den = n·Var(x) = 0 for a constant series — the ACF is undefined
    // there, so the division lives inside its own guard and emits NULL
    // (the gmvAnomaly every-division-guarded discipline)
    perLag.crossJoin(broadcast(tot))
      .select(col("lag"), col("n_pairs"),
        round(when(den =!= 0.0, num / den), 6).as("acf"))
      .orderBy(col("lag"))
  }

  def acfSql(maxLag: Int = AcfMaxLag): String =
    s"""WITH daily AS (
       |  SELECT CAST(o_orderdate AS DATE) AS day,
       |    CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
       |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1),
       |tot AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s,
       |    CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS q
       |  FROM daily),
       |leads AS (
       |  SELECT x, ${(1 to maxLag).map(j =>
              s"lead(x, $j) OVER (ORDER BY day) AS y$j").mkString(", ")}
       |  FROM daily),
       |pairs AS (
       |  SELECT i + 1 AS lag, x, y FROM (
       |    SELECT x, unnest(range(0, $maxLag)) AS i,
       |      unnest([${(1 to maxLag).map(j => s"y$j").mkString(", ")}]) AS y
       |    FROM leads) t WHERE y IS NOT NULL),
       |per_lag AS (
       |  SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
       |    CAST(sum(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
       |    CAST(sum(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
       |    CAST(sum(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS cxy
       |  FROM pairs GROUP BY lag)
       |SELECT CAST(lag AS INTEGER) AS lag, n_pairs,
       |  round(CASE WHEN (CAST(q AS DOUBLE) - CAST(s AS DOUBLE)
       |          * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))) <> 0 THEN
       |    (CAST(cxy AS DOUBLE)
       |      - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * CAST(sy AS DOUBLE)
       |      - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * CAST(sx AS DOUBLE)
       |      + CAST(n_pairs AS DOUBLE) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
       |          * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
       |    / (CAST(q AS DOUBLE) - CAST(s AS DOUBLE)
       |          * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))) END, 6) AS acf
       |FROM per_lag, tot ORDER BY lag""".stripMargin

  /** CUSUM threshold in σ units — shared with the oracle. */
  val CusumThresholdSigma: Double = 4.0

  /** One-sided CUSUM drift detector (Page 1954) on daily order
    * VOLUME — the changepoint monitor behind `dq_volume_anomaly`'s
    * z-flags: a z-score sees single-day spikes, CUSUM accumulates
    * small sustained shifts that no single day would flag.
    *
    * The recurrence S_t = max(0, S_{t-1} + (x_t − μ − slack)) is NOT
    * computed as a serial fold: with R_t the prefix sum of the drift
    * terms, S_t = R_t − min(0, min_{j≤t} R_j) — two running windows
    * over the day-grain series. Exactness: the drift terms are scaled
    * by n (D_t = n·x_t − Σx − n·slack, all BIGINT — μ never becomes a
    * double mid-stream) and slack = round(σ/2) is the same exact
    * integer on both engines, so the running sums are integer-exact;
    * the one division by n·σ happens on the final row values. */
  def cusum(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.orders(s, d)
      .filter(col("o_orderdate").isNotNull)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("x"))
    val tot = daily.agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("s"),
      sum(col("x") * col("x")).as("q"))
    val m = col("s").cast("double") / col("n").cast("double")
    val sd = sqrt(col("q").cast("double") / col("n").cast("double") - m * m)
    val base = daily.crossJoin(broadcast(tot
      .select(col("n"), col("s"), sd.as("sd"),
        round(sd / 2, 0).cast("long").as("slack"))))
      .withColumn("dd", col("n") * col("x") - col("s") - col("n") * col("slack"))
    val wRun = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cs = base
      .withColumn("r", sum(col("dd")).over(wRun))
      .withColumn("floor_r", least(lit(0L), min(col("r")).over(wRun)))
      // sd = 0 for a constant series — CUSUM drift is undefined, so
      // the division is guarded and emits NULL (gmvAnomaly discipline)
      .withColumn("cusum", round(when(col("sd") =!= 0.0,
        (col("r") - col("floor_r")).cast("double") /
          (col("n").cast("double") * col("sd"))), 6))
    cs.select(
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("x").as("orders"), col("cusum"),
        (col("cusum") > CusumThresholdSigma).as("drift_flag"))
      .orderBy(col("day"))
  }

  val cusumSql: String =
    s"""WITH daily AS (
       |  SELECT CAST(o_orderdate AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
       |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1),
       |tot AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s,
       |    CAST(sum(x * x) AS BIGINT) AS q
       |  FROM daily),
       |params AS (
       |  SELECT n, s,
       |    sqrt(CAST(q AS DOUBLE) / CAST(n AS DOUBLE)
       |      - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
       |          * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))) AS sd
       |  FROM tot),
       |base AS (
       |  SELECT day, x, n, s, sd, CAST(round(sd / 2, 0) AS BIGINT) AS slack
       |  FROM daily, params),
       |r1 AS (
       |  SELECT day, x, n, sd,
       |    CAST(sum(n * x - s - n * slack) OVER
       |      (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS BIGINT) AS r
       |  FROM base),
       |run AS (
       |  SELECT day, x, n, sd, r,
       |    least(CAST(0 AS BIGINT), CAST(min(r) OVER
       |      (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS BIGINT)) AS floor_r
       |  FROM r1)
       |SELECT strftime(day, '%Y-%m-%d') AS day, x AS orders,
       |  round(CASE WHEN sd <> 0 THEN
       |    CAST(r - floor_r AS DOUBLE) / (CAST(n AS DOUBLE) * sd) END, 6) AS cusum,
       |  round(CASE WHEN sd <> 0 THEN
       |    CAST(r - floor_r AS DOUBLE) / (CAST(n AS DOUBLE) * sd) END, 6)
       |    > $CusumThresholdSigma AS drift_flag
       |FROM run ORDER BY day""".stripMargin

  /** Forecast horizon (days past the series end). α=1/2 and β=1/4 are
    * FIXED by the integer-shift arithmetic below (shared operator ↔
    * oracle by construction, not by parameter). */
  val HoltHorizon: Int = 7

  /** Holt double-exponential smoothing (level + trend) of daily GMV,
    * with a [[HoltHorizon]]-day forecast — the trend-following
    * companion to `Ads.gmvEwma` (which has no trend term and cannot
    * forecast). The recurrence
    *   l_t = α·y_t + (1−α)(l_{t−1} + b_{t−1});
    *   b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1}
    * is inherently serial, so it runs where serial is free: the
    * distributed fact scan reduces to the ~2.5k-row day-grain series,
    * which collects into ONE row and folds in-row (`aggregate` over
    * the sorted struct array — no driver collect, no per-row window).
    *
    * Exactness: the dyadic α=1/2, β=1/4 make each step a pure
    * INTEGER-CENT recurrence — l' = ⌊(y+l+b+1)/2⌋ and
    * b' = ⌊(l'−l+3b+2)/4⌋ via arithmetic shifts (round-half-up; both
    * engines' shifts floor on negatives) — so the state is a pair of
    * BIGINTs with no float op anywhere in the loop. A 6-dp re-round
    * recurrence would NOT replay: at 10⁶-scale magnitudes the two
    * engines' round() differ by 1 ulp and the recurrence amplifies
    * it. The only divisions are the final exact /100.0 displays. */
  def holt(s: SparkSession, d: String): DataFrame = {
    val daily = dailyCents(s, d)
    val series = daily.agg(
      sort_array(collect_list(struct(col("day"), col("x")))).as("sr"))
    // the l' expression appears twice (b' needs it) — expanded inline
    val lNew = "shiftright(e.x + acc.l + acc.b + 1, 1)"
    val bNew = s"shiftright($lNew - acc.l + 3 * acc.b + 2, 2)"
    val folded = series.select(expr(
      s"""aggregate(
         |  slice(sr, 2, size(sr) - 1),
         |  named_struct(
         |    'l', sr[0].x,
         |    'b', CAST(0 AS BIGINT),
         |    'rows', array(named_struct(
         |      'day', date_format(sr[0].day, 'yyyy-MM-dd'),
         |      'gmv', CAST(sr[0].x AS DOUBLE) / 100.0,
         |      'level', CAST(sr[0].x AS DOUBLE) / 100.0,
         |      'trend', CAST(0.0 AS DOUBLE),
         |      'fitted', CAST(NULL AS DOUBLE)))),
         |  (acc, e) -> named_struct(
         |    'l', $lNew,
         |    'b', $bNew,
         |    'rows', concat(acc.rows, array(named_struct(
         |      'day', date_format(e.day, 'yyyy-MM-dd'),
         |      'gmv', CAST(e.x AS DOUBLE) / 100.0,
         |      'level', CAST($lNew AS DOUBLE) / 100.0,
         |      'trend', CAST($bNew AS DOUBLE) / 100.0,
         |      'fitted', CAST(acc.l + acc.b AS DOUBLE) / 100.0)))))""".stripMargin)
      .as("st"))
    val fitted = folded.select(explode(col("st.rows")).as("r"))
      .select(col("r.day").as("day"), col("r.gmv").as("gmv"),
        col("r.level").as("level"), col("r.trend").as("trend"),
        col("r.fitted").as("fitted"))
    val forecast = folded
      .select(col("st.l").as("l"), col("st.b").as("b"),
        explode(sequence(lit(1), lit(HoltHorizon))).as("h"))
      .select(concat(lit("F+"), col("h")).as("day"),
        lit(null).cast("double").as("gmv"),
        lit(null).cast("double").as("level"),
        lit(null).cast("double").as("trend"),
        ((col("l") + col("h").cast("long") * col("b")).cast("double") /
          lit(100.0)).as("fitted"))
    fitted.union(forecast).orderBy(col("day"))
  }

  def holtSql: String = {
    val lNew = "((d.x + rec.l + rec.b + 1) >> 1)"
    s"""WITH RECURSIVE daily AS (
       |  SELECT CAST(o_orderdate AS DATE) AS day,
       |    CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
       |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1),
       |idx AS MATERIALIZED (
       |  SELECT day, x, row_number() OVER (ORDER BY day) AS rn FROM daily),
       |rec AS (
       |  SELECT 1 AS t, x AS l, CAST(0 AS BIGINT) AS b
       |  FROM idx WHERE rn = 1
       |  UNION ALL
       |  SELECT t2 AS t, l2 AS l, ((l2 - l0 + 3 * b0 + 2) >> 2) AS b
       |  FROM (
       |    SELECT rec.t + 1 AS t2, $lNew AS l2, rec.l AS l0, rec.b AS b0
       |    FROM rec JOIN idx d ON d.rn = rec.t + 1) q),
       |fitted AS (
       |  SELECT strftime(d.day, '%Y-%m-%d') AS day,
       |    CAST(d.x AS DOUBLE) / 100.0 AS gmv,
       |    CAST(r.l AS DOUBLE) / 100.0 AS level,
       |    CAST(r.b AS DOUBLE) / 100.0 AS trend,
       |    CASE WHEN p.t IS NULL THEN NULL
       |         ELSE CAST(p.l + p.b AS DOUBLE) / 100.0 END AS fitted
       |  FROM idx d JOIN rec r ON r.t = d.rn
       |  LEFT JOIN rec p ON p.t = d.rn - 1),
       |fc AS (
       |  SELECT 'F+' || CAST(h AS VARCHAR) AS day,
       |    CAST(NULL AS DOUBLE) AS gmv, CAST(NULL AS DOUBLE) AS level,
       |    CAST(NULL AS DOUBLE) AS trend,
       |    CAST(f.l + h * f.b AS DOUBLE) / 100.0 AS fitted
       |  FROM (SELECT l, b FROM rec ORDER BY t DESC LIMIT 1) f,
       |    (SELECT unnest(range(1, ${HoltHorizon + 1})) AS h) hs)
       |SELECT * FROM fitted UNION ALL SELECT * FROM fc ORDER BY day""".stripMargin
  }

  /** Weekday-of-week names indexed by (epoch_days + 4) % 7 — epoch day
    * 0 (1970-01-01) was a Thursday; the integer formula sidesteps the
    * engines' disagreeing dayofweek() conventions. */
  private val DowNames = Array(
    "sun", "mon", "tue", "wed", "thu", "fri", "sat")

  /** Day-of-week seasonal profile of daily GMV — the decomposition
    * run after [[acf]] flags a lag-7 spike: per-weekday day counts,
    * exact mean GMV and revenue share, plus the SEASONAL STRENGTH
    * scalar 1 − SS_within/SS_total (the variance fraction the weekday
    * factor explains; ≈0 means the weekly cycle is noise, →1 means
    * the weekday predicts the day's revenue). Exactness discipline of
    * the family: day-grain integer cents; every moment is an exact
    * DECIMAL(38,0) sum (Σx² at 100 TB cent scales overflows BIGINT);
    * each statistic is ONE shared double expression over those
    * integers with every division inside its own guard (NULL on a
    * constant or single-day-per-group series). Weekday = (epoch_days
    * + 4) % 7 — integer-exact on both engines, no dayofweek()
    * convention skew. Plan: fact scan → day grain → 7-row weekday
    * rollup → 1-row strength scalar broadcast back (whitelisted
    * one-row cross join, the ts_acf shape). */
  def seasonality(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = (c: Column) => c.cast(DecimalType(38, 0))
    val daily = dailyCents(s, d)
      .select(((datediff(col("day"), to_date(lit("1970-01-01"))) + 4) % 7)
        .as("dow"), col("x"))
    val byDow = daily.groupBy(col("dow")).agg(
      count(lit(1)).as("n"),
      sum(dec(col("x"))).as("sx"),
      sum(dec(col("x")) * dec(col("x"))).as("qx"))
    // SS_within = Σ_w (q_w − s_w²/n_w); SS_total = Q − S²/N — exact
    // integer moments, divided once in doubles. The 7-term double sum
    // folds in ASCENDING dow order on both engines (in-row aggregate
    // here, ORDER BY dow in the oracle — the ts_holt ordered-fold
    // discipline; an unordered double sum could drift an ulp across
    // partitionings)
    val ssw = col("qx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double") / col("n").cast("double")
    val tot = byDow.agg(
      sum(col("n")).as("nn"),
      sum(col("sx")).as("ss"),
      sum(col("qx")).as("qq"),
      aggregate(
        transform(array_sort(collect_list(struct(col("dow"), ssw.as("v")))),
          p => p("v")),
        lit(0.0), (a, x) => a + x).as("ss_within"))
    val sst = col("qq").cast("double") -
      col("ss").cast("double") * col("ss").cast("double") / col("nn").cast("double")
    val dowName = element_at(typedLit(DowNames.toSeq), col("dow").cast("int") + 1)
    byDow.crossJoin(broadcast(tot))
      .select(
        col("dow").cast("int").as("dow"), dowName.as("day_name"),
        col("n").as("day_ct"),
        round(when(col("n") > 0,
          col("sx").cast("double") / col("n").cast("double") / 100.0), 6)
          .as("avg_gmv"),
        round(when(col("ss").cast("double") =!= 0.0,
          col("sx").cast("double") / col("ss").cast("double")), 6).as("share"),
        round(when(sst =!= 0.0, lit(1.0) - col("ss_within") / sst), 6)
          .as("seasonal_strength"))
      .orderBy(col("dow"))
  }

  val seasonalitySql: String = {
    val names = DowNames.zipWithIndex
      .map { case (n, i) => s"WHEN $i THEN '$n'" }.mkString(" ")
    s"""WITH daily AS (
       |  SELECT CAST(o_orderdate AS DATE) AS day,
       |    CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
       |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1),
       |dowd AS (
       |  SELECT ((day - DATE '1970-01-01') + 4) % 7 AS dow, x FROM daily),
       |by_dow AS (
       |  SELECT dow, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
       |    CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS qx
       |  FROM dowd GROUP BY dow),
       |tot AS (
       |  SELECT CAST(sum(n) AS BIGINT) AS nn,
       |    CAST(sum(sx) AS DECIMAL(38,0)) AS ss,
       |    CAST(sum(qx) AS DECIMAL(38,0)) AS qq,
       |    sum(CAST(qx AS DOUBLE)
       |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
       |      ORDER BY dow) AS ss_within
       |  FROM by_dow)
       |SELECT CAST(dow AS INTEGER) AS dow,
       |  CASE dow $names END AS day_name,
       |  n AS day_ct,
       |  round(CASE WHEN n > 0
       |    THEN CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 END, 6) AS avg_gmv,
       |  round(CASE WHEN CAST(ss AS DOUBLE) <> 0
       |    THEN CAST(sx AS DOUBLE) / CAST(ss AS DOUBLE) END, 6) AS share,
       |  round(CASE WHEN (CAST(qq AS DOUBLE)
       |      - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE)) <> 0
       |    THEN 1.0 - ss_within / (CAST(qq AS DOUBLE)
       |      - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE)) END, 6)
       |    AS seasonal_strength
       |FROM by_dow, tot ORDER BY dow""".stripMargin
  }
}
