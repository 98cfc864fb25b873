package graft

import graft.operators.{Dws, Relational}

/** The SQL surface: a user who runs plain SQL (not the DataFrame API)
  * against `Graft.registerViews` + the native extension functions must
  * get exactly what the operators produce. Each case runs a pure
  * `spark.sql` text and compares collected rows with the DataFrame
  * formulation. */
class SqlSurfaceSpec extends SparkSpec {

  private def same(sqlText: String, df: org.apache.spark.sql.DataFrame): Unit = {
    val viaSql = spark.sql(sqlText).collect().map(_.toSeq).toSeq
    val viaDf = df.collect().map(_.toSeq).toSeq
    assert(viaSql === viaDf)
  }

  test("q1 pricing summary as pure SQL matches the DataFrame operator") {
    Graft.registerViews(spark, sf001)
    same(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |    AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
      Relational.q1PricingSummary(spark, sf001))
  }

  test("keyword stats as pure SQL (LATERAL explode) matches the operator") {
    Graft.registerViews(spark, sf001)
    same(
      """SELECT keyword, count(*) AS ct, 'SEARCH' AS source
        |FROM documents
        |LATERAL VIEW explode(split(text, ' ')) t AS keyword
        |WHERE length(keyword) > 0
        |GROUP BY keyword
        |ORDER BY keyword""".stripMargin,
      Dws.keywordStats(spark, sf001))
  }

  test("native extension functions are callable from SQL") {
    Graft.registerViews(spark, sf001)
    Graft.registerFunctions(spark)
    // rolling hash: SQL text ≡ the operator's call_function path
    val viaSql = spark.sql(
      "SELECT doc_id, graft_rolling_hash64(text) AS fp FROM documents ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val viaOp = graft.operators.TextOps.rollingFingerprint(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaSql === viaOp)
    // simhash aggregate usable in a SQL GROUP BY (takes a 64-bit hash)
    val sh = spark.sql(
      "SELECT source, graft_simhash(xxhash64(text)) AS sh FROM documents GROUP BY source")
      .collect()
    assert(sh.length > 0 && sh.forall(!_.isNullAt(1)))
    // native shingling straight from SQL text; equals the Column API
    val shg = spark.sql(
      "SELECT graft_shingles(text, 3) AS sh FROM documents ORDER BY doc_id LIMIT 5")
      .collect().map(_.getSeq[String](0))
    val shgOp = graft.Tables.documents(spark, sf001)
      .orderBy(org.apache.spark.sql.functions.col("doc_id")).limit(5)
      .select(graft.functions.TextFunctions.shingles(
        org.apache.spark.sql.functions.col("text"), 3))
      .collect().map(_.getSeq[String](0))
    assert(shg.map(_.toSeq).toSeq === shgOp.map(_.toSeq).toSeq)
    // minhash signature over a SQL-built shingle array: 128 slots, all
    // inside [0, P)
    val sig = spark.sql(
      """SELECT doc_id, graft_minhash_sig(
        |  filter(split(text, ' '), t -> length(t) > 0)) AS sig
        |FROM documents ORDER BY doc_id LIMIT 5""".stripMargin).collect()
    assert(sig.length === 5)
    sig.foreach { r =>
      val arr = r.getSeq[Long](1)
      assert(arr.length === 128)
      assert(arr.forall(v => v >= 0 && v <= 2147483647L))
    }
    // vec_sum aggregate over a SQL-built array
    val vs = spark.sql(
      "SELECT graft_vec_sum(array(CAST(doc_id AS DOUBLE), 1.0d)) AS s FROM documents")
      .head().getSeq[Double](0)
    val n = graft.Tables.documents(spark, sf001).count()
    assert(vs(1) === n.toDouble)
    // bloom aggregate from SQL text; the probe side takes the built
    // filter back as a LITERAL (graft_bloom_contains requires a
    // foldable filter by design — build once, attach, probe in-row)
    val bloom = spark.sql(
      "SELECT graft_bloom_agg(xxhash64(text), 10000, 0.01d) AS bf FROM documents")
      .head().getAs[Array[Byte]](0)
    assert(bloom.nonEmpty)
    val probes = graft.Tables.documents(spark, sf001)
      .select(org.apache.spark.sql.functions.call_function("graft_bloom_contains",
        org.apache.spark.sql.functions.lit(bloom),
        org.apache.spark.sql.functions.xxhash64(
          org.apache.spark.sql.functions.col("text"))).as("hit"))
      .collect()
    assert(probes.forall(_.getBoolean(0)), "members always hit (no false negatives)")
  }

  test("skyline as pure SQL (bucketed two-phase sweep) matches the operator") {
    Graft.registerViews(spark, sf001)
    same(
      """WITH pc AS (
        |  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend,
        |    count(*) AS n_orders
        |  FROM orders GROUP BY o_custkey),
        |pairs AS (
        |  SELECT spend, n_orders, count(*) AS n_custs
        |  FROM pc GROUP BY spend, n_orders),
        |local AS (
        |  SELECT spend, n_orders, n_custs FROM (
        |    SELECT *, max(n_orders) OVER (
        |      PARTITION BY pmod(hash(spend, n_orders), 32)
        |      ORDER BY spend DESC, n_orders DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |    FROM pairs) t
        |  WHERE pm IS NULL OR pm < n_orders),
        |sky AS (
        |  SELECT spend, n_orders, n_custs FROM (
        |    SELECT *, max(n_orders) OVER (
        |      ORDER BY spend DESC, n_orders DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |    FROM local) t
        |  WHERE pm IS NULL OR pm < n_orders)
        |SELECT CAST(spend AS DOUBLE) AS total_spend, n_orders, n_custs
        |FROM sky ORDER BY total_spend DESC""".stripMargin,
      Relational.skyline(spark, sf001))
  }

  test("attribution as pure SQL (IGNORE NULLS carry) matches the operator") {
    Graft.registerViews(spark, sf001)
    same(
      """WITH ev AS (
        |  SELECT user_id, ts_us, event_id,
        |    event_type = 'purchase' AS is_conv, event_type, value
        |  FROM events
        |  WHERE event_type IN ('view', 'click', 'signup', 'purchase')),
        |tagged AS (
        |  SELECT *,
        |    last(CASE WHEN is_conv
        |        THEN named_struct('cts', ts_us, 'cid', event_id, 'cval', value) END)
        |      IGNORE NULLS
        |      OVER (PARTITION BY user_id ORDER BY ts_us DESC, event_id DESC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS nc
        |  FROM ev),
        |credited AS (
        |  SELECT nc.cid AS conv_id, nc.cval AS conv_value,
        |    ts_us, event_id, event_type AS touch_type
        |  FROM tagged
        |  WHERE NOT is_conv AND nc IS NOT NULL
        |    AND nc.cts - ts_us <= 86400000000),
        |marked AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY conv_id ORDER BY ts_us, event_id) AS rf,
        |    row_number() OVER (PARTITION BY conv_id ORDER BY ts_us DESC, event_id DESC) AS rl
        |  FROM credited),
        |f AS (
        |  SELECT touch_type, count(*) AS first_credits,
        |    CAST(sum(CAST(conv_value AS DECIMAL(18,2))) AS DOUBLE) AS first_gmv
        |  FROM marked WHERE rf = 1 GROUP BY touch_type),
        |l AS (
        |  SELECT touch_type, count(*) AS last_credits,
        |    CAST(sum(CAST(conv_value AS DECIMAL(18,2))) AS DOUBLE) AS last_gmv
        |  FROM marked WHERE rl = 1 GROUP BY touch_type)
        |SELECT coalesce(f.touch_type, l.touch_type) AS touch_type,
        |  coalesce(first_credits, 0L) AS first_credits,
        |  coalesce(last_credits, 0L) AS last_credits,
        |  coalesce(first_gmv, CAST(0.0 AS DOUBLE)) AS first_gmv,
        |  coalesce(last_gmv, CAST(0.0 AS DOUBLE)) AS last_gmv
        |FROM f FULL OUTER JOIN l ON f.touch_type = l.touch_type
        |ORDER BY touch_type""".stripMargin,
      graft.operators.EventAnalytics.attribution(spark, sf001))
  }

  test("hash split as pure SQL (md5 + integer fold) matches the operator") {
    Graft.registerViews(spark, sf001)
    same(
      """WITH base AS (
        |  SELECT doc_id,
        |    md5(lower(trim(regexp_replace(text, '\\s+', ' ')))) AS fp
        |  FROM documents),
        |hashed AS (
        |  SELECT doc_id, fp,
        |    CAST(aggregate(
        |      transform(sequence(1, length(fp)),
        |        i -> CAST(ascii(substring(fp, i, 1)) AS BIGINT)),
        |      0L, (a, x) -> (a * 31L + x) % 1048573L) % 100L AS INT) AS bucket
        |  FROM base)
        |SELECT doc_id, fp, bucket,
        |  CASE WHEN bucket < 80 THEN 'train'
        |       WHEN bucket < 90 THEN 'validation'
        |       ELSE 'test' END AS split
        |FROM hashed ORDER BY doc_id""".stripMargin,
      graft.operators.TextOps.hashSplit(spark, sf001))
  }

  test("gmv anomaly as pure SQL (WINDOW clause + decimal sums) matches the operator") {
    Graft.registerViews(spark, sf001)
    val varD = """greatest((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                 |  / CAST(cnt AS DOUBLE)) / (CAST(cnt AS DOUBLE) - 1), 0D)""".stripMargin
    same(
      s"""WITH daily AS (
         |  SELECT to_date(o_orderdate) AS day,
         |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS g
         |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1),
         |win AS (
         |  SELECT day, g,
         |    count(*) OVER w AS cnt, sum(g) OVER w AS s1, sum(g * g) OVER w AS s2
         |  FROM daily
         |  WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
         |z AS (
         |  SELECT day, CAST(g AS DOUBLE) AS gmv,
         |    CASE WHEN cnt = 7 AND sqrt($varD) > 0
         |      THEN round((CAST(g AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(cnt AS DOUBLE))
         |                   / sqrt($varD), 6)
         |    END AS z
         |  FROM win)
         |SELECT date_format(day, 'yyyy-MM-dd') AS day, gmv, z,
         |  coalesce(CAST(abs(z) > 2 AS INT), 0) AS is_anomaly
         |FROM z ORDER BY day""".stripMargin,
      graft.operators.Ads.gmvAnomaly(spark, sf001))
  }

  test("median/MAD as pure SQL (window CDF walk) matches the operator") {
    Graft.registerViews(spark, sf001)
    same(
      """WITH c AS (
        |  SELECT n_name,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey),
        |m AS (
        |  SELECT n_name, percentile(cents, 0.5) AS medc FROM c GROUP BY n_name),
        |dev AS (
        |  SELECT c.n_name,
        |    abs(2 * cents - CAST(2 * medc AS BIGINT)) AS dev2
        |  FROM c JOIN m USING (n_name)),
        |md AS (
        |  SELECT n_name, percentile(dev2, 0.5) AS mad2 FROM dev GROUP BY n_name)
        |SELECT m.n_name, medc / 100.0 AS median_price, mad2 / 200.0 AS mad_price
        |FROM m JOIN md USING (n_name)
        |ORDER BY m.n_name""".stripMargin,
      graft.operators.Relational.medianMad(spark, sf001))
  }

  test("streak islands as pure SQL matches the operator") {
    Graft.registerViews(spark, sf001)
    same(
      """WITH days AS (
        |  SELECT DISTINCT user_id, datediff(to_date(ts), DATE '1970-01-01') AS dayn
        |  FROM events),
        |g AS (
        |  SELECT user_id, dayn,
        |    dayn - row_number() OVER (PARTITION BY user_id ORDER BY dayn) AS grp
        |  FROM days),
        |st AS (
        |  SELECT user_id, grp, count(*) AS len FROM g GROUP BY user_id, grp)
        |SELECT user_id, max(len) AS longest_streak, count(*) AS n_streaks,
        |  sum(len) AS active_days
        |FROM st GROUP BY user_id ORDER BY user_id""".stripMargin,
      graft.operators.EventAnalytics.streaks(spark, sf001))
  }

  test("bitmap distinct rollup as pure SQL (native functions) matches the operator") {
    Graft.registerViews(spark, sf001)
    Graft.registerFunctions(spark)
    same(
      """SELECT n_name, graft_bitmap_union_card(bm) AS active_custs,
        |  count(*) AS months
        |FROM (
        |  SELECT n_name, date_format(o_orderdate, 'yyyy-MM') AS month,
        |    graft_bitmap_agg(o_custkey) AS bm
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name, month)
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
      graft.operators.Sketches.bitmapDistinct(spark, sf001))
  }

  test("custdist (Q13 outer-join count-of-counts) as pure SQL matches the operator") {
    Graft.registerViews(spark, sf001)
    same(
      """SELECT c_count, count(*) AS custdist
        |FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) c_orders
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
      graft.operators.Relational.custDist(spark, sf001))
  }

  test("reach curve (first-appearance running sum) as pure SQL matches the operator") {
    Graft.registerViews(spark, sf001)
    // events_norm: the SQL user reads raw events; normalize ts like
    // Tables.events (micros timestamp regardless of physical encoding)
    graft.Tables.events(spark, sf001).createOrReplaceTempView("events_norm")
    same(
      """WITH firsts AS (
        |  SELECT user_id, min(to_date(ts)) AS day
        |  FROM events_norm WHERE user_id IS NOT NULL GROUP BY user_id),
        |per_day AS (
        |  SELECT day, count(*) AS new_users FROM firsts GROUP BY day)
        |SELECT date_format(day, 'yyyy-MM-dd') AS day, new_users,
        |  CAST(sum(new_users) OVER (ORDER BY day) AS BIGINT) AS cum_users
        |FROM per_day ORDER BY day""".stripMargin,
      graft.operators.Ads.reachCurve(spark, sf001))
  }

  test("JL projection via graft_dot literal rows as pure SQL matches the operator") {
    Graft.registerViews(spark, sf001)
    Graft.registerFunctions(spark)
    val signs = graft.operators.Similarity.rpSigns(64, 16)
    val arr = signs.indices.map { j =>
      s"graft_dot(qx, array(${signs(j).map(v => s"CAST($v AS DOUBLE)").mkString(", ")}))"
    }.mkString("array(", ", ", ")")
    same(
      s"""SELECT vec_id, CAST(j AS BIGINT) AS j, p / 1000000.0 AS val
         |FROM (
         |  SELECT vec_id,
         |    transform(CAST(embedding AS ARRAY<DOUBLE>), x -> round(x * 1000000.0, 0)) AS qx
         |  FROM embeddings)
         |LATERAL VIEW posexplode($arr) t AS j, p
         |ORDER BY vec_id, j""".stripMargin,
      graft.operators.Similarity.embRpProject(spark, sf001))
  }
}
