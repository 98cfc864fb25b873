package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable-sketch pre-aggregation — how a 100 TB warehouse serves
  * COUNT DISTINCT rollups without rescanning raw data: sketch each
  * fine-grained partition once (here: order month), persist the
  * sketches as a tiny pre-agg table, and answer ANY coarser rollup
  * (year, all-time, ad-hoc month ranges) by merging sketches. The
  * reference's ClickHouse tables store raw rows and re-aggregate per
  * query (ProductStatsMapper re-sums on every request); at scale the
  * sketch table is smaller than one partition of the raw data.
  *
  * Spark's Datasketches HLL surface keeps every step distributed and
  * mergeable: `hll_sketch_agg` (partial-aggregable per month),
  * `hll_union_agg` (re-aggregable upward), `hll_sketch_estimate`.
  * Register maxima are order-independent, so estimates are
  * deterministic under any partitioning.
  */
object Sketches {

  /** Monthly distinct-customer sketches rolled up to years by sketch
    * UNION — the raw orders table is scanned exactly once; the rollup
    * aggregates kilobyte sketches, not data. Raw estimates are
    * engine-specific (spec-bounded, merge ≡ direct); the REGISTERED
    * [[hllPreAgg]] folds them into a 3%-band witness. */
  private[graft] def hllPreAggRaw(s: SparkSession, d: String): DataFrame = {
    val monthly = Tables.orders(s, d)
      .groupBy(date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM").as("month"))
      .agg(hll_sketch_agg(col("o_custkey"), lit(14)).as("sk"))
    monthly
      .groupBy(substring(col("month"), 1, 4).as("year"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(true))).as("approx_custs"),
        count(lit(1)).as("months"))
      .orderBy(col("year"))
  }

  /** Sketch-union guarantee WITNESS (the q_countmin precedent): the
    * yearly union estimates join the exact per-year distincts (a
    * second, witness-only pass — at 100 TB you would persist only the
    * sketch table and drop this column); `hll_ok` = |est − exact| ≤
    * 3%·exact (≈3.7σ at lgK=14's 0.81% rsd — deterministic: register
    * maxima are order-free). The raw estimate stays spec-asserted on
    * [[hllPreAggRaw]]; the emitted card is engine-portable, so a merge
    * or seed regression flips the flag and fails the hash compare. */
  def hllPreAgg(s: SparkSession, d: String): DataFrame =
    hllPreAggRaw(s, d)
      .join(exactByYear(s, d), "year")
      .select(col("year"), col("months"), col("exact_custs"),
        when(abs(col("approx_custs") - col("exact_custs")) * 100L <=
          col("exact_custs") * 3L, 1).otherwise(0).as("hll_ok"))
      .orderBy(col("year"))

  /** Oracle for [[hllPreAgg]]: exact per-year distinct customers and
    * month counts, with the sketch error-band flag pinned TRUE. */
  val hllPreAggSql: String =
    """SELECT strftime(o_orderdate, '%Y') AS year,
      |  CAST(count(DISTINCT strftime(o_orderdate, '%Y-%m')) AS BIGINT) AS months,
      |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_custs,
      |  1 AS hll_ok
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** The witness the spec compares against: exact per-year distinct
    * customers from the raw table. */
  def exactByYear(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(date_format(col("o_orderdate"), "yyyy").as("year"))
      .agg(countDistinct(col("o_custkey")).as("exact_custs"))
      .orderBy(col("year"))

  /** Count–min sketch point-frequency service (Cormode & Muthukrishnan
    * J.Alg'05) — the third leg of the mergeable-frequency family next
    * to MG top-k (which items are frequent) and HLL (how many distinct):
    * "how often does THIS term occur" answered from a fixed
    * depth×width counter grid, never from raw data. The sketch is
    * built distributed (`count_min_sketch` is a partial-aggregable
    * Catalyst aggregate; merges are counter-matrix adds, so the result
    * is partitioning-independent for a fixed seed); only the
    * kilobyte-sized grid reaches the driver — the same bounded-state
    * contract as the HLL ops. Probes are the exact top-`probes` terms,
    * computed from the same single term scan (the exact counts ride
    * along as the in-query witness; the spec asserts the CMS
    * guarantee exact ≤ est ≤ exact + ε·N).
    */
  def countMin(s: SparkSession, d: String, probes: Int = 20,
      eps: Double = 0.0001, confidence: Double = 0.99): DataFrame = {
    import org.apache.spark.util.sketch.CountMinSketch
    val terms = Tables.documents(s, d)
      .select(explode(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))).as("term"))
    val skRow = terms
      .agg(count_min_sketch(col("term"), lit(eps), lit(confidence), lit(42)).as("sk"),
        count(lit(1)).as("n"))
      .head()
    val cms = CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(skRow.getAs[Array[Byte]]("sk")))
    val slack = math.ceil(eps * skRow.getAs[Long]("n")).toLong
    // bounded driver step (same contract as the IVF centroid pull):
    // exactly `probes` (term, count) rows leave the cluster; the grid
    // is probed driver-side so no UDF enters any distributed plan.
    // `cms_ok` folds the probe's CMS guarantee (exact ≤ est ≤
    // exact + ⌈ε·N⌉) into a DETERMINISTIC witness column, which makes
    // the whole output oracle-comparable: DuckDB reproduces term +
    // exact_ct and asserts the guarantee held (a regression in the
    // sketch — wrong merge, wrong seed plumbing — flips cms_ok and
    // fails the driver hash compare loudly). The raw estimate itself
    // stays engine-specific and is spec-asserted, not emitted.
    val top = terms.groupBy(col("term")).agg(count(lit(1)).as("exact_ct"))
      .orderBy(col("exact_ct").desc, col("term")).limit(probes)
      .collect()
    val rows = top.map { r =>
      val est = cms.estimateCount(r.getString(0))
      (r.getString(0), r.getLong(1),
        if (est >= r.getLong(1) && est <= r.getLong(1) + slack) 1 else 0)
    }
    s.createDataFrame(rows.toSeq).toDF("term", "exact_ct", "cms_ok")
      .orderBy(col("exact_ct").desc, col("term"))
  }

  /** Oracle for [[countMin]]: the exact top-20 term counts, with the
    * CMS guarantee column pinned TRUE — see the operator doc. */
  val countMinSql: String =
    """WITH t AS (
      |  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      |  FROM documents)
      |SELECT term, CAST(count(*) AS BIGINT) AS exact_ct, 1 AS cms_ok
      |FROM t GROUP BY term
      |ORDER BY exact_ct DESC, term
      |LIMIT 20""".stripMargin

  /** EXACT pre-aggregated COUNT DISTINCT serving via the native Roaring
    * bitmap aggregates ([[graft.functions.BitmapAgg]]) — `hllPreAgg`'s
    * exact twin and the direct analog of the reference's
    * `orderIdSet` window reduce (ProductStatsApp.java) / ClickHouse
    * `groupBitmap` serving tables: monthly per-nation bitmaps of
    * active customers, rolled up to nation level by bitmap OR. The raw
    * fact scan happens ONCE (fine-grained partials); the rollup
    * aggregates compressed bitmaps, not rows — and unlike the HLL path
    * the answer is exact, so this query IS oracle-comparable.
    *
    * Shuffle profile: orders⋈customer equi-join (customer pre-pruned to
    * two columns), broadcast nation, then ONE hash-agg whose partials
    * are compressed bitmaps (map-side OR combine) and one
    * kilobytes-per-group rollup. At 100 TB the monthly bitmap table is
    * the thing you'd persist; every coarser rollup reads it alone. */
  def bitmapDistinct(s: SparkSession, d: String): DataFrame = {
    graft.Graft.registerFunctions(s)
    val cust = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
    val monthly = Tables.orders(s, d)
      .select(col("o_custkey"), date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("month"))
      .agg(call_function("graft_bitmap_agg", col("o_custkey")).as("bm"))
    monthly
      .groupBy(col("n_name"))
      .agg(call_function("graft_bitmap_union_card", col("bm")).as("active_custs"),
        count(lit(1)).as("months"))
      .orderBy(col("n_name"))
  }

  val bitmapDistinctSql: String =
    """WITH m AS (
      |  SELECT n_name, strftime(o_orderdate, '%Y-%m') AS month, o_custkey
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey)
      |SELECT n_name,
      |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS active_custs,
      |  CAST(count(DISTINCT month) AS BIGINT) AS months
      |FROM m GROUP BY n_name ORDER BY n_name""".stripMargin

  /** EXACT distinct-set INTERSECTION via bitmap AND — the set-algebra
    * question ("customers active in BOTH 1995 and 1996, per nation")
    * that cardinality-only sketches cannot answer and that the naive
    * SQL form pays a per-(customer, year) dedup + HAVING for. Each
    * (nation, year) side becomes one compressed bitmap; the AND runs
    * on two kilobyte operands per nation. The `yrs = 2` guard makes
    * the intersection well-defined when a nation lacks a year
    * entirely (AND's identity is the universe, not ∅), and the
    * `both_ct > 0` filter matches the oracle's row existence rule. */
  def bitmapIntersect(s: SparkSession, d: String): DataFrame = {
    graft.Graft.registerFunctions(s)
    val cust = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
    val yearly = Tables.orders(s, d)
      .withColumn("yr", year(col("o_orderdate")))
      .filter(col("yr").isin(1995, 1996))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("yr"))
      .agg(call_function("graft_bitmap_agg", col("o_custkey")).as("bm"))
    yearly
      .groupBy(col("n_name"))
      .agg(call_function("graft_bitmap_and_card", col("bm")).as("both_years"),
        count(lit(1)).as("yrs"))
      .filter(col("yrs") === 2 && col("both_years") > 0)
      .select(col("n_name"), col("both_years"))
      .orderBy(col("n_name"))
  }

  val bitmapIntersectSql: String =
    """SELECT n_name, CAST(count(*) AS BIGINT) AS both_years FROM (
      |  SELECT n_name, o_custkey
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  WHERE year(o_orderdate) IN (1995, 1996)
      |  GROUP BY n_name, o_custkey
      |  HAVING count(DISTINCT year(o_orderdate)) = 2) t
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** APPROXIMATE distinct-set intersection via native Theta sketches
    * ([[graft.functions.ThetaSketchAgg]]) — `q_bitmap_intersect`'s
    * fixed-memory twin, completing the set-algebra spectrum: bitmap =
    * exact / state grows with the set; theta = O(k) state at ANY
    * cardinality, still unions AND intersects (HLL can do neither
    * intersection nor bounded-state exactness). The overlap metric is
    * user-DAYS with both a view and a purchase: each side sketches the
    * composite (user, day) id, the intersection estimates co-occurrence
    * — a quantity strictly smaller than either side, so the estimate is
    * non-trivial. The exact answer rides the same scan as the in-query
    * witness (the spec bounds |est − exact|; at 100 TB you would drop
    * the witness and keep only the kilobyte sketches).
    *
    * Theta estimates are partitioning-independent (a sketch retains
    * the k smallest hashes of the SET — insertion order never matters)
    * but not SQL-expressible, so the raw estimate is spec-asserted
    * here and the REGISTERED [[thetaIntersect]] folds it into the
    * q_countmin-style witness card. */
  private[graft] def thetaIntersectRaw(s: SparkSession, d: String): DataFrame = {
    graft.Graft.registerFunctions(s)
    val ev = Tables.events(s, d)
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("event_type"),
        (col("user_id") * 100000L + expr("ts_us div 86400000000")).as("ud"))
    val sketches = ev.groupBy(col("event_type"))
      .agg(call_function("graft_theta_agg", col("ud")).as("sk"))
    val est = sketches.agg(
      call_function("graft_theta_intersect_card", col("sk")).as("est_overlap"),
      count(lit(1)).as("n_sides"))
    val exact = ev.distinct()
      .groupBy(col("ud")).agg(count(lit(1)).as("types"))
      .filter(col("types") === 2)
      .agg(count(lit(1)).as("exact_overlap"))
    est.crossJoin(exact)
      .select(round(col("est_overlap"), 2).as("est_overlap"),
        col("exact_overlap"), col("n_sides"))
  }

  /** Theta-intersection guarantee WITNESS (the q_countmin precedent):
    * the exact overlap rides the same scan; `theta_ok` = |est − exact|
    * ≤ max(5%·exact, 1 absolute) — the spec's band, deterministic
    * because the retained-hash set is insertion-order-free. The raw
    * estimate stays spec-asserted on [[thetaIntersectRaw]]; a merge or
    * seed regression flips the flag and fails the hash compare. */
  def thetaIntersect(s: SparkSession, d: String): DataFrame =
    thetaIntersectRaw(s, d)
      .select(col("exact_overlap"), col("n_sides"),
        when(abs(col("est_overlap") - col("exact_overlap").cast("double")) * 20.0 <=
          greatest(col("exact_overlap"), lit(20L)).cast("double"), 1)
          .otherwise(0).as("theta_ok"))

  /** Oracle for [[thetaIntersect]]: the exact (user, day) overlap with
    * the sketch error-band flag pinned TRUE. */
  val thetaIntersectSql: String =
    """WITH ev AS (
      |  SELECT DISTINCT event_type,
      |    user_id * 100000 + (epoch_us(ts) // 86400000000) AS ud
      |  FROM events WHERE event_type IN ('view', 'purchase')),
      |overlap AS (
      |  SELECT CAST(count(*) AS BIGINT) AS exact_overlap FROM (
      |    SELECT ud FROM ev GROUP BY ud HAVING count(*) = 2) t),
      |sides AS (SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS n_sides FROM ev)
      |SELECT exact_overlap, n_sides, 1 AS theta_ok FROM overlap, sides""".stripMargin
}
