package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** `q_fact_dt_scan` — the 100 TB fact-table READ path as a registered
  * query (r12 verdict-6: the layout claim must ride the oracle +
  * budget machinery, not live only in the DtBench harness).
  *
  * The warehouse's biggest table lives date-partitioned (`dt=` month
  * dirs) and Z-order-clustered on (l_partkey, l_suppkey) within each
  * partition ([[graft.sources.ZOrder.clusterWriteDatePartitioned]]).
  * This query is the canonical serving shape over that layout: a
  * file-backed calendar dim filtered to ONE quarter joins the fact on
  * the partition column — dynamic partition pruning drops every
  * out-of-quarter `dt=` directory at runtime — and literal range
  * predicates on the two clustered columns let parquet footer stats
  * skip row groups inside the surviving directories. The two pruning
  * layers compose: r12 measured 52/1410 files and 2 245 of 600 083
  * rows touched at sf0.1 (267× less data).
  *
  * The layout itself is materialized ONCE per corpus dir under
  * `$SPARK_GRAFT_FACT_DT` (default /tmp/graft_fact_dt) and reused —
  * corpus dirs are immutable/versioned (the centroidCache contract);
  * in a real warehouse the fact table is ALREADY stored this way and
  * only the read path below ships. Every derived knob replays in the
  * DuckDB oracle from the flat table: the target quarter is the
  * middle element of the sorted distinct quarters, the clustered-
  * column windows are [max/2, max/2 + max/8] integer arithmetic on
  * two bounded scalars — literals in the plan, so they PUSH DOWN to
  * the parquet readers (a join-derived predicate would not).
  *
  * Reference mapping: the ClickHouse serving tables the reference's
  * publisher queries hit (gmall-publisher MysqlUtil/ClickHouse DDL,
  * order_wide partitioned by dt) play this role there; dt-partition +
  * in-partition ordering is that layout re-expressed for parquet. */
object FactLayout {

  /** (factPath, dimPath) per corpus dir, built at most once per JVM;
    * on disk a _SUCCESS marker makes reuse safe across JVMs. */
  private val layoutCache = new ConcurrentHashMap[String, (String, String)]()

  private def success(p: String): Boolean =
    new java.io.File(p, "_SUCCESS").exists()

  private[graft] def ensureLayout(s: SparkSession, d: String): (String, String) = {
    layoutCache.computeIfAbsent(d, _ => {
      val root = sys.env.getOrElse("SPARK_GRAFT_FACT_DT", "/tmp/graft_fact_dt")
      // the on-disk layout outlives the JVM, so unlike centroidCache
      // it cannot rely on the immutable-corpus-path convention alone:
      // a REGENERATED corpus at the same path with a stale layout
      // would silently serve old data to the oracle compare. Bind the
      // layout dir to the source file's (length, mtime) fingerprint —
      // regeneration changes it and forces a rewrite.
      val src = new java.io.File(s"$d/lineitem.parquet")
      val fp = s"${src.length()}_${src.lastModified()}"
      val tag = d.replaceAll("[^A-Za-z0-9.]+", "_").replaceAll("^_+", "") + s"_$fp"
      val factPath = s"$root/$tag/lineitem_dtz"
      val dimPath = s"$root/$tag/calendar_dim"
      if (!(success(factPath) && success(dimPath))) {
        val li = Tables.lineitem(s, d)
        val month = date_format(col("l_shipdate"), "yyyy-MM")
        // task granularity scales with the corpus (~450 rows/task at
        // gate SFs keeps multiple z-clustered files per month dir, the
        // DtBench calibration; at real scale maxRecordsPerFile rules)
        val n = li.count()
        val nTasks = math.max(8L, math.min(4096L, n / 450L)).toInt
        graft.sources.ZOrder.clusterWriteDatePartitioned(
          li, factPath, month, Seq("l_partkey", "l_suppkey"),
          nTasks = nTasks, maxRecordsPerFile = 20000L)
        // calendar dim with the quarter attribute, FILE-backed: a
        // LocalRelation would fold the quarter filter and DPP would
        // see no selective predicate (the FileSourcesSpec lesson)
        s.read.parquet(factPath)
          .select(col("dt").cast("string").as("cal_month")).distinct()
          .withColumn("quarter",
            concat(substring(col("cal_month"), 1, 4), lit("-Q"),
              (((substring(col("cal_month"), 6, 2).cast("int") - 1)
                .divide(lit(3))).cast("int") + 1).cast("string")))
          .write.mode("overwrite").parquet(dimPath)
      }
      (factPath, dimPath)
    })
  }

  /** One selective-quarter revenue-by-month scan over the clustered
    * layout. Output (cal_month, revenue, n) is layout-independent —
    * the DuckDB oracle computes it from the flat table. */
  def quarterScan(s: SparkSession, d: String): DataFrame = {
    val (factPath, dimPath) = ensureLayout(s, d)
    // DPP benefit-heuristic pins for toy file counts (FileSourcesSpec
    // lesson). Session-wide, but scoped in effect: this is the only
    // registered query reading a PARTITIONED file source, so no other
    // registered plan can see a DPP decision change. They CANNOT be
    // save/restored around plan construction: DPP insertion happens at
    // physical planning, i.e. lazily at first action, after this
    // method returns — restoring early would silently drop the
    // pruning. Constraint recorded in the CLAUDE.md new-operator
    // checklist: any future partitioned-source registered query must
    // re-evaluate these two toy-corpus heuristics (r13 advice).
    s.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    s.conf.set("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", "100")
    val fact = s.read.parquet(factPath)
    val dim = s.read.parquet(dimPath)
    // middle quarter of the corpus (bounded collect: ≤ a few dozen
    // quarter strings); 0-based index len/2 = the oracle's rn = cnt//2+1.
    // Null quarters (a null l_shipdate lands in the default partition)
    // are dropped on BOTH sides — Spark's orderBy sorts nulls first
    // while the oracle's row_number sorts them last, so one null month
    // would silently shift the middle pick (r13 advice; latent — the
    // corpora have no null shipdates, and the oracle's mon CTE now
    // carries the matching IS NOT NULL).
    val quarters = dim.select(col("quarter")).distinct()
      .filter(col("quarter").isNotNull).orderBy(col("quarter"))
      .collect().map(_.getString(0))
    val targetQ = quarters(quarters.length / 2)
    // clustered-column windows from two bounded scalars — literals,
    // so they reach the parquet footers as pushed filters
    val mx = Tables.lineitem(s, d)
      .agg(max(col("l_partkey")).as("mp"), max(col("l_suppkey")).as("ms")).head()
    val (mp, ms) = (mx.getLong(0), mx.getLong(1))
    fact
      .join(dim.filter(col("quarter") === targetQ),
        fact("dt") === dim("cal_month"))
      .filter(col("l_partkey").between(mp / 2, mp / 2 + mp / 8) &&
        col("l_suppkey").between(ms / 2, ms / 2 + ms / 8))
      .groupBy(dim("cal_month"))
      .agg(Agg.moneySum(col("l_extendedprice")).as("revenue"),
        count(lit(1)).as("n"))
      .orderBy(col("cal_month"))
  }

  /** DuckDB oracle on the FLAT lineitem table: same middle-quarter
    * pick (rn = cnt//2 + 1 over sorted distinct quarters = the Scala
    * 0-based len/2 index), same integer-division windows, same exact
    * decimal money sum. */
  val quarterScanSql: String =
    s"""WITH pk AS (
       |  SELECT max(l_partkey) AS mp, max(l_suppkey) AS ms FROM lineitem),
       |mon AS (
       |  SELECT DISTINCT strftime(l_shipdate, '%Y-%m') AS cal_month
       |  FROM lineitem WHERE l_shipdate IS NOT NULL),
       |qt AS (
       |  SELECT cal_month,
       |    substr(cal_month, 1, 4) || '-Q' ||
       |    CAST(((CAST(substr(cal_month, 6, 2) AS INT) - 1) // 3) + 1 AS VARCHAR)
       |      AS quarter
       |  FROM mon),
       |tq AS (
       |  SELECT quarter FROM (
       |    SELECT quarter, row_number() OVER (ORDER BY quarter) AS rn,
       |           count(*) OVER () AS cnt
       |    FROM (SELECT DISTINCT quarter FROM qt))
       |  WHERE rn = cnt // 2 + 1)
       |SELECT q.cal_month,
       |  ${Agg.sqlMoneySum("l.l_extendedprice")} AS revenue,
       |  count(*) AS n
       |FROM lineitem l
       |JOIN qt q ON strftime(l.l_shipdate, '%Y-%m') = q.cal_month
       |JOIN tq ON q.quarter = tq.quarter
       |CROSS JOIN pk
       |WHERE l.l_partkey BETWEEN pk.mp // 2 AND pk.mp // 2 + pk.mp // 8
       |  AND l.l_suppkey BETWEEN pk.ms // 2 AND pk.ms // 2 + pk.ms // 8
       |GROUP BY 1 ORDER BY 1""".stripMargin
}
