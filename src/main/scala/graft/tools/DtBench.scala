package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Exercises the 100 TB date-partitioned layout in the bench loop
  * (SURVEY §4): materializes `events` / `orders` through
  * `FileSources.writeDatePartitioned`, then runs the date-bounded
  * shapes of the visitor-stats / GMV families as ONE-DAY queries over
  * the partitioned root and reports the scan's actual numFiles metric
  * against the directory total — the partition-pruning claim measured,
  * not asserted. Protocol matches BenchOne (same tuned session, same
  * forced-evaluation sink, cold-cache median of 3).
  *
  * `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.DtBench"` */
object DtBench {

  /** numFiles metric summed over every parquet scan in the EXECUTED
    * plan (post-AQE), i.e. files actually read after partition
    * pruning. AQE buries scans inside materialized QueryStageExec
    * subtrees, which `collect` does not descend into — recurse. */
  private def allScans(plan: org.apache.spark.sql.execution.SparkPlan)
    : Seq[FileSourceScanExec] =
    plan.collect { case f: FileSourceScanExec => f } ++
      // nested execution trees collect() won't enter: materialized AQE
      // stages AND nested adaptive plans (a cached-plan stage wraps its
      // own AdaptiveSparkPlanExec)
      plan.collect {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => q.plan
        case a: AdaptiveSparkPlanExec => a.executedPlan
      }.flatMap(allScans)

  private def filesRead(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
    val executed = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = executed.subqueries.flatMap(allScans) ++ allScans(executed)
    (scans.map(_.metrics("numFiles").value).sum,
      scans.map(_.metrics("filesSize").value).sum)
  }

  private def timed3(build: => org.apache.spark.sql.DataFrame)(
    spark: org.apache.spark.sql.SparkSession): (Double, Long, Long, Long) = {
    val runs = (1 to 3).map { _ =>
      spark.catalog.clearCache()
      val df = build
      val t0 = System.nanoTime()
      // collect() executes THIS df's QueryExecution (count() would plan
      // a different one and leave these metrics untouched)
      val n = df.collect().length.toLong
      ((System.nanoTime() - t0) / 1e9, filesRead(df), n)
    }
    // report the MEDIAN run's metrics with its time — AQE may plan
    // runs differently, so run 1's files_read need not describe the
    // run whose wall-clock is printed
    val med = runs.sortBy(_._1).apply(1)
    (med._1, med._2._1, med._2._2, med._3)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val base = sys.env.getOrElse("SPARK_GRAFT_DT_DIR", "/tmp/graft_dt")
    val spark = graft.Bench.benchSession(cpus)

    // materialize the 100 TB layout: one dt=yyyy-MM-dd dir per day,
    // small maxRecordsPerFile so sf0.1 still yields multiple files per
    // partition (at real scale the 5M default plays this role)
    val eventsPath = s"$base/events_dt"
    val ordersPath = s"$base/orders_dt"
    graft.sources.FileSources.writeDatePartitioned(
      graft.Tables.events(spark, sfDir).drop("ts_ns"), eventsPath, "ts", 20000L)
    graft.sources.FileSources.writeDatePartitioned(
      graft.Tables.orders(spark, sfDir), ordersPath, "o_orderdate", 20000L)

    def countFiles(path: String): (Long, Long) = {
      val root = new java.io.File(path)
      val parts = root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("dt="))
      (parts.length.toLong,
        parts.map(_.listFiles().count(_.getName.endsWith(".parquet")).toLong).sum)
    }
    val (evParts, evFiles) = countFiles(eventsPath)
    val (orParts, orFiles) = countFiles(ordersPath)

    // pick a middle day of each table
    val evDay = spark.read.parquet(eventsPath)
      .select(col("dt").cast("string")).distinct().orderBy(col("dt"))
      .collect().map(_.getString(0)).apply((evParts / 2).toInt)
    val orDay = spark.read.parquet(ordersPath)
      .select(col("dt").cast("string")).distinct().orderBy(col("dt"))
      .collect().map(_.getString(0)).apply((orParts / 2).toInt)

    // ads_gmv family, date-bounded: one day's GMV. Over the dt layout
    // the dt equality is a PARTITION filter — pruning happens at file
    // listing.
    def gmvDay = graft.sources.FileSources.readDateSlice(spark, ordersPath, orDay)
      .groupBy(col("dt"))
      .agg(sum(col("o_totalprice")).as("gmv"))
    // same day over the flat single-parquet layout: every file read
    def gmvDayFlat = graft.Tables.orders(spark, sfDir)
      .filter(date_format(col("o_orderdate"), "yyyy-MM-dd") === orDay)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("dt"))
      .agg(sum(col("o_totalprice")).as("gmv"))

    // dws_visitor_stats shape, date-bounded: one day's per-user session
    // stats (the window stays inside the day slice)
    def visitorDay = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      graft.sources.FileSources.readDateSlice(spark, eventsPath, evDay)
        .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
        .withColumn("sv", when(col("prev_us").isNull
          || col("ts_us") - col("prev_us") > 1800L * 1000000L, 1L).otherwise(0L))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("pv"), sum(col("sv")).as("sv"))
    }

    val (gmvSec, gmvFiles, gmvBytes, gmvRows) = timed3(gmvDay)(spark)
    val (gmvFlatSec, gmvFlatFiles, gmvFlatBytes, _) = timed3(gmvDayFlat)(spark)
    val (visSec, visFiles, visBytes, visRows) = timed3(visitorDay)(spark)

    // maintenance pass: fragment one events day into micro-batch-sized
    // files (the streaming-sink aftermath), compact it, and show the
    // one-day query is unchanged — the per-PARTITION compaction
    // contract of FileSources.compact on the dt layout
    val dayDir = s"$eventsPath/dt=$evDay"
    val frag = spark.read.parquet(dayDir)
    val rowsBefore = frag.count()
    frag.repartition(64).write.mode("overwrite")
      .option("maxRecordsPerFile", 50).parquet(dayDir + ".tmp")
    val rm = new scala.reflect.io.Directory(new java.io.File(dayDir)).deleteRecursively()
    require(rm, s"could not clear $dayDir")
    require(new java.io.File(dayDir + ".tmp").renameTo(new java.io.File(dayDir)))
    val t0 = System.nanoTime()
    val (fBefore, fAfter) = graft.sources.FileSources.compact(
      spark, dayDir, targetBytes = 4L * 1024 * 1024)
    val compactSec = (System.nanoTime() - t0) / 1e9
    val (visSec2, visFiles2, _, visRows2) = timed3(visitorDay)(spark)
    require(visRows2 == visRows && spark.read.parquet(dayDir).count() == rowsBefore,
      "compaction changed the day's rows")
    println(s"[dtbench] compaction: dt=$evDay fragmented to $fBefore files, " +
      f"compacted to $fAfter in $compactSec%.2f s; one-day visitor stats " +
      f"after: files_read=$visFiles2 median=$visSec2%.2f s (rows identical)")

    println(s"[dtbench] orders: $orParts dt-partitions, $orFiles files total; " +
      s"one-day gmv ($orDay): files_read=$gmvFiles bytes_read=$gmvBytes rows=$gmvRows " +
      f"median=$gmvSec%.2f s | flat layout: files_read=$gmvFlatFiles " +
      f"bytes_read=$gmvFlatBytes median=$gmvFlatSec%.2f s")
    println(s"[dtbench] events: $evParts dt-partitions, $evFiles files total; " +
      s"one-day visitor stats ($evDay): files_read=$visFiles bytes_read=$visBytes " +
      f"rows=$visRows median=$visSec%.2f s")
    spark.stop()
  }
}
