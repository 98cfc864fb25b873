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

  // the AQE-stage-recursing metric walk lives in
  // graft.sources.ScanMetrics, SHARED with the FileSourcesSpec gate
  // test so the per-commit pruning check and this benchmark agree
  private def filesRead(df: org.apache.spark.sql.DataFrame): (Long, Long) =
    graft.sources.ScanMetrics.filesRead(df)

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
      val parts = Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("dt="))
      (parts.length.toLong,
        parts.map(d => Option(d.listFiles()).getOrElse(Array.empty)
          .count(_.getName.endsWith(".parquet")).toLong).sum)
    }
    val (evParts, evFiles) = countFiles(eventsPath)
    val (orParts, orFiles) = countFiles(ordersPath)
    require(evParts > 0 && orParts > 0,
      s"dt layout write produced no dt= partitions under $base")

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
    // stage the fragmented rewrite OUTSIDE the partitioned root: a tmp
    // dir inside it would register as a bogus 'dt=<day>.tmp' partition
    // (with duplicated rows) for any reader that lands between the
    // write and the rename, or forever if this run dies there
    val dayDir = s"$eventsPath/dt=$evDay"
    val stageDir = s"$base/tmp/frag_dt=$evDay"
    val frag = spark.read.parquet(dayDir)
    val rowsBefore = frag.count()
    frag.repartition(64).write.mode("overwrite")
      .option("maxRecordsPerFile", 50).parquet(stageDir)
    val rm = new scala.reflect.io.Directory(new java.io.File(dayDir)).deleteRecursively()
    require(rm, s"could not clear $dayDir")
    require(new java.io.File(stageDir).renameTo(new java.io.File(dayDir)))
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

    // ---- the FACT table (r12 verdict-7): lineitem, date-partitioned
    // + Z-ordered, DPP-pruned through a dim join -------------------
    // dt grain is MONTH at sf0.1 so each partition still holds ~16
    // z-clustered files (day grain at this SF is ~240 rows/dir — one
    // file, nothing left for the in-partition skip layer to prune; at
    // real scale day-grain dirs hold hundreds of 5M-row files and the
    // mechanics are identical — the grain is a layout config)
    val liPath = s"$base/lineitem_dtz"
    val liLinPath = s"$base/lineitem_dtlin"
    val li = graft.Tables.lineitem(spark, sfDir)
    val month = date_format(col("l_shipdate"), "yyyy-MM")
    graft.sources.ZOrder.clusterWriteDatePartitioned(
      li, liPath, month, Seq("l_partkey", "l_suppkey"),
      nTasks = 1328, maxRecordsPerFile = 20000L)
    // linear control: same dt layout, classic single-column sort —
    // isolates what the SECOND clustered axis buys
    li.withColumn("dt", month)
      .repartitionByRange(1328, col("dt"), col("l_partkey"))
      .sortWithinPartitions(col("dt"), col("l_partkey"))
      .write.mode("overwrite").option("maxRecordsPerFile", 20000L)
      .partitionBy("dt").parquet(liLinPath)
    val (liParts, liFiles) = countFiles(liPath)
    val fact = spark.read.parquet(liPath)
    val factLin = spark.read.parquet(liLinPath)

    // calendar dim (file-backed: a LocalRelation folds the filter and
    // DPP sees no selective predicate — the FileSourcesSpec lesson),
    // quarter attribute, filter ONE quarter → the fact's dt partitions
    // prune AT RUNTIME from the dim's filter result
    val dimPath = s"$base/calendar_dim"
    fact.select(col("dt").cast("string").as("cal_month")).distinct()
      .withColumn("quarter",
        concat(substring(col("cal_month"), 1, 4), lit("-Q"),
          (((substring(col("cal_month"), 6, 2).cast("int") - 1) .divide(lit(3))).cast("int") + 1).cast("string")))
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val q = dim.select(col("quarter")).distinct().orderBy(col("quarter"))
      .collect().map(_.getString(0))
    val targetQ = q(q.length / 2)

    // one selective-quarter revenue-by-month query, three layouts; at
    // toy file counts the DPP benefit heuristic needs the same pins
    // FileSourcesSpec documents
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", "100")
    // "yyyy-MM" is not parseable as a DATE, so the dt partition column
    // reads back as STRING — the join key needs no cast (a cast on the
    // partition column can defeat DPP, the FileSourcesSpec lesson)
    def dppQuery(f: org.apache.spark.sql.DataFrame) = f
      .join(dim.filter(col("quarter") === targetQ),
        f("dt") === col("cal_month"))
      .filter(col("l_partkey").between(1000, 1400) &&
        col("l_suppkey").between(100, 120))
      .groupBy(col("cal_month"))
      .agg(graft.operators.Agg.moneySum(col("l_extendedprice")).as("revenue"),
        count(lit(1)).as("n"))
    def flatQuery = {
      val f = graft.Tables.lineitem(spark, sfDir)
        .withColumn("dt", date_format(col("l_shipdate"), "yyyy-MM"))
      dppQuery(f)
    }

    def rowsScanned(df: org.apache.spark.sql.DataFrame): Long =
      graft.sources.ScanMetrics.rowsScanned(df)
    def measure(build: => org.apache.spark.sql.DataFrame): (Double, Long, Long, Long) = {
      val runs = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val df = build
        val t0 = System.nanoTime()
        df.collect()
        ((System.nanoTime() - t0) / 1e9, filesRead(df), rowsScanned(df))
      }
      val med = runs.sortBy(_._1).apply(1)
      (med._1, med._2._1, med._2._2, med._3)
    }
    val (zSec, zFiles, zBytes, zRows) = measure(dppQuery(fact))
    val (linSec, linFiles, _, linRows) = measure(dppQuery(factLin))
    val (flatSec, flatFiles, flatBytes, flatRows) = measure(flatQuery)
    val dppPlan = dppQuery(fact)
    dppPlan.collect()
    val hasDpp = graft.sources.ScanMetrics
      .allScans(dppPlan.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }).map(_.toString).mkString.contains("dynamicpruning")

    println(s"[dtbench] lineitem fact: $liParts dt(month)-partitions, $liFiles files; " +
      s"quarter $targetQ DPP join + (partkey,suppkey) predicate:")
    println(f"[dtbench]   dt+zorder : files_read=$zFiles bytes=$zBytes rows_scanned=$zRows median=$zSec%.2f s dpp=$hasDpp")
    println(f"[dtbench]   dt+linear : files_read=$linFiles rows_scanned=$linRows median=$linSec%.2f s")
    println(f"[dtbench]   flat      : files_read=$flatFiles bytes=$flatBytes rows_scanned=$flatRows median=$flatSec%.2f s")
    spark.stop()
  }
}
