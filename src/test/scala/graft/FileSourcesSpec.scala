package graft

import java.nio.file.Files

import graft.sources.FileSources
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructType, StringType, LongType}

/** Source/sink surface: dirty-record JSON ingestion (side-output
  * analog), schema'd CSV, partitioned parquet sink round-trip. */
class FileSourcesSpec extends SparkSpec {

  private val evtSchema = new StructType()
    .add("event_id", LongType).add("event_type", StringType)

  test("jsonLines captures corrupt records instead of failing (dirty side-output)") {
    val dir = Files.createTempDirectory("graft-json").toFile
    val f = new java.io.File(dir, "in.json")
    Files.writeString(f.toPath,
      """{"event_id": 1, "event_type": "view"}
        |this is not json at all
        |{"event_id": 2, "event_type": "click"}
        |""".stripMargin)
    val (clean, dirty) = FileSources.splitDirty(
      FileSources.jsonLines(spark, f.getAbsolutePath, evtSchema))
    assert(clean.select("event_id").collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
    assert(dirty.collect().map(_.getString(0)).toSeq === Seq("this is not json at all"))
  }

  test("partitioned parquet sink round-trips with partition pruning") {
    val out = Files.createTempDirectory("graft-sink").toFile.getAbsolutePath
    val df = Tables.events(spark, sf0001)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .select("event_id", "user_id", "event_type", "day")
    FileSources.writePartitioned(df, out, Seq("day"))
    val back = spark.read.parquet(out)
    assert(back.count() === df.count())
    // a day filter must prune partitions at the file-listing level
    val oneDay = back.filter(col("day") === "2024-01-01")
    assert(oneDay.count() === df.filter(col("day") === "2024-01-01").count())
    val scan = oneDay.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(scan.contains("PartitionFilters: [isnotnull(day"),
      s"day filter did not reach the scan's partition filters: $scan")
  }

  test("date-partitioned events: a day-sliced aggregation reads only that day's files") {
    val out = Files.createTempDirectory("graft-dtpart").toFile.getAbsolutePath
    val ev = Tables.events(spark, sf0001)
      .select("event_id", "user_id", "event_type", "value", "ts")
    FileSources.writeDatePartitioned(ev, out, tsCol = "ts")
    val days = new java.io.File(out).listFiles().filter(_.getName.startsWith("dt="))
    assert(days.length > 1, "corpus must span multiple days for the pruning test")
    val day = days.map(_.getName.stripPrefix("dt=")).min
    // a date-bounded OPERATOR over the partitioned warehouse: per-type
    // counts for one day
    val q = FileSources.readDateSlice(spark, out, day)
      .groupBy(col("event_type")).count()
    val got = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = ev.filter(date_format(col("ts"), "yyyy-MM-dd") === day)
      .groupBy(col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want)
    // the dt equality must be a PARTITION filter, not a data filter...
    val scan = q.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(scan.contains("PartitionFilters: [isnotnull(dt") && scan.contains(s"= $day"),
      s"dt filter did not reach PartitionFilters: $scan")
    // ...and only that day's files may actually be read
    val numFiles = collectFileScans(q.queryExecution.executedPlan)
      .flatMap(_.metrics.get("numFiles")).map(_.value).sum
    val dayFiles = days.filter(_.getName == s"dt=$day").head
      .listFiles().count(_.getName.endsWith(".parquet"))
    val allFiles = days.map(_.listFiles().count(_.getName.endsWith(".parquet"))).sum
    assert(numFiles === dayFiles && numFiles < allFiles,
      s"expected $dayFiles of $allFiles files read, scan read $numFiles")
  }

  test("dynamic partition pruning: a dim-filtered join prunes fact partitions at runtime") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-dpp").toFile.getAbsolutePath
    val ev = Tables.events(spark, sf0001)
      .select("event_id", "user_id", "event_type", "value", "ts")
    FileSources.writeDatePartitioned(ev, out, tsCol = "ts")
    val fact = spark.read.parquet(out)
    // the partition column reads back as DATE — keep the dim DATE-typed
    // so the join key needs no cast (a cast can defeat DPP)
    val days = fact.select(col("dt").cast("string")).distinct().orderBy("dt")
      .collect().map(_.getString(0))
    // a tiny "calendar dim" with a selective filter — the classic DPP
    // shape: the fact's dt partitions prune from the dim's filter
    // result. The dim must be file-backed: over a LocalRelation the
    // optimizer folds the filter into the relation and the DPP rule
    // sees no selective predicate
    val dimPath = Files.createTempDirectory("graft-dpp-dim").toFile.getAbsolutePath
    days.zipWithIndex.map { case (d, i) => (d, i % 7) }
      .toSeq.toDF("cal_dt", "dow")
      .withColumn("cal_dt", to_date(col("cal_dt")))
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    // the DPP benefit heuristic compares pruned bytes against subquery
    // overhead — meaningless at a 30-file toy table, so pin it on (the
    // same move RuntimeFilterSpec makes for the bloom-filter threshold)
    withConfs(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio" -> "100") {
      val q = fact.join(dim, col("dt") === col("cal_dt"))
        .filter(col("dow") === 0)
        .groupBy(col("dt")).count()
      val wantDays = days.zipWithIndex.filter(_._2 % 7 == 0).map(_._1).toSet
      assert(q.collect().map(_.getDate(0).toString).toSet === wantDays)
      val scans = collectFileScans(q.queryExecution.executedPlan).map(_.toString).mkString
      assert(scans.contains("dynamicpruning"),
        s"expected a dynamic-pruning subquery in the fact scan: $scans")
    }
  }

  private def withConfs(confs: (String, String)*)(f: => Unit): Unit = {
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** File scans under AQE wrappers — the SHARED walker DtBench uses,
    * so the gate and the benchmark measure pruning identically. */
  private def collectFileScans(p: org.apache.spark.sql.execution.SparkPlan)
    : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
    graft.sources.ScanMetrics.allScans(p)

  test("fact layout: dt+z-ordered lineitem prunes partitions via a DPP dim join (metric)") {
    // the r12 verdict-7 row: the layout discipline applied to the
    // table that is actually 100 TB. Month-grain dt (day-grain at this
    // SF is one ~70-row file per dir — nothing for the z layer; the
    // grain is a layout config, mechanics identical), z-clustered on
    // (l_partkey, l_suppkey); ZOrderSpec pins the per-partition footer
    // tightness, this test pins the RUNTIME partition pruning
    val out = Files.createTempDirectory("graft-factdtz").toFile.getAbsolutePath
    val src = Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_shipdate", "l_extendedprice")
    graft.sources.ZOrder.clusterWriteDatePartitioned(src, out,
      date_format(col("l_shipdate"), "yyyy-MM"),
      Seq("l_partkey", "l_suppkey"), nTasks = 83, maxRecordsPerFile = 200L)
    val fact = spark.read.parquet(out)
    assert(fact.count() === src.count())
    // file-backed calendar dim with a quarter attribute (a
    // LocalRelation folds the filter and DPP sees nothing selective)
    val dimPath = Files.createTempDirectory("graft-factdim").toFile.getAbsolutePath
    fact.select(col("dt").cast("string").as("cal_month")).distinct()
      .withColumn("quarter",
        concat(substring(col("cal_month"), 1, 4), lit("-Q"),
          (((substring(col("cal_month"), 6, 2).cast("int") - 1) .divide(lit(3))).cast("int") + 1).cast("string")))
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val targetQ = dim.select(col("quarter")).distinct().orderBy(col("quarter"))
      .collect().map(_.getString(0)).apply(2)
    val wantMonths = dim.filter(col("quarter") === targetQ)
      .select(col("cal_month")).collect().map(_.getString(0)).toSet
    withConfs(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio" -> "100") {
      val q = fact.join(dim.filter(col("quarter") === targetQ),
          fact("dt") === col("cal_month"))
        .groupBy(col("cal_month")).count()
      assert(q.collect().map(_.getString(0)).toSet === wantMonths)
      val scans = collectFileScans(q.queryExecution.executedPlan)
      assert(scans.map(_.toString).mkString.contains("dynamicpruning"),
        "expected a dynamic-pruning subquery in the fact scan")
      // count only the FACT scan's files — the dim scan is in the same
      // plan and would otherwise pad the sum by its own file
      val read = scans.filter(_.toString.contains(out))
        .flatMap(_.metrics.get("numFiles")).map(_.value).sum
      val dirs = new java.io.File(out).listFiles().filter(_.getName.startsWith("dt="))
      val perDir = dirs.map(d =>
        d.getName.stripPrefix("dt=") ->
          d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
      val wantFiles = wantMonths.toSeq.map(perDir).sum
      val allFiles = perDir.values.sum
      assert(read === wantFiles && read < allFiles,
        s"expected the quarter's $wantFiles of $allFiles files read, scan read $read")
    }
  }

  test("dt gate: a one-day WINDOWED operator reads only that day's files (metric)") {
    // the DtBench visitor-stats shape as a standing per-commit check
    // (r10 verdict #6): sessionization-style window inside a day slice
    // of the dt layout — the files-READ metric, not just plan shape,
    // must show partition pruning held. A regression in
    // readDateSlice / writeDatePartitioned / the dt filter placement
    // turns this red mechanically.
    val out = Files.createTempDirectory("graft-dtgate").toFile.getAbsolutePath
    val ev = Tables.events(spark, sf0001)
      .select("event_id", "user_id", "event_type", "value", "ts", "ts_us")
    FileSources.writeDatePartitioned(ev, out, tsCol = "ts")
    val days = new java.io.File(out).listFiles().filter(_.getName.startsWith("dt="))
    assert(days.length > 1)
    val day = days.map(_.getName.stripPrefix("dt=")).sorted.apply(days.length / 2)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val q = FileSources.readDateSlice(spark, out, day)
      .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .withColumn("sv", when(col("prev_us").isNull
        || col("ts_us") - col("prev_us") > 1800L * 1000000L, 1L).otherwise(0L))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("pv"), sum(col("sv")).as("sv"))
    assert(q.collect().nonEmpty)
    val (numFiles, bytes) = graft.sources.ScanMetrics.filesRead(q)
    val dayFiles = days.filter(_.getName == s"dt=$day").head
      .listFiles().count(_.getName.endsWith(".parquet"))
    val allFiles = days.map(_.listFiles().count(_.getName.endsWith(".parquet"))).sum
    assert(numFiles === dayFiles.toLong && numFiles < allFiles,
      s"pruning regressed: read $numFiles files, expected $dayFiles of $allFiles")
    assert(bytes > 0L)
  }

  test("orc sink/source round-trips with filter pushdown at the scan") {
    val out = Files.createTempDirectory("graft-orc").toFile.getAbsolutePath
    val df = Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_partkey", "l_quantity", "l_returnflag")
    FileSources.writeOrc(df, out)
    val back = FileSources.orc(spark, out)
    assert(back.count() === df.count())
    // identical aggregate through either format
    val viaOrc = back.filter(col("l_returnflag") === "R")
      .agg(sum(col("l_quantity"))).collect()(0).getDouble(0)
    val viaParquet = df.filter(col("l_returnflag") === "R")
      .agg(sum(col("l_quantity"))).collect()(0).getDouble(0)
    assert(viaOrc === viaParquet)
    // the predicate must reach the ORC scan as a pushed filter
    val scan = back.filter(col("l_returnflag") === "R")
      .queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scan.contains("PushedFilters: [") && scan.contains("l_returnflag"),
      s"returnflag filter not pushed to the ORC scan: $scan")
  }

  test("csv source reads with explicit schema, no inference pass") {
    val dir = Files.createTempDirectory("graft-csv").toFile
    val f = new java.io.File(dir, "in.csv")
    Files.writeString(f.toPath, "event_id,event_type\n5,view\n6,signup\n")
    val df = FileSources.csv(spark, f.getAbsolutePath, evtSchema)
    assert(df.schema.map(_.dataType) === Seq(LongType, StringType))
    assert(df.count() === 2)
  }

  test("compaction: small files merge to the byte-target count, rows identical, dir swapped clean") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-compact").toFile.getAbsolutePath
    val path = s"$base/t.parquet"
    (1L to 10000L).map(i => (i, s"row-$i")).toDF("id", "s")
      .repartition(64).write.parquet(path)
    val expect = spark.read.parquet(path).collect().map(_.toSeq).sortBy(_.head.toString)
    // everything fits one target file
    val (b1, a1) = FileSources.compact(spark, path, targetBytes = Long.MaxValue)
    assert(b1 === 64 && a1 === 1)
    assert(spark.read.parquet(path).collect().map(_.toSeq)
      .sortBy(_.head.toString).toSeq === expect.toSeq)
    // a byte target about a third of the table gives ~3 files
    val bytes = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    val (b2, a2) = FileSources.compact(spark, path, targetBytes = bytes / 3)
    assert(b2 === 1 && a2 >= 3 && a2 <= 5, s"got $a2 files")
    assert(spark.read.parquet(path).collect().map(_.toSeq)
      .sortBy(_.head.toString).toSeq === expect.toSeq)
    // no leftover staging/backup directories
    assert(!new java.io.File(s"$path.compacting").exists())
    assert(!new java.io.File(s"$path.pre-compact").exists())
    // a partitioned ROOT is refused (a rewrite would flatten the layout)
    val proot = s"$base/p.parquet"
    (1L to 100L).map(i => (i, s"d${i % 3}")).toDF("id", "dt")
      .write.partitionBy("dt").parquet(proot)
    intercept[IllegalArgumentException] {
      FileSources.compact(spark, proot)
    }
    // while each partition directory compacts fine
    val (_, pa) = FileSources.compact(spark, s"$proot/dt=d0", targetBytes = Long.MaxValue)
    assert(pa === 1)
  }
}
