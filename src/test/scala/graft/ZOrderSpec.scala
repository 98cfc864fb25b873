package graft

import java.nio.file.Files

import graft.sources.ZOrder
import org.apache.spark.sql.functions._

/** Z-order layout: the clustered write must (a) preserve the data and
  * (b) measurably tighten per-file min/max footer ranges on EVERY
  * clustered dimension — the property parquet data skipping prunes
  * by — where a single-column sort only tightens its own column. */
class ZOrderSpec extends SparkSpec {

  /** Mean normalized per-file footer range of each clustered column —
    * the statistic parquet data skipping prunes by: a filter on a
    * column prunes the files whose [min, max] misses the predicate,
    * so the MEAN RANGE of a column ≈ the fraction of files a point
    * lookup on it must read. */
  private def meanRanges(path: String, xCol: String, yCol: String): (Double, Double) = {
    val files = spark.read.parquet(path).inputFiles
    val global = spark.read.parquet(path)
      .agg(min(xCol), max(xCol), min(yCol), max(yCol)).head()
    val (gx, gy) = (global.getLong(1) - global.getLong(0),
      global.getLong(3) - global.getLong(2))
    val rs = files.map { f =>
      val r = spark.read.parquet(f).agg(min(xCol), max(xCol), min(yCol), max(yCol)).head()
      ((r.getLong(1) - r.getLong(0)).toDouble / gx,
        (r.getLong(3) - r.getLong(2)).toDouble / gy)
    }
    (rs.map(_._1).sum / rs.length, rs.map(_._2).sum / rs.length)
  }

  test("z-order write preserves data and bounds the WORST dimension's file ranges") {
    val zDir = Files.createTempDirectory("graft-zorder").toFile.getAbsolutePath
    val linDir = Files.createTempDirectory("graft-linear").toFile.getAbsolutePath
    val src = Tables.lineitem(spark, sf001).select("l_orderkey", "l_partkey", "l_extendedprice")

    ZOrder.clusterWrite(src, zDir, Seq("l_partkey", "l_orderkey"), nFiles = 32)
    // baseline: the classic single-column layout
    src.repartitionByRange(32, col("l_partkey"))
      .sortWithinPartitions(col("l_partkey"))
      .write.mode("overwrite").parquet(linDir)

    // data preserved exactly
    val back = spark.read.parquet(zDir)
    assert(back.count() === src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)

    val (zx, zy) = meanRanges(zDir, "l_partkey", "l_orderkey")
    val (lx, ly) = meanRanges(linDir, "l_partkey", "l_orderkey")
    // the single-column sort is perfect on its own axis and USELESS on
    // the other (per-file range ≈ global): a filter on l_orderkey
    // reads every file of the linear layout
    assert(lx < 0.1, s"sanity: linear layout clusters its sort column (lx=$lx)")
    assert(ly > 0.8, s"sanity: linear layout leaves the other axis unclustered (ly=$ly)")
    // z-order bounds BOTH axes — the worst-dimension mean range is the
    // pruning guarantee a multi-dimension workload cares about
    assert(math.max(zx, zy) < 0.45,
      s"z-order worst-axis range too loose (zx=$zx, zy=$zy)")
    assert(math.max(zx, zy) < ly * 0.55,
      s"z-order worst axis ($zx, $zy) must beat the linear layout's worst ($ly)")
  }

  test("date-partitioned z layout: partitions' files bound BOTH clustered axes (fact-table layout)") {
    val zDir = Files.createTempDirectory("graft-dtz").toFile.getAbsolutePath
    val linDir = Files.createTempDirectory("graft-dtlin").toFile.getAbsolutePath
    val src = Tables.lineitem(spark, sf001)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_shipdate", "l_extendedprice")
    val month = date_format(col("l_shipdate"), "yyyy-MM")
    ZOrder.clusterWriteDatePartitioned(src, zDir, month,
      Seq("l_partkey", "l_suppkey"), nTasks = 332, maxRecordsPerFile = 500L)
    // linear control: same dt grain, classic single-column sort
    src.withColumn("dt", month)
      .repartitionByRange(332, col("dt"), col("l_partkey"))
      .sortWithinPartitions(col("dt"), col("l_partkey"))
      .write.mode("overwrite").option("maxRecordsPerFile", 500L)
      .partitionBy("dt").parquet(linDir)

    // data preserved exactly (dt is derived, drop it for the diff)
    val back = spark.read.parquet(zDir).drop("dt")
    assert(back.count() === src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)

    // inside a busy partition the z files must bound BOTH axes where
    // the linear layout leaves the second axis unclustered — the
    // pruning property the in-partition skip layer depends on
    val busy = spark.read.parquet(zDir).groupBy(col("dt"))
      .count().orderBy(col("count").desc).limit(1)
      .collect().head.get(0).toString
    val (zx, zy) = meanRanges(s"$zDir/dt=$busy", "l_partkey", "l_suppkey")
    val (_, ly) = meanRanges(s"$linDir/dt=$busy", "l_partkey", "l_suppkey")
    assert(ly > 0.8, s"sanity: linear layout leaves l_suppkey unclustered (ly=$ly)")
    assert(math.max(zx, zy) < ly * 0.75,
      s"per-partition z worst axis ($zx, $zy) must beat the linear layout's worst ($ly)")
  }

  test("morton interleave orders points along the curve (locality sanity)") {
    import spark.implicits._
    // quantized 2-bit toy grid: key(3,3)=15 is the max, key(0,0)=0 the
    // min, and x bits land in even positions, y bits in odd ones
    val df = Seq((0L, 0L), (3L, 0L), (0L, 3L), (3L, 3L), (2L, 1L)).toDF("x", "y")
    val keys = df.select(col("x"), col("y"),
      ZOrder.interleave(Seq(col("x"), col("y"))).as("z")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(keys((0L, 0L)) === 0L)
    assert(keys((3L, 0L)) === 5L)   // x bits at positions 0 and 2
    assert(keys((0L, 3L)) === 10L)  // y bits at positions 1 and 3
    assert(keys((3L, 3L)) === 15L)
    assert(keys((2L, 1L)) === 6L)   // x=10 → pos 2; y=01 → pos 1
  }
}
