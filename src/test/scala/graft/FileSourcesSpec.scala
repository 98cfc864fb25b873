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
}
