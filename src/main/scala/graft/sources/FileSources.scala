package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** File source/sink surface. The reference's connectors are network
  * services (Kafka in/out, ClickHouse, Phoenix/HBase); in this engine
  * the equivalent roles are played by schema-checked file sources and
  * partitioned columnar sinks, which is also what a 100 TB batch
  * deployment reads and writes.
  *
  * The dirty-record pattern mirrors BaseLogApp.java:52-68: instead of a
  * side output, a permissive JSON read captures unparseable lines in a
  * corrupt-record column, and the caller splits on its nullness.
  */
object FileSources {

  /** JSON-lines source with explicit schema + corrupt-record capture.
    * Returns the full frame; use [[splitDirty]] for the two branches. */
  def jsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)

  /** (clean, dirty) split — the Flink side-output analog. The parsed
    * frame is persisted first: Spark (correctly) refuses to re-read a
    * raw file just to materialize the corrupt-record column, and the
    * cache also means one parse feeds both branches. */
  def splitDirty(df: DataFrame): (DataFrame, DataFrame) = {
    val parsed = df.persist()
    (parsed.filter(col("_corrupt").isNull).drop("_corrupt"),
      parsed.filter(col("_corrupt").isNotNull).select(col("_corrupt").as("raw")))
  }

  /** CSV source with explicit schema (no inference pass — a schema
    * inference scan doubles the read at scale). */
  def csv(spark: SparkSession, path: String, schema: StructType,
    header: Boolean = true): DataFrame =
    spark.read.schema(schema).option("header", header).csv(path)

  /** Partitioned parquet sink: the engine's table-materialization
    * path. Partition columns should be low-cardinality (date, shard);
    * `maxRecordsPerFile` bounds file size so downstream scans
    * parallelize. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
    maxRecordsPerFile: Long = 5000000L): Unit =
    df.write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Date-partitioned materialization — the 100 TB events-table
    * layout. A `dt=yyyy-MM-dd` directory per day means any
    * date-bounded query prunes at the FILE LISTING, before a single
    * data byte is read: a one-day query over a 3-year table touches
    * ~0.1 % of the files. The derived `dt` rides next to the exact
    * event timestamp, so intra-day semantics are unchanged. */
  def writeDatePartitioned(df: DataFrame, path: String, tsCol: String = "ts",
    maxRecordsPerFile: Long = 5000000L): Unit =
    writePartitioned(
      df.withColumn("dt", date_format(col(tsCol), "yyyy-MM-dd")),
      path, Seq("dt"), maxRecordsPerFile)

  /** One day-slice of a date-partitioned table. The `dt` equality is a
    * partition filter (FileSourcesSpec asserts it lands in the scan's
    * PartitionFilters with only that day's files read). */
  def readDateSlice(spark: SparkSession, path: String, day: String): DataFrame =
    spark.read.parquet(path).filter(col("dt") === day)

  /** Streaming file source over a directory of JSON lines (the Kafka
    * topic analog for replay/testing). */
  def jsonLinesStream(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).json(path)

  /** ORC sink — the second columnar interchange format (some warehouse
    * deployments standardize on ORC; the engine shouldn't care).
    * Same partitioning discipline as the parquet sink. */
  def writeOrc(df: DataFrame, path: String, partitionCols: Seq[String] = Nil,
    maxRecordsPerFile: Long = 5000000L): Unit = {
    val w = df.write.mode("overwrite").option("maxRecordsPerFile", maxRecordsPerFile)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).orc(path)
  }

  /** ORC source. Filter pushdown and column pruning work exactly as
    * for parquet (FileSourcesSpec asserts pushed filters reach the
    * scan), so operators are format-agnostic. */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Small-file compaction — the warehouse maintenance pass every
    * streaming/micro-batch sink eventually needs: per-micro-batch
    * writes leave thousands of kilobyte files per partition, and at
    * 100 TB the file LISTING alone starts to dominate planning while
    * each task reads one tiny file. Rewrites a parquet directory into
    * `ceil(bytes / targetBytes)` evenly-sized files (repartition, not
    * coalesce: coalesce merges adjacent partitions and inherits their
    * skew) and swaps it in by rename. The swap is TWO renames, not one
    * atomic operation: a reader racing the swap can observe a brief
    * missing-path window, and a failure between them restores the
    * original layout before rethrowing — the data is never lost, and
    * after any outcome the path holds byte-for-byte the same rows.
    * Call per PARTITION directory on a partitioned table (each `dt=`
    * dir is a standalone parquet dir); calling it on the partitioned
    * ROOT is refused — a rewrite there would inline the partition
    * columns and flatten the layout. Returns (filesBefore,
    * filesAfter). */
  def compact(spark: SparkSession, path: String,
    targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import scala.jdk.CollectionConverters._
    def parts(p: String): Seq[java.nio.file.Path] = {
      val s = Files.list(Paths.get(p))
      try s.iterator().asScala.toSeq.filter(_.getFileName.toString.endsWith(".parquet"))
      finally s.close()
    }
    val before = parts(path)
    require(before.nonEmpty,
      s"compact: no parquet files directly under $path — for a " +
        "partitioned table, compact each partition directory, not the root")
    val bytes = before.map(Files.size).sum
    val n = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val tmp = path.stripSuffix("/") + ".compacting"
    spark.read.parquet(path).repartition(n)
      .write.mode("overwrite").parquet(tmp)
    val bak = path.stripSuffix("/") + ".pre-compact"
    require(!Files.exists(Paths.get(bak)),
      s"compact: stale $bak exists (an earlier compact was interrupted " +
        "between its renames) — inspect and restore/remove it first")
    def rmRec(p: java.nio.file.Path): Unit = {
      val s = Files.walk(p)
      try s.iterator().asScala.toSeq.reverse.foreach(Files.delete)
      finally s.close()
    }
    Files.move(Paths.get(path), Paths.get(bak), StandardCopyOption.ATOMIC_MOVE)
    try Files.move(Paths.get(tmp), Paths.get(path), StandardCopyOption.ATOMIC_MOVE)
    catch {
      case e: Throwable =>
        // restore the original layout before surfacing the failure; a
        // failed restore must not mask the original exception
        try {
          Files.move(Paths.get(bak), Paths.get(path), StandardCopyOption.ATOMIC_MOVE)
          rmRec(Paths.get(tmp))
        } catch { case restoreFailure: Throwable => e.addSuppressed(restoreFailure) }
        throw e
    }
    rmRec(Paths.get(bak))
    (before.length, parts(path).length)
  }
}
