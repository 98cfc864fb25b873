package graft

import java.nio.file.Files

import graft.sources.FileSources
import graft.streaming.StreamOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType, TimestampType}

/** End-to-end streaming pipeline: JSON-lines file source (Kafka-topic
  * replay analog) → routing transform → partitioned parquet sink with
  * a checkpoint — the full readStream → transform → writeStream path
  * the reference's DWD jobs implement. */
class StreamPipelineSpec extends SparkSpec {

  test("file stream routes events into a parquet sink exactly once") {
    val srcDir = Files.createTempDirectory("graft-stream-src").toFile
    val outDir = Files.createTempDirectory("graft-stream-out").toFile.getAbsolutePath
    val ckDir = Files.createTempDirectory("graft-stream-ck").toFile.getAbsolutePath

    val schema = new StructType()
      .add("event_id", LongType).add("user_id", LongType)
      .add("event_type", StringType).add("value", "double").add("ts", TimestampType)

    def writeBatch(name: String, rows: Seq[String]): Unit =
      Files.writeString(new java.io.File(srcDir, name).toPath, rows.mkString("\n"))

    writeBatch("b0.json", Seq(
      """{"event_id":1,"user_id":7,"event_type":"view","value":1.0,"ts":"2024-01-01T00:00:01Z"}""",
      """{"event_id":2,"user_id":7,"event_type":"signup","value":2.0,"ts":"2024-01-01T00:00:02Z"}"""))

    val stream = FileSources.jsonLinesStream(spark, srcDir.getAbsolutePath, schema)
    val q = StreamOps.route(stream).writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckDir)
      .outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      // second micro-batch lands while the query runs
      writeBatch("b1.json", Seq(
        """{"event_id":3,"user_id":8,"event_type":"purchase","value":3.0,"ts":"2024-01-01T00:00:03Z"}"""))
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.read.parquet(outDir)
    assert(out.count() === 3)
    val streams = out.select("event_id", "stream").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(streams === Map(1L -> "page", 2L -> "start", 3L -> "other"))
  }
}
