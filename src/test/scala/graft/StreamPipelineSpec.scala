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

  test("restart from checkpoint resumes exactly-once: no replays, no gaps, state intact") {
    val srcDir = Files.createTempDirectory("graft-restart-src").toFile
    val outDir = Files.createTempDirectory("graft-restart-out").toFile.getAbsolutePath
    val ckDir = Files.createTempDirectory("graft-restart-ck").toFile.getAbsolutePath

    val schema = new StructType()
      .add("event_id", LongType).add("user_id", LongType)
      .add("event_type", StringType).add("value", "double").add("ts", TimestampType)
    def writeBatch(name: String, rows: Seq[String]): Unit =
      Files.writeString(new java.io.File(srcDir, name).toPath, rows.mkString("\n"))
    def startQuery() =
      StreamOps.route(FileSources.jsonLinesStream(spark, srcDir.getAbsolutePath, schema))
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckDir).outputMode("append").start()

    writeBatch("b0.json", Seq(
      """{"event_id":1,"user_id":7,"event_type":"view","value":1.0,"ts":"2024-01-01T00:00:01Z"}""",
      """{"event_id":2,"user_id":8,"event_type":"signup","value":2.0,"ts":"2024-01-01T00:00:02Z"}"""))
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()

    // files that arrived while the query was DOWN must be picked up on
    // restart; files processed before the stop must NOT be replayed
    writeBatch("b1.json", Seq(
      """{"event_id":3,"user_id":9,"event_type":"purchase","value":3.0,"ts":"2024-01-01T00:00:03Z"}"""))
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      writeBatch("b2.json", Seq(
        """{"event_id":4,"user_id":9,"event_type":"click","value":4.0,"ts":"2024-01-01T00:00:04Z"}"""))
      q2.processAllAvailable()
    } finally q2.stop()

    val out = spark.read.parquet(outDir).select("event_id", "stream").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(out.length === 4, s"expected exactly-once delivery, got ${out.toSeq}")
    assert(out.toMap === Map(1L -> "page", 2L -> "start", 3L -> "other", 4L -> "page"))
  }

  test("composed DWD->DWM topology: route feeds unique-visit from one source") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamOps
    import graft.streaming.StreamOps.Evt

    def ts(m: Long) = new java.sql.Timestamp((24 * 60 + m) * 60 * 1000)
    val input = MemoryStream[Evt]
    // DWD: route, keep the page stream (as BaseLogApp feeds
    // UniqueVisitApp via the dwd_page_log topic), then DWM dedup
    val pageStream = StreamOps.route(input.toDF())
      .filter(org.apache.spark.sql.functions.col("stream") === "page")
      .select("event_id", "user_id", "event_type", "value", "ts").as[Evt]
    val q = StreamOps.uniqueVisit(pageStream).writeStream
      .format("memory").queryName("dwd_dwm").outputMode("append").start()
    try {
      input.addData(Seq(
        Evt(1, 7, "signup", 0, ts(1)),   // start stream — must not count
        Evt(2, 7, "view", 0, ts(2)),     // first page view of user 7
        Evt(3, 7, "click", 0, ts(3))))   // same day — deduped
      q.processAllAvailable()
      input.addData(Seq(Evt(4, 7, "view", 0, ts(24 * 60 + 2)))) // next day
      q.processAllAvailable()
      val visits = spark.table("dwd_dwm").collect()
        .map(r => (r.getString(1), r.getLong(2))).toSet
      assert(visits === Set(("1970-01-02", 2L), ("1970-01-03", 4L)),
        "signup must not open the visit; page events dedupe per day")
    } finally q.stop()
  }
}
