package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with a
  * typed metadata struct, decoded in partition-local batches.
  *
  * The container ships no image/audio codecs, so `decodeStub` is a
  * deterministic fake standing in for a real decoder (marked STUB).
  * Everything around it — binary column, metadata struct, typed
  * Dataset, `mapPartitions` batching, post-decode projection — is the
  * real plumbing a decode stage needs: per-partition batches keep
  * decoder init amortized, and the binary payload never round-trips
  * through the driver.
  */
object Multimodal {

  /** One media record: payload + typed metadata (what a real pipeline
    * would carry for an image/audio blob). */
  case class MediaRecord(doc_id: Long, payload: Array[Byte], lang: String, source: String)

  /** Decoded features. width/height/frames come from the STUB decoder. */
  case class DecodedRecord(doc_id: Long, n_bytes: Long, width: Int, height: Int, frames: Int)

  /** STUB decoder: a real implementation would decode the codec here
    * (JPEG dims, audio duration, video frame sample). Deterministic
    * fake derived from payload length so the oracle can verify the
    * plumbing end-to-end. */
  private def decodeStub(payload: Array[Byte]): (Int, Int, Int) = {
    val n = payload.length
    (n % 256, (n / 256) % 256, 1 + n % 4)
  }

  /** Binary ingestion + batched decode. The `documents.text` bytes play
    * the media payload. */
  def decodePipeline(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, d)
      .select(
        col("doc_id"),
        encode(col("text"), "utf-8").as("payload"),
        col("lang"), col("source"))
      .as[MediaRecord]
    media.mapPartitions { it =>
      // partition-local "decoder" lifecycle: init once per partition,
      // stream record batches through it
      it.map { r =>
        val (w, h, f) = decodeStub(r.payload)
        DecodedRecord(r.doc_id, r.payload.length.toLong, w, h, f)
      }
    }.toDF()
      .orderBy(col("doc_id"))
  }

  val decodePipelineSql: String =
    """SELECT doc_id,
      |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
      |  CAST(octet_length(CAST(text AS BLOB)) % 256 AS INTEGER) AS width,
      |  CAST((octet_length(CAST(text AS BLOB)) // 256) % 256 AS INTEGER) AS height,
      |  CAST(1 + octet_length(CAST(text AS BLOB)) % 4 AS INTEGER) AS frames
      |FROM documents ORDER BY doc_id""".stripMargin

  private val BlobChunk = 256

  /** Binary sharding: split each payload into fixed-size byte chunks
    * (how oversized media blobs are staged for parallel decode /
    * object-store multipart). The split is an in-place explode over
    * binary `substring` — no shuffle; chunk integrity is witnessed by
    * a per-chunk md5 the oracle reproduces. */
  def chunkBinary(s: SparkSession, d: String): DataFrame = {
    val payload = encode(col("text"), "utf-8")
    val nChunks = ceil(octet_length(payload).cast("double") / BlobChunk).cast("int")
    Tables.documents(s, d)
      .filter(octet_length(payload) > 0)
      .select(
        col("doc_id"),
        posexplode(transform(
          sequence(lit(0), nChunks - 1),
          i => substring(payload, (i * BlobChunk + 1).cast("int"), lit(BlobChunk)))))
      .select(
        col("doc_id"), col("pos").as("chunk_no"),
        octet_length(col("col")).as("n_bytes"),
        md5(col("col")).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_no"))
  }

  /** The documents are ASCII, so DuckDB's string slicing is
    * byte-identical to the binary slicing above. */
  val chunkBinarySql: String =
    s"""SELECT doc_id, CAST(i AS INTEGER) AS chunk_no,
       |  CAST(length(substring(text, i*$BlobChunk + 1, $BlobChunk)) AS INTEGER) AS n_bytes,
       |  md5(substring(text, i*$BlobChunk + 1, $BlobChunk)) AS chunk_md5
       |FROM documents, (SELECT unnest(range(0, (
       |    SELECT 1 + max(length(text)) // $BlobChunk FROM documents))) AS i) r
       |WHERE length(text) > 0 AND i*$BlobChunk < length(text)
       |ORDER BY doc_id, chunk_no""".stripMargin

  /** Multipart REASSEMBLY — the inverse of [[chunkBinary]]: collect a
    * blob's chunks, order them, binary-concat, and witness integrity
    * by comparing md5 of the reassembled payload against md5 of the
    * original (the object-store multipart-download path). Per-blob
    * chunk lists are bounded by the blob size, so the collect_list is
    * per-key bounded — the one shuffle is the per-blob regroup any
    * reassembly fundamentally needs. */
  def reassemble(s: SparkSession, d: String): DataFrame = {
    val payload = encode(col("text"), "utf-8")
    val nChunks = ceil(octet_length(payload).cast("double") / BlobChunk).cast("int")
    val chunks = Tables.documents(s, d)
      .filter(octet_length(payload) > 0)
      .select(col("doc_id"), md5(payload).as("payload_md5"),
        posexplode(transform(
          sequence(lit(0), nChunks - 1),
          i => substring(payload, (i * BlobChunk + 1).cast("int"), lit(BlobChunk)))))
      .select(col("doc_id"), col("payload_md5"), col("pos"), col("col").as("chunk"))
    chunks
      .groupBy(col("doc_id"), col("payload_md5"))
      .agg(sort_array(collect_list(struct(col("pos"), col("chunk")))).as("parts"))
      .select(col("doc_id"), col("payload_md5"),
        md5(aggregate(col("parts"), lit(Array.empty[Byte]),
          (acc, p) => concat(acc, p("chunk")))).as("reassembled_md5"))
      .withColumn("intact",
        (col("payload_md5") === col("reassembled_md5")).cast("int"))
      .orderBy(col("doc_id"))
  }

  val reassembleSql: String =
    s"""WITH chunks AS (
       |  SELECT doc_id, md5(text) AS payload_md5, i AS pos,
       |    substring(text, i*$BlobChunk + 1, $BlobChunk) AS chunk
       |  FROM documents, (SELECT unnest(range(0, (
       |      SELECT 1 + max(length(text)) // $BlobChunk FROM documents))) AS i) r
       |  WHERE length(text) > 0 AND i*$BlobChunk < length(text))
       |SELECT doc_id, payload_md5,
       |  md5(string_agg(chunk, '' ORDER BY pos)) AS reassembled_md5,
       |  CAST(payload_md5 = md5(string_agg(chunk, '' ORDER BY pos)) AS INTEGER) AS intact
       |FROM chunks
       |GROUP BY doc_id, payload_md5
       |ORDER BY doc_id""".stripMargin

  private val FrameUnits = 128

  /** Frame sampling over "video" payloads: a typed media-metadata
    * struct (modality, byte length, frame count, frame width) rides
    * with the payload, and every 2nd frame fans out to a row with its
    * offset and an md5 frame witness — the shape a keyframe-extraction
    * stage feeds to a batched decoder. All column arithmetic; the
    * payload is never exploded, only sliced.
    *
    * Frames are fixed-width slices of the DECODED stream (character
    * units for this text stand-in corpus) so the oracle agrees on any
    * input — DuckDB cannot substring BLOBs, and byte-true slicing with
    * md5 witnesses is already exercised by [[chunkBinary]] /
    * [[reassemble]]. `n_bytes` in the metadata struct stays the true
    * byte length. */
  def frameSample(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d)
      .select(col("doc_id"), col("text").as("payload"))
      .withColumn("media", struct(
        lit("video").as("modality"),
        octet_length(encode(col("payload"), "utf-8")).as("n_bytes"),
        expr(s"CAST(length(payload) div $FrameUnits AS INT)").as("frames"),
        lit(FrameUnits).as("frame_units")))
      .filter(col("media.frames") > 0)
    base
      .select(col("doc_id"), col("payload"), col("media"),
        explode(sequence(lit(0), col("media.frames") - 1, lit(2))).as("frame_no"))
      .select(
        col("doc_id"),
        col("media.frames").as("total_frames"),
        col("frame_no"),
        (col("frame_no") * FrameUnits).as("frame_offset"),
        md5(col("payload").substr(
          col("frame_no") * FrameUnits + 1, lit(FrameUnits))).as("frame_md5"))
      .orderBy(col("doc_id"), col("frame_no"))
  }

  val frameSampleSql: String =
    s"""SELECT doc_id,
       |  CAST(length(text) // $FrameUnits AS INTEGER) AS total_frames,
       |  CAST(f AS INTEGER) AS frame_no,
       |  CAST(f * $FrameUnits AS INTEGER) AS frame_offset,
       |  md5(substring(text, f*$FrameUnits + 1, $FrameUnits)) AS frame_md5
       |FROM documents, (SELECT unnest(range(0, (
       |    SELECT 1 + max(length(text)) // $FrameUnits FROM documents), 2)) AS f) r
       |WHERE length(text) // $FrameUnits > 0 AND f < length(text) // $FrameUnits
       |ORDER BY doc_id, frame_no""".stripMargin
}
