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
}
