package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media payloads are opaque `binary` columns with typed metadata alongside
  * — the schema, partitioning and batch shape are real; only the actual
  * codec call is stubbed (the decode libraries are not in this container).
  * The stub is deterministic (hash-derived dimensions) so every downstream
  * stage is testable end-to-end.
  *
  * Scale notes: payloads dominate row size, so (a) never shuffle the binary
  * column — extract features first, then join features back by id if
  * needed; (b) decode via `mapPartitions` so per-partition codec context
  * (native decoder handles, GPU sessions) is initialized once per task, not
  * per row; (c) `spark.sql.files.maxPartitionBytes` governs scan
  * parallelism since rows are huge.
  */
object Multimodal {

  /** A media row: opaque payload + metadata. */
  case class MediaRecord(doc_id: Long, mime: String, payload: Array[Byte])

  /** Decoded/feature-extracted output of the stub codec. */
  case class DecodedMedia(doc_id: Long, mime: String, n_bytes: Int,
      width: Int, height: Int, n_frames: Int, feature_checksum: Long)

  /** Manufacture a binary media column from the documents table (the test
    * stand-in for real image bytes: UTF-8 of the text). Pure projection.
    */
  def asMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.Parallelism.fanOut(docs.select(col(idCol), col(textCol)))
      .select(col(idCol).as("doc_id"),
      concat(lit("application/x-graft-"),
        pmod(col(idCol), lit(3)).cast("string")).as("mime"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** Relational feature extraction — everything derivable without a codec
    * (sizes, magic bytes, checksums) as pure expressions; stays in codegen
    * and is replayable in the oracle.
    */
  def binaryFeatures(media: DataFrame): DataFrame =
    media.select(col("doc_id"), col("mime"),
      octet_length(col("payload")).as("n_bytes"),
      hex(substring(col("payload"), 1, 4)).as("magic"),
      crc32(col("payload")).as("payload_crc32"))

  // === Stubbed codec ========================================================
  // A real deployment replaces `decodeOne` with the native library call
  // (e.g. javax.imageio / ffmpeg bindings). STUB: dimensions are derived
  // deterministically from the payload so the pipeline is testable.

  private def decodeOne(rec: MediaRecord): DecodedMedia = {
    // --- real decode would happen here: ImageIO.read(new ByteArrayInputStream(rec.payload)) ---
    val n = rec.payload.length
    var checksum = 1125899906842597L
    var i = 0
    while (i < n) { checksum = 31 * checksum + rec.payload(i); i += 1 }
    DecodedMedia(rec.doc_id, rec.mime, n,
      width = (math.abs(checksum) % 1920).toInt + 1,
      height = (math.abs(checksum) / 1920 % 1080).toInt + 1,
      n_frames = n / 100 + 1,
      feature_checksum = checksum)
  }

  /** Decode / feature-extract via `mapPartitions`: one codec context per
    * partition, streaming through rows (never materializing the partition).
    */
  def decode(media: DataFrame)(implicit spark: SparkSession): Dataset[DecodedMedia] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      // per-partition codec init would go here (native handles, GPU session)
      it.map(decodeOne)
    }
  }

  /** Frame sampling stub for video-like payloads: emit every `stride`-th
    * "frame" (payload chunk) as its own row — the explode-shaped op a video
    * pipeline needs. Chunking is deterministic; flatMap keeps it streaming.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int)(
      implicit spark: SparkSession): Dataset[(Long, Int, Array[Byte])] = {
    import spark.implicits._
    media.as[MediaRecord].flatMap { rec =>
      rec.payload.grouped(frameBytes).zipWithIndex
        .filter(_._2 % stride == 0)
        .map { case (chunk, idx) => (rec.doc_id, idx, chunk) }
    }
  }
}
