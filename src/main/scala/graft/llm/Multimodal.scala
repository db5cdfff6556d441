package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads travel as opaque `binary`
  * columns with typed metadata alongside. The decode step is a clearly
  * marked STUB (no image/audio codecs in this container) — but the
  * Spark-side shape is real: schema, batch iteration via mapPartitions
  * (the JVM analog of arrow-batched pandas UDFs), deterministic output,
  * and per-partition decoder initialization exactly where a real codec
  * would be opened once per partition.
  */
object Multimodal {

  /** A media record as it would arrive from ingestion. */
  case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Extracted metadata (what a real decoder would emit alongside tensors). */
  case class MediaMeta(doc_id: Long, media_type: String, n_bytes: Long,
    sha256: String, head_byte: Int, stub_width: Int, stub_height: Int)

  /** STUB decoder: deterministic pseudo-decode of a payload. A real
    * implementation would parse the container format here; the container
    * image has no codecs, so we derive stable fake dimensions from the
    * digest. Everything else (bytes, hashing) is real.
    */
  def decodeStub(r: MediaRecord, md: java.security.MessageDigest): MediaMeta = {
    md.reset()
    val digest = md.digest(r.payload)
    val hex = digest.map("%02x".format(_)).mkString
    // fake-but-deterministic "decoded" dimensions from the first digest bytes
    val w = 16 + (java.lang.Byte.toUnsignedInt(digest(0)) % 64)
    val h = 16 + (java.lang.Byte.toUnsignedInt(digest(1)) % 64)
    MediaMeta(r.doc_id, r.media_type, r.payload.length.toLong, hex,
      if (r.payload.nonEmpty) java.lang.Byte.toUnsignedInt(r.payload(0)) else -1,
      w, h)
  }

  /** Wrap a text table as fake media payloads (UTF-8 bytes) — the ingestion
    * shim for the test fixture, where no true binary media column exists.
    */
  def asMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast("bigint").as("doc_id"),
      lit("text/plain").as("media_type"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** Distributed metadata extraction: one decoder instance per partition,
    * streaming batches through it (never materializes a partition).
    */
  def extractMeta(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("SHA-256")
      it.map(r => decodeStub(r, md))
    }
  }

  /** Frame sampling stub: split a payload into fixed-size "frames" and keep
    * every `stride`-th one — the plumbing (explode to one row per frame,
    * frame index, bounded frame size) is what a video pipeline needs; the
    * "frame" content is just the byte slice.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    media.select(col("doc_id"), posexplode(expr(
      s"transform(sequence(0, greatest(cast(ceil(length(payload) / $frameBytes) as int) - 1, 0)), " +
      s"i -> substring(payload, i * $frameBytes + 1, $frameBytes))"))
      .as(Seq("frame_idx", "frame")))
      .filter(col("frame_idx") % stride === 0)
}
