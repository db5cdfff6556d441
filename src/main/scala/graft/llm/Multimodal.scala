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

  /** Features extracted from a payload (feeds the similarity-search path). */
  case class MediaFeatures(doc_id: Long, features: Array[Float])

  /** Feature extraction — genuinely computed, no codecs required: an
    * L2-normalized byte-value histogram. It is a real content signature
    * (byte distributions separate text/compressed/structured payloads),
    * and its output shape — (doc_id, float vector) — is exactly what the
    * ANN operators consume, so binary columns plug into similarity search
    * end to end. A production pipeline swaps the histogram for a model
    * embedding; nothing downstream changes.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame,
      bins: Int = 16): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.map { r =>
        val counts = new Array[Float](bins)
        r.payload.foreach { b =>
          counts((java.lang.Byte.toUnsignedInt(b) * bins) / 256) += 1f
        }
        val norm = math.max(math.sqrt(counts.map(c => c.toDouble * c).sum), 1e-9)
        MediaFeatures(r.doc_id, counts.map(c => (c / norm).toFloat))
      }
    }
  }

  /** Resized media payload with its original size retained. */
  case class ResizedMedia(doc_id: Long, media_type: String,
      payload: Array[Byte], orig_bytes: Long)

  /** Resize stub: deterministic byte decimation to a bounded payload size
    * (a real implementation would rescale pixels here — the plumbing that
    * matters at scale is identical: bounded output rows, per-partition
    * streaming, original size kept for provenance).
    */
  def resizeStub(spark: SparkSession, media: DataFrame,
      maxBytes: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    require(maxBytes > 0)
    media.as[MediaRecord].mapPartitions { it =>
      it.map { r =>
        val n = r.payload.length
        val out =
          if (n <= maxBytes) r.payload
          else {
            val stride = math.ceil(n.toDouble / maxBytes).toInt
            Array.tabulate((n + stride - 1) / stride)(i => r.payload(i * stride))
          }
        ResizedMedia(r.doc_id, r.media_type, out, n.toLong)
      }
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
