package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque BINARY payloads with
  * typed metadata, processed batch-wise in typed `mapPartitions` (the
  * Scala analog of pandas-batch UDFs — one partition = one batch,
  * columnar parquet IO on either side).
  *
  * Real image formats the JDK ships codecs for (PNG/BMP/JPEG/GIF via
  * `javax.imageio` — no external deps) are ACTUALLY decoded; anything
  * else falls back to the deterministic STUB decode (clearly marked) —
  * byte-derived fake pixels, kept as the stable test/oracle path since
  * heavier media codecs are not in this environment. Everything around
  * the codecs is real and tested: schema, null passthrough, partition
  * batching, metadata propagation, and the feature-vector handoff into
  * the vector-search operators.
  */
object Multimodal {

  /** Typed row contracts for the decode pipeline — keeps the
    * `mapPartitions` inside Tungsten (Dataset encoders on both sides)
    * instead of an RDD[Row] round-trip with hand-built schemas. */
  final case class MediaIn(media_id: Long, payload: Array[Byte], mime: String,
                           width: Option[Int], height: Option[Int])
  final case class MediaFeat(media_id: Long, payload: Array[Byte], mime: String,
                             width: Option[Int], height: Option[Int],
                             features: Array[Float])

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true)))

  /** STUB decode: a real implementation would JPEG/PNG-decode the
    * payload; this derives a deterministic grayscale "image" from the
    * bytes so the downstream plumbing (resize → features → ANN) is
    * exercised end-to-end with stable results. */
  private[ops] def stubDecode(payload: Array[Byte], w: Int, h: Int): Array[Float] = {
    val out = new Array[Float](w * h)
    if (payload == null || payload.isEmpty) return out
    var i = 0
    while (i < out.length) {
      out(i) = ((payload(i % payload.length) & 0xff) / 255.0f)
      i += 1
    }
    out
  }

  /** STUB resize: nearest-neighbor over the fake pixel grid (the
    * interpolation structure is real; the pixels are fake). */
  private[ops] def stubResize(pixels: Array[Float], w: Int, h: Int,
                              w2: Int, h2: Int): Array[Float] = {
    val out = new Array[Float](w2 * h2)
    var y = 0
    while (y < h2) {
      var x = 0
      while (x < w2) {
        val sx = math.min(w - 1, x * w / w2)
        val sy = math.min(h - 1, y * h / h2)
        out(y * w2 + x) = pixels(sy * w + sx)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Cheap magic-byte sniff so the real-codec attempt only runs on
    * payloads that can possibly be images (ImageIO reader discovery per
    * arbitrary blob would be wasted work at scale). */
  private[ops] def looksLikeImage(p: Array[Byte]): Boolean =
    p != null && p.length >= 4 && (
      (p(0) == 0x89.toByte && p(1) == 0x50.toByte) ||   // PNG
      (p(0) == 0xff.toByte && p(1) == 0xd8.toByte) ||   // JPEG
      (p(0) == 'B'.toByte && p(1) == 'M'.toByte) ||     // BMP
      (p(0) == 'G'.toByte && p(1) == 'I'.toByte && p(2) == 'F'.toByte))

  /** REAL decode for JDK-supported formats, stub otherwise: returns
    * (grayscale pixels row-major, width, height). Real images use their
    * own decoded dimensions; the stub trusts the metadata columns.
    * Luminance = (0.299 R + 0.587 G + 0.114 B) / 255 — deterministic
    * for the lossless formats (PNG/BMP/GIF) the specs exercise.
    *
    * Determinism contract (MultimodalDeterminismSpec): lossless decodes
    * are pixel-exact by format definition; JPEG decode is deterministic
    * within one JVM but its IDCT is implementation-defined across JDKs,
    * so NO driver-oracle row may feed JPEG through this path. mm02's
    * payloads are UTF-8 text: the JPEG (0xFF) and PNG (0x89) magics are
    * not valid UTF-8 lead bytes, so those codecs are unreachable there;
    * a text that happens to start with "BM"/"GIF" reaches ImageIO,
    * fails to parse, and must fall back to the stub — hence the
    * catch-all, because ImageIO readers THROW on malformed payloads
    * that pass the magic sniff (they don't always return null). */
  private[ops] def decodeAny(payload: Array[Byte], wMeta: Int,
                             hMeta: Int): (Array[Float], Int, Int) = {
    if (looksLikeImage(payload)) {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img != null) {
        val w = img.getWidth; val h = img.getHeight
        val out = new Array[Float](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff
            val b = rgb & 0xff
            out(y * w + x) = (0.299f * r + 0.587f * g + 0.114f * b) / 255.0f
            x += 1
          }
          y += 1
        }
        return (out, w, h)
      }
    }
    (stubDecode(payload, wMeta, hMeta), wMeta, hMeta)
  }

  /** Decode + resize to a fixed thumbnail, emitting a feature vector
    * column ready for the ANN operators. Batch shape: one partition of
    * payloads per task; constant memory per row; typed
    * `Dataset.mapPartitions` so the plan stays in Tungsten (no RDD scan
    * barrier, no driver-side schema assembly). */
  def decodeResizeFeatures(media: DataFrame, w2: Int = 8, h2: Int = 8): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long").as("media_id"), col("payload"),
        col("mime"), col("width").cast("int").as("width"),
        col("height").cast("int").as("height"))
      .as[MediaIn]
      .mapPartitions { it =>
        it.map { m =>
          val feats =
            if (m.payload == null) null
            else {
              val (px, w, h) = decodeAny(m.payload,
                m.width.getOrElse(8), m.height.getOrElse(8))
              stubResize(px, w, h, w2, h2)
            }
          MediaFeat(m.media_id, m.payload, m.mime, m.width, m.height, feats)
        }
      }.toDF()
  }

  /** Frame sampling for "video" payloads: split the byte stream into
    * frame-sized chunks and keep every `stride`-th — explode keeps it
    * distributed (one output row per sampled frame). */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val sampler = udf { payload: Array[Byte] =>
      if (payload == null) Array.empty[Array[Byte]]
      else payload.grouped(frameBytes).zipWithIndex
        .collect { case (chunk, i) if i % stride == 0 => chunk }
        .toArray
    }
    media
      .select(col("*"), posexplode(sampler(col("payload"))).as(Seq("frame_no", "frame")))
      .drop("payload")
  }

  /** Pure-SQL byte-level stats over a binary column (no stub involved) —
    * the metadata/bookkeeping layer of a media pipeline. */
  def binaryStats(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      col("mime"),
      octet_length(col("payload")).as("n_bytes"),
      md5(col("payload")).as("digest"))
}
