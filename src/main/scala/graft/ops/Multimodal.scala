package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque BINARY payloads with
  * typed metadata, processed batch-wise in `mapPartitions` (the Scala
  * analog of pandas-batch UDFs — one partition = one batch, columnar
  * parquet IO on either side).
  *
  * The actual media codecs are NOT in this environment, so the decode
  * kernels are deterministic STUBS (clearly marked) — byte-derived fake
  * pixels/samples. Everything around them is real and tested: schema,
  * null passthrough, partition batching, metadata propagation, and the
  * feature-vector handoff into the vector-search operators.
  */
object Multimodal {

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

  /** Decode + resize to a fixed thumbnail, emitting a feature vector
    * column ready for the ANN operators. Batch shape: one partition
    * of payloads per task; constant memory per row. */
  def decodeResizeFeatures(media: DataFrame, w2: Int = 8, h2: Int = 8): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(media.schema.fields.toSeq :+
      StructField("features", ArrayType(FloatType, containsNull = false)))
    val rdd = media.rdd.mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val w = Option(r.getAs[Any]("width")).fold(8)(_.asInstanceOf[Int])
        val h = Option(r.getAs[Any]("height")).fold(8)(_.asInstanceOf[Int])
        val feats =
          if (payload == null) null
          else stubResize(stubDecode(payload, w, h), w, h, w2, h2)
        Row.fromSeq(r.toSeq :+ feats)
      }
    }
    spark.createDataFrame(rdd, outSchema)
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
