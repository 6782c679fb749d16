package graft.quantize

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A scalar vector codec: fixed-size byte code per vector. The common
  * face of SQ8 / SQ4 / fp16 (`Auncel/IndexScalarQuantizer.h:33-41`
  * QuantizerType), so indexes can hold any of them interchangeably. */
trait ScalarCodec extends Serializable {
  def dim: Int
  def codeSize: Int
  def encode(v: Array[Float]): Array[Byte]
  def decode(code: Array[Byte]): Array[Float]
}

/** 4-bit scalar quantizer (`Codec4bit`,
  * `Auncel/IndexScalarQuantizer.cpp:101-110`): 15-step grid per
  * dimension, two components packed per byte — half the footprint of
  * SQ8. `uniform = true` shares one [vmin, vmax] range across all
  * dimensions (QT_4bit_uniform, trained from the global min/max). */
final case class SQ4Model(vmin: Array[Float], vmax: Array[Float])
    extends ScalarCodec {
  def dim: Int = vmin.length
  def codeSize: Int = (dim + 1) / 2
  val vdiff: Array[Float] = Array.tabulate(dim)(i => vmax(i) - vmin(i))

  private def codeOf(v: Float, i: Int): Int = {
    // truncate like the reference Codec4bit (`(int)(x*15.0)`,
    // IndexScalarQuantizer.cpp:103-105); (c+0.5)/15 decode = bin midpoint
    val x = if (vdiff(i) == 0f) 0.0 else (v - vmin(i)) / vdiff(i)
    (math.max(0.0, math.min(1.0, x)) * 15.0).toInt
  }

  def encode(v: Array[Float]): Array[Byte] = {
    val out = new Array[Byte](codeSize)
    var i = 0
    while (i < dim) {
      val c = codeOf(v(i), i)
      out(i / 2) = (out(i / 2) | (c << ((i & 1) << 2))).toByte
      i += 1
    }
    out
  }

  def decode(code: Array[Byte]): Array[Float] =
    Array.tabulate(dim) { i =>
      val c = (code(i / 2) >> ((i & 1) << 2)) & 0xf
      vmin(i) + ((c + 0.5f) / 15.0f) * vdiff(i)
    }
}

object SQ4 {
  /** Per-dimension range (QT_4bit) or shared global range
    * (QT_4bit_uniform). */
  def train(df: DataFrame, uniform: Boolean = false,
            vecCol: String = "vec"): SQ4Model = {
    import df.sparkSession.implicits._
    val stats = df.select(posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .as[(Int, Float, Float)].collect().sortBy(_._1)
    if (uniform) {
      val mn = stats.map(_._2).min
      val mx = stats.map(_._3).max
      SQ4Model(Array.fill(stats.length)(mn), Array.fill(stats.length)(mx))
    } else SQ4Model(stats.map(_._2), stats.map(_._3))
  }
}

/** 6-bit scalar quantizer (QT_6bit, `Codec6bit`
  * `Auncel/IndexScalarQuantizer.cpp:135-198`): 63-step grid per
  * dimension, components packed 6 bits apart — 4 components per
  * 3 bytes. */
final case class SQ6Model(vmin: Array[Float], vmax: Array[Float])
    extends ScalarCodec {
  def dim: Int = vmin.length
  def codeSize: Int = (dim * 6 + 7) / 8
  val vdiff: Array[Float] = Array.tabulate(dim)(i => vmax(i) - vmin(i))

  def encode(v: Array[Float]): Array[Byte] = {
    val out = new Array[Byte](codeSize)
    var i = 0
    while (i < dim) {
      // truncate like the reference Codec6bit (`(int)(x*63.0)`,
      // IndexScalarQuantizer.cpp:137-139)
      val x = if (vdiff(i) == 0f) 0.0 else (v(i) - vmin(i)) / vdiff(i)
      val c = (math.max(0.0, math.min(1.0, x)) * 63.0).toInt
      val bitpos = 6 * i
      val byteIdx = bitpos >> 3
      val shift = bitpos & 7
      out(byteIdx) = (out(byteIdx) | ((c << shift) & 0xff)).toByte
      if (shift > 2) // spills into the next byte
        out(byteIdx + 1) = (out(byteIdx + 1) | (c >> (8 - shift))).toByte
      i += 1
    }
    out
  }

  def decode(code: Array[Byte]): Array[Float] =
    Array.tabulate(dim) { i =>
      val bitpos = 6 * i
      val byteIdx = bitpos >> 3
      val shift = bitpos & 7
      var c = (code(byteIdx) & 0xff) >> shift
      if (shift > 2) c |= (code(byteIdx + 1) & 0xff) << (8 - shift)
      c &= 0x3f
      vmin(i) + ((c + 0.5f) / 63.0f) * vdiff(i)
    }
}

object SQ6 {
  def train(df: DataFrame, vecCol: String = "vec"): SQ6Model = {
    val sq = SQ4.train(df, uniform = false, vecCol)
    SQ6Model(sq.vmin, sq.vmax)
  }
}

/** IEEE-754 half precision (QT_fp16,
  * `Auncel/IndexScalarQuantizer.cpp:200-330`): round-to-nearest-even
  * to the 11-bit-significand grid, stored 2 bytes/component.
  *
  * The rounding is done in value space — scale by 2^(10−e) (exact,
  * power of two), `rint` (ties to even), unscale — which is exactly
  * the reference's `_MM_FROUND_TO_NEAREST_INT` conversion; the bit
  * pack/unpack below is then exact integer arithmetic, so
  * decode(encode(x)) == the IEEE half value of x bit-for-bit. */
final case class FP16Codec(dim: Int) extends ScalarCodec {
  def codeSize: Int = dim * 2

  def encode(v: Array[Float]): Array[Byte] = {
    val out = new Array[Byte](codeSize)
    var i = 0
    while (i < dim) {
      val h = FP16Codec.toBits(v(i))
      out(2 * i) = (h & 0xff).toByte
      out(2 * i + 1) = ((h >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  def decode(code: Array[Byte]): Array[Float] =
    Array.tabulate(dim) { i =>
      FP16Codec.fromBits(((code(2 * i + 1) & 0xff) << 8) | (code(2 * i) & 0xff))
    }
}

object FP16Codec {

  /** The nearest (ties-to-even) half-representable value, as a Float. */
  def roundToHalf(x: Float): Float = {
    if (x == 0f || java.lang.Float.isNaN(x)) return x
    if (x.isInfinite) return x
    val xd = x.toDouble
    val e = math.max(Math.getExponent(xd), -14)
    val scale = math.pow(2.0, 10 - e)
    val y = math.rint(xd * scale) / scale
    if (y > 65504.0) Float.PositiveInfinity
    else if (y < -65504.0) Float.NegativeInfinity
    else y.toFloat
  }

  /** Bits of the half value nearest to x (exact once rounded). */
  def toBits(x: Float): Int = {
    if (java.lang.Float.isNaN(x)) return 0x7e00
    val y = roundToHalf(x)
    val sign = if (y < 0 || (y == 0f && 1 / y < 0)) 0x8000 else 0
    val a = math.abs(y.toDouble)
    if (a == 0.0) return sign
    if (y.isInfinite) return sign | 0x7c00
    val e = Math.getExponent(a)
    if (e < -14) {
      // subnormal half: magnitude = m · 2^-24, m exact in [1, 1023]
      sign | math.round(a * (1 << 24)).toInt
    } else {
      // normal: magnitude = (1024 + m) · 2^(e-25), m exact in [0, 1023]
      val m = math.round(a * math.pow(2.0, 10 - e)).toInt - 1024
      sign | ((e + 15) << 10) | m
    }
  }

  def fromBits(h: Int): Float = {
    val sign = if ((h & 0x8000) != 0) -1.0 else 1.0
    val exp = (h >> 10) & 0x1f
    val mant = h & 0x3ff
    val mag =
      if (exp == 0) mant * math.pow(2.0, -24)
      else if (exp == 31) {
        if (mant != 0) return Float.NaN else Double.PositiveInfinity
      }
      else (1024 + mant) * math.pow(2.0, exp - 25)
    (sign * mag).toFloat
  }

  def forDim(d: Int): FP16Codec = FP16Codec(d)
}

object ScalarVariants {
  /** Encode a vector column with any scalar codec. */
  def encode(df: DataFrame, codec: ScalarCodec, vecCol: String = "vec"): DataFrame = {
    val bm = df.sparkSession.sparkContext.broadcast(codec)
    val u = udf { v: Seq[Float] => bm.value.encode(v.toArray) }
    df.withColumn("code", u(col(vecCol)))
  }
}
