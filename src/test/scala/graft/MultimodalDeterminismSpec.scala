package graft.ops

import graft.SparkSpec

import org.apache.spark.sql.functions._


/** Pins the decode-determinism contract behind the mm01/mm02 driver
  * oracles (r7 verdict item #6): the oracle-bearing path must never
  * depend on a codec whose output can vary between JDK builds. The one
  * such codec the JDK ships is JPEG (the IDCT is implementation-
  * defined; libjpeg-turbo vs the pure-java path can differ by ±1 LSB
  * per sample), so the contract is three-sided:
  *   1. mm02's inputs (UTF-8 text bytes) can never reach the JPEG/PNG
  *      codecs at all, and the BM/GIF near-misses fall back to the
  *      stub instead of throwing;
  *   2. lossless formats decode pixel-exactly (spec'd against
  *      hand-computed luminance);
  *   3. JPEG decode — allowed for non-oracle exploratory use — is at
  *      least deterministic within one JVM.
  */
class MultimodalDeterminismSpec extends SparkSpec {

  private def lum(r: Int, g: Int, b: Int): Float =
    (0.299f * r + 0.587f * g + 0.114f * b) / 255.0f

  private def rgbImage(): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      3, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val px = Seq(
      (0, 0, 0xff0000), (1, 0, 0x00ff00), (2, 0, 0x0000ff),
      (0, 1, 0x000000), (1, 1, 0xffffff), (2, 1, 0x808080))
    px.foreach { case (x, y, rgb) => img.setRGB(x, y, rgb) }
    img
  }

  private def encodeImg(fmt: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(rgbImage(), fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }

  test("mm02 oracle inputs cannot reach a real codec: UTF-8 excludes JPEG/PNG magic") {
    // 0xFF (JPEG SOI) and 0x89 (PNG signature) are not valid UTF-8 lead
    // bytes — no text payload can ever sniff as either format, so the
    // only implementation-defined codec (JPEG) is structurally
    // unreachable from the text-backed mm01/mm02 rows.
    def validUtf8(b: Array[Byte]): Boolean =
      try {
        java.nio.charset.StandardCharsets.UTF_8.newDecoder()
          .decode(java.nio.ByteBuffer.wrap(b)); true
      } catch { case _: java.nio.charset.CharacterCodingException => false }
    // exhaustive over the lead byte: any buffer starting 0xFF/0x89 is
    // invalid UTF-8 regardless of what follows (continuation or ASCII)
    for (second <- Seq(0x00, 0x41, 0x80, 0xbf, 0xd8)) {
      assert(!validUtf8(Array(0xff.toByte, second.toByte, 0x41, 0x41)))
      assert(!validUtf8(Array(0x89.toByte, second.toByte, 0x41, 0x41)))
    }
    assert(Multimodal.looksLikeImage(Array(0xff.toByte, 0xd8.toByte, 0, 0)))
    assert(Multimodal.looksLikeImage(Array(0x89.toByte, 0x50.toByte, 0, 0)))
  }

  test("BM/GIF-prefixed text falls back to the stub — malformed payloads never throw") {
    // "BM..." and "GIF..." ARE possible UTF-8 texts and DO pass the
    // magic sniff; ImageIO must fail them and decodeAny must return the
    // stub result (bit-identical to stubDecode), not propagate the
    // reader's exception into the executor.
    for (s <- Seq("BM not actually a bitmap at all",
                  "GIF89a but really just prose",
                  "GIF malformed")) {
      val p = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      assert(Multimodal.looksLikeImage(p), s"sniff should fire for: $s")
      val (px, w, h) = Multimodal.decodeAny(p, 4, 4)
      assert(w == 4 && h == 4)
      assert(px.sameElements(Multimodal.stubDecode(p, 4, 4)),
        s"fallback must be the deterministic stub for: $s")
    }
  }

  test("every mm02 fixture payload decodes via the stub, end to end") {
    // The live documents fixture (the exact rows mm02 feeds): each
    // UTF-8 payload must round through decodeAny to the stub result.
    val rows = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
      .filter(col("doc_id") < 64)
      .select(encode(col("text"), "UTF-8").as("payload"))
      .collect().map(_.getAs[Array[Byte]](0))
    assert(rows.nonEmpty)
    rows.foreach { p =>
      val (px, w, h) = Multimodal.decodeAny(p, 16, 16)
      assert(w == 16 && h == 16)
      assert(px.sameElements(Multimodal.stubDecode(p, 16, 16)))
    }
  }

  test("lossless formats decode pixel-exactly") {
    val want = Array(
      lum(255, 0, 0), lum(0, 255, 0), lum(0, 0, 255),
      lum(0, 0, 0), lum(255, 255, 255), lum(128, 128, 128))
    for (fmt <- Seq("png", "bmp")) {
      val bytes = encodeImg(fmt)
      assert(Multimodal.looksLikeImage(bytes))
      val (px, w, h) = Multimodal.decodeAny(bytes, 999, 999)
      assert(w == 3 && h == 2, s"$fmt decoded dims must win over metadata")
      assert(px.sameElements(want), s"$fmt decode must be pixel-exact")
    }
  }

  test("JPEG decode is deterministic within a JVM (and barred from oracles)") {
    val bytes = encodeImg("jpg")
    assert(bytes(0) == 0xff.toByte && bytes(1) == 0xd8.toByte)
    val (px1, w, h) = Multimodal.decodeAny(bytes, 0, 0)
    val (px2, _, _) = Multimodal.decodeAny(bytes, 0, 0)
    assert(w == 3 && h == 2)
    // within-JVM determinism is testable; cross-JDK IDCT variance is
    // not — which is exactly why no oracleSql row feeds JPEG through
    // this path (see decodeAny scaladoc + the UTF-8 argument above)
    assert(px1.sameElements(px2), "same-JVM JPEG decode must be stable")
    // sanity: lossy but in-range luminance
    assert(px1.forall(v => v >= 0f && v <= 1f))
  }
}
