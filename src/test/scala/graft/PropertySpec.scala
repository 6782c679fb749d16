package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.Kernels
import graft.operators.TopK
import graft.profile.ErrorProfile
import graft.profile.ErrorProfile.Trace

/** Property-based invariants for the pure building blocks (scalacheck
  * generators driven with fixed seeds — deterministic, no
  * scalatest-plus bridge needed). */
class PropertySpec extends SparkSpec {

  private def check[A](g: Gen[A], n: Int = 200)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      f(g.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  val items: Gen[(List[(Double, Long)], Int)] = Gen.zip(
    Gen.listOf(Gen.zip(Gen.chooseNum(0.0, 100.0), Gen.chooseNum(0L, 1000L))),
    Gen.chooseNum(1, 20))

  test("TopK equals sort-take under arbitrary insert streams") {
    check(items) { case (xs, k) =>
      val h = new TopK(k)
      xs.foreach { case (d, i) => h.add(d, i) }
      val want = xs.sortBy { case (d, i) => (d, i) }.take(math.min(k, xs.size))
      assert(h.sorted.toList == want)
    }
  }

  val vecPair: Gen[(Array[Float], Array[Float])] = {
    val vec = Gen.containerOfN[Array, Float](16, Gen.chooseNum(-10f, 10f))
    Gen.zip(vec, vec)
  }

  test("distance kernels: identity, symmetry, dot-product identity") {
    check(vecPair) { case (a, b) =>
      assert(Kernels.l2Sqr(a, a) == 0.0)
      assert(math.abs(Kernels.l2Sqr(a, b) - Kernels.l2Sqr(b, a)) < 1e-9)
      assert(Kernels.l2Sqr(a, b) >= 0.0)
      // ‖a−b‖² = ‖a‖² + ‖b‖² − 2⟨a,b⟩ (inner_product_to_L2sqr, utils.h:156)
      val viaDot = Kernels.normSqr(a) + Kernels.normSqr(b) - 2 * Kernels.dot(a, b)
      assert(math.abs(Kernels.l2Sqr(a, b) - viaDot) < 1e-6 * (1 + math.abs(viaDot)))
    }
  }

  val tracePts: Gen[List[(Float, Float)]] = Gen.nonEmptyListOf(
    Gen.zip(Gen.chooseNum(0f, 50f), Gen.chooseNum(1f, 10f)))

  test("Trace sortAndBatch: φ ascending; lookups finite and positive") {
    check(tracePts) { xs =>
      val t = Trace.sortAndBatch(1, xs, bs = 3)
      assert(t.phis.sameElements(t.phis.sorted))
      Seq(t.phis.head, t.phis.last, (t.phis.head + t.phis.last) / 2).foreach { p =>
        val u = t.search(p, 0f)
        assert(!u.isNaN && u > 0f, s"phi=$p u=$u")
      }
    }
  }

  val boundaries: Gen[(Array[Float], Float)] = Gen.zip(
    Gen.containerOfN[Array, Float](30, Gen.chooseNum(0.1f, 10f)),
    Gen.chooseNum(0.2f, 10f))

  test("sumAngle is monotone in kdis") {
    check(boundaries) { case (dB, kdis) =>
      val small = ErrorProfile.sumAngle(kdis, dB, 15, 1)
      val large = ErrorProfile.sumAngle(kdis * 1.5f, dB, 15, 1)
      assert(large >= small - 1e-5f)
    }
  }

  test("PQ/SQ encode-decode: decode stays within half a step of the range") {
    val sq = graft.quantize.SQModel(
      vmin = Array.fill(8)(-1f), vmax = Array.fill(8)(1f))
    // reference Codec8bit decodes (code + 0.5)/255 — the reconstruction
    // may exceed [vmin, vmax] by up to half a quantization step
    val halfStep = 2f / 255 / 2
    val vec = Gen.containerOfN[Array, Float](8, Gen.chooseNum(-1f, 1f))
    check(vec) { v =>
      val dec = sq.decode(sq.encode(v))
      dec.zip(v).foreach { case (d, x) =>
        assert(d >= -1f - halfStep - 1e-5f && d <= 1f + halfStep + 1e-5f)
        assert(math.abs(d - x) <= 2f / 255 + 1e-4, s"err ${math.abs(d - x)}")
      }
    }
  }
}
