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

  test("decideStep: decision boundary, hard cap, and recall monotonicity") {
    import graft.search.BoundedSearch
    import graft.search.BoundedSearch.Ctrl
    val gen = Gen.zip(
      Gen.chooseNum(0.1f, 1.0f),  // require
      Gen.chooseNum(0, 4),        // round j
      Gen.chooseNum(0f, 1f),      // predicted recall
      Gen.chooseNum(0, 40),       // nDists
      Gen.chooseNum(0.0, 100.0),  // worst kept distance
      Gen.chooseNum(1f, 16f))     // calibration multiplier
    val levels = 5; val k = 10
    check(gen, 400) { case (req, j, recall, nDists, maxVal, mult) =>
      val st = Ctrl(0L, req, 0, 0, Double.NaN, 0f, 0)
      val next = BoundedSearch.decideStep(st, j, levels, k, mult,
        recall, nDists, maxVal)
      val hi = 1 << j
      // starting from preVal = NaN, stagnation can't fire in one step,
      // so the decision boundary is exactly recall ≥ require ∨ cap
      if (recall >= req || j == levels - 1) {
        assert(next.myNprobe == math.max(hi, (hi * mult).toInt),
          "probe target = stage × multiplier, never below the stage")
        assert(next.decidedStage == hi)
      } else {
        assert(next.myNprobe == 0 && next.decidedStage == 0)
      }
      assert(next.preVal == maxVal, "worst distance always carried forward")
      // monotone: a higher predicted recall can only decide, with the
      // same probe target — never undecide or probe differently
      if (next.myNprobe != 0) {
        val more = BoundedSearch.decideStep(st, j, levels, k, mult,
          math.min(1f, recall + 0.1f), nDists, maxVal)
        assert(more.myNprobe == next.myNprobe &&
          more.decidedStage == next.decidedStage)
      }
    }
  }

  test("decideStep: stagnation on an unchanged worst distance forces termination") {
    import graft.search.BoundedSearch
    import graft.search.BoundedSearch.Ctrl
    val req = 0.5f; val k = 5; val mult = 2f; val levels = 6
    // worst distance frozen across rounds → stoped accumulates (hi−lo)
    // per round; at require×12 = 6 the profile treats recall as 1 and
    // the query stops at stage 8 — well before the stage-32 hard cap
    var st = Ctrl(0L, req, 0, 0, Double.NaN, 0f, 0)
    var j = 0
    while (j < levels && st.myNprobe == 0) {
      st = BoundedSearch.decideStep(st, j, levels, k, mult,
        recallRaw = 0f, nDists = k, maxVal = 7.5)
      j += 1
    }
    assert(st.myNprobe != 0)
    assert(st.decidedStage == 8, s"stagnation should stop at stage 8, got ${st.decidedStage}")
    // a CHANGING worst distance resets the stagnation counter each
    // round — the query runs to the hard cap instead
    var st2 = Ctrl(0L, req, 0, 0, Double.NaN, 0f, 0)
    var j2 = 0
    while (j2 < levels && st2.myNprobe == 0) {
      st2 = BoundedSearch.decideStep(st2, j2, levels, k, mult,
        recallRaw = 0f, nDists = k, maxVal = 7.5 - 0.1 * j2)
      j2 += 1
    }
    assert(st2.decidedStage == 1 << (levels - 1),
      s"improving distances must run to the cap, got ${st2.decidedStage}")
  }

  test("MinHash fused kernel ≡ exploded-groupBy oracle on a randomized corpus") {
    // The production path (sigExpr, one scalar projection) and the spec
    // oracle (shingle explode → numHashes-way min aggregation) are two
    // independent formulations of the same function; this property pins
    // them bit-identical on a seeded random corpus so the oracle can't
    // silently diverge from what production actually computes. Word
    // soup deliberately includes empty tokens (double spaces survive
    // split(" ", -1)), unicode, and sub-3-word docs (dropped by BOTH).
    import spark.implicits._
    val word: Gen[String] = Gen.frequency(
      7 -> Gen.oneOf("alpha", "beta", "gamma", "delta", "x", "données",
        "中文", "a|b", "0", "zz"),
      1 -> Gen.const(""), // double-space artifact
      1 -> Gen.alphaNumStr.map(_.take(6)))
    val doc: Gen[String] =
      Gen.chooseNum(0, 24).flatMap(k => Gen.listOfN(k, word)).map(_.mkString(" "))
    val corpus = (0 until 250).map { i =>
      (i.toLong, doc.pureApply(Gen.Parameters.default, Seed(1000L + i)))
    }
    val docs = corpus.toDF("doc_id", "text")
    for (nh <- Seq(1, 8, 16)) {
      val prod = graft.ops.MinHash.signatures(docs, numHashes = nh)
        .withColumnRenamed("sig", "sig_prod")
      val oracle = graft.ops.MinHash.signaturesGroupBy(docs, numHashes = nh)
        .withColumnRenamed("sig", "sig_oracle")
      val joined = prod.join(oracle, Seq("doc_id"), "full_outer").cache()
      val onlyOne = joined.filter(
        org.apache.spark.sql.functions.col("sig_prod").isNull ||
        org.apache.spark.sql.functions.col("sig_oracle").isNull).count()
      assert(onlyOne == 0, s"numHashes=$nh: paths disagree on which docs survive")
      val mismatch = joined.filter(
        org.apache.spark.sql.functions.col("sig_prod") =!=
        org.apache.spark.sql.functions.col("sig_oracle")).count()
      assert(mismatch == 0, s"numHashes=$nh: $mismatch signature mismatches")
      // both drop exactly the sub-3-word docs
      val expectSurvivors = corpus.count(_._2.split(" ", -1).length >= 3)
      assert(joined.count() == expectSurvivors)
      joined.unpersist()
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
