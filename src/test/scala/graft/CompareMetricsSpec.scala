package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the figure-10 compare harness's metric math
  * ([[CompareMetrics]]) to hand-computed values: the evidence log's
  * numbers are only as trustworthy as these formulas. */
class CompareMetricsSpec extends AnyFunSuite {

  test("meanMs converts mean seconds to ms") {
    assert(CompareMetrics.meanMs(Seq(0.010, 0.030)) === 20.0)
    assert(CompareMetrics.meanMs(Nil) === 0.0)
  }

  test("slowdownVs is the mean of per-position ratios (figure10-1.py:74-79)") {
    // ratios 2.0, 0.5, 3.5 → mean 2.0
    val base = Seq(1.0, 2.0, 2.0)
    val other = Seq(2.0, 1.0, 7.0)
    assert(CompareMetrics.slowdownVs(base, other) === 2.0)
    assert(CompareMetrics.slowdownVs(base, base) === 1.0)
    intercept[IllegalArgumentException](
      CompareMetrics.slowdownVs(Seq(1.0), Seq(1.0, 2.0)))
  }

  test("tailRatio is nearest-rank p99 over mean") {
    // 100 values 1..100: p99 index round(0.99*99)=98 → value 99;
    // mean 50.5 → ratio 99/50.5
    val lat = (1 to 100).map(_.toDouble)
    assert(math.abs(CompareMetrics.tailRatio(lat) - 99.0 / 50.5) < 1e-12)
    // constant latencies → ratio 1
    assert(CompareMetrics.tailRatio(Seq.fill(7)(3.0)) === 1.0)
  }

  test("probeBudget reports total, mean, and fraction of nlist (anchor unit)") {
    val (tot, mean, frac) = CompareMetrics.probeBudget(Seq(10, 20, 30), 100)
    assert(tot === 60L)
    assert(mean === 20.0)
    assert(frac === 0.2)
    // the committed LAET anchor: 7530 nprobe·100 units over 100 queries
    // on IVF1024 = mean 75.3 = frac 7.35%
    val (_, m2, f2) = CompareMetrics.probeBudget(
      Seq.fill(100)(7530).map(_ / 100), 1024)
    assert(m2 === 75.0) // integer unit division in this synthetic check
    assert(math.abs(f2 - 75.0 / 1024) < 1e-12)
  }

  test("thresholdRecall counts distances within the k-th GT distance, direction-aware") {
    val kth = Map(1L -> 10.0, 2L -> -10.0) // L2-style and negated-IP-style
    val got = Map(
      1L -> Array(5.0, 10.0, 10.004, 10.006), // 3 of 4 within 10*1.0005
      2L -> Array(-12.0, -10.0, -9.996, -9.99)) // 3 within -10*0.9995
    val r = CompareMetrics.thresholdRecall(got, kth, k = 4)
    assert(r(1L) === 0.75)
    assert(r(2L) === 0.75)
    // missing query → recall 0
    val r2 = CompareMetrics.thresholdRecall(Map.empty, Map(9L -> 1.0), 4)
    assert(r2(9L) === 0.0)
    // kd = 0 (duplicate/identical vectors): the multiplicative term
    // collapses to zero tolerance, but the additive 1e-6 floor (the
    // reference's inter_sec convention, bound.cpp:117-126) still
    // accepts float noise just above 0
    val r3 = CompareMetrics.thresholdRecall(
      Map(5L -> Array(0.0, 5e-7, 2e-6, 1.0)), Map(5L -> 0.0), 4)
    assert(r3(5L) === 0.5) // 0.0 and 5e-7 within 0 + 1e-6; 2e-6 and 1.0 not
  }

  test("verdictWorst takes the min over both tables, micro-only engines unchanged") {
    val micro = Map("bounded" -> 0.94, "laet" -> 0.84, "fixed" -> 1.0)
    // bounded's tail query only appears in the full batch; laet improves
    // there (min must NOT rise); fixed absent from the full table
    val full = Map("bounded" -> 0.90, "laet" -> 0.95)
    val w = CompareMetrics.verdictWorst(micro, full)
    assert(w("bounded") === 0.90) // full-batch tail governs
    assert(w("laet") === 0.84)    // micro worst still counts
    assert(w("fixed") === 1.0)    // judged on micro alone
    // a full-batch break below the bound flips a micro HELD
    val w2 = CompareMetrics.verdictWorst(
      Map("bounded" -> 0.94), Map("bounded" -> 0.85))
    assert(w2("bounded") === 0.85)
    // an engine measured ONLY in the full table must not vanish from
    // the verdict (the union contract)
    val w3 = CompareMetrics.verdictWorst(
      Map("bounded" -> 0.94), Map("bounded" -> 0.92, "extra" -> 0.70))
    assert(w3("extra") === 0.70 && w3("bounded") === 0.92)
  }
}
