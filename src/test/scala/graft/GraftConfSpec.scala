package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins GraftConf's operator contract: every routing threshold reads
  * its system property at USE time (a long-lived driver can re-tune
  * between queries), falls back to its documented default, and the
  * derived default (joinMaxProbesPerBucket = 8× cogroup bound) follows
  * an override of its base. */
class GraftConfSpec extends AnyFunSuite {

  private def withProp[A](key: String, v: String)(body: => A): A = {
    System.setProperty(key, v)
    try body finally System.clearProperty(key)
  }

  test("documented defaults") {
    // 32768 from the r12 driver-staged/lazy A/B
    // (tools/evidence/r12_staged_driver_ab.log): driver arm faster at
    // every size below 64k, parity above — the cap takes the whole win
    assert(GraftConf.eagerMaxQueries == 32768)
    assert(GraftConf.distributedMinQueries == 131072)
    assert(GraftConf.cogroupMaxProbes == 8192)
    assert(GraftConf.joinMaxProbesPerBucket == 8 * 8192)
    assert(GraftConf.fusedMinProbedRows == 28000000L)
  }

  test("overrides are read at use time and revert on clear") {
    withProp("graft.eager.maxQueries", "16") {
      assert(GraftConf.eagerMaxQueries == 16)
    }
    assert(GraftConf.eagerMaxQueries == 32768)
    withProp("graft.join.minProbedRows", "0") {
      assert(GraftConf.fusedMinProbedRows == 0L)
    }
    assert(GraftConf.fusedMinProbedRows == 28000000L)
  }

  test("malformed override fails fast, naming the key and value") {
    withProp("graft.join.minProbedRows", "28M") {
      val e = intercept[IllegalArgumentException](GraftConf.fusedMinProbedRows)
      assert(e.getMessage.contains("graft.join.minProbedRows"))
      assert(e.getMessage.contains("28M"))
    }
    withProp("graft.eager.maxQueries", "lots") {
      val e = intercept[IllegalArgumentException](GraftConf.eagerMaxQueries)
      assert(e.getMessage.contains("graft.eager.maxQueries"))
    }
  }

  test("per-bucket bound follows an override of the cogroup bound") {
    withProp("graft.cogroup.maxProbes", "100") {
      assert(GraftConf.joinMaxProbesPerBucket == 800)
      // an explicit per-bucket override still wins over the derivation
      withProp("graft.join.maxProbesPerBucket", "42") {
        assert(GraftConf.joinMaxProbesPerBucket == 42)
      }
    }
  }
}
