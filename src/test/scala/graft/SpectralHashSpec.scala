package graft

import org.apache.spark.sql.functions._
import graft.index.{IVFIndex, SpectralHash}

/** IVF spectral hash (`IndexIVFSpectralHash.h:30-75` semantics,
  * re-derived): periodic binarization, per-mode thresholds, per-list
  * query binarization. */
class SpectralHashSpec extends SparkSpec {

  lazy val base = randVecs(600, 16, seed = 81, normalize = false)
  lazy val baseDF = vecDF(base).cache()
  lazy val ivf = IVFIndex.train(baseDF, nlist = 8, seed = 42L)
  lazy val assigned = IVFIndex.assign(baseDF, ivf).cache()

  test("periodic binarization: +period is invariant, +period/2 flips the bit") {
    val sh = SpectralHash.train(assigned, ivf, nbit = 16, period = 2.0f)
    val xt = Array.fill(16)(0.3f)
    val s0 = sh.binarize(xt, 0)
    assert(sh.binarize(xt.map(_ + 2.0f), 0).sameElements(s0),
      "+1 period changed the code")
    val flipped = sh.binarize(xt.map(_ + 1.0f), 0)
    assert((s0(0) ^ flipped(0)) == 0xFFFF,
      "+period/2 must flip every (identically-valued) coordinate's bit")
  }

  test("threshold modes: centroid/centroid_half/median trained shapes") {
    val c = SpectralHash.train(assigned, ivf, nbit = 32, period = 1.0f, mode = "centroid")
    assert(c.trained.length == 8 && c.trained.head.length == 32)
    (0 until 8).foreach { l =>
      assert(c.trained(l).sameElements(c.transform(ivf.centroids(l))))
    }
    val h = SpectralHash.train(assigned, ivf, nbit = 32, period = 1.0f, mode = "centroid_half")
    (0 until 8).foreach { l =>
      c.trained(l).zip(h.trained(l)).foreach { case (a, b) =>
        assert(math.abs((a - b) - 0.25f) < 1e-6, s"half shift wrong: $a vs $b")
      }
    }
    // median thresholds split each list's bits ~50/50
    import spark.implicits._
    val m = SpectralHash.train(assigned, ivf, nbit = 32, period = 1000f, mode = "median")
    // with a huge period, bit = floor((x - median)*2/period) & 1 → 0 for
    // x ≥ median (xf·freq in [0,1)), 1 for x < median (in [-1,0)) — so
    // the balance check reads the fraction of below-median coordinates
    val enc = SpectralHash.encode(assigned, m)
    val ones = enc.select(col("sig")).as[Array[Long]].collect()
      .map(s => java.lang.Long.bitCount(s(0)))
    val meanOnes = ones.sum.toDouble / ones.length / 32
    assert(meanOnes > 0.35 && meanOnes < 0.65, s"median bit balance $meanOnes")
  }

  test("full-probe and 1-probe search find the query's own code at rank 1") {
    import spark.implicits._
    for (mode <- Seq("global", "centroid", "median")) {
      val sh = SpectralHash.train(assigned, ivf, nbit = 64, period = 1.0f, mode = mode)
      val enc = SpectralHash.encode(assigned, sh).cache()
      val qDF = vecDF(base.take(6), "qid")
      for (np <- Seq(1, 8)) {
        val top = SpectralHash.search(enc, ivf, sh, qDF, k = 3, nprobe = np)
          .filter(col("rank") === 1)
          .select(col("qid"), col("id"), col("dist"))
          .as[(Long, Long, Double)].collect()
        top.foreach { case (qid, id, dist) =>
          assert(id == qid && dist == 0.0,
            s"mode=$mode np=$np: query $qid rank-1 is ($id, $dist), not itself")
        }
      }
    }
  }
}
