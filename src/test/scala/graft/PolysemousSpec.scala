package graft

import org.apache.spark.sql.functions._
import graft.quantize.{Polysemous, ProductQuantizer}

class PolysemousSpec extends SparkSpec {

  lazy val pool = clusteredVecs(1040, 16, nClusters = 12, seed = 301)
  lazy val base = pool.take(1000)
  lazy val baseDF = vecDF(base).cache()
  lazy val qDF = vecDF(pool.drop(1000).take(8), "qid")
  lazy val plainPQ = ProductQuantizer.train(baseDF, m = 4, seed = 5L)
  lazy val polyPQ = Polysemous.train(plainPQ, nIter = 30000, seed = 5L)

  test("affine target mapping reproduces the reference's moments and weights") {
    // PolysemousTraining.cpp:270-292: the L2² table maps to mean
    // nbits/2, stddev √(nbits/4) — the moments of a random nbits-bit
    // Hamming distance — and every weight is exp(−log2 · target).
    val sub = 0
    val k = plainPQ.ksub
    val dis = Array.tabulate(k * k)(ij =>
      graft.functions.Kernels.l2Sqr(
        plainPQ.codebooks(sub)(ij / k), plainPQ.codebooks(sub)(ij % k)))
    val obj = new Polysemous.ReproduceWithHammingObjective(
      plainPQ.nbits, dis, math.log(2))
    val n2 = obj.targetDis.length.toDouble
    val mean = obj.targetDis.sum / n2
    val sd = math.sqrt(obj.targetDis.map(t => t * t).sum / n2 - mean * mean)
    assert(math.abs(mean - plainPQ.nbits / 2.0) < 1e-9, s"target mean $mean")
    assert(math.abs(sd - math.sqrt(plainPQ.nbits / 4.0)) < 1e-9, s"target sd $sd")
    obj.targetDis.zip(obj.weights).take(500).foreach { case (t, w) =>
      assert(math.abs(w - math.exp(-math.log(2) * t)) < 1e-12)
    }
  }

  test("O(n) costUpdate matches the O(n²) definition for random swaps") {
    // the reference's incremental delta (PolysemousTraining.cpp:212-255)
    // against its own full recomputation (:196-207) — if the fast path
    // drifts, annealing silently optimizes the wrong function
    val k = plainPQ.ksub
    val dis = Array.tabulate(k * k)(ij =>
      graft.functions.Kernels.l2Sqr(
        plainPQ.codebooks(0)(ij / k), plainPQ.codebooks(0)(ij % k)))
    val obj = new Polysemous.ReproduceWithHammingObjective(
      plainPQ.nbits, dis, math.log(2))
    val rnd = new scala.util.Random(7L)
    val perm = rnd.shuffle((0 until obj.n).toVector).toArray
    (0 until 50).foreach { _ =>
      val iw = rnd.nextInt(obj.n)
      var jw = rnd.nextInt(obj.n - 1); if (jw == iw) jw += 1
      val fast = obj.costUpdate(perm, iw, jw)
      val before = obj.computeCost(perm)
      val t = perm(iw); perm(iw) = perm(jw); perm(jw) = t
      val after = obj.computeCost(perm)
      val t2 = perm(iw); perm(iw) = perm(jw); perm(jw) = t2 // revert
      assert(math.abs(fast - (after - before)) < 1e-6 * (1 + math.abs(fast)),
        s"swap ($iw,$jw): fast $fast vs full ${after - before}")
    }
  }

  test("annealing lowers the reference objective; accumulated cost stays exact") {
    val k = plainPQ.ksub
    (0 until plainPQ.m).foreach { sub =>
      val dis = Array.tabulate(k * k)(ij =>
        graft.functions.Kernels.l2Sqr(
          plainPQ.codebooks(sub)(ij / k), plainPQ.codebooks(sub)(ij % k)))
      val obj = new Polysemous.ReproduceWithHammingObjective(
        plainPQ.nbits, dis, math.log(2))
      val identityCost = obj.computeCost(Array.tabulate(obj.n)(identity))
      val (perm, cost) = Polysemous.runOptimization(obj, nIter = 30000,
        nRedo = 2, initTemperature = 0.7,
        temperatureDecay = math.pow(0.9, 1.0 / 500),
        rnd = new scala.util.Random(5L + sub))
      assert(cost < identityCost,
        s"sub $sub: annealed $cost not below identity $identityCost")
      // the Δ-accumulated cost the optimizer carries must equal a fresh
      // full evaluation of the returned permutation
      val recomputed = obj.computeCost(perm)
      assert(math.abs(cost - recomputed) < 1e-6 * (1 + recomputed),
        s"sub $sub: accumulated $cost vs recomputed $recomputed")
      assert(perm.sorted.sameElements(Array.tabulate(obj.n)(identity)),
        "result must be a permutation")
    }
  }

  test("annealing lowers the hamming-vs-distance objective") {
    val identity = Array.tabulate(plainPQ.ksub)(i => i)
    (0 until plainPQ.m).foreach { sub =>
      val before = Polysemous.objective(plainPQ, sub, identity)
      val after = Polysemous.objective(polyPQ, sub, identity)
      assert(after < before,
        s"sub $sub: objective $after not below identity-order $before")
    }
  }

  test("reordering preserves the centroid set and reconstruction error") {
    (0 until plainPQ.m).foreach { sub =>
      val a = plainPQ.codebooks(sub).map(_.toSeq).toSet
      val b = polyPQ.codebooks(sub).map(_.toSeq).toSet
      assert(a == b, s"sub $sub centroid set changed")
    }
    base.take(50).foreach { v =>
      val ra = graft.functions.Kernels.l2Sqr(v, plainPQ.decode(plainPQ.encode(v)))
      val rb = graft.functions.Kernels.l2Sqr(v, polyPQ.decode(polyPQ.encode(v)))
      assert(math.abs(ra - rb) < 1e-12, s"recon error changed: $ra vs $rb")
    }
  }

  test("ht at max hamming equals the unfiltered decode-scan") {
    import spark.implicits._
    val enc = ProductQuantizer.encode(baseDF, polyPQ).select(col("id"), col("code"))
    def run(ht: Int) = Polysemous.knn(enc, polyPQ, qDF, k = 10, ht = ht)
      .select(col("qid"), col("rank"), col("id"), col("dist"))
      .as[(Long, Int, Long, Double)].collect().sorted
    assert(run(8 * polyPQ.m).sameElements(run(Int.MaxValue)))
  }

  test("ht autotune sweep: CDF-priced costs, exact-corner recall, select") {
    import spark.implicits._
    import graft.operators.AutoTune
    val enc = ProductQuantizer.encode(baseDF, polyPQ)
      .select(col("id"), col("code")).cache()
    val maxHt = 8 * polyPQ.m
    val hts = Seq(8, 14, 20, maxHt)
    val pts = AutoTune.sweepPolysemousHt(enc, baseDF, polyPQ, qDF, k = 10, hts)
    assert(pts.length == hts.length)
    // cost is the Hamming CDF: monotone, 1.0 at the max threshold,
    // and a moderate threshold really prunes
    assert(pts.map(_.cost).sliding(2).forall(p => p.size == 1 || p.head <= p.last))
    assert(pts.last.cost == 1.0)
    assert(pts.find(_.params("ht") == 14).get.cost < 0.5)
    // the unfiltered point matches the plain decode-scan's recall
    val unfiltered = Polysemous.knn(enc, polyPQ, qDF, k = 10, ht = maxHt)
      .select(col("qid"), col("id")).as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = graft.search.FlatSearch.knn(baseDF, qDF, 10)
      .select(col("qid"), col("id")).as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val pqRecall = exact.map { case (q, ids) =>
      (unfiltered.getOrElse(q, Set.empty) & ids).size.toDouble / 10
    }.sum / exact.size
    assert(math.abs(pts.last.meanRecall - pqRecall) < 1e-9)
    // bounded-case select at a target the sweep can meet picks a
    // cheaper-than-unfiltered point when one qualifies
    val sel = AutoTune.selectMulti(pts, pts.last.minRecall)
    assert(sel.minRecall >= pts.last.minRecall && sel.cost <= 1.0)
  }

  test("moderate ht prunes most candidates but keeps PQ-level recall") {
    import spark.implicits._
    val enc = ProductQuantizer.encode(baseDF, polyPQ)
      .select(col("id"), col("code")).cache()
    val unfiltered = Polysemous.knn(enc, polyPQ, qDF, k = 10, ht = 8 * polyPQ.m)
      .select(col("qid"), col("id")).as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val filtered = Polysemous.knn(enc, polyPQ, qDF, k = 10, ht = 14)
      .select(col("qid"), col("id")).as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // recall of the filtered search against the unfiltered PQ ranking
    val recall = unfiltered.map { case (q, ids) =>
      (filtered.getOrElse(q, Set.empty) & ids).size.toDouble / ids.size
    }.sum / unfiltered.size
    assert(recall > 0.7, s"polysemous recall vs unfiltered PQ: $recall")

    // and the filter actually prunes: count survivors per query
    val qCodes = qDF.select(col("qid"), col("vec"))
      .as[(Long, Array[Float])].collect().map { case (q, v) => (q, polyPQ.encode(v)) }
    val codes = enc.as[(Long, Array[Byte])].collect()
    val passFrac = qCodes.map { case (_, qc) =>
      codes.count { case (_, c) => Polysemous.hamming(qc, c) <= 14 }.toDouble / codes.length
    }.sum / qCodes.length
    assert(passFrac < 0.5, s"hamming filter passed $passFrac of codes")
  }
}
