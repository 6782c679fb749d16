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
