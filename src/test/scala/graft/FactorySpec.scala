package graft

import org.apache.spark.sql.functions._
import graft.functions.Kernels
import graft.index.IndexFactory
import graft.search.FlatSearch
import graft.transforms._

class FactorySpec extends SparkSpec {

  lazy val pool = clusteredVecs(1550, 32, nClusters = 16, seed = 41)
  lazy val base = pool.take(1500)
  lazy val baseDF = vecDF(base).cache()
  lazy val qDF = vecDF(pool.drop(1500), "qid")

  def recallVsExact(res: org.apache.spark.sql.DataFrame, k: Int): Double = {
    import spark.implicits._
    val exact = FlatSearch.knn(baseDF, qDF, k)
      .select(col("qid"), col("id")).as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = res.select(col("qid"), col("id")).as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    exact.map { case (q, ids) => (got.getOrElse(q, Set.empty) & ids).size.toDouble / k }
      .sum / exact.size
  }

  test("parse handles the reference's spec grammar") {
    val s = IndexFactory.parse("PCA16,IVF64,PQ8")
    assert(s.pre == Seq(IndexFactory.PcaTok(16, whiten = false)))
    assert(s.nlist.contains(64))
    assert(s.enc == IndexFactory.PQEnc(8))
    assert(IndexFactory.parse("L2norm,Flat").pre == Seq(IndexFactory.L2Tok))
    assert(IndexFactory.parse("IVF32,SQ8").enc == IndexFactory.SQ8Enc)
    assert(IndexFactory.parse("IDMap,Flat").pre.isEmpty)
    assert(IndexFactory.parse("HNSW32").hnswM.contains(32))
    assert(IndexFactory.parse("IVF16,PQ8,RFlat").refine)
    assert(!IndexFactory.parse("IVF16,PQ8").refine)
    intercept[IllegalArgumentException](IndexFactory.parse("IVF16,HNSW32"))
    intercept[IllegalArgumentException](IndexFactory.parse("Bogus42"))
  }

  test("RFlat refinement lifts PQ recall to exact at full probe") {
    val plain = IndexFactory.build("IVF16,PQ8", baseDF)
    val refined = IndexFactory.build("IVF16,PQ8,RFlat", baseDF)
    val rPlain = recallVsExact(plain.search(qDF, k = 10, nprobe = 16), 10)
    val rRef = recallVsExact(refined.search(qDF, k = 10, nprobe = 16, kFactor = 8), 10)
    assert(rRef >= rPlain - 1e-9, s"refined $rRef < plain $rPlain")
    assert(rRef > 0.95, s"refined recall $rRef")
    // refined distances are the exact ones: top-1 dist matches flat search
    import spark.implicits._
    val exact1 = FlatSearch.knn(baseDF, qDF, 1)
      .select(col("qid"), col("dist")).as[(Long, Double)].collect().toMap
    val ref1 = refined.search(qDF, k = 1, nprobe = 16, kFactor = 8)
      .select(col("qid"), col("dist")).as[(Long, Double)].collect().toMap
    ref1.foreach { case (q, d) =>
      assert(math.abs(d - exact1(q)) < 1e-6, s"qid $q: $d vs ${exact1(q)}")
    }
  }

  test("IVF32,Flat via factory: full-probe equals exact search") {
    import spark.implicits._
    val idx = IndexFactory.build("IVF32,Flat", baseDF)
    val got = idx.search(qDF, k = 10, nprobe = 32)
      .select(col("qid"), col("rank"), col("id")).as[(Long, Int, Long)]
      .collect().sorted
    val want = FlatSearch.knn(baseDF, qDF, k = 10)
      .select(col("qid"), col("rank"), col("id")).as[(Long, Int, Long)]
      .collect().sorted
    assert(got.sameElements(want))
  }

  test("PCA16,IVF16,Flat reduces dim and keeps decent recall") {
    val idx = IndexFactory.build("PCA16,IVF16,Flat", baseDF)
    import spark.implicits._
    val d = idx.data.select(size(col("vec"))).as[Int].head()
    assert(d == 16)
    val r = recallVsExact(idx.search(qDF, k = 10, nprobe = 16), 10)
    assert(r > 0.4, s"PCA16 recall $r") // PCA loses info; exactness not expected
  }

  test("IVF16,PQ8 and IVF16,SQ8 search through the one handle") {
    val rPq = recallVsExact(IndexFactory.build("IVF16,PQ8", baseDF)
      .search(qDF, k = 10, nprobe = 16), 10)
    assert(rPq > 0.5, s"IVF,PQ recall $rPq")
    val rSq = recallVsExact(IndexFactory.build("IVF16,SQ8", baseDF)
      .search(qDF, k = 10, nprobe = 16), 10)
    assert(rSq > 0.9, s"IVF,SQ8 recall $rSq")
  }

  test("HNSW32 through the factory reaches high recall") {
    val idx = IndexFactory.build("HNSW32", baseDF)
    val r = recallVsExact(idx.search(qDF, k = 10), 10)
    assert(r > 0.85, s"factory HNSW recall $r")
  }

  test("HNSW over compressed storage (HNSW16,SQ8 / HNSW16,SQ4): codec-space graph") {
    // IndexHNSWSQ parity: the graph lives in the codec's decoded space,
    // so recall survives 8-bit quantization and degrades gracefully at 4
    val sq8 = IndexFactory.build("HNSW16,SQ8", baseDF)
    assert(sq8.graph.isDefined && sq8.sq.isDefined)
    val r8 = recallVsExact(sq8.search(qDF, k = 10), 10)
    assert(r8 > 0.8, s"HNSW,SQ8 recall $r8")
    val sq4 = IndexFactory.build("HNSW16,SQ4", baseDF)
    val r4 = recallVsExact(sq4.search(qDF, k = 10), 10)
    assert(r4 > 0.3, s"HNSW,SQ4 recall $r4") // 4-bit loses real precision

    assert(r8 >= r4 - 0.05, s"8-bit ($r8) should not trail 4-bit ($r4)")
  }

  test("HNSW over PQ storage (HNSW16,PQ8): decoded-space graph, searchable") {
    // IndexHNSWPQ parity — previously this spec built no graph and
    // crashed at search time on the vec-less code table
    val idx = IndexFactory.build("HNSW16,PQ8", baseDF)
    assert(idx.graph.isDefined && idx.pq.isDefined)
    val r = recallVsExact(idx.search(qDF, k = 10), 10)
    assert(r > 0.3, s"HNSW,PQ8 recall $r")
  }

  test("random rotation preserves distances; L2norm makes unit vectors") {
    val rot = LinearTransform.randomRotation(32, seed = 5L)
    val a = base(0); val b = base(1)
    val d0 = Kernels.l2Sqr(a, b)
    val d1 = Kernels.l2Sqr(rot.applyVec(a), rot.applyVec(b))
    assert(math.abs(d0 - d1) / d0 < 1e-4, s"$d0 vs $d1")
    assert(math.abs(Kernels.norm(L2NormTransform.applyVec(a)) - 1) < 1e-5)
  }

  test("OPQ rotation reduces PQ reconstruction error on correlated data") {
    import spark.implicits._
    import graft.functions.Kernels
    import graft.quantize.ProductQuantizer
    // the OPQ-winning regime: low-rank signal hidden by a fixed
    // rotation, so the RAW subspace split mixes signal into every
    // subspace; the learned rotation can unmix it
    val rnd = new scala.util.Random(5)
    val hide = LinearTransform.randomRotation(16, seed = 99L)
    val data = Array.fill(1500) {
      val z = new Array[Float](16)
      z(0) = (2.0 * rnd.nextGaussian()).toFloat
      z(1) = (1.5 * rnd.nextGaussian()).toFloat
      var j = 2
      while (j < 16) { z(j) = (0.05 * rnd.nextGaussian()).toFloat; j += 1 }
      hide.applyVec(z)
    }
    val df = vecDF(data).cache()
    def reconErr(vs: Array[Array[Float]]): Double = {
      val pdf = vecDF(vs)
      val pq = ProductQuantizer.train(pdf, m = 4, nbits = 4, seed = 3L)
      vs.take(300).map(v => Kernels.l2Sqr(v, pq.decode(pq.encode(v)))).sum / 300
    }
    val plain = reconErr(data)
    val opq = OPQTransform.fit(df, m = 4, nbits = 4, iters = 8, seed = 3L)
    val rotated = data.map(opq.applyVec)
    val withOpq = reconErr(rotated)
    assert(withOpq < plain, s"OPQ err $withOpq !< plain $plain")
    // rotation is orthonormal: distances preserved
    val d0 = Kernels.l2Sqr(data(0), data(1))
    val d1 = Kernels.l2Sqr(rotated(0), rotated(1))
    assert(math.abs(d0 - d1) / d0 < 1e-3, s"$d0 vs $d1")
  }

  test("centering subtracts the collection mean") {
    val c = CenterTransform.fit(baseDF)
    val centered = c.apply(baseDF)
    val m2 = CenterTransform.fit(centered)
    assert(m2.mean.forall(x => math.abs(x) < 1e-4))
  }
}
