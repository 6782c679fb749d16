package graft

import org.apache.spark.sql.functions._
import graft.index.{IMI, IVFIndex, IndexFactory}
import graft.search.{FlatSearch, IVFSearch}

/** MultiIndexQuantizer coarse assignment (`Auncel/IndexPQ.cpp:868-937`)
  * — the factored two-subspace form vs the composite table, and the
  * full IVF pipeline running over an IMI partitioning. */
class IMISpec extends SparkSpec {

  lazy val base = clusteredVecs(4000, 16, nClusters = 24, seed = 31)
  lazy val baseDF = vecDF(base).cache()
  lazy val imi = IMI.train(baseDF, nbits = 3, seed = 42L)
  lazy val model = imi.toIVFModel
  lazy val assigned = IVFIndex.assign(baseDF, model).cache()
  lazy val qDF = vecDF(randVecs(12, 16, seed = 32), "qid")

  test("composite table has 2^(2 nbits) centroids in label order") {
    assert(model.nlist == 64)
    val mask = imi.ksub - 1
    (0 until model.nlist).foreach { label =>
      val want = imi.sub(0)(label & mask) ++ imi.sub(1)(label >> imi.nbits)
      assert(model.centroids(label).sameElements(want), s"label $label")
    }
  }

  test("factored assignment equals composite-table argmin on every row") {
    base.foreach { v =>
      assert(imi.assign(v) == model.assignListNo(v))
    }
  }

  test("every sub-space pairing is reachable and lists partition the data") {
    import spark.implicits._
    val counts = assigned.groupBy(col("list_no")).count()
      .as[(Int, Long)].collect().toMap
    assert(counts.values.sum == base.length)
    // clustered data concentrates, but sub-0 and sub-1 codes both vary
    val labels = counts.keySet
    assert(labels.map(_ & (imi.ksub - 1)).size > 1)
    assert(labels.map(_ >> imi.nbits).size > 1)
  }

  test("IMI full probe reproduces exact search") {
    import spark.implicits._
    val got = IVFSearch.search(assigned, model, qDF, k = 10, nprobe = model.nlist)
      .select(col("qid"), col("rank"), col("id")).as[(Long, Int, Long)]
      .collect().sortBy(r => (r._1, r._2))
    val want = FlatSearch.knn(baseDF, qDF, k = 10)
      .select(col("qid"), col("rank"), col("id")).as[(Long, Int, Long)]
      .collect().sortBy(r => (r._1, r._2))
    assert(got.sameElements(want))
  }

  test("IMI partial probe has decent recall and grows with nprobe") {
    import spark.implicits._
    def recall(np: Int): Double = {
      val got = IVFSearch.search(assigned, model, qDF, k = 10, nprobe = np)
        .select(col("qid"), col("id")).as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val exact = FlatSearch.knn(baseDF, qDF, k = 10)
        .select(col("qid"), col("id")).as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      exact.map { case (q, ids) => (got.getOrElse(q, Set.empty) & ids).size / 10.0 }
        .sum / exact.size
    }
    val r4 = recall(4); val r16 = recall(16)
    assert(r4 <= r16 + 1e-9, s"$r4 $r16")
    assert(r16 > 0.6, s"recall@16/64 = $r16")
  }

  test("index_factory IMI2x3,Flat builds and searches; IMI excludes IVF/HNSW") {
    import spark.implicits._
    val idx = IndexFactory.build("IMI2x3,Flat", baseDF)
    assert(idx.ivf.exists(_.nlist == 64))
    val got = idx.search(qDF, k = 5, nprobe = 64)
      .select(col("qid"), col("rank"), col("id")).as[(Long, Int, Long)]
      .collect().sortBy(r => (r._1, r._2))
    val want = FlatSearch.knn(baseDF, qDF, k = 5)
      .select(col("qid"), col("rank"), col("id")).as[(Long, Int, Long)]
      .collect().sortBy(r => (r._1, r._2))
    assert(got.sameElements(want))
    intercept[IllegalArgumentException](IndexFactory.parse("IVF16,IMI2x3,Flat"))
    intercept[IllegalArgumentException](IndexFactory.parse("IMI2x3,HNSW16,Flat"))
  }

  test("IMI2x3,PQ4 residual encoding searches through the factory") {
    import spark.implicits._
    val idx = IndexFactory.build("IMI2x3,PQ4", baseDF)
    val got = idx.search(qDF, k = 10, nprobe = 64)
      .select(col("qid"), col("id")).as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = FlatSearch.knn(baseDF, qDF, k = 10)
      .select(col("qid"), col("id")).as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recall = exact.map { case (q, ids) =>
      (got.getOrElse(q, Set.empty) & ids).size / 10.0 }.sum / exact.size
    assert(recall > 0.5, s"ADC recall at full probe = $recall")
  }
}
