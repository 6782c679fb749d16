package graft

import org.apache.spark.sql.functions._
import graft.functions.Kernels
import graft.search.{FlatSearch, IVFSearch}
import graft.index.IVFIndex
import graft.sources.VecFiles

/** Boundary behavior pinned down: under-full collections, empty query
  * sets, duplicate vectors, zero vectors, k larger than N. */
class EdgeCaseSpec extends SparkSpec {

  test("knn with k > N returns all N rows, ranked") {
    import spark.implicits._
    val base = randVecs(5, 8, seed = 91)
    val res = FlatSearch.knn(vecDF(base), vecDF(base.take(2), "qid"), k = 50)
    assert(res.count() == 10) // 2 queries × 5 rows
    val ranks = res.filter(col("qid") === 0L).select("rank").as[Int].collect().sorted
    assert(ranks.sameElements(1 to 5))
  }

  test("empty query set produces empty results, not a failure") {
    val base = randVecs(10, 8, seed = 92)
    val res = FlatSearch.knn(vecDF(base), vecDF(Array.empty[Array[Float]], "qid"), k = 3)
    assert(res.count() == 0)
  }

  test("duplicate vectors: ties broken by id, deterministically") {
    import spark.implicits._
    val v = randVecs(1, 8, seed = 93)(0)
    val base = Array(v, v, v, v) // four identical vectors, ids 0..3
    val res = FlatSearch.knn(vecDF(base), vecDF(Array(v), "qid"), k = 4)
      .select(col("rank"), col("id")).as[(Int, Long)].collect().sortBy(_._1)
    assert(res.map(_._2).sameElements(Array(0L, 1L, 2L, 3L)))
    assert(res.forall(_._1 <= 4))
  }

  test("zero vector: normalize stays zero, cosine handled") {
    val z = Array.fill(8)(0f)
    assert(Kernels.l2Normalize(z).forall(_ == 0f))
    assert(Kernels.norm(z) == 0.0)
    // distance against zero vector is just the norm
    val v = randVecs(1, 8, seed = 94)(0)
    assert(Kernels.l2Sqr(z, v) == Kernels.normSqr(v))
  }

  test("IVF search where some probed lists are empty") {
    import spark.implicits._
    val base = clusteredVecs(100, 8, nClusters = 4, seed = 95)
    val df = vecDF(base)
    val model = IVFIndex.train(df, nlist = 32) // 32 lists over 100 points → empties
    val assigned = IVFIndex.assign(df, model)
    val sizes = assigned.groupBy("list_no").count().as[(Int, Long)].collect()
    // k-means with few dense clusters leaves some lists tiny/empty — fine
    val res = IVFSearch.search(assigned, model, vecDF(base.take(3), "qid"),
      k = 5, nprobe = 32)
    assert(res.count() == 15)
    assert(res.filter(col("rank") === 1).select("dist").as[Double]
      .collect().forall(_ == 0.0)) // self-match
  }

  test("bounded search handles empty and single-query batches on every path") {
    import spark.implicits._
    import graft.search.BoundedSearch
    import graft.profile.ProfileTrainer
    val base = clusteredVecs(400, 8, nClusters = 8, seed = 95)
    val bDF = vecDF(base)
    val model = IVFIndex.train(bDF, nlist = 8, seed = 42L)
    val assigned = IVFIndex.assign(bDF, model).cache()
    val tq = vecDF(clusteredVecs(430, 8, nClusters = 8, seed = 95).drop(400), "qid")
    val gt = FlatSearch.knn(bDF, tq, k = 5)
    val traces = ProfileTrainer.train(assigned, model, tq, gt, maxTopk = 5, bs = 10)
    val empty = Seq.empty[(Long, Array[Float], Float)]
      .toDF("qid", "vec", "required_recall")
    for (dist <- Seq(false, true)) {
      val r = BoundedSearch.search(assigned, model, traces, empty, k = 5,
        multiplier = 2.0f, forceDistributed = dist)
      assert(r.results.count() == 0 && r.stats.isEmpty, s"distributed=$dist")
    }
    val one = Seq((7L, base(3), 0.9f)).toDF("qid", "vec", "required_recall")
    for (dist <- Seq(false, true)) {
      val r = BoundedSearch.search(assigned, model, traces, one, k = 5,
        multiplier = 2.0f, forceDistributed = dist)
      val rows = r.results.select(col("qid"), col("id"), col("rank"))
        .as[(Long, Long, Int)].collect().sortBy(_._3)
      assert(rows.length == 5 && rows.forall(_._1 == 7L), s"distributed=$dist")
      assert(rows.head._2 == 3L, "nearest neighbor of an in-corpus vector is itself")
      assert(r.stats.size == 1)
    }
  }

  test("distributed fvecs reader matches the driver-side reader") {
    val dir = java.nio.file.Files.createTempDirectory("fvecs").toString
    val vs = randVecs(100, 12, seed = 96)
    VecFiles.writeFvecs(s"$dir/x.fvecs", vs)
    import spark.implicits._
    val dist = VecFiles.fvecsToDFDistributed(spark, s"$dir/x.fvecs")
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    assert(dist.length == 100)
    dist.foreach { case (id, v) => assert(v.sameElements(vs(id.toInt))) }
  }

  test("mergeTopK of disjoint partials equals direct topk") {
    import spark.implicits._
    val rows = (0 until 100).map(i => (1L, i.toLong, (100 - i).toDouble))
    val df = rows.toDF("qid", "id", "dist")
    val merged = FlatSearch.mergeTopK(df, 5)
      .select(col("rank"), col("id")).as[(Int, Long)].collect().sortBy(_._1)
    assert(merged.map(_._2).sameElements(Array(99L, 98L, 97L, 96L, 95L)))
  }
}
