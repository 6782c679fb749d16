package graft

import org.apache.spark.sql.functions._
import graft.index.IVFIndex
import graft.search.{FlatSearch, IVFSearch}

class IVFSearchSpec extends SparkSpec {

  lazy val base = randVecs(3000, 24, seed = 11)
  lazy val baseDF = vecDF(base)
  lazy val model = IVFIndex.train(baseDF, nlist = 32, metric = "l2", seed = 42L)
  lazy val assigned = IVFIndex.assign(baseDF, model).cache()
  lazy val qDF = vecDF(randVecs(15, 24, seed = 12), "qid")

  test("nprobe = nlist reproduces exact search") {
    import spark.implicits._
    val ivf = IVFSearch.search(assigned, model, qDF, k = 10, nprobe = 32)
      .select(col("qid"), col("rank"), col("id")).as[(Long, Int, Long)]
      .collect().sortBy(r => (r._1, r._2))
    val flat = FlatSearch.knn(baseDF, qDF, k = 10)
      .select(col("qid"), col("rank"), col("id")).as[(Long, Int, Long)]
      .collect().sortBy(r => (r._1, r._2))
    assert(ivf.sameElements(flat))
  }

  test("recall@10 increases with nprobe and is decent at nprobe=8/32") {
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
    val r1 = recall(1); val r4 = recall(4); val r8 = recall(8)
    assert(r1 <= r4 + 1e-9 && r4 <= r8 + 1e-9, s"$r1 $r4 $r8")
    assert(r8 > 0.7, s"recall@8/32 = $r8")
  }

  test("IVF range search at full probe equals flat range search") {
    import spark.implicits._
    val r = 1.2
    val got = IVFSearch.range(assigned, model, qDF, radius = r, nprobe = 32)
      .select(col("qid"), col("id")).as[(Long, Long)].collect().toSet
    val want = graft.search.FlatSearch.range(baseDF, qDF, radius = r)
      .select(col("qid"), col("id")).as[(Long, Long)].collect().toSet
    assert(got == want)
    assert(want.nonEmpty)
    // partial probe returns a subset
    val partial = IVFSearch.range(assigned, model, qDF, radius = r, nprobe = 4)
      .select(col("qid"), col("id")).as[(Long, Long)].collect().toSet
    assert(partial.subsetOf(want))
  }

  test("assignment round-trips through partitioned parquet") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivf").toString
    IVFIndex.write(assigned, s"$dir/data")
    IVFIndex.saveModel(model, s"$dir/model", spark)
    val loadedModel = IVFIndex.loadModel(s"$dir/model", spark)
    assert(loadedModel.metric == model.metric)
    assert(loadedModel.centroids.length == model.nlist)
    assert(loadedModel.centroids(3).sameElements(model.centroids(3)))
    val data = spark.read.parquet(s"$dir/data")
    assert(data.count() == 3000)
    // partition pruning survives: one list reads a subset
    val one = data.filter(col("list_no") === 0).count()
    assert(one > 0 && one < 3000)
    // search over the loaded table matches search over the in-memory one
    val a = IVFSearch.search(data, loadedModel, qDF, k = 5, nprobe = 4)
      .select(col("qid"), col("rank"), col("id")).as[(Long, Int, Long)].collect().sorted
    val b = IVFSearch.search(assigned, model, qDF, k = 5, nprobe = 4)
      .select(col("qid"), col("rank"), col("id")).as[(Long, Int, Long)].collect().sorted
    assert(a.sameElements(b))
  }
}
