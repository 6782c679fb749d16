package graft

import org.apache.spark.sql.functions._
import graft.operators.Management
import graft.search.FlatSearch
import graft.sources.VecFiles

class ManagementSpec extends SparkSpec {

  lazy val base = randVecs(400, 8, seed = 51)
  lazy val df = vecDF(base).cache()

  test("removeIds range/batch/anti-join agree") {
    import spark.implicits._
    val a = Management.removeIdsRange(df, 100, 200).select("id").as[Long].collect().toSet
    assert(a == (0L until 400L).toSet -- (100L until 200L))
    val b = Management.removeIdsBatch(df, Seq(1L, 3L, 5L)).count()
    assert(b == 397)
    val ids = Seq(1L, 3L, 5L).toDF("id")
    assert(Management.removeIds(df, ids).count() == 397)
  }

  test("reconstruct and search_and_reconstruct") {
    import spark.implicits._
    val rec = Management.reconstruct(df, Seq(7L)).as[(Long, Array[Float])].head()
    assert(rec._1 == 7L && rec._2.sameElements(base(7)))
    val res = FlatSearch.knn(df, vecDF(base.take(2), "qid"), k = 3)
    val sr = Management.searchAndReconstruct(res, df)
    assert(sr.count() == 6)
    assert(sr.columns.contains("vec"))
  }

  test("mergeFrom offsets ids; copySubset variants") {
    val merged = Management.mergeFrom(df, df, addId = 1000)
    assert(merged.count() == 800)
    assert(merged.agg(max(col("id"))).head().getLong(0) == 1399)
    assert(Management.copySubsetIdRange(df, 0, 50).count() == 50)
    assert(Management.copySubsetIdMod(df, 4, 1).count() == 100)
  }

  test("idMap remaps to external ids") {
    import spark.implicits._
    val res = FlatSearch.knn(df, vecDF(base.take(1), "qid"), k = 5)
    val mapping = (0L until 400L).map(i => (i, i * 10 + 7)).toDF("id", "ext_id")
    val mapped = Management.idMap(res, mapping)
    assert(mapped.select("id").as[Long].collect().forall(_ % 10 == 7))
  }

  test("splitDims slices vectors vertically") {
    import spark.implicits._
    val parts = Management.splitDims(df, 2)
    assert(parts.length == 2)
    val v0 = parts(0).filter(col("id") === 3L).select("vec").as[Array[Float]].head()
    val v1 = parts(1).filter(col("id") === 3L).select("vec").as[Array[Float]].head()
    assert((v0 ++ v1).sameElements(base(3)))
  }

  test("slidingWindow keeps last w batches") {
    import spark.implicits._
    val batched = df.withColumn("batch_id", col("id") % 10)
    val kept = Management.slidingWindow(batched, currentBatch = 9, w = 3)
    assert(kept.select("batch_id").distinct().as[Long].collect().toSet == Set(7L, 8L, 9L))
  }

  test("routeReplicas round-robins the query batch, losslessly") {
    import spark.implicits._
    val qdf = vecDF(base.take(10), "qid")
    val routes = Management.routeReplicas(qdf, 3)
    assert(routes.map(_.count()).sum == 10)
    val all = routes.map(_.select("qid").as[Long].collect().toSet)
    assert(all.reduce(_ ++ _) == (0L until 10L).toSet)
    assert(all.forall(s => all.count(_ == s) == 1)) // disjoint
  }

  test("recallAtK and distanceRecall metrics") {
    import spark.implicits._
    val res = FlatSearch.knn(df, vecDF(base.take(3), "qid"), k = 10)
    val r = Management.recallAtK(res, res, 10).as[(Long, Double)].collect()
    assert(r.forall(_._2 == 1.0)) // self-recall = 1
    val gtKth = res.filter(col("rank") === 10)
      .select(col("qid"), col("dist").as("kth_dist"))
    val dr = Management.distanceRecall(res, gtKth, 10).as[(Long, Double)].collect()
    assert(dr.forall(_._2 == 1.0))
  }

  test("fvecs/fbin round-trip through files and DataFrame") {
    val dir = java.nio.file.Files.createTempDirectory("vecio").toString
    val vs = base.take(20)
    VecFiles.writeFvecs(s"$dir/x.fvecs", vs)
    val back = VecFiles.readFvecs(s"$dir/x.fvecs")
    assert(back.length == 20 && back(5).sameElements(vs(5)))
    val dfBack = VecFiles.fvecsToDF(spark, s"$dir/x.fvecs")
    assert(dfBack.count() == 20)
    VecFiles.convertToParquet(spark, s"$dir/x.fvecs", s"$dir/x.parquet")
    assert(spark.read.parquet(s"$dir/x.parquet").count() == 20)
  }

  test("ivecs/fbin/ibin writers round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("vecio2").toString
    val ints = Array.tabulate(12)(i => Array.tabulate(5)(j => i * 100 + j))
    VecFiles.writeIvecs(s"$dir/gt.ivecs", ints)
    val ib = VecFiles.readIvecs(s"$dir/gt.ivecs")
    assert(ib.length == 12 && ib(7).sameElements(ints(7)))
    val vs = base.take(9)
    VecFiles.writeFbin(s"$dir/x.fbin", vs)
    val fb = VecFiles.readFbin(s"$dir/x.fbin")
    assert(fb.length == 9 && fb(3).sameElements(vs(3)))
    VecFiles.writeIbin(s"$dir/x.ibin", ints)
    val ibin = VecFiles.readIbin(s"$dir/x.ibin")
    assert(ibin.length == 12 && ibin(11).sameElements(ints(11)))
  }
}
